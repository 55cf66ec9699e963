"""Grid encode/decode: round-trip property (the reference's strongest check,
``/root/reference/datasets/WIDERFace/dataset_ssd.py:142-150``, commented YOLO
variant ``dataset.py:125-139``) plus parity with a direct re-derivation of the
reference's per-box loop math."""

import math

import numpy as np
import jax
import jax.numpy as jnp

import functools

from fdtpu.core import decode_grid, pad_boxes
from fdtpu.core import decode_filter_nms as _dfn
from fdtpu.core import encode_grid_targets as _egt

# jit once per shape so trial loops don't re-trace (thresholds traced)
decode_filter_nms = jax.jit(_dfn, static_argnums=(1, 2, 5))
encode_grid_targets = jax.jit(_egt, static_argnums=(2, 3))

S = 10
IMG = (480, 480)  # (width, height)


def _random_boxes(rng, n, distinct_cells=True):
    """Random xywh pixel boxes, at most one per grid cell (so encode is
    lossless and the round-trip property holds exactly)."""
    cells = rng.choice(S * S, size=n, replace=False)
    out = []
    for c in cells:
        i, j = int(c % S), int(c // S)
        px, py = IMG[0] / S, IMG[1] / S
        x = i * px + rng.uniform(0, px - 1)
        y = j * py + rng.uniform(0, py - 1)
        w = rng.uniform(4, max(IMG[0] - x, 5))
        h = rng.uniform(4, max(IMG[1] - y, 5))
        out.append([1.0, x, y, w, h])
    return np.array(out, dtype=np.float32)


def _encode_reference_style(boxes):
    """The reference's encode loop (dataset.py:32-64) re-derived in numpy, in
    fdtpu's [y,x] layout, as an independent oracle."""
    fm = np.zeros((S, S, 5), dtype=np.float32)
    xp, yp = IMG[0] / S, IMG[1] / S
    for bx in boxes:
        i, j = math.floor(bx[1] / xp), math.floor(bx[2] / yp)
        row = [
            bx[0],
            (bx[1] - i * xp) / xp,
            (bx[2] - j * yp) / yp,
            bx[3] / IMG[0],
            bx[4] / IMG[1],
        ]
        i = min(max(i, 0), S - 1)
        j = min(max(j, 0), S - 1)
        fm[j, i] = row
    return fm


def test_encode_matches_loop_oracle(rng):
    boxes = _random_boxes(rng, 5)
    padded, mask = pad_boxes(boxes, 8)
    fm = encode_grid_targets(jnp.asarray(padded), jnp.asarray(mask), S, IMG)
    np.testing.assert_allclose(np.asarray(fm), _encode_reference_style(boxes), atol=1e-5)


def test_encode_last_write_wins():
    # Two boxes in the same cell: the later row must win (dataset.py loop order).
    boxes = np.array(
        [[1, 10, 10, 50, 50], [1, 20, 20, 60, 60]], dtype=np.float32
    )
    padded, mask = pad_boxes(boxes, 4)
    fm = np.asarray(encode_grid_targets(jnp.asarray(padded), jnp.asarray(mask), S, IMG))
    assert fm[0, 0, 3] * IMG[0] == 60  # w of the second box


def test_encode_decode_roundtrip(rng):
    """Encoding is invertible by decode+NMS — the reference's per-sample
    assert (dataset_ssd.py:142-150) as a property test."""
    for trial in range(5):
        n = int(rng.integers(1, 7))
        boxes = _random_boxes(rng, n)
        padded, mask = pad_boxes(boxes, 8)
        fm = encode_grid_targets(jnp.asarray(padded), jnp.asarray(mask), S, IMG)
        out, keep = decode_filter_nms(fm, S, IMG, 0.5, 0.5, capacity=16)
        out = np.asarray(out)[np.asarray(keep)]
        assert out.shape[0] == n
        got = np.sort(np.round(out[:, 1:]), axis=0)
        want = np.sort(np.round(boxes[:, 1:]), axis=0)
        np.testing.assert_allclose(got, want, atol=1.0)  # decode rounds coords


def test_decode_grid_empty():
    fm = jnp.zeros((S, S, 5))
    out, keep = decode_filter_nms(fm, S, IMG, 0.5, 0.5, capacity=16)
    assert not bool(np.asarray(keep).any())


def test_encode_is_jit_and_vmap_able(rng):
    boxes = np.stack([_random_boxes(rng, 3) for _ in range(4)])
    padded = np.zeros((4, 8, 5), dtype=np.float32)
    padded[:, :3] = boxes
    mask = np.zeros((4, 8), dtype=bool)
    mask[:, :3] = True
    fn = jax.jit(
        jax.vmap(lambda b, m: _egt(b, m, S, IMG))
    )
    fms = fn(jnp.asarray(padded), jnp.asarray(mask))
    assert fms.shape == (4, S, S, 5)
    np.testing.assert_allclose(
        np.asarray(fms[0]), _encode_reference_style(boxes[0]), atol=1e-5
    )
