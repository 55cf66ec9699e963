"""SSD prior encode/decode: prior table parity with the reference math and the
encode->decode round-trip assert the reference runs per-sample
(``/root/reference/datasets/WIDERFace/dataset_ssd.py:142-150``)."""

import math

import numpy as np
import jax.numpy as jnp

import jax

from fdtpu.core import (
    calculate_priors,
    decode_ssd,
    num_priors,
    pad_boxes,
    prior_scales,
)
from fdtpu.core import encode_ssd_targets as _est
from fdtpu.core import ssd_decode_filter_nms as _sdfn

encode_ssd_targets = jax.jit(_est, static_argnums=(2, 3))
ssd_decode_filter_nms = jax.jit(_sdfn, static_argnums=(1, 2, 5))

PS = (60, 30, 15, 7)
IMG = (480, 480)


def test_num_priors():
    assert num_priors(PS) == 4774  # SURVEY.md §TL;DR / SSD.py:99


def test_prior_table_values():
    priors = np.asarray(calculate_priors(PS))
    scales = np.asarray(prior_scales(PS))
    assert priors.shape == (4774, 4) and scales.shape == (4774,)
    # first scale (60): flat row-major over (y_cell, x_cell)
    # flat k = y*60 + x  ->  prior [x/60, y/60, 0, 0]
    k = 123
    y, x = divmod(k, 60)
    np.testing.assert_allclose(priors[k], [x / 60, y / 60, 0, 0], atol=1e-6)
    assert scales[k] == np.float32(1 / 60)
    # last scale block
    k = 4774 - 1
    np.testing.assert_allclose(priors[k], [6 / 7, 6 / 7, 0, 0], atol=1e-6)
    assert abs(scales[k] - 1 / 7) < 1e-6
    assert (priors[:, 2:] == 0).all()


def _random_boxes(rng, n):
    """Boxes whose top-left corners land in distinct cells at every scale
    (distinct 7x7 cells implies distinct finer cells), so encode is lossless."""
    cells = rng.choice(49, size=n, replace=False)
    out = []
    for c in cells:
        i, j = int(c % 7), int(c // 7)
        px = IMG[0] / 7
        x = i * px + rng.uniform(1, px * 0.4)
        y = j * px + rng.uniform(1, px * 0.4)
        w = rng.uniform(8, IMG[0] - x)
        h = rng.uniform(8, IMG[1] - y)
        out.append([1.0, round(x), round(y), round(w), round(h)])
    return np.array(out, dtype=np.float32)


def test_encode_values_single_box():
    boxes = np.array([[1.0, 100, 200, 50, 60]], dtype=np.float32)
    padded, mask = pad_boxes(boxes, 4)
    enc = np.asarray(encode_ssd_targets(jnp.asarray(padded), jnp.asarray(mask), PS, IMG))
    assert enc.shape == (4774, 5)
    # scale 60: cell ix = floor(100/480*60) = 12, iy = floor(200/480*60) = 25
    ix, iy = math.floor(100 / 480 * 60), math.floor(200 / 480 * 60)
    row = enc[iy * 60 + ix]
    np.testing.assert_allclose(row[0], 1.0 - 0.001 * 60, atol=1e-6)
    np.testing.assert_allclose(row[1], (100 / 480 - ix / 60) * 60, atol=1e-5)
    np.testing.assert_allclose(row[3], 50 / 480, atol=1e-6)
    # exactly one occupied cell per scale
    occupied = (enc[:, 0] > 0).sum()
    assert occupied == 4


def test_ssd_encode_decode_roundtrip(rng):
    """decode(encode(boxes)) == boxes after rounding — the reference's inline
    assert, vectorized. Threshold 0.5 keeps all scales (conf >= 1-0.06)."""
    for trial in range(4):
        n = int(rng.integers(1, 6))
        boxes = _random_boxes(rng, n)
        padded, mask = pad_boxes(boxes, 8)
        enc = encode_ssd_targets(jnp.asarray(padded), jnp.asarray(mask), PS, IMG)
        out, keep = ssd_decode_filter_nms(enc, PS, IMG, 0.5, 0.5, capacity=64)
        out = np.asarray(out)[np.asarray(keep)]
        # NMS with iou 0.5 collapses the 4 per-scale duplicates of each box
        # (identical coords -> IoU 1) to the highest-confidence one (finest
        # scale, least-docked confidence: dataset_ssd.py:58-59).
        assert out.shape[0] == n
        np.testing.assert_allclose(out[:, 0], 1.0 - 0.001 * 7, atol=1e-6)
        got = np.sort(np.round(out[:, 1:]), axis=0)
        want = np.sort(boxes[:, 1:], axis=0)
        np.testing.assert_allclose(got, want, atol=1.0)


def test_decode_ssd_zero_is_priors():
    enc = jnp.zeros((4774, 5))
    out = np.asarray(decode_ssd(enc, PS, IMG))
    priors = np.asarray(calculate_priors(PS))
    np.testing.assert_allclose(out[:, 1], priors[:, 0] * IMG[0], atol=1e-3)
    np.testing.assert_allclose(out[:, 2], priors[:, 1] * IMG[1], atol=1e-3)
