"""Masked-NMS parity against a scalar greedy oracle with
``torchvision.ops.nms`` semantics (descending score, suppress IoU > thr,
index tie-break) — the native op the reference calls at
``/root/reference/datasets/utils.py:164``."""

import numpy as np
import jax
import jax.numpy as jnp

from fdtpu.core import nms as _nms
from fdtpu.core.nms import nms_matrix

# jit once (thresholds traced, capacity static) so trial loops don't re-trace
nms = jax.jit(_nms, static_argnums=(3, 4))


def _nms_oracle(boxes_xyxy, scores, iou_thr):
    """Greedy NMS exactly as documented for torchvision.ops.nms."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), dtype=bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        a = boxes_xyxy[idx]
        for jdx in order:
            if jdx == idx or suppressed[jdx]:
                continue
            b = boxes_xyxy[jdx]
            ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
            ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
            ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
            if ua > 0 and inter / ua > iou_thr:
                if scores[jdx] < scores[idx] or (
                    scores[jdx] == scores[idx] and jdx > idx
                ):
                    suppressed[jdx] = True
    return keep


def _random_candidates(rng, n, img=480):
    xy = rng.uniform(0, img * 0.7, size=(n, 2))
    wh = rng.uniform(10, img * 0.3, size=(n, 2))
    conf = rng.uniform(0, 1, size=(n, 1))
    return np.concatenate([conf, xy, wh], axis=1).astype(np.float32)


def test_nms_matches_oracle(rng):
    for trial in range(10):
        cand = _random_candidates(rng, 40)
        prob_thr, iou_thr = 0.3, 0.4
        got, keep = nms(jnp.asarray(cand), prob_thr, iou_thr, capacity=64)
        got = np.asarray(got)[np.asarray(keep)]

        sel = cand[:, 0] > prob_thr
        boxes = cand[sel]
        xyxy = np.round(
            np.stack(
                [
                    boxes[:, 1],
                    boxes[:, 2],
                    boxes[:, 1] + boxes[:, 3],
                    boxes[:, 2] + boxes[:, 4],
                ],
                axis=1,
            )
        )
        keep_idx = _nms_oracle(xyxy, boxes[:, 0], iou_thr)
        want_scores = np.sort(boxes[keep_idx, 0])[::-1]
        np.testing.assert_allclose(np.sort(got[:, 0])[::-1], want_scores, rtol=1e-6)
        # coords: compare as sorted sets
        want_xywh = np.stack(
            [
                xyxy[keep_idx, 0],
                xyxy[keep_idx, 1],
                xyxy[keep_idx, 2] - xyxy[keep_idx, 0],
                xyxy[keep_idx, 3] - xyxy[keep_idx, 1],
            ],
            axis=1,
        )
        np.testing.assert_allclose(
            np.sort(got[:, 1:], axis=0), np.sort(want_xywh, axis=0), atol=1e-3
        )


def test_nms_all_below_threshold(rng):
    cand = _random_candidates(rng, 16)
    cand[:, 0] = 0.1
    out, keep = nms(jnp.asarray(cand), 0.5, 0.5)
    assert not bool(np.asarray(keep).any())


def test_nms_identical_boxes_suppressed():
    cand = np.tile(np.array([[0.9, 10, 10, 50, 50]], dtype=np.float32), (5, 1))
    cand[:, 0] = [0.9, 0.8, 0.7, 0.6, 0.55]
    out, keep = nms(jnp.asarray(cand), 0.5, 0.5)
    out = np.asarray(out)[np.asarray(keep)]
    assert out.shape[0] == 1 and out[0, 0] == np.float32(0.9)


def test_nms_matrix_matches_serial_sparse(rng):
    """Below capacity saturation the matrix fixed-point path must reproduce
    the serial-greedy kept set bit-for-bit (compacted rows; the serial path
    leaves holes at suppressed slots, the matrix path compacts winners like
    the Pallas kernel)."""
    fm = jax.jit(nms_matrix, static_argnums=(3, 4))
    for trial in range(10):
        cand = _random_candidates(rng, 60)
        a_b, a_m = map(np.asarray, nms(jnp.asarray(cand), 0.3, 0.4, capacity=64))
        b_b, b_m = map(np.asarray, fm(jnp.asarray(cand), 0.3, 0.4, 64, True))
        np.testing.assert_array_equal(a_b[a_m], b_b[b_m])
        k = int(b_m.sum())
        assert b_m[:k].all() and not b_m[k:].any()  # compacted


def test_nms_matrix_matches_oracle_saturated(rng):
    """Above capacity saturation the matrix path must stay exact (it never
    pre-truncates — same property as the Pallas kernel, unlike nms())."""
    fm = jax.jit(nms_matrix, static_argnums=(3, 4))
    for trial in range(5):
        cand = _random_candidates(rng, 200)
        cand[:, 0] = rng.uniform(0.4, 1.0, 200).astype(np.float32)
        b_b, b_m = map(np.asarray, fm(jnp.asarray(cand), 0.3, 0.4, 128, True))
        got = b_b[b_m]
        sel = cand[:, 0] > 0.3
        boxes = cand[sel]
        xyxy = np.round(
            np.stack(
                [boxes[:, 1], boxes[:, 2], boxes[:, 1] + boxes[:, 3],
                 boxes[:, 2] + boxes[:, 4]], axis=1))
        keep_idx = _nms_oracle(xyxy, boxes[:, 0], 0.4)
        want = boxes[keep_idx, 0]
        want = want[np.argsort(-want, kind="stable")][: len(got)]
        np.testing.assert_array_equal(got[:, 0], want)
        assert len(got) == min(len(keep_idx), 128)


def test_nms_matrix_tie_break_and_empty():
    cand = np.tile(np.array([[0.9, 10, 10, 50, 50]], dtype=np.float32), (5, 1))
    out, keep = nms_matrix(jnp.asarray(cand), 0.5, 0.5)
    assert int(np.asarray(keep).sum()) == 1
    cand[:, 0] = 0.1
    out, keep = nms_matrix(jnp.asarray(cand), 0.5, 0.5)
    assert not bool(np.asarray(keep).any())


def test_nms_matrix_matches_pallas_kernel(rng):
    """nms_matrix must agree with the fused Pallas kernel (interpret mode)
    on sparse AND saturated workloads — the two exact-greedy implementations
    of the same semantics (neither pre-truncates, both compact winners)."""
    from fdtpu.core.grid import decode_grid
    from fdtpu.kernels import grid_decode_tables, pallas_decode_filter_nms_batch

    s, img = 15, (480, 480)
    fms = rng.uniform(0, 1, size=(4, s, s, 5)).astype(np.float32)
    fms[..., 0] = rng.uniform(0, 1, size=(4, s, s)) ** 2  # mixed density
    got_b, got_m = jax.vmap(
        lambda o: nms_matrix(decode_grid(o, s, img), 0.5, 0.5, 64)
    )(jnp.asarray(fms))
    tables = grid_decode_tables(s, img)
    want_b, want_m = pallas_decode_filter_nms_batch(
        jnp.asarray(fms).reshape(4, -1, 5), tables, 0.5, 0.5, 64,
        interpret=True)
    got_b, got_m, want_b, want_m = map(
        np.asarray, (got_b, got_m, want_b, want_m))
    for i in range(4):
        np.testing.assert_allclose(
            got_b[i][got_m[i]], want_b[i][want_m[i]], atol=1e-5)


def test_nms_batched_vmap(rng):
    cand = np.stack([_random_candidates(rng, 20) for _ in range(3)])
    fn = jax.jit(jax.vmap(lambda c: _nms(c, 0.3, 0.4, capacity=32)))
    boxes, keep = fn(jnp.asarray(cand))
    assert boxes.shape == (3, 32, 5) and keep.shape == (3, 32)
