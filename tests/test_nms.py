"""Masked-NMS parity against a scalar greedy oracle with
``torchvision.ops.nms`` semantics (descending score, suppress IoU > thr,
index tie-break) — the native op the reference calls at
``/root/reference/datasets/utils.py:164``."""

import numpy as np
import jax
import jax.numpy as jnp

from fdtpu.core import nms as _nms

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


def test_nms_batched_vmap(rng):
    cand = np.stack([_random_candidates(rng, 20) for _ in range(3)])
    fn = jax.jit(jax.vmap(lambda c: _nms(c, 0.3, 0.4, capacity=32)))
    boxes, keep = fn(jnp.asarray(cand))
    assert boxes.shape == (3, 32, 5) and keep.shape == (3, 32)
