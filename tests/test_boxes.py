"""Unit tests for fdtpu.core.boxes: conversions and pairwise IoU."""

import numpy as np
import jax.numpy as jnp

from fdtpu.core import boxes as B


def test_xywh_xyxy_roundtrip(rng):
    xywh = rng.uniform(0, 100, size=(17, 4)).astype(np.float32)
    out = B.xyxy_to_xywh(B.xywh_to_xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(np.asarray(out), xywh, rtol=1e-6, atol=1e-5)


def test_cxywh_xyxy_roundtrip(rng):
    c = rng.uniform(0, 100, size=(9, 5)).astype(np.float32)
    out = B.cxyxy_to_xywh(B.cxywh_to_xyxy(jnp.asarray(c)))
    np.testing.assert_allclose(np.asarray(out), c, rtol=1e-6, atol=1e-5)


def _iou_ref(a, b):
    """Scalar reference IoU for two xyxy boxes."""
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    area = lambda x: max(x[2] - x[0], 0) * max(x[3] - x[1], 0)
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def test_box_iou_matches_scalar_reference(rng):
    a = rng.uniform(0, 50, size=(6, 2))
    a = np.concatenate([a, a + rng.uniform(1, 50, size=(6, 2))], axis=1)
    b = rng.uniform(0, 50, size=(4, 2))
    b = np.concatenate([b, b + rng.uniform(1, 50, size=(4, 2))], axis=1)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[_iou_ref(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_box_iou_identity():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(np.asarray(B.box_iou(a, a)), [[1.0]])


def test_masked_iou_zeroes_invalid(rng):
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    am = jnp.asarray([True, False])
    iou = B.masked_box_iou(a, am, a, am)
    np.testing.assert_allclose(np.asarray(iou), [[1.0, 0.0], [0.0, 0.0]])


def test_pad_boxes():
    padded, mask = B.pad_boxes(np.ones((2, 5)), 4)
    assert padded.shape == (4, 5) and mask.tolist() == [True, True, False, False]
    # truncation
    padded, mask = B.pad_boxes(np.ones((6, 5)), 4)
    assert mask.all()
