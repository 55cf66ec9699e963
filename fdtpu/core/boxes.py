"""Box-format conversions and pairwise IoU, fully vectorized.

Replaces the reference's native torchvision dependencies with pure-XLA math:

* ``torchvision.ops.box_iou`` (used at ``/root/reference/models/ModelMeta.py:206``)
  -> :func:`box_iou` / :func:`masked_box_iou`.
* ``datasets/utils.py:convert_bbx_to_xyxy`` (``/root/reference/datasets/utils.py:173``)
  -> :func:`xywh_to_xyxy`.

Box rows follow the reference's ``[conf, x, y, w, h]`` layout ("cxywh") where
``(x, y)`` is the **top-left** corner in pixels (COCO style) — see
``/root/reference/datasets/WIDERFace/datamodule.py:121`` (``format="coco"``).
Variable-length box lists are fixed-capacity arrays plus a boolean validity
mask, so every op here has static shapes and one jit trace.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """``[..., (x, y, w, h)]`` -> ``[..., (x0, y0, x1, y1)]``."""
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """``[..., (x0, y0, x1, y1)]`` -> ``[..., (x, y, w, h)]``."""
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)


def cxywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """``[..., (conf, x, y, w, h)]`` -> ``[..., (conf, x0, y0, x1, y1)]``.

    Mirrors ``ReduceBoundingBoxes.convert_batch_to_xyxy``
    (``/root/reference/datasets/utils.py:152-155``).
    """
    return jnp.concatenate([boxes[..., :1], xywh_to_xyxy(boxes[..., 1:5])], axis=-1)


def cxyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`cxywh_to_xyxy`
    (``/root/reference/datasets/utils.py:147-150``)."""
    return jnp.concatenate([boxes[..., :1], xyxy_to_xywh(boxes[..., 1:5])], axis=-1)


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Area of ``[..., (x0, y0, x1, y1)]`` boxes (clamped at 0)."""
    w = jnp.maximum(boxes_xyxy[..., 2] - boxes_xyxy[..., 0], 0.0)
    h = jnp.maximum(boxes_xyxy[..., 3] - boxes_xyxy[..., 1], 0.0)
    return w * h


def box_iou(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between ``(N, 4)`` and ``(M, 4)`` xyxy boxes -> ``(N, M)``.

    Same semantics as ``torchvision.ops.box_iou`` (intersection-over-union on
    half-open pixel boxes), computed as one broadcasted XLA expression instead
    of a native C++ op.
    """
    lt = jnp.maximum(a_xyxy[..., :, None, :2], b_xyxy[..., None, :, :2])
    rb = jnp.minimum(a_xyxy[..., :, None, 2:], b_xyxy[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = (
        box_area(a_xyxy)[..., :, None] + box_area(b_xyxy)[..., None, :] - inter
    )
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def masked_box_iou(
    a_xyxy: jnp.ndarray,
    a_mask: jnp.ndarray,
    b_xyxy: jnp.ndarray,
    b_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Pairwise IoU with padded rows zeroed out.

    ``a_xyxy``: ``(N, 4)``, ``a_mask``: ``(N,)`` bool; likewise for ``b``.
    Invalid pairs get IoU 0 so downstream max/threshold reductions ignore them.
    """
    iou = box_iou(a_xyxy, b_xyxy)
    pair_mask = a_mask[..., :, None] & b_mask[..., None, :]
    return jnp.where(pair_mask, iou, 0.0)


def pad_boxes(boxes, capacity: int):
    """Host-side helper: pad an ``(n, 5)`` cxywh array to ``(capacity, 5)``.

    Returns ``(padded, mask)``. Truncates if ``n > capacity`` (the reference
    instead filters such images out of the dataset entirely —
    ``/root/reference/datasets/WIDERFace/datamodule.py:102``).
    """
    import numpy as np

    boxes = np.asarray(boxes, dtype=np.float32).reshape(-1, 5)
    n = min(boxes.shape[0], capacity)
    out = np.zeros((capacity, 5), dtype=np.float32)
    out[:n] = boxes[:n]
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return out, mask
