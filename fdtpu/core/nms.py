"""Static-shape confidence filter + greedy NMS (torchvision semantics).

The reference's inference path calls the native C++ ``torchvision.ops.nms``
after a data-dependent gather (``/root/reference/datasets/utils.py:157-170``):
threshold -> xyxy -> **round** -> nms -> xywh, returning a ragged ``(K, 5)``.
XLA needs static shapes, so here the gather becomes a mask, the ragged result
becomes a fixed-capacity ``(capacity, 5)`` array plus a validity mask, and the
greedy suppression is a ``lax.fori_loop`` over a precomputed pairwise-IoU
matrix. Semantics match ``torchvision.ops.nms``: process candidates in
descending score order (ties broken by original index), suppress any
lower-scored box with IoU **strictly greater** than ``iou_threshold``.

A fused Pallas kernel with the same contract lives in
``fdtpu/kernels/nms_pallas.py``; this module is the pure-XLA reference
implementation and the fallback on non-TPU backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fdtpu.core.boxes import box_iou, xywh_to_xyxy, xyxy_to_xywh
from fdtpu.core.grid import decode_grid
from fdtpu.core.priors import decode_ssd

DEFAULT_CAPACITY = 128


def nms(
    candidates: jnp.ndarray,
    probability_threshold: float,
    iou_threshold: float,
    capacity: int = DEFAULT_CAPACITY,
    round_boxes: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Filter + greedy-NMS pixel-space candidates.

    Args:
      candidates: ``(N, 5)`` cxywh rows ``[conf, x, y, w, h]`` in pixels.
      probability_threshold: keep rows with ``conf > thr``
        (``utils.py:111-116``, strict ``>``).
      iou_threshold: suppress rows with IoU ``>`` this vs a kept row.
      capacity: static output size; only the top-``capacity`` scores enter the
        suppression loop. (The reference considers *all* above-threshold rows;
        with its thresholds the count is far below this capacity.)
      round_boxes: round xyxy coords before IoU/NMS and in the output, like
        ``utils.py:162`` (``torch.round``).

    Returns:
      ``(boxes, mask)``: ``(capacity, 5)`` rows ``[score, x, y, w, h]`` in
      descending-score order and a ``(capacity,)`` bool mask of valid rows.
      Unbatched; ``jax.vmap`` over a batch dimension.
    """
    conf = candidates[:, 0]
    valid = conf > probability_threshold
    scores = jnp.where(valid, conf, -jnp.inf)

    k = min(capacity, candidates.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top = candidates[top_idx]
    top_valid = top_scores > -jnp.inf

    xyxy = xywh_to_xyxy(top[:, 1:5])
    if round_boxes:
        xyxy = jnp.round(xyxy)
    iou = box_iou(xyxy, xyxy)

    def body(i, keep):
        alive = keep[i] & top_valid[i]
        suppress = alive & (iou[i] > iou_threshold) & (jnp.arange(k) > i)
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, top_valid)

    out_xywh = xyxy_to_xywh(xyxy)  # utils.py:166-168 converts back post-NMS
    boxes = jnp.concatenate([top_scores[:, None], out_xywh], axis=-1)
    boxes = jnp.where(keep[:, None], boxes, 0.0)
    if capacity > k:
        boxes = jnp.pad(boxes, ((0, capacity - k), (0, 0)))
        keep = jnp.pad(keep, (0, capacity - k))
    return boxes, keep


def decode_filter_nms(
    fm: jnp.ndarray,
    num_patches: int,
    image_size: tuple[int, int],
    probability_threshold: float,
    iou_threshold: float,
    capacity: int = DEFAULT_CAPACITY,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """YOLO-grid decode + filter + NMS, the XLA equivalent of
    ``ReduceBoundingBoxes.forward`` (``utils.py:157-170``).

    ``fm``: ``(S, S, 5)`` fdtpu-layout grid map. Unbatched; vmap over batch.
    """
    cand = decode_grid(fm, num_patches, image_size)
    return nms(cand, probability_threshold, iou_threshold, capacity)


def ssd_decode_filter_nms(
    x: jnp.ndarray,
    patch_sizes: tuple[int, ...],
    image_size: tuple[int, int],
    probability_threshold: float,
    iou_threshold: float,
    capacity: int = DEFAULT_CAPACITY,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SSD prior decode + filter + NMS, the XLA equivalent of
    ``ReduceSSDBoundingBoxes.forward`` (``utils.py:79-92``).

    ``x``: ``(N, 5)`` encoded prior rows. Unbatched; vmap over batch.
    """
    cand = decode_ssd(x, patch_sizes, image_size)
    return nms(cand, probability_threshold, iou_threshold, capacity)


def ssd_output_filter_nms(
    x: jnp.ndarray,
    image_size: tuple[int, int],
    probability_threshold: float,
    iou_threshold: float,
    capacity: int = DEFAULT_CAPACITY,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Filter + NMS for **SSD model output**, which already has priors applied
    in-graph (``/root/reference/models/SSD.py:248``): only pixel scaling
    remains — the reference's ``with_priors=False`` decode path
    (``utils.py:57-67`` default, wired at ``SSD.py:118-124``).

    ``x``: ``(N, 5)`` normalized ``[score, x, y, w, h]``. Unbatched; vmap.
    """
    width, height = image_size
    sx = jnp.asarray([1.0, width, height, width, height], dtype=x.dtype)
    return nms(x * sx, probability_threshold, iou_threshold, capacity)


def compact_boxes(boxes, mask):
    """Host-side helper: drop masked rows -> ragged ``(n, 5)`` numpy array,
    matching the reference's ragged return (``utils.py:166-170``)."""
    import numpy as np

    boxes = np.asarray(boxes)
    mask = np.asarray(mask)
    return boxes[mask]
