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

# Candidate-count ceiling above which nms_matrix's (N, N) IoU matrix is
# unaffordable (B x N^2 f32 OOM'd the v5e at 2,125 priors / b128). The matrix
# path is NOT a default anywhere — measured slower than both serial paths on
# TPU and CPU at every scale (BASELINE round-4 NMS section); it remains the
# exact, GSPMD-partitionable alternative (no pallas_call, no pre-truncation).
MATRIX_NMS_MAX_CANDIDATES = 1024


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


def nms_matrix(
    candidates: jnp.ndarray,
    probability_threshold: float,
    iou_threshold: float,
    capacity: int = DEFAULT_CAPACITY,
    round_boxes: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS resolved as a parallel fixed point (no serial loop).

    Same contract and *exact torchvision semantics* as :func:`nms` — but
    with NO top-``capacity`` pre-truncation (like the Pallas kernel, it
    considers ALL above-threshold candidates, so it stays exact under
    capacity saturation) and no O(capacity) sequential suppression loop.

    Why it is exact: over score-sorted candidates the greedy keep set is
    the unique solution of ``K_i = valid_i AND NOT any_{j<i}(K_j AND
    IoU(j, i) > thr)`` (induction over sorted position). The Jacobi
    iteration ``K <- F(K)`` from ``K0 = valid`` is antitone, and
    ``K^t_i = K*_i`` for every ``t >= i + 1`` (same induction), so ``N``
    iterations guarantee the greedy answer; in practice suppression
    dependency chains are 2-5 deep and the ``while_loop`` exits on the
    first consecutive-equality, each iteration being one ``(N,)x(N, N)``
    masked matvec.

    **Measured and rejected as a default** (BASELINE.md round-4 NMS
    section): the serial suppression loops were hypothesized to floor the
    NMS cost, but on both TPU and CPU this path loses to them at every
    candidate count (TPU b128: 1.6 vs 1.3 ms at 100 priors, 11.5 vs 1.3 ms
    at 1,024; OOM at 2,125) — the ``(N, N)`` IoU materialization swamps
    any loop-latency saving, and the serial paths' grid-scale cost turned
    out to be floor-bound, not loop-bound. Kept (with tests) as the exact
    alternative that is also GSPMD-partitionable (pure XLA, no
    ``pallas_call``) and never pre-truncates, should either property ever
    be needed under batch sharding.

    Replaces the same reference op (``torchvision.ops.nms``,
    ``/root/reference/datasets/utils.py:164``). Unbatched; vmap over batch
    (vmapped ``while_loop`` iterates until the slowest image converges).
    """
    n = candidates.shape[0]
    conf = candidates[:, 0]
    valid = conf > probability_threshold  # strict >, utils.py:111
    scores = jnp.where(valid, conf, -jnp.inf)

    # stable descending sort over ALL candidates: torch's stable sort keeps
    # the lowest original index first among equal scores (tie-break)
    order = jnp.argsort(-scores, stable=True)
    s_scores = scores[order]
    v = s_scores > -jnp.inf
    xyxy = xywh_to_xyxy(candidates[order][:, 1:5])
    if round_boxes:
        xyxy = jnp.round(xyxy)  # utils.py:162 rounds pre-NMS
    iou = box_iou(xyxy, xyxy)

    # sup[j, i]: j (higher score / earlier sorted) suppresses i when kept
    pos = jnp.arange(n)
    supf = (
        (iou > iou_threshold) & (pos[:, None] < pos[None, :])
    ).astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def body(state):
        _, keep, t = state
        # suppressed_i = any_j keep_j & sup[j, i]; 0/1 f32 sums are exact
        new = jnp.where(keep @ supf >= 0.5, 0.0, vf)
        return keep, new, t + 1

    def cond(state):
        prev, keep, t = state
        return jnp.logical_and(t < n, jnp.any(prev != keep))

    _, keep, _ = jax.lax.while_loop(
        cond, body, (-jnp.ones((n,), jnp.float32), vf, jnp.int32(0))
    )
    kept = keep > 0.5

    rows = jnp.concatenate([s_scores[:, None], xyxy_to_xywh(xyxy)], axis=-1)
    rows = jnp.where(kept[:, None], rows, 0.0)  # also clears -inf scores
    # compact kept rows to the front, preserving descending-score order:
    # stable argsort of (not kept) lists kept indices first, in order
    sel = jnp.argsort(jnp.logical_not(kept), stable=True)[:capacity]
    boxes, mask = rows[sel], kept[sel]
    if capacity > n:
        boxes = jnp.pad(boxes, ((0, capacity - n), (0, 0)))
        mask = jnp.pad(mask, (0, capacity - n))
    return boxes, mask


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
