"""Fused decode + confidence-filter + NMS as ONE Pallas TPU kernel.

The BASELINE.json north star: "inference-side box decode + confidence filter
+ NMS run as a single Pallas kernel" replacing the reference's host-side
gather + native ``torchvision.ops.nms`` chain
(``/root/reference/datasets/utils.py:157-170``). Contract and semantics
match the pure-XLA ``fdtpu.core.nms`` path (the non-TPU fallback and test
oracle) whenever at most ``capacity`` candidates pass the threshold — the
realistic trained-model regime, where outputs are bit-identical. Under
saturation (> capacity above-threshold candidates, e.g. crowded scenes or
untrained nets) they legitimately diverge: the XLA path truncates to the
top-``capacity`` scores BEFORE suppression (its static-shape compromise),
while this kernel greedily scans ALL candidates — exact torchvision
semantics (measured + recorded in BASELINE.md).

Design notes:

* **Decode is linear.** Every decode variant (YOLO grid, SSD raw priors, SSD
  model output) is ``pixel = value * scale + offset`` with per-row constants,
  so one kernel serves all three — callers pass the right tables
  (:func:`grid_decode_tables` / :func:`ssd_decode_tables` /
  :func:`ssd_output_decode_tables`), computed once per model config.
* **Greedy NMS without sorting.** ``capacity`` iterations of (masked argmax
  -> emit -> suppress overlaps) on ``(R, 128)`` VPU-shaped planes. Exact
  torchvision semantics: descending score order, lowest-index tie-break,
  suppression strictly above ``iou_threshold``, coords rounded pre-NMS
  (``utils.py:162``). Cost K*N VPU ops — micro-seconds at N=4774, K=128 —
  while staying entirely in VMEM: no host round-trip, no sort, no dynamic
  shapes.
* Candidate count is padded to a multiple of 1024 (8 sublanes x 128 lanes,
  f32 tile) with confidence -1 sentinel rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_PAD = 1024  # 8 sublanes x 128 lanes (f32 tile)
# VMEM budget for the nine (tile, N_pad) f32 planes of the batched kernel
# (tests shrink this to force multi-tile execution on small shapes)
_VMEM_PLANE_BUDGET = 6 * 1024 * 1024


def pallas_nms_available() -> bool:
    """True when running on a TPU backend (the kernel also runs anywhere via
    ``interpret=True``, which the tests use)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# -- decode tables ------------------------------------------------------------


def grid_decode_tables(num_patches: int, image_size: tuple[int, int]):
    """Per-candidate (scale_x, off_x, scale_y, off_y, scale_w, scale_h) for a
    row-major-flattened ``(S, S, 5)`` grid map (math from
    ``utils.py:118-126``)."""
    width, height = image_size
    s = num_patches
    xp, yp = width / s, height / s
    cols = np.tile(np.arange(s, dtype=np.float32), s)  # x-cell per flat row
    rows = np.repeat(np.arange(s, dtype=np.float32), s)
    n = s * s
    return (
        np.full(n, xp, np.float32), cols * xp,
        np.full(n, yp, np.float32), rows * yp,
        float(width), float(height),
    )


def ssd_decode_tables(patch_sizes: tuple[int, ...], image_size: tuple[int, int]):
    """Tables for raw encoded SSD rows (priors NOT yet applied):
    ``x_pix = (x_enc / ps + prior_x) * W`` (``utils.py:57-66``)."""
    from fdtpu.core.priors import calculate_priors, prior_scales

    width, height = image_size
    priors = np.asarray(calculate_priors(patch_sizes))
    scales = np.asarray(prior_scales(patch_sizes))
    return (
        scales * width, priors[:, 0] * width,
        scales * height, priors[:, 1] * height,
        float(width), float(height),
    )


def ssd_output_decode_tables(num_priors: int, image_size: tuple[int, int]):
    """Tables for SSD **model output** (priors applied in-graph,
    ``SSD.py:248``): pixel scaling only."""
    width, height = image_size
    n = num_priors
    return (
        np.full(n, width, np.float32), np.zeros(n, np.float32),
        np.full(n, height, np.float32), np.zeros(n, np.float32),
        float(width), float(height),
    )


# -- the kernel ----------------------------------------------------------------


def _nms_kernel(
    conf_ref, xr_ref, yr_ref, wr_ref, hr_ref, sx_ref, ox_ref, sy_ref, oy_ref,
    out_ref,
    *,
    prob_thr: float,
    iou_thr: float,
    capacity: int,
    w_scale: float,
    h_scale: float,
    round_boxes: bool,
):
    conf = conf_ref[:]
    # fused decode (utils.py:118-126) + xyxy + rounding (utils.py:162)
    x = xr_ref[:] * sx_ref[:] + ox_ref[:]
    y = yr_ref[:] * sy_ref[:] + oy_ref[:]
    w = wr_ref[:] * w_scale
    h = hr_ref[:] * h_scale
    x0, y0 = x, y
    x1, y1 = x + w, y + h
    if round_boxes:
        x0, y0, x1, y1 = (jnp.round(v) for v in (x0, y0, x1, y1))
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)

    r, l = conf.shape
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (r, l), 0) * l
        + jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    )
    big = jnp.int32(r * l + 1)

    out_ref[:] = jnp.zeros_like(out_ref)
    # The alive mask is carried as f32 (1.0/0.0): Mosaic mis-lays-out i1
    # vectors carried through scf.for (mask_cast/andi layout mismatch), and
    # float multiply-masking lowers cleanly on the VPU.
    alive0 = (conf > prob_thr).astype(jnp.float32)  # strict >, utils.py:111

    def body(k, alive):
        sc = jnp.where(alive > 0.5, conf, -1.0)
        best = jnp.max(sc)
        valid = (best > -0.5).astype(jnp.float32)
        # lowest flat index achieving the max (torch stable-sort tie-break)
        idx = jnp.min(jnp.where(sc == best, flat, big))
        onehot = (flat == idx).astype(jnp.float32)
        pick = lambda v: jnp.sum(v * onehot)
        bx0, by0, bx1, by1 = pick(x0), pick(y0), pick(x1), pick(y1)
        barea = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)

        row = valid * jnp.stack(
            [1.0, best, bx0, by0, bx1 - bx0, by1 - by0, 0.0, 0.0]
        )
        out_ref[k, :] = row

        ix0 = jnp.maximum(x0, bx0)
        iy0 = jnp.maximum(y0, by0)
        ix1 = jnp.minimum(x1, bx1)
        iy1 = jnp.minimum(y1, by1)
        inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        survive = (iou <= iou_thr).astype(jnp.float32) * (1.0 - onehot)
        return alive * survive * valid

    _greedy_loop(body, alive0, capacity)


def _greedy_loop(body, alive0, capacity: int, chunk: int = 8):
    """Run ``capacity`` greedy iterations with early exit: a ``while_loop``
    over ``chunk``-iteration blocks that stops once no candidate is alive
    anywhere in the tile. Bit-identical to the plain ``fori_loop`` — skipped
    iterations would only re-write the pre-zeroed output rows (their
    ``valid`` is 0 once ``alive`` is empty) — but in the realistic trained
    regime (tens of detections, sparse survivors) it skips most of the
    ``capacity`` budget. The alive carry stays f32 (Mosaic i1-carry
    mis-layout, see module docstring note in the kernel body)."""

    def chunk_body(state):
        k0, alive = state
        alive = jax.lax.fori_loop(
            k0, jnp.minimum(k0 + chunk, capacity), body, alive
        )
        return k0 + chunk, alive

    def cond(state):
        k0, alive = state
        return jnp.logical_and(k0 < capacity, jnp.max(alive) > 0.5)

    jax.lax.while_loop(cond, chunk_body, (jnp.int32(0), alive0))


def _batched_nms_kernel(
    conf_ref, xr_ref, yr_ref, wr_ref, hr_ref, sx_ref, ox_ref, sy_ref, oy_ref,
    out_ref,
    *,
    prob_thr: float,
    iou_thr: float,
    capacity: int,
    w_scale: float,
    h_scale: float,
    round_boxes: bool,
):
    """Whole-batch variant: planes are ``(B, N_pad)`` with per-image
    reductions along axis 1, so the ``capacity``-iteration greedy loop is
    shared by every image — B-fold amortization of loop and reduction
    latency versus one kernel per image."""
    conf = conf_ref[:]
    x = xr_ref[:] * sx_ref[:] + ox_ref[:]
    y = yr_ref[:] * sy_ref[:] + oy_ref[:]
    w = wr_ref[:] * w_scale
    h = hr_ref[:] * h_scale
    x0, y0 = x, y
    x1, y1 = x + w, y + h
    if round_boxes:
        x0, y0, x1, y1 = (jnp.round(v) for v in (x0, y0, x1, y1))
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)

    b, n = conf.shape
    cand = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    big = jnp.int32(n + 1)

    out_ref[:] = jnp.zeros_like(out_ref)
    alive0 = (conf > prob_thr).astype(jnp.float32)

    def body(k, alive):
        sc = jnp.where(alive > 0.5, conf, -1.0)
        best = jnp.max(sc, axis=1, keepdims=True)  # (B, 1)
        valid = (best > -0.5).astype(jnp.float32)
        idx = jnp.min(
            jnp.where(sc == best, cand, big), axis=1, keepdims=True
        )
        onehot = (cand == idx).astype(jnp.float32)  # (B, N)
        pick = lambda v: jnp.sum(v * onehot, axis=1, keepdims=True)
        bx0, by0, bx1, by1 = pick(x0), pick(y0), pick(x1), pick(y1)
        barea = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)

        row = valid * jnp.concatenate(
            [valid, best, bx0, by0, bx1 - bx0, by1 - by0,
             jnp.zeros_like(best), jnp.zeros_like(best)],
            axis=1,
        )  # (B, 8)
        out_ref[:, k, :] = row

        ix0 = jnp.maximum(x0, bx0)
        iy0 = jnp.maximum(y0, by0)
        ix1 = jnp.minimum(x1, bx1)
        iy1 = jnp.minimum(y1, by1)
        inter = jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        survive = (iou <= iou_thr).astype(jnp.float32) * (1.0 - onehot)
        return alive * survive * valid

    _greedy_loop(body, alive0, capacity)


def _batch_tile(bsz: int, n_pad: int) -> int:
    """Batch-tile size for the batched kernel's 1-D grid: VMEM holds one tile
    of the nine (B, N_pad) f32 planes, not all of them — SSD (4774 -> 4864
    priors) at b128 would need ~22 MB resident otherwise (> v5e VMEM).
    Budget ~6 MB for the planes; the greedy loop's intermediates and the
    output tile take the rest. Mosaic requires the block's sublane dim (the
    batch tile) to be a multiple of 8 unless it equals the whole array dim,
    so the tile rounds down to one (interpret-mode tests can't catch this —
    lowering only runs on real TPU)."""
    tb = min(bsz, _VMEM_PLANE_BUDGET // (9 * n_pad * 4))
    if tb < bsz:
        tb = tb // 8 * 8
    return max(8, tb)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _pallas_nms_batched(
    values,  # (B, N, 5)
    tables,  # (sx, ox, sy, oy) each (N,)
    w_scale: float,
    h_scale: float,
    prob_thr: float,
    iou_thr: float,
    capacity: int,
    round_boxes: bool,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, n = values.shape[0], values.shape[1]
    n_pad = -(-n // _LANES) * _LANES
    tb = _batch_tile(bsz, n_pad)
    b_pad = -(-bsz // tb) * tb

    def plane(v, fill=0.0):
        return jnp.pad(
            v.astype(jnp.float32),
            ((0, b_pad - bsz), (0, n_pad - n)),
            constant_values=fill,
        )

    conf = plane(values[..., 0], fill=-1.0)
    planes = [conf] + [plane(values[..., i + 1]) for i in range(4)]
    # decode tables are identical for every batch row: materialize ONE
    # tile-height copy and map every grid step to block (0, 0) instead of
    # streaming a (b_pad, n_pad) broadcast from HBM per tile
    planes += [
        jnp.broadcast_to(
            jnp.pad(t.astype(jnp.float32), (0, n_pad - n)), (tb, n_pad)
        )
        for t in tables
    ]

    kernel = functools.partial(
        _batched_nms_kernel,
        prob_thr=prob_thr,
        iou_thr=iou_thr,
        capacity=capacity,
        w_scale=w_scale,
        h_scale=h_scale,
        round_boxes=round_boxes,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // tb,),
        out_shape=jax.ShapeDtypeStruct((b_pad, capacity, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec((tb, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 5 + [
            pl.BlockSpec((tb, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=pl.BlockSpec(
            (tb, capacity, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*planes)
    out = out[:bsz]
    boxes = out[..., 1:6]
    mask = out[..., 0] > 0.5
    return boxes, mask


def pallas_decode_filter_nms_batch(
    values: jnp.ndarray,
    tables,
    probability_threshold: float,
    iou_threshold: float,
    capacity: int = 128,
    round_boxes: bool = True,
    interpret: bool | None = None,
):
    """Batched fused decode+filter+NMS: ``values`` is ``(B, N, 5)``; one
    kernel invocation serves the whole batch. Same contract as vmapping
    :func:`pallas_decode_filter_nms`, substantially faster."""
    sx, ox, sy, oy, w_scale, h_scale = tables
    if interpret is None:
        interpret = not pallas_nms_available()
    return _pallas_nms_batched(
        values,
        (jnp.asarray(sx), jnp.asarray(ox), jnp.asarray(sy), jnp.asarray(oy)),
        w_scale,
        h_scale,
        probability_threshold,
        iou_threshold,
        capacity,
        round_boxes,
        interpret,
    )


@functools.partial(
    jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8)
)
def _pallas_nms(
    values,  # (N, 5) raw rows [conf, x, y, w, h]
    tables,  # (sx, ox, sy, oy) each (N,)
    w_scale: float,
    h_scale: float,
    prob_thr: float,
    iou_thr: float,
    capacity: int,
    round_boxes: bool,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = values.shape[0]
    n_pad = -(-n // _PAD) * _PAD
    r = n_pad // _LANES

    def plane(v, fill=0.0):
        return jnp.pad(
            v.astype(jnp.float32), (0, n_pad - n), constant_values=fill
        ).reshape(r, _LANES)

    conf = plane(values[:, 0], fill=-1.0)
    planes = [conf] + [plane(values[:, i + 1]) for i in range(4)]
    planes += [plane(t) for t in tables]

    kernel = functools.partial(
        _nms_kernel,
        prob_thr=prob_thr,
        iou_thr=iou_thr,
        capacity=capacity,
        w_scale=w_scale,
        h_scale=h_scale,
        round_boxes=round_boxes,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((capacity, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*planes)
    boxes = out[:, 1:6]
    mask = out[:, 0] > 0.5
    return boxes, mask


def pallas_decode_filter_nms(
    values: jnp.ndarray,
    tables,
    probability_threshold: float,
    iou_threshold: float,
    capacity: int = 128,
    round_boxes: bool = True,
    interpret: bool | None = None,
):
    """Fused decode+filter+NMS. ``values``: ``(N, 5)`` raw model/encode rows;
    ``tables``: from one of the ``*_decode_tables`` builders. Returns
    ``(boxes (capacity, 5) [score, x, y, w, h] pixels, mask)`` — same
    contract as ``fdtpu.core.nms``. Unbatched; vmap over batch."""
    sx, ox, sy, oy, w_scale, h_scale = tables
    if interpret is None:
        interpret = not pallas_nms_available()
    return _pallas_nms(
        values,
        (jnp.asarray(sx), jnp.asarray(ox), jnp.asarray(sy), jnp.asarray(oy)),
        w_scale,
        h_scale,
        probability_threshold,
        iou_threshold,
        capacity,
        round_boxes,
        interpret,
    )
