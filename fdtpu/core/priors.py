"""SSD-style multi-scale prior grid: priors, target encoding, decoding.

Re-designs the reference SSD target machinery as static-shape XLA ops:

* priors: ``SSD.calculate_priors`` / ``ReduceSSDBoundingBoxes.calculate_priors``
  (``/root/reference/models/SSD.py:192-204``,
  ``/root/reference/datasets/utils.py:36-48``) -> :func:`calculate_priors`.
* per-prior scale (the reference's ``multiply_priors``, ``SSD.py:108-112``)
  -> :func:`prior_scales`.
* target encoding: ``WIDERFaceDatasetSSD.convert_bbx_to_feature_map``
  (``/root/reference/datasets/WIDERFace/dataset_ssd.py:36-76``) — a per-box,
  per-scale Python loop on the host -> :func:`encode_ssd_targets`, a jit-able
  scatter run on device.
* decoding: ``ReduceSSDBoundingBoxes.scale_batch_bbx_xywh``
  (``/root/reference/datasets/utils.py:57-67``) -> :func:`apply_priors` +
  :func:`decode_ssd`.

Default scales ``(60, 30, 15, 7)`` give ``60² + 30² + 15² + 7² = 4774`` priors
(``SSD.py:99``). Each prior is an anchor at a grid-cell top-left corner with
zero extent; encoded rows are ``(conf, x_cell_rel, y_cell_rel, w_norm,
h_norm)`` with confidence docked by ``0.001 * patch_size`` so smaller-grid
(larger) cells score lower (``dataset_ssd.py:58-59``).

Flat prior order (deliberate deviation): within each scale we flatten
**row-major over (y_cell, x_cell)** to match NHWC conv-output flattening; the
reference flattens x-cell-major, consistent with its transposed grid
convention (see ``fdtpu/core/grid.py``). No official SSD checkpoint exists, so
no import-parity constraint applies.
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_PATCH_SIZES: tuple[int, ...] = (60, 30, 15, 7)


def num_priors(patch_sizes: tuple[int, ...] = DEFAULT_PATCH_SIZES) -> int:
    return sum(ps * ps for ps in patch_sizes)


def calculate_priors(
    patch_sizes: tuple[int, ...] = DEFAULT_PATCH_SIZES,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """``(N, 4)`` prior offsets ``[x_cell/ps, y_cell/ps, 0, 0]`` in [0, 1].

    Math from ``SSD.py:192-204`` (grid-corner anchors, zero extent).
    """
    parts = []
    for ps in patch_sizes:
        rows = jnp.arange(ps, dtype=dtype)  # y-cell
        cols = jnp.arange(ps, dtype=dtype)  # x-cell
        x_off = jnp.tile(cols / ps, (ps, 1))  # (row, col)
        y_off = jnp.tile((rows / ps)[:, None], (1, ps))
        zeros = jnp.zeros((ps, ps), dtype=dtype)
        parts.append(
            jnp.stack([x_off, y_off, zeros, zeros], axis=-1).reshape(ps * ps, 4)
        )
    return jnp.concatenate(parts, axis=0)


def prior_scales(
    patch_sizes: tuple[int, ...] = DEFAULT_PATCH_SIZES,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """``(N,)`` per-prior cell size ``1/ps`` (reference ``multiply_priors``,
    ``SSD.py:108-112``)."""
    return jnp.concatenate(
        [jnp.full((ps * ps,), 1.0 / ps, dtype=dtype) for ps in patch_sizes]
    )


def encode_ssd_targets(
    boxes: jnp.ndarray,
    mask: jnp.ndarray,
    patch_sizes: tuple[int, ...],
    image_size: tuple[int, int],
) -> jnp.ndarray:
    """Encode padded pixel boxes to a ``(N, 5)`` multi-scale prior target.

    Semantics from ``dataset_ssd.py:36-76``: boxes are first normalized to
    [0, 1] by image width/height; at every scale each box is assigned to the
    cell containing its top-left corner; xy are cell-relative (x ``ps``),
    wh stay image-normalized; confidence is docked ``0.001 * ps``; last write
    wins per cell. Unbatched; ``jax.vmap`` over a batch dimension.
    """
    width, height = image_size
    conf = boxes[:, 0]
    x_n = boxes[:, 1] / width
    y_n = boxes[:, 2] / height
    w_n = boxes[:, 3] / width
    h_n = boxes[:, 4] / height

    from fdtpu.core.grid import _scatter_last_wins

    parts = []
    for ps in patch_sizes:
        i = jnp.floor(x_n * ps)  # x-cell, unclamped (dataset_ssd.py:51)
        j = jnp.floor(y_n * ps)
        conf_enc = conf - 0.001 * ps  # dataset_ssd.py:58-59
        x_enc = (x_n - i / ps) * ps  # dataset_ssd.py:62-68
        y_enc = (y_n - j / ps) * ps
        ic = jnp.clip(i, 0, ps - 1).astype(jnp.int32)
        jc = jnp.clip(j, 0, ps - 1).astype(jnp.int32)
        vals = jnp.stack([conf_enc, x_enc, y_enc, w_n, h_n], axis=-1)
        parts.append(_scatter_last_wins(vals, jc * ps + ic, mask, ps * ps))
    return jnp.concatenate(parts, axis=0)


def apply_priors(
    x: jnp.ndarray,
    priors: jnp.ndarray,
    scales: jnp.ndarray,
) -> jnp.ndarray:
    """Map encoded rows ``(..., N, 5)`` to normalized-[0,1] boxes.

    Math from ``SSD.py:206-220`` / ``utils.py:57-63``::

        x = x_enc * (1/ps) + prior_x;  y = y_enc * (1/ps) + prior_y
        w, h unchanged (prior extent is zero)
    """
    conf = x[..., 0]
    xy = x[..., 1:3] * scales[:, None] + priors[:, 0:2]
    wh = x[..., 3:5] + priors[:, 2:4]
    return jnp.concatenate([conf[..., None], xy, wh], axis=-1)


def decode_ssd(
    x: jnp.ndarray,
    patch_sizes: tuple[int, ...],
    image_size: tuple[int, int],
    priors: jnp.ndarray | None = None,
    scales: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Decode ``(..., N, 5)`` encoded rows to pixel-space cxywh candidates.

    Composes :func:`apply_priors` with the pixel scaling of
    ``utils.py:64-66`` (x/w by width, y/h by height).
    """
    if priors is None:
        priors = calculate_priors(patch_sizes, dtype=x.dtype)
    if scales is None:
        scales = prior_scales(patch_sizes, dtype=x.dtype)
    width, height = image_size
    out = apply_priors(x, priors, scales)
    sx = jnp.asarray([1.0, width, height, width, height], dtype=x.dtype)
    return out * sx
