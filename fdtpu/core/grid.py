"""YOLO-v1-style grid target encoding/decoding, vectorized for XLA.

Re-designs the reference's per-box Python loops as batched scatter/gather:

* encode: ``WIDERFaceDataset.convert_bbx_to_feature_map``
  (``/root/reference/datasets/WIDERFace/dataset.py:32-64``) — per-box Python
  ``for`` loop on the host -> :func:`encode_grid_targets`, a jit-able scatter
  that runs **on device inside the training step**.
* decode: ``ReduceBoundingBoxes.scale_batch_bbx_xywh`` + threshold
  (``/root/reference/datasets/utils.py:111-126, 157-170``) ->
  :func:`decode_grid` with static shapes (every cell becomes a candidate row;
  the confidence threshold becomes a mask instead of a gather).

Layout convention (deliberate deviation, see ``fdtpu/__init__.py``): feature
maps are ``(S, S, 5)`` indexed ``[y_cell, x_cell]`` with channels
``(conf, x_rel, y_rel, w_norm, h_norm)``. The reference stores ``fm[:,
i=x_cell, j=y_cell]`` (``dataset.py:61-63``) — i.e. spatially transposed
relative to its ``(C, H, W)`` input. Use
:func:`reference_fm_to_fdtpu` to convert when checking parity against
reference tensors or imported checkpoints.
"""

from __future__ import annotations

import jax.numpy as jnp


def encode_grid_targets(
    boxes: jnp.ndarray,
    mask: jnp.ndarray,
    num_patches: int,
    image_size: tuple[int, int],
) -> jnp.ndarray:
    """Encode padded pixel boxes into a ``(S, S, 5)`` YOLO grid target.

    Args:
      boxes: ``(..., K, 5)`` cxywh rows ``[conf, x, y, w, h]`` in pixels
        (top-left corner convention).
      mask: ``(..., K)`` bool validity of each row.
      num_patches: grid size ``S``.
      image_size: ``(width, height)`` in pixels.

    Semantics match ``dataset.py:32-64``: the cell index is computed from the
    box **top-left corner**, the relative offset uses the *unclamped* cell
    index while the write location uses the clamped one, and when several
    boxes land in one cell the **last one wins** (the reference's loop
    overwrite order).

    Unbatched ``(K, 5)`` input; ``jax.vmap`` over a batch dimension.
    """
    width, height = image_size
    s = num_patches
    x_patch = width / s
    y_patch = height / s

    conf = boxes[:, 0]
    x, y = boxes[:, 1], boxes[:, 2]
    w, h = boxes[:, 3], boxes[:, 4]

    i = jnp.floor(x / x_patch)  # x-cell index, unclamped (dataset.py:43)
    j = jnp.floor(y / y_patch)
    x_rel = (x - i * x_patch) / x_patch  # dataset.py:51-56
    y_rel = (y - j * y_patch) / y_patch
    w_n = w / width  # dataset.py:58-59
    h_n = h / height
    ic = jnp.clip(i, 0, s - 1).astype(jnp.int32)  # dataset.py:61-62
    jc = jnp.clip(j, 0, s - 1).astype(jnp.int32)

    vals = jnp.stack([conf, x_rel, y_rel, w_n, h_n], axis=-1)  # (K, 5)
    return _scatter_last_wins(vals, jc * s + ic, mask, s * s).reshape(s, s, 5)


def _scatter_last_wins(
    vals: jnp.ndarray, flat_idx: jnp.ndarray, mask: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """Scatter ``(K, 5)`` rows into ``(num_cells, 5)`` where, on collision,
    the highest ``k`` (last box in the reference's loop order) wins.

    One scatter-max + one gather instead of K sequential scatters — the
    vectorized equivalent of the reference's overwrite loop
    (``dataset.py:41-63``).
    """
    k = vals.shape[0]
    idx = jnp.where(mask, flat_idx, num_cells)  # invalid rows -> dump slot
    winner = jnp.full((num_cells + 1,), -1, dtype=jnp.int32)
    winner = winner.at[idx].max(jnp.arange(k, dtype=jnp.int32))
    winner = winner[:num_cells]
    gathered = vals[jnp.clip(winner, 0, k - 1)]
    return jnp.where(winner[:, None] >= 0, gathered, 0.0).astype(vals.dtype)


def decode_grid(
    fm: jnp.ndarray,
    num_patches: int,
    image_size: tuple[int, int],
) -> jnp.ndarray:
    """Decode a ``(..., S, S, 5)`` grid map to pixel-space candidates.

    Returns ``(..., S*S, 5)`` cxywh rows — every cell becomes a candidate with
    its own confidence; filtering is the caller's (masked-NMS) job. Math from
    ``ReduceBoundingBoxes.scale_batch_bbx_xywh``
    (``/root/reference/datasets/utils.py:118-126``)::

        x_pix = x_rel * x_patch + x_cell * x_patch
        y_pix = y_rel * y_patch + y_cell * y_patch
        w_pix = w_norm * width;  h_pix = h_norm * height
    """
    width, height = image_size
    s = num_patches
    x_patch = width / s
    y_patch = height / s

    cols = jnp.arange(s, dtype=fm.dtype)  # x-cell indices
    rows = jnp.arange(s, dtype=fm.dtype)  # y-cell indices
    conf = fm[..., 0]
    x = fm[..., 1] * x_patch + cols[None, :] * x_patch
    y = fm[..., 2] * y_patch + rows[:, None] * y_patch
    w = fm[..., 3] * width
    h = fm[..., 4] * height
    cand = jnp.stack([conf, x, y, w, h], axis=-1)
    return cand.reshape(fm.shape[:-3] + (s * s, 5))


def reference_fm_to_fdtpu(fm_ref: jnp.ndarray) -> jnp.ndarray:
    """Convert a reference-layout map ``(5, S, S)`` (``fm[:, x_cell, y_cell]``,
    ``dataset.py:61-63``) to fdtpu layout ``(S, S, 5)`` ``[y_cell, x_cell]``."""
    return jnp.transpose(fm_ref, (2, 1, 0))


def fdtpu_fm_to_reference(fm: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`reference_fm_to_fdtpu`."""
    return jnp.transpose(fm, (2, 1, 0))
