"""YOLO-v1-style grid loss, batched.

Re-designs ``yolo_loss`` (``/root/reference/losses/YoloLoss.py:4-44``) as one
vectorized expression over the whole batch — the reference computes it in a
Python loop over samples (``/root/reference/models/ModelMeta.py:173-176``),
tripling per-step Python overhead; here a single fused VPU expression covers
the batch.

Terms (YoloLoss.py:24-38), per cell with occupancy ``o = gt_conf``::

    xy_loss   = 3 * o * ((gt_x - pred_x)^2 + (gt_y - pred_y)^2)
    wh_loss   = 3 * o * ((sqrt(gt_w) - sqrt(pred_w))^2 + (sqrt(gt_h) - sqrt(pred_h))^2)
    conf_loss = (o + (1 - o)/S) * (gt_conf - pred_conf)^2
    loss      = sum over cells (sum-reduced, not mean — ModelMeta.py:215 keeps
                the batch sum un-normalized; we default to the reference's sum
                and expose ``average`` for the fixed variant)

Deliberate fix (recorded per SURVEY.md §7 "faithful-vs-fixed"): the reference
pairs gt channel 1 with **pred channel 2** and vice versa
(``YoloLoss.py:17-18`` — ``pred_y, pred_x = pred_fm[[1, 2]]``), training the
net to emit x/y swapped relative to what its decoder reads
(``datasets/utils.py:118-126`` treats channel 1 as x for both). We pair
channels directly by default; ``compat_swap_xy=True`` reproduces the
reference's pairing for checkpoint-parity experiments.

The reference also scrubs NaNs in predictions to 0.1 (``YoloLoss.py:8-9``) —
a debugging vestige that hides divergence; we omit it (``TrainConfig.nan_check``
enables ``jax_debug_nans`` instead).
"""

from __future__ import annotations

import jax.numpy as jnp

COORD_WEIGHT = 3.0  # YoloLoss.py:24


def yolo_loss(
    pred_fm: jnp.ndarray,
    gt_fm: jnp.ndarray,
    compat_swap_xy: bool = False,
) -> jnp.ndarray:
    """Loss for one ``(S, S, 5)`` prediction/target pair -> scalar.

    Channels are ``(conf, x, y, w, h)``; predictions are post-sigmoid, so all
    terms (including the sqrt on w/h) are well-defined.
    """
    s = pred_fm.shape[-2]
    gt_conf, pred_conf = gt_fm[..., 0], pred_fm[..., 0]
    gt_x, gt_y = gt_fm[..., 1], gt_fm[..., 2]
    if compat_swap_xy:
        pred_y, pred_x = pred_fm[..., 1], pred_fm[..., 2]  # YoloLoss.py:17-18
    else:
        pred_x, pred_y = pred_fm[..., 1], pred_fm[..., 2]
    gt_w, gt_h = gt_fm[..., 3], gt_fm[..., 4]
    pred_w, pred_h = pred_fm[..., 3], pred_fm[..., 4]

    occupied = gt_conf
    empty = 1.0 - gt_conf
    no_object_weight = 1.0 / s  # YoloLoss.py:25 (1 / num_of_patches)

    xy_loss = COORD_WEIGHT * occupied * (
        (gt_x - pred_x) ** 2 + (gt_y - pred_y) ** 2
    )
    # sqrt with a floor: sigmoid in bf16 can round to exactly 0, where
    # d(sqrt)/dx = inf and the occupied*inf product becomes NaN under autodiff
    # (the blow-up the reference papers over with its NaN scrubs,
    # YoloLoss.py:8-9). The floor changes the loss by < 1e-6.
    _sqrt = lambda v: jnp.sqrt(jnp.maximum(v, 1e-12))
    wh_loss = COORD_WEIGHT * occupied * (
        (_sqrt(gt_w) - _sqrt(pred_w)) ** 2 + (_sqrt(gt_h) - _sqrt(pred_h)) ** 2
    )
    conf_loss = (occupied + empty * no_object_weight) * (gt_conf - pred_conf) ** 2
    return jnp.sum(xy_loss + wh_loss + conf_loss)


def yolo_loss_batch(
    pred_fms: jnp.ndarray,
    gt_fms: jnp.ndarray,
    compat_swap_xy: bool = False,
    average: bool = False,
) -> jnp.ndarray:
    """Batched loss over ``(B, S, S, 5)`` maps -> scalar.

    ``average=False`` reproduces the reference's un-normalized batch sum
    (``ModelMeta.py:173-176`` sums per-sample losses; the ``/len(y)`` is
    commented out at ``ModelMeta.py:215``).
    """
    total = yolo_loss(pred_fms, gt_fms, compat_swap_xy=compat_swap_xy)
    if average:
        total = total / pred_fms.shape[0]
    return total
