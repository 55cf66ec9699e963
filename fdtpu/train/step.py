"""Jitted train/eval steps: one fused XLA program per step.

Replaces the reference's Lightning ``step()`` (``/root/reference/models/
ModelMeta.py:115-227``), which per training step runs **three** forward passes
(metrics pass + two closure evaluations) plus Python loops over the batch for
loss and metrics and per-sample native NMS. Here one program does:

    device augmentation -> target encoding (scatter) -> forward -> loss ->
    SAM two-point grads -> Adam update [-> optional masked metrics]

Deliberate fixes (recorded per SURVEY.md §7):

* gradients use the batch-mean loss (the reference's effective gradients come
  from the un-normalized sum, ``ModelMeta.py:173-176,215`` — with Adam the
  scale mostly cancels; the *reported* loss stays the reference's sum);
* the SSD localisation target gets priors applied so it lives in the same
  coordinate space as the model output (the reference regresses prior-applied
  predictions against cell-relative targets, ``ModelMetaSSD.py:175`` vs
  ``SSD.py:248`` — an inconsistency that decodes to wrong positions);
* train-time metrics compare against the **raw** ground-truth boxes instead
  of re-decoding the encoded grid (``ModelMeta.py:184-188`` decodes its own
  encoding, losing boxes that share a cell).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from fdtpu.core.grid import encode_grid_targets
from fdtpu.core.nms import decode_filter_nms, ssd_output_filter_nms
from fdtpu.core.priors import (
    apply_priors,
    calculate_priors,
    encode_ssd_targets,
    prior_scales,
)
from fdtpu.data.augment import augment_batch_fast
from fdtpu.losses.ssd import ssd_loss
from fdtpu.losses.yolo import yolo_loss
from fdtpu.models.detector import is_ssd
from fdtpu.train.metrics import detection_metrics
from fdtpu.train.sam import sam_gradients
from fdtpu.train.state import TrainState
from fdtpu.utils.config import TrainConfig


def _prepare_inputs(images, boxes, box_mask, rng, augment: bool,
                    rotate: bool = False, positional_crop: bool = False):
    """uint8 batch -> float [0,1] batch (+ augmented boxes)."""
    if augment:
        return augment_batch_fast(rng, images, boxes, box_mask, rotate=rotate,
                                  positional_crop=positional_crop)
    imgs = images.astype(jnp.float32) / 255.0
    return imgs, boxes, box_mask & (boxes[..., 3] * boxes[..., 4] >= 10.0)


def _encode_targets(module, boxes, box_mask, image_size):
    """Padded pixel boxes -> model-space targets, on device."""
    if is_ssd(module):
        ps = tuple(module.patch_sizes)
        enc = jax.vmap(lambda b, m: encode_ssd_targets(b, m, ps, image_size))(
            boxes, box_mask
        )
        priors = calculate_priors(ps, dtype=enc.dtype)
        scales = prior_scales(ps, dtype=enc.dtype)
        gt_locs = apply_priors(enc, priors, scales)[..., 1:5]  # coordinate fix
        return enc, gt_locs
    # The encode grid must match the model's *actual* output grid, which the
    # conv geometry determines (it can differ from the num_patches config —
    # e.g. PoolResnet's default stem/head at 160px yields 15, not 10).
    s = module.grid_size()
    enc = jax.vmap(lambda b, m: encode_grid_targets(b, m, s, image_size))(
        boxes, box_mask
    )
    return enc, None


def _decode_predictions(module, out, image_size, prob, iou, capacity,
                        pallas_nms: bool | None = None):
    from fdtpu.kernels import (
        grid_decode_tables,
        pallas_decode_filter_nms_batch,
        pallas_nms_available,
        ssd_output_decode_tables,
    )

    if pallas_nms is None:
        # Batch-aware default (round-5 serving-band measurement,
        # logs/round5/serving_band.json): from b8 up the fused batched
        # Pallas kernel overlaps the forward entirely (+0.01 ms), but its
        # grid-blocked fixed cost dominates tiny batches (b4: +0.88 ms vs
        # +0.04 for the vmapped XLA twin; b1/b2 +0.14/+0.17 vs +0.10/+0.04).
        # The paths are bit-identical below capacity saturation; above it
        # the XLA twin pre-truncates to top-capacity scores (ledger'd).
        pallas_nms = pallas_nms_available() and out.shape[0] >= 8
    if pallas_nms:
        # whole-batch fused Pallas kernel (faster than the vmapped XLA path
        # on TPU; see fdtpu/kernels/nms_pallas.py)
        if is_ssd(module):
            tables = ssd_output_decode_tables(out.shape[1], image_size)
            vals = out
        else:
            tables = grid_decode_tables(module.grid_size(), image_size)
            vals = out.reshape(out.shape[0], -1, 5)
        return pallas_decode_filter_nms_batch(
            vals, tables, prob, iou, capacity, interpret=False
        )
    if is_ssd(module):
        fn = lambda o: ssd_output_filter_nms(o, image_size, prob, iou, capacity)
    else:
        fn = lambda o: decode_filter_nms(
            o, module.grid_size(), image_size, prob, iou, capacity
        )
    return jax.vmap(fn)(out)


def _loss_and_out(module, params, batch_stats, images, enc, gt_locs,
                  rng, train: bool, neg_pos_ratio: int, sample_mask=None,
                  bg_push: float = 0.0):
    """-> (mean loss, (sum loss, model out, new batch_stats)).

    ``sample_mask`` excludes padded samples (the final partial batch repeats
    its last real sample, pipeline.py) from both loss terms — otherwise the
    repeated sample is gradient-weighted by the pad count.
    """
    variables = {"params": params}
    mutable = []
    if batch_stats:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"]
    rngs = {"dropout": rng} if train else None
    if mutable:
        out, updates = module.apply(
            variables, images, train=train, rngs=rngs, mutable=mutable
        )
        new_stats = updates.get("batch_stats", batch_stats)
    else:
        out = module.apply(variables, images, train=train, rngs=rngs)
        new_stats = batch_stats
    if sample_mask is None:
        sample_mask = jnp.ones((images.shape[0],), dtype=bool)
    if is_ssd(module):
        # zero padded samples' labels: no positives and (num_neg = ratio *
        # num_pos = 0) no mined negatives -> zero contribution
        enc = enc * sample_mask[:, None, None]
        loss_sum = ssd_loss(
            out[..., 0], out[..., 1:5], enc[..., 0], gt_locs, neg_pos_ratio,
            bg_push,
        )
        # ssd_loss is already /num_pos-normalized (SSDLoss.py:85-86); use as-is
        mean = loss_sum
    else:
        per_sample = jax.vmap(yolo_loss)(out, enc)
        loss_sum = jnp.sum(per_sample * sample_mask)  # ModelMeta.py:173-176
        mean = loss_sum / jnp.maximum(jnp.sum(sample_mask), 1)
    return mean, (loss_sum, out, new_stats)


def _grad_all_reduce(axis_name: str | None, norm):
    """Cross-shard gradient all-reduce that reproduces the single-device
    batch-mean gradient EXACTLY: each shard's mean-loss gradient is
    un-normalized by its own weight (``max(norm_local, 1)`` — the divisor
    ``_loss_and_out`` applied), psum'd, and re-normalized by the *global*
    divisor ``max(psum(norm), 1)``. Plain ``pmean`` is only exact when every
    shard has the same weight; this form also matches under partial batches
    (uneven ``sample_mask``) and SSD's num-positives normalization."""
    if axis_name is None:
        return None
    norm = norm.astype(jnp.float32)
    w_local = jnp.maximum(norm, 1.0)
    denom = jnp.maximum(jax.lax.psum(norm, axis_name), 1.0)

    def reduce(grads):
        scaled = jax.tree_util.tree_map(lambda g: g * w_local.astype(g.dtype), grads)
        summed = jax.lax.psum(scaled, axis_name)
        return jax.tree_util.tree_map(
            lambda g: g / denom.astype(g.dtype), summed
        )

    return reduce


def _loss_norm(module, enc, sample_mask):
    """The divisor ``_loss_and_out`` uses to turn the summed loss into the
    gradient loss: valid-sample count (YOLO) or positive-prior count (SSD,
    ``SSDLoss.py:85-86`` — computed on the padded-sample-zeroed labels)."""
    if is_ssd(module):
        return jnp.sum((enc[..., 0] > 0) & sample_mask[:, None])
    return jnp.sum(sample_mask)


def _reduce_loss_sum(axis_name, loss_sum, norm, normalized: bool):
    """Cross-shard reduction of the *reported* loss. YOLO's ``loss_sum`` is
    an un-normalized sum, so a plain psum is exact. SSD's is already
    /num_pos-normalized per shard (``SSDLoss.py:85-86``) and per-shard
    ``num_pos`` is generally uneven, so it must be un-normalized by the
    local divisor, psum'd, and re-normalized by the global one — the same
    weighting as ``_grad_all_reduce`` (a raw psum of locally-normalized
    shard losses over-reports by up to the shard count)."""
    if not normalized:
        return jax.lax.psum(loss_sum, axis_name)
    norm = norm.astype(jnp.float32)
    w_local = jnp.maximum(norm, 1.0).astype(loss_sum.dtype)
    denom = jnp.maximum(jax.lax.psum(norm, axis_name), 1.0)
    return (jax.lax.psum(loss_sum * w_local, axis_name)
            / denom.astype(loss_sum.dtype))


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    config: TrainConfig,
    augment: bool = True,
    compute_metrics: bool = False,
    nms_params: tuple[float, float, int] = (0.5, 0.5, 64),
    neg_pos_ratio: int = 10,
    jit: bool = True,
    pallas_nms: bool | None = None,
    bg_push: float = 0.0,
    axis_name: str | None = None,
) -> Callable:
    """Build the jitted training step.

    Returned signature: ``step(state, images_u8, boxes, box_mask,
    sample_mask, rng) -> (state, scalars dict)``. ``jit=False`` returns the
    raw traceable function (for embedding in ``lax.scan`` step-batching or a
    custom pjit wrapper).

    ``axis_name``: when set, the step is an SPMD *per-shard* body meant to
    run under ``shard_map`` over that mesh axis — gradients are all-reduced
    across shards (exact batch-mean semantics, inside SAM's two points),
    the reported ``loss`` is psum'd, batch stats are pmean'd, and detection
    metrics are valid-count-weighted across shards. The caller is
    responsible for feeding a distinct ``rng`` per shard (fold in
    ``jax.lax.axis_index``) so augmentation/dropout streams differ.
    """
    image_size = (module.input_shape[1], module.input_shape[0])
    prob, iou_thr, capacity = nms_params

    def step_fn(state: TrainState, images, boxes, box_mask, sample_mask, rng):
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        imgs, bx, bm = _prepare_inputs(
            images, boxes, box_mask, aug_rng, augment,
            rotate=config.rotate_device,
            positional_crop=bool(config.positional_crop),
        )
        enc, gt_locs = _encode_targets(module, bx, bm, image_size)

        loss_fn = lambda p: _loss_and_out(
            module, p, state.batch_stats, imgs, enc, gt_locs,
            drop_rng, True, neg_pos_ratio, sample_mask, bg_push,
        )
        norm = _loss_norm(module, enc, sample_mask)
        grad_reduce = _grad_all_reduce(axis_name, norm)
        if config.use_sam:
            loss, aux, grads = sam_gradients(
                loss_fn, state.params, config.sam_rho, grad_reduce=grad_reduce
            )
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            if grad_reduce is not None:
                grads = grad_reduce(grads)
        loss_sum, out, new_stats = aux
        if axis_name is not None:
            loss_sum = _reduce_loss_sum(axis_name, loss_sum, norm,
                                        is_ssd(module))
            if new_stats:
                new_stats = jax.lax.pmean(new_stats, axis_name)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        scalars = {"loss": loss_sum, "grad_norm": optax.global_norm(grads)}
        if compute_metrics:
            pred_boxes, pred_mask = _decode_predictions(
                module, out, image_size, prob, iou_thr, capacity, pallas_nms
            )
            det = detection_metrics(pred_boxes, pred_mask, bx, bm, sample_mask)
            if axis_name is not None:
                det = _weighted_metric_reduce(det, sample_mask, axis_name)
            scalars.update(det)
        return new_state, scalars

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


def _weighted_metric_reduce(det: dict, sample_mask, axis_name: str) -> dict:
    """Cross-shard reduction of per-shard detection metrics: each metric is a
    mean over the shard's valid samples, so the global mean is the
    valid-count-weighted psum (exactly what one device computing the full
    batch would report)."""
    n = jnp.sum(sample_mask).astype(jnp.float32)
    total = jnp.maximum(jax.lax.psum(n, axis_name), 1.0)
    return {k: jax.lax.psum(v * n, axis_name) / total for k, v in det.items()}


def make_eval_step(
    module,
    config: TrainConfig | None = None,
    nms_params: tuple[float, float, int] = (0.5, 0.5, 64),
    return_boxes: bool = False,
    neg_pos_ratio: int = 10,
    jit: bool = True,
    pallas_nms: bool | None = None,
    bg_push: float = 0.0,
    axis_name: str | None = None,
) -> Callable:
    """Build the jitted eval step (``validation_step``/``test_step``
    equivalent, ``ModelMeta.py:233-239``): loss + reference metrics, and
    optionally the decoded boxes (for visualization / AP accumulation).

    ``pallas_nms=False`` forces the pure-XLA decode path — required under
    GSPMD batch sharding, where ``pallas_call`` has no partitioning rule
    (see ``fdtpu/parallel/dp.py:make_dp_eval_step``). Under ``shard_map``
    (``axis_name`` set) the Pallas kernel runs per-shard and stays usable.

    ``axis_name``: per-shard SPMD body for ``shard_map`` — the loss is
    psum'd and detection metrics are valid-count-weighted across shards;
    returned boxes (if any) stay shard-local (batch-sharded outside).
    """
    image_size = (module.input_shape[1], module.input_shape[0])
    prob, iou_thr, capacity = nms_params
    npr = neg_pos_ratio

    def step_fn(state: TrainState, images, boxes, box_mask, sample_mask):
        imgs, bx, bm = _prepare_inputs(images, boxes, box_mask, None, False)
        enc, gt_locs = _encode_targets(module, bx, bm, image_size)
        _, (loss_sum, out, _) = _loss_and_out(
            module, state.params, state.batch_stats, imgs, enc, gt_locs,
            None, False, npr, sample_mask, bg_push,
        )
        pred_boxes, pred_mask = _decode_predictions(
            module, out, image_size, prob, iou_thr, capacity, pallas_nms
        )
        scalars = {"loss": loss_sum}
        det = detection_metrics(pred_boxes, pred_mask, bx, bm, sample_mask)
        if axis_name is not None:
            scalars["loss"] = _reduce_loss_sum(
                axis_name, loss_sum, _loss_norm(module, enc, sample_mask),
                is_ssd(module),
            )
            det = _weighted_metric_reduce(det, sample_mask, axis_name)
        scalars.update(det)
        if return_boxes:
            return scalars, (pred_boxes, pred_mask)
        return scalars

    return jax.jit(step_fn) if jit else step_fn
