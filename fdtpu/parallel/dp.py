"""Data-parallel training steps over a device mesh.

Two equivalent implementations (both produce one gradient all-reduce over the
``data`` axis, compiled onto ICI links):

* :func:`make_dp_train_step` — GSPMD style: the single-device step from
  ``fdtpu/train/step.py`` jitted with replicated state and batch-sharded
  inputs; XLA's partitioner inserts the ``all-reduce`` where the batch
  dimension is contracted. This is the production path — it composes with
  the optional ``spatial`` axis (conv halo exchanges) for free.
* :func:`make_shardmap_dp_train_step` — explicit SPMD: ``shard_map`` over the
  mesh with a hand-placed ``jax.lax.pmean`` on the gradients, the literal
  "jit/pmap step doing gradient allreduce over ICI" from the north star.
  Kept as the reference implementation for testing collective placement
  (per-shard metrics are also pmean'd).

The reference has no counterpart for any of this (single GPU, SURVEY.md §2.8).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from fdtpu.parallel.mesh import batch_sharding, replicate
from fdtpu.train.state import TrainState
from fdtpu.train.step import make_eval_step, make_train_step
from fdtpu.utils.config import TrainConfig


def make_dp_train_step(
    module,
    tx: optax.GradientTransformation,
    config: TrainConfig,
    mesh: Mesh,
    augment: bool = True,
    neg_pos_ratio: int = 10,
    spatial: bool = False,
    compute_metrics: bool = False,
    nms_params: tuple[float, float, int] = (0.5, 0.5, 64),
    bg_push: float = 0.0,
):
    """GSPMD data-parallel step. Returned signature matches the single-device
    step: ``step(state, images, boxes, box_mask, sample_mask, rng)``.

    Inputs must be device-put with ``shard_batch_arrays`` (or any layout —
    XLA will resharding-copy, at a cost). ``spatial=True`` additionally
    shards the image height over the 'spatial' mesh axis.
    """
    # one source of truth for the step body: the single-device raw step
    step_fn = make_train_step(
        module, tx, config, augment=augment,
        neg_pos_ratio=neg_pos_ratio, jit=False,
        compute_metrics=compute_metrics, nms_params=nms_params,
        pallas_nms=False if compute_metrics else None, bg_push=bg_push,
    )

    rep = replicate(mesh)
    img_sharding = batch_sharding(mesh, 4, spatial_dim=1 if spatial else None)
    in_shardings = (
        rep,  # state
        img_sharding,  # images
        batch_sharding(mesh, 3),  # boxes
        batch_sharding(mesh, 2),  # box_mask
        batch_sharding(mesh, 1),  # sample_mask
        rep,  # rng
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_eval_step(
    module,
    config: TrainConfig | None,
    mesh: Mesh,
    nms_params: tuple[float, float, int] = (0.5, 0.5, 64),
    return_boxes: bool = False,
    neg_pos_ratio: int = 10,
    bg_push: float = 0.0,
):
    """GSPMD data-parallel eval step — validation epochs scale with the same
    mesh as training. The decode+NMS path is forced to the pure-XLA twin
    (``pallas_nms=False``): a ``pallas_call`` carries no GSPMD partitioning
    rule, so under batch sharding XLA would all-gather the batch onto every
    chip; the XLA decode partitions cleanly along the batch axis."""
    step_fn = make_eval_step(
        module, config, nms_params=nms_params, return_boxes=return_boxes,
        neg_pos_ratio=neg_pos_ratio, jit=False, pallas_nms=False,
        bg_push=bg_push,
    )
    rep = replicate(mesh)
    in_shardings = (
        rep,  # state
        batch_sharding(mesh, 4),  # images
        batch_sharding(mesh, 3),  # boxes
        batch_sharding(mesh, 2),  # box_mask
        batch_sharding(mesh, 1),  # sample_mask
    )
    if return_boxes:
        out_shardings = (rep, (batch_sharding(mesh, 3), batch_sharding(mesh, 2)))
    else:
        out_shardings = rep
    return jax.jit(step_fn, in_shardings=in_shardings, out_shardings=out_shardings)


def make_shardmap_dp_train_step(
    module,
    tx: optax.GradientTransformation,
    config: TrainConfig,
    mesh: Mesh,
    augment: bool = True,
    neg_pos_ratio: int = 10,
    compute_metrics: bool = False,
    nms_params: tuple[float, float, int] = (0.5, 0.5, 64),
    bg_push: float = 0.0,
):
    """Explicit shard_map data-parallel step: the single-device step body
    built with ``axis_name="data"`` (exact weighted gradient all-reduce,
    psum'd loss, pmean'd batch stats — see ``fdtpu/train/step.py``), mapped
    over the mesh with a per-shard rng fold.

    Unlike the GSPMD path this runs Pallas kernels per-shard, so it is the
    production step whenever the body contains a ``pallas_call`` (device
    rotation, fused NMS metrics) that GSPMD cannot partition.
    """
    assert "data" in mesh.axis_names, "shard_map DP expects a 'data' mesh axis"
    step_fn = make_train_step(
        module, tx, config, augment=augment, neg_pos_ratio=neg_pos_ratio,
        jit=False, compute_metrics=compute_metrics, nms_params=nms_params,
        bg_push=bg_push, axis_name="data",
    )

    def shard_fn(state: TrainState, images, boxes, box_mask, sample_mask, rng):
        # distinct augment/dropout streams per shard
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        return step_fn(state, images, boxes, box_mask, sample_mask, rng)

    rep_spec = P()
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep_spec, P("data"), P("data"), P("data"), P("data"), rep_spec),
        out_specs=(rep_spec, rep_spec),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_shardmap_dp_eval_step(
    module,
    config: TrainConfig | None,
    mesh: Mesh,
    nms_params: tuple[float, float, int] = (0.5, 0.5, 64),
    return_boxes: bool = False,
    neg_pos_ratio: int = 10,
    bg_push: float = 0.0,
    pallas_nms: bool | None = None,
):
    """shard_map eval twin of :func:`make_dp_eval_step` — unlike GSPMD it can
    keep the fused Pallas decode+NMS (it runs per-shard). Scalars come back
    replicated (valid-count-weighted cross-shard means); decoded boxes stay
    batch-sharded."""
    assert "data" in mesh.axis_names
    step_fn = make_eval_step(
        module, config, nms_params=nms_params, return_boxes=return_boxes,
        neg_pos_ratio=neg_pos_ratio, jit=False, pallas_nms=pallas_nms,
        bg_push=bg_push, axis_name="data",
    )
    rep = P()
    out_specs = (rep, (P("data"), P("data"))) if return_boxes else rep
    mapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(rep, P("data"), P("data"), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)
