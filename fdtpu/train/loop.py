"""Epoch training loop — the ``pytorch_lightning.Trainer`` + ``ModelMeta``
replacement (``/root/reference/train_model.py:47-60``,
``models/ModelMeta.py:115-322``).

Responsibilities, mirrored from the reference:

* fit over N epochs with per-epoch validation;
* per-epoch metric aggregation + F1 and console/file logging
  (``ModelMeta.py:241-313``);
* first-batch visualization to ``imgs/{train,validation}_epoch_N.png``
  (``ModelMeta.py:144-157``);
* checkpoint every epoch (Lightning auto-save equivalent) with resume;
* MultiStepLR is baked into the optax schedule (see ``train/state.py``).

TPU-native differences: one jitted step (no Python-per-sample work), device
augmentation, optional NaN debugging via ``jax.config`` instead of tripwires.

Structure: the Trainer owns configuration, train state, step construction
(single-device / GSPMD / shard_map per the parallel mode), checkpointing and
the fit loop; the per-feed-mode epoch bodies (streamed / scan-dispatch /
HBM-resident) live in :mod:`fdtpu.train.drivers`, one class per feed.
"""

from __future__ import annotations

from pathlib import Path

import jax

from fdtpu.data.pipeline import BatchLoader
from fdtpu.train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from fdtpu.train.drivers import make_driver
from fdtpu.train.state import create_train_state
from fdtpu.train.step import make_eval_step, make_train_step
from fdtpu.utils.config import TrainConfig
from fdtpu.utils.logging import MetricLogger


class Trainer:
    def __init__(
        self,
        module,
        config: TrainConfig,
        train_loader: BatchLoader,
        val_loader: BatchLoader | None = None,
        augment: bool = True,
        neg_pos_ratio: int = 10,
        nms_params: tuple[float, float, int] = (0.5, 0.5, 64),
        run_name: str = "run",
        bg_push: float = 0.0,
    ):
        self.module = module
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.run_name = run_name
        self.logger = MetricLogger(config.log_path)
        if config.nan_check:
            jax.config.update("jax_debug_nans", True)
        if config.positional_crop is None:
            # auto: positional crop is distribution-identical exactly when
            # batch composition re-randomizes per epoch (see
            # augment_batch_fast); resolve from the feed's shuffle flag.
            import dataclasses

            config = dataclasses.replace(
                config,
                positional_crop=bool(getattr(train_loader, "shuffle", False)),
            )
            self.config = config

        rng = jax.random.PRNGKey(config.seed)
        self.state, self.tx = create_train_state(
            module, config, rng, steps_per_epoch=max(len(train_loader), 1)
        )
        self._augment = augment
        self._neg_pos_ratio = neg_pos_ratio
        self._bg_push = bg_push
        self._nms_params = nms_params
        self._train_step_metrics = None  # built lazily (extra compile)
        self.mesh = None
        dp = config.data_parallel
        if dp is not None and dp != 0 and dp != 1:
            from fdtpu.parallel import make_mesh

            n = len(jax.devices()) if dp == -1 else dp
            if train_loader.batch_size % n:
                raise ValueError(
                    f"data_parallel={n} requires batch_size divisible by the "
                    f"mesh size (got batch_size={train_loader.batch_size})"
                )
            self.mesh = make_mesh(n)
        # shard_map family: required whenever the step body contains a
        # pallas_call (device rotation) or the epoch runs as a device-side
        # scan over HBM-resident shards (device_data / steps_per_dispatch)
        # — GSPMD has no partitioning rule for pallas_call and would
        # all-gather the batch onto every chip (fdtpu/parallel/dp.py).
        self._use_shardmap = self.mesh is not None and (
            config.rotate_device
            or config.device_data
            or config.steps_per_dispatch > 1
        )
        if self.mesh is not None and self._use_shardmap:
            from fdtpu.parallel import (
                make_shardmap_dp_eval_step,
                make_shardmap_dp_train_step,
            )

            self.train_step = make_shardmap_dp_train_step(
                module, self.tx, config, self.mesh, augment=augment,
                neg_pos_ratio=neg_pos_ratio, bg_push=bg_push,
                nms_params=nms_params,
            )
            self.eval_step = make_shardmap_dp_eval_step(
                module, config, self.mesh, nms_params=nms_params,
                return_boxes=True, neg_pos_ratio=neg_pos_ratio,
                bg_push=bg_push,
            )
        elif self.mesh is not None:
            # Data parallelism over a 1-D 'data' mesh: the same step body,
            # GSPMD-jitted with batch-sharded inputs; XLA places the gradient
            # all-reduce on ICI (the north star's "jit/pmap step doing
            # gradient allreduce", SURVEY.md §2.8).
            from fdtpu.parallel import make_dp_eval_step, make_dp_train_step

            self.train_step = make_dp_train_step(
                module, self.tx, config, self.mesh, augment=augment,
                neg_pos_ratio=neg_pos_ratio, bg_push=bg_push,
            )
            self.eval_step = make_dp_eval_step(
                module, config, self.mesh, nms_params=nms_params,
                return_boxes=True, neg_pos_ratio=neg_pos_ratio,
                bg_push=bg_push,
            )
        else:
            self.train_step = make_train_step(
                module, self.tx, config, augment=augment,
                compute_metrics=False, nms_params=nms_params,
                neg_pos_ratio=neg_pos_ratio, bg_push=bg_push,
            )
            self.eval_step = make_eval_step(
                module, config, nms_params=nms_params, return_boxes=True,
                neg_pos_ratio=neg_pos_ratio,  # keep train/val objectives aligned
                bg_push=bg_push,
            )
        self.rng = jax.random.PRNGKey(config.seed + 1)
        self.epoch = 0
        self.profile_dir: str | None = None  # set to capture jax.profiler traces
        # feed mode (streamed / scan-dispatch / resident) -> one driver
        self.driver = make_driver(self)

    def _metrics_train_step(self):
        """Train step that also decodes predictions and computes detection
        metrics (the reference's train-epoch iou/recall/precision/F1,
        ``ModelMeta.py:258-287``) — used on the final batch of each epoch
        only, so the per-epoch cost is one decode+NMS, not a per-step sync."""
        if self._train_step_metrics is None:
            if self.mesh is not None and self._use_shardmap:
                from fdtpu.parallel import make_shardmap_dp_train_step

                self._train_step_metrics = make_shardmap_dp_train_step(
                    self.module, self.tx, self.config, self.mesh,
                    augment=self._augment, neg_pos_ratio=self._neg_pos_ratio,
                    compute_metrics=True, nms_params=self._nms_params,
                    bg_push=self._bg_push,
                )
            elif self.mesh is not None:
                from fdtpu.parallel import make_dp_train_step

                self._train_step_metrics = make_dp_train_step(
                    self.module, self.tx, self.config, self.mesh,
                    augment=self._augment, neg_pos_ratio=self._neg_pos_ratio,
                    compute_metrics=True, nms_params=self._nms_params,
                    bg_push=self._bg_push,
                )
            else:
                self._train_step_metrics = make_train_step(
                    self.module, self.tx, self.config, augment=self._augment,
                    compute_metrics=True, nms_params=self._nms_params,
                    neg_pos_ratio=self._neg_pos_ratio, bg_push=self._bg_push,
                )
        return self._train_step_metrics

    def _can_visualize(self, images) -> bool:
        """First-batch rendering needs host access to sample 0 — impossible
        for globally-sharded arrays spanning other processes (multihost DP),
        where ``images[0]`` / fetching decoded boxes raises."""
        return self.config.visualize_first_batch and getattr(
            images, "is_fully_addressable", True
        )

    def profile(self, trace_dir: str = "profiles"):
        """Enable a jax.profiler trace of the next training epoch — the
        torchinfo/manual-FPS observability (SURVEY.md §5) upgraded to real
        XLA execution traces viewable in TensorBoard/Perfetto."""
        self.profile_dir = trace_dir
        return self

    # -- checkpointing -------------------------------------------------------

    def save(self):
        return save_checkpoint(
            Path(self.config.checkpoint_dir) / self.run_name, self.state
        )

    def maybe_resume(self) -> bool:
        path = latest_checkpoint(Path(self.config.checkpoint_dir) / self.run_name)
        if path is None:
            return False
        self.state = restore_checkpoint(path, self.state)
        self.epoch = int(self.state.step) // max(len(self.train_loader), 1)
        return True

    # -- epochs --------------------------------------------------------------

    def train_epoch(self) -> dict:
        if self.profile_dir:
            with jax.profiler.trace(self.profile_dir):
                metrics = self.driver.train_epoch()
            self.profile_dir = None
            return metrics
        return self.driver.train_epoch()

    def eval_epoch(self, loader: BatchLoader | None = None, split="validation") -> dict:
        loader = loader or self.val_loader
        if loader is None:
            return {}
        return self.driver.eval_epoch(loader, split)

    def fit(self, epochs: int | None = None) -> dict:
        epochs = self.config.max_epochs if epochs is None else epochs
        last: dict = {}
        while self.epoch < epochs:
            train_metrics = self.train_epoch()
            val_metrics = self.eval_epoch()
            self.epoch += 1
            self.save()
            last = {"train": train_metrics, "val": val_metrics}
        return last

    def test(self, loader: BatchLoader) -> dict:
        """``trainer.test`` equivalent (``run_validation_epoch.py:68-69``)."""
        return self.eval_epoch(loader, split="test")
