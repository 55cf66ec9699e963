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
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from fdtpu.data.pipeline import Batch, BatchLoader, DevicePrefetcher
from fdtpu.train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from fdtpu.train.metrics import f1_score
from fdtpu.train.state import create_train_state
from fdtpu.train.step import make_eval_step, make_train_step
from fdtpu.utils.config import TrainConfig
from fdtpu.utils.draw import draw_bbx
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
            # Data parallelism over a 1-D 'data' mesh: the same step body,
            # GSPMD-jitted with batch-sharded inputs; XLA places the gradient
            # all-reduce on ICI (the north star's "jit/pmap step doing
            # gradient allreduce", SURVEY.md §2.8).
            from fdtpu.parallel import make_dp_eval_step, make_dp_train_step, make_mesh

            n = len(jax.devices()) if dp == -1 else dp
            if train_loader.batch_size % n:
                raise ValueError(
                    f"data_parallel={n} requires batch_size divisible by the "
                    f"mesh size (got batch_size={train_loader.batch_size})"
                )
            self.mesh = make_mesh(n)
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

    def _metrics_train_step(self):
        """Train step that also decodes predictions and computes detection
        metrics (the reference's train-epoch iou/recall/precision/F1,
        ``ModelMeta.py:258-287``) — used on the final batch of each epoch
        only, so the per-epoch cost is one decode+NMS, not a per-step sync."""
        if self._train_step_metrics is None:
            if self.mesh is not None:
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
                metrics = self._train_epoch_body()
            self.profile_dir = None
            return metrics
        return self._train_epoch_body()

    def _train_epoch_body(self) -> dict:
        losses = []
        det_metrics: dict = {}
        nb = len(self.train_loader)
        for bi, batch in enumerate(
            DevicePrefetcher(self.train_loader, mesh=self.mesh)
        ):
            if bi == 0 and self.config.visualize_first_batch:
                # ModelMeta.py:144-157: render the first train batch's preds
                _, (pred_boxes, pred_mask) = self.eval_step(
                    self.state, batch.images, batch.boxes,
                    batch.box_mask, batch.sample_mask,
                )
                draw_bbx(
                    batch.images[0],
                    np.asarray(pred_boxes[0]),
                    mask=np.asarray(pred_mask[0]),
                    save_name=f"train_epoch_{self.epoch}",
                )
            step = (
                self._metrics_train_step()
                if (self.config.train_metrics and bi == nb - 1)
                else self.train_step
            )
            self.state, scalars = step(
                self.state,
                batch.images,
                batch.boxes,
                batch.box_mask,
                batch.sample_mask,
                self.rng,
            )
            losses.append(scalars["loss"])
            if "iou" in scalars:
                det_metrics = {
                    k: scalars[k] for k in ("iou", "recall", "precision")
                }
            # per-step progress line (the reference's step_loss prog-bar
            # logging, ModelMeta.py:226) — throttled so it doesn't force a
            # device sync every step
            if (
                self.config.log_every_steps
                and bi % self.config.log_every_steps == 0
            ):
                print(
                    f"epoch {self.epoch} step {bi}: "
                    f"step_loss={float(scalars['loss']):.4f}",
                    flush=True,
                )
        # one device sync per epoch, not per step
        metrics = {"loss": float(np.mean(jax.device_get(losses)))}
        if det_metrics:
            metrics.update(
                {k: float(v) for k, v in jax.device_get(det_metrics).items()}
            )
            metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
        self.logger.log_epoch(self.epoch, "training", metrics)
        return metrics

    def eval_epoch(self, loader: BatchLoader | None = None, split="validation") -> dict:
        loader = loader or self.val_loader
        if loader is None:
            return {}
        agg: dict[str, list] = {}
        first = True
        for batch in DevicePrefetcher(loader, mesh=self.mesh):
            scalars, (pred_boxes, pred_mask) = self.eval_step(
                self.state,
                batch.images,
                batch.boxes,
                batch.box_mask,
                batch.sample_mask,
            )
            for k, v in scalars.items():
                agg.setdefault(k, []).append(v)
            if first and self.config.visualize_first_batch:
                # ModelMeta.py:144-157: render the first sample's predictions
                draw_bbx(
                    batch.images[0],
                    np.asarray(pred_boxes[0]),
                    mask=np.asarray(pred_mask[0]),
                    save_name=f"{split}_epoch_{self.epoch}",
                )
                first = False
        metrics = {k: float(np.mean(jax.device_get(v))) for k, v in agg.items()}
        if "precision" in metrics and "recall" in metrics:
            metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
        self.logger.log_epoch(self.epoch, split, metrics)
        return metrics

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
