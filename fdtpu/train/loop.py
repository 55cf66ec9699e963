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
import jax.numpy as jnp
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
        # steps_per_dispatch > 1: scan several train steps inside ONE device
        # program (jitted per distinct group size, so at most two compiles —
        # the full group and the epoch remainder). device_data: stage the
        # whole dataset into HBM once and run each epoch as a single scan
        # with an on-device shuffle — zero host traffic from epoch 2 on.
        # Both compose with data_parallel: the staged arrays are batch-
        # sharded over the 'data' mesh axis and the scans run under
        # shard_map with the axis_name step (per-shard Pallas, exact
        # cross-shard gradient reduction).
        self._raw_train_step = None
        self._scan_steps: dict[int, callable] = {}
        self._device_ds = None
        self._device_epoch_jit: dict[tuple, callable] = {}
        # keyed by the loader OBJECT (strong ref: keeps ids stable and the
        # staged arrays alive; each staged loader pins its dataset in HBM
        # for the Trainer's lifetime)
        self._device_val: dict[object, tuple] = {}
        self._device_eval_jit: dict[object, callable] = {}
        if config.device_data and getattr(jax, "process_count", lambda: 1)() > 1:
            # multi-process device_data needs the mesh (per-process staging
            # assembles global arrays over the 'data' axis) and a global
            # batch splittable across processes
            if self.mesh is None:
                raise ValueError(
                    "device_data under --multihost requires --data-parallel "
                    "(the dataset is staged sharded over the 'data' mesh "
                    "axis, each process feeding its local slice)"
                )
            if train_loader.batch_size % jax.process_count():
                raise ValueError(
                    f"global batch_size {train_loader.batch_size} not "
                    f"divisible by {jax.process_count()} processes"
                )
        if config.steps_per_dispatch > 1 or config.device_data:
            self._raw_train_step = make_train_step(
                module, self.tx, config, augment=augment,
                compute_metrics=False, nms_params=nms_params,
                neg_pos_ratio=neg_pos_ratio, bg_push=bg_push, jit=False,
                axis_name="data" if self._use_shardmap else None,
            )

    def _scan_train_step(self, n: int):
        """Jitted ``lax.scan`` of ``n`` train steps — one dispatch, per-step
        losses. Takes the ``n`` batches as FLAT per-batch arrays (already
        device_put asynchronously as they streamed off the loader) and
        stacks them on device: a single host-side stacked transfer measured
        ~5x slower than overlapped per-batch puts through the axon tunnel.

        Under ``data_parallel`` the whole scan runs inside ``shard_map``:
        each shard scans its batch slice with the ``axis_name`` step (exact
        cross-shard gradient all-reduce per step)."""
        if n not in self._scan_steps:
            raw = self._raw_train_step

            def scan_fn(state, rng, *flat):
                xs = tuple(
                    jnp.stack(flat[f::4]) for f in range(4)
                )

                def body(s, x):
                    s, scalars = raw(s, *x, rng)
                    return s, scalars["loss"]
                return jax.lax.scan(body, state, xs)

            if self._use_shardmap:
                from jax.sharding import PartitionSpec as P

                def sharded_scan(state, rng, *flat):
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index("data")
                    )
                    return scan_fn(state, rng, *flat)

                fn = jax.shard_map(
                    sharded_scan, mesh=self.mesh,
                    in_specs=(P(), P()) + (P("data"),) * (4 * n),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
            else:
                fn = scan_fn
            self._scan_steps[n] = jax.jit(fn, donate_argnums=(0,))
        return self._scan_steps[n]

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
                metrics = self._train_epoch_body()
            self.profile_dir = None
            return metrics
        return self._train_epoch_body()

    def _train_epoch_body(self) -> dict:
        if self.config.device_data:
            return self._train_epoch_device()
        if self._raw_train_step is not None:
            return self._train_epoch_scan(self.config.steps_per_dispatch)
        losses = []
        det_metrics: dict = {}
        nb = len(self.train_loader)
        for bi, batch in enumerate(
            DevicePrefetcher(self.train_loader, mesh=self.mesh)
        ):
            if bi == 0 and self._can_visualize(batch.images):
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

    def _stage_device_dataset(self):
        """One streamed pass over the train loader, concatenated into
        HBM-resident ``(N, ...)`` arrays (WIDERFace train at 320px is
        ~3.9 GB of a v5e's 16 GB). After this, epochs never touch the host
        — the answer to host-transfer-bound links (the axon tunnel moves
        ~22 MB/s; a 320px b128 batch is 37 MB). Under ``data_parallel`` the
        arrays are staged batch-sharded over the 'data' mesh axis, so the
        fastest feed and the scaling path compose."""
        if self._device_ds is None:
            src = self.train_loader.source
            if getattr(src, "rotate_prob", 0.0):
                raise ValueError(
                    "device_data stages decoded frames once, so host-side "
                    "rotation would freeze one angle per image for all "
                    "epochs. Build the source with rotate_prob=0.0 and use "
                    "rotate_device=True for rotation augmentation."
                )
            # Stage from the SOURCE (all samples, chunked at batch size),
            # not the loader: an epoch_fraction loader yields only one
            # random fraction per pass. Each device epoch then slices its
            # fraction off a fresh full-N permutation — exactly the
            # reference's rotating-quarter sampling (dataset_ssd.py:32-34).
            self._device_ds = self._stage_from_source(self.train_loader)
        return self._device_ds

    def _stage_from_source(self, loader):
        """Stage a loader's source as resident arrays.

        ALL ``n`` samples are staged (padded to whole batches with repeats
        of the last sample, masked via ``sample_mask``); the loader's
        ``drop_last``/``epoch_fraction`` truncation is applied per epoch
        AFTER the on-device permutation, so dropped samples rotate across
        epochs exactly like the streamed ``BatchLoader._indices``.

        Layout: flat ``(N, ...)`` single-device; ``(num_batches, B, ...)``
        sharded ``P(None, 'data')`` under a mesh — each staged chunk IS a
        streamed batch, so global batch ``i`` has identical composition in
        both layouts, and each device permanently holds its ``B/n`` lane
        slice of every batch (no resharding, H2D goes straight to the
        owning device)."""
        if getattr(jax, "process_count", lambda: 1)() > 1:
            return self._stage_from_source_multihost(loader)
        src = loader.source
        batch = loader.batch_size
        n = len(src)
        n_total = ((n + batch - 1) // batch) * batch
        parts: list[list] = [[], [], []]
        if self.mesh is not None:
            from fdtpu.parallel import batch_sharding

            put = lambda a: jax.device_put(a, batch_sharding(self.mesh, a.ndim))
        else:
            put = jax.device_put
        for start in range(0, n_total, batch):
            idx = np.minimum(
                np.arange(start, start + batch), n - 1
            )  # tail batch repeats the last sample (BatchLoader padding)
            samples = (
                src.get_batch(idx) if hasattr(src, "get_batch")
                else [src.get(int(i)) for i in idx]
            )
            for i in range(3):
                parts[i].append(put(
                    np.stack([s[i] for s in samples])
                ))  # async H2D
        sample_mask = np.arange(n_total) < n
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def assemble(chunks, dtype=None):
                spec = P(*([None, "data"] + [None] * (chunks[0].ndim - 1)))
                fn = jax.jit(
                    lambda *xs: jnp.stack(xs).astype(dtype)
                    if dtype else jnp.stack(xs),
                    out_shardings=NamedSharding(self.mesh, spec),
                )
                return fn(*chunks)

            sm = jax.device_put(
                sample_mask.reshape(-1, batch),
                NamedSharding(self.mesh, P(None, "data")),
            )
            return (
                assemble(parts[0]),
                assemble(parts[1], jnp.float32),
                assemble(parts[2]),
                sm,
                n,
            )
        return (
            jnp.concatenate(parts[0]),
            jnp.concatenate(parts[1]).astype(jnp.float32),
            jnp.concatenate(parts[2]),
            jnp.asarray(sample_mask),
            n,
        )

    def _stage_from_source_multihost(self, loader):
        """Per-process ``device_data`` staging (round-4): each process
        decodes and stages ONLY the rows its local devices own — the same
        contiguous ``[pid*lb, (pid+1)*lb)`` slice of every global batch the
        streamed ``BatchLoader.process_shard`` feed yields — and the global
        ``(num_batches, B, ...)`` resident arrays are assembled with
        ``jax.make_array_from_process_local_data``. The sharded resident
        epoch (``_device_epoch_sharded``) is process-count-agnostic, so
        from here on multihost pods get the zero-host-traffic fast feed
        instead of falling back to streaming. Batch composition matches the
        streamed multihost feed exactly (shuffle off)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        src = loader.source
        batch = loader.batch_size
        pid, nproc = jax.process_index(), jax.process_count()
        lb = batch // nproc
        n = len(src)
        n_total = ((n + batch - 1) // batch) * batch
        nb = n_total // batch
        locs: list[list] = [[], [], []]
        for start in range(0, n_total, batch):
            idx = np.minimum(np.arange(start, start + batch), n - 1)
            idx = idx[pid * lb: (pid + 1) * lb]  # this process's rows only
            samples = (
                src.get_batch(idx) if hasattr(src, "get_batch")
                else [src.get(int(i)) for i in idx]
            )
            for i in range(3):
                locs[i].append(np.stack([s[i] for s in samples]))

        def assemble(chunks: list, dtype=None):
            local = np.stack(chunks)
            if dtype is not None:
                local = local.astype(dtype)
            spec = P(*([None, "data"] + [None] * (local.ndim - 2)))
            return jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, spec), local,
                (nb, batch) + local.shape[2:],
            )

        sample_mask = np.arange(n_total) < n
        sm_local = np.ascontiguousarray(
            sample_mask.reshape(nb, batch)[:, pid * lb: (pid + 1) * lb]
        )
        sm = jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P(None, "data")), sm_local, (nb, batch)
        )
        return (
            assemble(locs[0]),
            assemble(locs[1], np.float32),
            assemble(locs[2]),
            sm,
            n,
        )

    def _epoch_batches(self, loader, n_real: int) -> int:
        """Batches per resident epoch, matching ``BatchLoader.__len__``:
        ``epoch_fraction`` then ``drop_last``/``process_shard`` truncation
        (ceil otherwise — the padded tail rows sort last in the epoch
        permutation, so the final batch is exactly the streamed padded
        tail)."""
        batch = loader.batch_size
        ef = getattr(loader, "epoch_fraction", 1) or 1
        n_eff = n_real // ef
        if (bool(getattr(loader, "drop_last", False))
                or getattr(loader, "process_shard", None) is not None):
            return max(1, n_eff // batch)
        return max(1, (n_eff + batch - 1) // batch)

    @staticmethod
    def _epoch_perm(key, sample_mask, shuffle: bool):
        """Permutation with every REAL row before every padded row (random
        among real rows when shuffling, source order otherwise) — so
        truncating to ``nb * batch`` rows drops pads first and the dropped
        real samples rotate with the epoch key."""
        n = sample_mask.shape[0]
        if shuffle:
            scores = jnp.where(
                sample_mask, jax.random.uniform(key, (n,)), 2.0
            )
        else:
            ar = jnp.arange(n, dtype=jnp.float32)
            scores = jnp.where(sample_mask, ar, ar + n)
        return jnp.argsort(scores)

    def _device_epoch(self, nb: int, batch: int):
        """Jitted whole-epoch scan over the resident dataset: gather each
        batch's rows from the caller's epoch permutation, run the step.
        Scans ``nb - 1`` steps; the final batch runs outside (metrics +
        same observable behavior as the streamed loop)."""
        key = (nb, batch)
        if key not in self._device_epoch_jit:
            raw = self._raw_train_step

            def epoch_fn(state, rng, perm, imgs, boxes, bm, sm):
                def body(s, i):
                    sel = jax.lax.dynamic_slice_in_dim(perm, i * batch, batch)
                    s, scalars = raw(
                        s, imgs[sel], boxes[sel], bm[sel], sm[sel], rng
                    )
                    return s, scalars["loss"]
                return jax.lax.scan(body, state, jnp.arange(nb - 1))

            self._device_epoch_jit[key] = jax.jit(
                epoch_fn, donate_argnums=(0,)
            )
        return self._device_epoch_jit[key]

    def _device_epoch_sharded(self, nb: int, batch: int):
        """shard_map whole-epoch scan over the batch-sharded resident
        dataset (the composition of ``device_data`` and ``data_parallel``):
        each shard flattens its ``(num_batches, B/n, ...)`` slice, draws a
        per-shard real-first permutation (a stratified epoch shuffle — every
        global batch takes ``B/n`` rows from each shard's resident pool,
        which never moves), and scans the ``axis_name`` train step — the
        gradient all-reduce inside the step is the only cross-chip traffic.
        Returns ``(state, per-step losses, final batch tensors)``; the final
        batch comes back batch-sharded for the outer metrics step."""
        key = (nb, batch)
        if key not in self._device_epoch_jit:
            from jax.sharding import PartitionSpec as P

            raw = self._raw_train_step
            n_mesh = self.mesh.shape["data"]
            p = batch // n_mesh
            shuffle = bool(getattr(self.train_loader, "shuffle", False))

            def epoch_fn(state, rng, perm_key, imgs, boxes, bm, sm):
                sid = jax.lax.axis_index("data")
                rng = jax.random.fold_in(rng, sid)
                flat = lambda a: a.reshape((-1,) + a.shape[2:])
                imgs, boxes, bm, sm = map(flat, (imgs, boxes, bm, sm))
                perm = Trainer._epoch_perm(
                    jax.random.fold_in(perm_key, sid), sm, shuffle
                )

                def body(s, i):
                    sel = jax.lax.dynamic_slice_in_dim(perm, i * p, p)
                    s, scalars = raw(
                        s, imgs[sel], boxes[sel], bm[sel], sm[sel], rng
                    )
                    return s, scalars["loss"]

                state, losses = jax.lax.scan(
                    body, state, jnp.arange(nb - 1)
                )
                fsel = jax.lax.dynamic_slice_in_dim(perm, (nb - 1) * p, p)
                final = (imgs[fsel], boxes[fsel], bm[fsel], sm[fsel])
                return state, losses, final

            mapped = jax.shard_map(
                epoch_fn, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(None, "data"), P(None, "data"),
                          P(None, "data"), P(None, "data")),
                out_specs=(P(), P(), (P("data"), P("data"), P("data"),
                                      P("data"))),
                check_vma=False,
            )
            self._device_epoch_jit[key] = jax.jit(
                mapped, donate_argnums=(0,)
            )
        return self._device_epoch_jit[key]

    def _train_epoch_device(self) -> dict:
        imgs, boxes, bm, sm, n_real = self._stage_device_dataset()
        batch = self.train_loader.batch_size
        nb = self._epoch_batches(self.train_loader, n_real)
        shuffle = bool(getattr(self.train_loader, "shuffle", False))
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.config.seed + 2), self.epoch
        )
        if self.mesh is not None:
            if self.config.visualize_first_batch and self._can_visualize(imgs):
                # render staged batch 0 (sample 0 of the dataset)
                _, (pred_boxes, pred_mask) = self.eval_step(
                    self.state, imgs[0], boxes[0], bm[0], sm[0]
                )
                draw_bbx(
                    np.asarray(imgs[0])[0],
                    np.asarray(pred_boxes[0]),
                    mask=np.asarray(pred_mask[0]),
                    save_name=f"train_epoch_{self.epoch}",
                )
            self.state, scan_losses, final = self._device_epoch_sharded(
                nb, batch
            )(self.state, self.rng, key, imgs, boxes, bm, sm)
            step = (
                self._metrics_train_step()
                if self.config.train_metrics else self.train_step
            )
            self.state, scalars = step(self.state, *final, self.rng)
        else:
            perm = self._epoch_perm(key, sm, shuffle)
            if self.config.visualize_first_batch:
                sel0 = perm[:batch]
                _, (pred_boxes, pred_mask) = self.eval_step(
                    self.state, imgs[sel0], boxes[sel0], bm[sel0], sm[sel0]
                )
                draw_bbx(
                    np.asarray(imgs[sel0][0]),
                    np.asarray(pred_boxes[0]),
                    mask=np.asarray(pred_mask[0]),
                    save_name=f"train_epoch_{self.epoch}",
                )
            self.state, scan_losses = self._device_epoch(nb, batch)(
                self.state, self.rng, perm, imgs, boxes, bm, sm
            )
            # final batch via the metrics step (train-epoch iou/recall/
            # precision)
            sel = jax.lax.dynamic_slice_in_dim(perm, (nb - 1) * batch, batch)
            step = (
                self._metrics_train_step()
                if self.config.train_metrics else self.train_step
            )
            self.state, scalars = step(
                self.state, imgs[sel], boxes[sel], bm[sel], sm[sel], self.rng
            )
        losses = np.concatenate([
            np.atleast_1d(jax.device_get(scan_losses)),
            np.atleast_1d(jax.device_get(scalars["loss"])),
        ])
        metrics = {"loss": float(losses.mean())}
        if "iou" in scalars:
            det = jax.device_get(
                {k: scalars[k] for k in ("iou", "recall", "precision")}
            )
            metrics.update({k: float(v) for k, v in det.items()})
            metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
        self.logger.log_epoch(self.epoch, "training", metrics)
        return metrics

    def _train_epoch_scan(self, k: int) -> dict:
        """Epoch body with ``k`` steps per device dispatch. Group boundaries:
        the final batch is reserved for the metrics step when
        ``train_metrics`` is on (same observable behavior as the per-batch
        loop); the leading batches run as full-``k`` groups plus one
        remainder group."""
        losses: list = []
        det_metrics: dict = {}
        nb = len(self.train_loader)
        reserve = 1 if (self.config.train_metrics and nb) else 0
        group_target = nb - reserve
        log_groups = max(1, (self.config.log_every_steps or 0) // k) \
            if self.config.log_every_steps else 0
        buf: list[tuple] = []  # per-batch arrays, device_put as they stream
        final_batch: Batch | None = None
        dispatched = groups = 0

        def flush():
            nonlocal dispatched, groups
            if not buf:
                return
            if len(buf) == 1:
                self.state, scalars = self.train_step(
                    self.state, *buf[0], self.rng,
                )
                last_loss = scalars["loss"]
                losses.append(last_loss)
            else:
                flat = [arr for b in buf for arr in b]
                self.state, group_losses = self._scan_train_step(len(buf))(
                    self.state, self.rng, *flat
                )
                last_loss = group_losses[-1]
                losses.append(group_losses)
            dispatched += len(buf)
            groups += 1
            if log_groups and (groups - 1) % log_groups == 0:
                print(
                    f"epoch {self.epoch} step {dispatched - 1}: "
                    f"step_loss={float(last_loss):.4f}",
                    flush=True,
                )
            buf.clear()

        for bi, batch in enumerate(self.train_loader):
            if bi == 0 and self.config.visualize_first_batch:
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
            if bi < group_target:
                if self.mesh is not None:
                    from fdtpu.parallel import batch_sharding

                    put = lambda a: jax.device_put(
                        a, batch_sharding(self.mesh, a.ndim)
                    )
                else:
                    put = jax.device_put
                buf.append(tuple(
                    put(a) for a in (
                        batch.images, batch.boxes,
                        batch.box_mask, batch.sample_mask,
                    )
                ))  # async: H2D overlaps with the loader's next decode
                if len(buf) == k:
                    flush()
            else:
                final_batch = batch
        flush()
        if final_batch is not None:
            b = final_batch
            self.state, scalars = self._metrics_train_step()(
                self.state, b.images, b.boxes, b.box_mask, b.sample_mask,
                self.rng,
            )
            losses.append(scalars["loss"])
            det_metrics = {
                k_: scalars[k_] for k_ in ("iou", "recall", "precision")
            }
        flat = np.concatenate(
            [np.atleast_1d(jax.device_get(l)) for l in losses]
        ) if losses else np.zeros((0,))
        metrics = {"loss": float(flat.mean()) if flat.size else 0.0}
        if det_metrics:
            metrics.update(
                {k_: float(v) for k_, v in jax.device_get(det_metrics).items()}
            )
            metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
        self.logger.log_epoch(self.epoch, "training", metrics)
        return metrics

    def _eval_epoch_device(self, loader, split: str) -> dict:
        """HBM-resident eval epoch: one scan over the staged loader's
        batches (contiguous slices — no permutation), per-batch scalars
        averaged on device. A streamed 320px validation pass moves ~37 MB
        per batch over the host link every epoch; staged, it moves zero.
        Under a mesh the staged batches are lane-sharded and the scan runs
        in ``shard_map`` with the ``axis_name`` eval step (cross-shard
        weighted metric reduction inside)."""
        key = loader  # object key: strong ref pins ids + staged arrays
        if key not in self._device_val:
            self._device_val[key] = self._stage_from_source(loader)
        imgs, boxes, bm, sm, n_real = self._device_val[key]
        batch = loader.batch_size
        # honor the loader's drop_last (pads only ever sit in the last chunk)
        nb = self._epoch_batches(loader, n_real)
        if key not in self._device_eval_jit:
            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P
                raw_eval = make_eval_step(
                    self.module, self.config, nms_params=self._nms_params,
                    return_boxes=False, neg_pos_ratio=self._neg_pos_ratio,
                    bg_push=self._bg_push, jit=False, axis_name="data",
                )

                def eval_fn(state, imgs, boxes, bm, sm):
                    def body(_, i):
                        return _, raw_eval(
                            state, imgs[i], boxes[i], bm[i], sm[i]
                        )
                    _, scalars = jax.lax.scan(body, None, jnp.arange(nb))
                    return {k: v.mean() for k, v in scalars.items()}

                mapped = jax.shard_map(
                    eval_fn, mesh=self.mesh,
                    in_specs=(P(), P(None, "data"), P(None, "data"),
                              P(None, "data"), P(None, "data")),
                    out_specs=P(),
                    check_vma=False,
                )
                self._device_eval_jit[key] = jax.jit(mapped)
            else:
                raw_eval = make_eval_step(
                    self.module, self.config, nms_params=self._nms_params,
                    return_boxes=False, neg_pos_ratio=self._neg_pos_ratio,
                    bg_push=self._bg_push, jit=False,
                )

                def eval_fn(state, imgs, boxes, bm, sm):
                    def body(_, i):
                        sl = lambda a: jax.lax.dynamic_slice_in_dim(
                            a, i * batch, batch
                        )
                        return _, raw_eval(
                            state, sl(imgs), sl(boxes), sl(bm), sl(sm)
                        )
                    _, scalars = jax.lax.scan(body, None, jnp.arange(nb))
                    return {k: v.mean() for k, v in scalars.items()}

                self._device_eval_jit[key] = jax.jit(eval_fn)
        scalars = self._device_eval_jit[key](self.state, imgs, boxes, bm, sm)
        if self.config.visualize_first_batch and self._can_visualize(imgs):
            first = (
                (imgs[0], boxes[0], bm[0], sm[0]) if self.mesh is not None
                else (imgs[:batch], boxes[:batch], bm[:batch], sm[:batch])
            )
            _, (pred_boxes, pred_mask) = self.eval_step(self.state, *first)
            draw_bbx(
                np.asarray(first[0])[0] if self.mesh is not None
                else np.asarray(imgs[0]),
                np.asarray(pred_boxes[0]),
                mask=np.asarray(pred_mask[0]),
                save_name=f"{split}_epoch_{self.epoch}",
            )
        metrics = {k: float(v) for k, v in jax.device_get(scalars).items()}
        if "precision" in metrics and "recall" in metrics:
            metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
        self.logger.log_epoch(self.epoch, split, metrics)
        return metrics

    def eval_epoch(self, loader: BatchLoader | None = None, split="validation") -> dict:
        loader = loader or self.val_loader
        if loader is None:
            return {}
        if self.config.device_data:
            return self._eval_epoch_device(loader, split)
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
            if first and self._can_visualize(batch.images):
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
