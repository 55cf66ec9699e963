"""Per-feed-mode epoch drivers for the Trainer.

The Trainer supports three data feeds (``fdtpu/train/loop.py``); each is a
separate driver class behind one interface so no method handles more than
one feed mode (round-5 structural decomposition of the former 918-line
mode matrix):

* :class:`StreamedDriver` — per-batch host->device streaming through
  ``DevicePrefetcher`` (the reference's DataLoader shape,
  ``/root/reference/models/ModelMeta.py:115-322``).
* :class:`ScanDispatchDriver` — ``steps_per_dispatch`` batches grouped into
  one ``lax.scan`` device program per dispatch (amortizes the ~25 ms axon
  tunnel RTT); eval stays streamed.
* :class:`ResidentDriver` — ``device_data``: the dataset staged once into
  HBM (batch-sharded over the 'data' mesh axis under DP, per-process under
  multihost), each epoch a single on-device scan with an on-device shuffle.

Drivers read/write training state through the owning ``Trainer`` handle
(``state``, ``rng``, ``epoch``, step functions, config) — the Trainer keeps
checkpointing, step construction, logging, and the fit loop. The
parallel-mode axis (single device / GSPMD / shard_map / multihost) is
resolved by the Trainer's step constructors; drivers only honor
``trainer.mesh`` / ``trainer._use_shardmap`` where the feed itself must be
sharded (staging layout, scan-in-shard_map).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fdtpu.data.pipeline import Batch, DevicePrefetcher
from fdtpu.train.metrics import f1_score
from fdtpu.train.step import make_eval_step, make_train_step
from fdtpu.utils.draw import draw_bbx


def _epoch_perm(key, sample_mask, shuffle: bool):
    """Permutation with every REAL row before every padded row (random
    among real rows when shuffling, source order otherwise) — so
    truncating to ``nb * batch`` rows drops pads first and the dropped
    real samples rotate with the epoch key."""
    n = sample_mask.shape[0]
    if shuffle:
        scores = jnp.where(sample_mask, jax.random.uniform(key, (n,)), 2.0)
    else:
        ar = jnp.arange(n, dtype=jnp.float32)
        scores = jnp.where(sample_mask, ar, ar + n)
    return jnp.argsort(scores)


def _finalize_train_metrics(trainer, losses, det_metrics: dict) -> dict:
    """Shared per-epoch metric assembly + logging (one device sync)."""
    metrics = {"loss": float(np.mean(jax.device_get(losses)))}
    if det_metrics:
        metrics.update(
            {k: float(v) for k, v in jax.device_get(det_metrics).items()}
        )
        metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
    trainer.logger.log_epoch(trainer.epoch, "training", metrics)
    return metrics


class EpochDriver:
    """One feed mode's train/eval epoch bodies."""

    def __init__(self, trainer):
        self.t = trainer

    def train_epoch(self) -> dict:
        raise NotImplementedError

    def eval_epoch(self, loader, split: str) -> dict:
        raise NotImplementedError

    # -- shared helpers ----------------------------------------------------

    def _make_raw_train_step(self):
        """Un-jitted single train step for embedding in device-side scans."""
        t = self.t
        return make_train_step(
            t.module, t.tx, t.config, augment=t._augment,
            compute_metrics=False, nms_params=t._nms_params,
            neg_pos_ratio=t._neg_pos_ratio, bg_push=t._bg_push, jit=False,
            axis_name="data" if t._use_shardmap else None,
        )

    def _visualize_batch(self, images0, batch_args, save_name: str):
        """Render sample 0's predictions (ModelMeta.py:144-157)."""
        t = self.t
        _, (pred_boxes, pred_mask) = t.eval_step(t.state, *batch_args)
        draw_bbx(
            images0,
            np.asarray(pred_boxes[0]),
            mask=np.asarray(pred_mask[0]),
            save_name=save_name,
        )


class StreamedDriver(EpochDriver):
    """Per-batch streaming feed (host decode -> prefetch -> one jitted
    step per batch); eval identical shape."""

    def train_epoch(self) -> dict:
        t = self.t
        losses = []
        det_metrics: dict = {}
        nb = len(t.train_loader)
        for bi, batch in enumerate(
            DevicePrefetcher(t.train_loader, mesh=t.mesh)
        ):
            if bi == 0 and t._can_visualize(batch.images):
                self._visualize_batch(
                    batch.images[0],
                    (batch.images, batch.boxes, batch.box_mask,
                     batch.sample_mask),
                    f"train_epoch_{t.epoch}",
                )
            step = (
                t._metrics_train_step()
                if (t.config.train_metrics and bi == nb - 1)
                else t.train_step
            )
            t.state, scalars = step(
                t.state,
                batch.images,
                batch.boxes,
                batch.box_mask,
                batch.sample_mask,
                t.rng,
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
                t.config.log_every_steps
                and bi % t.config.log_every_steps == 0
            ):
                print(
                    f"epoch {t.epoch} step {bi}: "
                    f"step_loss={float(scalars['loss']):.4f}",
                    flush=True,
                )
        return _finalize_train_metrics(t, losses, det_metrics)

    def eval_epoch(self, loader, split: str) -> dict:
        t = self.t
        agg: dict[str, list] = {}
        first = True
        for batch in DevicePrefetcher(loader, mesh=t.mesh):
            scalars, (pred_boxes, pred_mask) = t.eval_step(
                t.state,
                batch.images,
                batch.boxes,
                batch.box_mask,
                batch.sample_mask,
            )
            for k, v in scalars.items():
                agg.setdefault(k, []).append(v)
            if first and t._can_visualize(batch.images):
                # ModelMeta.py:144-157: render the first sample's predictions
                draw_bbx(
                    batch.images[0],
                    np.asarray(pred_boxes[0]),
                    mask=np.asarray(pred_mask[0]),
                    save_name=f"{split}_epoch_{t.epoch}",
                )
                first = False
        metrics = {
            k: float(np.mean(jax.device_get(v))) for k, v in agg.items()
        }
        if "precision" in metrics and "recall" in metrics:
            metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
        t.logger.log_epoch(t.epoch, split, metrics)
        return metrics


class ScanDispatchDriver(StreamedDriver):
    """``steps_per_dispatch`` batches per device program: batches stream
    off the loader (async H2D) and flush as one jitted ``lax.scan`` group.
    Eval inherits the streamed shape."""

    def __init__(self, trainer):
        super().__init__(trainer)
        self._raw_train_step = self._make_raw_train_step()
        self._scan_steps: dict[int, callable] = {}

    def _scan_train_step(self, n: int):
        """Jitted ``lax.scan`` of ``n`` train steps — one dispatch, per-step
        losses. Takes the ``n`` batches as FLAT per-batch arrays (already
        device_put asynchronously as they streamed off the loader) and
        stacks them on device: a single host-side stacked transfer measured
        ~5x slower than overlapped per-batch puts through the axon tunnel.

        Under ``data_parallel`` the whole scan runs inside ``shard_map``:
        each shard scans its batch slice with the ``axis_name`` step (exact
        cross-shard gradient all-reduce per step)."""
        t = self.t
        if n not in self._scan_steps:
            raw = self._raw_train_step

            def scan_fn(state, rng, *flat):
                xs = tuple(jnp.stack(flat[f::4]) for f in range(4))

                def body(s, x):
                    s, scalars = raw(s, *x, rng)
                    return s, scalars["loss"]
                return jax.lax.scan(body, state, xs)

            if t._use_shardmap:
                from jax.sharding import PartitionSpec as P

                def sharded_scan(state, rng, *flat):
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index("data")
                    )
                    return scan_fn(state, rng, *flat)

                fn = jax.shard_map(
                    sharded_scan, mesh=t.mesh,
                    in_specs=(P(), P()) + (P("data"),) * (4 * n),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
            else:
                fn = scan_fn
            self._scan_steps[n] = jax.jit(fn, donate_argnums=(0,))
        return self._scan_steps[n]

    def train_epoch(self) -> dict:
        """Epoch body with ``k`` steps per device dispatch. Group boundaries:
        the final batch is reserved for the metrics step when
        ``train_metrics`` is on (same observable behavior as the per-batch
        loop); the leading batches run as full-``k`` groups plus one
        remainder group."""
        t = self.t
        k = t.config.steps_per_dispatch
        losses: list = []
        det_metrics: dict = {}
        nb = len(t.train_loader)
        reserve = 1 if (t.config.train_metrics and nb) else 0
        group_target = nb - reserve
        log_groups = max(1, (t.config.log_every_steps or 0) // k) \
            if t.config.log_every_steps else 0
        buf: list[tuple] = []  # per-batch arrays, device_put as they stream
        final_batch: Batch | None = None
        dispatched = groups = 0

        def flush():
            nonlocal dispatched, groups
            if not buf:
                return
            if len(buf) == 1:
                t.state, scalars = t.train_step(t.state, *buf[0], t.rng)
                last_loss = scalars["loss"]
                losses.append(last_loss)
            else:
                flat = [arr for b in buf for arr in b]
                t.state, group_losses = self._scan_train_step(len(buf))(
                    t.state, t.rng, *flat
                )
                last_loss = group_losses[-1]
                losses.append(group_losses)
            dispatched += len(buf)
            groups += 1
            if log_groups and (groups - 1) % log_groups == 0:
                print(
                    f"epoch {t.epoch} step {dispatched - 1}: "
                    f"step_loss={float(last_loss):.4f}",
                    flush=True,
                )
            buf.clear()

        for bi, batch in enumerate(t.train_loader):
            if bi == 0 and t.config.visualize_first_batch:
                self._visualize_batch(
                    batch.images[0],
                    (batch.images, batch.boxes, batch.box_mask,
                     batch.sample_mask),
                    f"train_epoch_{t.epoch}",
                )
            if bi < group_target:
                if t.mesh is not None:
                    from fdtpu.parallel import batch_sharding

                    put = lambda a: jax.device_put(
                        a, batch_sharding(t.mesh, a.ndim)
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
            t.state, scalars = t._metrics_train_step()(
                t.state, b.images, b.boxes, b.box_mask, b.sample_mask, t.rng
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
        t.logger.log_epoch(t.epoch, "training", metrics)
        return metrics


class ResidentDriver(EpochDriver):
    """``device_data``: HBM-resident datasets, whole-epoch device scans for
    both train and eval."""

    def __init__(self, trainer):
        super().__init__(trainer)
        t = trainer
        if getattr(jax, "process_count", lambda: 1)() > 1:
            # multi-process device_data needs the mesh (per-process staging
            # assembles global arrays over the 'data' axis) and a global
            # batch splittable across processes
            if t.mesh is None:
                raise ValueError(
                    "device_data under --multihost requires --data-parallel "
                    "(the dataset is staged sharded over the 'data' mesh "
                    "axis, each process feeding its local slice)"
                )
            if t.train_loader.batch_size % jax.process_count():
                raise ValueError(
                    f"global batch_size {t.train_loader.batch_size} not "
                    f"divisible by {jax.process_count()} processes"
                )
        self._raw_train_step = self._make_raw_train_step()
        self._device_ds = None
        self._device_epoch_jit: dict[tuple, callable] = {}
        # keyed by the loader OBJECT (strong ref: keeps ids stable and the
        # staged arrays alive; each staged loader pins its dataset in HBM
        # for the Trainer's lifetime)
        self._device_val: dict[object, tuple] = {}
        self._device_eval_jit: dict[object, callable] = {}

    # -- staging -----------------------------------------------------------

    def _stage_device_dataset(self):
        """One streamed pass over the train loader, concatenated into
        HBM-resident ``(N, ...)`` arrays (WIDERFace train at 320px is
        ~3.9 GB of a v5e's 16 GB). After this, epochs never touch the host
        — the answer to host-transfer-bound links (the axon tunnel moves
        ~22 MB/s; a 320px b128 batch is 37 MB). Under ``data_parallel`` the
        arrays are staged batch-sharded over the 'data' mesh axis, so the
        fastest feed and the scaling path compose."""
        if self._device_ds is None:
            src = self.t.train_loader.source
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
            self._device_ds = self._stage_from_source(self.t.train_loader)
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
        mesh = self.t.mesh
        src = loader.source
        batch = loader.batch_size
        n = len(src)
        n_total = ((n + batch - 1) // batch) * batch
        parts: list[list] = [[], [], []]
        if mesh is not None:
            from fdtpu.parallel import batch_sharding

            put = lambda a: jax.device_put(a, batch_sharding(mesh, a.ndim))
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
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def assemble(chunks, dtype=None):
                spec = P(*([None, "data"] + [None] * (chunks[0].ndim - 1)))
                fn = jax.jit(
                    lambda *xs: jnp.stack(xs).astype(dtype)
                    if dtype else jnp.stack(xs),
                    out_shardings=NamedSharding(mesh, spec),
                )
                return fn(*chunks)

            sm = jax.device_put(
                sample_mask.reshape(-1, batch),
                NamedSharding(mesh, P(None, "data")),
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

        mesh = self.t.mesh
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
                NamedSharding(mesh, spec), local,
                (nb, batch) + local.shape[2:],
            )

        sample_mask = np.arange(n_total) < n
        sm_local = np.ascontiguousarray(
            sample_mask.reshape(nb, batch)[:, pid * lb: (pid + 1) * lb]
        )
        sm = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(None, "data")), sm_local, (nb, batch)
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

    # -- train -------------------------------------------------------------

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

            mesh = self.t.mesh
            raw = self._raw_train_step
            n_mesh = mesh.shape["data"]
            p = batch // n_mesh
            shuffle = bool(getattr(self.t.train_loader, "shuffle", False))

            def epoch_fn(state, rng, perm_key, imgs, boxes, bm, sm):
                sid = jax.lax.axis_index("data")
                rng = jax.random.fold_in(rng, sid)
                flat = lambda a: a.reshape((-1,) + a.shape[2:])
                imgs, boxes, bm, sm = map(flat, (imgs, boxes, bm, sm))
                perm = _epoch_perm(
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
                epoch_fn, mesh=mesh,
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

    def train_epoch(self) -> dict:
        t = self.t
        imgs, boxes, bm, sm, n_real = self._stage_device_dataset()
        batch = t.train_loader.batch_size
        nb = self._epoch_batches(t.train_loader, n_real)
        shuffle = bool(getattr(t.train_loader, "shuffle", False))
        key = jax.random.fold_in(
            jax.random.PRNGKey(t.config.seed + 2), t.epoch
        )
        if t.mesh is not None:
            if t.config.visualize_first_batch and t._can_visualize(imgs):
                # render staged batch 0 (sample 0 of the dataset)
                self._visualize_batch(
                    np.asarray(imgs[0])[0],
                    (imgs[0], boxes[0], bm[0], sm[0]),
                    f"train_epoch_{t.epoch}",
                )
            t.state, scan_losses, final = self._device_epoch_sharded(
                nb, batch
            )(t.state, t.rng, key, imgs, boxes, bm, sm)
            step = (
                t._metrics_train_step()
                if t.config.train_metrics else t.train_step
            )
            t.state, scalars = step(t.state, *final, t.rng)
        else:
            perm = _epoch_perm(key, sm, shuffle)
            if t.config.visualize_first_batch:
                sel0 = perm[:batch]
                self._visualize_batch(
                    np.asarray(imgs[sel0][0]),
                    (imgs[sel0], boxes[sel0], bm[sel0], sm[sel0]),
                    f"train_epoch_{t.epoch}",
                )
            t.state, scan_losses = self._device_epoch(nb, batch)(
                t.state, t.rng, perm, imgs, boxes, bm, sm
            )
            # final batch via the metrics step (train-epoch iou/recall/
            # precision)
            sel = jax.lax.dynamic_slice_in_dim(perm, (nb - 1) * batch, batch)
            step = (
                t._metrics_train_step()
                if t.config.train_metrics else t.train_step
            )
            t.state, scalars = step(
                t.state, imgs[sel], boxes[sel], bm[sel], sm[sel], t.rng
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
        t.logger.log_epoch(t.epoch, "training", metrics)
        return metrics

    # -- eval --------------------------------------------------------------

    def eval_epoch(self, loader, split: str) -> dict:
        """HBM-resident eval epoch: one scan over the staged loader's
        batches (contiguous slices — no permutation), per-batch scalars
        averaged on device. A streamed 320px validation pass moves ~37 MB
        per batch over the host link every epoch; staged, it moves zero.
        Under a mesh the staged batches are lane-sharded and the scan runs
        in ``shard_map`` with the ``axis_name`` eval step (cross-shard
        weighted metric reduction inside)."""
        t = self.t
        key = loader  # object key: strong ref pins ids + staged arrays
        if key not in self._device_val:
            self._device_val[key] = self._stage_from_source(loader)
        imgs, boxes, bm, sm, n_real = self._device_val[key]
        batch = loader.batch_size
        # honor the loader's drop_last (pads only ever sit in the last chunk)
        nb = self._epoch_batches(loader, n_real)
        if key not in self._device_eval_jit:
            if t.mesh is not None:
                from jax.sharding import PartitionSpec as P
                raw_eval = make_eval_step(
                    t.module, t.config, nms_params=t._nms_params,
                    return_boxes=False, neg_pos_ratio=t._neg_pos_ratio,
                    bg_push=t._bg_push, jit=False, axis_name="data",
                )

                def eval_fn(state, imgs, boxes, bm, sm):
                    def body(_, i):
                        return _, raw_eval(
                            state, imgs[i], boxes[i], bm[i], sm[i]
                        )
                    _, scalars = jax.lax.scan(body, None, jnp.arange(nb))
                    return {k: v.mean() for k, v in scalars.items()}

                mapped = jax.shard_map(
                    eval_fn, mesh=t.mesh,
                    in_specs=(P(), P(None, "data"), P(None, "data"),
                              P(None, "data"), P(None, "data")),
                    out_specs=P(),
                    check_vma=False,
                )
                self._device_eval_jit[key] = jax.jit(mapped)
            else:
                raw_eval = make_eval_step(
                    t.module, t.config, nms_params=t._nms_params,
                    return_boxes=False, neg_pos_ratio=t._neg_pos_ratio,
                    bg_push=t._bg_push, jit=False,
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
        scalars = self._device_eval_jit[key](t.state, imgs, boxes, bm, sm)
        if t.config.visualize_first_batch and t._can_visualize(imgs):
            first = (
                (imgs[0], boxes[0], bm[0], sm[0]) if t.mesh is not None
                else (imgs[:batch], boxes[:batch], bm[:batch], sm[:batch])
            )
            self._visualize_batch(
                np.asarray(first[0])[0] if t.mesh is not None
                else np.asarray(imgs[0]),
                first,
                f"{split}_epoch_{t.epoch}",
            )
        metrics = {k: float(v) for k, v in jax.device_get(scalars).items()}
        if "precision" in metrics and "recall" in metrics:
            metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
        t.logger.log_epoch(t.epoch, split, metrics)
        return metrics


def make_driver(trainer) -> EpochDriver:
    """Resolve the feed mode (same priority as the round-4 dispatch:
    ``device_data`` wins over ``steps_per_dispatch``)."""
    if trainer.config.device_data:
        return ResidentDriver(trainer)
    if trainer.config.steps_per_dispatch > 1:
        return ScanDispatchDriver(trainer)
    return StreamedDriver(trainer)
