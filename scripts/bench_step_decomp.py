"""Decompose the flagship train step's cost on TPU (round-4: upgrade the
roofline's asserted backward-elementwise attribution to a measurement).

BASELINE.md's train roofline names the remaining gap after the augment
attack as "the backward's elementwise traffic (LeakyReLU/dropout masks/
residual adds) plus encode/loss/optimizer small change" — an attribution
inferred from the step-variant table, not measured per stage. This script
times each stage in isolation as a scanned device loop (one dispatch per
rep, iterations serialized through a data dependency), so per-call tunnel
latency is excluded:

  fwd_eval      forward, train=False (no dropout)
  fwd_train     forward, train=True (dropout masks live)
  fwd_bwd       value_and_grad of the mean YOLO loss (encode precomputed)
  fwd_bwd_nodrop  same on a dropout-free twin (rate=0.0) — dropout tax
  opt_only      Adam update + apply_updates over the param tree alone
  fwd_bwd_u8    fwd_bwd from the step's real uint8 input, encode + the
                u8->f32/255 + area-filter passes inside (prices the
                input-side passes in fused context)
  adam_noaug    full step, augment off, SAM off
  sam_noaug     full step, augment off, SAM on
  full          the headline step (augment + SAM + Adam)
  full@b64/b256 batch-scaling of the headline step

Derived lines: bwd = fwd_bwd - fwd_train; dropout tax = fwd_bwd -
fwd_bwd_nodrop; optimizer+encode = adam_noaug - fwd_bwd; input-side
passes = fwd_bwd_u8_encode - fwd_bwd; SAM tax = sam_noaug - adam_noaug;
augment-in-step = full - sam_noaug.

Usage: python scripts/bench_step_decomp.py [--batch 128] [--size 320]
Run alone — the chip admits one client at a time. One JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 3


def time_scan_ms(step_fn, init, n, reps=REPS):
    """Median per-iteration ms over ``reps`` timed scans (after warmup)."""
    import jax

    @jax.jit
    def many(c):
        return jax.lax.scan(lambda c, _: step_fn(c), c, None, length=n)

    c, out = many(init)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # warmup + compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, out = many(c)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--filters", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=10)
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--skip-batch-sweep", action="store_true")
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.models import PoolResnet
    from fdtpu.train import create_train_state
    from fdtpu.train.step import (
        _encode_targets,
        _loss_and_out,
        _prepare_inputs,
        make_train_step,
    )
    from fdtpu.utils.config import TrainConfig

    B, S = args.batch, args.size
    mk = lambda **kw: PoolResnet(
        filters=args.filters, input_shape=(S, S), num_patches=15,
        num_residual_blocks=args.blocks, **kw,
    )
    module = mk()
    module_nodrop = mk(dropout=0.0, head_dropout=0.0)

    config = TrainConfig(use_sam=True, positional_crop=True)
    state, _ = create_train_state(module, config, jax.random.PRNGKey(0), 100)
    params = state.params

    rng = np.random.default_rng(0)

    def batch_arrays(b):
        images = jnp.asarray(
            rng.integers(0, 255, size=(b, S, S, 3), dtype=np.uint8))
        boxes = np.zeros((b, 4, 5), dtype=np.float32)
        boxes[:, 0] = [1.0, 40, 60, 120, 100]
        return (images, jnp.asarray(boxes),
                jnp.asarray(np.tile([True, False, False, False], (b, 1))),
                jnp.ones((b,), dtype=bool))

    images, boxes, box_mask, sample_mask = batch_arrays(B)
    imgs_f = images.astype(jnp.float32) / 255.0
    enc, _ = _encode_targets(module, boxes, box_mask, (S, S))
    key = jax.random.PRNGKey(1)

    results = {"batch": B, "size": S, "scan": args.scan, "reps": REPS}

    def chain(x, out):
        """Serialize scan iterations through a scalar data dependency."""
        return x + jnp.float32(1e-7) * jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32)

    # 1-2: forward only
    def fwd(train):
        def body(c):
            rngs = {"dropout": key} if train else None
            out = module.apply({"params": params}, c, train=train, rngs=rngs)
            return chain(c, out), jnp.sum(out[..., 0])
        return body

    results["fwd_eval_ms"] = round(
        time_scan_ms(fwd(False), imgs_f, args.scan), 3)
    results["fwd_train_ms"] = round(
        time_scan_ms(fwd(True), imgs_f, args.scan), 3)

    # 3-4: forward + backward (mean YOLO loss; encode precomputed so the
    # probe prices exactly fwd+bwd)
    def fwd_bwd(mod):
        def body(c):
            loss_fn = lambda p: _loss_and_out(
                mod, p, {}, c, enc, None, key, True, 10, sample_mask)[0]
            loss, grads = jax.value_and_grad(loss_fn)(params)
            # Keep the backward LIVE: chain a scalar from every grad leaf —
            # chaining only the loss lets XLA dead-code-eliminate the whole
            # backward (first run of this probe measured fwd_bwd == fwd).
            gsum = sum(g.reshape(-1)[0].astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            return chain(c, loss + 1e-7 * gsum), loss
        return body

    results["fwd_bwd_ms"] = round(
        time_scan_ms(fwd_bwd(module), imgs_f, args.scan), 3)
    results["fwd_bwd_nodrop_ms"] = round(
        time_scan_ms(fwd_bwd(module_nodrop), imgs_f, args.scan), 3)

    # 4b: optimizer apply alone — Adam update chain over the param tree with
    # derived gradients (prices the optax update + apply_updates passes).
    import optax

    from fdtpu.train.state import make_optimizer

    tx_probe = make_optimizer(TrainConfig(use_sam=False), 100)

    def opt_probe(c):
        p, o = c
        grads = jax.tree_util.tree_map(lambda q: 0.001 * q, p)
        updates, o2 = tx_probe.update(grads, o, p)
        p2 = optax.apply_updates(p, updates)
        return (p2, o2), jax.tree_util.tree_leaves(p2)[0].reshape(-1)[0]

    results["opt_only_ms"] = round(
        time_scan_ms(opt_probe, (params, tx_probe.init(params)), args.scan), 3)

    # 4c: fwd+bwd starting from the step's real uint8 input — prices the
    # u8 -> f32/255 conversion + area-filter mask the production no-augment
    # path performs (``_prepare_inputs`` else-branch) in fused context.
    def fwd_bwd_u8(mod):
        def body(c):
            imgs2, bx2, bm2 = _prepare_inputs(c, boxes, box_mask, key, False)
            enc2, _ = _encode_targets(mod, bx2, bm2, (S, S))
            loss_fn = lambda p: _loss_and_out(
                mod, p, {}, imgs2, enc2, None, key, True, 10, sample_mask)[0]
            loss, grads = jax.value_and_grad(loss_fn)(params)
            gsum = sum(g.reshape(-1)[0].astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            # chain through the uint8 carry (keep iterations serialized)
            c2 = c + (1e-7 * (loss + 1e-7 * gsum)).astype(c.dtype)
            return c2, loss
        return body

    results["fwd_bwd_u8_encode_ms"] = round(
        time_scan_ms(fwd_bwd_u8(module), images, args.scan), 3)

    # 5-7: full step variants through the production builder
    def step_body(cfg, aug):
        st, tx2 = create_train_state(module, cfg, jax.random.PRNGKey(0), 100)
        raw = make_train_step(module, tx2, cfg, augment=aug, jit=False)

        def body(c):
            st2, scalars = raw(c, images, boxes, box_mask, sample_mask, key)
            return st2, scalars["loss"]
        return body, st

    for name, cfg, aug in (
        ("adam_noaug_ms", TrainConfig(use_sam=False), False),
        ("sam_noaug_ms", TrainConfig(use_sam=True), False),
        ("full_ms", config, True),
    ):
        body, st = step_body(cfg, aug)
        results[name] = round(time_scan_ms(body, st, args.scan), 3)

    # derived lines
    results["derived"] = {
        "bwd_ms": round(results["fwd_bwd_ms"] - results["fwd_train_ms"], 3),
        "dropout_tax_ms": round(
            results["fwd_bwd_ms"] - results["fwd_bwd_nodrop_ms"], 3),
        "opt_encode_ms": round(
            results["adam_noaug_ms"] - results["fwd_bwd_ms"], 3),
        "input_passes_ms": round(
            results["fwd_bwd_u8_encode_ms"] - results["fwd_bwd_ms"], 3),
        "sam_tax_ms": round(
            results["sam_noaug_ms"] - results["adam_noaug_ms"], 3),
        "augment_in_step_ms": round(
            results["full_ms"] - results["sam_noaug_ms"], 3),
    }

    # 8: batch-scaling of the headline step
    if not args.skip_batch_sweep:
        sweep = {}
        for b in (64, 128, 256):
            ib, bb, mb, sb = batch_arrays(b)
            st, tx2 = create_train_state(module, config, jax.random.PRNGKey(0), 100)
            raw = make_train_step(module, tx2, config, augment=True, jit=False)

            def body(c, _ib=ib, _bb=bb, _mb=mb, _sb=sb):
                st2, scalars = raw(c, _ib, _bb, _mb, _sb, key)
                return st2, scalars["loss"]

            ms = time_scan_ms(body, st, args.scan)
            sweep[f"b{b}"] = {
                "ms_per_batch": round(ms, 3),
                "img_s": round(b / (ms / 1e3), 1),
            }
        results["batch_sweep"] = sweep

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
