"""SSD train-step decomposition: where do 43 ms/b64 actually go?

The round-5 width-folding shootout (``bench_ssd_arms.py``) showed the SSD
forward is only ~3.7 ms of the 43 ms SAM train step at b64/320px — so the
round-2 "16-channel convs starve the MXU" story cannot explain the train
row. This bench isolates the non-conv stages:

* ``mining``    — the hard-negative double argsort over (B, 4774) alone
  (``fdtpu/losses/ssd.py:50-54``; reference ``SSDLoss.py:47-52``).
* ``loss``      — full ``ssd_loss`` on fabricated outputs.
* ``loss_bwd``  — value_and_grad of the loss wrt fabricated outputs.
* ``fwd``       — model forward (train mode).
* ``fwd_bwd``   — fwd + bwd of loss(model) — one SAM half.
* ``encode``    — prior encoding of the batch targets (fabricated boxes).
* ``opt``       — adam update on the param tree alone.
* ``full``      — the production SAM train step (the grid-row harness).

One JSON line; run alone (one chip client at a time).
Usage: python scripts/bench_ssd_decomp.py [--batch 64] [--scan 100]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 5


def time_scan_ms(step_fn, init, n, reps=REPS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(c):
        c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c, None,
                            length=n)
        probe = jnp.sum(jnp.ravel(
            jax.tree_util.tree_leaves(c)[0])[:1].astype(jnp.float32))
        return c, probe

    c, p = many(init)
    jax.device_get(p)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, p = many(c)
        jax.device_get(p)
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan", type=int, default=100)
    ap.add_argument("--train-scan", type=int, default=50)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.losses.ssd import hard_negative_mining, ssd_loss
    from fdtpu.models import SSD, ssd_patch_sizes
    from fdtpu.train import create_train_state
    from fdtpu.train.step import make_train_step
    from fdtpu.utils.config import TrainConfig

    S, B = args.size, args.batch
    ps = ssd_patch_sizes((S, S))
    module = SSD(filters=16, input_shape=(S, S), patch_sizes=ps)
    results = {"size": S, "batch": B, "scan": args.scan,
               "train_scan": args.train_scan, "reps": REPS}

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, 3), jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0),
                            x[:1].astype(jnp.float32), train=False)
    out = jax.jit(lambda c: module.apply(variables, c, train=False))(x)
    N = out.shape[1]
    results["num_priors"] = int(N)

    # Fabricated loss inputs matching the production layout.
    kc, kl, kg = jax.random.split(key, 3)
    conf = jax.nn.sigmoid(jax.random.normal(kc, (B, N), jnp.float32))
    locs = jax.random.normal(kl, (B, N, 4), jnp.float32)
    labels = jnp.zeros((B, N), jnp.float32).at[:, :8].set(0.995)
    gt_locs = jax.random.normal(kg, (B, N, 4), jnp.float32)

    def emit(name, val):
        results[name] = round(val, 3)
        print(json.dumps(results), flush=True)

    # mining alone (carry conf; probe via the mask sum)
    def mining_body(c):
        m = hard_negative_mining(-jnp.log(jnp.clip(c, 1e-7, 1.0)), labels, 10)
        return c + 1e-12 * jnp.sum(m.astype(jnp.float32))

    emit("mining_ms", time_scan_ms(mining_body, conf, args.scan))

    # full loss forward on fabricated outputs
    def loss_body(c):
        l = ssd_loss(c, locs, labels, gt_locs, 10)
        return c + 1e-12 * l

    emit("loss_ms", time_scan_ms(loss_body, conf, args.scan))

    # loss backward
    lgrad = jax.grad(
        lambda c: ssd_loss(c, locs, labels, gt_locs, 10))

    def loss_bwd_body(c):
        return c + 1e-12 * lgrad(c)

    emit("loss_bwd_ms", time_scan_ms(loss_bwd_body, conf, args.scan))

    # model forward (train mode, dropout live)
    def fwd_body(c):
        o = module.apply(variables, c, train=False)
        return c + (1e-7 * jnp.sum(o[:1, :1].astype(jnp.float32))).astype(c.dtype)

    emit("fwd_ms", time_scan_ms(fwd_body, x, args.scan))

    # train-mode forward (live dropout: 13 blocks of threefry mask bits at
    # up-to-160x160 planes — the SSD-specific suspect)
    drng = jax.random.PRNGKey(7)

    def fwd_train_body(c):
        o = module.apply(variables, c, train=True, rngs={"dropout": drng})
        return c + (1e-7 * jnp.sum(o[:1, :1].astype(jnp.float32))).astype(c.dtype)

    emit("fwd_train_ms", time_scan_ms(fwd_train_body, x, args.scan))

    # fwd+bwd of loss(model) wrt params — one SAM half, eval vs train mode
    def net_loss(params, c, train):
        rngs = {"dropout": drng} if train else None
        o = module.apply({"params": params}, c, train=train, rngs=rngs)
        cf = o[..., 0]
        lc = o[..., 1:]
        return ssd_loss(cf, lc, labels, gt_locs, 10)

    for train in (False, True):
        g = jax.grad(functools.partial(net_loss, train=train))

        def fwd_bwd_body(c, g=g):
            gr = g(variables["params"], c)
            s = jnp.sum(jax.tree_util.tree_leaves(gr)[0].astype(jnp.float32))
            return c + (1e-12 * s).astype(c.dtype)

        emit(f"fwd_bwd{'_train' if train else ''}_ms",
             time_scan_ms(fwd_bwd_body, x, args.train_scan))

    # production _loss_and_out fwd+bwd (the real loss path: sample_mask
    # zeroing, enc-derived labels) on a precomputed encode — isolates any
    # loss-path cost my fabricated-label arm misses
    from fdtpu.core.priors import (
        apply_priors, calculate_priors, encode_ssd_targets, prior_scales,
    )
    from fdtpu.train.step import _loss_and_out

    boxes_p = np.zeros((B, 4, 5), np.float32)
    boxes_p[:, 0] = [1.0, 40, 60, 120, 100]
    bm_p = jnp.asarray(np.tile([True, False, False, False], (B, 1)))
    enc_p = jax.vmap(lambda b, m: encode_ssd_targets(
        b, m, tuple(module.patch_sizes), (S, S)))(jnp.asarray(boxes_p), bm_p)
    gt_p = apply_priors(enc_p, calculate_priors(tuple(module.patch_sizes)),
                        prior_scales(tuple(module.patch_sizes)))[..., 1:5]
    sm_p = jnp.ones((B,), bool)
    dkey = jax.random.PRNGKey(9)

    gprod = jax.grad(
        lambda p, c: _loss_and_out(module, p, {}, c, enc_p, gt_p, dkey,
                                   True, 10, sm_p)[0], has_aux=False)

    def prod_fwd_bwd_body(c):
        gr = gprod(variables["params"], c)
        s = jnp.sum(jax.tree_util.tree_leaves(gr)[0].astype(jnp.float32))
        return c + (1e-12 * s).astype(c.dtype)

    emit("prod_fwd_bwd_ms", time_scan_ms(prod_fwd_bwd_body, x,
                                         args.train_scan))

    # THE phantom-cost probe: same fwd+bwd but with the params as the scan
    # CARRY (changing every iteration, like the production step) instead of
    # a loop constant — isolates per-iteration parameter processing
    # (f32->bf16 casts + MXU relayout of 70 small kernels).
    def carry_fwd_bwd_body(p):
        gr = jax.grad(lambda pp: net_loss(pp, x, False))(p)
        return jax.tree_util.tree_map(lambda a, g: a + 1e-12 * g, p, gr)

    emit("fwd_bwd_carryparams_ms",
         time_scan_ms(carry_fwd_bwd_body, variables["params"],
                      args.train_scan))

    # ...and with a bf16 param tree carried (the model computes in bf16
    # anyway — flax promote_dtype makes apply-from-bf16 numerically
    # identical to cast-from-f32): if the phantom vanishes here, a bf16
    # apply-copy in TrainState is a faithful-numerics fix.
    p_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), variables["params"])

    def carry_bf16_body(p):
        gr = jax.grad(lambda pp: net_loss(pp, x, False))(p)
        return jax.tree_util.tree_map(lambda a, g: a + g * 1e-12, p, gr)

    emit("fwd_bwd_carrybf16_ms",
         time_scan_ms(carry_bf16_body, p_bf16, args.train_scan))

    # adam update alone on the real tree (carry the opt state)
    import optax

    from fdtpu.train import create_train_state as _cts
    from fdtpu.utils.config import TrainConfig as _TC

    state0, tx0 = _cts(module, _TC(use_sam=False), jax.random.PRNGKey(0),
                       100)
    fab_grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-6), state0.params)

    def opt_body(st):
        up, os2 = tx0.update(fab_grads, st.opt_state, st.params)
        return st.replace(step=st.step + 1,
                          params=optax.apply_updates(st.params, up),
                          opt_state=os2)

    emit("opt_only_ms", time_scan_ms(opt_body, state0, args.scan))

    # global_norm alone over the grad-sized tree
    def gnorm_body(st):
        n = optax.global_norm(st.params)
        return st.replace(step=st.step + (n > -1.0).astype(st.step.dtype))

    emit("gnorm_only_ms", time_scan_ms(gnorm_body, state0, args.scan))

    # SAM two-point gradients around the same net loss (isolates
    # sam_gradients' perturbation/combine from the rest of the step)
    from fdtpu.train.sam import sam_gradients

    def net_loss_aux(params, c):
        o = module.apply({"params": params}, c, train=False)
        l = ssd_loss(o[..., 0], o[..., 1:5], labels, gt_locs, 10)
        return l, (l, o, None)

    def sam_body(c):
        loss, aux, grads = sam_gradients(
            lambda p: net_loss_aux(p, c), variables["params"], 0.05)
        s = jnp.sum(jax.tree_util.tree_leaves(grads)[0].astype(jnp.float32))
        return c + (1e-12 * (s + loss)).astype(c.dtype)

    emit("sam_only_ms", time_scan_ms(sam_body, x, args.train_scan))

    # augment + target encode (the step's input stages)
    from fdtpu.train.step import _encode_targets, _prepare_inputs

    rng = np.random.default_rng(0)
    images_f = jnp.asarray(
        rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8))
    boxes_f = np.zeros((B, 4, 5), np.float32)
    boxes_f[:, 0] = [1.0, 40, 60, 120, 100]
    boxes_f = jnp.asarray(boxes_f)
    bm_f = jnp.asarray(np.tile([True, False, False, False], (B, 1)))

    def aug_encode_body(c):
        imgs, bx2, bm2 = _prepare_inputs(c, boxes_f, bm_f,
                                         jax.random.PRNGKey(5), True)
        enc, gl = _encode_targets(module, bx2, bm2, (S, S))
        s = (jnp.sum(imgs[:1, :1, :1].astype(jnp.float32))
             + jnp.sum(enc[:1, :1]) + jnp.sum(gl[:1, :1]))
        return c + (1e-7 * s).astype(c.dtype)

    emit("aug_encode_ms", time_scan_ms(aug_encode_body, images_f, args.scan))

    # full production SAM step
    images = jnp.asarray(rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8))
    boxes = np.zeros((B, 4, 5), np.float32)
    boxes[:, 0] = [1.0, 40, 60, 120, 100]
    boxes = jnp.asarray(boxes)
    bm = jnp.asarray(np.tile([True, False, False, False], (B, 1)))
    sm = jnp.ones((B,), bool)
    akey = jax.random.PRNGKey(1)

    for tag, sam, aug in (("full", True, True), ("full_adam", False, True),
                          ("full_noaug", True, False)):
        config = TrainConfig(use_sam=sam)
        state, tx = create_train_state(module, config, jax.random.PRNGKey(0),
                                       100)
        raw = make_train_step(module, tx, config, augment=aug, jit=False,
                              neg_pos_ratio=10)
        dt = time_scan_ms(lambda st: raw(st, images, boxes, bm, sm, akey)[0],
                          state, args.train_scan)
        emit(f"{tag}_ms", dt)
        results[f"{tag}_img_s"] = round(B / (dt / 1e3), 1)

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
