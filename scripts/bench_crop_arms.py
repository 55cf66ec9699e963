"""Crop-resample lowering shootout (round-4 VERDICT item 4).

The augment chain's crop block costs 1.48 ms of the 3.20 ms augment tax at
b128/320px, 1.13 ms of it the resample itself
(``logs/round4/augment_s200.json``). The resample is
``jax.image.scale_and_translate`` vmapped over the exact-k (26) crop rows —
internally one einsum ``bhwc,ho,wp->bopc`` whose contractions carry the
3-wide channel minor dim, the same lane-starvation story as the k10 stem.
Reference semantics: RandomSizedBBoxSafeCrop then resize back
(``/root/reference/datasets/WIDERFace/datamodule.py:105-125``).

Arms (identical math — the weight matrices come from jax's own
``compute_weight_mat``, so each arm computes the same two contractions in a
different layout):

* ``prod``     — vmapped ``scale_and_translate`` (round-4 shipped path).
* ``cmajor``   — transpose to (k, c, h, w), two einsums with 320-wide
  minor dims, transpose back.
* ``lanefold`` — vertical pass with (w*c)=960 folded lanes
  (``bho,bhX->boX``), horizontal pass on (k, o, w, c).

The arms above take PRE-BUILT weight matrices, so XLA hoists the ~0.8 ms
per-step construction out of the scan (that hoist is how round 5 found the
construction was the real cost). Two further arms sample fresh geometry
INSIDE each scan step, measuring construction + contraction like the real
train step:

* ``prod_full`` — per-step ``_sample_crop`` + ``scale_and_translate``
  (jax's five-pass ``compute_weight_mat``: abs-diff, kernel, sum-reduce,
  divide, range mask).
* ``fast_full`` — per-step ``_sample_crop`` + the closed-form clamped
  construction (``augment._crop_weight_mat``, round-5 shipped path) +
  the same einsum.

Gated allclose vs prod on one batch before timing. One JSON line.

Usage: python scripts/bench_crop_arms.py [--batch 128] [--scan 200]
Run alone — the chip admits one client at a time.
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZE = 320
REPS = 5


def time_scan_ms(step_fn, init, n, reps=REPS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(c):
        c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c, None,
                            length=n)
        probe = jnp.sum(
            jax.tree_util.tree_leaves(c)[0][:1, :1].astype(jnp.float32))
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan", type=int, default=200)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.data import augment as A
    from fdtpu.data.augment import P_CROP, _sample_crop

    B = args.batch
    k = round(P_CROP * B)
    S = SIZE
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (k, S, S, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    key = jax.random.PRNGKey(3)
    crop_keys = jax.random.split(key, k)
    cx, cy, cw, ch = jax.vmap(
        lambda ck: _sample_crop(jax.random.split(ck, 5), S, S, gate=False)
    )(crop_keys)
    sy, sx = S / ch, S / cw
    ty, tx = -cy * sy, -cx * sx

    def arm_prod(x):
        return jax.vmap(
            lambda im, vy, vx, wy, wx: jax.image.scale_and_translate(
                im, (S, S, 3), (0, 1), jnp.stack([vy, vx]),
                jnp.stack([wy, wx]), method="linear", antialias=False,
            )
        )(x, sy, sx, ty, tx)

    from jax._src.image import scale as _jscale

    _tri = _jscale._kernels[_jscale.ResizeMethod.LINEAR]
    wmat = jax.vmap(
        lambda s, t: _jscale.compute_weight_mat(S, S, s, t, _tri, False)
    )
    wv = wmat(sy, ty).astype(imgs.dtype)  # (k, h_in, h_out)
    ww = wmat(sx, tx).astype(imgs.dtype)  # (k, w_in, w_out)

    def arm_cmajor(x):
        xt = jnp.transpose(x, (0, 3, 1, 2))  # (k, c, h, w)
        y = jnp.einsum("bho,bchw->bcow", wv, xt)
        y = jnp.einsum("bwp,bcow->bcop", ww, y)
        return jnp.transpose(y, (0, 2, 3, 1))

    def arm_lanefold(x):
        xf = x.reshape(k, S, S * 3)
        y = jnp.einsum("bho,bhX->boX", wv, xf).reshape(k, S, S, 3)
        return jnp.einsum("bwp,bowc->bopc", ww, y)

    arms = {"prod": arm_prod, "cmajor": arm_cmajor, "lanefold": arm_lanefold}
    results = {"batch": B, "k": k, "scan": args.scan, "reps": REPS}

    ref = jax.device_get(jax.jit(arm_prod)(imgs)).astype(np.float32)
    for name, fn in arms.items():
        out = jax.device_get(jax.jit(fn)(imgs)).astype(np.float32)
        results[f"{name}_maxdiff"] = float(np.abs(out - ref).max())

    for name, fn in arms.items():
        def body(c, f=fn):
            s = jnp.sum(f(c)[:1, :1, :1].astype(jnp.float32))
            return c + (1e-7 * s).astype(c.dtype)
        results[f"{name}_ms"] = round(
            time_scan_ms(body, imgs, args.scan), 3)

    # ---- construction-included arms (geometry re-sampled per step, like
    # the train step — nothing hoistable) ----
    def crop_slow(ks5, im):
        cx, cy, cw, ch = _sample_crop(ks5, S, S, gate=False)
        vy, vx = S / ch, S / cw
        return jax.image.scale_and_translate(
            im, (S, S, 3), (0, 1), jnp.stack([vy, vx]),
            jnp.stack([-cy * vy, -cx * vx]), method="linear",
            antialias=False,
        )

    def crop_fast(ks5, im):
        cx, cy, cw, ch = _sample_crop(ks5, S, S, gate=False)
        wy = A._crop_weight_mat(S, cy, ch).astype(im.dtype)
        wx = A._crop_weight_mat(S, cx, cw).astype(im.dtype)
        return jnp.einsum("hwc,ho,wp->opc", im, wy, wx, precision="highest")

    gk = jax.random.split(jax.random.PRNGKey(9), k)
    slow1 = jax.device_get(jax.jit(jax.vmap(
        lambda ck, im: crop_slow(jax.random.split(ck, 5), im)))(gk, imgs))
    fast1 = jax.device_get(jax.jit(jax.vmap(
        lambda ck, im: crop_fast(jax.random.split(ck, 5), im)))(gk, imgs))
    results["full_maxdiff"] = float(
        np.abs(slow1.astype(np.float32) - fast1.astype(np.float32)).max())

    def full_body(crop_fn):
        def body(c):
            x, kk = c
            kk, ks = jax.random.split(kk)
            cks = jax.random.split(ks, k)
            y = jax.vmap(
                lambda ck, im: crop_fn(jax.random.split(ck, 5), im)
            )(cks, x)
            s = jnp.sum(y[:1, :1, :1].astype(jnp.float32))
            return (x + (1e-7 * s).astype(x.dtype), kk)
        return body

    for name, fn in (("prod_full", crop_slow), ("fast_full", crop_fast)):
        results[f"{name}_ms"] = round(
            time_scan_ms(full_body(fn), (imgs, jax.random.PRNGKey(4)),
                         args.scan), 3)

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
