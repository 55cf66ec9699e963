"""Decompose the device augmentation chain's cost on TPU (round-3 VERDICT
stretch item: the chain costs ~4.2 ms/batch at b128/320px; the named
remainder is the crop's gather/scatter + resample and the whole-batch
flip/fma pass).

Times each stage of ``augment_batch_fast`` in isolation as a scanned device
loop (one dispatch, n iterations), so per-call tunnel latency is excluded.

Usage: python scripts/bench_augment.py [--batch 128] [--size 320]
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


def time_scan(step_fn, init, n, reps=REPS):
    """Median per-iteration seconds over ``reps`` timed dispatches (tunnel
    latency varies several-fold; single-rep rows flip-flopped on the fused
    photometric arm — round-4 VERDICT weak item 3)."""
    import jax

    @jax.jit
    def many(c):
        return jax.lax.scan(lambda c, _: step_fn(c), c, None, length=n)

    c, out = many(init)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, out = many(c)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--scan", type=int, default=30)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.data import augment as A

    B, S = args.batch, args.size
    rng = np.random.default_rng(0)
    imgs0 = jnp.asarray(
        rng.integers(0, 255, (B, S, S, 3)).astype(np.float32)
    )
    boxes0 = jnp.asarray(
        np.tile(np.asarray([[1.0, 20, 30, 60, 50]], np.float32), (B, 4, 1))
    )
    masks0 = jnp.asarray(np.ones((B, 4), bool))
    key0 = jax.random.PRNGKey(0)

    results = {"batch": B, "size": S}

    def bump(key):
        return jax.random.fold_in(key, 1)

    # full chain
    def full(c):
        key, imgs = c
        out_i, out_b, out_m = A.augment_batch_fast(key, imgs, boxes0, masks0)
        return (bump(key), imgs + 1e-7 * out_i[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["full_ms"] = round(
        time_scan(full, (key0, imgs0), args.scan) * 1e3, 3)

    # full chain, positional crop (first-k slices instead of gather/scatter)
    def full_pos(c):
        key, imgs = c
        out_i, out_b, out_m = A.augment_batch_fast(
            key, imgs, boxes0, masks0, positional_crop=True)
        return (bump(key), imgs + 1e-7 * out_i[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["full_positional_ms"] = round(
        time_scan(full_pos, (key0, imgs0), args.scan) * 1e3, 3)

    # identity baseline (u8->bf16 cast + /255 clip only)
    def ident(c):
        key, imgs = c
        out = jnp.clip(imgs.astype(jnp.bfloat16), 0, 255) / jnp.bfloat16(255)
        return (bump(key), imgs + 1e-7 * out[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["cast_only_ms"] = round(
        time_scan(ident, (key0, imgs0), args.scan) * 1e3, 3)

    # crop block: exact-k gather -> vmapped resample -> scatter
    k = round(A.P_CROP * B)

    def crop_block(c):
        key, imgs = c
        imgs16 = imgs.astype(jnp.bfloat16)
        kperm, kcrop = jax.random.split(key)
        sel = jax.random.permutation(kperm, B)[:k]
        sub_i, sub_b, sub_m = imgs16[sel], boxes0[sel], masks0[sel]
        ck = jax.random.split(kcrop, k)

        def crop_one(ck1, im, bx, mk):
            cx, cy, cw, ch = A._sample_crop(
                jax.random.split(ck1, 5), S, S, gate=False)
            return A._apply_crop(im, bx, mk, cx, cy, cw, ch)

        ci, cb, cm = jax.vmap(crop_one)(ck, sub_i, sub_b, sub_m)
        out = imgs16.at[sel].set(ci)
        return (bump(key), imgs + 1e-7 * out[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["crop_block_ms"] = round(
        time_scan(crop_block, (key0, imgs0), args.scan) * 1e3, 3)

    # crop resample only (no gather/scatter: crops the FIRST k rows)
    def crop_resample(c):
        key, imgs = c
        imgs16 = imgs.astype(jnp.bfloat16)
        ck = jax.random.split(key, k)

        def crop_one(ck1, im, bx, mk):
            cx, cy, cw, ch = A._sample_crop(
                jax.random.split(ck1, 5), S, S, gate=False)
            return A._apply_crop(im, bx, mk, cx, cy, cw, ch)

        ci, cb, cm = jax.vmap(crop_one)(ck, imgs16[:k], boxes0[:k], masks0[:k])
        out = jnp.concatenate([ci, imgs16[k:]])
        return (bump(key), imgs + 1e-7 * out[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["crop_resample_slice_ms"] = round(
        time_scan(crop_resample, (key0, imgs0), args.scan) * 1e3, 3)

    # photometric block (flip + fma + exact-k noise/blurs + clip/scale)
    def photo(c):
        key, imgs = c
        imgs16 = imgs.astype(jnp.bfloat16)
        scalars, seeds, sels = A._sample_photometric_params_exact_k(key, B)
        out = A._apply_photometric_xla_subset(
            jax.random.fold_in(key, 3), imgs16, scalars, sels)
        return (bump(key), imgs + 1e-7 * out[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["photometric_ms"] = round(
        time_scan(photo, (key0, imgs0), args.scan) * 1e3, 3)

    # photometric control with the clip/scale as its own whole-batch pass
    # AFTER the subset scatter (the pre-round-4 order), to price the fused
    # finish in _apply_photometric_xla_subset
    def photo_unfused(c):
        key, imgs = c
        imgs16 = imgs.astype(jnp.bfloat16)
        scalars, seeds, sels = A._sample_photometric_params_exact_k(key, B)
        noise_sel, glass_sel, motion_sel = sels
        n = noise_sel.shape[0]
        kf = jax.random.fold_in(key, 3)
        out = jnp.where(
            scalars[:, 0, None, None, None] > 0.5, imgs16[:, :, ::-1, :],
            imgs16)
        out = out * scalars[:, 1, None, None, None].astype(out.dtype) \
            + scalars[:, 2, None, None, None].astype(out.dtype)
        sel3 = jnp.concatenate([noise_sel, glass_sel, motion_sel])
        sub = out[sel3]
        sigma = scalars[noise_sel, 3].astype(out.dtype)
        seed = jax.random.randint(kf, (), 0, 2**31 - 1)
        noise = jax.random.normal(
            jax.random.key(seed, impl="rbg"), sub[:n].shape, dtype=out.dtype)
        noised = sub[:n] + sigma[:, None, None, None] * noise
        g7 = jnp.zeros((7, 7), jnp.float32).at[1:6, 1:6].set(
            A._gaussian_kernel5())
        ang = (scalars[motion_sel, 6] + 0.5) * jnp.pi / 16.0
        kerns = jnp.concatenate([
            jnp.broadcast_to(g7, (glass_sel.shape[0], 7, 7)),
            jax.vmap(A._motion_kernel7)(ang)])
        blurred = A._depthwise_filter_batch(sub[n:], kerns)
        out = out.at[sel3].set(jnp.concatenate([noised, blurred]))
        out = jnp.clip(out, 0.0, 255.0) / jnp.bfloat16(255.0)
        return (bump(key), imgs + 1e-7 * out[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["photometric_unfused_ms"] = round(
        time_scan(photo_unfused, (key0, imgs0), args.scan) * 1e3, 3)

    # flip + fma only (whole batch)
    def flipfma(c):
        key, imgs = c
        imgs16 = imgs.astype(jnp.bfloat16)
        scalars, seeds, sels = A._sample_photometric_params_exact_k(key, B)
        out = jnp.where(
            scalars[:, 0, None, None, None] > 0.5, imgs16[:, :, ::-1, :],
            imgs16)
        out = out * scalars[:, 1, None, None, None].astype(out.dtype) \
            + scalars[:, 2, None, None, None].astype(out.dtype)
        out = jnp.clip(out, 0, 255) / jnp.bfloat16(255)
        return (bump(key), imgs + 1e-7 * out[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["flip_fma_ms"] = round(
        time_scan(flipfma, (key0, imgs0), args.scan) * 1e3, 3)

    # noise + blurs subset block only (gather + rbg noise + grouped conv +
    # scatter)
    def subset_block(c):
        key, imgs = c
        imgs16 = imgs.astype(jnp.bfloat16)
        scalars, seeds, sels = A._sample_photometric_params_exact_k(key, B)
        noise_sel, glass_sel, motion_sel = sels
        n = noise_sel.shape[0]
        sel3 = jnp.concatenate([noise_sel, glass_sel, motion_sel])
        sub = imgs16[sel3]
        sigma = scalars[noise_sel, 3].astype(imgs16.dtype)
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        noise = jax.random.normal(
            jax.random.key(seed, impl="rbg"), sub[:n].shape,
            dtype=imgs16.dtype)
        noised = sub[:n] + sigma[:, None, None, None] * noise
        g7 = jnp.zeros((7, 7), jnp.float32).at[1:6, 1:6].set(
            A._gaussian_kernel5())
        ang = (scalars[motion_sel, 6] + 0.5) * jnp.pi / 16.0
        kerns = jnp.concatenate([
            jnp.broadcast_to(g7, (glass_sel.shape[0], 7, 7)),
            jax.vmap(A._motion_kernel7)(ang)])
        blurred = A._depthwise_filter_batch(sub[n:], kerns)
        out = imgs16.at[sel3].set(jnp.concatenate([noised, blurred]))
        return (bump(key), imgs + 1e-7 * out[0, 0, 0, 0].astype(imgs.dtype)), 0

    results["noise_blur_subset_ms"] = round(
        time_scan(subset_block, (key0, imgs0), args.scan) * 1e3, 3)

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
