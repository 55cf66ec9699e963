"""Measure the device-rotation tax (round-2 VERDICT weak-item 5 / round-3
item 4): full augment chain with and without rotation at b128/320px, plus
the bare three-shear pass at the exact-k subset size in f32 vs bf16.

Run alone — the chip admits one client at a time. One JSON line.
Usage: python scripts/bench_rotate.py [--batch 128] [--size 320] [--scan 20]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--scan", type=int, default=20)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.data.augment import P_ROTATE, augment_batch_fast
    from fdtpu.kernels.rotate_pallas import rotate_batch

    B, S = args.batch, args.size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, size=(B, S, S, 3), dtype=np.uint8)
    )
    boxes = np.zeros((B, 4, 5), np.float32)
    boxes[:, 0] = [1.0, 40, 60, 120, 100]
    boxes = jnp.asarray(boxes)
    masks = jnp.asarray(np.tile([True, False, False, False], (B, 1)))

    def scan_time(fn, *xs):
        @jax.jit
        def many(key, *xs):
            def body(c, i):
                out = fn(jax.random.fold_in(c, i), *xs)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jax.random.fold_in(c, jnp.sum(leaf).astype(jnp.int32)
                                          % 3), leaf[0, 0]
            return jax.lax.scan(body, key, jnp.arange(args.scan))

        k = jax.random.PRNGKey(0)
        _, o = many(k, *xs)
        jax.device_get(o)
        t0 = time.perf_counter()
        _, o = many(k, *xs)
        jax.device_get(o)
        return (time.perf_counter() - t0) / args.scan * 1e3  # ms/iter

    res = {"batch": B, "size": S}
    res["augment_ms"] = round(scan_time(
        lambda k: augment_batch_fast(k, imgs, boxes, masks, rotate=False)
    ), 3)
    res["augment_rotate_ms"] = round(scan_time(
        lambda k: augment_batch_fast(k, imgs, boxes, masks, rotate=True)
    ), 3)
    res["rotate_tax_ms"] = round(
        res["augment_rotate_ms"] - res["augment_ms"], 3
    )

    rk = round(P_ROTATE * B)
    sub_f32 = imgs[:rk].astype(jnp.float32)
    sub_bf16 = imgs[:rk].astype(jnp.bfloat16)

    def rot_only(dtype_sub):
        return lambda k: rotate_batch(
            dtype_sub,
            jax.random.uniform(k, (rk,), minval=-0.34, maxval=0.34),
        )

    res["rotate_f32_ms"] = round(scan_time(rot_only(sub_f32)), 3)
    res["rotate_bf16_ms"] = round(scan_time(rot_only(sub_bf16)), 3)

    from fdtpu.kernels.rotate_pallas import rotate_batch_transposed

    def rot_old(dtype_sub):
        return lambda k: rotate_batch_transposed(
            dtype_sub,
            jax.random.uniform(k, (rk,), minval=-0.34, maxval=0.34),
        )

    res["rotate_bf16_transposed_ms"] = round(scan_time(rot_old(sub_bf16)), 3)
    res["rot_subset"] = rk
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
