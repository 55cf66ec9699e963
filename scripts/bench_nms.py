"""Measure the batched fused decode+filter+NMS paths on TPU at SSD scale.

Compares the grid-blocked batched Pallas kernel against the vmapped XLA twin
at the framework's preferred batch sizes (VERDICT round-1 item 7: the
whole-batch kernel held ~22 MB of VMEM planes at b128/4,774 priors — the
batch-tiled version must run at b128 without spill and still win).

Usage: python scripts/bench_nms.py [--batch 128] [--size 320 | --priors N]
Run alone — the chip admits one client at a time. One JSON line per config.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def time_scan(step_fn, init, n):
    import jax

    @jax.jit
    def many(c):
        return jax.lax.scan(lambda c, _: step_fn(c), c, None, length=n)

    c, out = many(init)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    c, out = many(c)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--capacity", type=int, default=64)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.core.nms import ssd_output_filter_nms
    from fdtpu.kernels import (
        pallas_decode_filter_nms_batch,
        ssd_output_decode_tables,
    )
    from fdtpu.models import ssd_patch_sizes

    ps = ssd_patch_sizes((args.size, args.size))
    n_priors = sum(p * p for p in ps)
    B = args.batch

    rng = np.random.default_rng(0)
    # raw SSD head output: sigmoid scores + cell-relative locations
    out = np.zeros((B, n_priors, 5), np.float32)
    out[..., 0] = rng.uniform(0, 1, (B, n_priors)) ** 4  # sparse-ish scores
    out[..., 1:] = rng.uniform(0.2, 0.8, (B, n_priors, 4))
    out = jnp.asarray(out)
    tables = ssd_output_decode_tables(n_priors, (args.size, args.size))

    def pallas_once(c):
        b, m = pallas_decode_filter_nms_batch(
            c, tables, 0.5, 0.5, args.capacity, interpret=False
        )
        return c + 1e-7 * b[0, 0, 0], jnp.sum(m)

    def xla_once(c):
        b, m = jax.vmap(
            lambda o: ssd_output_filter_nms(
                o, (args.size, args.size), 0.5, 0.5, args.capacity
            )
        )(c)
        return c + 1e-7 * b[0, 0, 0], jnp.sum(m)

    dt_p = time_scan(pallas_once, out, args.scan)
    dt_x = time_scan(xla_once, out, args.scan)

    # agreement check (bit-exactness is asserted in tests; sanity here)
    bp, mp = pallas_decode_filter_nms_batch(out, tables, 0.5, 0.5, args.capacity)
    bx, mx = jax.vmap(
        lambda o: ssd_output_filter_nms(o, (args.size, args.size), 0.5, 0.5,
                                        args.capacity)
    )(out)
    agree = bool(jnp.array_equal(mp, mx))

    print(json.dumps({
        "batch": B,
        "priors": int(n_priors),
        "pallas_ms_per_batch": round(dt_p * 1e3, 3),
        "xla_ms_per_batch": round(dt_x * 1e3, 3),
        "speedup_vs_xla": round(dt_x / dt_p, 2),
        "masks_agree": agree,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
