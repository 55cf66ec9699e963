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
    ap.add_argument("--priors", type=int, default=0,
                    help="candidate count override (0 = derive from --size "
                         "via ssd_patch_sizes)")
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.core.nms import nms, nms_matrix
    from fdtpu.kernels import (
        pallas_decode_filter_nms_batch,
        ssd_output_decode_tables,
    )
    from fdtpu.models import ssd_patch_sizes

    if args.priors:
        n_priors = args.priors
    else:
        ps = ssd_patch_sizes((args.size, args.size))
        n_priors = sum(p * p for p in ps)
    B = args.batch
    tables = ssd_output_decode_tables(n_priors, (args.size, args.size))
    rng = np.random.default_rng(0)

    def measure(out, label, results):
        def pallas_once(c):
            b, m = pallas_decode_filter_nms_batch(
                c, tables, 0.5, 0.5, args.capacity, interpret=False
            )
            return c + 1e-7 * b[0, 0, 0], jnp.sum(m)

        # the two XLA arms are called explicitly (ssd_output_filter_nms now
        # auto-routes small candidate counts to the matrix path; the bench
        # wants each implementation on its own)
        sx = jnp.asarray(
            [1.0, args.size, args.size, args.size, args.size], jnp.float32)

        def xla_once(c):
            b, m = jax.vmap(
                lambda o: nms(o * sx, 0.5, 0.5, args.capacity))(c)
            return c + 1e-7 * b[0, 0, 0], jnp.sum(m)

        def matrix_once(c):
            b, m = jax.vmap(
                lambda o: nms_matrix(o * sx, 0.5, 0.5, args.capacity))(c)
            return c + 1e-7 * b[0, 0, 0], jnp.sum(m)

        dt_p = time_scan(pallas_once, out, args.scan)
        dt_x = time_scan(xla_once, out, args.scan)
        # the (B, N, N) IoU tensor makes the matrix arm infeasible at full
        # SSD-480 scale (128 x 4774^2 f32 > HBM); measure it where it is a
        # deployment candidate
        if n_priors <= 2200:
            dt_m = time_scan(matrix_once, out, args.scan)
            results[f"{label}_matrix_ms"] = round(dt_m * 1e3, 3)
            # matrix vs pallas: both exact-greedy — compacted rows must match
            bm_, mm_ = jax.vmap(
                lambda o: nms_matrix(o * sx, 0.5, 0.5, args.capacity))(out)
            bp_, mp_ = pallas_decode_filter_nms_batch(out, tables, 0.5, 0.5,
                                                      args.capacity)
            bm_, mm_, bp_, mp_ = map(np.asarray, (bm_, mm_, bp_, mp_))
            results[f"{label}_matrix_agrees_pallas"] = all(
                bm_[i][mm_[i]].shape == bp_[i][mp_[i]].shape
                and np.allclose(bm_[i][mm_[i]], bp_[i][mp_[i]], atol=1e-3)
                for i in range(bm_.shape[0])
            )
        bp, mp = pallas_decode_filter_nms_batch(out, tables, 0.5, 0.5,
                                                args.capacity)
        bx, mx = jax.vmap(lambda o: nms(o * sx, 0.5, 0.5, args.capacity))(out)
        # compare the compacted kept rows (the XLA mask keeps holes over its
        # score-sorted candidates; the kernel compacts winners)
        bp, mp, bx, mx = map(np.asarray, (bp, mp, bx, mx))
        agree = all(
            bp[i][mp[i]].shape == bx[i][mx[i]].shape
            and np.allclose(bp[i][mp[i]], bx[i][mx[i]], atol=1e-3)
            for i in range(bp.shape[0])
        )
        results[f"{label}_pallas_ms"] = round(dt_p * 1e3, 3)
        results[f"{label}_xla_ms"] = round(dt_x * 1e3, 3)
        results[f"{label}_boxes_agree"] = agree

    # Realistic workload: ~40 confident detections per image (< capacity),
    # background below threshold. Both paths see the same candidate set and
    # must agree exactly.
    sparse = np.zeros((B, n_priors, 5), np.float32)
    sparse[..., 0] = rng.uniform(0, 0.45, (B, n_priors))
    sparse[..., 1:] = rng.uniform(0.2, 0.8, (B, n_priors, 4))
    for i in range(B):
        idx = rng.choice(n_priors, 40, replace=False)
        sparse[i, idx, 0] = rng.uniform(0.5, 1.0, 40)

    # Saturated workload: ~16% of priors above threshold (untrained model /
    # dense crowd). Here the paths legitimately DIVERGE: the XLA twin
    # truncates to the top-`capacity` scores before suppression (static-shape
    # compromise, fdtpu/core/nms.py:46-48) while the Pallas kernel greedily
    # scans ALL candidates — exact torchvision semantics under crowding.
    dense = np.zeros((B, n_priors, 5), np.float32)
    dense[..., 0] = rng.uniform(0, 1, (B, n_priors)) ** 4
    dense[..., 1:] = rng.uniform(0.2, 0.8, (B, n_priors, 4))

    results = {"batch": B, "priors": int(n_priors), "capacity": args.capacity}
    measure(jnp.asarray(sparse), "sparse", results)
    measure(jnp.asarray(dense), "saturated", results)
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
