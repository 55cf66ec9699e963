"""Measure the fast (two-stage) stem on TPU: production PoolResnet-128@320
forward, plain vs ``fast_stem=True``, plus the stem conv in isolation.

Motivation: the round-4 forward decomposition measured the k10/s8/cin3 stem
at ~1.2 ms of the 3.4 ms conv-only forward (the 3-wide channel minor dim
starves the conv emitter). TwoStageStemConv
(fdtpu/models/layers.py) lowers the same dot products as 1xk identity
expansion + kx1 conv with a k*cin = 30 channel minor dim; the isolated
shootout (scripts/bench_stem_arms.py) measured 0.65 vs 5.16 ms/batch.

Usage: python scripts/bench_fast_stem.py [--batch 128]
Run alone - the chip admits one client at a time. One JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def time_scan_ms(step_fn, init, n=10, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(c):
        c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c, None, length=n)
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
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.models import PoolResnet
    from fdtpu.models.layers import TwoStageStemConv

    B = args.batch
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B, 320, 320, 3), jnp.float32)
    results = {"batch": B}

    kw = dict(filters=128, input_shape=(320, 320), num_patches=15,
              num_residual_blocks=10)
    plain = PoolResnet(**kw)
    fast = PoolResnet(fast_stem=True, **kw)
    params = plain.init(key, x[:1])["params"]

    def fwd_probe(module):
        def body(c):
            out = module.apply({"params": params}, c, train=False)
            s = jnp.sum(out[:1, :1, :1, :1])
            return c + 1e-7 * s
        return body

    results["fwd_plain_ms"] = round(time_scan_ms(fwd_probe(plain), x), 3)
    results["fwd_fast_ms"] = round(time_scan_ms(fwd_probe(fast), x), 3)

    # stem in isolation (bf16 input, scalar feedback like bench_forward_decomp)
    xb = x.astype(jnp.bfloat16)
    stem = TwoStageStemConv(128, kernel_size=10, stride=8, padding=2)
    sparams = stem.init(key, xb[:1])["params"]

    def stem_probe(c):
        out = stem.apply({"params": sparams}, c)
        s = jnp.sum(out[:1, :1, :1, :1].astype(jnp.float32))
        return c + (1e-6 * s).astype(c.dtype)

    results["stem_fast_iso_ms"] = round(time_scan_ms(stem_probe, xb), 3)

    # numerics cross-check on device
    y1 = plain.apply({"params": params}, x[:8])
    y2 = fast.apply({"params": params}, x[:8])
    results["max_output_diff"] = float(
        jnp.max(jnp.abs(y1 - y2)))

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
