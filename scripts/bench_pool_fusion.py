"""Attack the forward elementwise tax with a fused residual tail.

The round-4 decomposition (BASELINE.md "forward gap") proved the ~1.6 ms
elementwise tax is fully-unfused HBM traffic: XLA-TPU emits leaky / +skip /
maxpool as standalone kLoop fusions and no flag changes it. This bench
measures the two remaining attacks on the production eval forward
(PoolResnet-128 @320, fast stem, b128):

* ``slicemax`` — pure-XLA rewrite: the tail written as one expression with
  maxpool as ``jnp.maximum`` of 4 strided slices of ``leaky(c2)+skip``
  (slices are fusion-friendly views, so XLA *can* emit one fusion reading
  c2+skip once — whether it *does* on TPU is the question). Differentiable.
* ``pallas`` — ``fdtpu.kernels.epilogue_pallas.fused_residual_tail``: one
  program per image reads both planes once, writes the (pooled) result.
  Floor traffic: 2R + W/4 vs XLA's 4R + 2.25W per pooling block.

Both arms share weights with the production model and are gated
bit-identical on one batch before timing. One JSON line.

Usage: python scripts/bench_pool_fusion.py [--batch 128] [--scan 100]
Run alone — the chip admits one client at a time.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 5


def time_scan_ms(step_fn, init, n, reps=REPS):
    """Median per-iteration ms (device-side scan, scalar probe sync)."""
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
    ap.add_argument("--scan", type=int, default=100)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from fdtpu.kernels.epilogue_pallas import fused_residual_tail
    from fdtpu.models import PoolResnet
    from fdtpu.models.layers import (
        Dropout2d, TwoStageStemConv, leaky_relu, max_pool_2x2,
    )

    B = args.batch
    results = {"batch": B, "scan": args.scan, "reps": REPS}
    key = jax.random.PRNGKey(0)
    x320 = jax.random.normal(key, (B, 320, 320, 3), jnp.bfloat16)

    # Variant block: same param tree as ResidualBlock (two autonamed
    # nn.Conv), tail selected by `mode`.
    class TailBlock(nn.Module):
        filters: int
        pool_until: int
        mode: str  # "prod" | "slicemax" | "pallas"

        @nn.compact
        def __call__(self, x, deterministic=True):
            skip = x
            x = nn.Conv(self.filters, (3, 3), padding=1,
                        dtype=jnp.bfloat16)(x)
            x = leaky_relu(x)
            x = nn.Conv(self.filters, (3, 3), padding=1,
                        dtype=jnp.bfloat16)(x)
            pool = x.shape[1] > self.pool_until
            if self.mode == "pallas":
                return fused_residual_tail(x, skip, pool=pool)
            y = leaky_relu(x) + skip
            if not pool:
                return y
            if self.mode == "slicemax":
                return jnp.maximum(
                    jnp.maximum(y[:, 0::2, 0::2], y[:, 0::2, 1::2]),
                    jnp.maximum(y[:, 1::2, 0::2], y[:, 1::2, 1::2]),
                )
            return max_pool_2x2(y)

    class TailModel(nn.Module):
        mode: str

        @nn.compact
        def __call__(self, x, train=False):
            x = x.astype(jnp.bfloat16)
            x = TwoStageStemConv(128, kernel_size=10, stride=8, padding=2,
                                 name="Conv_0")(x)
            for i in range(10):
                # named to match PoolResnet's autonaming so production
                # params apply verbatim
                x = TailBlock(128, 30, self.mode,
                              name=f"ResidualBlock_{i}")(
                    x, deterministic=not train)
            x = Dropout2d(0.5)(x, deterministic=not train)
            x = nn.Conv(5, (6, 6), padding=0, dtype=jnp.bfloat16,
                        name="Conv_1")(x)
            return nn.sigmoid(x.astype(jnp.float32))

    prod = PoolResnet(filters=128, input_shape=(320, 320), num_patches=15,
                      num_residual_blocks=10, fast_stem=True)
    params = prod.init(key, x320[:1].astype(jnp.float32))["params"]

    # equality gate: all arms bit-identical to production on one batch
    ref_out = jax.device_get(jax.jit(
        lambda c: prod.apply({"params": params}, c, train=False))(x320[:8]))
    for mode in ("prod", "slicemax", "pallas"):
        mod = TailModel(mode)
        out = jax.device_get(jax.jit(
            lambda c, m=mod: m.apply({"params": params}, c, train=False)
        )(x320[:8]))
        exact = bool(np.array_equal(out, ref_out))
        results[f"{mode}_exact"] = exact
        if not exact:
            results[f"{mode}_maxdiff"] = float(np.abs(out - ref_out).max())

    def fwd_probe(module):
        def body(c):
            out = module.apply({"params": params}, c, train=False)
            s = jnp.sum(out[:1, :1, :1, :1].astype(jnp.float32))
            return c + (1e-7 * s).astype(c.dtype)
        return body

    for mode in ("prod", "slicemax", "pallas"):
        results[f"fwd_{mode}_ms"] = round(
            time_scan_ms(fwd_probe(TailModel(mode)), x320, args.scan), 3)

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
