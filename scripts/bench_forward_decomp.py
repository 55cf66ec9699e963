"""Decompose the flagship FORWARD's cost on TPU.

The round-4 step decomposition (`bench_step_decomp.py`) showed the backward
is near conv-ideal while the forward costs ~2x its conv FLOPs — making the
forward the single largest named roofline gap (paid twice per SAM step and
the entirety of the infer gap). Before building any fused kernel, this
script answers WHERE the forward's overhead lives:

1. *Achievable conv time*: each conv shape of PoolResnet-128@320 timed as a
   device-chained scan (8 sequential applications per iteration so the
   per-iteration floor amortizes). If the convs alone already cost most of
   the forward, the gap is XLA's conv efficiency at these shapes (not
   attackable without unfaithful reshaping) rather than elementwise traffic.
2. *Ablation variants*: the same architecture with LeakyReLU / the residual
   add / Dropout2d / sigmoid+f32-cast individually removed (weights and
   geometry unchanged). Harness-identical differences attribute each
   elementwise family.

Flagship geometry (PoolResnet-128, 320px, grid 15): stem k10s8 320->40,
block1 convs at 40^2 then pool ->20^2, blocks 2-10 at 20^2, head k6 valid
20->15. Conv FLOPs/img: stem 0.123G, 2x0.472G @40^2, 18x0.118G @20^2,
head 0.010G = 3.19G total.

Usage: python scripts/bench_forward_decomp.py [--batch 128]
Run alone - the chip admits one client at a time. One JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 3


def time_scan_ms(step_fn, init, n=10, reps=REPS):
    """Median per-iteration ms; syncs via a device-side scalar probe.

    The probe is data-dependent on the whole carry, so ``device_get`` of it
    forces the scan to completion — WITHOUT pulling the carry itself through
    the TPU tunnel. (The first version of this harness device_get the full
    carry: at b128/320px that is 78 MB over a ~8 MB/s tunnel, ~9.5 s/rep,
    which swamped every row — feedback320 and fwd_full both 'measured'
    ~940-960 ms/iter, i.e. pure transfer. Never fetch carries when timing.)
    """
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
    ap.add_argument("--chain", type=int, default=8,
                    help="sequential applications per scan iteration")
    ap.add_argument("--hlo-dir", default=None,
                    help="also dump optimized HLO of full/bare forwards here")
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from fdtpu.models import PoolResnet
    from fdtpu.models.layers import (
        Dropout2d, ResidualBlock, leaky_relu, max_pool_2x2,
    )

    B, R = args.batch, args.chain
    results = {"batch": B, "chain": R, "reps": REPS}
    key = jax.random.PRNGKey(0)

    # --- 1. achievable conv time per layer shape -------------------------
    # Shape-preserving convs chain directly (x = conv(x), tiny weights so
    # bf16 stays finite); shape-changing ones (stem/head/pool) feed a scalar
    # back into a base input (one extra elementwise pass, priced by the
    # `feedback` probe and subtracted).
    def conv_w(k, cin, cout, scale=0.05):
        w = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16) * scale
        return w

    w20 = conv_w(3, 128, 128)
    w40 = conv_w(3, 128, 128)
    wstem = conv_w(10, 3, 128)
    whead = conv_w(6, 128, 5)

    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w, stride=1, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad, dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16)

    x20 = jax.random.normal(key, (B, 20, 20, 128), jnp.bfloat16)
    x40 = jax.random.normal(key, (B, 40, 40, 128), jnp.bfloat16)
    x320 = jax.random.normal(key, (B, 320, 320, 3), jnp.bfloat16)

    def chained(f):
        def body(c):
            for _ in range(R):
                c = f(c)
            return c
        return body

    def feedback(f, base):
        # scalar feedback: out -> scalar -> base + eps*scalar (re-reads base)
        def one(c):
            s = jnp.sum(f(c)[:1, :1, :1, :1].astype(jnp.float32))
            return base + (1e-6 * s).astype(base.dtype)
        return chained(one)

    results["conv20_ms"] = round(
        time_scan_ms(chained(lambda x: conv(x, w20)), x20) / R, 4)
    results["conv40_ms"] = round(
        time_scan_ms(chained(lambda x: conv(x, w40)), x40) / R, 4)
    results["feedback40_ms"] = round(
        time_scan_ms(feedback(lambda x: x, x40), x40) / R, 4)
    results["feedback320_ms"] = round(
        time_scan_ms(feedback(lambda x: x[:, ::8, ::8, :1], x320), x320) / R,
        4)
    results["stem_ms"] = round(
        time_scan_ms(
            feedback(lambda x: conv(x, wstem, stride=8, pad=[(2, 2), (2, 2)]),
                     x320), x320) / R, 4)
    results["head_ms"] = round(
        time_scan_ms(feedback(lambda x: conv(x, whead, pad="VALID"), x20),
                     x20) / R, 4)
    results["pool40_ms"] = round(
        time_scan_ms(feedback(max_pool_2x2, x40), x40) / R, 4)

    # conv-sum: what the forward would cost if it were only its convs,
    # each at its measured achievable rate (stem/head/pool rows have the
    # scalar-feedback pass subtracted)
    fb40 = results["feedback40_ms"]
    fb320 = results["feedback320_ms"]
    conv_sum = (
        max(results["stem_ms"] - fb320, 0.0)
        + 2 * results["conv40_ms"]
        + 18 * results["conv20_ms"]
        + max(results["head_ms"] - fb40 * (20 * 20 * 128) / (40 * 40 * 128), 0.0)
        + max(results["pool40_ms"] - fb40, 0.0)
    )
    results["conv_sum_ms"] = round(conv_sum, 3)

    # --- 2. ablation variants --------------------------------------------
    class AblatedBlock(nn.Module):
        filters: int
        pool_until: int
        use_leaky: bool
        use_skip: bool
        use_dropout: bool

        @nn.compact
        def __call__(self, x, deterministic=True):
            skip = x
            act = leaky_relu if self.use_leaky else (lambda v: v)
            x = nn.Conv(self.filters, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
            x = act(x)
            x = nn.Conv(self.filters, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
            x = act(x)
            if self.use_dropout:
                x = Dropout2d(0.25)(x, deterministic)
            if self.use_skip:
                x = x + skip
            if x.shape[1] > self.pool_until:
                x = max_pool_2x2(x)
            return x

    class AblatedModel(nn.Module):
        use_leaky: bool = True
        use_skip: bool = True
        use_dropout: bool = True
        use_sigmoid: bool = True

        @nn.compact
        def __call__(self, x, train=False):
            x = x.astype(jnp.bfloat16)
            x = nn.Conv(128, (10, 10), strides=8, padding=2,
                        dtype=jnp.bfloat16)(x)
            for _ in range(10):
                x = AblatedBlock(128, 30, self.use_leaky, self.use_skip,
                                 self.use_dropout)(x, deterministic=not train)
            if self.use_dropout:
                x = Dropout2d(0.5)(x, deterministic=not train)
            x = nn.Conv(5, (6, 6), padding=0, dtype=jnp.bfloat16)(x)
            if self.use_sigmoid:
                return nn.sigmoid(x.astype(jnp.float32))
            return x

    def fwd_probe(module, params):
        def body(c):
            out = module.apply({"params": params}, c, train=False)
            s = jnp.sum(out[:1, :1, :1, :1].astype(jnp.float32))
            return c + (1e-7 * s).astype(c.dtype)
        return body

    variants = {
        "fwd_full": AblatedModel(),
        "fwd_no_leaky": AblatedModel(use_leaky=False),
        "fwd_no_skip": AblatedModel(use_skip=False),
        "fwd_no_sigmoid": AblatedModel(use_sigmoid=False),
        "fwd_bare": AblatedModel(use_leaky=False, use_skip=False,
                                 use_dropout=False, use_sigmoid=False),
        # Additive arms: the removal arms showed an OR-shaped tax (removing
        # any ONE feature saves <=0.2 ms; removing ALL saves 1.6). These
        # identify whether a single feature alone re-triggers the tax.
        "fwd_only_leaky": AblatedModel(use_skip=False, use_dropout=False,
                                       use_sigmoid=False),
        "fwd_only_skip": AblatedModel(use_leaky=False, use_dropout=False,
                                      use_sigmoid=False),
        "fwd_only_sigmoid": AblatedModel(use_leaky=False, use_skip=False,
                                         use_dropout=False),
        "fwd_leaky_skip": AblatedModel(use_dropout=False, use_sigmoid=False),
    }
    for name, mod in variants.items():
        params = mod.init(key, x320[:1])["params"]
        results[name + "_ms"] = round(
            time_scan_ms(fwd_probe(mod, params), x320), 3)

    # Fusion-blocker arm: the production ResidualBlock, but with an
    # optimization_barrier after every conv so NO elementwise epilogue can
    # fuse into a convolution. If the OR-tax comes from XLA-TPU switching
    # conv emitters when an epilogue fuses in, this arm should land near
    # fwd_bare + ~1 ms of separate elementwise passes; if the tax is real
    # HBM traffic, it should be the SLOWEST arm.
    class BarrierBlock(nn.Module):
        filters: int

        @nn.compact
        def __call__(self, x):
            skip = x
            x = nn.Conv(self.filters, (3, 3), padding=1,
                        dtype=jnp.bfloat16)(x)
            x = leaky_relu(jax.lax.optimization_barrier(x))
            x = nn.Conv(self.filters, (3, 3), padding=1,
                        dtype=jnp.bfloat16)(x)
            x = leaky_relu(jax.lax.optimization_barrier(x))
            x = x + skip
            if x.shape[1] > 30:
                x = max_pool_2x2(x)
            return x

    class BarrierModel(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = x.astype(jnp.bfloat16)
            x = nn.Conv(128, (10, 10), strides=8, padding=2,
                        dtype=jnp.bfloat16)(x)
            x = jax.lax.optimization_barrier(x)
            for _ in range(10):
                x = BarrierBlock(128)(x)
            x = nn.Conv(5, (6, 6), padding=0, dtype=jnp.bfloat16)(x)
            return nn.sigmoid(x.astype(jnp.float32))

    bmod = BarrierModel()
    bparams = bmod.init(key, x320[:1])["params"]
    results["fwd_barrier_ms"] = round(
        time_scan_ms(fwd_probe(bmod, bparams), x320), 3)

    # production module on the same bf16-carry harness, for cross-checking
    # against bench_step_decomp's f32-carry fwd_eval row
    prod = PoolResnet(filters=128, input_shape=(320, 320), num_patches=15,
                      num_residual_blocks=10)
    pparams = prod.init(key, x320[:1].astype(jnp.float32))["params"]
    results["fwd_production_bf16carry_ms"] = round(
        time_scan_ms(fwd_probe(prod, pparams), x320), 3)

    if args.hlo_dir:
        # Optimized-HLO dump of one application of full vs bare, for op-level
        # diffing (fusion count, conv emitter choice, layouts).
        hlo_dir = Path(args.hlo_dir)
        hlo_dir.mkdir(parents=True, exist_ok=True)
        for name in ("fwd_full", "fwd_bare"):
            mod = variants[name]
            params = mod.init(key, x320[:1])["params"]
            fn = jax.jit(lambda c, m=mod, p=params: m.apply(
                {"params": p}, c, train=False))
            txt = fn.lower(x320).compile().as_text()
            (hlo_dir / f"{name}.hlo.txt").write_text(txt)
            n_conv = txt.count(" convolution(")
            n_fus = txt.count(" fusion(")
            results[name + "_hlo"] = {"convolution": n_conv, "fusion": n_fus}

    results["derived"] = {
        "leaky_ms": round(results["fwd_full_ms"] - results["fwd_no_leaky_ms"], 3),
        "skip_ms": round(results["fwd_full_ms"] - results["fwd_no_skip_ms"], 3),
        "sigmoid_f32_ms": round(
            results["fwd_full_ms"] - results["fwd_no_sigmoid_ms"], 3),
        "elementwise_total_ms": round(
            results["fwd_full_ms"] - results["fwd_bare_ms"], 3),
        "non_conv_gap_ms": round(
            results["fwd_full_ms"] - results["conv_sum_ms"], 3),
    }

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
