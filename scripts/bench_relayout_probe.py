"""Parameter-relayout tax probe (round-5 SSD decomposition follow-up).

``bench_ssd_decomp.py`` found the SSD-16 SAM train step pays ~7 ms PER
GRADIENT EVALUATION (14 ms of the 43 ms step) just because the parameters
change each iteration: XLA re-lays-out ~70 small lane-misaligned (cout=32)
conv kernels for the MXU every time (``fwd_bwd_carryparams`` 19.5 ms vs
12.5 ms with loop-constant params; a bf16 carry doesn't help, so it's the
tiling, not the cast). This probe measures, on a 12-conv 32->32 chain at
the SSD middle-block geometry (b64, 40x40x32), whether restructuring the
PARAM TREE kills the tax while keeping the math identical:

* ``const``     — kernels as closure constants (the hoisted floor).
* ``unrolled``  — 12 separate carried kernels (the production layout).
* ``stacked``   — ONE carried (12,3,3,32,32) tensor, ``lax.scan`` over
  layers (flax ``nn.scan`` analogue): 1 relayout op instead of 12.
* ``catlanes``  — ONE carried (3,3,32,384) tensor, kernels concatenated
  along cout (full 128-lane tiles), static lane-slices at use.

Each arm times grad-wrt-params with the params as the scan carry, exactly
like a train step. One JSON line.
Usage: python scripts/bench_relayout_probe.py [--scan 100]
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
L = 12          # convs in the chain (the 6 identical SSD middle blocks)
B, H, W, C = 64, 40, 40, 32


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
    ap.add_argument("--scan", type=int, default=100)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    ks = [jax.random.normal(jax.random.fold_in(key, i),
                            (3, 3, C, C), jnp.float32) * 0.05
          for i in range(L)]

    def conv(h, k):
        h = jax.lax.conv_general_dilated(
            h, k.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.leaky_relu(h)

    def chain_loss_unrolled(kernels, h):
        for k in kernels:
            h = conv(h, k)
        return jnp.sum(h.astype(jnp.float32))

    def chain_loss_stacked(stk, h):
        def body(h, k):
            return conv(h, k), None
        h, _ = jax.lax.scan(body, h, stk)
        return jnp.sum(h.astype(jnp.float32))

    def chain_loss_catlanes(cat, h):
        for i in range(L):
            h = conv(h, cat[..., i * C:(i + 1) * C])
        return jnp.sum(h.astype(jnp.float32))

    results = {"batch": B, "hw": [H, W], "chans": C, "layers": L,
               "scan": args.scan, "reps": REPS}

    def emit(name, val):
        results[name] = round(val, 3)
        print(json.dumps(results), flush=True)

    # const: params hoisted (the floor)
    gconst = jax.grad(lambda h: chain_loss_unrolled(ks, h))

    def const_body(h):
        return h + 1e-12 * gconst(h)

    emit("const_ms", time_scan_ms(const_body, x, args.scan))

    # unrolled: 12 carried kernels
    gun = jax.grad(chain_loss_unrolled)

    def unrolled_body(kernels):
        gr = gun(kernels, x)
        return [k + 1e-12 * g for k, g in zip(kernels, gr)]

    emit("unrolled_ms", time_scan_ms(unrolled_body, ks, args.scan))

    # stacked: one (L,3,3,C,C) carry, scan over layers
    stk0 = jnp.stack(ks)
    gst = jax.grad(chain_loss_stacked)

    def stacked_body(stk):
        return stk + 1e-12 * gst(stk, x)

    emit("stacked_ms", time_scan_ms(stacked_body, stk0, args.scan))

    # catlanes: one (3,3,C,L*C) carry, static lane slices
    cat0 = jnp.concatenate(ks, axis=-1)
    gct = jax.grad(chain_loss_catlanes)

    def catlanes_body(cat):
        return cat + 1e-12 * gct(cat, x)

    emit("catlanes_ms", time_scan_ms(catlanes_body, cat0, args.scan))

    # numerics: all arms are the same dot products
    v = chain_loss_unrolled(ks, x)
    results["stacked_delta"] = float(abs(chain_loss_stacked(stk0, x) - v))
    results["catlanes_delta"] = float(abs(chain_loss_catlanes(cat0, x) - v))
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
