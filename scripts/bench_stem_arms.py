"""Stem-formulation shootout on TPU: same k10/s8/cin3 stem dot products,
different lowerings.

The round-4 forward decomposition priced the reference stem
(``/root/reference/models/PoolResnet.py:62-67``) at ~1.3 ms/batch at
b128/320px (feedback pass subtracted) against an HBM roofline of ~0.25 ms —
the K = k*k*cin = 300 contraction with a 3-channel minor dim starves the
MXU. Arms (all computing the SAME outputs up to summation order):

- plain      : reference formulation, k10 s8 pad2
- padded16   : kernel zero-padded to 16x16, s8 (K=768, kernel spans align
               to the stride so XLA's patch extraction is block-regular)
- twostage   : 1x10/s(1,8) width-patch expansion conv (30 identity taps)
               then 10x1/s(8,1) conv with K=300 but a 30-channel minor dim
               (what fdtpu.models.layers.TwoStageStemConv ships)
- s2d        : explicit space-to-depth reshape/transpose + 2x2 s1 conv
               (measured SLOWER than plain — rejected lowering, kept here
               inline so the rejection stays reproducible)

Usage: python scripts/bench_stem_arms.py [--batch 128]
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

    B = args.batch
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 320, 320, 3), jnp.bfloat16)
    w = jax.random.normal(key, (10, 10, 3, 128), jnp.bfloat16) * 0.05
    dn = ("NHWC", "HWIO", "NHWC")
    results = {"batch": B}

    def conv(v, k, stride, pad):
        return jax.lax.conv_general_dilated(
            v, k, stride, pad, dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16)

    def plain(v):
        return conv(v, w, (8, 8), [(2, 2), (2, 2)])

    w16 = jnp.zeros((16, 16, 3, 128), jnp.bfloat16).at[:10, :10].set(w)

    def padded16(v):
        # right-pad so the last 16-tap window still starts at 310: 326 wide
        return conv(v, w16, (8, 8), [(2, 6), (2, 6)])

    w1 = np.zeros((1, 10, 3, 30), np.float32)
    for j in range(10):
        for c in range(3):
            w1[0, j, c, j * 3 + c] = 1.0
    w1 = jnp.asarray(w1, jnp.bfloat16)
    w2 = w.reshape(10, 1, 30, 128)  # (i,(j,c),f) with j*3+c minor, matches w1

    def twostage(v):
        z = conv(v, w1, (1, 8), [(0, 0), (2, 2)])
        return conv(z, w2, (8, 1), [(2, 2), (0, 0)])

    def s2d(v, k=10, s=8, p=2, cin=3, f=128):
        # explicit space-to-depth: stride x stride blocks into channels,
        # then a ceil(k/s) x ceil(k/s) stride-1 conv with K = s*s*cin
        b, h, ww, _ = v.shape
        kb = -(-k // s)
        out = (h + 2 * p - k) // s + 1
        nb = out - 1 + kb
        v = jnp.pad(v, ((0, 0), (p, nb * s - h - p), (p, nb * s - ww - p),
                        (0, 0)))
        v = v.reshape(b, nb, s, nb, s, cin)
        v = v.transpose(0, 1, 3, 2, 4, 5).reshape(b, nb, nb, s * s * cin)
        wp = jnp.zeros((kb * s, kb * s, cin, f), w.dtype).at[:k, :k].set(w)
        wp = wp.reshape(kb, s, kb, s, cin, f).transpose(0, 2, 1, 3, 4, 5)
        wp = wp.reshape(kb, kb, s * s * cin, f)
        return jax.lax.conv_general_dilated(
            v, wp, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16)

    arms = {"plain": plain, "padded16": padded16, "twostage": twostage,
            "s2d": s2d}

    # numerics gate first (bias-free arms; s2d adds a zero bias)
    ref = np.asarray(plain(x[:4]).astype(jnp.float32))
    for name, fn in arms.items():
        got = np.asarray(fn(x[:4]).astype(jnp.float32))
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        results[name + "_maxdiff"] = round(float(np.max(np.abs(got - ref))), 5)

    def feedback(f):
        def body(c):
            s = jnp.sum(f(c)[:1, :1, :1, :1].astype(jnp.float32))
            return x + (1e-6 * s).astype(x.dtype)
        return body

    results["feedback_ms"] = round(
        time_scan_ms(feedback(lambda v: v[:, ::8, ::8, :1]), x), 4)
    for name, fn in arms.items():
        results[name + "_ms"] = round(time_scan_ms(feedback(fn), x), 4)

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
