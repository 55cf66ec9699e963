"""Fused residual-block tail: ``maxpool2x2(leaky(c2) + skip)`` in one pass.

**STATUS: built, measured on TPU, REJECTED — kept as the measurement**
(round-4 VERDICT item 1; BASELINE.md round-5 "fused-tail rejection").
The hypothesis came from the round-4 forward decomposition: an apparent
~1.6 ms/batch elementwise tax over the conv-only arm for the reference
block (``/root/reference/models/PoolResnet.py:11-43``: conv -> leaky ->
conv -> leaky -> dropout -> +skip -> maxpool), with a 2R + W/4 HBM floor
for the eval-time tail

    out = max_pool_2x2(leaky(c2) + skip)        # pooling blocks
    out = leaky(c2) + skip                      # non-pooling blocks

The real-chip shootout (``scripts/bench_pool_fusion.py``, b128/320px
flagship, scan=100, 5 reps, ``logs/round5/pool_fusion.json``) refutes it:

* production forward 2.98 ms; this kernel wired into every block 4.09 ms
  (**+37%**); the one-expression XLA "slicemax" rewrite 3.06 ms (wash).
* XLA-TPU already consumes the elementwise tail as conv *epilogue/input*
  fusions — there is no standalone round-trip to claim; a separate kernel
  ADDS one (conv output must round-trip HBM to feed it). The round-4
  "elementwise tax" is the irreducible traffic of those fused epilogues,
  not an unfused gap.
* Numerics: NOT bit-exact on real TPU — Mosaic's bf16 elementwise rounding
  differs from XLA's fused-epilogue arithmetic by 1-2 ULP (isolated probe
  maxdiff 0.03-0.06 on ±9-scale inputs; in-model 0.056). Interpret mode
  (the CPU test gate in ``tests/test_epilogue.py``) is exact — a reminder
  that interpret-mode equality does not transfer to Mosaic.

**Eval-only** either way: ``pl.pallas_call`` has no VJP here, so
differentiating through ``fused_residual_tail`` raises.

The pooled variant reshapes ``(H, W, C) -> (H//2, 2, W//2, 2, C)`` inside
the kernel and reduces the two size-2 axes; Mosaic accepts the sublane
split at these shapes (C = lane dim untouched). Planes are processed whole
(40x40x128 bf16 = 0.4 MB — well under the ~2 MB VMEM budget the rotation
kernels established on v5e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _tail_kernel(c2_ref, skip_ref, out_ref, *, pool: bool):
    x = c2_ref[0]
    # leaky_relu(x, 0.2) == max(x, 0.2*x) for slope < 1 — bit-identical to
    # where(x >= 0, x, 0.2*x) incl. -0/NaN, and avoids a bf16 cmpf Mosaic
    # rejects ("Target does not support this comparison") in layouts the
    # pooled variant induces.
    y = jnp.maximum(x, 0.2 * x) + skip_ref[0]
    if pool:
        # 2x2/2 max pool via two rank-preserving axis splits with STATIC
        # index maxima. On real TPU Mosaic rejects the alternatives: python
        # strided slices (y[0::2]) lower to a >2-D gather
        # ("Only 2D gather is supported") and lax.slice with strides trips
        # a vector.extract_strided_slice verification error; the single 5-D
        # reshape can't be compared in the layout Mosaic infers. Splitting
        # one axis at a time (lane dim c untouched) is accepted.
        h, w, c = y.shape
        y = y.reshape(h // 2, 2, w, c)
        y = jnp.maximum(y[:, 0], y[:, 1])
        y = y.reshape(h // 2, w // 2, 2, c)
        y = jnp.maximum(y[:, :, 0], y[:, :, 1])
    out_ref[0] = y


def fused_residual_tail(c2, skip, *, pool: bool, interpret: bool | None = None):
    """``max_pool_2x2(leaky_relu(c2, 0.2) + skip)`` (or un-pooled), fused.

    ``c2``/``skip``: ``(B, H, W, C)``, same shape/dtype. ``pool`` requires
    even ``H``/``W`` (the flagship's pooling blocks are 40x40 -> 20x20).
    """
    if interpret is None:
        # same convention as nms_pallas: real kernel on TPU, interpreter
        # elsewhere (CPU tests)
        interpret = jax.devices()[0].platform != "tpu"
    b, h, w, c = c2.shape
    assert skip.shape == c2.shape, (c2.shape, skip.shape)
    assert skip.dtype == c2.dtype, (c2.dtype, skip.dtype)
    if pool:
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        out_shape = (b, h // 2, w // 2, c)
    else:
        out_shape = (b, h, w, c)
    return pl.pallas_call(
        functools.partial(_tail_kernel, pool=pool),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1,) + out_shape[1:], lambda i: (i, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, c2.dtype),
        interpret=interpret,
    )(c2, skip)


def reference_tail(c2, skip, *, pool: bool):
    """Pure-jnp oracle (the exact op set the production block runs)."""
    y = jnp.where(c2 >= 0, c2, 0.2 * c2) + skip
    if pool:
        b, h, w, c = y.shape
        y = jnp.max(y.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    return y
