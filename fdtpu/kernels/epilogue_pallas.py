"""Fused residual-block tail: ``maxpool2x2(leaky(c2) + skip)`` in one pass.

The round-4 forward decomposition (BASELINE.md) showed XLA-TPU emits every
inter-conv elementwise op of the reference block
(``/root/reference/models/PoolResnet.py:11-43``: conv -> leaky -> conv ->
leaky -> dropout -> +skip -> maxpool) as a standalone kLoop fusion — a full
HBM round-trip each — and that no flag changes this (the
``optimization_barrier`` arm costs the same as the full model). At eval time
(dropout = identity) the tail after the second conv is

    out = max_pool_2x2(leaky(c2) + skip)        # pooling blocks
    out = leaky(c2) + skip                      # non-pooling blocks

which XLA prices at leaky (1R+1W) + add (2R+1W) + reduce-window (1R+W/4)
per block; the information-theoretic floor is 2R + W/4 (read each input
once, write the pooled output). This kernel hits the floor: one Pallas
program per image reads the two planes once from HBM and writes the fused
(optionally pooled) result.

Numerics: identical op set and order as the XLA path (leaky in the input
dtype, add, pairwise max), so outputs are bit-identical — gated by
``tests/test_epilogue.py`` and the bench's equality check.

**Eval-only**: ``pl.pallas_call`` has no VJP here, so differentiating
through ``fused_residual_tail`` raises. Production wiring gates on
``deterministic`` (ResidualBlock uses it only when dropout is identity);
the training step keeps the pure-XLA tail.

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
        # 2x2/2 max pool via strided-slice maxima (a reshape to
        # (h/2, 2, w/2, 2, c) makes Mosaic infer a 3-D vector layout it
        # cannot compare in; slices keep the native (sublane, lane) tiling)
        y = jnp.maximum(y[0::2], y[1::2])
        y = jnp.maximum(y[:, 0::2], y[:, 1::2])
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
