"""Fused residual-tail kernel (epilogue_pallas) vs the production op set.

Interpreter mode on the CPU backend; the same kernel compiles on TPU
(measured in scripts/bench_pool_fusion.py / BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.kernels.epilogue_pallas import fused_residual_tail, reference_tail
from fdtpu.models.layers import leaky_relu, max_pool_2x2


@pytest.mark.parametrize("pool", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_tail_bit_exact(pool, dtype):
    key = jax.random.PRNGKey(0)
    c2 = jax.random.normal(key, (3, 40, 40, 128), dtype)
    skip = jax.random.normal(jax.random.PRNGKey(1), c2.shape, dtype)
    got = fused_residual_tail(c2, skip, pool=pool, interpret=True)
    want = leaky_relu(c2) + skip
    if pool:
        want = max_pool_2x2(want)
    assert got.shape == want.shape
    assert np.array_equal(np.asarray(got), np.asarray(want))
    assert np.array_equal(
        np.asarray(got), np.asarray(reference_tail(c2, skip, pool=pool))
    )


def test_fused_tail_small_plane():
    # non-square pooled plane (20x24 -> 10x12) — exercises odd-ish tiling
    key = jax.random.PRNGKey(2)
    c2 = jax.random.normal(key, (2, 20, 24, 128), jnp.bfloat16)
    skip = jax.random.normal(jax.random.PRNGKey(3), c2.shape, jnp.bfloat16)
    got = fused_residual_tail(c2, skip, pool=True, interpret=True)
    want = max_pool_2x2(leaky_relu(c2) + skip)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fused_tail_flagship_no_pool_shape():
    # blocks 2-10 of the flagship (PoolResnet-128 @320) run at 20x20 with
    # pool=False — the exact production no-pool shape
    key = jax.random.PRNGKey(4)
    c2 = jax.random.normal(key, (2, 20, 20, 128), jnp.bfloat16)
    skip = jax.random.normal(jax.random.PRNGKey(5), c2.shape, jnp.bfloat16)
    got = fused_residual_tail(c2, skip, pool=False, interpret=True)
    want = leaky_relu(c2) + skip
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fused_tail_dtype_mismatch_rejected():
    c2 = jnp.zeros((1, 4, 4, 8), jnp.bfloat16)
    skip = jnp.zeros((1, 4, 4, 8), jnp.float32)
    with pytest.raises(AssertionError):
        fused_residual_tail(c2, skip, pool=False, interpret=True)
