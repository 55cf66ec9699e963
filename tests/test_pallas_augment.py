"""Fused photometric Pallas kernel (interpret mode) vs the XLA chain."""

import numpy as np
import jax
import jax.numpy as jnp

from fdtpu.data.augment import (
    _apply_photometric_xla,
    _depthwise_filter,
    _gaussian_kernel5,
    _sample_photometric_params,
)
from fdtpu.kernels.augment_pallas import pallas_photometric_batch


def _imgs(rng, b=2, s=64):
    return jnp.asarray(rng.uniform(0, 255, (b, s, s, 3)).astype(np.float32))


def test_identity(rng):
    imgs = _imgs(rng)
    sc = np.zeros((2, 8), np.float32)
    sc[:, 1] = 1.0  # alpha
    out = pallas_photometric_batch(
        imgs, jnp.asarray(sc), jnp.zeros((6,), jnp.int32), True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(imgs) / 255.0, atol=5e-3
    )


def test_matches_xla_twin(rng):
    """Same scalar table through both implementations (noise off — the bit
    generators legitimately differ)."""
    imgs = _imgs(rng)
    sc = np.zeros((2, 8), np.float32)
    sc[:, 1] = [1.1, 0.9]
    sc[:, 2] = [5.0, -8.0]
    sc[:, 4] = [1.0, 0.0]  # glass
    sc[:, 5] = [1.0, 1.0]  # motion
    sc[:, 6] = [3, 11]  # direction bins
    out_k = np.asarray(
        pallas_photometric_batch(imgs, jnp.asarray(sc), jnp.zeros((6,), jnp.int32), True)
    )
    out_x = np.asarray(
        _apply_photometric_xla(jax.random.PRNGKey(0), imgs, jnp.asarray(sc))
    )
    err = np.abs(out_k - out_x)[:, 3:-3, 3:-3]  # borders: taps clip at edges
    assert err.max() < 0.02  # f32 kernel vs bf16 twin


def test_noise_statistics(rng):
    sc = np.zeros((2, 8), np.float32)
    sc[:, 1] = 1.0
    sc[:, 3] = 15.0  # sigma
    out = np.asarray(
        pallas_photometric_batch(
            jnp.full((2, 64, 64, 3), 128.0), jnp.asarray(sc),
            jnp.arange(6, dtype=jnp.int32), True,
        )
    )
    noise = out * 255 - 128
    assert 13 < noise.std() < 17
    assert abs(noise.mean()) < 1.0


def test_param_sampler_shapes():
    scalars, seeds = _sample_photometric_params(jax.random.PRNGKey(0), 16)
    assert scalars.shape == (16, 8) and seeds.shape == (48,)
    s = np.asarray(scalars)
    assert ((s[:, 0] == 0) | (s[:, 0] == 1)).all()  # flip gate
    assert (s[:, 6] >= 0).all() and (s[:, 6] < 16).all()  # direction bins
