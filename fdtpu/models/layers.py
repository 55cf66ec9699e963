"""Shared Flax building blocks for the detector zoo.

NHWC layout throughout (TPU-native; the reference is NCHW). Convolutions are
XLA ``lax.conv_general_dilated`` via ``flax.linen.Conv`` — the MXU path —
with a bfloat16 compute / float32 param dtype policy.

Torch-semantics notes:

* ``LeakyReLU(0.2)`` (every reference block) -> ``nn.leaky_relu`` with
  ``negative_slope=0.2``.
* ``nn.Dropout2d`` zeroes whole channels per sample -> ``nn.Dropout`` with
  ``broadcast_dims=(1, 2)`` (spatial dims broadcast).
* ``nn.MaxPool2d(2)`` floors odd sizes -> ``nn.max_pool`` window 2 stride 2
  VALID padding.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def torch_conv_inits(fan_in: int):
    """torch ``nn.Conv2d``/``nn.Linear`` default initialization as flax
    initializers: weights ``kaiming_uniform(a=sqrt(5))`` — which reduces to
    ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` — and the same uniform bound for
    the bias. ``fan_in`` = in_channels * kh * kw (1 for Linear). Used by the
    ``torch_init`` model option for convergence-parity experiments against
    the torch control (flax's default lecun_normal + zero bias measurably
    changes early-training dynamics; see BASELINE.md SSD control)."""
    bound = 1.0 / math.sqrt(fan_in)
    kernel = nn.initializers.variance_scaling(
        1.0 / 3.0, "fan_in", "uniform"
    )

    def bias(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel, bias


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    """LeakyReLU with the reference's 0.2 slope
    (e.g. ``/root/reference/models/Resnet.py:27``)."""
    return nn.leaky_relu(x, negative_slope=0.2)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool, floor semantics like ``nn.MaxPool2d(2)``."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


class Dropout2d(nn.Module):
    """Channel dropout (torch ``nn.Dropout2d`` semantics): zeroes entire
    feature maps per sample, rescaling survivors by ``1/(1-rate)``."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2))(
            x, deterministic=deterministic
        )


class ResidualBlock(nn.Module):
    """The reference's shared residual block shape
    (``/root/reference/models/Resnet.py:10-40`` /
    ``PoolResnet.py:11-43``)::

        conv3x3 -> leaky(0.2) -> conv3x3 -> leaky -> dropout2d(0.25) -> +skip
        -> maxpool while spatial dim > pool_until

    ``pool_until`` is ``num_of_patches`` for Resnet (``Resnet.py:38``) and
    ``2 * num_of_patches`` for PoolResnet (``PoolResnet.py:41``). The
    reference's ``if x.shape[2] > ...`` is shape-dependent Python control
    flow; with static shapes it resolves at trace time, exactly like here.
    """

    filters: int
    pool_until: int
    dropout: float = 0.25
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        skip = x
        x = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = nn.Conv(self.filters, (3, 3), padding=1, dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = Dropout2d(self.dropout)(x, deterministic)
        x = x + skip
        if x.shape[1] > self.pool_until:
            x = max_pool_2x2(x)
        return x


class SeparableResidualBlock(nn.Module):
    """Depthwise-separable residual block
    (``/root/reference/models/SeparableCNN.py:10-51``)::

        pointwise1x1 -> leaky -> depthwise3x3 -> leaky -> pointwise1x1
        -> dropout2d -> +skip -> maxpool while spatial dim > pool_until

    All convs bias-free (``SeparableCNN.py:14`` passes ``bias=False``).
    Depthwise = ``feature_group_count == filters`` — XLA lowers this to the
    vector unit rather than wasting MXU tiles on a block-diagonal matmul.
    """

    filters: int
    pool_until: int
    dropout: float = 0.25
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        skip = x
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = nn.Conv(
            self.filters,
            (3, 3),
            padding=1,
            feature_group_count=self.filters,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = leaky_relu(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = Dropout2d(self.dropout)(x, deterministic)
        x = x + skip
        if x.shape[1] > self.pool_until:
            x = max_pool_2x2(x)
        return x


class SSDResidualBlock(nn.Module):
    """The SSD model's block (``/root/reference/models/SSD.py:14-81``):
    despite its reference name ("SeparableResidualBlock") it uses two dense
    3x3 convs, a 1x1 projection on the skip when channel counts differ, and
    an explicit ``use_max_pool`` flag instead of shape-conditional pooling.
    """

    in_filters: int
    out_filters: int
    use_max_pool: bool = False
    dropout: float = 0.25
    dtype: Dtype = jnp.bfloat16
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        def conv(out_f, k, inp, fan_in):
            kw = {}
            if self.torch_init:
                kw["kernel_init"], kw["bias_init"] = torch_conv_inits(fan_in)
            return nn.Conv(out_f, (k, k), padding=k // 2, dtype=self.dtype,
                           **kw)(inp)

        if self.in_filters == self.out_filters:
            skip = x
        else:
            skip = conv(self.out_filters, 1, x, self.in_filters)
        x = conv(self.out_filters, 3, x, self.in_filters * 9)
        x = leaky_relu(x)
        x = conv(self.out_filters, 3, x, self.out_filters * 9)
        x = leaky_relu(x)
        x = Dropout2d(self.dropout)(x, deterministic)
        x = x + skip
        if self.use_max_pool:
            x = max_pool_2x2(x)
        return x
