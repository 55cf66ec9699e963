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


class TwoStageStemConv(nn.Module):
    """Two-stage lowering of a large-stride stem convolution.

    The reference's stem (``/root/reference/models/PoolResnet.py:62-67``,
    k=10 stride=8, 3-channel input) has a ``K = k*k*cin = 300`` contraction
    with a 3-wide channel minor dim — XLA's conv emitter measures ~6% MFU on
    v5e (BASELINE.md round-4 forward decomposition: 1.3-1.7 ms/batch vs a
    ~0.25 ms HBM roofline at b128/320px). Splitting the 2D conv into

    1. a ``1 x k`` stride ``(1, s)`` conv whose kernel is ``k*cin`` identity
       taps — pure data formatting that gathers each width-patch into
       channels, giving a ``(B, H, W_out, k*cin)`` tensor, then
    2. a ``k x 1`` stride ``(s, 1)`` conv with the real weights reshaped to
       ``(k, 1, k*cin, features)``

    computes the SAME multiply-accumulate set (stage 2's contraction is the
    full ``k*k*cin = 300``) but with a 30-wide channel minor dim, which the
    TPU emitter handles ~8x faster: measured 0.65 ms vs 5.16 ms per b128
    batch in isolation (scripts/bench_stem_arms.py; the explicit
    space-to-depth rearrangement and a zero-padded 16x16 kernel were both
    built, measured slower, and rejected — see BASELINE.md). Outputs equal
    the plain conv up to summation order (bf16 rounding; XLA leaves conv
    reduction order unspecified anyway).

    Param tree is identical to ``nn.Conv`` (``kernel`` HWIO + ``bias``, same
    default inits), so instantiating it with ``name="Conv_0"`` keeps full
    checkpoint compatibility with the plain-stem model.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )

        # Stage 1: width-patch expansion. w1[0, j, c, j*cin + c] = 1 —
        # channel-minor order matches kernel.reshape(k, k*cin, f) below.
        w1 = jnp.eye(k * cin, dtype=x.dtype).reshape(k, cin, k * cin)[None]
        z = jax.lax.conv_general_dilated(
            x, w1, (1, s), [(0, 0), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # Stage 2: the real contraction, K = k*k*cin with a k*cin minor dim.
        w2 = kernel.reshape(k, 1, k * cin, self.features)
        y = jax.lax.conv_general_dilated(
            z, w2, (s, 1), [(p, p), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


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


class WidthFoldedConv(nn.Module):
    """Width-folded lowering of a 3x3 stride-1 pad-1 convolution.

    The SSD model's early blocks (``/root/reference/models/SSD.py:135-163``)
    convolve high-resolution planes with only 16-64 output channels, so each
    MXU pass fills at most a quarter of its 128 result lanes (BASELINE.md
    round-2 SSD decomposition). This module computes the SAME
    multiply-accumulate set but packs ``fold`` consecutive output width
    positions into the lane dimension: the (3, 3, cin, cout) kernel becomes
    (3, fold+2, cin, fold*cout) with output-channel group ``j`` holding the
    original kernel shifted ``j`` taps right (zeros elsewhere), applied with
    width stride ``fold``. The zero taps add exact 0.0 to the f32
    accumulator, so the dot-product set per output element is unchanged; the
    (B, H, W/fold, fold*cout) result unfolds to (B, H, W, cout) by a
    row-major reshape. Lane utilization rises ``fold``-fold for a
    ``(fold+2)/3`` FLOP padding factor (2x at fold=4) — same playbook as
    ``TwoStageStemConv``, measured in ``scripts/bench_ssd_arms.py``.

    Param tree (``kernel`` HWIO (3,3,cin,cout) + ``bias``, same names /
    shapes / init streams as ``nn.Conv``), so a model can switch lowering
    per-conv with full checkpoint compatibility.
    """

    features: int
    fold: int
    dtype: Dtype = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f, cout = self.fold, self.features
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, cout), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (cout,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        B, H, W, _ = x.shape
        assert W % f == 0, (W, f)
        # Folded kernel: group j = original kernel at width taps j..j+2
        # (pad-and-stack keeps this scatter-free).
        wf = jnp.stack(
            [jnp.pad(kernel, ((0, 0), (j, f - 1 - j), (0, 0), (0, 0)))
             for j in range(f)],
            axis=3,
        ).reshape(3, f + 2, cin, f * cout)
        y = jax.lax.conv_general_dilated(
            x, wf, (1, f), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y.reshape(B, H, W, cout)
        return y + bias


class SSDResidualBlock(nn.Module):
    """The SSD model's block (``/root/reference/models/SSD.py:14-81``):
    despite its reference name ("SeparableResidualBlock") it uses two dense
    3x3 convs, a 1x1 projection on the skip when channel counts differ, and
    an explicit ``use_max_pool`` flag instead of shape-conditional pooling.

    ``fold_width`` switches the 3x3 convs to the ``WidthFoldedConv``
    lowering when the output channel count leaves MXU lanes idle
    (``cout < 128``); identical MAC set and param tree (conv names pinned
    to the autonames the plain path produces).
    """

    in_filters: int
    out_filters: int
    use_max_pool: bool = False
    dropout: float = 0.25
    dtype: Dtype = jnp.bfloat16
    torch_init: bool = False
    fold_width: bool = False
    fold_cap: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n_convs = 0

        def conv(out_f, k, inp, fan_in):
            nonlocal n_convs
            name = f"Conv_{n_convs}"
            n_convs += 1
            kw = {}
            if self.torch_init:
                kw["kernel_init"], kw["bias_init"] = torch_conv_inits(fan_in)
            fold = min(self.fold_cap, 128 // out_f)
            if (self.fold_width and k == 3 and fold > 1
                    and inp.shape[2] % fold == 0):
                return WidthFoldedConv(out_f, fold, dtype=self.dtype,
                                       name=name, **kw)(inp)
            return nn.Conv(out_f, (k, k), padding=k // 2, dtype=self.dtype,
                           name=name, **kw)(inp)

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
