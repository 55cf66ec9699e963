"""MobileNetV3-Small backbone grid detector
(``/root/reference/models/MobilenetV3Backbone.py:11-60``).

The reference wraps timm's pretrained ``tf_mobilenetv3_small_100`` with the
classifier head stripped (``children()[:-5]`` = stem + blocks,
``MobilenetV3Backbone.py:33-39``), giving 576 channels at stride 32
(480 -> 15 grid), then adds a 5-channel conv head + sigmoid
(``MobilenetV3Backbone.py:40-46``).

This is our own Flax implementation of the same architecture — the standard
MobileNetV3-Small table (Howard et al. 2019) with the ``tf_`` variant's
semantics (SAME padding, BatchNorm eps 1e-3) and timm's divisible-by-8 SE
widths — so the official reference checkpoint's weights map 1:1 through
``fdtpu.compat``. No network access here, so ``pretrained`` weights come only
via that import path (the reference README found pretraining didn't help
anyway, ``/root/reference/README.md:29-30``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fdtpu.models.layers import Dtype


def make_divisible(v: float, divisor: int = 8) -> int:
    """timm's channel rounding: nearest multiple of 8, never below 90%."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class SqueezeExcite(nn.Module):
    """SE gate: global-avg -> 1x1 reduce (ReLU) -> 1x1 expand (hard-sigmoid)."""

    channels: int
    reduced: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    """MobileNetV3 bottleneck: 1x1 expand -> depthwise kxk -> optional SE ->
    1x1 project, residual when stride 1 and channels match."""

    in_ch: int
    exp_ch: int
    out_ch: int
    kernel: int
    stride: int
    use_se: bool
    act: str  # "relu" | "hswish"
    bn_eps: float = 1e-3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.act == "relu" else hard_swish
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, epsilon=self.bn_eps, dtype=self.dtype,
            name=name,
        )
        skip = x
        y = x
        if self.exp_ch != self.in_ch:
            y = nn.Conv(
                self.exp_ch, (1, 1), use_bias=False, dtype=self.dtype,
                name="conv_pw",
            )(y)
            y = bn("bn1")(y)
            y = act(y)
        y = nn.Conv(
            self.exp_ch,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding="SAME",  # tf_ variant semantics
            feature_group_count=self.exp_ch,
            use_bias=False,
            dtype=self.dtype,
            name="conv_dw",
        )(y)
        y = bn("bn2")(y)
        y = act(y)
        if self.use_se:
            y = SqueezeExcite(
                self.exp_ch,
                make_divisible(self.exp_ch * 0.25),
                dtype=self.dtype,
                name="se",
            )(y)
        y = nn.Conv(
            self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pwl"
        )(y)
        y = bn("bn3")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            y = y + skip
        return y


# MobileNetV3-Small block table: (kernel, exp, out, SE, act, stride).
MOBILENETV3_SMALL: Sequence[tuple[int, int, int, bool, str, int]] = (
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2),
    (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1),
    (5, 120, 48, True, "hswish", 1),
    (5, 144, 48, True, "hswish", 1),
    (5, 288, 96, True, "hswish", 2),
    (5, 576, 96, True, "hswish", 1),
    (5, 576, 96, True, "hswish", 1),
)


class MobileNetV3Backbone(nn.Module):
    """Feature extractor (stem + blocks + final 1x1 to 576) and 5-channel
    detection head, mirroring ``MobilenetV3Backbone`` end to end.

    Output: ``(B, S, S, 5)`` post-sigmoid grid map, ``S = input/32``.
    """

    input_shape: tuple[int, int]
    num_patches: int
    output_kernel_size: int = 3
    bn_eps: float = 1e-3
    dtype: Dtype = jnp.bfloat16

    def grid_size(self) -> int:
        return self.input_shape[0] // 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(
            16, (3, 3), strides=2, padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv_stem",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=self.bn_eps,
            dtype=self.dtype, name="bn1",
        )(x)
        x = hard_swish(x)
        in_ch = 16
        for bi, (k, exp, out, se, act, s) in enumerate(MOBILENETV3_SMALL):
            x = InvertedResidual(
                in_ch, exp, out, k, s, se, act,
                bn_eps=self.bn_eps, dtype=self.dtype, name=f"block{bi}",
            )(x, train=train)
            in_ch = out
        # Final ConvBnAct 1x1 -> 576 (last stage of timm's `blocks`)
        x = nn.Conv(
            576, (1, 1), use_bias=False, dtype=self.dtype, name="conv_576"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=self.bn_eps,
            dtype=self.dtype, name="bn_576",
        )(x)
        x = hard_swish(x)
        # Detection head (MobilenetV3Backbone.py:40-46)
        x = nn.Conv(
            5,
            (self.output_kernel_size, self.output_kernel_size),
            padding=1,
            dtype=self.dtype,
            name="head",
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))


if __name__ == "__main__":  # smoke benchmark (reference MobilenetV3Backbone.py:63-84)
    from fdtpu.models.smoke import smoke

    smoke(MobileNetV3Backbone(input_shape=(320, 320), num_patches=15))
