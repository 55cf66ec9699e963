"""SeparableCNN grid detector (``/root/reference/models/SeparableCNN.py:54-112``).

PoolResnet-shaped model with depthwise-separable residual blocks (pointwise ->
depthwise -> pointwise, all bias-free) pooling while the spatial dim exceeds
the grid size. The reference hardcodes ``num_of_patches=16``
(``SeparableCNN.py:71``) and never wires this model into an entry script
(experimental); we expose the grid size as a proper arg with the same default.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fdtpu.models.layers import (
    Dropout2d, Dtype, SeparableResidualBlock, TwoStageStemConv,
)


class SeparableCNN(nn.Module):
    """Args mirror ``SeparableCNN.__init__`` (``SeparableCNN.py:55-68``)."""

    filters: int
    input_shape: tuple[int, int]
    num_patches: int = 16
    num_residual_blocks: int = 10
    input_kernel_size: int = 10
    input_stride: int = 8
    output_kernel_size: int = 6
    output_padding: int = 0
    dropout: float = 0.25  # block Dropout2d rate (reference hardcodes 0.25)
    head_dropout: float = 0.5  # pre-head Dropout2d (e.g. PoolResnet.py:69)
    dtype: Dtype = jnp.bfloat16
    # Two-stage stem lowering, checkpoint-compatible (see PoolResnet /
    # fdtpu/models/layers.py TwoStageStemConv).
    fast_stem: bool = False

    def grid_size(self) -> int:
        pad = self.input_kernel_size - self.input_stride
        dim = (
            self.input_shape[0] + 2 * pad - self.input_kernel_size
        ) // self.input_stride + 1
        for _ in range(self.num_residual_blocks):
            if dim > self.num_patches:
                dim //= 2
        return dim + 2 * self.output_padding - self.output_kernel_size + 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.input_kernel_size - self.input_stride
        x = x.astype(self.dtype)
        if self.fast_stem:
            x = TwoStageStemConv(
                self.filters,
                kernel_size=self.input_kernel_size,
                stride=self.input_stride,
                padding=pad,
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.filters,
                (self.input_kernel_size, self.input_kernel_size),
                strides=self.input_stride,
                padding=pad,
                dtype=self.dtype,
            )(x)
        for _ in range(self.num_residual_blocks):
            x = SeparableResidualBlock(
                self.filters, pool_until=self.num_patches,
                dropout=self.dropout, dtype=self.dtype,
            )(x, deterministic=not train)
        x = Dropout2d(self.head_dropout)(x, deterministic=not train)
        x = nn.Conv(
            5,
            (self.output_kernel_size, self.output_kernel_size),
            padding=self.output_padding,
            dtype=self.dtype,
            name="Conv_1",  # pinned: auto-numbering differs under fast_stem
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))


if __name__ == "__main__":  # smoke benchmark (reference SeparableCNN.py:115-136)
    from fdtpu.models.smoke import smoke

    smoke(SeparableCNN(filters=64, input_shape=(320, 320), num_patches=15,
                       num_residual_blocks=10))
