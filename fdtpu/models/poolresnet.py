"""PoolResnet grid detector (``/root/reference/models/PoolResnet.py:46-105``).

The fast backbone of record (``train_model.py:27-32``; README: "performs
equally well, much faster"). Aggressive stem conv k=10 stride=8 (480 -> 60),
residual blocks that max-pool while the spatial dim exceeds **2x** the grid
size (``PoolResnet.py:41-42``), then a valid head conv (k=6 by default)
shrinking 15 -> 10 for the 480px/10-grid config.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fdtpu.models.layers import (
    Dropout2d, Dtype, ResidualBlock, TwoStageStemConv,
)


class PoolResnet(nn.Module):
    """Args mirror ``PoolResnet.__init__`` (``PoolResnet.py:47-61``)."""

    filters: int
    input_shape: tuple[int, int]  # (height, width)
    num_patches: int
    num_residual_blocks: int = 10
    input_kernel_size: int = 10
    input_stride: int = 8
    output_kernel_size: int = 6
    output_padding: int = 0
    dropout: float = 0.25  # block Dropout2d rate (reference hardcodes 0.25)
    head_dropout: float = 0.5  # pre-head Dropout2d (e.g. PoolResnet.py:69)
    dtype: Dtype = jnp.bfloat16
    # Two-stage stem: the same stem dot products lowered as 1xk identity
    # expansion + kx1 conv so the channel minor dim is k*cin instead of cin
    # (see TwoStageStemConv; ~8x faster stem on v5e). Param tree is
    # unchanged (scope name pinned to "Conv_0"), so checkpoints move freely
    # between the two settings.
    fast_stem: bool = False

    def grid_size(self) -> int:
        """Static output grid arithmetic (torch conv/pool floor semantics)."""
        pad = self.input_kernel_size - self.input_stride  # PoolResnet.py:75
        dim = (
            self.input_shape[0] + 2 * pad - self.input_kernel_size
        ) // self.input_stride + 1
        for _ in range(self.num_residual_blocks):
            if dim > 2 * self.num_patches:
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
            x = ResidualBlock(
                self.filters, pool_until=2 * self.num_patches,
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


if __name__ == "__main__":  # smoke benchmark (reference PoolResnet.py:108-129)
    from fdtpu.models.smoke import smoke

    smoke(PoolResnet(filters=64, input_shape=(320, 320), num_patches=15,
                     num_residual_blocks=10))
