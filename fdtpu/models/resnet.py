"""Resnet grid detector (``/root/reference/models/Resnet.py:43-99``).

Stem conv 3x3 stride 2 -> N residual blocks (each max-pools while the spatial
dim exceeds the grid size) -> Dropout2d(0.5) -> 5-channel head conv 3x3 ->
sigmoid. Output is ``(B, S, S, 5)`` NHWC (the reference emits ``(B, 5, S, S)``).

The reference README notes this backbone is "too slow when #boxes > 100"
(``/root/reference/README.md:27``) because it keeps full spatial resolution
deep into the network; it is retained for capability parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fdtpu.models.layers import Dropout2d, Dtype, ResidualBlock


class Resnet(nn.Module):
    """Args mirror ``Resnet.__init__`` (``Resnet.py:44-56``)."""

    filters: int
    input_shape: tuple[int, int]  # (height, width)
    num_patches: int
    num_residual_blocks: int = 10
    output_kernel_size: int = 3
    dropout: float = 0.25  # block Dropout2d rate (reference hardcodes 0.25)
    head_dropout: float = 0.5  # pre-head Dropout2d (e.g. Resnet.py:63)
    dtype: Dtype = jnp.bfloat16

    def grid_size(self) -> int:
        """Static output grid arithmetic: stem halves, then blocks pool while
        above ``num_patches``; head conv (pad 1) preserves."""
        dim = (self.input_shape[0] + 1) // 2
        for _ in range(self.num_residual_blocks):
            if dim > self.num_patches:
                dim //= 2
        return dim

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(self.filters, (3, 3), strides=2, padding=1, dtype=self.dtype)(x)
        for _ in range(self.num_residual_blocks):
            x = ResidualBlock(
                self.filters, pool_until=self.num_patches,
                dropout=self.dropout, dtype=self.dtype,
            )(x, deterministic=not train)
        x = Dropout2d(self.head_dropout)(x, deterministic=not train)
        x = nn.Conv(
            5,
            (self.output_kernel_size, self.output_kernel_size),
            padding=1,
            dtype=self.dtype,
        )(x)
        return nn.sigmoid(x.astype(jnp.float32))


if __name__ == "__main__":  # smoke benchmark (reference Resnet.py:102-123)
    from fdtpu.models.smoke import smoke

    smoke(Resnet(filters=64, input_shape=(320, 320), num_patches=15,
                 num_residual_blocks=10))
