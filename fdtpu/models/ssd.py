"""SSD multi-scale detector (``/root/reference/models/SSD.py:84-255``).

Stem conv stride 2 -> 9-block feature extractor with two max-pools (480 ->
60 spatial) -> per-scale ``continue`` blocks (pooling between scales) with
position-wise ``Dense(ch -> 5)`` extracting heads -> concat to
``(B, N_priors, 5)`` -> sigmoid on scores only -> priors applied
(``SSD.py:206-220``), yielding normalized-[0,1] prior-space boxes.

The position-wise Linear head over NHWC (``SSD.py:180-186,240-242``) is a 1x1
conv in disguise; on TPU ``Dense`` over the trailing channel axis is a clean
MXU matmul with the spatial dims folded into the batch.

Filter schedule (``SSD.py:164-189``): scale i reads ``min(4f * 2^i, 16f)``
channels and writes ``min(8f * 2^i, 16f)``.

The reference's NaN tripwires (``SSD.py:229-252``, no-op ``if isnan: p = 0``
debug vestiges) are dropped; use ``TrainConfig.nan_check``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fdtpu.core.priors import apply_priors, calculate_priors, prior_scales
from fdtpu.models.layers import Dtype, SSDResidualBlock


def ssd_patch_sizes(input_shape: tuple[int, int]) -> tuple[int, ...]:
    """Grid sizes produced by the SSD geometry for a square input: stem /2,
    two extractor pools /4, then one pool between consecutive scales.
    480 -> (60, 30, 15, 7), the reference's hardcoded table (``SSD.py:99``);
    320 -> (40, 20, 10, 5)."""
    base = input_shape[0] // 8
    return (base, base // 2, base // 4, base // 8)


class SSD(nn.Module):
    """Args mirror ``SSD.__init__`` (``SSD.py:85-99``)."""

    filters: int
    input_shape: tuple[int, int]  # (height, width)
    patch_sizes: tuple[int, ...] = (60, 30, 15, 7)
    dropout: float = 0.25  # block Dropout2d rate (SSD.py:16 default)
    dtype: Dtype = jnp.bfloat16
    # torch nn.Conv2d/Linear default init (kaiming_uniform(a=sqrt(5)) +
    # uniform bias) — the init the reference actually trains under, and the
    # DEFAULT here because SSD convergence is init-sensitive: flax's
    # lecun_normal + zero bias puts every initial sigmoid confidence at
    # exactly 0.5, so ``-log(conf)`` hard-negative mining starts with no
    # ranking signal and generalization collapses (synthetic control:
    # AP@0.5 0.24-0.30 flax-init vs 0.72-0.73 torch-init vs 0.87 for the
    # architecture-identical torch model — BASELINE.md round-3 SSD control).
    torch_init: bool = True
    # TPU lowering switch: width-folded 3x3 convs for the lane-starved
    # (cout < 128) blocks — identical MAC set and param tree; see
    # ``fdtpu.models.layers.WidthFoldedConv`` + scripts/bench_ssd_arms.py.
    fast_blocks: bool = False
    # fold cap for the width-folded lowering (FLOP padding (fold+2)/3 at
    # fold f; 4 packs cout=32 fully into lanes at 2x MACs, 2 pads only
    # 1.33x) — shootout knob, see scripts/bench_ssd_arms.py.
    fold_cap: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from fdtpu.models.layers import torch_conv_inits

        f = self.filters
        max_filters = 16 * f  # SSD.py:107
        det = not train
        bs = x.shape[0]
        ti = self.torch_init

        x = x.astype(self.dtype)
        # input_normalizer (SSD.py:127-134)
        stem_kw = {}
        if ti:
            stem_kw["kernel_init"], stem_kw["bias_init"] = torch_conv_inits(27)
        x = nn.Conv(f, (3, 3), strides=2, padding=1, dtype=self.dtype,
                    **stem_kw)(x)
        # feature_extractor (SSD.py:135-163): pool, pool, 6x plain, widen
        fb = self.fast_blocks
        x = SSDResidualBlock(f, 2 * f, use_max_pool=True, dropout=self.dropout, dtype=self.dtype, torch_init=ti, fold_width=fb, fold_cap=self.fold_cap)(x, det)
        x = SSDResidualBlock(2 * f, 2 * f, use_max_pool=True, dropout=self.dropout, dtype=self.dtype, torch_init=ti, fold_width=fb, fold_cap=self.fold_cap)(x, det)
        for _ in range(6):
            x = SSDResidualBlock(2 * f, 2 * f, dropout=self.dropout, dtype=self.dtype, torch_init=ti, fold_width=fb, fold_cap=self.fold_cap)(x, det)
        x = SSDResidualBlock(2 * f, 4 * f, dropout=self.dropout, dtype=self.dtype, torch_init=ti, fold_width=fb, fold_cap=self.fold_cap)(x, det)

        scores, bbxs = [], []
        for i, ps in enumerate(self.patch_sizes):
            in_f = min(4 * f * 2**i, max_filters)  # SSD.py:166-175
            out_f = min(2 * in_f, max_filters)
            x = SSDResidualBlock(
                in_f, out_f, use_max_pool=(i != 0),
                dropout=self.dropout, dtype=self.dtype, torch_init=ti,
                fold_width=fb, fold_cap=self.fold_cap,
            )(x, det)
            assert x.shape[1] == ps, (
                f"scale {i}: spatial {x.shape[1]} != patch size {ps}; "
                f"use ssd_patch_sizes(input_shape)"
            )
            # Position-wise extracting head (SSD.py:180-186, 240-242):
            # NHWC row-major flatten -> (B, ps*ps, 5).
            head_kw = {}
            if ti:
                head_kw["kernel_init"], head_kw["bias_init"] = (
                    torch_conv_inits(out_f)
                )
            z = nn.Dense(5, dtype=self.dtype, **head_kw)(x)
            z = z.reshape(bs, ps * ps, 5).astype(jnp.float32)
            scores.append(z[..., :1])
            bbxs.append(z[..., 1:5])

        scores = nn.sigmoid(jnp.concatenate(scores, axis=1))  # SSD.py:245
        bbxs = jnp.concatenate(bbxs, axis=1)  # raw, no sigmoid (SSD.py:246)
        out = jnp.concatenate([scores, bbxs], axis=2)
        priors = calculate_priors(self.patch_sizes, dtype=out.dtype)
        scales = prior_scales(self.patch_sizes, dtype=out.dtype)
        return apply_priors(out, priors, scales)  # SSD.py:248


if __name__ == "__main__":  # smoke benchmark (reference SSD.py:258-277)
    from fdtpu.models.smoke import smoke

    smoke(SSD(filters=16, input_shape=(480, 480),
              patch_sizes=ssd_patch_sizes((480, 480))))
