"""Detector facade: bundles a Flax module with decode config and provides the
library-level inference API of the reference's ``BaseModel`` /
``BaseSSDModel`` (``/root/reference/models/BaseModel.py:11-71``,
``BaseSSDModel.py:10-68``):

* :meth:`Detector.predict` — resize + normalize + forward + fused
  decode/filter/NMS, all inside one jit (the reference does resize/255 on
  host then a per-sample NMS loop, ``BaseModel.py:47-71``);
* :meth:`Detector.non_max_suppression` — batched (vmapped) NMS over raw model
  output, replacing the per-sample Python loop (``BaseModel.py:47-51``);
* :meth:`Detector.summary` — parameter/FLOP table via ``nn.tabulate``,
  replacing torchinfo (``BaseModel.py:36-45``) and ptflops
  (``BaseSSDModel.py:34-42``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from fdtpu.core.nms import decode_filter_nms, ssd_output_filter_nms
from fdtpu.models.mobilenetv3 import MobileNetV3Backbone
from fdtpu.models.poolresnet import PoolResnet
from fdtpu.models.resnet import Resnet
from fdtpu.models.separable import SeparableCNN
from fdtpu.models.ssd import SSD


def is_ssd(module) -> bool:
    return isinstance(module, SSD)


class Detector:
    """A Flax detector module + its variables + decode thresholds.

    ``variables`` is the full Flax variable dict (``{'params': ...}`` plus
    ``batch_stats`` for BatchNorm models).
    """

    def __init__(
        self,
        module,
        variables: Any = None,
        probability_threshold: float = 0.5,
        iou_threshold: float = 0.5,
        nms_capacity: int = 128,
    ):
        self.module = module
        self.variables = variables
        self.probability_threshold = probability_threshold
        self.iou_threshold = iou_threshold
        self.nms_capacity = nms_capacity

    # -- construction -------------------------------------------------------

    def init(self, rng: jax.Array) -> Any:
        h, w = self.module.input_shape
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        self.variables = self.module.init(rng, dummy, train=False)
        return self.variables

    @property
    def image_size(self) -> tuple[int, int]:
        h, w = self.module.input_shape
        return (w, h)

    # -- inference ----------------------------------------------------------

    def apply(self, images: jnp.ndarray, train: bool = False, rngs=None):
        """Raw forward pass on preprocessed ``(B, H, W, 3)`` float images."""
        return self.module.apply(self.variables, images, train=train, rngs=rngs)

    def non_max_suppression(self, output: jnp.ndarray):
        """Batched decode+filter+NMS over raw model output.

        Returns ``(boxes, mask)`` with ``boxes`` ``(B, capacity, 5)`` rows
        ``[score, x, y, w, h]`` in pixels.
        """
        return _nms_batch(
            output,
            is_ssd(self.module),
            0 if is_ssd(self.module) else self.module.grid_size(),
            self.image_size,
            self.probability_threshold,
            self.iou_threshold,
            self.nms_capacity,
        )

    def predict(
        self,
        image: jnp.ndarray,
        probability_threshold: float | None = None,
        iou_threshold: float | None = None,
    ):
        """Single-image inference from a raw uint8/float image of any size.

        Mirrors ``BaseModel.predict`` (``BaseModel.py:56-71``): resize to the
        model's input shape, scale to [0, 1], forward, decode+NMS. Returns
        ``(resized_image, boxes, mask)`` — the reference returns the
        normalized image and a ragged box array; we return the fixed-capacity
        masked form (``fdtpu.core.compact_boxes`` gives the ragged view).
        """
        prob = (
            self.probability_threshold
            if probability_threshold is None
            else probability_threshold
        )
        iou = self.iou_threshold if iou_threshold is None else iou_threshold
        h, w = self.module.input_shape
        # Resize odd-shaped inputs on the host (PIL, like the reference's
        # torchvision host resize, BaseModel.py:62) so the jitted program
        # sees ONE shape — otherwise every distinct input size recompiles.
        import numpy as _np

        arr = _np.asarray(image)
        needs_rgb = arr.ndim != 3 or arr.shape[-1] != 3
        if needs_rgb or arr.shape[:2] != (h, w):
            # normalize to RGB on the host too: RGBA/grayscale inputs would
            # otherwise be bilinearly blended across the channel axis (RGBA)
            # or crash with a rank error (2-D grayscale)
            from PIL import Image as _Image

            if arr.dtype != _np.uint8:
                arr = _np.clip(arr, 0, 255).astype(_np.uint8)
            image = _np.asarray(
                _Image.fromarray(arr).convert("RGB").resize((w, h), _Image.BILINEAR)
            )
        return _predict_jit(
            self.module,
            self.variables,
            jnp.asarray(image),
            (h, w),
            is_ssd(self.module),
            0 if is_ssd(self.module) else self.module.grid_size(),
            prob,
            iou,
            self.nms_capacity,
        )

    # -- introspection ------------------------------------------------------

    def summary(self) -> str:
        """Layer/parameter table (torchinfo-summary equivalent,
        ``BaseModel.py:36-45``)."""
        import flax.linen as nn

        h, w = self.module.input_shape
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        return nn.tabulate(
            self.module,
            jax.random.PRNGKey(0),
            compute_flops=True,
        )(dummy, train=False)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _nms_batch(output, ssd: bool, num_patches: int, image_size, prob, iou, capacity: int):
    from fdtpu.kernels import (
        grid_decode_tables,
        pallas_decode_filter_nms_batch,
        pallas_nms_available,
        ssd_output_decode_tables,
    )

    if pallas_nms_available() and output.shape[0] >= 8:
        # One whole-batch fused Pallas kernel (decode+filter+NMS): measured
        # faster than the vmapped XLA path on TPU (1.20 vs 1.46 ms/64-batch
        # at S=15; 1.42 vs 1.67 ms at 4774 priors); bit-identical outputs
        # below capacity saturation, MORE exact above it (the XLA path
        # pre-truncates to top-capacity scores — see nms_pallas module doc).
        # Below b8 the vmapped XLA twin wins (b4 grid-block cost is
        # pathological: +0.88 ms vs +0.04 — round-5 serving-band rows,
        # logs/round5/serving_band.json), so tiny batches route there.
        if ssd:
            tables = ssd_output_decode_tables(output.shape[1], image_size)
        else:
            tables = grid_decode_tables(num_patches, image_size)
            output = output.reshape(output.shape[0], -1, 5)
        return pallas_decode_filter_nms_batch(
            output, tables, prob, iou, capacity, interpret=False
        )
    if ssd:
        fn = lambda o: ssd_output_filter_nms(o, image_size, prob, iou, capacity)
    else:
        fn = lambda o: decode_filter_nms(
            o, num_patches, image_size, prob, iou, capacity
        )
    return jax.vmap(fn)(output)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 8))
def _predict_jit(
    module, variables, image, input_shape, ssd: bool, num_patches: int,
    prob, iou, capacity: int,
):
    h, w = input_shape
    img = image.astype(jnp.float32)
    if img.ndim == 3:
        img = img[None]
    # Bilinear resize on device (reference: torchvision Resize, no antialias,
    # BaseModel.py:62) then /255 (BaseModel.py:66).
    img = jax.image.resize(img, (img.shape[0], h, w, 3), "bilinear", antialias=False)
    norm = img / 255.0
    out = module.apply(variables, norm, train=False)
    if ssd:
        boxes, mask = jax.vmap(
            lambda o: ssd_output_filter_nms(o, (w, h), prob, iou, capacity)
        )(out)
    else:
        s = num_patches or out.shape[1]
        boxes, mask = jax.vmap(
            lambda o: decode_filter_nms(o, s, (w, h), prob, iou, capacity)
        )(out)
    return norm[0], boxes[0], mask[0]


def build_model(name: str, config) -> Any:
    """Construct a detector module by family name.

    Families mirror the reference zoo (SURVEY.md §2.3): ``resnet``,
    ``poolresnet``, ``separable``, ``mobilenetv3``, ``ssd``.
    """
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    if name == "ssd":
        from fdtpu.models.ssd import ssd_patch_sizes

        # a YOLO-family DetectorConfig carries no patch_sizes — every entry
        # script (demo, converters, validation) can still ask for "ssd" and
        # get the geometry computed for its input resolution
        patch = getattr(config, "patch_sizes", None)
        return SSD(
            filters=config.filters,
            input_shape=config.input_shape,
            patch_sizes=tuple(patch)
            if patch
            else ssd_patch_sizes(config.input_shape),
            dtype=dtype,
        )
    common = dict(input_shape=config.input_shape, dtype=dtype)
    if name == "resnet":
        return Resnet(
            filters=config.filters,
            num_patches=config.num_patches,
            num_residual_blocks=config.num_residual_blocks,
            **common,
        )
    if name == "poolresnet":
        return PoolResnet(
            filters=config.filters,
            num_patches=config.num_patches,
            num_residual_blocks=config.num_residual_blocks,
            input_kernel_size=config.input_kernel_size,
            input_stride=config.input_stride,
            output_kernel_size=config.output_kernel_size,
            output_padding=config.output_padding,
            fast_stem=config.fast_stem,
            **common,
        )
    if name == "separable":
        return SeparableCNN(
            filters=config.filters,
            num_patches=config.num_patches,
            num_residual_blocks=config.num_residual_blocks,
            fast_stem=config.fast_stem,
            **common,
        )
    if name == "mobilenetv3":
        return MobileNetV3Backbone(
            input_shape=config.input_shape, num_patches=config.num_patches,
            dtype=dtype,
        )
    raise ValueError(f"unknown model family: {name}")
