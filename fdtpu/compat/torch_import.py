"""Import weights from the reference's official TorchScript checkpoints.

The reference ships TorchScript archives (``/root/reference/saved_models/
official/*``) produced by ``to_torchscript`` (``train_model.py:61``). This
image has no torchvision, whose custom ops the scripted graphs reference, so
:func:`read_torchscript_state_dict` registers **schema-only stubs** for
``torchvision::nms`` / ``_interpolate_bilinear2d_aa`` / ``_interpolate_
bicubic2d_aa`` — enough for ``torch.jit.load`` to deserialize — then pulls
``state_dict()`` as numpy.

Mapping (torch OIHW -> flax HWIO, transpose (2, 3, 1, 0)):

* grid models (44 tensors): ``conv1.*`` -> ``Conv_0``;
  ``residual_blocks.{i}.conv{1,2}.*`` -> ``ResidualBlock_{i}.Conv_{0,1}``;
  ``out.*`` -> the head ``Conv_1`` (names per
  ``/root/reference/models/PoolResnet.py:70-89``).
* MobileNetV3 (242 tensors): ``feature_extractor.0/1`` = timm conv_stem/bn1;
  ``feature_extractor.3.{stage}.{j}`` = timm blocks (stage layout
  1-2-3-2-3 + final ConvBnAct); ``out.*`` -> ``head``
  (``MobilenetV3Backbone.py:33-46``). BatchNorm running stats land in
  ``batch_stats``.

Layout note: the reference's grid convention is spatially transposed relative
to its input (``SURVEY.md`` §2.6, ``dataset.py:61-63``), so a reference
checkpoint's output grid must be transposed before fdtpu's decoder reads it.
Wrap imported grid models in :class:`ReferenceLayoutGrid` — then fdtpu's
decode reproduces the reference's boxes exactly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _register_stub_ops():
    import torch

    stubs = [
        ("nms", "(Tensor dets, Tensor scores, float iou_threshold) -> Tensor"),
        (
            "_interpolate_bilinear2d_aa",
            "(Tensor input, int[] output_size, bool align_corners) -> Tensor",
        ),
        (
            "_interpolate_bicubic2d_aa",
            "(Tensor input, int[] output_size, bool align_corners) -> Tensor",
        ),
    ]
    for name, sig in stubs:
        try:
            torch.library.define(f"torchvision::{name}", sig)
        except RuntimeError:
            pass  # already registered in this process


def read_torchscript_state_dict(path: str) -> dict[str, np.ndarray]:
    """TorchScript archive -> {name: numpy array} (float32)."""
    import torch

    _register_stub_ops()
    mod = torch.jit.load(path, map_location="cpu")
    return {
        k: v.detach().to(torch.float32).numpy() for k, v in mod.state_dict().items()
    }


def _conv(sd: dict, torch_name: str) -> dict:
    """OIHW conv weight+bias -> flax {kernel: HWIO, bias}."""
    out = {"kernel": jnp.asarray(sd[f"{torch_name}.weight"].transpose(2, 3, 1, 0))}
    if f"{torch_name}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{torch_name}.bias"])
    return out


def _bn(sd: dict, torch_name: str) -> tuple[dict, dict]:
    """torch BN -> (flax params {scale, bias}, batch_stats {mean, var})."""
    params = {
        "scale": jnp.asarray(sd[f"{torch_name}.weight"]),
        "bias": jnp.asarray(sd[f"{torch_name}.bias"]),
    }
    stats = {
        "mean": jnp.asarray(sd[f"{torch_name}.running_mean"]),
        "var": jnp.asarray(sd[f"{torch_name}.running_var"]),
    }
    return params, stats


def import_grid_model(sd: dict[str, np.ndarray], num_blocks: int) -> dict:
    """Resnet/PoolResnet/SeparableCNN state_dict -> flax variables."""
    params: dict[str, Any] = {"Conv_0": _conv(sd, "conv1")}
    for i in range(num_blocks):
        base = f"residual_blocks.{i}"
        if f"{base}.conv1.weight" in sd:  # dense blocks (Resnet/PoolResnet)
            params[f"ResidualBlock_{i}"] = {
                "Conv_0": _conv(sd, f"{base}.conv1"),
                "Conv_1": _conv(sd, f"{base}.conv2"),
            }
        else:  # separable blocks (SeparableCNN.py:14-38)
            params[f"SeparableResidualBlock_{i}"] = {
                "Conv_0": _conv(sd, f"{base}.pointwise_conv1"),
                "Conv_1": _conv(sd, f"{base}.depthwise_conv"),
                "Conv_2": _conv(sd, f"{base}.pointwise_conv2"),
            }
    params["Conv_1"] = _conv(sd, "out")
    return {"params": params}


# timm mobilenetv3_small stage layout: blocks per stage (final stage is the
# 1x1 ConvBnAct to 576). Flat fdtpu names block0..block10.
_MNV3_STAGES = (1, 2, 3, 2, 3)


def import_mobilenetv3(sd: dict[str, np.ndarray]) -> dict:
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["conv_stem"] = _conv(sd, "feature_extractor.0")
    params["bn1"], stats["bn1"] = _bn(sd, "feature_extractor.1")

    flat = 0
    for stage, n in enumerate(_MNV3_STAGES):
        for j in range(n):
            t = f"feature_extractor.3.{stage}.{j}"
            name = f"block{flat}"
            p: dict[str, Any] = {}
            s: dict[str, Any] = {}
            is_ds = f"{t}.conv_pw.weight" in sd and f"{t}.conv_pwl.weight" not in sd
            if is_ds:
                # DepthwiseSeparableConv: conv_dw/bn1/se/conv_pw(project)/bn2
                p["conv_dw"] = _conv(sd, f"{t}.conv_dw")
                p["bn2"], s["bn2"] = _bn(sd, f"{t}.bn1")
                p["conv_pwl"] = _conv(sd, f"{t}.conv_pw")
                p["bn3"], s["bn3"] = _bn(sd, f"{t}.bn2")
            else:
                # InvertedResidual: conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3
                p["conv_pw"] = _conv(sd, f"{t}.conv_pw")
                p["bn1"], s["bn1"] = _bn(sd, f"{t}.bn1")
                p["conv_dw"] = _conv(sd, f"{t}.conv_dw")
                p["bn2"], s["bn2"] = _bn(sd, f"{t}.bn2")
                p["conv_pwl"] = _conv(sd, f"{t}.conv_pwl")
                p["bn3"], s["bn3"] = _bn(sd, f"{t}.bn3")
            if f"{t}.se.conv_reduce.weight" in sd:
                p["se"] = {
                    "reduce": _conv(sd, f"{t}.se.conv_reduce"),
                    "expand": _conv(sd, f"{t}.se.conv_expand"),
                }
            params[name] = p
            stats[name] = s
            flat += 1

    last = f"feature_extractor.3.{len(_MNV3_STAGES)}.0"
    params["conv_576"] = _conv(sd, f"{last}.conv")
    params["bn_576"], stats["bn_576"] = _bn(sd, f"{last}.bn1")
    params["head"] = _conv(sd, "out")
    return {"params": params, "batch_stats": stats}


def load_torchscript_weights(path: str, module, variables_template) -> dict:
    """Import a reference checkpoint into ``module``'s variable structure,
    validating every leaf shape against ``variables_template``."""
    from fdtpu.models import MobileNetV3Backbone

    sd = read_torchscript_state_dict(path)
    if isinstance(module, MobileNetV3Backbone):
        variables = import_mobilenetv3(sd)
    else:
        n = max(
            int(k.split(".")[1]) for k in sd if k.startswith("residual_blocks.")
        ) + 1
        variables = import_grid_model(sd, n)

    import jax

    def check(path_, a, b):
        assert a.shape == b.shape, f"{path_}: {a.shape} != {b.shape}"
        return jnp.asarray(a, dtype=b.dtype)

    return jax.tree_util.tree_map_with_path(
        lambda p, a, b: check(p, a, b), variables, variables_template
    )


def load_reference_detector(path: str, module, variables_template):
    """Import a reference grid checkpoint AND wrap the module so decoded
    boxes match the reference exactly (its grid convention is spatially
    transposed, see module docstring). Returns ``(module, variables)`` —
    for grid models a :class:`ReferenceLayoutGrid`-wrapped pair; MobileNetV3
    and SSD pass through unwrapped only in their variables structure.

    Verified end-to-end on the official PoolResnet checkpoint: without the
    wrap, detections land at transposed grid positions; with it they sit on
    the faces of the reference's own test images.
    """
    variables = load_torchscript_weights(path, module, variables_template)
    from fdtpu.models import SSD

    if isinstance(module, SSD):
        return module, variables
    wrapped = ReferenceLayoutGrid(module)
    wrapped_vars = {k: {"inner": v} for k, v in variables.items()}
    return wrapped, wrapped_vars


class ReferenceLayoutGrid(nn.Module):
    """Wrap an imported grid model so its reference-convention output
    (``fm[:, x_cell, y_cell]``) is transposed into fdtpu's ``[y, x]`` layout;
    fdtpu's decoder then yields exactly the reference's boxes."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.inner(x, train=train)
        return jnp.swapaxes(out, 1, 2)

    @property
    def input_shape(self):
        return self.inner.input_shape

    def grid_size(self):
        return self.inner.grid_size()


def pretrained_backbone_variables(path: str, module, fresh_variables) -> dict:
    """Initialize MobileNetV3 for *from-scratch training* with a pretrained
    backbone and a fresh detection head.

    The reference builds its MobileNetV3 feature extractor from timm with
    ``pretrained=True`` (``/root/reference/models/MobilenetV3Backbone.py:33-39``)
    — ImageNet backbone weights under a randomly-initialized 5-channel head.
    timm isn't available here, but the official WIDERFace-trained checkpoint
    is, and its backbone is a strictly stronger starting point; this imports
    it and swaps the head for ``fresh_variables``' randomly-initialized one
    (the head has no BatchNorm, so ``batch_stats`` transfer whole).
    """
    imported = load_torchscript_weights(path, module, fresh_variables)
    params = dict(imported["params"])
    params["head"] = fresh_variables["params"]["head"]
    out = dict(imported)
    out["params"] = params
    return out
