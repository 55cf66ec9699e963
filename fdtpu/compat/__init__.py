"""Interop with the PyTorch reference: TorchScript checkpoint weight import
and structured pruning over Flax param pytrees."""

from fdtpu.compat.torch_import import (  # noqa: F401
    ReferenceLayoutGrid,
    load_reference_detector,
    pretrained_backbone_variables,
    load_torchscript_weights,
    read_torchscript_state_dict,
)
from fdtpu.compat.pruning import prune_l1_structured  # noqa: F401
