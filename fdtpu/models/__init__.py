"""Flax detector zoo mirroring the reference model inventory (SURVEY.md §2.3)."""

from fdtpu.models.detector import Detector, build_model  # noqa: F401
from fdtpu.models.mobilenetv3 import MobileNetV3Backbone  # noqa: F401
from fdtpu.models.poolresnet import PoolResnet  # noqa: F401
from fdtpu.models.resnet import Resnet  # noqa: F401
from fdtpu.models.separable import SeparableCNN  # noqa: F401
from fdtpu.models.ssd import SSD, ssd_patch_sizes  # noqa: F401
