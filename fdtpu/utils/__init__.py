"""Config, logging, and drawing utilities."""

from fdtpu.utils.config import DetectorConfig, SSDConfig, TrainConfig  # noqa: F401
