"""Pallas TPU kernels for the inference hot path."""

from fdtpu.kernels.nms_pallas import (  # noqa: F401
    grid_decode_tables,
    pallas_decode_filter_nms,
    pallas_decode_filter_nms_batch,
    pallas_nms_available,
    ssd_decode_tables,
    ssd_output_decode_tables,
)
