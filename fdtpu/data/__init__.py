"""WIDERFace data pipeline: annotation parsing, host image loading, on-device
JAX augmentation, fixed-shape batching with device prefetch."""

from fdtpu.data.widerface import (  # noqa: F401
    DATASET_LINKS,
    download_dataset_files,
    parse_wider_annotations,
    load_targets,
)
from fdtpu.data.pipeline import (  # noqa: F401
    Batch,
    BatchLoader,
    DevicePrefetcher,
    WIDERFaceDataSource,
    make_synthetic_widerface,
    rotate_image_and_boxes,
)
from fdtpu.data.augment import augment_batch, resize_only_batch  # noqa: F401
