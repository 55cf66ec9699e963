"""Dataclass config layer.

The reference has **no config system** — every run is configured by editing
constants at the top of entry scripts (``/root/reference/train_model.py:15-25``,
``run_validation_epoch.py:20-21``). These dataclasses reproduce that surface
(same knobs, same defaults) as declarative, serializable configs; entry
scripts construct them and nothing is hardcoded deeper in the stack.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """YOLO-grid detector family knobs.

    Defaults mirror ``train_model.py:15-32``: 480x480 input, 10x10 grid,
    128 filters, 10 residual blocks.
    """

    filters: int = 128
    input_shape: Tuple[int, int] = (480, 480)  # (height, width)
    num_patches: int = 10
    num_residual_blocks: int = 10
    probability_threshold: float = 0.5
    iou_threshold: float = 0.5
    nms_capacity: int = 128
    # PoolResnet stem/head geometry (/root/reference/models/PoolResnet.py:57-61)
    input_kernel_size: int = 10
    input_stride: int = 8
    output_kernel_size: int = 6
    output_padding: int = 0
    dtype: str = "bfloat16"  # compute dtype; params stay float32
    # Two-stage stem (PoolResnet/SeparableCNN): same stem dot products
    # lowered as 1xk identity expansion + kx1 conv so the channel minor dim
    # is k*cin instead of cin (~8x faster stem on v5e). Checkpoint-compatible
    # both ways (fdtpu/models/layers.py TwoStageStemConv).
    fast_stem: bool = False

    @property
    def image_size(self) -> Tuple[int, int]:
        """(width, height) as used by box encode/decode."""
        return (self.input_shape[1], self.input_shape[0])


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    """SSD detector knobs; defaults mirror ``train_model_ssd.py:22-25`` and
    ``models/SSD.py:99`` (patch sizes -> 4774 priors)."""

    filters: int = 16
    input_shape: Tuple[int, int] = (480, 480)
    patch_sizes: Tuple[int, ...] = (60, 30, 15, 7)
    probability_threshold: float = 0.5
    iou_threshold: float = 0.5
    nms_capacity: int = 128
    neg_pos_ratio: int = 10  # ModelMetaSSD.py:175
    # Opt-in quality extension (not in the reference; see losses/ssd.py):
    # weight on the BCE of unmined background priors. 0.0 = faithful.
    bg_push: float = 0.0
    dtype: str = "bfloat16"

    @property
    def image_size(self) -> Tuple[int, int]:
        return (self.input_shape[1], self.input_shape[0])


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop knobs; defaults are the reference's config of record
    (``train_model.py:47-59``, ``ModelMeta.py:28,104-112``)."""

    learning_rate: float = 1e-4
    optimizer: str = "adam"  # "adam" (reference SAMSGD base) or "sgd"
    max_epochs: int = 70
    batch_size: int = 8
    box_capacity: int = 8  # max gt boxes per image (dataset filters to <3)
    sam_rho: float = 0.05  # SAMSGD rho (ModelMeta.py:28)
    use_sam: bool = True
    lr_milestones: Tuple[int, ...] = (40,)  # MultiStepLR (ModelMeta.py:109-111)
    lr_gamma: float = 0.1
    seed: int = 0
    log_every_steps: int = 50
    checkpoint_dir: str = "checkpoints"
    log_path: str = "logs/out.log"
    visualize_first_batch: bool = True  # ModelMeta.py:144-157
    # Train-epoch detection metrics (iou/recall/precision/f1, the reference
    # logs them for train epochs too, ModelMeta.py:258-287). Computed on the
    # final batch of each epoch only — one decode+NMS per epoch instead of
    # the reference's per-step python metric loop; no per-step sync.
    train_metrics: bool = True
    nan_check: bool = False  # jax_debug_nans analogue of SSD.py:229-252 tripwires
    # Data parallelism: number of devices along the 'data' mesh axis
    # (None = all local devices).
    data_parallel: int | None = None
    # Apply the Rotate augmentation on device (three-shear Pallas kernels,
    # fdtpu/kernels/rotate_pallas.py) instead of host-side PIL at decode
    # time. Frees the single host core for JPEG decode on real datasets;
    # pair with WIDERFaceDataSource(rotate_prob=0.0).
    rotate_device: bool = False
    # Crop the FIRST k batch rows instead of a device-sampled random subset
    # (saves the crop's k-row gather+scatter; distribution-identical when
    # the feed shuffles — see augment_batch_fast). None = auto: the Trainer
    # enables it iff the train loader shuffles.
    positional_crop: bool | None = None
    # Run N train steps per device dispatch (lax.scan over stacked batches).
    # Amortizes per-call dispatch latency — essential through the axon TPU
    # tunnel (~1 s/call caps the per-batch loop at ~batch_size img/s
    # regardless of step speed). 1 = the reference-shaped per-batch loop;
    # single-device (non-data_parallel) Trainer path only.
    steps_per_dispatch: int = 1
    # Stage the whole training set into device HBM once and run each epoch
    # as ONE device-side scan with an on-device shuffle (zero host traffic
    # from epoch 2). WIDERFace train at 320px is ~3.9 GB resident; requires
    # rotate_prob=0 on the source (use rotate_device for rotation).
    device_data: bool = False
