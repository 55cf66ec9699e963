"""Detection losses, vectorized over the batch."""

from fdtpu.losses.yolo import yolo_loss, yolo_loss_batch  # noqa: F401
from fdtpu.losses.ssd import ssd_loss, hard_negative_mining  # noqa: F401
