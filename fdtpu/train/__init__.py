"""Training subsystem: functional train state, SAM, jitted steps, metrics,
epoch loop, checkpointing."""

from fdtpu.train.metrics import detection_metrics  # noqa: F401
from fdtpu.train.state import TrainState, create_train_state  # noqa: F401
from fdtpu.train.step import make_eval_step, make_train_step  # noqa: F401
from fdtpu.train.loop import Trainer  # noqa: F401
from fdtpu.train.widerface_eval import (  # noqa: F401
    evaluate_widerface,
    write_official_predictions,
)
