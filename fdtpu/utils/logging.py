"""Metric logging: console + append-only text log + JSONL.

Reproduces the reference's observability surface (``/root/reference/models/
ModelMeta.py:241-313``): per-epoch loss/IoU/recall/precision/F1 printed to the
console and appended to a text log file (``logs/out_<name>.log``). TensorBoard
isn't in this image; the structured equivalent is a JSONL stream next to the
text log (one object per epoch) that any dashboard can tail.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, log_path: str | Path = "logs/out.log"):
        self.log_path = Path(log_path)
        self.log_path.parent.mkdir(parents=True, exist_ok=True)
        self.jsonl_path = self.log_path.with_suffix(".jsonl")

    def log_epoch(self, epoch: int, split: str, metrics: dict) -> str:
        """Format + emit one epoch's metrics. Returns the formatted line."""
        parts = [f"epoch={epoch}", f"split={split}"]
        parts += [
            f"{k}={float(v):.6f}" for k, v in metrics.items()
        ]
        line = "  ".join(parts)
        print(line)
        with self.log_path.open("a") as f:
            f.write(line + "\n")
        with self.jsonl_path.open("a") as f:
            record = {
                "time": time.time(),
                "epoch": epoch,
                "split": split,
                **{k: float(v) for k, v in metrics.items()},
            }
            f.write(json.dumps(record) + "\n")
        return line
