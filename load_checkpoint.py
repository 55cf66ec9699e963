"""Checkpoint smoke loader — the ``load_checkpoint.py`` entry point
(``/root/reference/load_checkpoint.py:7-38``, same role): load a checkpoint,
fetch one validation sample, decode ground-truth and predicted boxes, print
both. (The reference version is buggy as written — it instantiates the
abstract BaseModel; this one works.)
"""

import argparse

import jax
import numpy as np

from fdtpu.data import WIDERFaceDataSource, load_targets
from fdtpu.models import Detector, build_model
from fdtpu.utils.config import DetectorConfig


def main():
    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model", default="poolresnet")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--patches", type=int, default=10)
    p.add_argument("--filters", type=int, default=128)
    p.add_argument("--blocks", type=int, default=10)
    args = p.parse_args()

    cfg = DetectorConfig(
        filters=args.filters, input_shape=(args.input, args.input),
        num_patches=args.patches, num_residual_blocks=args.blocks,
    )
    module = build_model(args.model, cfg)
    det = Detector(module)
    det.init(jax.random.PRNGKey(0))
    if args.checkpoint:
        from fdtpu.train.checkpoint import restore_variables

        det.variables = restore_variables(args.checkpoint)

    targets = load_targets(args.data_dir, "val", max_faces=3)
    src = WIDERFaceDataSource(targets, cfg.input_shape, 8)
    img, gt_boxes, gt_mask = src.get(0)
    print("ground truth boxes:")
    print(gt_boxes[gt_mask])

    norm, boxes, mask = det.predict(img)
    print("predicted boxes:")
    print(np.asarray(boxes)[np.asarray(mask)])


if __name__ == "__main__":
    main()
