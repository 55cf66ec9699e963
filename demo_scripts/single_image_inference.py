"""Batch image inference — ``demo_scripts/single_image_inference.py``
equivalent (``/root/reference/demo_scripts/single_image_inference.py``, same
role): rebuild a model from a checkpoint, swap in caller thresholds
(prob 0.5 / iou 0.01, reference ``:39-44``), and annotate every image in
``imgs/test_imgs`` into ``imgs/annotated_imgs``.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdtpu.models import Detector, build_model  # noqa: E402
from fdtpu.utils.config import DetectorConfig  # noqa: E402
from fdtpu.utils.draw import draw_bbx  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", default="imgs/test_imgs")
    p.add_argument("--out", default="imgs/annotated_imgs")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model", default="poolresnet")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--patches", type=int, default=10)
    p.add_argument("--filters", type=int, default=128)
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--prob-threshold", type=float, default=0.5)
    p.add_argument("--iou-threshold", type=float, default=0.01)
    args = p.parse_args()

    import jax
    from PIL import Image

    cfg = DetectorConfig(
        filters=args.filters, input_shape=(args.input, args.input),
        num_patches=args.patches, num_residual_blocks=args.blocks,
    )
    module = build_model(args.model, cfg)
    det = Detector(
        module, probability_threshold=args.prob_threshold,
        iou_threshold=args.iou_threshold,
    )
    det.init(jax.random.PRNGKey(0))
    if args.checkpoint:
        if str(args.checkpoint).endswith(".pth"):
            from fdtpu.compat import load_reference_detector

            det.module, det.variables = load_reference_detector(
                args.checkpoint, module, det.variables
            )
        else:
            from fdtpu.train.checkpoint import restore_variables

            det.variables = restore_variables(args.checkpoint)

    paths = sorted(Path(args.images).glob("*"))
    paths = [p for p in paths if p.suffix.lower() in (".jpg", ".jpeg", ".png")]
    for path in paths:
        img = np.asarray(Image.open(path).convert("RGB"))
        t0 = time.perf_counter()
        norm, boxes, mask = det.predict(img)
        dt = (time.perf_counter() - t0) * 1000
        print(f"{path.name}: {int(np.asarray(mask).sum())} boxes, {dt:.1f} ms")
        draw_bbx(
            np.asarray(norm), np.asarray(boxes), mask=np.asarray(mask),
            save_name=path.stem, out_dir=args.out,
        )


if __name__ == "__main__":
    main()
