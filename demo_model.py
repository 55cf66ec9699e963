"""Inference demo — the ``demo_model.py`` entry point
(``/root/reference/demo_model.py:11-64``, same role).

The reference opens a webcam with OpenCV and draws detections per frame.
This image has no camera and no cv2, so the demo runs over image files (or
synthetic frames) through the same per-frame path the reference uses: resize
-> normalize -> forward -> fused decode/filter/NMS -> draw rectangles. If
OpenCV + a camera are available (``--camera``), the webcam loop matches the
reference's (ESC to exit).
"""

import argparse
import time
from pathlib import Path

import numpy as np

from fdtpu.models import Detector, build_model
from fdtpu.utils.config import DetectorConfig
from fdtpu.utils.draw import draw_bbx


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", default="imgs/test_imgs", help="input image dir")
    p.add_argument("--out", default="imgs/annotated_imgs")
    p.add_argument("--checkpoint", default=None,
                   help="Orbax checkpoint or reference TorchScript .pth "
                        "(imported via fdtpu.compat)")
    p.add_argument("--model", default="poolresnet")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--patches", type=int, default=10)
    p.add_argument("--filters", type=int, default=64)
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--prob-threshold", type=float, default=0.7)
    p.add_argument("--iou-threshold", type=float, default=0.01)
    p.add_argument("--camera", action="store_true", help="webcam loop (needs cv2)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend (axon ignores JAX_PLATFORMS)")
    return p.parse_args()


def build_detector(args) -> Detector:
    import jax

    cfg = DetectorConfig(
        filters=args.filters,
        input_shape=(args.input, args.input),
        num_patches=args.patches,
        num_residual_blocks=args.blocks,
    )
    module = build_model(args.model, cfg)
    det = Detector(
        module,
        probability_threshold=args.prob_threshold,
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
    return det


def run_images(det: Detector, image_dir: str, out_dir: str):
    from PIL import Image

    paths = sorted(
        p for p in Path(image_dir).glob("*")
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    if not paths:
        print(f"no images in {image_dir}; generating a synthetic frame")
        from fdtpu.data import make_synthetic_widerface
        import tempfile

        root = make_synthetic_widerface(tempfile.mkdtemp(), num_images=3)
        paths = sorted((Path(root) / "WIDER_train/images/0--Synthetic").glob("*.jpg"))
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        t0 = time.perf_counter()
        norm, boxes, mask = det.predict(img)
        dt = time.perf_counter() - t0
        n = int(np.asarray(mask).sum())
        print(f"{p.name}: {n} faces in {dt*1000:.1f} ms")
        draw_bbx(np.asarray(norm), np.asarray(boxes), mask=np.asarray(mask),
                 save_name=p.stem, out_dir=out_dir)


def run_camera(det: Detector):
    """The reference's webcam loop (``demo_model.py:40-57``): like the
    reference's ``extract_face``, boxes are drawn on the model-resized frame
    (predict returns coordinates in that space)."""
    import cv2

    vid = cv2.VideoCapture(0)
    while True:
        ret, frame = vid.read()
        if not ret:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        norm, boxes, mask = det.predict(rgb)
        display = cv2.cvtColor(
            (np.asarray(norm) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
        )
        for b, ok in zip(np.asarray(boxes), np.asarray(mask)):
            if not ok:
                continue
            x, y, w, h = (int(v) for v in b[1:])
            cv2.rectangle(display, (x, y), (x + w, y + h), (255, 0, 0), 2)
        cv2.imshow("fdtpu", display)
        if cv2.waitKey(1) == 27:  # ESC (demo_model.py:53)
            break
    vid.release()
    cv2.destroyAllWindows()


def main():
    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from train_model import apply_platform

    args = parse_args()
    apply_platform(args.platform)
    det = build_detector(args)
    if args.camera:
        run_camera(det)
    else:
        run_images(det, args.images, args.out)


if __name__ == "__main__":
    main()
