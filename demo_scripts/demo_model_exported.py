"""Serialized-artifact inference demo — the ``demo_model_onnx.py`` equivalent
(``/root/reference/demo_scripts/demo_model_onnx.py``): load a serialized
model (StableHLO instead of ONNX; deserialization validates the artifact like
``onnx.checker``), then run the same per-frame loop as the torch demo over
images or a webcam.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdtpu.export import load_exported  # noqa: E402
from fdtpu.utils.draw import draw_bbx  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default="saved_models/exported/model.stablehlo")
    p.add_argument("--images", default="imgs/test_imgs")
    p.add_argument("--out", default="imgs/annotated_imgs")
    p.add_argument("--input", type=int, default=480)
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    predict = load_exported(args.artifact)  # validates on deserialize
    print(f"loaded {args.artifact}")

    paths = sorted(Path(args.images).glob("*"))
    paths = [q for q in paths if q.suffix.lower() in (".jpg", ".jpeg", ".png")]
    for path in paths:
        img = Image.open(path).convert("RGB").resize(
            (args.input, args.input), Image.BILINEAR
        )
        x = jnp.asarray(np.asarray(img, np.float32)[None])
        t0 = time.perf_counter()
        boxes, mask = predict(x)
        dt = (time.perf_counter() - t0) * 1000
        n = int(np.asarray(mask[0]).sum())
        print(f"{path.name}: {n} boxes, {dt:.1f} ms")
        draw_bbx(
            np.asarray(img), np.asarray(boxes[0]), mask=np.asarray(mask[0]),
            save_name=path.stem, out_dir=args.out,
        )


if __name__ == "__main__":
    main()
