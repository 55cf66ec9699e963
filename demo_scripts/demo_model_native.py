"""Native-engine inference demo — the lite-interpreter / onnxruntime-serving
equivalent (``/root/reference/demo_scripts/demo_model_onnx.py:26-31``,
``convert_checkpoint_to_scripted_model.py:51-54``): run a ``.fdn`` artifact
through the in-repo C++ engine with **no JAX in the process** (only numpy +
PIL for image IO here; the ``fdn_serve`` CLI drops even those).

Convert a checkpoint first::

    python demo_scripts/convert_checkpoint_to_native_model.py \
        --checkpoint ... --out saved_models/native/model.fdn

Then::

    python demo_scripts/demo_model_native.py --artifact .../model.fdn
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdtpu.native.infer import NativeDetector  # noqa: E402
from fdtpu.utils.draw import draw_bbx  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default="saved_models/native/model.fdn")
    p.add_argument("--images", default="imgs/test_imgs")
    p.add_argument("--out", default="imgs/annotated_imgs")
    args = p.parse_args()

    from PIL import Image

    det = NativeDetector(args.artifact)  # load validates the artifact
    h, w = det.input_shape
    print(f"loaded {args.artifact} (input {h}x{w}, capacity {det.capacity})")

    paths = sorted(Path(args.images).glob("*"))
    paths = [q for q in paths if q.suffix.lower() in (".jpg", ".jpeg", ".png")]
    for path in paths:
        img = Image.open(path).convert("RGB").resize((w, h), Image.BILINEAR)
        x = np.asarray(img, np.float32)
        t0 = time.perf_counter()
        boxes, mask = det.predict(x)
        dt = (time.perf_counter() - t0) * 1000
        n = int(mask[0].sum())
        print(f"{path.name}: {n} boxes, {dt:.1f} ms")
        draw_bbx(
            np.asarray(img), boxes[0], mask=mask[0],
            save_name=path.stem, out_dir=args.out,
        )


if __name__ == "__main__":
    main()
