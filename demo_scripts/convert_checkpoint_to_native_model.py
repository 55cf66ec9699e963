"""Checkpoint -> native ``.fdn`` artifact — the lite-interpreter converter
equivalent (``/root/reference/demo_scripts/convert_checkpoint_to_scripted_model.py:31-55``:
``torch.jit.script`` + ``_save_for_lite_interpreter``): emits a flat op
program + f32 weights executable by the in-repo C++ engine
(``fdtpu/native/infer_engine.cpp``) with no JAX/Python runtime. Thresholds
default to the reference's (prob 0.7, iou 0.01, ``:43-48``). Covers the
full zoo: PoolResnet/Resnet/SeparableCNN/MobileNetV3 (BatchNorm folded)
and SSD (multi-scale heads + prior decode).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdtpu.export import export_native  # noqa: E402
from fdtpu.models import build_model  # noqa: E402
from fdtpu.utils.config import DetectorConfig, SSDConfig  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--out", default="saved_models/native/model.fdn")
    p.add_argument("--model", default="poolresnet")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--patches", type=int, default=10)
    p.add_argument("--filters", type=int, default=128)
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--prob-threshold", type=float, default=0.7)
    p.add_argument("--iou-threshold", type=float, default=0.01)
    p.add_argument("--capacity", type=int, default=64)
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8: per-channel 7-bit weights, ~4x smaller "
                        "artifact, dynamically-quantized activations at "
                        "serving (onnxruntime dynamic-quantization analogue)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.model == "ssd":
        cfg = SSDConfig(
            filters=args.filters, input_shape=(args.input, args.input),
            patch_sizes=(),  # build_model derives ssd_patch_sizes(input)
        )
    else:
        cfg = DetectorConfig(
            filters=args.filters, input_shape=(args.input, args.input),
            num_patches=args.patches, num_residual_blocks=args.blocks,
        )
    module = build_model(args.model, cfg)
    h, w = module.input_shape
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32), train=False
    )
    if args.checkpoint:
        if str(args.checkpoint).endswith(".pth"):
            from fdtpu.compat import load_reference_detector

            module, variables = load_reference_detector(
                args.checkpoint, module, variables
            )
        else:
            from fdtpu.train.checkpoint import restore_variables

            variables = restore_variables(args.checkpoint)

    path = export_native(
        module, variables, args.out,
        probability_threshold=args.prob_threshold,
        iou_threshold=args.iou_threshold,
        capacity=args.capacity,
        weight_quant=None if args.quantize == "none" else args.quantize,
    )
    print(f"exported {path} ({path.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
