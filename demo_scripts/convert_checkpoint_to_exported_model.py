"""Checkpoint -> deployable artifact — the
``convert_checkpoint_to_scripted_model.py`` equivalent
(``/root/reference/demo_scripts/convert_checkpoint_to_scripted_model.py:31-55``):
where the reference emits TorchScript + a lite-interpreter archive with
decode+NMS in-graph, this emits a **StableHLO serialized predict program**
(normalize -> forward -> fused decode/filter/NMS, weights baked in) loadable
by any JAX runtime. Thresholds default to the reference's (prob 0.7,
iou 0.01, ``:43-48``).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdtpu.export import export_predict  # noqa: E402
from fdtpu.models import build_model  # noqa: E402
from fdtpu.utils.config import DetectorConfig  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--out", default="saved_models/exported/model.stablehlo")
    p.add_argument("--model", default="poolresnet")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--patches", type=int, default=10)
    p.add_argument("--filters", type=int, default=128)
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prob-threshold", type=float, default=0.7)
    p.add_argument("--iou-threshold", type=float, default=0.01)
    args = p.parse_args()

    import jax

    cfg = DetectorConfig(
        filters=args.filters, input_shape=(args.input, args.input),
        num_patches=args.patches, num_residual_blocks=args.blocks,
    )
    module = build_model(args.model, cfg)
    h, w = module.input_shape
    import jax.numpy as jnp

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

    path = export_predict(
        module, variables, args.out, batch_size=args.batch,
        probability_threshold=args.prob_threshold,
        iou_threshold=args.iou_threshold,
    )
    print(f"exported {path} ({path.stat().st_size/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
