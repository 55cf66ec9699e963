"""Validation-only runner — the ``run_validation_epoch.py`` entry point
(``/root/reference/run_validation_epoch.py:13-69``, same role): build a
model, load a checkpoint, run one evaluation epoch over the val split, print
loss/IoU/recall/precision/F1 (and AP@0.5 for the BASELINE.md parity gate).
"""

import argparse

import numpy as np

from fdtpu.data import BatchLoader, WIDERFaceDataSource, load_targets
from fdtpu.models import build_model
from fdtpu.train import Trainer
from fdtpu.train.metrics import average_precision
from fdtpu.train.step import make_eval_step
from fdtpu.utils.config import DetectorConfig, TrainConfig


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--model", default="mobilenetv3",
                   choices=["poolresnet", "resnet", "separable", "mobilenetv3",
                            "ssd"])
    p.add_argument("--checkpoint", default=None, help="Orbax checkpoint path")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--patches", type=int, default=15)
    p.add_argument("--filters", type=int, default=None,
                   help="default 128 (YOLO family, train_model.py:27) / "
                        "16 (ssd, train_model_ssd.py:22)")
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    # reference thresholds: run_validation_epoch.py:20-21
    p.add_argument("--prob-threshold", type=float, default=0.5)
    p.add_argument("--iou-threshold", type=float, default=0.01)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--with-ap", action="store_true", help="also compute AP@0.5")
    p.add_argument("--widerface-gt-dir", default=None,
                   help="official eval_tools ground_truth dir (wider_face_val"
                        ".mat + wider_{easy,medium,hard}_val.mat): run the "
                        "OFFICIAL easy/medium/hard mAP protocol over the val "
                        "split (fdtpu/train/widerface_eval.py). Pair with a "
                        "low --prob-threshold (e.g. 0.02) so the PR sweep "
                        "isn't truncated at the decode gate")
    p.add_argument("--widerface-pred-dir", default=None,
                   help="with --widerface-gt-dir: also dump detections in "
                        "the official submission txt layout (cross-check "
                        "with the external toolkit)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend (axon ignores JAX_PLATFORMS)")
    return p.parse_args()


def main():
    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from train_model import apply_platform

    args = parse_args()
    apply_platform(args.platform)
    if args.model == "ssd":
        from fdtpu.models.ssd import ssd_patch_sizes
        from fdtpu.utils.config import SSDConfig

        shape = (args.input, args.input)
        cfg = SSDConfig(
            filters=args.filters or 16,
            input_shape=shape,
            patch_sizes=tuple(ssd_patch_sizes(shape)),
            probability_threshold=args.prob_threshold,
            iou_threshold=args.iou_threshold,
        )
        nms_capacity = cfg.nms_capacity
    else:
        cfg = DetectorConfig(
            filters=args.filters or 128,
            input_shape=(args.input, args.input),
            num_patches=args.patches,
            num_residual_blocks=args.blocks,
            probability_threshold=args.prob_threshold,
            iou_threshold=args.iou_threshold,
        )
        nms_capacity = 64
    # SSD validates under its own pipeline constants: the <120-face filter
    # and a 128-box capacity (datamodule_ssd.py:103; train_model_ssd.py),
    # vs the YOLO pipeline's <3 filter (datamodule.py:102)
    max_faces, capacity = (120, 128) if args.model == "ssd" else (3, 8)
    targets = load_targets(args.data_dir, "val", max_faces=max_faces)
    if args.max_images:
        targets = targets[: args.max_images]
    src = WIDERFaceDataSource(targets, cfg.input_shape, capacity)
    loader = BatchLoader(src, args.batch_size)

    module = build_model(args.model, cfg)
    train_cfg = TrainConfig(visualize_first_batch=False)
    trainer = Trainer(
        module, train_cfg, loader, loader,
        nms_params=(args.prob_threshold, args.iou_threshold, nms_capacity),
        run_name="validation",
    )
    if args.checkpoint:
        if str(args.checkpoint).endswith(".pth"):
            # reference TorchScript checkpoint (the reference's own
            # run_validation_epoch.py:48-51 loads a Lightning ckpt here)
            from fdtpu.compat import load_reference_detector

            module, variables = load_reference_detector(
                args.checkpoint, module, trainer.state.variables()
            )
            trainer.module = module
            trainer.state = trainer.state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
            )
            trainer.eval_step = make_eval_step(
                module, train_cfg,
                nms_params=(args.prob_threshold, args.iou_threshold, nms_capacity),
                return_boxes=True,
            )
        else:
            from fdtpu.train.checkpoint import restore_checkpoint

            trainer.state = restore_checkpoint(args.checkpoint, trainer.state)
    if args.widerface_gt_dir:
        # OFFICIAL WIDERFace protocol (easy/medium/hard mAP) — the real
        # north-star gate; see fdtpu/train/widerface_eval.py. Covers EVERY
        # val image (the reference's <3-face crowding filter is a training
        # choice, not an eval one) and rescales detections back to original
        # pixels, where the official ground truth lives.
        from PIL import Image

        from fdtpu.train.widerface_eval import (
            detections_to_official,
            evaluate_widerface,
        )

        targets = load_targets(args.data_dir, "val", max_faces=10**9)
        if args.max_images:
            targets = targets[: args.max_images]
        src = WIDERFaceDataSource(targets, cfg.input_shape, 8)
        loader = BatchLoader(src, args.batch_size)
        in_size = (cfg.input_shape[1], cfg.input_shape[0])  # (w, h)
        preds = {}
        cursor = 0
        for batch in loader:
            _, (pb, pm) = trainer.eval_step(
                trainer.state, batch.images, batch.boxes,
                batch.box_mask, batch.sample_mask,
            )
            pb, pm = np.asarray(pb), np.asarray(pm)
            for i in range(int(np.sum(batch.sample_mask))):
                path = targets[cursor]["img_path"]
                key = f"{path.parent.name}/{path.stem}"
                with Image.open(path) as im:
                    orig = im.size  # header read only
                preds[key] = detections_to_official(
                    pb[i], pm[i], in_size, orig
                )
                cursor += 1
        if args.widerface_pred_dir:
            from fdtpu.train.widerface_eval import write_official_predictions

            n = write_official_predictions(preds, args.widerface_pred_dir)
            print({"prediction_files": n, "dir": args.widerface_pred_dir})
        aps = evaluate_widerface(preds, args.widerface_gt_dir)
        print({f"mAP_{k}": round(v, 5) for k, v in aps.items()})
        return

    if not args.with_ap:
        metrics = trainer.test(loader)
        print({k: round(v, 5) for k, v in metrics.items()})
        return

    # single pass: the eval step already returns decoded boxes per batch, so
    # accumulate scalar metrics and AP inputs together (the tunneled TPU
    # makes a second epoch expensive)
    from fdtpu.train.metrics import f1_score

    agg = {}
    all_pred, all_pmask, all_gt, all_gmask = [], [], [], []
    for batch in loader:
        scalars, (pb, pm) = trainer.eval_step(
            trainer.state, batch.images, batch.boxes,
            batch.box_mask, batch.sample_mask,
        )
        for k, v in scalars.items():
            agg.setdefault(k, []).append(v)
        keep = batch.sample_mask
        all_pred.append(np.asarray(pb)[keep])
        all_pmask.append(np.asarray(pm)[keep])
        all_gt.append(batch.boxes[keep])
        all_gmask.append(batch.box_mask[keep])
    metrics = {k: float(np.mean(v)) for k, v in agg.items()}
    metrics["f1"] = f1_score(metrics["precision"], metrics["recall"])
    print({k: round(v, 5) for k, v in metrics.items()})
    ap = average_precision(
        np.concatenate(all_pred), np.concatenate(all_pmask),
        np.concatenate(all_gt), np.concatenate(all_gmask),
    )
    print({"AP@0.5": round(ap, 5)})


if __name__ == "__main__":
    main()
