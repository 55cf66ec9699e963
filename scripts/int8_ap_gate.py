"""int8 deployment gate with an AP delta (round-3 VERDICT #4).

The round-3 int8 gate measured box-churn percentages on a near-untrained
SSD; the deployment-grade question (what onnxruntime dynamic quantization
would be judged by on the reference's ONNX path, ``demo_model_onnx.py:26-31``)
is **AP@0.5(f32) vs AP@0.5(int8)** on a well-trained model through the same
decode. This script:

1. trains the known-good SSD config (SSD-16 @160px, torch init, synthetic
   control data — the round-3 control arm that reaches ~0.73 AP) on the
   requested platform;
2. computes val AP@0.5 through the JAX decode (the training-framework number);
3. exports f32 and int8 ``.fdn`` artifacts and evaluates BOTH through the
   C++ engine (``NativeDetector``) with the same AP code;
4. additionally reports the official MobileNetV3 checkpoint's f32-vs-int8
   agreement on the reference test photos as a self-consistency AP (no
   ground truth exists for those images, so the f32 engine's detections
   serve as the reference set).

Usage: python scripts/int8_ap_gate.py [--platform tpu] [--epochs 150]
Run alone — the chip admits one client at a time. One JSON line.
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from torch_ssd_control import (  # noqa: E402
    BATCH, CAPACITY, IOU_THR, LR, NEG_POS, PROB_THR, SIZE, _data, _eval_ap,
)


def _native_ap(det, val_loader):
    """AP through the C++ engine: decode happens inside the artifact."""
    from fdtpu.train.metrics import average_precision

    pb, pm, gb, gm = [], [], [], []
    for batch in val_loader:
        boxes, mask = det.predict(batch.images.astype(np.float32))
        keep = np.asarray(batch.sample_mask)
        pb.append(boxes[keep])
        pm.append(mask[keep])
        gb.append(batch.boxes[keep])
        gm.append(batch.box_mask[keep])
    return float(
        average_precision(
            np.concatenate(pb), np.concatenate(pm),
            np.concatenate(gb), np.concatenate(gm),
        )
    )


def run_ssd(platform, epochs):
    tmp = tempfile.mkdtemp(prefix="int8_gate_")
    train_loader, val_loader = _data(tmp)
    import jax

    if platform:
        jax.config.update(
            "jax_platforms", "" if platform == "tpu" else platform
        )
    import jax.numpy as jnp

    from fdtpu.export import export_native
    from fdtpu.models import SSD, ssd_patch_sizes
    from fdtpu.native.infer import NativeDetector
    from fdtpu.train import Trainer
    from fdtpu.utils.config import TrainConfig

    patch_sizes = tuple(ssd_patch_sizes((SIZE, SIZE)))
    module = SSD(
        filters=16, input_shape=(SIZE, SIZE), patch_sizes=patch_sizes,
        dtype=jnp.bfloat16,
    )
    cfg = TrainConfig(
        learning_rate=LR, max_epochs=epochs, batch_size=BATCH,
        box_capacity=8, use_sam=False, visualize_first_batch=False,
        device_data=True,
        checkpoint_dir=str(Path(tmp) / "ckpt"),
        log_path=str(Path(tmp) / "out.log"),
    )
    trainer = Trainer(
        module, cfg, train_loader, None, augment=False,
        neg_pos_ratio=NEG_POS, nms_params=(PROB_THR, IOU_THR, CAPACITY),
        run_name="int8_gate",
    )
    for _ in range(epochs):
        trainer.train_epoch()
        trainer.epoch += 1

    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    fwd = jax.jit(lambda x: module.apply(variables, x, train=False))
    ap_jax = _eval_ap(
        lambda im: np.asarray(fwd(jnp.asarray(im, jnp.float32) / 255.0)),
        val_loader, patch_sizes,
    )

    # export both artifacts (f32 weights come from the bf16-trained params;
    # export_native stores f32) and evaluate through the engine
    f32_vars = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), variables
    )
    pf = export_native(
        module, f32_vars, Path(tmp) / "ssd_f32.fdn",
        probability_threshold=PROB_THR, iou_threshold=IOU_THR,
        capacity=CAPACITY,
    )
    pq = export_native(
        module, f32_vars, Path(tmp) / "ssd_q8.fdn",
        probability_threshold=PROB_THR, iou_threshold=IOU_THR,
        capacity=CAPACITY, weight_quant="int8",
    )
    _, val_loader2 = _data(tmp)
    ap_f32 = _native_ap(NativeDetector(pf), val_loader2)
    _, val_loader3 = _data(tmp)
    ap_q8 = _native_ap(NativeDetector(pq), val_loader3)
    return {
        "model": "ssd16_trained",
        "ap50_jax": ap_jax["ap50"],
        "precision_jax": ap_jax["precision"],
        "ap50_native_f32": round(ap_f32, 4),
        "ap50_native_int8": round(ap_q8, 4),
        "ap_delta_int8": round(ap_q8 - ap_f32, 4),
        "size_f32_mb": round(pf.stat().st_size / 1e6, 2),
        "size_int8_mb": round(pq.stat().st_size / 1e6, 2),
        "epochs": epochs,
        "steps": int(trainer.state.step),
    }


def run_mnv3_official():
    """f32-vs-int8 self-consistency AP on the reference test photos (the
    official MobileNetV3 checkpoint; f32 engine detections = reference set,
    scored with the same AP code at IoU 0.5)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fdtpu.compat import load_reference_detector
    from fdtpu.export import export_native
    from fdtpu.models import MobileNetV3Backbone
    from fdtpu.native.infer import NativeDetector
    from fdtpu.train.metrics import average_precision

    official = Path(
        "/root/reference/saved_models/official/MobilenetV3Backbone/"
        "medium_model_15x15_480.pth"
    )
    img_dir = Path("/root/reference/imgs/test_imgs")
    module = MobileNetV3Backbone(
        input_shape=(480, 480), num_patches=15, dtype=jnp.float32
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3)), train=False
    )
    wrapped, wvars = load_reference_detector(str(official), module, variables)
    tmp = tempfile.mkdtemp(prefix="int8_mnv3_")
    pf = export_native(
        wrapped, wvars, Path(tmp) / "mnv3_f32.fdn",
        probability_threshold=0.7, iou_threshold=0.01, capacity=64,
    )
    pq = export_native(
        wrapped, wvars, Path(tmp) / "mnv3_q8.fdn",
        probability_threshold=0.7, iou_threshold=0.01, capacity=64,
        weight_quant="int8",
    )
    imgs = np.stack([
        np.asarray(
            Image.open(p).convert("RGB").resize((480, 480), Image.BILINEAR),
            np.float32,
        )
        for p in sorted(img_dir.glob("*.jpg"))
    ])
    bf, mf = NativeDetector(pf).predict(imgs)
    bq, mq = NativeDetector(pq).predict(imgs)
    ap = float(average_precision(bq, mq, bf[..., :5] * 1.0, mf))
    # average_precision expects gt boxes as (B, K, 5) [conf,x,y,w,h]
    return {
        "model": "mnv3_official_480",
        "n_f32_boxes": int(mf.sum()),
        "n_int8_boxes": int(mq.sum()),
        "self_consistency_ap50": round(ap, 4),
        "size_f32_mb": round(pf.stat().st_size / 1e6, 2),
        "size_int8_mb": round(pq.stat().st_size / 1e6, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--skip-mnv3", action="store_true")
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    res = run_ssd(args.platform, args.epochs)
    print(json.dumps(res))
    if not args.skip_mnv3:
        print(json.dumps(run_mnv3_official()))


if __name__ == "__main__":
    main()
