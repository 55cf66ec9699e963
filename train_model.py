"""YOLO-grid detector training — the ``train_model.py`` entry point
(``/root/reference/train_model.py:12-62``, same role, same defaults).

The reference configures by editing constants; here the same knobs are CLI
flags with the reference's values as defaults: PoolResnet-128 @480px, 10x10
grid, 10 blocks, batch 8, lr 1e-4, 70 epochs, SAM, MultiStepLR@40 x0.1,
mixed precision (bf16 — the TPU-native counterpart of precision=16).
"""

import argparse

from fdtpu.data import (
    BatchLoader,
    WIDERFaceDataSource,
    download_dataset_files,
    load_targets,
)
from fdtpu.models import build_model
from fdtpu.train import Trainer
from fdtpu.utils.config import DetectorConfig, TrainConfig


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data", help="WIDERFace root")
    p.add_argument("--model", default="poolresnet",
                   choices=["poolresnet", "resnet", "separable", "mobilenetv3"])
    p.add_argument("--input", type=int, default=480, help="square input size")
    p.add_argument("--patches", type=int, default=10, help="grid size config")
    p.add_argument("--filters", type=int, default=128)
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--no-sam", action="store_true",
                   help="plain Adam (the reference's effective behavior)")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrained-backbone", default=None, metavar="PTH",
                   help="mobilenetv3 only: initialize the backbone from a "
                        "reference TorchScript checkpoint (fresh head) — the "
                        "timm pretrained=True analogue "
                        "(MobilenetV3Backbone.py:33-39); pass 'official' for "
                        "the bundled WIDERFace-trained checkpoint")
    p.add_argument("--box-capacity", type=int, default=8)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-train-images", type=int, default=0,
                   help="subset for quick runs (0 = all)")
    p.add_argument("--device-data", action="store_true",
                   help="stage the training set into device HBM once and "
                        "scan whole epochs on device (WIDERFace@320px is "
                        "~3.9 GB resident; implies no host rotation). "
                        "Composes with --data-parallel: the dataset is "
                        "staged batch-sharded over the mesh and each epoch "
                        "is one shard_map scan")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="train steps scanned per device program; >1 "
                        "amortizes dispatch latency (essential through the "
                        "axon TPU tunnel at ~1 s/call)")
    p.add_argument("--rotate-device", action="store_true",
                   help="run the Rotate augmentation on device (three-shear "
                        "Pallas kernels) instead of host-side PIL — frees "
                        "the host core for JPEG decode on real datasets")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="devices on the 'data' mesh axis (0 = single device, "
                        "-1 = all visible devices); batch size must divide")
    p.add_argument("--no-fast-stem", action="store_true",
                   help="disable the two-stage stem lowering (same math as "
                        "the reference's k10/s8 conv, checkpoint-compatible "
                        "both ways; default on: +3.7%% train / +2.5%% infer "
                        "throughput on v5e, BASELINE.md round-4)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; use --platform cpu for host runs)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host pods/slices):"
                        " each process feeds its shard of the global batch; "
                        "implies --data-parallel -1 unless set")
    return p.parse_args()


def apply_platform(platform: str | None) -> None:
    """Force the jax backend before any backend initialization (must be the
    config API — this image's axon TPU plugin overrides JAX_PLATFORMS).

    ``"tpu"`` leaves jax's default auto-selection in place (prefers the
    accelerator): TPU plugins register under their own platform names
    (this image's tunnel is ``axon``), so pinning the literal string would
    crash exactly where a TPU is present."""
    if platform and platform != "tpu":
        import jax

        jax.config.update("jax_platforms", platform)


def main():
    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    args = parse_args()
    apply_platform(args.platform)
    if args.device_data and not (args.no_augment or args.rotate_device):
        # Staged frames can't carry host rotation (one frozen angle per image
        # forever), and silently dropping the reference's Rotate(p=0.2) would
        # change the training distribution — so imply the device kernels.
        print(
            "--device-data: enabling --rotate-device so the reference's "
            "Rotate(p=0.2) augmentation is kept (host rotation cannot run "
            "on staged frames); pass --rotate-device explicitly to silence "
            "or --no-augment to disable augmentation",
            flush=True,
        )
        args.rotate_device = True
    process_shard = None
    if args.multihost:
        import jax

        from fdtpu.parallel import initialize_multihost

        initialize_multihost()
        if args.data_parallel == 0:
            args.data_parallel = -1  # the whole pod/slice
        if jax.process_count() > 1:
            process_shard = (jax.process_index(), jax.process_count())
    run_name = (
        f"{args.model}_{args.filters}_{args.patches}x{args.patches}_"
        f"{args.input}x{args.input}"
    )  # run-identity string like train_model.py:21-25
    model_cfg = DetectorConfig(
        filters=args.filters,
        input_shape=(args.input, args.input),
        num_patches=args.patches,
        num_residual_blocks=args.blocks,
        fast_stem=not args.no_fast_stem,
    )
    train_cfg = TrainConfig(
        learning_rate=args.lr,
        max_epochs=args.epochs,
        batch_size=args.batch_size,
        box_capacity=args.box_capacity,
        use_sam=not args.no_sam,
        seed=args.seed,
        log_path=f"logs/out_{run_name}.log",
        checkpoint_dir="checkpoints",
        data_parallel=args.data_parallel,
        rotate_device=args.rotate_device,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=args.device_data,
    )

    download_dataset_files(args.data_dir)
    train_targets = load_targets(args.data_dir, "train", max_faces=3)
    val_targets = load_targets(args.data_dir, "val", max_faces=3)
    if args.max_train_images:
        train_targets = train_targets[: args.max_train_images]
        val_targets = val_targets[: max(args.max_train_images // 4, 1)]

    shape = model_cfg.input_shape
    train_src = WIDERFaceDataSource(
        train_targets, shape, args.box_capacity,
        # host rotation is off under --rotate-device (device kernels do it)
        # and --device-data (frames are staged once; pass --rotate-device)
        rotate_prob=0.0
        if (args.no_augment or args.rotate_device or args.device_data)
        else 0.2,
        seed=args.seed,
    )
    val_src = WIDERFaceDataSource(val_targets, shape, args.box_capacity)
    train_loader = BatchLoader(
        train_src, args.batch_size, shuffle=True, seed=args.seed,
        drop_last=True, process_shard=process_shard,
    )
    val_loader = BatchLoader(val_src, args.batch_size, process_shard=process_shard)

    module = build_model(args.model, model_cfg)
    trainer = Trainer(
        module, train_cfg, train_loader, val_loader,
        augment=not args.no_augment, run_name=run_name,
    )
    if args.pretrained_backbone:
        if args.model != "mobilenetv3":
            raise SystemExit("--pretrained-backbone requires --model mobilenetv3")
        from fdtpu.compat import pretrained_backbone_variables

        path = args.pretrained_backbone
        if path == "official":
            path = ("/root/reference/saved_models/official/"
                    "MobilenetV3Backbone/medium_model_15x15_480.pth")
        fresh = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
        v = pretrained_backbone_variables(path, module, fresh)
        trainer.state = trainer.state.replace(
            params=v["params"], batch_stats=v.get("batch_stats", {})
        )
        print(f"backbone initialized from {path} (fresh head)")
    if args.resume:
        trainer.maybe_resume()
    out = trainer.fit()
    print(f"final: {out}")
    ckpt = trainer.save()
    print(f"saved: {ckpt}")


if __name__ == "__main__":
    main()
