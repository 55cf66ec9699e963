"""SSD detector training — the ``train_model_ssd.py`` entry point
(``/root/reference/train_model_ssd.py:10-61``, same role, same defaults):
SSD-16 @480px (4774 priors), batch 24, lr 1e-4, 70 epochs, neg:pos 10,
quarter-epochs (``dataset_ssd.py:32-34``), crowding filter < 120 faces.
"""

import argparse

from fdtpu.data import (
    BatchLoader,
    WIDERFaceDataSource,
    download_dataset_files,
    load_targets,
)
from fdtpu.models import SSD, ssd_patch_sizes
from fdtpu.train import Trainer
from fdtpu.utils.config import SSDConfig, TrainConfig


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--filters", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--neg-pos-ratio", type=int, default=10)
    p.add_argument("--bg-push", type=float, default=0.0,
                   help="opt-in quality extension (not in the reference): "
                        "weight on the BCE of unmined background priors — "
                        "drives untouched background scores below the decode "
                        "threshold (multi-box-per-face precision fix); "
                        "0.0 reproduces the reference loss exactly")
    p.add_argument("--no-sam", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="the reference SSD pipeline trains with Resize only "
                        "(augs commented out, datamodule_ssd.py:106-122)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--box-capacity", type=int, default=128)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-train-images", type=int, default=0)
    p.add_argument("--data-parallel", type=int, default=0,
                   help="devices on the 'data' mesh axis (0 = single device, "
                        "-1 = all visible devices); batch size must divide")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; use --platform cpu for host runs)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="train steps scanned per device program (see "
                        "train_model.py)")
    p.add_argument("--device-data", action="store_true",
                   help="stage the (quarter-)epoch training set into device "
                        "HBM and scan whole epochs on device")
    return p.parse_args()


def main():
    from fdtpu.utils.cache import enable_compilation_cache
    from train_model import apply_platform

    enable_compilation_cache()

    args = parse_args()
    apply_platform(args.platform)
    run_name = f"ssd_{args.filters}_{args.input}x{args.input}"
    cfg = SSDConfig(
        filters=args.filters,
        input_shape=(args.input, args.input),
        patch_sizes=ssd_patch_sizes((args.input, args.input)),
        neg_pos_ratio=args.neg_pos_ratio,
        bg_push=args.bg_push,
    )
    train_cfg = TrainConfig(
        learning_rate=args.lr,
        max_epochs=args.epochs,
        batch_size=args.batch_size,
        box_capacity=args.box_capacity,
        use_sam=not args.no_sam,
        seed=args.seed,
        log_path=f"logs/out_{run_name}.log",
        data_parallel=args.data_parallel,
        steps_per_dispatch=args.steps_per_dispatch,
        device_data=args.device_data,
    )

    download_dataset_files(args.data_dir)
    train_targets = load_targets(args.data_dir, "train", max_faces=120)
    val_targets = load_targets(args.data_dir, "val", max_faces=120)
    if args.max_train_images:
        train_targets = train_targets[: args.max_train_images]
        val_targets = val_targets[: max(args.max_train_images // 4, 1)]

    shape = cfg.input_shape
    train_src = WIDERFaceDataSource(train_targets, shape, args.box_capacity)
    val_src = WIDERFaceDataSource(val_targets, shape, args.box_capacity)
    train_loader = BatchLoader(
        train_src, args.batch_size, shuffle=True, seed=args.seed,
        drop_last=True, epoch_fraction=4,  # dataset_ssd.py:32-34
    )
    val_loader = BatchLoader(val_src, args.batch_size)

    module = SSD(
        filters=cfg.filters, input_shape=cfg.input_shape,
        patch_sizes=cfg.patch_sizes,
    )
    trainer = Trainer(
        module, train_cfg, train_loader, val_loader,
        augment=args.augment, neg_pos_ratio=args.neg_pos_ratio,
        run_name=run_name, bg_push=args.bg_push,
    )
    if args.resume:
        trainer.maybe_resume()
    out = trainer.fit()
    print(f"final: {out}")
    print(f"saved: {trainer.save()}")


if __name__ == "__main__":
    main()
