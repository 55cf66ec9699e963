"""Benchmark: WIDERFace-workload images/sec/chip at 320px (BASELINE.json).

Flagship config: PoolResnet-128 (the reference's train_model.py model,
``/root/reference/train_model.py:27-32``) at 320px. Primary metric is
**training throughput** (full default step: device augmentation -> target
encode -> forward -> SAM two-point grads -> Adam); inference throughput
(forward + fused decode/filter/NMS) is reported alongside.

Baseline: the architecture-identical PyTorch model on this machine's CPU
(``scripts/torch_cpu_baseline.py``; measured 2026-08-16, torch 2.13 CPU,
1 core) — train 9.48 img/s, infer 26.04 img/s at 320px/batch 8.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np

TORCH_CPU_TRAIN_IMG_S = 9.475911077684254
TORCH_CPU_INFER_IMG_S = 26.036849319826427

SIZE = 320
FILTERS = 128
BLOCKS = 10
TRAIN_BATCH = 64
INFER_BATCH = 64


def main():
    import jax
    import jax.numpy as jnp

    from fdtpu.models import PoolResnet
    from fdtpu.models.detector import Detector
    from fdtpu.train import create_train_state
    from fdtpu.train.step import make_train_step
    from fdtpu.utils.config import TrainConfig

    module = PoolResnet(
        filters=FILTERS, input_shape=(SIZE, SIZE), num_patches=15,
        num_residual_blocks=BLOCKS,
    )
    config = TrainConfig(use_sam=True)
    state, tx = create_train_state(module, config, jax.random.PRNGKey(0), 100)
    train_step = make_train_step(module, tx, config, augment=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(TRAIN_BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    )
    boxes = np.zeros((TRAIN_BATCH, 4, 5), dtype=np.float32)
    boxes[:, 0] = [1.0, 40, 60, 120, 100]
    boxes = jnp.asarray(boxes)
    box_mask = jnp.asarray(np.tile([True, False, False, False], (TRAIN_BATCH, 1)))
    sample_mask = jnp.ones((TRAIN_BATCH,), dtype=bool)
    key = jax.random.PRNGKey(1)

    # -- train throughput --
    state, scalars = train_step(state, images, boxes, box_mask, sample_mask, key)
    jax.block_until_ready(scalars["loss"])  # compile + warmup
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, scalars = train_step(
            state, images, boxes, box_mask, sample_mask, key
        )
    jax.block_until_ready(scalars["loss"])
    train_img_s = TRAIN_BATCH * iters / (time.perf_counter() - t0)

    # -- inference throughput (forward + fused decode/filter/NMS) --
    det = Detector(module, variables=state.variables(), nms_capacity=64)
    imgs_f = images[:INFER_BATCH].astype(jnp.float32) / 255.0

    @jax.jit
    def infer(imgs):
        out = module.apply(det.variables, imgs, train=False)
        from fdtpu.core.nms import decode_filter_nms

        return jax.vmap(
            lambda o: decode_filter_nms(
                o, module.grid_size(), (SIZE, SIZE), 0.5, 0.5, 64
            )
        )(out)

    b, m = infer(imgs_f)
    jax.block_until_ready(m)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        b, m = infer(imgs_f)
    jax.block_until_ready(m)
    infer_img_s = INFER_BATCH * iters / (time.perf_counter() - t0)

    device = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_320px",
                "value": round(train_img_s, 2),
                "unit": "images/sec",
                "vs_baseline": round(train_img_s / TORCH_CPU_TRAIN_IMG_S, 2),
                "infer_images_per_sec": round(infer_img_s, 2),
                "infer_vs_baseline": round(infer_img_s / TORCH_CPU_INFER_IMG_S, 2),
                "device": str(device),
                "model": f"PoolResnet-{FILTERS} {SIZE}px b{TRAIN_BATCH}",
            }
        )
    )


if __name__ == "__main__":
    main()
