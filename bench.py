"""Benchmark: WIDERFace-workload images/sec/chip at 320px (BASELINE.json).

Flagship config: PoolResnet-128 (the reference's train_model.py model,
``/root/reference/train_model.py:27-32``) at 320px, batch 64, bf16. Primary
metric is **training throughput** — the full default step (batch 128: +13%
over 64, near the scaling knee measured on v5 lite) (device
augmentation -> target encode -> forward -> SAM two-point grads -> Adam).
Inference (forward + fused decode/filter/NMS) is reported alongside.

Timing runs the step loop **on device** via ``lax.scan`` so per-call host
dispatch (expensive through the axon TPU tunnel, ~1s/call) doesn't pollute
the measurement — real training pipelines the same way.

Baseline: architecture-identical PyTorch on this machine's CPU
(``scripts/torch_cpu_baseline.py``; measured 2026-08-16, torch 2.13, 1 core):
train 9.48 img/s, infer 26.04 img/s at 320px.

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
BATCH = 128
TRAIN_SCAN = 10
INFER_SCAN = 30


def main():
    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.core.nms import decode_filter_nms
    from fdtpu.models import PoolResnet
    from fdtpu.train import create_train_state
    from fdtpu.train.step import make_train_step
    from fdtpu.utils.config import TrainConfig

    module = PoolResnet(
        filters=FILTERS, input_shape=(SIZE, SIZE), num_patches=15,
        num_residual_blocks=BLOCKS,
    )
    config = TrainConfig(use_sam=True)
    state, tx = create_train_state(module, config, jax.random.PRNGKey(0), 100)
    raw_step = make_train_step(module, tx, config, augment=True, jit=False)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    )
    boxes = np.zeros((BATCH, 4, 5), dtype=np.float32)
    boxes[:, 0] = [1.0, 40, 60, 120, 100]
    boxes = jnp.asarray(boxes)
    box_mask = jnp.asarray(np.tile([True, False, False, False], (BATCH, 1)))
    sample_mask = jnp.ones((BATCH,), dtype=bool)
    key = jax.random.PRNGKey(1)

    # -- train throughput: TRAIN_SCAN steps per device program --
    @jax.jit
    def train_many(st):
        def body(s, _):
            s, scalars = raw_step(s, images, boxes, box_mask, sample_mask, key)
            return s, scalars["loss"]
        return jax.lax.scan(body, st, None, length=TRAIN_SCAN)

    st, losses = train_many(state)
    jax.device_get(losses)  # compile + warmup
    t0 = time.perf_counter()
    st, losses = train_many(st)
    losses = jax.device_get(losses)
    train_img_s = BATCH * TRAIN_SCAN / (time.perf_counter() - t0)
    assert np.isfinite(losses).all(), losses

    # -- inference: forward + fused decode/filter/NMS, scanned on device --
    variables = {"params": st.params}
    imgs_f = images.astype(jnp.float32) / 255.0
    grid = module.grid_size()

    @jax.jit
    def infer_many(x):
        def body(c, _):
            out = module.apply(variables, c, train=False)
            b, m = jax.vmap(
                lambda o: decode_filter_nms(o, grid, (SIZE, SIZE), 0.5, 0.5, 64)
            )(out)
            # feed a scalar back so iterations are serialized
            c2 = c + jnp.float32(1e-7) * jnp.sum(b[:, 0, 0])
            return c2, jnp.sum(m)
        return jax.lax.scan(body, x, None, length=INFER_SCAN)

    _, counts = infer_many(imgs_f)
    jax.device_get(counts)
    t0 = time.perf_counter()
    _, counts = infer_many(imgs_f)
    jax.device_get(counts)
    infer_img_s = BATCH * INFER_SCAN / (time.perf_counter() - t0)

    device = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_320px",
                "value": round(train_img_s, 1),
                "unit": "images/sec",
                "vs_baseline": round(train_img_s / TORCH_CPU_TRAIN_IMG_S, 1),
                "infer_images_per_sec": round(infer_img_s, 1),
                "infer_vs_baseline": round(infer_img_s / TORCH_CPU_INFER_IMG_S, 1),
                "device": str(device),
                "model": f"PoolResnet-{FILTERS} {SIZE}px b{BATCH} bf16 sam+aug",
            }
        )
    )


if __name__ == "__main__":
    main()
