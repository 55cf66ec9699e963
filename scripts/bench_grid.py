"""Measure every BASELINE.json config row on the TPU (one JSON line per row).

Rows (BASELINE.json "configs"):
  1. poolresnet_infer   — PoolResnet-medium inference (fwd + fused NMS)
  2. poolresnet_train   — PoolResnet + YoloLoss full train step
  3. ssd_train          — SSD-16 + SSDLoss train step (anchor matching)
  4. mobilenetv3_train  — MobileNetV3 small-model regime train step
  5. separable_train    — SeparableCNN depthwise regime train step
  6. pruned_infer       — L1-pruned (20%) PoolResnet batch inference
  7. exported_infer     — StableHLO-exported predict program

Usage: python scripts/bench_grid.py [--size 320] [--batch 64]
Run alone — the chip admits one client at a time.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def time_scan(step_fn, init, n):
    """Time n iterations of a device-side scan program."""
    import jax

    @jax.jit
    def many(c):
        return jax.lax.scan(lambda c, _: step_fn(c), c, None, length=n)

    c, out = many(init)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    c, out = many(c)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan", type=int, default=10)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.core.nms import decode_filter_nms
    from fdtpu.models import (
        MobileNetV3Backbone, PoolResnet, SSD, SeparableCNN, ssd_patch_sizes,
    )
    from fdtpu.train import create_train_state
    from fdtpu.train.step import make_train_step
    from fdtpu.utils.config import TrainConfig

    S, B = args.size, args.batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8))
    boxes = np.zeros((B, 4, 5), np.float32)
    boxes[:, 0] = [1.0, 40, 60, 120, 100]
    boxes = jnp.asarray(boxes)
    bm = jnp.asarray(np.tile([True, False, False, False], (B, 1)))
    sm = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(1)
    results = {}

    def train_rate(module, name, neg_pos_ratio=10):
        config = TrainConfig(use_sam=True)
        state, tx = create_train_state(module, config, jax.random.PRNGKey(0), 100)
        raw = make_train_step(module, tx, config, augment=True, jit=False,
                              neg_pos_ratio=neg_pos_ratio)
        dt = time_scan(
            lambda st: raw(st, images, boxes, bm, sm, key), state, args.scan
        )
        results[name] = round(B / dt, 1)

    # 1-2: PoolResnet flagship
    pr = PoolResnet(filters=128, input_shape=(S, S), num_patches=15)
    train_rate(pr, "poolresnet_train_img_s")
    variables = pr.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False)
    imgs_f = images.astype(jnp.float32) / 255.0
    grid = pr.grid_size()

    def infer_once(c):
        out = pr.apply(variables, c, train=False)
        b, m = jax.vmap(
            lambda o: decode_filter_nms(o, grid, (S, S), 0.5, 0.5, 64)
        )(out)
        return c + 1e-7 * jnp.sum(b[:, 0, 0]), jnp.sum(m)

    dt = time_scan(infer_once, imgs_f, 3 * args.scan)
    results["poolresnet_infer_img_s"] = round(B / dt, 1)

    # 3: SSD
    ssd = SSD(filters=16, input_shape=(S, S), patch_sizes=ssd_patch_sizes((S, S)))
    train_rate(ssd, "ssd_train_img_s")

    # 4: MobileNetV3
    mnv3 = MobileNetV3Backbone(input_shape=(S, S), num_patches=S // 32)
    train_rate(mnv3, "mobilenetv3_train_img_s")

    # 5: SeparableCNN
    sep = SeparableCNN(filters=128, input_shape=(S, S), num_patches=16)
    train_rate(sep, "separable_train_img_s")

    # 6: pruned PoolResnet inference
    from fdtpu.compat import prune_l1_structured

    p_module, p_vars = prune_l1_structured(pr, variables, 0.2)
    p_grid = p_module.grid_size()

    def pruned_once(c):
        out = p_module.apply(p_vars, c, train=False)
        b, m = jax.vmap(
            lambda o: decode_filter_nms(o, p_grid, (S, S), 0.5, 0.5, 64)
        )(out)
        return c + 1e-7 * jnp.sum(b[:, 0, 0]), jnp.sum(m)

    dt = time_scan(pruned_once, imgs_f, 3 * args.scan)
    results["pruned_infer_img_s"] = round(B / dt, 1)

    # 7: exported predict program
    from fdtpu.export import aot_compile_predict

    compiled = aot_compile_predict(pr, variables, batch_size=B,
                                   probability_threshold=0.5, iou_threshold=0.5)
    imgs255 = images.astype(jnp.float32)
    b, m = compiled(imgs255)
    jax.device_get(m)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        b, m = compiled(imgs255)
    jax.device_get(m)
    results["exported_infer_img_s"] = round(B * iters / (time.perf_counter() - t0), 1)

    results["device"] = str(jax.devices()[0])
    results["size"] = S
    results["batch"] = B
    print(json.dumps(results))


if __name__ == "__main__":
    main()
