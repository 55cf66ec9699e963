"""Benchmark: WIDERFace-workload images/sec/chip at 320px (BASELINE.json).

Flagship config: PoolResnet-128 (the reference's train_model.py model,
``/root/reference/train_model.py:27-32``) at 320px, batch 128, bf16. Primary
metric is **training throughput** — the full default step (device
augmentation -> target encode -> forward -> SAM two-point grads -> Adam).
Inference (forward + fused decode/filter/NMS) is reported alongside.

Timing runs the step loop **on device** via ``lax.scan`` so per-call host
dispatch (expensive through the axon TPU tunnel, ~1s/call) doesn't pollute
the measurement — real training pipelines the same way. Each metric is the
**median of REPS timed runs** (round-2 VERDICT: headline numbers must be
driver-reproducible medians, not the best observed day; tunnel latency
varies several-fold), with min/max reported alongside.

Scan lengths (round-4): each timed dispatch still pays one ~20-30 ms
tunnel round-trip, so the reported rate is ``compute + overhead/scan``.
The original scans (train 10 / infer 30) left 10-20% of amortizable
dispatch in the number (measured convergence: b128 infer 31.0k @ scan 30,
36.8k @ 100, 38.5k @ 300 — fit: overhead ~24-28 ms, compute ~3.24 ms/iter);
scans are now sized so the residual is <3% (train 100 / infer 300).
Rounds <= 3 therefore UNDER-report device throughput by that margin —
see BASELINE.md round-4 "dispatch amortization" note before comparing.

MFU is derived from ANALYTIC conv FLOPs (``poolresnet_forward_flops``)
against the chip's bf16 peak — XLA's ``cost_analysis()`` is unusable on
this backend (under-reports ~30x, see that function's docstring) — the
roofline accounting VERDICT item 3 asked for (see BASELINE.md for the
per-component breakdown).

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
TRAIN_SCAN = 100
INFER_SCAN = 300
LATENCY_SCAN = 2000
REPS = 3

# bf16 peak of one TPU v5e (v5 lite) chip; used only for the MFU readout.
PEAK_BF16_FLOPS = 197e12


def _timed_rates(fn, sync, images_per_call: int, reps: int = REPS):
    """Median/min/max images-per-second over ``reps`` timed calls (after the
    caller's warmup). ``sync`` must device_get something from fn's result."""
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        rates.append(images_per_call / (time.perf_counter() - t0))
    return float(np.median(rates)), rates


def poolresnet_forward_flops(
    size: int, filters: int, blocks: int, num_patches: int = 15
) -> float:
    """Analytic conv FLOPs (2*MACs) of one PoolResnet forward pass — XLA's
    ``compiled.cost_analysis()['flops']`` is unusable on this TPU backend
    (reports 0.1 GFLOPs/img for a measured-3.2 model). Geometry per
    ``fdtpu/models/poolresnet.py``: stem k10/s8/p2, ``blocks`` residual
    blocks of two 3x3 convs (pool after while dim > 2*num_patches), head
    k6 valid. 320px/128f/10blk -> 3.21 GFLOPs (fwd)."""
    dim = (size + 4 - 10) // 8 + 1  # stem output
    f = 2.0 * dim * dim * filters * 3 * 100
    for _ in range(blocks):
        f += 2 * (2.0 * dim * dim * filters * filters * 9)
        if dim > 2 * num_patches:
            dim //= 2
    out = dim - 5  # head k6, VALID
    f += 2.0 * out * out * 5 * filters * 36
    return f


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rotate-device", action="store_true",
                    help="include the on-device Rotate pass in the train "
                         "step (BASELINE.md end-to-end matrix row); default "
                         "off = the faithful host-rotation-off-hot-path "
                         "headline the driver records")
    ap.add_argument("--no-fast-stem", action="store_true",
                    help="disable the two-stage stem lowering (same math as "
                         "the plain k10/s8 conv, measured ~8x faster on v5e;"
                         " default on, as in the production entry points)")
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.models import PoolResnet
    from fdtpu.train import create_train_state
    from fdtpu.train.step import _decode_predictions, make_train_step
    from fdtpu.utils.config import TrainConfig

    module = PoolResnet(
        filters=FILTERS, input_shape=(SIZE, SIZE), num_patches=15,
        num_residual_blocks=BLOCKS, fast_stem=not args.no_fast_stem,
    )
    # positional_crop: the production Trainer resolves it True for shuffled
    # feeds (every training entry point shuffles) — bench the same path
    config = TrainConfig(use_sam=True, rotate_device=args.rotate_device,
                         positional_crop=True)
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
    def train_many(st):
        def body(s, _):
            s, scalars = raw_step(s, images, boxes, box_mask, sample_mask, key)
            return s, scalars["loss"]
        return jax.lax.scan(body, st, None, length=TRAIN_SCAN)

    train_compiled = jax.jit(train_many).lower(state).compile()
    st, losses = train_compiled(state)
    jax.device_get(losses)  # warmup
    holder = {"st": st}

    def _train_once():
        holder["st"], losses = train_compiled(holder["st"])
        holder["losses"] = losses  # NaN guard checks the TIMED runs
        return losses

    train_img_s, train_rates = _timed_rates(
        _train_once, jax.device_get, BATCH * TRAIN_SCAN
    )
    assert np.isfinite(jax.device_get(holder["losses"])).all()

    # -- inference: forward + fused decode/filter/NMS, scanned on device.
    # Decode through the PRODUCTION helper (fdtpu/train/step.py) so the bench
    # measures the shipped path: the Pallas fused decode+filter+NMS batch
    # kernel on TPU, the vmapped XLA twin elsewhere. The scan carries the
    # frames as uint8 — the dtype serving actually receives (the host decode
    # and ``Detector.predict`` are u8-in) — with the /255 convert on device;
    # an f32-staged feed reads 4x the bytes and measures 0.7 ms/batch slower
    # (BASELINE.md round-4 decomposition, ``fwd_bwd_u8_encode`` arm).
    variables = {"params": holder["st"].params}

    def infer_many(x_u8):
        def body(c, _):
            imgs = c.astype(jnp.float32) / 255.0
            out = module.apply(variables, imgs, train=False)
            b, m = _decode_predictions(module, out, (SIZE, SIZE), 0.5, 0.5, 64)
            # serialize iterations through a cheap u8-space mutation (flip
            # the low bit when the detection count is odd) — keeps the
            # carry's bytes live without an f32 full-image pass
            c2 = c ^ (jnp.sum(m) % 2).astype(jnp.uint8)
            return c2, jnp.sum(m)
        return jax.lax.scan(body, x_u8, None, length=INFER_SCAN)

    infer_compiled = jax.jit(infer_many).lower(images).compile()
    _, counts = infer_compiled(images)
    jax.device_get(counts)  # warmup
    infer_img_s, infer_rates = _timed_rates(
        lambda: infer_compiled(images)[1], jax.device_get, BATCH * INFER_SCAN
    )

    # -- single-image serving latency (b1). f32-staged feed: at 0.3 MB/frame
    # the u8 traffic saving is nil and measures ~0.2 ms slower (BASELINE.md
    # round-4 feed-dtype note), so tiny-batch serving stages f32.
    img1 = images[:1].astype(jnp.float32) / 255.0

    def serve_one(x):
        def body(c, _):
            out = module.apply(variables, c, train=False)
            b, m = _decode_predictions(module, out, (SIZE, SIZE), 0.5, 0.5, 64)
            c2 = c + jnp.float32(1e-7) * jnp.sum(b[:, 0, 0])
            return c2, jnp.sum(m)
        return jax.lax.scan(body, x, None, length=LATENCY_SCAN)

    serve_compiled = jax.jit(serve_one).lower(img1).compile()
    jax.device_get(serve_compiled(img1)[1])  # warmup
    lat_img_s, _ = _timed_rates(
        lambda: serve_compiled(img1)[1], jax.device_get, LATENCY_SCAN
    )
    latency_b1_ms = 1e3 / lat_img_s

    device = jax.devices()[0]
    result = {
        "metric": "train_images_per_sec_per_chip_320px",
        "value": round(train_img_s, 1),
        "unit": "images/sec",
        "vs_baseline": round(train_img_s / TORCH_CPU_TRAIN_IMG_S, 1),
        "infer_images_per_sec": round(infer_img_s, 1),
        "infer_vs_baseline": round(infer_img_s / TORCH_CPU_INFER_IMG_S, 1),
        "train_img_s_min_max": [
            round(min(train_rates), 1), round(max(train_rates), 1)
        ],
        "infer_img_s_min_max": [
            round(min(infer_rates), 1), round(max(infer_rates), 1)
        ],
        "serving_latency_b1_ms": round(latency_b1_ms, 4),
        "reps": REPS,
        "device": str(device),
        "model": f"PoolResnet-{FILTERS} {SIZE}px b{BATCH} bf16 sam+aug",
    }
    if device.platform == "tpu":
        fwd = poolresnet_forward_flops(SIZE, FILTERS, BLOCKS)
        # SAM step = 2 points x (forward + backward); backward ~ 2x forward
        # (grads w.r.t. activations + weights) => ~6x forward per image.
        train_per_img = 6.0 * fwd
        result["fwd_gflops_per_img"] = round(fwd / 1e9, 2)
        result["train_mfu"] = round(
            train_img_s * train_per_img / PEAK_BF16_FLOPS, 3
        )
        result["infer_mfu"] = round(
            infer_img_s * fwd / PEAK_BF16_FLOPS, 3
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
