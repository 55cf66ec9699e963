"""Serving-throughput batch knee: the production inference path (forward +
fused decode/filter/NMS, ``fdtpu/train/step.py:_decode_predictions``) at a
sweep of batch sizes, fast-stem PoolResnet-128@320px bf16.

The cross-round headline is pinned at b128 for comparability
(``bench.py``); this answers the deployment question of where throughput
saturates when latency doesn't matter (offline/batch serving). Reference
counterpart: the reference serves ONNX at whatever batch onnxruntime is fed
(``/root/reference/demo_scripts/demo_model_onnx.py:26-31``); it publishes
no knee.

Usage: python scripts/bench_infer_knee.py [--batches 64,128,256,512]
         [--scan N] [--xla-nms | --fwd-only]
Small batches (1, 8) with --scan 2000 give serving latency; --xla-nms and
--fwd-only price the decode paths against the same harness. The scan
carries uint8 frames (production input dtype — BASELINE.md round-4
feed-dtype note). Run alone - the chip admits one client at a time.
One JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZE = 320
REPS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256,512")
    ap.add_argument("--scan", type=int, default=300,
                    help="iterations per timed dispatch; short scans leave "
                         "the ~24-28 ms tunnel dispatch in the number")
    ap.add_argument("--xla-nms", action="store_true",
                    help="decode through the vmapped XLA twin instead of the "
                         "batched Pallas kernel (small-batch latency probe)")
    ap.add_argument("--fwd-only", action="store_true",
                    help="skip decode entirely (forward-only floor; prices "
                         "the decode paths against the same harness)")
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.models import PoolResnet
    from fdtpu.train.step import _decode_predictions

    module = PoolResnet(filters=128, input_shape=(SIZE, SIZE),
                        num_patches=15, num_residual_blocks=10,
                        fast_stem=True)
    key = jax.random.PRNGKey(0)
    variables = {"params": module.init(
        key, jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))["params"]}

    results = {"model": "PoolResnet-128 320px bf16 fast_stem", "scan": args.scan,
               "nms": ("none" if args.fwd_only
                       else "xla_twin" if args.xla_nms else "pallas_batch")}
    rng = np.random.default_rng(0)
    for b in [int(s) for s in args.batches.split(",")]:
        # carry the frames as uint8 (the dtype serving receives; an
        # f32-staged feed reads 4x the bytes — BASELINE.md round-4
        # decomposition) and serialize iterations in u8 space
        imgs = jnp.asarray(
            rng.integers(0, 255, size=(b, SIZE, SIZE, 3), dtype=np.uint8)
        )

        def infer_many(x_u8):
            def body(c, _):
                x = c.astype(jnp.float32) / 255.0
                out = module.apply(variables, x, train=False)
                if args.fwd_only:
                    fb = jnp.sum(out[..., 0]).astype(jnp.int32)
                    return c ^ (fb % 2).astype(jnp.uint8), fb
                bx, m = _decode_predictions(
                    module, out, (SIZE, SIZE), 0.5, 0.5, 64,
                    pallas_nms=False if args.xla_nms else None)
                c2 = c ^ (jnp.sum(m) % 2).astype(jnp.uint8)
                return c2, jnp.sum(m)
            return jax.lax.scan(body, x_u8, None, length=args.scan)

        compiled = jax.jit(infer_many).lower(imgs).compile()
        jax.device_get(compiled(imgs)[1])  # warmup
        rates = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.device_get(compiled(imgs)[1])
            rates.append(b * args.scan / (time.perf_counter() - t0))
        results[f"b{b}_img_s"] = round(float(np.median(rates)), 1)
        results[f"b{b}_min_max"] = [round(min(rates), 1), round(max(rates), 1)]

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
