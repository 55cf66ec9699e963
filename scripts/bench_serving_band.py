"""Small-batch serving band (b2-b32): forward vs forward+decode cost.

Round-4 left the band between b1 (0.29 ms) and the b128 knee unmeasured
except one data point ("at b8 both decode paths cost ~1 ms fixed over the
forward", BASELINE.md). The reference's own webcam loop serves at batch 2
(``/root/reference/demo_model.py:20`` stacks every frame with a copy), so
the most reference-faithful serving batch sits in this band.

Measures, per batch size, f32-staged feed (the tiny-batch production
staging, BASELINE.md round-4 feed-dtype note):

* ``fwd``    — forward only.
* ``pallas`` — forward + batched fused decode/filter/NMS (production path).
* ``xla``    — forward + vmapped XLA twin.

Detection density matters: the greedy NMS loop early-exits in 8-iteration
chunks, so a saturated candidate set (untrained net on noise: ~half the
grid above threshold) runs all ``capacity`` iterations while a realistic
trained-serving set (a handful of faces) exits after one chunk. The head
bias is shifted to pin each regime: ``sparse`` (conf sigmoid ~0.02, the
near-empty frame; a served frame with faces exits within 1-2 chunks the
same way) and ``saturated`` (raw init). One JSON line per batch.

Usage: python scripts/bench_serving_band.py [--saturated-b8] [--scan N]
Run alone — the chip admits one client at a time.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZE = 320
REPS = 5


def time_scan_ms(step_fn, init, n, reps=REPS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(c):
        c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c, None,
                            length=n)
        probe = jnp.sum(
            jax.tree_util.tree_leaves(c)[0][:1, :1].astype(jnp.float32))
        return c, probe

    c, p = many(init)
    jax.device_get(p)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c, p = many(c)
        jax.device_get(p)
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32])
    ap.add_argument("--scan", type=int, default=1000)
    ap.add_argument("--saturated-b8", action="store_true",
                    help="also measure the saturated-density regime at b8")
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.core.nms import decode_filter_nms
    from fdtpu.kernels import (
        grid_decode_tables, pallas_decode_filter_nms_batch,
    )
    from fdtpu.models import PoolResnet

    module = PoolResnet(filters=128, input_shape=(SIZE, SIZE),
                        num_patches=15, num_residual_blocks=10,
                        fast_stem=True)
    grid = module.grid_size()
    key = jax.random.PRNGKey(0)
    variables = module.init(key, jnp.zeros((1, SIZE, SIZE, 3)), train=False)

    def with_head_bias(v, shift):
        """Shift the conf channel of the head conv bias (channel 0)."""
        params = jax.tree_util.tree_map(lambda a: a, v["params"])  # copy
        b = params["Conv_1"]["bias"]
        params["Conv_1"]["bias"] = b.at[0].add(shift)
        return {"params": params}

    sparse_vars = with_head_bias(variables, -4.0)  # sigmoid ~0.018
    tables = grid_decode_tables(grid, (SIZE, SIZE))

    from fdtpu.train.step import _decode_predictions

    def make_body(arm, vs):
        def body(c):
            out = module.apply(vs, c, train=False)
            if arm == "fwd":
                s = jnp.sum(out[:1, :1, :1].astype(jnp.float32))
            else:
                flat = out.reshape(out.shape[0], -1, 5)
                if arm == "pallas":
                    b, m = pallas_decode_filter_nms_batch(
                        flat, tables, 0.5, 0.5, 64, interpret=False)
                elif arm == "prod":
                    # the shipped batch-aware routing (round-5)
                    b, m = _decode_predictions(
                        module, out, (SIZE, SIZE), 0.5, 0.5, 64)
                else:
                    b, m = jax.vmap(lambda o: decode_filter_nms(
                        o, grid, (SIZE, SIZE), 0.5, 0.5, 64))(out)
                s = jnp.sum(b[:, 0, 0]) + jnp.sum(m)
            return c + (1e-7 * s).astype(c.dtype)
        return body

    rows = []
    rng = np.random.default_rng(0)
    for B in args.batches:
        x = jnp.asarray(
            rng.integers(0, 255, (B, SIZE, SIZE, 3), np.uint8)
        ).astype(jnp.float32) / 255.0
        scan = args.scan if B <= 8 else max(300, args.scan // 2)
        row = {"batch": B, "scan": scan}
        # detection count sanity (sparse regime)
        out = module.apply(sparse_vars, x, train=False)
        row["sparse_mean_above_thr"] = float(
            (np.asarray(out[..., 0]) > 0.5).reshape(B, -1).sum(1).mean())
        for arm in ("fwd", "pallas", "xla", "prod"):
            row[f"{arm}_ms"] = round(
                time_scan_ms(make_body(arm, sparse_vars), x, scan), 4)
        if args.saturated_b8 and B == 8:
            out = module.apply(variables, x, train=False)
            row["saturated_mean_above_thr"] = float(
                (np.asarray(out[..., 0]) > 0.5).reshape(B, -1).sum(1).mean())
            for arm in ("fwd", "pallas", "xla"):
                row[f"saturated_{arm}_ms"] = round(
                    time_scan_ms(make_body(arm, variables), x, scan), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"rows": rows, "size": SIZE, "reps": REPS,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
