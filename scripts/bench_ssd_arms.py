"""SSD-16 lane-starvation attack: width-folded conv lowering shootout.

BASELINE.md's round-2 SSD decomposition closed the SSD train row (1,489
img/s, the weakest grid entry) as "architecture-faithful, not worth an
unfaithful rewrite" — 16/32-channel convs fill <=1/4 of each 128-wide MXU
result tile. The round-4 fast-stem result showed a faithful-numerics
re-lowering can recover a starved conv, so this bench runs the same
playbook on the SSD block stack (``/root/reference/models/SSD.py:127-163``):

* ``prod``   — SSD-16 as shipped.
* ``folded`` — ``SSD(fast_blocks=True)``: every 3x3 conv with cout<128 is
  ``WidthFoldedConv`` (fold = min(4, 128//cout) output width positions
  packed into lanes; identical MAC set, (fold+2)/3 FLOP padding).

Both arms share one param tree (verified identical) and are gated allclose
on one batch before timing. Times the eval forward and the full SAM train
step (the grid row). One JSON line.

Usage: python scripts/bench_ssd_arms.py [--size 320] [--batch 64] [--scan 100]
Run alone — the chip admits one client at a time.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 5


def time_scan_ms(step_fn, init, n, reps=REPS):
    """Median per-iteration ms (device-side scan, scalar probe sync)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(c):
        c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c, None,
                            length=n)
        # First leaf may be a 0-d step counter (TrainState); ravel handles
        # any rank.
        probe = jnp.sum(jnp.ravel(
            jax.tree_util.tree_leaves(c)[0])[:1].astype(jnp.float32))
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
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan", type=int, default=100)
    ap.add_argument("--train-scan", type=int, default=50)
    args = ap.parse_args()

    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fdtpu.models import SSD, ssd_patch_sizes
    from fdtpu.train import create_train_state
    from fdtpu.train.step import make_train_step
    from fdtpu.utils.config import TrainConfig

    S, B = args.size, args.batch
    ps = ssd_patch_sizes((S, S))
    arms = {
        "prod": SSD(filters=16, input_shape=(S, S), patch_sizes=ps),
        "folded": SSD(filters=16, input_shape=(S, S), patch_sizes=ps,
                      fast_blocks=True),
        # fold<=2 pads MACs only (2+2)/3=1.33x (vs 2x at fold 4) for 2x
        # lane occupancy — tests whether FLOP padding ate the fold-4 win.
        "fold2": SSD(filters=16, input_shape=(S, S), patch_sizes=ps,
                     fast_blocks=True, fold_cap=2),
    }
    results = {"size": S, "batch": B, "scan": args.scan,
               "train_scan": args.train_scan, "reps": REPS}

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, 3), jnp.bfloat16)
    variables = arms["prod"].init(jax.random.PRNGKey(0),
                                  x[:1].astype(jnp.float32), train=False)

    # Equality gate (shared params; bf16 summation-order tolerance like
    # the fast-stem gate).
    outs = {}
    for name, m in arms.items():
        outs[name] = jax.device_get(jax.jit(
            lambda c, m=m: m.apply(variables, c, train=False))(x[:8]))
    for name in arms:
        if name == "prod":
            continue
        d = np.abs(outs["prod"] - outs[name])
        results[f"gate_{name}_maxdiff"] = float(d.max())
        results[f"gate_{name}_allclose"] = bool(
            np.allclose(outs["prod"], outs[name], atol=0.02, rtol=0.02))
    print(json.dumps(results), flush=True)  # partial (compiles are slow)

    # Eval forward.
    def fwd_probe(module):
        def body(c):
            out = module.apply(variables, c, train=False)
            s = jnp.sum(out[:1, :1, :1].astype(jnp.float32))
            return c + (1e-7 * s).astype(c.dtype)
        return body

    for name, m in arms.items():
        results[f"fwd_{name}_ms"] = round(
            time_scan_ms(fwd_probe(m), x, args.scan), 3)
        print(json.dumps(results), flush=True)

    # Full SAM train step (the BASELINE grid row harness, bench_grid.py).
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8))
    boxes = np.zeros((B, 4, 5), np.float32)
    boxes[:, 0] = [1.0, 40, 60, 120, 100]
    boxes = jnp.asarray(boxes)
    bm = jnp.asarray(np.tile([True, False, False, False], (B, 1)))
    sm = jnp.ones((B,), bool)
    akey = jax.random.PRNGKey(1)

    for name, m in arms.items():
        config = TrainConfig(use_sam=True)
        state, tx = create_train_state(m, config, jax.random.PRNGKey(0), 100)
        raw = make_train_step(m, tx, config, augment=True, jit=False,
                              neg_pos_ratio=10)
        dt = time_scan_ms(
            lambda st: raw(st, images, boxes, bm, sm, akey)[0],
            state, args.train_scan)
        results[f"train_{name}_ms"] = round(dt, 3)
        results[f"train_{name}_img_s"] = round(B / (dt / 1e3), 1)
        print(json.dumps(results), flush=True)

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
