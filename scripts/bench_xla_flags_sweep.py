"""Sweep XLA TPU flags against the production forward's elementwise tax.

The round-4 forward decomposition (`bench_forward_decomp.py`) found an
OR-shaped tax: a pure conv chain runs 3.37 ms at b128/320px, but the
presence of ANY inter-conv elementwise op (leaky / skip-add / even a single
trailing sigmoid) costs ~1.6 ms. The optimized HLO shows why: with
elementwise ops present, XLA-TPU stops fusing conv epilogues and emits each
leaky/add as a standalone kLoop fusion — a full HBM round-trip per op —
and far fewer outputs stay VMEM-resident (S(1): 45 bare vs 27 full).

This script forks one subprocess per XLA_FLAGS candidate and times the
PRODUCTION PoolResnet-128@320 forward (f32 carry, same structure as
bench.py's infer scan) under each. Flags come from `strings libtpu.so`;
semantics are unknown upstream defaults, so this is an empirical probe.

Usage: python scripts/bench_xla_flags_sweep.py [--out logs/round4/xla_flags.jsonl]
Run alone - the chip admits one client at a time.
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

CHILD = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, "@REPO@")
from fdtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from fdtpu.models import PoolResnet

B = 128
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, 320, 320, 3), jnp.float32)
model = PoolResnet(filters=128, input_shape=(320, 320), num_patches=15,
                   num_residual_blocks=10)
params = model.init(key, x[:1])["params"]

def body(c, _):
    out = model.apply({"params": params}, c, train=False)
    s = jnp.sum(out[:1, :1, :1, :1])
    return c + 1e-7 * s, None

@jax.jit
def many(c):
    c, _ = jax.lax.scan(body, c, None, length=10)
    return c, jnp.sum(c[:1, :1, :1, :1])

c, p = many(x)
jax.device_get(p)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    c, p = many(c)
    jax.device_get(p)
    times.append((time.perf_counter() - t0) / 10)
print("RESULT " + json.dumps({"fwd_ms": round(float(np.median(times)) * 1e3, 3)}))
"""

ARMS = {
    "baseline": "",
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "scoped_vmem_100m": "--xla_tpu_scoped_vmem_limit_kib=102400",
    "scavenge_fusions": "--xla_tpu_scavenge_vmem_for_fusions=true",
    "aggressive_loop_fusion_layout": (
        "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    "multi_level_nested_loop_fusion": (
        "--xla_tpu_enable_multi_level_nested_loop_fusion=true"),
    "input_conv_multi_users": "--xla_tpu_input_conv_multi_users=true",
    "vmem_to_vmem_dmas": "--xla_tpu_enable_vmem_to_vmem_dmas=true",
    "reduce_loop_fusion_dup": (
        "--xla_tpu_reduce_loop_fusion_dup_with_unfusable_user=true"),
    "all_experimental_sched": (
        "--xla_tpu_enable_all_experimental_scheduler_features=true"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="logs/round4/xla_flags.jsonl")
    ap.add_argument("--arms", default=None,
                    help="comma-separated subset of arm names")
    args = ap.parse_args()

    repo = str(Path(__file__).resolve().parent.parent)
    child_src = CHILD.replace("@REPO@", repo)
    arms = ARMS
    if args.arms:
        arms = {k: ARMS[k] for k in args.arms.split(",")}

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with out_path.open("a") as out:
        for name, flags in arms.items():
            env = dict(os.environ)
            if flags:
                env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
            proc = subprocess.run(
                [sys.executable, "-c", child_src], env=env,
                capture_output=True, text=True, timeout=1200)
            row = {"arm": name, "flags": flags}
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    row.update(json.loads(line[len("RESULT "):]))
            if "fwd_ms" not in row:
                row["error"] = (proc.stderr.strip().splitlines() or ["?"])[-1][:300]
            print(json.dumps(row), flush=True)
            out.write(json.dumps(row) + "\n")
            out.flush()


if __name__ == "__main__":
    main()
