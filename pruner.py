"""Structured pruning — the ``pruner.py`` entry point
(``/root/reference/pruner.py:15-87``, same role).

The reference uses torch_pruning's dependency graph with an L1 strategy
(amount 0.2) over every Conv2d/BatchNorm2d/Linear and wall-clock-benchmarks
10 forward passes before/after (``pruner.py:42-82``). Here pruning operates
on the Flax param pytree (``fdtpu/compat/pruning.py``): L1 channel scores,
dependency propagation through the sequential residual topology, physical
shrink + re-trace, same before/after benchmark.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fdtpu.compat.pruning import prune_l1_structured
from fdtpu.models import PoolResnet


def benchmark_model(module, variables, batch: int, size: int, iters: int = 10):
    """10-forward wall-clock benchmark (``pruner.py:50-59``)."""
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, size, size, 3)), jnp.float32
    )
    fwd = jax.jit(lambda v, t: module.apply(v, t, train=False))
    # device_get, not block_until_ready: the latter does not fully sync
    # through the TPU tunnel (CLAUDE.md)
    jax.device_get(fwd(variables, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, batch / dt


def main():
    from fdtpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None, help="Orbax checkpoint to prune")
    p.add_argument("--input", type=int, default=480)
    p.add_argument("--patches", type=int, default=10)
    p.add_argument("--filters", type=int, default=128)
    p.add_argument("--blocks", type=int, default=10)
    p.add_argument("--amount", type=float, default=0.2,
                   help="fraction of channels to prune (pruner.py:42)")
    p.add_argument("--align", type=int, default=None,
                   help="round kept channels down to this multiple (MXU "
                        "tiling: non-128-aligned widths measured SLOWER "
                        "than unpruned on TPU)")
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--save", default=None, help="save pruned checkpoint here")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend (axon ignores JAX_PLATFORMS)")
    args = p.parse_args()
    from train_model import apply_platform

    apply_platform(args.platform)

    module = PoolResnet(
        filters=args.filters, input_shape=(args.input, args.input),
        num_patches=args.patches, num_residual_blocks=args.blocks,
    )
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.input, args.input, 3), jnp.float32),
        train=False,
    )
    if args.checkpoint:
        from fdtpu.train.checkpoint import restore_variables

        variables = restore_variables(args.checkpoint)

    dt, fps = benchmark_model(module, variables, args.batch, args.input)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"before: {n_params/1e6:.3f}M params, {dt*1000:.1f} ms/batch, {fps:.1f} img/s")

    pruned_module, pruned_vars = prune_l1_structured(
        module, variables, args.amount, align=args.align
    )

    dt, fps = benchmark_model(pruned_module, pruned_vars, args.batch, args.input)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(pruned_vars["params"]))
    print(f"after:  {n_params/1e6:.3f}M params, {dt*1000:.1f} ms/batch, {fps:.1f} img/s")

    if args.save:
        import orbax.checkpoint as ocp
        from pathlib import Path

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(Path(args.save).absolute(), pruned_vars, force=True)
        print(f"saved pruned params to {args.save}")


if __name__ == "__main__":
    main()
