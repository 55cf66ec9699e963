"""Multi-host (multi-slice) coordination.

The reference is single-process (SURVEY.md §2.8); fdtpu's single-slice
scaling needs no host coordination because XLA compiles collectives straight
onto ICI. Crossing hosts/slices (DCN) requires ``jax.distributed`` process
bootstrap — this module is that one entry point, so entry scripts can opt in
with ``--multihost`` without touching library code.

Data sharding across hosts follows the standard JAX recipe: every process
feeds only its addressable shard of the global batch
(``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    With no arguments, ``jax.distributed.initialize()`` auto-detects the
    cluster from the environment (TPU pods populate it); a plain single
    process has no cluster metadata, which surfaces as an initialize error
    and means "not distributed". Returns True when running distributed,
    False for the single-process case (no-op). Idempotent. Must run before
    any jax backend use — auto-detection is impossible afterwards.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return False  # no cluster environment: single-process no-op
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_batch_from_local(mesh, local_arrays, spatial_image_dim=None):
    """Assemble globally-sharded arrays from per-process local shards.

    Each process passes its local slice of the batch; the returned arrays are
    global jax.Arrays laid out on ``mesh`` (batch over 'data'). Works on a
    single process too (equivalent to ``shard_batch_arrays``).
    """
    from fdtpu.parallel.mesh import batch_sharding

    out = []
    for a in local_arrays:
        sd = spatial_image_dim if (a.ndim == 4) else None
        sharding = batch_sharding(mesh, a.ndim, sd)
        out.append(jax.make_array_from_process_local_data(sharding, a))
    return tuple(out)
