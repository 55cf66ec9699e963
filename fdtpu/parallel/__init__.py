"""Device-mesh parallelism. The reference is strictly single-device
(``Trainer(gpus=1)``, ``/root/reference/train_model.py:47-53``; no
torch.distributed anywhere — SURVEY.md §2.8); scaling here is first-class:
data parallelism (and optional spatial partitioning) over a
``jax.sharding.Mesh`` with XLA collectives riding ICI."""

from fdtpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch_arrays,
)
from fdtpu.parallel.dp import (  # noqa: F401
    make_dp_eval_step,
    make_dp_train_step,
    make_shardmap_dp_eval_step,
    make_shardmap_dp_train_step,
)
from fdtpu.parallel.multihost import (  # noqa: F401
    global_batch_from_local,
    initialize_multihost,
)
