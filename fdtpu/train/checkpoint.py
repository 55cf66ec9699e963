"""Orbax checkpointing: resumable train-state save/restore.

The reference relies on Lightning's auto-saved ``.ckpt`` files and manual
``torch.load``+``load_state_dict`` resume (``/root/reference/
run_validation_epoch.py:48-51``; recipes commented at
``train_model.py:41-44``). Here checkpoints are Orbax pytrees holding params,
BatchNorm stats, optimizer state, and the step counter, so a resumed run is
bitwise-continuous.
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from fdtpu.train.state import TrainState


def save_checkpoint(ckpt_dir: str | Path, state: TrainState, step: int | None = None):
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir / f"step_{step:08d}", state, force=True)
    return ckpt_dir / f"step_{step:08d}"


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(ckpt_dir.glob("step_*"))
    return steps[-1] if steps else None


def restore_checkpoint(path: str | Path, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (shapes/dtypes must match)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), template)


def restore_variables(path: str | Path) -> dict:
    """Restore a checkpoint as a Flax ``variables`` dict for inference.

    Accepts both checkpoint flavors: a Trainer checkpoint (full TrainState
    tree — params/batch_stats/opt_state/step) or a bare variables tree. Uses
    a template-free restore so inference entry points don't need to
    reconstruct the optimizer state just to read weights.
    """
    import jax
    import jax.numpy as jnp

    with ocp.StandardCheckpointer() as ckptr:
        # Build an abstract template from the checkpoint's own metadata so
        # arrays restore onto the *current* backend — a bare restore pins
        # them to the sharding they were saved with (e.g. a TPU checkpoint
        # then fails to load on the CPU backend).
        meta = ckptr.metadata(Path(path).absolute()).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        template = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(
                m.shape, m.dtype or jnp.float32, sharding=dev
            ),
            tree,
        )
        raw = ckptr.restore(Path(path).absolute(), template)
    if "params" not in raw:
        raise ValueError(f"unrecognized checkpoint structure at {path}: {list(raw)}")
    variables = {"params": raw["params"]}
    if raw.get("batch_stats"):
        variables["batch_stats"] = raw["batch_stats"]
    return variables
