"""Real multi-process validation of the --multihost path: two OS processes
coordinate through jax.distributed on localhost (CPU backend, 4 virtual
devices each -> one global 8-device 'data' mesh), each feeds its
process-shard of the global batch via BatchLoader(process_shard) +
global_batch_from_local, and both run one GSPMD data-parallel train step.
The per-process losses must agree (replicated outputs) and be finite."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8

import jax.numpy as jnp
from fdtpu.data import BatchLoader, WIDERFaceDataSource, load_targets
from fdtpu.data.pipeline import DevicePrefetcher
from fdtpu.models import PoolResnet
from fdtpu.parallel import make_dp_train_step, make_mesh
from fdtpu.train import create_train_state
from fdtpu.utils.config import TrainConfig

targets = load_targets(root, "train", max_faces=3)
src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4, error_log=None)
loader = BatchLoader(src, batch_size=8, shuffle=True, seed=3,
                     process_shard=(pid, 2))
module = PoolResnet(filters=8, input_shape=(160, 160), num_patches=10,
                    num_residual_blocks=2, dtype=jnp.float32)
config = TrainConfig(use_sam=False, optimizer="sgd", learning_rate=1e-3)
state, tx = create_train_state(module, config, jax.random.PRNGKey(0), 10)
mesh = make_mesh(8)
step = make_dp_train_step(module, tx, config, mesh, augment=False)
batch = next(iter(DevicePrefetcher(loader, mesh=mesh)))
assert batch.images.shape[0] == 8  # local (4,...) assembled to global batch
state, scalars = step(state, batch.images, batch.boxes, batch.box_mask,
                      batch.sample_mask, jax.random.PRNGKey(5))
print("RESULT " + json.dumps({"pid": pid, "loss": float(scalars["loss"]),
                              "step": int(state.step)}))
"""


def test_two_process_distributed_dp(tmp_path):
    from fdtpu.data import make_synthetic_widerface

    root = make_synthetic_widerface(tmp_path / "wider", num_images=8, max_faces=2)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parent.parent)
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(root)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=390)[0] for p in procs]
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        rec = json.loads(line[len("RESULT "):])
        results[rec["pid"]] = rec
    assert results[0]["step"] == results[1]["step"] == 1
    assert np.isfinite(results[0]["loss"])
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)


_FIT_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid, root, work = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)

import jax.numpy as jnp
from fdtpu.data import BatchLoader, WIDERFaceDataSource, load_targets
from fdtpu.models import PoolResnet
from fdtpu.train import Trainer
from fdtpu.utils.config import TrainConfig

targets = load_targets(root, "train", max_faces=3)
src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4, error_log=None)
train = BatchLoader(src, batch_size=8, shuffle=True, seed=3, drop_last=True,
                    process_shard=(pid, 2))
val = BatchLoader(src, batch_size=8, process_shard=(pid, 2))
module = PoolResnet(filters=8, input_shape=(160, 160), num_patches=10,
                    num_residual_blocks=2, dtype=jnp.float32)
config = TrainConfig(use_sam=False, optimizer="sgd", learning_rate=1e-3,
                     max_epochs=1, batch_size=8, box_capacity=4,
                     data_parallel=-1,
                     checkpoint_dir=os.path.join(work, "ckpt"),
                     log_path=os.path.join(work, "logs", "out.log"))
trainer = Trainer(module, config, train, val, augment=False, run_name="mh")
out = trainer.fit()  # one full epoch: train + sharded eval + checkpoint save
print("RESULT " + json.dumps({
    "pid": pid,
    "train_loss": float(out["train"]["loss"]),
    "val_loss": float(out["val"]["loss"]),
    "val_recall": float(out["val"]["recall"]),
    "step": int(trainer.state.step),
}))
"""


_DEVICE_DATA_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

coord, pid, root, work = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)

import numpy as np
import jax.numpy as jnp
from fdtpu.data import BatchLoader, WIDERFaceDataSource, load_targets
from fdtpu.models import PoolResnet
from fdtpu.train import Trainer
from fdtpu.utils.config import TrainConfig

targets = load_targets(root, "train", max_faces=3)

def make_trainer(tag, device_data):
    src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4,
                              error_log=None)
    # shuffle off: the streamed feed and the per-process staged resident
    # epochs then have identical global batch composition
    train = BatchLoader(src, batch_size=8, shuffle=False, drop_last=True,
                        process_shard=(pid, 2))
    val = BatchLoader(src, batch_size=8, process_shard=(pid, 2))
    module = PoolResnet(filters=8, input_shape=(160, 160), num_patches=10,
                        num_residual_blocks=2, dtype=jnp.float32,
                        dropout=0.0, head_dropout=0.0)
    config = TrainConfig(use_sam=False, optimizer="sgd", learning_rate=1e-3,
                         max_epochs=2, batch_size=8, box_capacity=4,
                         data_parallel=-1, device_data=device_data,
                         visualize_first_batch=False,
                         checkpoint_dir=os.path.join(work, f"ckpt_{tag}"),
                         log_path=os.path.join(work, "logs", f"{tag}.log"))
    return Trainer(module, config, train, val, augment=False, run_name=tag)

t_stream = make_trainer("stream", False)
out_stream = t_stream.fit()
t_dev = make_trainer("dev", True)
out_dev = t_dev.fit()

# per-process device_data must reproduce streamed-multihost numerics
np.testing.assert_allclose(out_stream["train"]["loss"],
                           out_dev["train"]["loss"], rtol=1e-4)
for k in ("loss", "recall", "precision", "iou"):
    np.testing.assert_allclose(out_stream["val"][k], out_dev["val"][k],
                               rtol=1e-3, atol=1e-6, err_msg=k)
for a, b in zip(
    jax.tree_util.tree_leaves(jax.device_get(t_stream.state.params)),
    jax.tree_util.tree_leaves(jax.device_get(t_dev.state.params)),
):
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-6)
print("RESULT " + json.dumps({
    "pid": pid,
    "train_loss": float(out_dev["train"]["loss"]),
    "val_loss": float(out_dev["val"]["loss"]),
    "step": int(t_dev.state.step),
}))
"""


def test_two_process_device_data_matches_streamed(tmp_path):
    """Round-3 VERDICT #7: per-process ``device_data`` under multihost —
    each process stages only its local shard
    (``make_array_from_process_local_data``) and the resident shard_map
    epochs run globally; numerics must match the streamed multihost feed
    (asserted inside each worker), with replicated losses agreeing across
    processes."""
    from fdtpu.data import make_synthetic_widerface

    root = make_synthetic_widerface(tmp_path / "wider", num_images=16,
                                    max_faces=2)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "dd_worker.py"
    script.write_text(_DEVICE_DATA_WORKER)
    work = tmp_path / "work"
    work.mkdir()

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parent.parent)
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(root),
             str(work)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-5000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        rec = json.loads(line[len("RESULT "):])
        results[rec["pid"]] = rec
    for k in ("train_loss", "val_loss"):
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=1e-6,
                                   err_msg=k)
    assert results[0]["step"] == results[1]["step"] == 4  # 2 epochs x 2 steps


def test_two_process_trainer_fit(tmp_path):
    """Round-2 VERDICT item 6: a FULL Trainer.fit epoch (train + sharded
    eval + per-epoch checkpoint) across two jax.distributed processes —
    replicated losses agree, the Orbax save is a collective that lands one
    checkpoint, and log/TB artifacts are written by process 0 only."""
    from fdtpu.data import make_synthetic_widerface

    root = make_synthetic_widerface(tmp_path / "wider", num_images=16,
                                    max_faces=2)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "fit_worker.py"
    script.write_text(_FIT_WORKER)
    work = tmp_path / "work"
    work.mkdir()

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parent.parent)
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(root),
             str(work)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-5000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        rec = json.loads(line[len("RESULT "):])
        results[rec["pid"]] = rec
    # replicated numerics agree across processes
    for k in ("train_loss", "val_loss", "val_recall"):
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=1e-6,
                                   err_msg=k)
    assert results[0]["step"] == results[1]["step"] == 2  # 16 imgs / b8
    # exactly one checkpoint, written collectively
    ckpts = sorted((work / "ckpt" / "mh").glob("step_*"))
    assert len(ckpts) == 1, ckpts
    # log artifacts: process 0 only => exactly one writer => 2 jsonl lines
    jsonl = (work / "logs" / "out.jsonl").read_text().strip().splitlines()
    assert len(jsonl) == 2, jsonl  # one training + one validation record
    assert (work / "logs" / "tb").exists()
