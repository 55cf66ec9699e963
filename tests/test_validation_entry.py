"""run_validation_epoch.py entry plumbing (CLI-level smoke, subprocess).

The library pieces (eval step, SSD decode, AP, the official evaluator) have
their own unit tests; these pin the ENTRY wiring — config selection per
model family, SSD pipeline constants, and the official-protocol branch —
by driving the script the way a user does. Reference counterpart:
``/root/reference/run_validation_epoch.py`` (YOLO-family only; the SSD
branch is an fdtpu extension, PARITY.md §2.1).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _run(args, cwd, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parent.parent)
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    script = Path(__file__).resolve().parent.parent / "run_validation_epoch.py"
    proc = subprocess.run(
        [sys.executable, str(script), *args, "--platform", "cpu"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-3000:]
    return proc.stdout


@pytest.fixture(scope="module")
def val_root(tmp_path_factory):
    from fdtpu.data import make_synthetic_widerface

    root = tmp_path_factory.mktemp("valdata")
    make_synthetic_widerface(root / "data", num_images=4, split="val",
                             max_faces=2)
    return root


def test_ssd_validation_entry(val_root):
    out = _run(
        ["--data-dir", "data", "--model", "ssd", "--input", "96",
         "--filters", "4", "--batch-size", "2", "--prob-threshold", "0.3",
         "--iou-threshold", "0.5", "--with-ap"],
        cwd=val_root,
    )
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    metrics = eval(lines[-2])  # the script prints python dicts
    ap = eval(lines[-1])
    assert {"iou", "loss", "precision", "recall", "f1"} <= set(metrics)
    assert np.isfinite(metrics["loss"])
    assert "AP@0.5" in ap and 0.0 <= ap["AP@0.5"] <= 1.0


def test_official_protocol_entry(val_root):
    # fabricate the official .mat ground truth over the synthetic val split
    from scipy.io import savemat

    from fdtpu.data import load_targets

    targets = load_targets(val_root / "data", "val", max_faces=10**9)

    def cell(lst):
        a = np.empty((len(lst), 1), dtype=object)
        for i, v in enumerate(lst):
            a[i, 0] = v
        return a

    files, bbxs, keeps = [], [], []
    for t in targets:
        gt = np.asarray(t["bbx"], np.float64)[:, 1:5]
        files.append(np.array([t["img_path"].stem]))
        bbxs.append(gt)
        keeps.append(np.arange(1, gt.shape[0] + 1).reshape(-1, 1))
    event = targets[0]["img_path"].parent.name
    gt_dir = val_root / "gt"
    gt_dir.mkdir(exist_ok=True)
    savemat(gt_dir / "wider_face_val.mat", {
        "event_list": cell([np.array([event])]),
        "file_list": cell([cell(files)]),
        "face_bbx_list": cell([cell(bbxs)]),
    })
    for s in ("easy", "medium", "hard"):
        savemat(gt_dir / f"wider_{s}_val.mat", {"gt_list": cell([cell(keeps)])})

    out = _run(
        ["--data-dir", "data", "--model", "poolresnet", "--input", "96",
         "--patches", "6", "--filters", "4", "--blocks", "1",
         "--batch-size", "2", "--prob-threshold", "0.05",
         "--widerface-gt-dir", "gt", "--widerface-pred-dir", "preds"],
        cwd=val_root,
    )
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    aps = eval(lines[-1])
    assert set(aps) == {"mAP_easy", "mAP_medium", "mAP_hard"}
    assert all(0.0 <= v <= 1.0 for v in aps.values())
    # the submission dump landed in the official layout
    txts = list((val_root / "preds").rglob("*.txt"))
    assert len(txts) == len(targets)
    first = txts[0].read_text().splitlines()
    assert first[0] == txts[0].stem and int(first[1]) >= 0
