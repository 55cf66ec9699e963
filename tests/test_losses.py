"""Loss parity against the reference's own torch implementations.

The reference loss files depend only on ``torch`` (CPU build available here),
so we import them from /root/reference at test time as golden oracles — no
code is copied; we call the original functions and compare numerics.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from losses.YoloLoss import yolo_loss as yolo_loss_ref  # noqa: E402
from losses.SSDLoss import ssd_loss as ssd_loss_ref  # noqa: E402
from losses.SSDLoss import hard_negative_mining as hnm_ref  # noqa: E402

from fdtpu.losses import hard_negative_mining, ssd_loss, yolo_loss  # noqa: E402
from fdtpu.losses.yolo import yolo_loss_batch  # noqa: E402

S = 10


def _random_fms(rng, occupied_cells=4):
    """(pred, gt) in fdtpu (S, S, 5) layout; gt sparse like a real target."""
    pred = rng.uniform(0.01, 0.99, size=(S, S, 5)).astype(np.float32)
    gt = np.zeros((S, S, 5), dtype=np.float32)
    for _ in range(occupied_cells):
        j, i = rng.integers(0, S, size=2)
        gt[j, i] = [1.0, *rng.uniform(0.05, 0.95, size=4)]
    return pred, gt


def _to_ref_layout(fm):
    """fdtpu (S, S, 5) [y, x, c] -> reference (5, S, S) [c, x, y]."""
    return np.transpose(fm, (2, 1, 0))


def test_yolo_loss_matches_reference_with_compat_swap(rng):
    for _ in range(3):
        pred, gt = _random_fms(rng)
        want = yolo_loss_ref(
            torch.tensor(_to_ref_layout(pred)), torch.tensor(_to_ref_layout(gt))
        ).item()
        got = float(yolo_loss(jnp.asarray(pred), jnp.asarray(gt), compat_swap_xy=True))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_yolo_loss_fixed_pairing_differs_only_in_xy(rng):
    pred, gt = _random_fms(rng)
    # Swapping pred x/y channels converts fixed pairing into reference pairing.
    pred_sw = pred.copy()
    pred_sw[..., [1, 2]] = pred_sw[..., [2, 1]]
    a = float(yolo_loss(jnp.asarray(pred), jnp.asarray(gt)))
    b = float(yolo_loss(jnp.asarray(pred_sw), jnp.asarray(gt), compat_swap_xy=True))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_yolo_loss_zero_when_perfect():
    gt = np.zeros((S, S, 5), dtype=np.float32)
    gt[3, 4] = [1.0, 0.5, 0.5, 0.2, 0.3]
    assert float(yolo_loss(jnp.asarray(gt), jnp.asarray(gt))) == 0.0


def test_yolo_loss_batch_is_sum(rng):
    preds, gts = [], []
    total = 0.0
    for _ in range(3):
        p, g = _random_fms(rng)
        preds.append(p)
        gts.append(g)
        total += float(yolo_loss(jnp.asarray(p), jnp.asarray(g)))
    batched = float(yolo_loss_batch(jnp.asarray(np.stack(preds)), jnp.asarray(np.stack(gts))))
    np.testing.assert_allclose(batched, total, rtol=1e-5)


def _random_ssd_batch(rng, b=2, n=200, pos_per_image=5):
    conf = rng.uniform(0.02, 0.98, size=(b, n)).astype(np.float32)
    pred_locs = rng.uniform(0, 1, size=(b, n, 4)).astype(np.float32)
    labels = np.zeros((b, n), dtype=np.float32)
    gt_locs = np.zeros((b, n, 4), dtype=np.float32)
    for bi in range(b):
        idx = rng.choice(n, size=pos_per_image, replace=False)
        labels[bi, idx] = 1.0 - 0.001 * 60  # docked confidence, rounds to 1
        gt_locs[bi, idx] = rng.uniform(0, 1, size=(pos_per_image, 4))
    return conf, pred_locs, labels, gt_locs


def test_hard_negative_mining_matches_reference(rng):
    conf, _, labels, _ = _random_ssd_batch(rng)
    loss = -np.log(conf)
    want = hnm_ref(torch.tensor(loss.copy()), torch.tensor(labels), 10).numpy()
    got = np.asarray(hard_negative_mining(jnp.asarray(loss), jnp.asarray(labels), 10))
    np.testing.assert_array_equal(got, want)


def test_ssd_loss_matches_reference(rng):
    for ratio in (3, 10):
        conf, pred_locs, labels, gt_locs = _random_ssd_batch(rng)
        want = ssd_loss_ref(
            torch.tensor(conf),
            torch.tensor(pred_locs),
            torch.tensor(labels),
            torch.tensor(gt_locs),
            ratio,
        ).item()
        got = float(
            ssd_loss(
                jnp.asarray(conf),
                jnp.asarray(pred_locs),
                jnp.asarray(labels),
                jnp.asarray(gt_locs),
                ratio,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4)


def test_ssd_loss_no_positives_is_finite(rng):
    conf = rng.uniform(0.1, 0.9, size=(2, 50)).astype(np.float32)
    zeros = np.zeros((2, 50), dtype=np.float32)
    out = float(
        ssd_loss(
            jnp.asarray(conf),
            jnp.zeros((2, 50, 4)),
            jnp.asarray(zeros),
            jnp.zeros((2, 50, 4)),
            10,
        )
    )
    assert np.isfinite(out)


def test_ssd_loss2_matches_reference(rng):
    from losses.SSDLoss import ssd_loss2 as ssd_loss2_ref

    from fdtpu.losses.ssd import ssd_loss2

    pred = rng.uniform(0.01, 0.99, size=(200, 5)).astype(np.float32)
    gt = np.zeros((200, 5), dtype=np.float32)
    idx = rng.choice(200, size=6, replace=False)
    gt[idx, 0] = 0.94
    gt[idx, 1:] = rng.uniform(0.05, 0.95, size=(6, 4))
    want = ssd_loss2_ref(torch.tensor(pred), torch.tensor(gt)).item()
    got = float(ssd_loss2(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
