"""Pallas fused decode+filter+NMS vs the pure-XLA core path (itself validated
against a torchvision-semantics oracle in test_nms.py). Runs in interpreter
mode on the CPU backend; the same kernel compiles on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdtpu.core import decode_filter_nms, encode_grid_targets, pad_boxes
from fdtpu.core.grid import decode_grid
from fdtpu.core.nms import nms, ssd_decode_filter_nms
from fdtpu.core.priors import encode_ssd_targets
from fdtpu.kernels import (
    grid_decode_tables,
    pallas_decode_filter_nms,
    ssd_decode_tables,
)

S = 15
IMG = (480, 480)


def _random_fm(rng, hot=6):
    fm = rng.uniform(0, 0.45, size=(S, S, 5)).astype(np.float32)
    for _ in range(hot):
        j, i = rng.integers(0, S, size=2)
        fm[j, i] = [rng.uniform(0.5, 1.0), *rng.uniform(0.05, 0.95, size=4)]
    return fm


def test_grid_kernel_matches_core(rng):
    tables = grid_decode_tables(S, IMG)
    for trial in range(5):
        fm = _random_fm(rng)
        want_boxes, want_mask = decode_filter_nms(
            jnp.asarray(fm), S, IMG, 0.5, 0.4, capacity=32
        )
        got_boxes, got_mask = pallas_decode_filter_nms(
            jnp.asarray(fm).reshape(S * S, 5), tables, 0.5, 0.4, capacity=32
        )
        want = np.asarray(want_boxes)[np.asarray(want_mask)]
        got = np.asarray(got_boxes)[np.asarray(got_mask)]
        assert got.shape == want.shape
        # kernel emits in score order, like the core path
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_grid_kernel_empty(rng):
    fm = np.zeros((S, S, 5), dtype=np.float32)
    boxes, mask = pallas_decode_filter_nms(
        jnp.asarray(fm).reshape(S * S, 5), grid_decode_tables(S, IMG), 0.5, 0.5
    )
    assert not bool(np.asarray(mask).any())


def test_grid_kernel_tie_break():
    fm = np.zeros((S, S, 5), dtype=np.float32)
    fm[0, 0] = [0.9, 0.1, 0.1, 0.05, 0.05]
    fm[0, 1] = [0.9, 0.1, 0.1, 0.05, 0.05]  # same score, non-overlapping
    boxes, mask = pallas_decode_filter_nms(
        jnp.asarray(fm).reshape(S * S, 5), grid_decode_tables(S, IMG), 0.5, 0.5,
        capacity=8,
    )
    got = np.asarray(boxes)[np.asarray(mask)]
    assert got.shape[0] == 2
    # lowest flat index first: cell (0,0) is x=..., the x of col 0 < col 1
    assert got[0, 1] < got[1, 1]


def test_ssd_kernel_matches_core(rng):
    ps = (10, 5)
    img = (320, 320)
    n = sum(p * p for p in ps)
    # random encoded rows with a few confident ones
    enc = rng.uniform(0, 0.4, size=(n, 5)).astype(np.float32)
    hot = rng.choice(n, size=8, replace=False)
    enc[hot, 0] = rng.uniform(0.6, 1.0, size=8)
    want_boxes, want_mask = ssd_decode_filter_nms(
        jnp.asarray(enc), ps, img, 0.5, 0.4, capacity=16
    )
    got_boxes, got_mask = pallas_decode_filter_nms(
        jnp.asarray(enc), ssd_decode_tables(ps, img), 0.5, 0.4, capacity=16
    )
    want = np.asarray(want_boxes)[np.asarray(want_mask)]
    got = np.asarray(got_boxes)[np.asarray(got_mask)]
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_kernel_roundtrip_via_encode(rng):
    """encode -> pallas fused decode+NMS recovers the boxes (the reference's
    dataset_ssd.py:142-150 assert, on the kernel path)."""
    boxes = np.array(
        [[1.0, 96, 120, 90, 60], [1.0, 300, 330, 120, 100]], dtype=np.float32
    )
    padded, mask = pad_boxes(boxes, 4)
    fm = encode_grid_targets(jnp.asarray(padded), jnp.asarray(mask), S, IMG)
    out, keep = pallas_decode_filter_nms(
        fm.reshape(S * S, 5), grid_decode_tables(S, IMG), 0.5, 0.5, capacity=8
    )
    got = np.asarray(out)[np.asarray(keep)]
    assert got.shape[0] == 2
    np.testing.assert_allclose(
        np.sort(got[:, 1:], axis=0), np.sort(boxes[:, 1:], axis=0), atol=1.0
    )


def test_batched_kernel_matches_vmapped(rng):
    """One whole-batch kernel invocation == vmapped per-image kernel ==
    core XLA path."""
    from fdtpu.kernels import pallas_decode_filter_nms_batch

    tables = grid_decode_tables(S, IMG)
    fms = np.stack([_random_fm(rng) for _ in range(4)])
    vals = jnp.asarray(fms).reshape(4, S * S, 5)
    got_b, got_m = pallas_decode_filter_nms_batch(vals, tables, 0.5, 0.4, capacity=16)
    for i in range(4):
        want_b, want_m = decode_filter_nms(
            jnp.asarray(fms[i]), S, IMG, 0.5, 0.4, capacity=16
        )
        want = np.asarray(want_b)[np.asarray(want_m)]
        got = np.asarray(got_b[i])[np.asarray(got_m[i])]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_batch_tile_mosaic_alignment():
    """The batch tile must be a multiple of 8 (Mosaic sublane constraint)
    whenever it's smaller than the whole batch — interpret-mode tests can't
    catch a violation because Mosaic lowering only runs on real TPU. The
    b128/4864-prior case is the exact shape that crashed on TPU (tile 35)."""
    from fdtpu.kernels.nms_pallas import _VMEM_PLANE_BUDGET, _batch_tile

    assert _batch_tile(128, 4864) == 32  # the SSD b128 crash shape
    for bsz in (1, 8, 13, 24, 64, 128, 256):
        for n_pad in (128, 256, 4864, 8192, 65536):
            tb = _batch_tile(bsz, n_pad)
            assert tb == bsz or tb % 8 == 0, (bsz, n_pad, tb)
            assert tb >= min(bsz, 8) or tb == 8
            # tile respects the plane budget whenever the budget allows any
            # 8-row tile at all
            if 9 * n_pad * 4 * 8 <= _VMEM_PLANE_BUDGET:
                assert 9 * n_pad * 4 * tb <= max(
                    _VMEM_PLANE_BUDGET, 9 * n_pad * 4 * 8
                )


def test_batched_kernel_grid_tiling_ssd_scale(rng, monkeypatch):
    """SSD-scale prior count (4774 -> 4864 padded) with a batch that spans
    several VMEM tiles (and a padded remainder tile): the grid-blocked
    batched kernel must still match the per-image path exactly. The plane
    budget is shrunk so tiling (tile=8, padded remainder) really engages."""
    import fdtpu.kernels.nms_pallas as knms
    from fdtpu.kernels import pallas_decode_filter_nms_batch

    monkeypatch.setattr(knms, "_VMEM_PLANE_BUDGET", 9 * 5120 * 4 * 8)
    ps = (60, 30, 15, 7)
    n = sum(s * s for s in ps) + 265  # 4774 + filler -> exercises lane pad
    b = 13  # -> tiles of 8, b_pad=16: grid of 2 with 3 padded rows
    vals = rng.uniform(0, 0.45, size=(b, n, 5)).astype(np.float32)
    for i in range(b):
        for _ in range(5):
            j = rng.integers(0, n)
            vals[i, j] = [rng.uniform(0.5, 1.0), *rng.uniform(0.05, 0.6, size=4)]
    tables = ssd_decode_tables(ps, IMG)
    # pad tables to the filler length
    sx, ox, sy, oy, ww, hh = tables
    pad = n - sx.shape[0]
    tables = (
        np.pad(sx, (0, pad)), np.pad(ox, (0, pad)),
        np.pad(sy, (0, pad)), np.pad(oy, (0, pad)), ww, hh,
    )

    got_b, got_m = pallas_decode_filter_nms_batch(
        jnp.asarray(vals), tables, 0.5, 0.4, capacity=16
    )
    from fdtpu.kernels import pallas_decode_filter_nms

    for i in range(b):
        want_b, want_m = pallas_decode_filter_nms(
            jnp.asarray(vals[i]), tables, 0.5, 0.4, capacity=16
        )
        np.testing.assert_allclose(
            np.asarray(got_b[i])[np.asarray(got_m[i])],
            np.asarray(want_b)[np.asarray(want_m)],
            atol=1e-3, rtol=1e-5,
        )
