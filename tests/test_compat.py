"""Checkpoint-import parity: load the reference's official TorchScript
checkpoints (``/root/reference/saved_models/official/*``) into fdtpu models
and compare raw forward maps against the original torch graphs on the same
input. This is the BASELINE.json "checkpoint compatibility" gate."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

OFFICIAL = Path("/root/reference/saved_models/official")

pytestmark = pytest.mark.skipif(
    not OFFICIAL.exists(), reason="reference checkpoints not mounted"
)


def _torch_forward(path, x_nchw):
    from fdtpu.compat.torch_import import _register_stub_ops

    _register_stub_ops()
    mod = torch.jit.load(str(path), map_location="cpu")
    mod.eval()
    with torch.no_grad():
        return mod(torch.tensor(x_nchw)).numpy()


@pytest.mark.parametrize(
    "name,filters",
    [("medium_model_10x10_480.pth", 64), ("small_model_10x10_480.pth", 32)],
)
def test_poolresnet_official_parity(name, filters, rng):
    from fdtpu.compat import load_torchscript_weights
    from fdtpu.models import PoolResnet

    path = OFFICIAL / "PoolResnet" / name
    module = PoolResnet(
        filters=filters, input_shape=(480, 480), num_patches=10,
        num_residual_blocks=10, dtype=jnp.float32,
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3)), train=False
    )
    variables = load_torchscript_weights(str(path), module, variables)

    x = rng.uniform(0, 1, size=(1, 3, 480, 480)).astype(np.float32)
    want = _torch_forward(path, x)  # (1, 5, 10, 10)
    got = module.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    # fdtpu layout (B, H, W, 5) -> torch (B, 5, H, W)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_resnet_official_parity(rng):
    from fdtpu.compat import load_torchscript_weights
    from fdtpu.models import Resnet

    path = OFFICIAL / "Resnet" / "medium_model_15x15_480.pth"
    module = Resnet(
        filters=64, input_shape=(480, 480), num_patches=15,
        num_residual_blocks=10, dtype=jnp.float32,
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3)), train=False
    )
    variables = load_torchscript_weights(str(path), module, variables)

    x = rng.uniform(0, 1, size=(1, 3, 480, 480)).astype(np.float32)
    want = _torch_forward(path, x)
    got = np.asarray(
        module.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_mobilenetv3_official_parity(rng):
    from fdtpu.compat import load_torchscript_weights
    from fdtpu.models import MobileNetV3Backbone

    path = OFFICIAL / "MobilenetV3Backbone" / "medium_model_15x15_480.pth"
    module = MobileNetV3Backbone(
        input_shape=(480, 480), num_patches=15, dtype=jnp.float32
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3)), train=False
    )
    variables = load_torchscript_weights(str(path), module, variables)

    x = rng.uniform(0, 1, size=(1, 3, 480, 480)).astype(np.float32)
    want = _torch_forward(path, x)
    got = np.asarray(
        module.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_reference_layout_decode_roundtrip(rng):
    """An imported model wrapped in ReferenceLayoutGrid + fdtpu decode must
    reproduce the reference's box semantics: fdtpu-decode(transpose(fm)) is
    the reference decode (utils.py:118-126 treats dim1 as x)."""
    from fdtpu.compat.torch_import import ReferenceLayoutGrid
    from fdtpu.core import decode_filter_nms
    from fdtpu.models import PoolResnet

    module = PoolResnet(
        filters=8, input_shape=(480, 480), num_patches=10,
        num_residual_blocks=1, dtype=jnp.float32,
    )
    wrapped = ReferenceLayoutGrid(module)
    variables = wrapped.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3)), train=False
    )
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 480, 480, 3)), jnp.float32)
    raw = module.apply({"params": variables["params"]["inner"]}, x, train=False)
    out = wrapped.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(raw).swapaxes(1, 2))
    assert wrapped.grid_size() == module.grid_size()


def test_prune_l1_structured(rng):
    """Pruning shrinks channels 20% (torch_pruning amount parity,
    pruner.py:42) and the pruned model still runs."""
    from fdtpu.compat import prune_l1_structured
    from fdtpu.models import PoolResnet

    module = PoolResnet(
        filters=20, input_shape=(160, 160), num_patches=10,
        num_residual_blocks=2, dtype=jnp.float32,
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)), train=False
    )
    pruned_module, pruned_vars = prune_l1_structured(module, variables, 0.2)
    assert pruned_module.filters == 16
    kern = pruned_vars["params"]["Conv_0"]["kernel"]
    assert kern.shape[-1] == 16
    out = pruned_module.apply(
        pruned_vars, jnp.zeros((1, 160, 160, 3)), train=False
    )
    assert out.shape[-1] == 5
    n_old = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    n_new = sum(x.size for x in jax.tree_util.tree_leaves(pruned_vars["params"]))
    assert n_new < 0.75 * n_old


def test_export_roundtrip(tmp_path, rng):
    """StableHLO export -> deserialize -> call reproduces the in-process
    predict outputs (the TorchScript/ONNX deployment-parity equivalent)."""
    from fdtpu.export import export_predict, load_exported, make_predict_fn
    from fdtpu.models import PoolResnet

    module = PoolResnet(
        filters=8, input_shape=(160, 160), num_patches=10,
        num_residual_blocks=2, dtype=jnp.float32,
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)), train=False
    )
    path = export_predict(
        module, variables, tmp_path / "m.stablehlo", batch_size=2,
        probability_threshold=0.4, iou_threshold=0.5,
    )
    assert path.stat().st_size > 1000
    predict = load_exported(path)
    x = jnp.asarray(rng.uniform(0, 255, size=(2, 160, 160, 3)), jnp.float32)
    boxes, mask = predict(x)
    want_boxes, want_mask = make_predict_fn(module, variables, 0.4, 0.5)(x)
    np.testing.assert_allclose(
        np.asarray(boxes), np.asarray(want_boxes), atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(want_mask))


def _reference_decode_numpy(fm, s, width, height, prob_thr, iou_thr):
    """The reference's decode math re-derived in numpy from a reference-layout
    ``(5, S, S)`` map (dim1 = x-cell): scale_batch_bbx_xywh + threshold +
    round + greedy NMS (``utils.py:111-170``). Returns ``(K, 5)``
    ``[score, x, y, w, h]``."""
    patch = width / s
    cand = []
    for i in range(s):
        for j in range(s):
            conf = fm[0, i, j]
            if conf > prob_thr:
                bx = fm[1, i, j] * patch + i * patch
                by = fm[2, i, j] * patch + j * patch
                bw = fm[3, i, j] * width
                bh = fm[4, i, j] * height
                cand.append([conf, bx, by, bw, bh])
    if not cand:
        return np.zeros((0, 5), np.float32)
    cand = np.asarray(cand, np.float32)
    xyxy = np.round(
        np.stack(
            [cand[:, 1], cand[:, 2], cand[:, 1] + cand[:, 3],
             cand[:, 2] + cand[:, 4]], axis=1,
        )
    )
    order = np.argsort(-cand[:, 0], kind="stable")
    keep, suppressed = [], np.zeros(len(cand), bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        a = xyxy[idx]
        for jdx in order:
            if jdx == idx or suppressed[jdx]:
                continue
            b = xyxy[jdx]
            iw = max(min(a[2], b[2]) - max(a[0], b[0]), 0)
            ih = max(min(a[3], b[3]) - max(a[1], b[1]), 0)
            inter = iw * ih
            ua = ((a[2] - a[0]) * (a[3] - a[1])
                  + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            if ua > 0 and inter / ua > iou_thr:
                suppressed[jdx] = True
    return np.stack(
        [cand[keep, 0], xyxy[keep, 0], xyxy[keep, 1],
         xyxy[keep, 2] - xyxy[keep, 0], xyxy[keep, 3] - xyxy[keep, 1]],
        axis=1,
    )


def test_single_image_box_parity_official_checkpoint(rng):
    """BASELINE.json gate: single-image box coords & scores from the official
    checkpoint must match the PyTorch outputs within fp tolerance.

    The torch graph's own predict branch can't run here (its torchvision nms
    is stubbed), so the oracle is: torch forward -> the reference's decode
    math re-derived in numpy (``_reference_decode_numpy``) — compared against
    fdtpu's full fused path on the imported weights via
    ReferenceLayoutGrid."""
    from fdtpu.compat import load_reference_detector
    from fdtpu.core.nms import decode_filter_nms
    from fdtpu.models import PoolResnet

    path = OFFICIAL / "PoolResnet" / "medium_model_10x10_480.pth"
    img_path = Path("/root/reference/imgs/test_imgs/3.jpg")
    if not img_path.exists():
        pytest.skip("reference test images not mounted")
    from PIL import Image

    img = np.asarray(
        Image.open(img_path).convert("RGB").resize((480, 480), Image.BILINEAR),
        np.float32,
    )
    x = img[None] / 255.0

    # torch forward -> (5, 10, 10) reference-layout map
    fm = _torch_forward(path, x.transpose(0, 3, 1, 2))[0]
    prob_thr, iou_thr = 0.7, 0.01
    want = _reference_decode_numpy(fm, 10, 480, 480, prob_thr, iou_thr)

    # fdtpu path: import + layout adapter + fused decode/filter/NMS
    module = PoolResnet(
        filters=64, input_shape=(480, 480), num_patches=10,
        num_residual_blocks=10, dtype=jnp.float32,
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3)), train=False
    )
    wrapped, wvars = load_reference_detector(str(path), module, variables)
    out = wrapped.apply(wvars, jnp.asarray(x), train=False)
    boxes, mask = decode_filter_nms(
        out[0], 10, (480, 480), prob_thr, iou_thr, capacity=16
    )
    got = np.asarray(boxes)[np.asarray(mask)]

    assert got.shape == want.shape and got.shape[0] >= 1
    np.testing.assert_allclose(got[:, 0], want[:, 0], rtol=1e-4)  # scores
    np.testing.assert_allclose(got[:, 1:], want[:, 1:], atol=1.0)  # coords


@pytest.mark.parametrize("arch", ["poolresnet", "mobilenetv3"])
def test_all_test_images_box_set_parity(arch):
    """Round-3 VERDICT #6 — full-set mAP-parity proxy: the official
    checkpoints over ALL reference test images (the only real photos in the
    container, ``single_image_inference.py:87-91``), fdtpu's fused decode vs
    the torch-forward + reference-decode oracle. Per image, the box SETS
    must match: same count, position-sorted coords within 1px (the decode
    rounds to ints), scores within forward-parity tolerance. The closest
    real-data stand-in for the blocked WIDERFace-val mAP gate."""
    import torch as _torch

    from fdtpu.compat import load_reference_detector
    from fdtpu.compat.torch_import import _register_stub_ops
    from fdtpu.core.nms import decode_filter_nms
    from fdtpu.models import MobileNetV3Backbone, PoolResnet

    img_dir = Path("/root/reference/imgs/test_imgs")
    if not img_dir.exists():
        pytest.skip("reference test images not mounted")
    from PIL import Image

    if arch == "poolresnet":
        path = OFFICIAL / "PoolResnet" / "medium_model_10x10_480.pth"
        module = PoolResnet(
            filters=64, input_shape=(480, 480), num_patches=10,
            num_residual_blocks=10, dtype=jnp.float32,
        )
        s, score_rtol = 10, 1e-4
    else:
        path = OFFICIAL / "MobilenetV3Backbone" / "medium_model_15x15_480.pth"
        module = MobileNetV3Backbone(
            input_shape=(480, 480), num_patches=15, dtype=jnp.float32
        )
        s, score_rtol = 15, 5e-3  # forward parity is 5e-4 on raw maps

    paths = sorted(img_dir.glob("*.jpg"))
    assert len(paths) >= 20, paths
    imgs = np.stack([
        np.asarray(
            Image.open(p).convert("RGB").resize((480, 480), Image.BILINEAR),
            np.float32,
        ) for p in paths
    ]) / 255.0

    _register_stub_ops()
    tmod = _torch.jit.load(str(path), map_location="cpu")
    tmod.eval()
    with _torch.no_grad():
        fms = tmod(_torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()

    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 480, 480, 3)), train=False
    )
    wrapped, wvars = load_reference_detector(str(path), module, variables)
    prob_thr, iou_thr = 0.5, 0.01
    out = jax.jit(
        lambda x: wrapped.apply(wvars, x, train=False)
    )(jnp.asarray(imgs))
    # capacity = all grid cells: the XLA decode truncates to top-capacity
    # BEFORE suppression (static-shape compromise, core/nms.py), so any
    # smaller capacity legitimately diverges from the scan-everything oracle
    # on crowd photos where >capacity cells clear the threshold
    boxes, mask = jax.vmap(
        lambda o: decode_filter_nms(o, s, (480, 480), prob_thr, iou_thr,
                                    capacity=s * s)
    )(out)
    boxes, mask = np.asarray(boxes), np.asarray(mask)

    order = lambda a: a[np.lexsort((a[:, 1], a[:, 2]))]
    total, max_coord_drift, max_score_drift = 0, 0.0, 0.0
    for i, p in enumerate(paths):
        want = order(_reference_decode_numpy(
            fms[i], s, 480, 480, prob_thr, iou_thr))
        got = order(boxes[i][mask[i]])
        assert len(got) == len(want), (p.name, len(got), len(want))
        if len(got):
            np.testing.assert_allclose(got[:, 1:], want[:, 1:], atol=1.0,
                                        err_msg=p.name)
            np.testing.assert_allclose(got[:, 0], want[:, 0],
                                        rtol=score_rtol, err_msg=p.name)
            max_coord_drift = max(
                max_coord_drift, float(np.abs(got[:, 1:] - want[:, 1:]).max()))
            max_score_drift = max(
                max_score_drift, float(np.abs(got[:, 0] - want[:, 0]).max()))
        total += len(got)
    assert total >= len(paths), "trained checkpoints should detect faces"
    print(f"\n{arch}: {len(paths)} images, {total} boxes, "
          f"max coord drift {max_coord_drift:.3g}px, "
          f"max score drift {max_score_drift:.2e}")


def test_pretrained_backbone_init():
    """timm ``pretrained=True`` analogue (``MobilenetV3Backbone.py:33-39``):
    backbone weights come from the official checkpoint, the detection head
    stays freshly initialized — at a DIFFERENT resolution than the
    checkpoint's (backbone convs are resolution-independent)."""
    from fdtpu.compat import pretrained_backbone_variables
    from fdtpu.models import MobileNetV3Backbone

    path = OFFICIAL / "MobilenetV3Backbone" / "medium_model_15x15_480.pth"
    module = MobileNetV3Backbone(
        input_shape=(160, 160), num_patches=5, dtype=jnp.float32
    )
    fresh = module.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 160, 160, 3)), train=False
    )
    v = pretrained_backbone_variables(str(path), module, fresh)

    # head is the fresh one
    np.testing.assert_array_equal(
        np.asarray(v["params"]["head"]["kernel"]),
        np.asarray(fresh["params"]["head"]["kernel"]),
    )
    # backbone differs from fresh (imported) and matches a direct import
    from fdtpu.compat import load_torchscript_weights

    imported = load_torchscript_weights(str(path), module, fresh)
    np.testing.assert_array_equal(
        np.asarray(v["params"]["conv_stem"]["kernel"]),
        np.asarray(imported["params"]["conv_stem"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(v["params"]["conv_stem"]["kernel"]),
        np.asarray(fresh["params"]["conv_stem"]["kernel"]),
    )
    # the assembled variables run at the new resolution
    out = module.apply(v, jnp.zeros((1, 160, 160, 3)), train=False)
    assert out.shape == (1, module.grid_size(), module.grid_size(), 5)
