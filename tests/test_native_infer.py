"""Native .fdn engine tests: the JAX-free serving path must reproduce the
JAX predict program (forward + decode + filter + NMS) on every grid model,
including reference-layout checkpoint wraps, and the standalone CLI must
serve a JPEG end to end.

Reference counterparts: lite-interpreter / onnxruntime serving
(``/root/reference/demo_scripts/convert_checkpoint_to_scripted_model.py:51-54``,
``demo_model_onnx.py:26-31``) — validated there only by
``onnx.checker.check_model``; here by numeric parity against the JAX oracle.
"""

from __future__ import annotations

import json
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.core.nms import compact_boxes, decode_filter_nms
from fdtpu.export import export_native
from fdtpu.native.infer import NativeDetector, build_cli, native_infer_available

pytestmark = pytest.mark.skipif(
    not native_infer_available(), reason="no C++ toolchain for native engine"
)

# capacity must exceed the candidate count (grid^2): under saturation the
# XLA oracle truncates to top-capacity BEFORE suppression while the native
# engine (like the Pallas kernel) scans all candidates — the documented
# legitimate divergence (fdtpu/kernels/nms_pallas.py module docstring).
PROB, IOU, CAP = 0.45, 0.3, 64


def _boosted_init(module, scale, bias, key=0):
    """Init + scale the head kernel so untrained outputs produce detections
    with WELL-SEPARATED scores: saturating the bias instead would make every
    confidence ~0.999, and near-tied scores let f32 summation-order noise
    between the two implementations legitimately flip the NMS pick order.
    Per-arch (scale, bias) values were probed to give a handful of
    detections with >= 0.003 score gaps."""
    h, w = module.input_shape
    v = module.init(jax.random.PRNGKey(key), jnp.zeros((1, h, w, 3)), train=False)
    k = v["params"]["Conv_1"]["kernel"]
    v["params"]["Conv_1"]["kernel"] = (
        k.at[..., 0].multiply(scale).at[..., 3:5].multiply(scale / 3.0)
    )
    b = v["params"]["Conv_1"]["bias"]
    v["params"]["Conv_1"]["bias"] = (
        b.at[0].add(bias).at[3].add(0.3).at[4].add(0.3)
    )
    return v


def _small_poolresnet(filters=32):
    from fdtpu.models import PoolResnet

    return PoolResnet(filters=filters, input_shape=(160, 160), num_patches=3,
                      num_residual_blocks=2, output_kernel_size=3,
                      dtype=jnp.float32)


def _assert_parity(module, variables, fdn_path, images):
    det = NativeDetector(fdn_path)
    nb, nm = det.predict(images)
    out = module.apply(variables, jnp.asarray(images) / 255.0, train=False)
    s = module.grid_size()
    wh = (module.input_shape[1], module.input_shape[0])
    jb, jm = jax.vmap(
        lambda o: decode_filter_nms(o, s, wh, PROB, IOU, CAP)
    )(out)
    total = 0
    for i in range(images.shape[0]):
        cn = nb[i][nm[i]]
        cj = compact_boxes(np.asarray(jb[i]), np.asarray(jm[i]))
        assert len(cn) == len(cj), (i, cn, cj)
        if len(cn):
            np.testing.assert_allclose(cn, cj, atol=2e-3, rtol=1e-4)
        total += len(cn)
    return total


def _images(n=2, size=96, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (n, size, size, 3)).astype(np.float32)


@pytest.mark.parametrize("arch", ["poolresnet", "resnet", "separable"])
def test_native_matches_jax(arch, tmp_path):
    from fdtpu.models import Resnet, SeparableCNN

    if arch == "poolresnet":
        m, scale, bias = _small_poolresnet(), 5.0, 0.3
    elif arch == "resnet":
        m = Resnet(filters=32, input_shape=(96, 96), num_patches=6,
                   num_residual_blocks=2, dtype=jnp.float32)
        scale, bias = 5.0, 0.3
    else:
        m = SeparableCNN(filters=32, input_shape=(128, 128), num_patches=8,
                         num_residual_blocks=2, dtype=jnp.float32)
        scale, bias = 2.0, 0.0
    v = _boosted_init(m, scale, bias)
    p = export_native(m, v, tmp_path / f"{arch}.fdn",
                      probability_threshold=PROB, iou_threshold=IOU,
                      capacity=CAP)
    total = _assert_parity(m, v, p, _images(size=m.input_shape[0]))
    assert total > 0, "boosted init should produce detections"


def test_native_reference_layout_wrap(tmp_path):
    """ReferenceLayoutGrid-wrapped modules (official-checkpoint imports) get
    an OP_TRANSPOSE_GRID in the program; boxes match the wrapped oracle."""
    from fdtpu.compat.torch_import import ReferenceLayoutGrid

    inner = _small_poolresnet(filters=16)
    v = _boosted_init(inner, 5.0, 0.3, key=3)
    wrapped = ReferenceLayoutGrid(inner)
    wvars = {"params": {"inner": v["params"]}}
    p = export_native(wrapped, wvars, tmp_path / "wrapped.fdn",
                      probability_threshold=PROB, iou_threshold=IOU,
                      capacity=CAP)
    imgs = _images(size=160, seed=3)
    det = NativeDetector(p)
    nb, nm = det.predict(imgs)
    out = wrapped.apply(wvars, jnp.asarray(imgs) / 255.0, train=False)
    jb, jm = jax.vmap(
        lambda o: decode_filter_nms(o, inner.grid_size(), (160, 160), PROB,
                                    IOU, CAP)
    )(out)
    found = 0
    for i in range(imgs.shape[0]):
        cn = nb[i][nm[i]]
        cj = compact_boxes(np.asarray(jb[i]), np.asarray(jm[i]))
        assert len(cn) == len(cj)
        if len(cn):
            np.testing.assert_allclose(cn, cj, atol=2e-3, rtol=1e-4)
        found += len(cn)
    assert found > 0


def test_native_rejects_ssd(tmp_path):
    from fdtpu.models.ssd import SSD

    m = SSD(filters=4, input_shape=(64, 64), patch_sizes=(8, 4),
            dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="StableHLO"):
        export_native(m, v, tmp_path / "ssd.fdn")


def test_native_cli_serves_jpeg(tmp_path):
    """fdn_serve: JPEG in -> JSON boxes out, zero Python in the process."""
    from PIL import Image

    cli = build_cli()
    if cli is None:
        pytest.skip("CLI build unavailable (libjpeg?)")
    m = _small_poolresnet(filters=16)
    v = _boosted_init(m, 5.0, 0.3, key=1)
    p = export_native(m, v, tmp_path / "cli.fdn", probability_threshold=PROB,
                      iou_threshold=IOU, capacity=CAP)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (160, 160, 3)).astype(np.uint8)
    jpg = tmp_path / "x.jpg"
    Image.fromarray(img).save(jpg, quality=95)
    out = subprocess.run(
        [str(cli), str(p), str(jpg)], capture_output=True, text=True,
        timeout=120, check=True,
    )
    rec = json.loads(out.stdout.strip())
    assert rec["file"] == str(jpg)
    assert isinstance(rec["boxes"], list)
    for row in rec["boxes"]:
        assert len(row) == 5 and row[0] > PROB
