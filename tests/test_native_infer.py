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


def test_native_ssd_matches_jax(tmp_path):
    """SSD .fdn artifacts (multi-scale heads + prior decode, v2 format)
    reproduce the JAX oracle (``ssd_output_filter_nms``) box for box."""
    from fdtpu.core.nms import ssd_output_filter_nms
    from fdtpu.models.ssd import SSD

    m = SSD(filters=4, input_shape=(64, 64), patch_sizes=(8, 4, 2, 1),
            dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    # spread the score column so NMS pick order is not decided by f32
    # summation-order noise (see _boosted_init)
    for i in range(4):
        d = v["params"][f"Dense_{i}"]
        d["kernel"] = d["kernel"].at[:, 0].multiply(4.0)
    p = export_native(m, v, tmp_path / "ssd.fdn", probability_threshold=PROB,
                      iou_threshold=IOU, capacity=CAP)
    imgs = _images(size=64)
    det = NativeDetector(p)
    nb, nm = det.predict(imgs)
    out = m.apply(v, jnp.asarray(imgs) / 255.0, train=False)
    jb, jm = jax.vmap(
        lambda o: ssd_output_filter_nms(o, (64, 64), PROB, IOU, CAP)
    )(out)
    found = 0
    for i in range(imgs.shape[0]):
        cn = nb[i][nm[i]]
        cj = compact_boxes(np.asarray(jb[i]), np.asarray(jm[i]))
        assert len(cn) == len(cj), (i, cn, cj)
        if len(cn):
            np.testing.assert_allclose(cn, cj, atol=2e-3, rtol=1e-4)
        found += len(cn)
    assert found > 0


def test_native_mobilenetv3_matches_jax(tmp_path):
    """MobileNetV3 .fdn artifacts (SAME padding, SE gates, hard-swish,
    BatchNorm folded at export) reproduce the JAX oracle. BN stats and
    affines are randomized so the fold is actually exercised (fresh-init
    mean=0/var=1/scale=1/bias=0 would make folding the identity)."""
    import jax.tree_util as jtu

    from fdtpu.models import MobileNetV3Backbone

    m = MobileNetV3Backbone(input_shape=(96, 96), num_patches=3,
                            dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 96, 96, 3)), train=False)
    keys = iter(jax.random.split(jax.random.PRNGKey(7), 400))

    def randomize_stats(x):
        return jax.random.uniform(next(keys), x.shape, jnp.float32, 0.5, 1.5)

    v = dict(v)
    v["batch_stats"] = jtu.tree_map(randomize_stats, v["batch_stats"])
    # randomize BN affines too (params['bn*'] = {scale, bias})
    def randomize_bn(path, x):
        name = jtu.keystr(path)
        if "bn" in name and ("scale" in name or "bias" in name):
            return jax.random.uniform(next(keys), x.shape, jnp.float32, 0.8, 1.2)
        return x

    v["params"] = jtu.tree_map_with_path(randomize_bn, v["params"])
    b = v["params"]["head"]["bias"]
    v["params"]["head"]["bias"] = (
        b.at[0].add(0.5).at[3].add(0.3).at[4].add(0.3)
    )
    # An untrained MNv3's deep averaging makes all cells near-identical
    # (score gaps ~1e-5), so NMS pick order is f32-noise — use an IoU
    # threshold that suppresses nothing (grid NMS itself is covered by the
    # other parity tests; what's new here is the conv stack) and compare
    # the full per-cell box set sorted by position.
    p = export_native(m, v, tmp_path / "mnv3.fdn", probability_threshold=PROB,
                      iou_threshold=0.999, capacity=CAP)
    imgs = _images(size=96, seed=5)
    det = NativeDetector(p)
    nb, nm = det.predict(imgs)
    out = m.apply(v, jnp.asarray(imgs) / 255.0, train=False)
    wh = (96, 96)
    jb, jm = jax.vmap(
        lambda o: decode_filter_nms(o, m.grid_size(), wh, PROB, 0.999, CAP)
    )(out)
    total = 0
    for i in range(imgs.shape[0]):
        cn = nb[i][nm[i]]
        cj = compact_boxes(np.asarray(jb[i]), np.asarray(jm[i]))
        assert len(cn) == len(cj), (i, len(cn), len(cj))
        order = lambda a: a[np.lexsort((a[:, 1], a[:, 2]))]
        if len(cn):
            np.testing.assert_allclose(order(cn), order(cj), atol=2e-3,
                                       rtol=1e-4)
        total += len(cn)
    assert total > 0


def test_native_int8_quantized(tmp_path):
    """``weight_quant="int8"`` artifacts are ~4x smaller and preserve every
    f32 detection: each f32 box has an IoU>0.5 int8 match with bounded
    score/coordinate drift. (Per-row dynamic activation quantization —
    per-tensor ranges are wrecked by outliers in these BatchNorm-free
    stacks; see BASELINE.md.) int8 may ADD borderline detections near the
    probability threshold; those are not a failure.

    filters=24 deliberately: cout not divisible by the kernel's 32-wide
    column block forces the scalar edge path — a row-indexing bug there
    (block-local instead of global) once zeroed every edge result while
    all multiple-of-32 models passed."""
    m = _small_poolresnet(filters=24)
    v = _boosted_init(m, 5.0, 12.0)  # probed: 11 well-separated candidates
    pf = export_native(m, v, tmp_path / "f32.fdn", probability_threshold=PROB,
                       iou_threshold=IOU, capacity=CAP)
    pq = export_native(m, v, tmp_path / "q8.fdn", probability_threshold=PROB,
                       iou_threshold=IOU, capacity=CAP, weight_quant="int8")
    assert pq.stat().st_size < pf.stat().st_size / 2.5
    df, dq = NativeDetector(pf), NativeDetector(pq)
    imgs = _images(size=160)
    bf, mf = df.predict(imgs)
    bq, mq = dq.predict(imgs)

    def iou(a, b):
        ix = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
        iy = max(0.0, min(a[2] + a[4], b[2] + b[4]) - max(a[2], b[2]))
        inter = ix * iy
        uni = a[3] * a[4] + b[3] * b[4] - inter
        return inter / uni if uni > 0 else 0.0

    total = 0
    for i in range(imgs.shape[0]):
        cf, cq = bf[i][mf[i]], bq[i][mq[i]]
        for a in cf:
            best = max((iou(a, b), b[0]) for b in cq) if len(cq) else (0, 0)
            assert best[0] > 0.5, (i, a, cq)
            assert abs(best[1] - a[0]) < 0.1, (a[0], best[1])
            total += 1
    assert total > 0


def test_reference_interp_matches_engine_dumps(tmp_path, monkeypatch):
    """The numpy .fdn interpreter reproduces the C engine's per-op
    activations (FDN_DEBUG_DIR dumps) on an int8 artifact — the harness
    that root-caused the q8 edge-kernel bug, pinned so both sides of the
    oracle stay in sync with the format."""
    import struct

    from fdtpu.native.reference_interp import trace

    m = _small_poolresnet(filters=24)  # cout%32 != 0: edge path covered
    v = _boosted_init(m, 5.0, 12.0)
    p = export_native(m, v, tmp_path / "d.fdn", probability_threshold=PROB,
                      iou_threshold=IOU, capacity=CAP, weight_quant="int8")
    img = _images(n=1, size=160)[0]
    dump = tmp_path / "dumps"
    dump.mkdir()
    monkeypatch.setenv("FDN_DEBUG_DIR", str(dump))
    det = NativeDetector(p)
    det.predict(img[None], num_threads=1)
    ops, acts, _ = trace(p, img, quantized=True)
    compared = 0
    for oi, act in enumerate(acts):
        f = dump / f"op{oi:03d}.bin"
        if act is None or not f.exists():
            continue
        raw = f.read_bytes()
        h, w, c = struct.unpack_from("<3i", raw)
        got = np.frombuffer(raw, np.float32, offset=12).reshape(h, w, c)
        assert got.shape == act.shape, (oi, got.shape, act.shape)
        scale = max(1.0, float(np.abs(act).max()))
        np.testing.assert_allclose(got, act, atol=2e-3 * scale, rtol=0,
                                   err_msg=f"op {oi}")
        compared += 1
    assert compared >= 8  # convs + activations actually checked


def test_reference_interp_ssd_artifact(tmp_path, monkeypatch):
    """The numpy interpreter handles SSD artifacts — PUSH_PROJ (op 14) skip
    projections and SSD_HEAD prior writes — matching the engine's per-op
    dumps. Round-3 advisor finding: op 14 was silently skipped, so trace()
    crashed or mis-traced on exactly the artifacts SSD debugging needs."""
    import struct

    from fdtpu.models.ssd import SSD
    from fdtpu.native.reference_interp import trace

    m = SSD(filters=8, input_shape=(64, 64), patch_sizes=(8, 4, 2, 1),
            dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False)
    p = export_native(m, v, tmp_path / "ssd.fdn", probability_threshold=PROB,
                      iou_threshold=IOU, capacity=CAP, weight_quant="int8")
    img = _images(n=1, size=64)[0]
    dump = tmp_path / "dumps"
    dump.mkdir()
    monkeypatch.setenv("FDN_DEBUG_DIR", str(dump))
    NativeDetector(p).predict(img[None], num_threads=1)
    ops, acts, ssd = trace(p, img, quantized=True)
    assert any(op[0] == 14 for op in ops), "PUSH_PROJ not exercised"
    assert ssd, "SSD heads produced no prior-buffer writes"
    # Tolerance note: the interpreter can't be bit-exact on deep quantized
    # stacks — 1-ulp f32 GEMM differences at the first conv flip a few
    # per-row rint() quantization boundaries (one u8 code = ~5e-4 here) and
    # the flips compound per conv; measured ceiling on this 20-conv stack is
    # ~6e-3. Programming errors (what this oracle exists to catch) produce
    # O(scale) garbage, well past this band.
    compared = 0
    for oi, act in enumerate(acts):
        f = dump / f"op{oi:03d}.bin"
        if act is None or not f.exists():
            continue
        raw = f.read_bytes()
        h, w, c = struct.unpack_from("<3i", raw)
        got = np.frombuffer(raw, np.float32, offset=12).reshape(h, w, c)
        assert got.shape == act.shape, (oi, got.shape, act.shape)
        scale = max(1.0, float(np.abs(act).max()))
        np.testing.assert_allclose(got, act, atol=1e-2 * scale, rtol=0,
                                   err_msg=f"op {oi}")
        compared += 1
    # the ADDSKIP ops after each PUSH_PROJ only match if the projection is
    # computed correctly, so they must be among the compared activations
    addskips = [i for i, op in enumerate(ops) if op[0] == 6]
    assert compared > len(addskips) >= 4


def test_native_rejects_corrupt_artifact(tmp_path):
    """read_model() validates op offsets/shapes against the blob and the
    file size: truncated or corrupted .fdn files fail to LOAD instead of
    reading out of bounds (round-3 advisor finding)."""
    m = _small_poolresnet(filters=16)
    v = _boosted_init(m, 5.0, 0.3)
    p = export_native(m, v, tmp_path / "ok.fdn", probability_threshold=PROB,
                      iou_threshold=IOU, capacity=CAP)
    NativeDetector(p)  # sane artifact still loads
    raw = bytearray(p.read_bytes())

    trunc = tmp_path / "trunc.fdn"
    trunc.write_bytes(raw[: len(raw) // 2])
    with pytest.raises(ValueError):
        NativeDetector(trunc)

    # point the first op's weight offset past the blob (woff lives at
    # header 44 + 4 code + 24 p + 4 f0 = offset 76, little-endian u64)
    bad = bytearray(raw)
    bad[76:84] = (1 << 40).to_bytes(8, "little")
    badp = tmp_path / "badoff.fdn"
    badp.write_bytes(bytes(bad))
    with pytest.raises(ValueError):
        NativeDetector(badp)


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
