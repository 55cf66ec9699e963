"""Export grid detectors to the ``.fdn`` native serving format.

The reference ships a JAX/torch-runtime-free deployment story: TorchScript
archives executed by the lite interpreter
(``/root/reference/demo_scripts/convert_checkpoint_to_scripted_model.py:51-54``)
and an ONNX artifact executed by onnxruntime
(``/root/reference/demo_scripts/demo_model_onnx.py:26-31``) — both run the
full predict program (normalize -> conv stack -> sigmoid -> decode -> NMS)
through a native C++ runtime with no Python ML framework present. fdtpu's
StableHLO export (``fdtpu/export/export.py``) still needs a JAX runtime;
this module closes that gap: it serializes the model as a flat op program +
f32 weight blob that the in-repo C++ engine
(``fdtpu/native/infer_engine.cpp``) executes standalone — the lite-interpreter
analogue, ~600 lines of dependency-free C++.

Format ``FDN1`` (little-endian):

    u32 magic 'FDN1' | u32 version | u32 n_ops
    u32 in_h | u32 in_w | u32 grid_s | u32 capacity
    f32 prob_thr | f32 iou_thr | u64 blob_bytes
    n_ops x op records (48 bytes):
        u32 code | i32 p0..p5 | f32 f0 | u64 woff | u64 boff
    f32 weight blob

Op codes: CONV=1 (p: k, stride, pad, cin, cout, groups; pad == -1 means
TF-style SAME — asymmetric, more at the end; weights reshaped HWIO ->
(k*k*cin_per_group, cout) row-major, the C engine's im2col order;
boff == 2^64-1 means bias-free), LEAKY=2 (f0 slope), MAXPOOL2=3, SIGMOID=4,
PUSH=5 (save skip), ADDSKIP=6 (x += saved), DECODE_NMS=7 (grid decode +
confidence filter + greedy NMS with the exact ``fdtpu.core.nms`` /
torchvision semantics, using the header's thresholds), TRANSPOSE_GRID=8,
RELU=9, HARDSWISH=10, SE=11 (p: channels, reduced; woff -> packed
[w1 (C,R), b1 (R), w2 (R,C), b2 (C)] squeeze-excite gate), SSD_HEAD=12
(p: cin, prior_offset, n_pix; position-wise Dense(cin -> 5) from the
current map into the SSD prior buffer, sigmoid on the score column —
``SSD.py:240-245``), SSD_DECODE_NMS=13 (p: n_scales, ps...; prior decode
``SSD.py:206-220`` + pixel scaling + the same exact NMS), PUSH_PROJ=14
(skip = conv1x1(x), the SSD block's channel-matching skip projection —
``SSD.py:30-36``; conv params like CONV with k=1), CONV_Q8=15 (CONV with
int8 weights: woff -> [scales f32 (cout), wsum f32 (cout), int8 weights
packed (ceil(K/4), cout, 4) — 4 consecutive K-values per channel dword];
activations quantized dynamically to 7-bit u8 per conv at run time).

Covers the full model zoo: the grid detectors (PoolResnet / Resnet /
SeparableCNN / MobileNetV3 — BatchNorm folded into the convs at export) and
SSD (multi-scale heads + prior decode). BatchNorm folding: inference-mode
``y = g*(conv(x)-mu)/sqrt(var+eps)+b`` becomes a conv with kernel scaled by
``g/sqrt(var+eps)`` per output channel and bias ``b - mu*g/sqrt(var+eps)``.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

MAGIC = int.from_bytes(b"FDN1", "little")
VERSION = 2  # v2 adds the MobileNetV3/SSD ops (9-14) and SAME padding
NO_BIAS = (1 << 64) - 1

OP_CONV = 1
OP_LEAKY = 2
OP_MAXPOOL2 = 3
OP_SIGMOID = 4
OP_PUSH = 5
OP_ADDSKIP = 6
OP_DECODE_NMS = 7
OP_TRANSPOSE_GRID = 8  # swap the (S, S) axes of the final (S, S, 5) map
OP_RELU = 9
OP_HARDSWISH = 10
OP_SE = 11
OP_SSD_HEAD = 12
OP_SSD_DECODE_NMS = 13
OP_PUSH_PROJ = 14
OP_CONV_Q8 = 15  # int8-weight conv (dynamic u8 activation quantization)

SAME_PAD = -1  # TF-style SAME padding sentinel in the conv pad slot

_LEAKY_SLOPE = 0.2  # reference LeakyReLU slope, models/Resnet.py:27


def _fold_bn(conv_params: dict, bn_params: dict, bn_stats: dict,
             eps: float) -> dict:
    """Fold an inference-mode BatchNorm into the preceding conv's weights.

    ``g*(conv(x) - mu)/sqrt(var+eps) + b`` == conv with kernel scaled
    ``g/sqrt(var+eps)`` (per cout) and bias ``b - mu*g/sqrt(var+eps)``
    (+ the scaled original bias when present).
    """
    g = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mu = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    inv = g / np.sqrt(var + eps)
    kernel = np.asarray(conv_params["kernel"], np.float32) * inv
    bias = beta - mu * inv
    if "bias" in conv_params:
        bias = bias + np.asarray(conv_params["bias"], np.float32) * inv
    return {"kernel": kernel, "bias": bias}


class _Builder:
    def __init__(self, weight_quant: str | None = None):
        self.ops: list[tuple] = []
        self.blob = bytearray()
        self.weight_quant = weight_quant

    def _put(self, arr: np.ndarray) -> int:
        off = len(self.blob)
        self.blob += np.ascontiguousarray(arr, dtype=np.float32).tobytes()
        return off

    def _put_bytes(self, raw: bytes) -> int:
        off = len(self.blob)
        assert len(raw) % 4 == 0
        self.blob += raw
        return off

    def conv(self, params: dict, k: int, stride: int, pad: int,
             groups: int = 1, code: int = OP_CONV):
        kernel = np.asarray(params["kernel"], np.float32)  # HWIO
        kh, kw, cin_g, cout = kernel.shape
        assert kh == k and kw == k, (kernel.shape, k)
        cin = cin_g * groups
        K = k * k * cin_g
        # int8 weight quantization: dense convs only, skipping the tiny
        # stem (K < 64) and the precision-critical 5-channel head
        # (cout < 8). Per-cout symmetric scales; weights packed in groups
        # of 4 K-values per channel, the engine kernel's dword layout.
        if (self.weight_quant == "int8" and code == OP_CONV and groups == 1
                and cout >= 8 and K >= 64):
            wm = kernel.reshape(K, cout)
            # 7-bit weights x 8-bit activations: the bit budget goes to the
            # activations (they carry the outliers in these BN-free nets;
            # weights are max-normalized and well-behaved) while keeping
            # vpmaddubsw's i16 pair-sum below saturation (255*63*2 < 2^15).
            scales = np.max(np.abs(wm), axis=0) / 63.0
            scales = np.where(scales == 0, 1.0, scales).astype(np.float32)
            wq = np.clip(np.rint(wm / scales), -63, 63).astype(np.int8)
            wsum = wq.astype(np.int32).sum(axis=0).astype(np.float32)
            K4 = (K + 3) // 4 * 4
            packed = np.pad(wq, ((0, K4 - K), (0, 0))).reshape(
                K4 // 4, 4, cout).transpose(0, 2, 1)  # (group, cout, 4)
            woff = self._put(scales)
            self._put(wsum)
            self._put_bytes(packed.tobytes())
            boff = (self._put(np.asarray(params["bias"], np.float32))
                    if "bias" in params else NO_BIAS)
            self.ops.append((OP_CONV_Q8, k, stride, pad, cin, cout, groups,
                             0.0, woff, boff))
            return
        woff = self._put(kernel.reshape(-1, cout))
        if "bias" in params:
            boff = self._put(np.asarray(params["bias"], np.float32))
        else:
            boff = NO_BIAS
        self.ops.append((code, k, stride, pad, cin, cout, groups, 0.0,
                         woff, boff))

    def se(self, params: dict, channels: int, reduced: int):
        """Squeeze-excite gate (``fdtpu/models/mobilenetv3.py:45-58``):
        blob is the packed [w1 (C,R), b1 (R), w2 (R,C), b2 (C)]."""
        w1 = np.asarray(params["reduce"]["kernel"], np.float32)
        w2 = np.asarray(params["expand"]["kernel"], np.float32)
        assert w1.shape == (1, 1, channels, reduced), w1.shape
        assert w2.shape == (1, 1, reduced, channels), w2.shape
        packed = np.concatenate([
            w1.reshape(-1),
            np.asarray(params["reduce"]["bias"], np.float32).reshape(-1),
            w2.reshape(-1),
            np.asarray(params["expand"]["bias"], np.float32).reshape(-1),
        ])
        woff = self._put(packed)
        self.ops.append((OP_SE, channels, reduced, 0, 0, 0, 0, 0.0,
                         woff, NO_BIAS))

    def ssd_head(self, params: dict, cin: int, prior_offset: int,
                 n_pix: int):
        """Position-wise Dense(cin -> 5) head into the prior buffer
        (``SSD.py:240-245``); kernel (cin, 5) row-major, bias (5,)."""
        kernel = np.asarray(params["kernel"], np.float32)
        assert kernel.shape == (cin, 5), kernel.shape
        woff = self._put(kernel)
        boff = self._put(np.asarray(params["bias"], np.float32))
        self.ops.append((OP_SSD_HEAD, cin, prior_offset, n_pix, 0, 0, 0,
                         0.0, woff, boff))

    def simple(self, code: int, f0: float = 0.0, p: tuple = ()):
        p = tuple(p) + (0,) * (6 - len(p))
        self.ops.append((code, *p, f0, NO_BIAS, NO_BIAS))

    def serialize(self, in_h: int, in_w: int, grid_s: int, capacity: int,
                  prob_thr: float, iou_thr: float) -> bytes:
        head = struct.pack(
            "<7I2fQ", MAGIC, VERSION, len(self.ops), in_h, in_w, grid_s,
            capacity, prob_thr, iou_thr, len(self.blob),
        )
        recs = b"".join(
            struct.pack("<I6ifQQ", *op) for op in self.ops
        )
        return head + recs + bytes(self.blob)


def _grid_model_program(module, params, transpose_grid: bool,
                        weight_quant=None) -> tuple[_Builder, int]:
    """Emit the inference op sequence for a grid detector, mirroring its
    ``__call__`` with dropout elided (inference) and the shape-conditional
    pooling resolved exactly like ``module.grid_size()``."""
    from fdtpu.models.poolresnet import PoolResnet
    from fdtpu.models.resnet import Resnet
    from fdtpu.models.separable import SeparableCNN

    b = _Builder(weight_quant)
    h = module.input_shape[0]

    if isinstance(module, Resnet):
        b.conv(params["Conv_0"], k=3, stride=2, pad=1)
        dim = (h + 1) // 2
        pool_until = module.num_patches
        separable = False
        out_k, out_pad = module.output_kernel_size, 1
    elif isinstance(module, (PoolResnet, SeparableCNN)):
        pad = module.input_kernel_size - module.input_stride
        b.conv(params["Conv_0"], k=module.input_kernel_size,
               stride=module.input_stride, pad=pad)
        dim = (h + 2 * pad - module.input_kernel_size) // module.input_stride + 1
        pool_until = (
            2 * module.num_patches if isinstance(module, PoolResnet)
            else module.num_patches
        )
        separable = isinstance(module, SeparableCNN)
        out_k, out_pad = module.output_kernel_size, module.output_padding
    else:
        raise ValueError(
            f"unsupported module for the grid program: {type(module).__name__}"
        )

    for i in range(module.num_residual_blocks):
        if separable:
            blk = params[f"SeparableResidualBlock_{i}"]
            b.simple(OP_PUSH)
            b.conv(blk["Conv_0"], k=1, stride=1, pad=0)
            b.simple(OP_LEAKY, _LEAKY_SLOPE)
            b.conv(blk["Conv_1"], k=3, stride=1, pad=1,
                   groups=module.filters)
            b.simple(OP_LEAKY, _LEAKY_SLOPE)
            b.conv(blk["Conv_2"], k=1, stride=1, pad=0)
            b.simple(OP_ADDSKIP)
        else:
            blk = params[f"ResidualBlock_{i}"]
            b.simple(OP_PUSH)
            b.conv(blk["Conv_0"], k=3, stride=1, pad=1)
            b.simple(OP_LEAKY, _LEAKY_SLOPE)
            b.conv(blk["Conv_1"], k=3, stride=1, pad=1)
            b.simple(OP_LEAKY, _LEAKY_SLOPE)
            b.simple(OP_ADDSKIP)
        if dim > pool_until:
            b.simple(OP_MAXPOOL2)
            dim //= 2

    b.conv(params["Conv_1"], k=out_k, stride=1, pad=out_pad)
    b.simple(OP_SIGMOID)
    if transpose_grid:
        b.simple(OP_TRANSPOSE_GRID)
    b.simple(OP_DECODE_NMS)
    grid = dim + 2 * out_pad - out_k + 1
    assert grid == module.grid_size(), (grid, module.grid_size())
    if grid <= 0:
        raise ValueError(
            f"invalid geometry: head conv k={out_k} on a {dim}x{dim} map "
            f"gives grid {grid} — the module itself cannot run this config"
        )
    return b, grid


def _mobilenetv3_program(module, params, stats, transpose_grid: bool,
                         weight_quant=None) -> tuple[_Builder, int]:
    """MobileNetV3-Small inference ops (``fdtpu/models/mobilenetv3.py``,
    reference ``MobilenetV3Backbone.py:11-60``): BatchNorm folded into each
    conv, SE gates as OP_SE, hard-swish/relu activations, residual adds on
    stride-1 channel-matched blocks."""
    from fdtpu.models.mobilenetv3 import MOBILENETV3_SMALL, make_divisible

    eps = module.bn_eps
    b = _Builder(weight_quant)

    def fconv(conv_p, bn_name, blk_p=None, blk_s=None, **kw):
        p = blk_p if blk_p is not None else params
        s = blk_s if blk_s is not None else stats
        b.conv(_fold_bn(conv_p, p[bn_name], s[bn_name], eps), **kw)

    fconv(params["conv_stem"], "bn1", k=3, stride=2, pad=SAME_PAD)
    b.simple(OP_HARDSWISH)
    in_ch = 16
    for bi, (k, exp, out, se, act, s) in enumerate(MOBILENETV3_SMALL):
        blk, bst = params[f"block{bi}"], stats[f"block{bi}"]
        act_op = OP_RELU if act == "relu" else OP_HARDSWISH
        residual = s == 1 and in_ch == out
        if residual:
            b.simple(OP_PUSH)
        if exp != in_ch:
            fconv(blk["conv_pw"], "bn1", blk, bst, k=1, stride=1, pad=0)
            b.simple(act_op)
        fconv(blk["conv_dw"], "bn2", blk, bst, k=k, stride=s, pad=SAME_PAD,
              groups=exp)
        b.simple(act_op)
        if se:
            b.se(blk["se"], exp, make_divisible(exp * 0.25))
        fconv(blk["conv_pwl"], "bn3", blk, bst, k=1, stride=1, pad=0)
        if residual:
            b.simple(OP_ADDSKIP)
        in_ch = out
    fconv(params["conv_576"], "bn_576", k=1, stride=1, pad=0)
    b.simple(OP_HARDSWISH)
    # detection head (MobilenetV3Backbone.py:40-46): explicit padding=1
    b.conv(params["head"], k=module.output_kernel_size, stride=1, pad=1)
    b.simple(OP_SIGMOID)
    if transpose_grid:
        b.simple(OP_TRANSPOSE_GRID)
    b.simple(OP_DECODE_NMS)
    return b, module.grid_size()


def _ssd_program(module, params, weight_quant=None) -> _Builder:
    """SSD inference ops (``fdtpu/models/ssd.py``, reference
    ``SSD.py:84-255``): stem + 9 extractor blocks + 4 scale blocks, each
    scale's position-wise Dense head written into the prior buffer, prior
    decode + NMS at the end. Dropout elided (inference)."""
    b = _Builder(weight_quant)
    f = module.filters
    max_f = 16 * f

    def block(idx: int, in_f: int, out_f: int, pool: bool):
        blk = params[f"SSDResidualBlock_{idx}"]
        if in_f == out_f:
            b.simple(OP_PUSH)
            c0, c1 = blk["Conv_0"], blk["Conv_1"]
        else:  # Conv_0 is the 1x1 skip projection (created first, SSD.py:30)
            b.conv(blk["Conv_0"], k=1, stride=1, pad=0, code=OP_PUSH_PROJ)
            c0, c1 = blk["Conv_1"], blk["Conv_2"]
        b.conv(c0, k=3, stride=1, pad=1)
        b.simple(OP_LEAKY, _LEAKY_SLOPE)
        b.conv(c1, k=3, stride=1, pad=1)
        b.simple(OP_LEAKY, _LEAKY_SLOPE)
        b.simple(OP_ADDSKIP)
        if pool:
            b.simple(OP_MAXPOOL2)

    # input_normalizer stem (SSD.py:127-134)
    b.conv(params["Conv_0"], k=3, stride=2, pad=1)
    # feature_extractor (SSD.py:135-163)
    block(0, f, 2 * f, pool=True)
    block(1, 2 * f, 2 * f, pool=True)
    for i in range(6):
        block(2 + i, 2 * f, 2 * f, pool=False)
    block(8, 2 * f, 4 * f, pool=False)
    # per-scale continue blocks + extracting heads (SSD.py:164-189)
    prior_off = 0
    for i, ps in enumerate(module.patch_sizes):
        in_f = min(4 * f * 2**i, max_f)
        out_f = min(2 * in_f, max_f)
        block(9 + i, in_f, out_f, pool=(i != 0))
        b.ssd_head(params[f"Dense_{i}"], out_f, prior_off, ps * ps)
        prior_off += ps * ps
    b.simple(OP_SSD_DECODE_NMS,
             p=(len(module.patch_sizes), *module.patch_sizes))
    return b


def export_native(
    module,
    variables,
    path: str | Path,
    probability_threshold: float = 0.7,
    iou_threshold: float = 0.01,
    capacity: int = 64,
    weight_quant: str | None = None,
) -> Path:
    """Serialize ``module`` + weights to a ``.fdn`` artifact runnable by the
    C engine (``fdtpu.native.infer``) with zero Python/JAX at serving time.

    Thresholds default to the reference converter's
    (``convert_checkpoint_to_scripted_model.py:43-48``). Weights are stored
    f32 (full precision — the engine computes f32 regardless of the
    training-time compute dtype; BatchNorm is folded at export, so the
    artifact is inference-only). ``weight_quant="int8"`` stores the dense
    conv weights as per-output-channel symmetric int8 (~4x smaller
    artifact); the engine quantizes activations dynamically per conv and
    runs an AVX-512 u8·s8 kernel where available, dequantizing at load
    otherwise — the capability analogue of onnxruntime dynamic
    quantization on the reference's ONNX artifact (``demo_model_onnx.py``).
    """
    from fdtpu.models.mobilenetv3 import MobileNetV3Backbone
    from fdtpu.models.ssd import SSD

    params = variables["params"] if "params" in variables else variables
    stats = variables.get("batch_stats") if isinstance(variables, dict) else None

    # Reference-checkpoint imports arrive wrapped in ReferenceLayoutGrid
    # (fdtpu/compat/torch_import.py): the inner model emits the reference's
    # spatially-transposed grid, fixed by a swap before decode. Unwrap and
    # emit an OP_TRANSPOSE_GRID in its place.
    transpose_grid = False
    if type(module).__name__ == "ReferenceLayoutGrid" and hasattr(module, "inner"):
        module = module.inner
        params = params["inner"]
        if "params" in params:
            params = params["params"]
        if stats is not None and "inner" in stats:
            stats = stats["inner"]
        transpose_grid = True

    if isinstance(module, SSD):
        b = _ssd_program(module, params, weight_quant)
        grid = 0  # grid_s == 0 marks an SSD artifact
    elif isinstance(module, MobileNetV3Backbone):
        if stats is None:
            raise ValueError(
                "MobileNetV3 export needs variables['batch_stats'] to fold "
                "BatchNorm"
            )
        b, grid = _mobilenetv3_program(module, params, stats, transpose_grid,
                                        weight_quant)
    else:
        b, grid = _grid_model_program(module, params, transpose_grid,
                                      weight_quant)
    h, w = module.input_shape
    data = b.serialize(h, w, grid, capacity,
                       probability_threshold, iou_threshold)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path
