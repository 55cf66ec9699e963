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

Op codes: CONV=1 (p: k, stride, pad, cin, cout, groups; weights reshaped
HWIO -> (k*k*cin_per_group, cout) row-major, the C engine's im2col order;
boff == 2^64-1 means bias-free), LEAKY=2 (f0 slope), MAXPOOL2=3, SIGMOID=4,
PUSH=5 (save skip), ADDSKIP=6 (x += saved), DECODE_NMS=7 (grid decode +
confidence filter + greedy NMS with the exact ``fdtpu.core.nms`` /
torchvision semantics, using the header's thresholds).

Covers the grid-detector zoo (PoolResnet / Resnet / SeparableCNN — every
model the reference's official deployment checkpoints use). SSD and
MobileNetV3 keep the StableHLO path (multi-scale heads / SE blocks are not
worth a second native interpreter; documented in README's ledger).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

MAGIC = int.from_bytes(b"FDN1", "little")
VERSION = 1
NO_BIAS = (1 << 64) - 1

OP_CONV = 1
OP_LEAKY = 2
OP_MAXPOOL2 = 3
OP_SIGMOID = 4
OP_PUSH = 5
OP_ADDSKIP = 6
OP_DECODE_NMS = 7
OP_TRANSPOSE_GRID = 8  # swap the (S, S) axes of the final (S, S, 5) map

_LEAKY_SLOPE = 0.2  # reference LeakyReLU slope, models/Resnet.py:27


class _Builder:
    def __init__(self):
        self.ops: list[tuple] = []
        self.blob = bytearray()

    def _put(self, arr: np.ndarray) -> int:
        off = len(self.blob)
        self.blob += np.ascontiguousarray(arr, dtype=np.float32).tobytes()
        return off

    def conv(self, params: dict, k: int, stride: int, pad: int,
             groups: int = 1):
        kernel = np.asarray(params["kernel"], np.float32)  # HWIO
        kh, kw, cin_g, cout = kernel.shape
        assert kh == k and kw == k, (kernel.shape, k)
        woff = self._put(kernel.reshape(-1, cout))
        if "bias" in params:
            boff = self._put(np.asarray(params["bias"], np.float32))
        else:
            boff = NO_BIAS
        cin = cin_g * groups
        self.ops.append((OP_CONV, k, stride, pad, cin, cout, groups, 0.0,
                         woff, boff))

    def simple(self, code: int, f0: float = 0.0):
        self.ops.append((code, 0, 0, 0, 0, 0, 0, f0, NO_BIAS, NO_BIAS))

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


def _grid_model_program(module, params) -> tuple[_Builder, int]:
    """Emit the inference op sequence for a grid detector, mirroring its
    ``__call__`` with dropout elided (inference) and the shape-conditional
    pooling resolved exactly like ``module.grid_size()``."""
    from fdtpu.models.poolresnet import PoolResnet
    from fdtpu.models.resnet import Resnet
    from fdtpu.models.separable import SeparableCNN

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
        transpose_grid = True

    b = _Builder()
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
            f"native export supports the grid zoo (PoolResnet/Resnet/"
            f"SeparableCNN); got {type(module).__name__} — use the StableHLO "
            f"path (fdtpu.export.export_predict) for SSD/MobileNetV3"
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


def export_native(
    module,
    variables,
    path: str | Path,
    probability_threshold: float = 0.7,
    iou_threshold: float = 0.01,
    capacity: int = 64,
) -> Path:
    """Serialize ``module`` + weights to a ``.fdn`` artifact runnable by the
    C engine (``fdtpu.native.infer``) with zero Python/JAX at serving time.

    Thresholds default to the reference converter's
    (``convert_checkpoint_to_scripted_model.py:43-48``). Weights are stored
    f32 (full precision — the engine computes f32 regardless of the
    training-time compute dtype).
    """
    params = variables["params"] if "params" in variables else variables
    b, grid = _grid_model_program(module, params)
    h, w = module.input_shape
    data = b.serialize(h, w, grid, capacity,
                       probability_threshold, iou_threshold)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path
