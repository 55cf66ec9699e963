"""ctypes bindings + on-demand build for the native .fdn inference engine.

The JAX-runtime-free deployment path: ``fdtpu.export.export_native`` writes
a ``.fdn`` artifact (flat op program + f32 weights), and this engine —
dependency-free C++ (``infer_engine.cpp``) — executes the full predict
program (normalize -> conv stack -> sigmoid -> grid or SSD-prior decode ->
NMS; BatchNorm models are folded at export) for the entire model zoo on
any host with a C++ toolchain. The capability analogue of the reference's
TorchScript lite-interpreter / onnxruntime serving
(``/root/reference/demo_scripts/convert_checkpoint_to_scripted_model.py:51-54``,
``demo_model_onnx.py:26-31``); the StableHLO path (``fdtpu/export``) remains
the high-performance TPU serving artifact.

A standalone CLI (``fdn_serve``: JPEG in, JSON boxes out, zero Python) builds
via :func:`build_cli`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "infer_engine.cpp"
_LIB = _HERE / "libfdninfer.so"
_CLI_SRC = _HERE / "serve_main.cpp"
_CLI_BIN = _HERE / "fdn_serve"

_lib = None
_build_failed = False


def _gxx(args: list[str]) -> bool:
    for arch in ("-march=native", "-mavx2 -mfma", ""):
        cmd = ["g++", "-O3", "-std=c++17"] + arch.split() + args
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
            return True
        except subprocess.CalledProcessError:
            continue
        except Exception:
            return False
    return False


def build(force: bool = False) -> Path | None:
    """Compile the engine shared library if needed; returns its path."""
    global _build_failed
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
    ok = _gxx(["-shared", "-fPIC", str(_SRC), "-o", str(_LIB), "-pthread"])
    if not ok:
        # A stale-but-loadable library beats no library: if the rebuild
        # fails (toolchain regressed) fall back to the existing .so with a
        # warning instead of disabling native serving entirely.
        if _LIB.exists():
            import warnings

            warnings.warn(
                "native engine rebuild failed; using the stale "
                f"{_LIB.name} already on disk", RuntimeWarning)
            return _LIB
        _build_failed = True
        return None
    return _LIB


def build_cli(force: bool = False) -> Path | None:
    """Compile the standalone ``fdn_serve`` binary (engine + libjpeg decode);
    returns its path, or None when the toolchain/libjpeg is unavailable."""
    if _CLI_BIN.exists() and not force:
        newest = max(p.stat().st_mtime for p in
                     (_CLI_SRC, _SRC, _HERE / "fast_loader.cpp"))
        if _CLI_BIN.stat().st_mtime >= newest:
            return _CLI_BIN
    ok = _gxx([
        str(_CLI_SRC), str(_SRC), str(_HERE / "fast_loader.cpp"),
        "-ljpeg", "-pthread", "-o", str(_CLI_BIN),
    ])
    return _CLI_BIN if ok else None


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.fdn_load.argtypes = [ctypes.c_char_p]
    lib.fdn_load.restype = ctypes.c_void_p
    lib.fdn_free.argtypes = [ctypes.c_void_p]
    lib.fdn_info.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)] * 3
    lib.fdn_info.restype = ctypes.c_int
    lib.fdn_predict.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.fdn_predict.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_infer_available() -> bool:
    return _load() is not None


class NativeDetector:
    """Loaded ``.fdn`` model; ``predict`` mirrors ``Detector.predict``'s
    decode contract (``(boxes (B, capacity, 5) [score,x,y,w,h] pixels,
    mask)``) with no JAX in the process."""

    def __init__(self, path: str | Path):
        lib = _load()
        if lib is None:
            raise RuntimeError("native inference engine unavailable")
        self._lib = lib
        self._h = lib.fdn_load(str(path).encode())
        if not self._h:
            raise ValueError(f"failed to load .fdn artifact: {path}")
        ih, iw, cap = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        lib.fdn_info(self._h, ctypes.byref(ih), ctypes.byref(iw),
                     ctypes.byref(cap))
        self.input_shape = (ih.value, iw.value)
        self.capacity = cap.value

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fdn_free(self._h)
            self._h = None

    def predict(self, images: np.ndarray, num_threads: int = 0):
        """``images``: ``(B, H, W, 3)`` or ``(H, W, 3)`` uint8/float in
        [0, 255] at the model's input size (the engine normalizes /255,
        ``BaseModel.py:66``). Returns ``(boxes (B, capacity, 5), mask)``."""
        imgs = np.asarray(images, dtype=np.float32)
        if imgs.ndim == 3:
            imgs = imgs[None]
        b = imgs.shape[0]
        h, w = self.input_shape
        if imgs.shape[1:] != (h, w, 3):
            raise ValueError(f"expected (B, {h}, {w}, 3), got {imgs.shape}")
        imgs = np.ascontiguousarray(imgs)
        boxes = np.empty((b, self.capacity, 5), dtype=np.float32)
        mask = np.empty((b, self.capacity), dtype=np.uint8)
        rc = self._lib.fdn_predict(
            self._h,
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b,
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            num_threads,
        )
        if rc != 0:
            raise RuntimeError("fdn_predict failed")
        return boxes, mask.astype(bool)
