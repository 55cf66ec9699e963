"""Deployment export (the TorchScript / lite-interpreter / ONNX equivalent)."""

from fdtpu.export.export import (  # noqa: F401
    aot_compile_predict,
    export_predict,
    load_exported,
    make_predict_fn,
)
from fdtpu.export.native_format import export_native  # noqa: F401
