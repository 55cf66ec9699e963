"""Serialized deployment artifacts via ``jax.export`` (StableHLO).

The reference's deployment story is TorchScript archives with decode+NMS
*inside* the graph (``/root/reference/demo_scripts/
convert_checkpoint_to_scripted_model.py:31-55``: ``torch.jit.script`` +
``_save_for_lite_interpreter``), plus an ONNX path with a dynamic box axis
(``single_image_inference.py:53-60``). TPU-native equivalents:

* :func:`export_predict` — serialize the full predict program (normalize ->
  forward -> fused decode/filter/NMS, fixed-capacity outputs instead of the
  ONNX dynamic axis) to a StableHLO artifact loadable by any JAX runtime
  (:func:`load_exported`), including future jaxlibs (stable serialization).
* :func:`aot_compile_predict` — ahead-of-time compile for the local chip
  (lowered + compiled executable; no tracing at serving time).

Weights are baked into the artifact as constants, like TorchScript.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp


def make_predict_fn(module, variables, probability_threshold: float,
                    iou_threshold: float, capacity: int = 64):
    """Closure: ``(B, H, W, 3) float [0,255] -> (boxes, mask)`` with the full
    reference predict semantics (``BaseModel.py:56-71``) minus host resize."""
    from fdtpu.core.nms import decode_filter_nms, ssd_output_filter_nms
    from fdtpu.models.detector import is_ssd

    h, w = module.input_shape
    ssd = is_ssd(module)
    grid = 0 if ssd else module.grid_size()

    def predict(images):
        imgs = images.astype(jnp.float32) / 255.0
        out = module.apply(variables, imgs, train=False)
        if ssd:
            fn = lambda o: ssd_output_filter_nms(
                o, (w, h), probability_threshold, iou_threshold, capacity
            )
        else:
            fn = lambda o: decode_filter_nms(
                o, grid, (w, h), probability_threshold, iou_threshold, capacity
            )
        return jax.vmap(fn)(out)

    return predict


def export_predict(
    module,
    variables,
    path: str | Path,
    batch_size: int = 1,
    probability_threshold: float = 0.7,
    iou_threshold: float = 0.01,
    capacity: int = 64,
) -> Path:
    """Serialize the jitted predict program to ``path`` (StableHLO bytes).

    Thresholds default to the reference converter's
    (``convert_checkpoint_to_scripted_model.py:43-48``).
    """
    from jax import export as jax_export

    predict = make_predict_fn(
        module, variables, probability_threshold, iou_threshold, capacity
    )
    h, w = module.input_shape
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
    exported = jax_export.export(jax.jit(predict))(spec)
    data = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path


def load_exported(path: str | Path):
    """Load a serialized artifact -> callable ``(images) -> (boxes, mask)``.

    The ONNX-checker equivalent: deserialization itself validates the
    artifact (``demo_model_onnx.py:15-18``).
    """
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return lambda images: exported.call(images)


def aot_compile_predict(
    module, variables, batch_size: int = 1,
    probability_threshold: float = 0.7, iou_threshold: float = 0.01,
    capacity: int = 64,
):
    """Ahead-of-time compile predict for the local device; returns the
    compiled executable (no tracing/compiling at serving time)."""
    predict = make_predict_fn(
        module, variables, probability_threshold, iou_threshold, capacity
    )
    h, w = module.input_shape
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
    return jax.jit(predict).lower(spec).compile()
