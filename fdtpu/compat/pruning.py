"""L1 structured channel pruning over Flax param pytrees.

The torch_pruning equivalent (``/root/reference/pruner.py:42-82``): score
channels by L1 weight norm, drop ``amount`` of them per prunable layer, and
propagate through the dependency graph so tied layers shrink together. For
the grid-detector topology the dependency graph is simple and known:

* the **residual stream** ties stem-out, every block's conv-in/conv-out, and
  head-in to one channel space (the ``+ skip`` add);
* each block's first conv output is a **block-internal** space, prunable
  independently.

torch_pruning discovers this graph by tracing autograd
(``DependencyGraph.build_dependency``, ``pruner.py:46-47``); with a static
Flax pytree the structure is explicit from the parameter names, so the
"graph" reduces to the two groups above. Pruning returns a *re-traced* module
(same class, ``filters = kept``) with physically sliced kernels — XLA then
compiles the smaller convs; no masks at runtime.

Supports Resnet / PoolResnet (dense residual blocks). Flax kernels are HWIO.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _topk_keep(scores: np.ndarray, keep: int) -> np.ndarray:
    """Indices of the ``keep`` highest-scoring channels, ascending order
    (stable layout for slicing)."""
    idx = np.argsort(-scores, kind="stable")[:keep]
    return np.sort(idx)


def prune_l1_structured(module, variables, amount: float = 0.2,
                        align: int | None = None):
    """Prune ``amount`` of channels from every conv, L1-scored.

    Returns ``(new_module, new_variables)`` where ``new_module`` is the same
    architecture re-traced at the reduced width.

    ``align`` rounds the kept channel count DOWN to a multiple (e.g. 64 or
    128): measured on TPU v5 lite, pruning 128 -> 102 channels *slowed*
    inference 19.2k -> 11.7k img/s because non-aligned channel counts waste
    MXU tiles. Default None preserves torch_pruning's exact-amount parity
    (``/root/reference/pruner.py:42``).
    """
    params = {k: dict(v) for k, v in variables["params"].items()}
    f = module.filters
    keep = f - int(round(f * amount))  # torch_pruning L1Strategy(amount)
    if align:
        keep = max(align, (keep // align) * align)
    assert keep >= 1, (f, amount)

    stem = params["Conv_0"]
    head_name = max(
        k for k in params if k.startswith("Conv_")
    )  # last direct conv = 5-channel head
    head = params[head_name]

    # Residual-stream group: scored by the stem's output-channel L1 norm.
    stem_kernel = np.asarray(stem["kernel"])  # (kh, kw, in, F)
    stream_scores = np.abs(stem_kernel).sum(axis=(0, 1, 2))
    stream_keep = _topk_keep(stream_scores, keep)

    new_params: dict = {}
    new_params["Conv_0"] = {
        "kernel": jnp.asarray(stem_kernel[:, :, :, stream_keep]),
    }
    if "bias" in stem:
        new_params["Conv_0"]["bias"] = jnp.asarray(
            np.asarray(stem["bias"])[stream_keep]
        )

    block_names = sorted(
        (k for k in params if k.startswith("ResidualBlock_")),
        key=lambda s: int(s.split("_")[1]),
    )
    for name in block_names:
        block = params[name]
        k1 = np.asarray(block["Conv_0"]["kernel"])  # (3,3,F,F) stream->internal
        k2 = np.asarray(block["Conv_1"]["kernel"])  # (3,3,F,F) internal->stream
        internal_scores = np.abs(k1).sum(axis=(0, 1, 2))
        internal_keep = _topk_keep(internal_scores, keep)
        nb: dict = {
            "Conv_0": {"kernel": jnp.asarray(k1[:, :, stream_keep][:, :, :, internal_keep])},
            "Conv_1": {"kernel": jnp.asarray(k2[:, :, internal_keep][:, :, :, stream_keep])},
        }
        if "bias" in block["Conv_0"]:
            nb["Conv_0"]["bias"] = jnp.asarray(
                np.asarray(block["Conv_0"]["bias"])[internal_keep]
            )
        if "bias" in block["Conv_1"]:
            nb["Conv_1"]["bias"] = jnp.asarray(
                np.asarray(block["Conv_1"]["bias"])[stream_keep]
            )
        new_params[name] = nb

    head_kernel = np.asarray(head["kernel"])  # (kh, kw, F, 5)
    new_params[head_name] = {"kernel": jnp.asarray(head_kernel[:, :, stream_keep])}
    if "bias" in head:
        new_params[head_name]["bias"] = jnp.asarray(head["bias"])

    new_module = module.clone(filters=keep)
    return new_module, {"params": new_params}
