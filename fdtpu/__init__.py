"""fdtpu — TPU-native face-detection framework.

A from-scratch JAX / Flax / XLA / Pallas re-design of the capabilities of
``smpurkis/PyTorch-Face-Detection-from-Scratch`` (reference mounted read-only at
``/root/reference``; see SURVEY.md for the full structural analysis).

Design stance (not a port):

* **NHWC images, static shapes.** Variable-length box lists become fixed-capacity
  ``(K, 5)`` arrays of ``[conf, x, y, w, h]`` rows with validity masks so every
  function is jit-compilable with one trace.
* **Vectorized everything.** The reference's Python-per-sample loss/metric loops
  (``/root/reference/models/ModelMeta.py:173-214``) are batched ``vmap``/einsum.
* **Grid convention.** Feature maps are ``(S, S, 5)`` indexed ``[row=y_cell,
  col=x_cell]`` with channels ``(conf, x, y, w, h)`` — the natural image-axis
  convention. (The reference transposes: ``fm[:, i=x_cell, j=y_cell]``,
  ``/root/reference/datasets/WIDERFace/dataset.py:61-63``; its loss additionally
  swaps pred x/y channels, ``losses/YoloLoss.py:17-18``. We keep one consistent
  convention and provide compat shims where checkpoint parity requires the
  reference's.)
* **Data parallelism over ICI** via ``jax.sharding.Mesh`` + ``jit`` with
  ``NamedSharding`` / ``shard_map`` — the reference is single-device
  (``Trainer(gpus=1)``, ``/root/reference/train_model.py:47-53``).
* **Fused decode + confidence-filter + NMS** as a single Pallas kernel on the
  inference path (pure-XLA fallback with identical semantics).
"""

__version__ = "0.1.0"

from fdtpu.utils.config import DetectorConfig, SSDConfig, TrainConfig  # noqa: F401
