"""Reference-style ``__main__`` smoke benchmarks for the model files.

Every reference model file ends in a smoke block — build on CPU, print the
torchinfo summary, time one forward pass, print FPS and output shape
(``/root/reference/models/Resnet.py:102-123``, ``PoolResnet.py:108-129``,
``MobilenetV3Backbone.py:63-84``, ``SeparableCNN.py:115-136``,
``SSD.py:258-277``). This is that block for fdtpu: ``python -m
fdtpu.models.<name>`` runs it.
"""

from __future__ import annotations

import time


def smoke(module, batch: int = 1, iters: int = 10) -> None:
    import jax

    # the reference smoke runs on the host CPU; forcing the platform also
    # keeps `python -m fdtpu.models.x` off the (single-client) TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fdtpu.models.detector import Detector

    det = Detector(module)
    det.init(jax.random.PRNGKey(0))
    print(det.summary())
    h, w = module.input_shape
    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    fwd = jax.jit(lambda v: module.apply(det.variables, v, train=False))
    out = jax.block_until_ready(fwd(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"input {(batch, h, w, 3)} -> output {tuple(out.shape)}; "
        f"forward {dt * 1e3:.1f} ms ({batch / dt:.1f} FPS, CPU)"
    )
