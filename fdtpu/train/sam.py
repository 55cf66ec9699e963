"""Sharpness-Aware Minimization as a pure two-point gradient transform.

The reference's ``SAMSGD`` (``/root/reference/models/ModelMeta.py:12-82`` — an
Adam subclass despite the name) implements SAM with in-place ``_foreach``
mutation: grads at the current point, perturb by ``eps = rho * g / ||g||_2``
(global 2-norm over the stacked per-tensor norms, ``ModelMeta.py:68-72``),
re-evaluate, un-perturb, Adam-step.

**Recorded reference quirk (SURVEY.md §7 "faithful-vs-fixed"):** the closure
it re-evaluates (``ModelMeta.py:121-131``) never calls ``backward()`` — the
``closure_loss.backward()`` line is commented out — and under Lightning's
AMP path ``optimizer.step()`` is invoked *without* a closure, so ``p.grad``
still holds the gradients Lightning's own backward produced at the original
point. The perturbed re-evaluation therefore never changes any gradient: the
reference effectively trains **plain Adam plus two wasted forward passes**.
Here ``sam_gradients`` implements the SAM the reference intended (gradients
at the perturbed point); ``TrainConfig.use_sam=False`` gives the faithful
plain-Adam behavior (without the wasted forwards).
"""

from __future__ import annotations

import jax
import optax


def sam_gradients(loss_fn, params, rho: float, grad_reduce=None):
    """Two-point SAM gradient.

    ``loss_fn(params) -> (loss, aux)``. Returns ``(loss, aux, grads)`` where
    ``loss``/``aux`` are evaluated at the original point (like the reference's
    ``step()`` return, ``ModelMeta.py:50-51``) and ``grads`` at
    ``params + rho * g / ||g||``.

    ``grad_reduce`` (optional) is applied to BOTH gradient evaluations —
    under SPMD (``shard_map``) it is the cross-shard all-reduce, placed
    inside so the perturbation direction is computed from the *global*
    gradient exactly as a single device would (matching the explicit twin
    in ``fdtpu/parallel/dp.py``).
    """
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if grad_reduce is not None:
        grads = grad_reduce(grads)
    grad_norm = optax.global_norm(grads)
    scale = rho / (grad_norm + 1e-12)
    perturbed = jax.tree_util.tree_map(lambda p, g: p + g * scale, params, grads)
    (_, _), sam_grads = jax.value_and_grad(loss_fn, has_aux=True)(perturbed)
    if grad_reduce is not None:
        sam_grads = grad_reduce(sam_grads)
    return loss, aux, sam_grads
