"""Condition-nullification helpers (reference
``models/modules/misc/dropout_modules.py``).

The live CFG path is the sampler's per-sample ``token_drop``
(``vaura_tpu.models.sampler.AVCLIPEmbedder``); these are the legacy
batch-level utilities kept for parity: ``nullify_condition`` collapses a
condition tensor to a zero vector along the time axis, and
``classifier_free_guidance_dropout`` nullifies the whole batch with
probability ``p`` (seeded, jittable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nullify_condition(cond: jax.Array, dim: int = 1) -> jax.Array:
    """Collapse ``dim`` (a time axis, never batch) to a single zero step
    (reference ``dropout_modules.py:10-40``)."""
    assert dim != 0, "dim cannot be the batch dimension"
    moved = jnp.moveaxis(cond, dim, -1)
    out = 0.0 * moved[..., :1]
    return jnp.moveaxis(out, -1, dim)


def classifier_free_guidance_dropout(
    rng: jax.Array, cond: jax.Array, p: float, train: bool = True
):
    """Whole-batch condition nullification with probability ``p``
    (reference ``ClassifierFreeGuidanceDropout``,
    ``dropout_modules.py:43-79``). Returns ``(cond, dropped)``."""
    if not train or p <= 0.0:
        return cond, jnp.asarray(False)
    drop = jax.random.uniform(rng, ()) < p
    nulled = jnp.broadcast_to(
        nullify_condition(jnp.zeros_like(cond), dim=cond.ndim - 2), cond.shape
    )
    return jnp.where(drop, nulled, cond), drop
