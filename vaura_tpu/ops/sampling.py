"""Jittable sampling primitives.

TPU-native equivalents of the reference's sampling helpers
(reference ``utils/utils.py:139-196``): multinomial, top-k, top-p, plus the
classifier-free-guidance logit blend (reference ``models/vaura_model.py:
810-813``). All functions operate on the last axis, keep static shapes, and
are safe to call inside ``jit``/``lax.scan``.

Distribution notes: the reference samples from *renormalized probabilities*
after masking; sampling from the equivalently-masked *logits* with a Gumbel
trick (``jax.random.categorical``) yields the identical distribution while
avoiding an explicit softmax + divide.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def multinomial(rng: jax.Array, logits: jax.Array) -> jax.Array:
    """Sample one index per distribution on the last axis of ``logits``.

    Equivalent of reference ``multinomial`` (``utils/utils.py:139-160``) in
    the logits domain.
    """
    return jax.random.categorical(rng, logits, axis=-1)


def sample_top_k(rng: jax.Array, logits: jax.Array, k: int) -> jax.Array:
    """Sample from the top-k entries of ``logits`` along the last axis.

    Matches reference ``sample_top_k`` (``utils/utils.py:163-177``): mass
    outside the top-k (ties included via >= threshold) is zeroed, the rest is
    renormalized — equivalently the non-top-k logits are masked to -inf.
    """
    k = min(int(k), logits.shape[-1])  # k >= vocab keeps everything
    top_vals, _ = jax.lax.top_k(logits, k)
    threshold = top_vals[..., -1:]
    masked = jnp.where(logits >= threshold, logits, NEG_INF)
    return jax.random.categorical(rng, masked, axis=-1)


def sample_top_p(rng: jax.Array, logits: jax.Array, p: float) -> jax.Array:
    """Nucleus sampling: keep the smallest prefix of descending-probability
    tokens whose mass exceeds ``p``.

    Matches reference ``sample_top_p`` (``utils/utils.py:180-196``): a token
    is kept while ``cumsum(probs) - probs <= p``.
    """
    sort_idx = jnp.argsort(logits, axis=-1)[..., ::-1]
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumulative = jnp.cumsum(sorted_probs, axis=-1)
    keep = (cumulative - sorted_probs) <= p
    masked = jnp.where(keep, sorted_logits, NEG_INF)
    choice = jax.random.categorical(rng, masked, axis=-1)
    return jnp.take_along_axis(sort_idx, choice[..., None], axis=-1)[..., 0]


def cfg_blend(
    cond_logits: jax.Array, uncond_logits: jax.Array, cfg_scale: float | jax.Array
) -> jax.Array:
    """Classifier-free guidance blend (reference ``vaura_model.py:810-813``):
    ``uncond + (cond - uncond) * scale``."""
    return uncond_logits + (cond_logits - uncond_logits) * cfg_scale


def sample_tokens(
    rng: jax.Array,
    logits: jax.Array,
    *,
    use_sampling: bool = True,
    temp: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Dispatch among greedy / top-p / top-k / multinomial.

    Priority order mirrors reference ``_sample_next_token``
    (``models/vaura_model.py:816-825``): top-p if > 0, else top-k if > 0,
    else plain multinomial; greedy when sampling is off or temp == 0.
    ``use_sampling``/``temp``/``top_k``/``top_p`` are static (python)
    arguments: each combination compiles once.
    """
    if use_sampling and temp > 0.0:
        scaled = logits / temp
        if top_p > 0.0:
            return sample_top_p(rng, scaled, top_p)
        if top_k > 0:
            return sample_top_k(rng, scaled, top_k)
        return multinomial(rng, scaled)
    return jnp.argmax(logits, axis=-1)
