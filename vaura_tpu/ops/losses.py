"""Losses: per-codebook masked cross entropy.

TPU-native equivalent of reference ``VAURAModel._compute_loss``
(``models/vaura_model.py:246-280``): cross entropy per codebook over
mask-valid positions (mean over valid positions of that codebook), averaged
across codebooks. The reference gathers valid positions with boolean
indexing (dynamic shapes); here invalid positions are weighted to zero so
shapes stay static under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_codebook_cross_entropy(
    logits: jax.Array,  # [B, K, T, card] (may contain non-finite at masked slots)
    targets: jax.Array,  # [B, K, T] int
    mask: jax.Array,  # [B, K, T] bool
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(loss, loss_per_codebook[K])``.

    Masked logits may legitimately contain NaN fill (the pattern revert uses
    NaN as an unmistakable special value, reference ``vaura_model.py:185``);
    they are replaced before the log-softmax so gradients stay finite.
    """
    B, K, T, card = logits.shape
    assert targets.shape == (B, K, T)
    assert mask.shape == (B, K, T)
    mask_f = mask.astype(jnp.float32)
    safe_logits = jnp.where(mask[..., None], logits, 0.0).astype(jnp.float32)
    logp = jax.nn.log_softmax(safe_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]  # [B, K, T]
    nll = nll * mask_f
    per_cb_count = jnp.maximum(jnp.sum(mask_f, axis=(0, 2)), 1.0)  # [K]
    loss_per_codebook = jnp.sum(nll, axis=(0, 2)) / per_cb_count  # [K]
    loss = jnp.mean(loss_per_codebook)
    return loss, loss_per_codebook
