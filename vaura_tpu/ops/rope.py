"""Rotary positional embedding (interleaved-pair variant).

Matches the reference's gpt-fast-style RoPE (reference
``models/modules/sampler/llama.py:593-650``): frequencies over even channel
indices, rotation applied to adjacent channel pairs ``(2i, 2i+1)``. The
cos/sin cache is precomputed on host and indexed by position, which keeps the
per-step decode free of trig.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def precompute_freqs_cis(seq_len: int, head_dim: int, base: float = 10000.0) -> np.ndarray:
    """Returns ``[seq_len, head_dim//2, 2]`` (cos, sin) cache, float32."""
    freqs = 1.0 / (
        base ** (np.arange(0, head_dim, 2)[: head_dim // 2].astype(np.float32) / head_dim)
    )
    t = np.arange(seq_len, dtype=np.float32)
    angles = np.outer(t, freqs)  # [seq_len, head_dim//2]
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1)


def apply_rotary_emb(x: jax.Array, freqs_cis: jax.Array) -> jax.Array:
    """Rotate adjacent channel pairs.

    Args:
        x: ``[B, S, H, D]`` queries or keys.
        freqs_cis: ``[S, D//2, 2]`` cos/sin cache slice for these positions.
    """
    B, S, H, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, S, H, D // 2, 2)
    fc = freqs_cis.reshape(1, S, 1, D // 2, 2)
    cos, sin = fc[..., 0], fc[..., 1]
    x0, x1 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(B, S, H, D).astype(x.dtype)
