"""Pallas TPU kernel: position-bounded KV-cache decode attention.

The decode hot loop's HBM traffic is dominated by streaming the KV cache;
the XLA path reads the full (bucketed) cache buffer every step even though
only positions ``< pos`` are valid. This kernel DMAs exactly
``ceil(pos / BLOCK)`` key/value blocks per head batch — a dynamic trip
count — with a flash-style online softmax, and fuses the current position's
K/V contribution.

Shapes (one decoder layer, one step):
  q:       [B, H, hd]      current query
  k_cache: [B, S, H, hd]   cache (stale at >= pos)  — resident in HBM
  v_cache: [B, S, H, hd]
  k_cur:   [B, H, hd]      this position's K/V (not yet committed)
  v_cur:   [B, H, hd]
  pos:     scalar int32
  -> out:  [B, H, hd]

Used from ``Attention``'s decode branch when
``SamplerConfig.use_pallas_decode`` is set (TPU only; the dense XLA path
remains the reference implementation and the CPU/test fallback).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 64


def _kernel(pos_ref, q_ref, kcur_ref, vcur_ref, k_hbm, v_hbm, o_ref):
    """Grid: (B,). Block-streamed online-softmax attention."""
    b = pl.program_id(0)
    pos = pos_ref[0]
    H, hd = q_ref.shape[1], q_ref.shape[2]
    S = k_hbm.shape[1]
    BS = DEFAULT_BLOCK
    scale = 1.0 / (hd**0.5)
    q = q_ref[0].astype(jnp.float32) * scale  # [H, hd]

    def body(scr_k, scr_v, sem_k, sem_v):
        n_blocks = pl.cdiv(pos, BS)  # dynamic trip count: exact reads

        def block_step(blk, state):
            m, l, acc = state
            cp_k = pltpu.make_async_copy(
                k_hbm.at[b, pl.ds(blk * BS, BS)], scr_k, sem_k
            )
            cp_v = pltpu.make_async_copy(
                v_hbm.at[b, pl.ds(blk * BS, BS)], scr_v, sem_v
            )
            cp_k.start()
            cp_v.start()
            cp_k.wait()
            cp_v.wait()
            k_blk = scr_k[...].astype(jnp.float32)  # [BS, H, hd]
            v_blk = scr_v[...].astype(jnp.float32)
            # per-head scores: [H, BS]
            scores = jnp.einsum(
                "hd,jhd->hj", q, k_blk, preferred_element_type=jnp.float32
            )
            j_idx = blk * BS + jax.lax.broadcasted_iota(
                jnp.int32, (H, BS), dimension=1
            )
            scores = jnp.where(j_idx < pos, scores, -1e30)
            m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new)  # [H, BS]
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * alpha + jnp.einsum(
                "hj,jhd->hd", p, v_blk, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((H, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((H, 1), jnp.float32)
        acc0 = jnp.zeros((H, hd), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, block_step, (m0, l0, acc0))

        # fuse the current position's K/V (always attended)
        k_c = kcur_ref[0].astype(jnp.float32)  # [H, hd]
        v_c = vcur_ref[0].astype(jnp.float32)
        s_c = jnp.sum(q * k_c, axis=1, keepdims=True)  # [H, 1]
        m_new = jnp.maximum(m, s_c)
        alpha = jnp.exp(m - m_new)
        p_c = jnp.exp(s_c - m_new)
        l = l * alpha + p_c
        acc = acc * alpha + p_c * v_c
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        scr_k=pltpu.VMEM((DEFAULT_BLOCK,) + q_ref.shape[1:], k_hbm.dtype),
        scr_v=pltpu.VMEM((DEFAULT_BLOCK,) + q_ref.shape[1:], v_hbm.dtype),
        sem_k=pltpu.SemaphoreType.DMA(()),
        sem_v=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jax.Array,  # [B, H, hd]
    k_cache: jax.Array,  # [B, S, H, hd]
    v_cache: jax.Array,
    k_cur: jax.Array,  # [B, H, hd]
    v_cur: jax.Array,
    pos: jax.Array,  # scalar int32
    interpret: bool = False,
) -> jax.Array:
    B, H, hd = q.shape
    S = k_cache.shape[1]
    # pad cache length to a block multiple (padding never read: pos <= S)
    pad = (-S) % DEFAULT_BLOCK
    if pad:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k_cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v_cache stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, H, hd), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, hd), q.dtype),
        interpret=interpret,
    )(jnp.reshape(pos.astype(jnp.int32), (1,)), q, k_cur, v_cur, k_cache, v_cache)


def decode_attention_reference(q, k_cache, v_cache, k_cur, v_cur, pos):
    """Dense XLA reference (same math, full reads) for testing."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    qf = q.astype(jnp.float32) * scale
    S = k_cache.shape[1]
    scores_c = jnp.einsum("bhd,bshd->bhs", qf, k_cache.astype(jnp.float32))
    scores_c = jnp.where(jnp.arange(S)[None, None, :] < pos, scores_c, -1e30)
    s_self = jnp.einsum("bhd,bhd->bh", qf, k_cur.astype(jnp.float32))[..., None]
    scores = jnp.concatenate([scores_c, s_self], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhs,bshd->bhd", probs[..., :S], v_cache.astype(jnp.float32)
    ) + probs[..., S:] * v_cur.astype(jnp.float32)
    return out.astype(q.dtype)
