"""Pallas TPU kernel: position-bounded KV-cache decode attention.

The decode hot loop's HBM traffic is dominated by streaming the KV cache;
the XLA path reads the full cache buffer every step even though only
positions ``< pos`` are valid. This kernel DMAs exactly
``ceil(pos / BLOCK)`` key/value blocks per batch row — a dynamic trip
count — with a flash-style online softmax, and fuses the current position's
K/V contribution.

Mosaic-layout notes: heads and head_dim are merged into one trailing axis
``D = H * hd`` (1536 for the flagship model — a lane-tiling-aligned
multiple of 128; hd=96 alone is not DMA-sliceable). Per-head reductions are
expressed as matmuls against a constant block-diagonal 0/1 matrix
``M[D, H]`` (``M[i, h] = (i // hd == h)``), so every op is an MXU matmul or
an elementwise VPU op — no in-kernel reshapes.

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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 64


def _make_kernel(H: int, hd: int):
    D = H * hd

    def _kernel(pos_ref, q_ref, kcur_ref, vcur_ref, k_hbm, v_hbm, o_ref):
        """Grid: (B,). Block-streamed online-softmax attention."""
        b = pl.program_id(0)
        pos = pos_ref[0]
        BS = DEFAULT_BLOCK
        scale = 1.0 / (hd**0.5)
        q = q_ref[pl.ds(b, 1), :].astype(jnp.float32) * scale  # [1, D]
        # block-diagonal head map M[i, h] = (i // hd == h)
        lane = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
        head = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
        M = (lane // hd == head).astype(jnp.float32)  # [D, H]

        def body(scr_k, scr_v, sem_k, sem_v):
            n_blocks = pl.cdiv(pos, BS)  # dynamic trip count: exact reads

            def block_step(blk, state):
                m, l, acc = state  # m, l: [1, H]; acc: [1, D]
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
                k_blk = scr_k[...].astype(jnp.float32)  # [BS, D]
                v_blk = scr_v[...].astype(jnp.float32)
                # per-head scores via block-diagonal contraction: [BS, H]
                scores = jnp.dot(
                    k_blk * q, M, preferred_element_type=jnp.float32
                )
                j_idx = blk * BS + jax.lax.broadcasted_iota(
                    jnp.int32, (BS, H), 0
                )
                scores = jnp.where(j_idx < pos, scores, -1e30)
                m_new = jnp.maximum(m, jnp.max(scores, axis=0, keepdims=True))
                alpha_l = jnp.exp(m - m_new)  # [1, H]
                p = jnp.exp(scores - m_new)  # [BS, H]
                l_new = l * alpha_l + jnp.sum(p, axis=0, keepdims=True)
                # expand per-head weights back to lanes and accumulate
                p_lanes = jnp.dot(
                    p, M.T, preferred_element_type=jnp.float32
                )  # [BS, D]
                alpha_lanes = jnp.dot(
                    alpha_l, M.T, preferred_element_type=jnp.float32
                )  # [1, D]
                acc_new = acc * alpha_lanes + jnp.sum(
                    p_lanes * v_blk, axis=0, keepdims=True
                )
                return m_new, l_new, acc_new

            m0 = jnp.full((1, H), -1e30, jnp.float32)
            l0 = jnp.zeros((1, H), jnp.float32)
            acc0 = jnp.zeros((1, D), jnp.float32)
            m, l, acc = jax.lax.fori_loop(
                0, n_blocks, block_step, (m0, l0, acc0)
            )

            # fuse the current position's K/V (always attended)
            k_c = kcur_ref[pl.ds(b, 1), :].astype(jnp.float32)  # [1, D]
            v_c = vcur_ref[pl.ds(b, 1), :].astype(jnp.float32)
            s_c = jnp.dot(k_c * q, M, preferred_element_type=jnp.float32)  # [1, H]
            m_new = jnp.maximum(m, s_c)
            alpha_l = jnp.exp(m - m_new)
            p_c = jnp.exp(s_c - m_new)
            l = l * alpha_l + p_c
            alpha_lanes = jnp.dot(alpha_l, M.T, preferred_element_type=jnp.float32)
            pc_lanes = jnp.dot(p_c, M.T, preferred_element_type=jnp.float32)
            acc = acc * alpha_lanes + pc_lanes * v_c
            l_lanes = jnp.dot(l, M.T, preferred_element_type=jnp.float32)
            o_ref[pl.ds(b, 1), :] = (acc / l_lanes).astype(o_ref.dtype)

        pl.run_scoped(
            body,
            scr_k=pltpu.VMEM((DEFAULT_BLOCK, D), k_hbm.dtype),
            scr_v=pltpu.VMEM((DEFAULT_BLOCK, D), v_hbm.dtype),
            sem_k=pltpu.SemaphoreType.DMA(()),
            sem_v=pltpu.SemaphoreType.DMA(()),
        )

    return _kernel


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
    D = H * hd
    assert D % 128 == 0, f"H*hd={D} must be lane-aligned (128)"
    # pad cache length to a block multiple (padding never read: pos <= S)
    pad = (-S) % DEFAULT_BLOCK
    if pad:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Sp = S + pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q (full, row-indexed)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_cur
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_cur
            pl.BlockSpec(memory_space=pl.ANY),  # k_cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v_cache stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_kernel(H, hd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
        interpret=interpret,
    )(
        jnp.reshape(pos.astype(jnp.int32), (1,)),
        q.reshape(B, D),
        k_cur.reshape(B, D),
        v_cur.reshape(B, D),
        k_cache.reshape(B, Sp, D),
        v_cache.reshape(B, Sp, D),
    )
    return out.reshape(B, H, hd)


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
