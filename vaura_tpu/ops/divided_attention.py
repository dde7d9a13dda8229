"""Pallas TPU kernel: fused grouped attention with a shared CLS column.

Divided space-time attention (reference ``vit_helper.py:80-172``) runs
many small independent attentions: on the time axis each of the n=196
spatial locations attends over only f=8 frames (+ the CLS key); on the
space axis each of the f=8 frames attends over its n=196 locations
(+ CLS). As XLA einsums these lower to [8x64x8] batched matmuls (time)
and f32 score materialization (space) — measured at ~21 of the encoder's
38 ms/clip for ~1% of its FLOPs (PERFORMANCE.md round-4 encoder section).

This kernel packs P groups into one MXU tile ([P*L, hd] queries against
[P*L, hd] keys), computes the all-pairs scores in one matmul, masks the
cross-group blocks, and fuses the (f32) softmax and the value matmul in
VMEM — scores never touch HBM, and the matmuls are MXU-shaped. The
shared CLS key/value ride along as one extra scores column. The 28x
FLOP waste on the masked cross-group blocks is irrelevant: these ops are
~1% of encoder FLOPs (measured: time-core 8.7 -> 3.7, space-core
11.0 -> 4.0 ms/clip at B=32; the caller's group-layout transposes cost
~3.5 ms/clip on top and cannot be removed — Mosaic block rules require
the last two block dims (div 8 | full, div 128 | full), which rules out
reading the natural [B, f, n, H, hd] layout with H blocked at stride 1
and hd=64 lanes; measured alternatives are in PERFORMANCE.md round 4).

Layout contract (caller transposes once per axis):
  q, k, v:      [BH, G, L, hd]   (BH = batch*heads, G groups of L tokens)
  cls_k, cls_v: [BH, 1, hd]
  out:          [BH, G, L, hd]   softmax((q k^T) + cls col) @ (v ++ cls_v)

``q`` must be pre-scaled by 1/sqrt(hd) (matching the einsum path).
Differentiable: ``jax.custom_vjp`` with the backward computed through the
reference einsum formulation (only paid when an unfrozen encoder trains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30

# Upper bound for the packed tile rows P*L: the scores buffer is
# [P*L, P*L] f32 in VMEM (256 -> 256 KB), well within the ~16 MB budget
# alongside the double-buffered q/k/v blocks. The TPU also requires the
# second-to-last block dim (L) to be divisible by 8 or full — L=8 (time)
# and L=196=full (space) both satisfy it.
_MAX_ROWS = 256


def _pick_pack(G: int, L: int) -> int:
    """Largest divisor P of G with P*L <= _MAX_ROWS."""
    best = 1
    for p in range(1, G + 1):
        if G % p == 0 and p * L <= _MAX_ROWS:
            best = p
    return best


def _kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref, *, P: int, L: int,
            hd: int):
    R = P * L
    q = q_ref[0].reshape(R, hd)
    k = k_ref[0].reshape(R, hd)
    v = v_ref[0].reshape(R, hd)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [R, R]
    if P > 1:
        row_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // L
        col_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // L
        scores = jnp.where(row_g == col_g, scores, _NEG_INF)

    cls_k = ck_ref[0, 0].reshape(1, hd)
    cls_v = cv_ref[0, 0].reshape(1, hd)
    # lane-dim multiply-reduce on the VPU: Mosaic cannot lower the
    # [1,hd]->[hd,1] transpose a column matmul would need
    s_cls = jnp.sum(
        q.astype(jnp.float32) * cls_k.astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # [R, 1]
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_cls)
    p = jnp.exp(scores - m)
    p_cls = jnp.exp(s_cls - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_cls
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out = out + p_cls * cls_v.astype(jnp.float32)  # [R,1]*[1,hd] broadcast
    o_ref[0] = (out / denom).reshape(P, L, hd).astype(o_ref.dtype)


def _reference(q, k, v, cls_k, cls_v):
    """Einsum formulation (matches ``DividedAttention``'s per-axis math);
    ground truth for parity tests and the custom-vjp backward."""
    scores = jnp.einsum(
        "bgld,bgmd->bglm", q, k, preferred_element_type=jnp.float32
    )
    s_cls = jnp.einsum(
        "bgld,bd->bgl", q, cls_k[:, 0], preferred_element_type=jnp.float32
    )[..., None]
    full = jnp.concatenate([s_cls, scores], axis=-1)
    p = jax.nn.softmax(full, axis=-1)
    p_cls, p_tok = p[..., :1], p[..., 1:].astype(v.dtype)
    out = jnp.einsum("bglm,bgmd->bgld", p_tok, v)
    return out + p_cls.astype(cls_v.dtype) * cls_v[:, None]


def _pallas_forward(q, k, v, cls_k, cls_v, interpret: bool):
    BH, G, L, hd = q.shape
    P = _pick_pack(G, L)
    kern = functools.partial(_kernel, P=P, L=L, hd=hd)
    blk = pl.BlockSpec((1, P, L, hd), lambda b, g: (b, g, 0, 0))
    # TPU block shapes need the last two dims (div 8, div 128) or equal to
    # the array dims — a middle singleton makes the cls block (1, 1, hd)
    # with both trailing dims equal to the array's
    cls_blk = pl.BlockSpec((1, 1, hd), lambda b, g: (b, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(BH, G // P),
        in_specs=[blk, blk, blk, cls_blk, cls_blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, cls_k, cls_v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def grouped_cls_attention(q, k, v, cls_k, cls_v, interpret: bool = False):
    """Fused grouped attention: q/k/v/out ``[BH, G, L, hd]``, cls
    ``[BH, 1, hd]``; q pre-scaled by 1/sqrt(hd)."""
    return _pallas_forward(q, k, v, cls_k, cls_v, interpret)


def _fwd(q, k, v, cls_k, cls_v, interpret):
    return _pallas_forward(q, k, v, cls_k, cls_v, interpret), (
        q, k, v, cls_k, cls_v
    )


def _bwd(interpret, res, g):
    _, vjp = jax.vjp(_reference, *res)
    return vjp(g.astype(res[0].dtype))


grouped_cls_attention.defvjp(_fwd, _bwd)
