"""Fused divided-attention SUBLAYER Pallas kernel for the ViT encoder.

Round-4 measured the encoder block at ~2.41 ms/clip/block with a FLOP
floor of ~1.2: the r4 grouped-attention kernel removed the score/softmax
HBM round-trips but still pays per-call layout traffic — q/k/v group-major
relayouts, the CLS concat, separate LN / qkv / proj / residual streams all
touch the full [12552, 768] activation in HBM (PERFORMANCE.md round-4
encoder roofline). This kernel fuses the ENTIRE attention sublayer

    y = x + proj(divided_attention(layernorm(x)))

into one ``pallas_call``: per grid cell it reads one pack of token rows
once, runs LN, the per-head-pair QKV projections, the grouped masked
softmax-attention (CLS key/value column included), the output projection
and the residual add entirely in VMEM, and writes the pack's output rows
once. Weights stay VMEM-resident across the whole grid (constant block
index), so HBM traffic per sublayer is exactly one activation read + one
write + one weight fetch.

Layout contract (group-major — the caller transposes the residual stream
between the time and space sublayers, two XLA transposes per block):

  x_tok : [B', G*L, D]   tokens, group-major (each group's L rows
                          contiguous; time axis: groups = spatial
                          locations, L = frames; space axis: groups =
                          frames, L = locations)
  x_cls : [B', 1, D]     the CLS row, carried separately so token packs
                          stay Mosaic-legal (no 1+G*L odd shapes)

The CLS token attends globally over all 1 + G*L positions; every token
group additionally attends to the CLS key/value (reference
``vit_helper.py:80-172`` semantics, matching ``DividedAttention``'s
einsum formulation). The kernel emits flash-style partial (max, sumexp,
weighted-value) statistics for the CLS query per pack; the wrapper
combines them (plus the CLS self-term) in XLA — exact, not approximate.

Per-head math on lane-fused slabs: heads are never transposed out into
a separate axis. Each 128-lane slab holds 128/hd heads; per-head scores
come from lane-masked matmuls (``dot(where(lane_in_head, q, 0), k.T)``
sums only that head's lanes — exact), and per-head outputs land in
disjoint lane slabs so the slab sum reassembles the fused layout with no
scatter. The masked-lane FLOP waste is bounded by heads_per_slab (2x for
hd=64) on the score/output dots only, ~1%% of encoder FLOPs.

Inference-only by design (gated on ``not train`` — drop-path/dropout are
identity here); training keeps the einsum path, which remains the
oracle-parity anchor. Reference: ``vit_helper.py:80-172`` (divided
attention), ``vit_helper.py:392-473`` (block wiring).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30
# Upper bound for pack rows R = P*L: the per-head scores buffer is
# [R, R] f32 (512 -> 1 MB) and q/k/v slabs are [R, 128]; with resident
# weights (4 x D*D bf16 ~ 4.7 MB at D=768) this keeps a cell under
# ~11 MB of VMEM.
_MAX_ROWS = 512


def _pick_pack(G: int, L: int, max_rows: int = _MAX_ROWS) -> int:
    """Pack size P (groups per grid cell): the largest divisor of G with
    P*L <= max_rows, preferring sublane-friendly row counts (div 16, then
    div 8); falls back to P=G (full-array block, always Mosaic-legal)."""
    if L > max_rows:
        raise ValueError(
            f"fused encoder sublayer: group length L={L} exceeds the "
            f"kernel's max pack rows ({max_rows}); no legal pack exists "
            "— use the einsum path (MotionFormerConfig."
            "fused_encoder_block=False) for this geometry"
        )
    full = G * L
    for align in (16, 8):
        best = 0
        for p in range(1, G + 1):
            r = p * L
            if G % p == 0 and r <= max_rows and r % align == 0:
                best = p
        if best:
            return best
    return G if full <= max_rows else max(
        p for p in range(1, G + 1) if G % p == 0 and p * L <= max_rows
    )


def _layernorm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _kernel(
    x_ref, cq_ref, ck_ref, cv_ref, lns_ref, lnb_ref,
    wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, wp_ref, bp_ref,
    y_ref, cm_ref, cl_ref, ca_ref,
    *, L: int, hd: int, eps: float,
):
    R, D = x_ref.shape[1], x_ref.shape[2]
    n_slabs = D // 128
    hps = 128 // hd  # heads per 128-lane slab
    cdt = x_ref.dtype
    x = x_ref[0]  # [R, D]
    ln = _layernorm(x, lns_ref[0], lnb_ref[0], eps).astype(cdt)
    scale = hd ** -0.5

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // L
    col_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // L
    gmask = row_g == col_g

    # y accumulates the projection incrementally per 128-lane slab
    # (acc += out_slab @ wproj[slab_rows, :]) — mathematically identical
    # to projecting the concatenated attention output, but no [R, D]
    # slab-concat buffer stays live across the head-pair loop (VMEM:
    # the space-axis cell overflows 16 MB otherwise).
    acc = x.astype(jnp.float32) + bp_ref[0].astype(jnp.float32)
    cm_slabs, cl_slabs, ca_slabs = [], [], []
    for sl in range(n_slabs):
        cols = slice(sl * 128, (sl + 1) * 128)
        q = jnp.dot(ln, wq_ref[:, cols], preferred_element_type=jnp.float32)
        q = ((q + bq_ref[:, cols].astype(jnp.float32)) * scale).astype(cdt)
        k = jnp.dot(ln, wk_ref[:, cols], preferred_element_type=jnp.float32)
        k = (k + bk_ref[:, cols].astype(jnp.float32)).astype(cdt)
        v = jnp.dot(ln, wv_ref[:, cols], preferred_element_type=jnp.float32)
        v = (v + bv_ref[:, cols].astype(jnp.float32)).astype(cdt)
        cq = cq_ref[0, :, cols]  # [1, 128], pre-scaled by the wrapper
        ck = ck_ref[0, :, cols]
        cv = cv_ref[0, :, cols]

        o_slab = jnp.zeros((R, 128), jnp.float32)
        cm_slab = jnp.zeros((1, 128), jnp.float32)
        cl_slab = jnp.zeros((1, 128), jnp.float32)
        ca_slab = jnp.zeros((1, 128), jnp.float32)
        for h in range(hps):
            mh = (lane // hd) == h  # [1, 128]
            qm = jnp.where(mh, q, jnp.zeros_like(q))
            vm = jnp.where(mh, v, jnp.zeros_like(v))
            # token-group attention (+ CLS column)
            s = jnp.dot(qm, k.T, preferred_element_type=jnp.float32)
            s = jnp.where(gmask, s, _NEG_INF)
            sc = jnp.sum(
                qm.astype(jnp.float32) * ck.astype(jnp.float32),
                axis=-1, keepdims=True,
            )  # [R, 1]
            mx = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), sc)
            p = jnp.exp(s - mx)
            pc = jnp.exp(sc - mx)
            den = jnp.sum(p, axis=-1, keepdims=True) + pc
            o = jnp.dot(p.astype(cdt), vm, preferred_element_type=jnp.float32)
            o = o + pc * jnp.where(mh, cv, jnp.zeros_like(cv)).astype(
                jnp.float32
            )
            o_slab = o_slab + o / den
            # CLS-query partials over this pack's rows (flash-style)
            km = jnp.where(mh, k, jnp.zeros_like(k))
            sct = jnp.sum(
                km.astype(jnp.float32) * cq.astype(jnp.float32),
                axis=-1, keepdims=True,
            )  # [R, 1]
            mh_max = jnp.max(sct, axis=0, keepdims=True)  # [1, 1]
            e = jnp.exp(sct - mh_max)
            lh = jnp.sum(e, axis=0, keepdims=True)  # [1, 1]
            acch = jnp.sum(
                e * vm.astype(jnp.float32), axis=0, keepdims=True
            )  # [1, 128]
            fmask = mh.astype(jnp.float32)
            cm_slab = cm_slab + mh_max * fmask
            cl_slab = cl_slab + lh * fmask
            ca_slab = ca_slab + acch
        acc = acc + jnp.dot(
            o_slab.astype(cdt), wp_ref[cols, :],
            preferred_element_type=jnp.float32,
        )
        cm_slabs.append(cm_slab)
        cl_slabs.append(cl_slab)
        ca_slabs.append(ca_slab)

    y_ref[0] = acc.astype(cdt)
    cm_ref[0, 0] = jnp.concatenate(cm_slabs, axis=-1)
    cl_ref[0, 0] = jnp.concatenate(cl_slabs, axis=-1)
    ca_ref[0, 0] = jnp.concatenate(ca_slabs, axis=-1)


def fused_attention_sublayer(
    x_tok: jax.Array,   # [B', G*L, D] group-major
    x_cls: jax.Array,   # [B', 1, D]
    ln_scale: jax.Array,   # [D]
    ln_bias: jax.Array,    # [D]
    wqkv: jax.Array,       # [D, 3*D]  (q | k | v column order)
    bqkv: Optional[jax.Array],  # [3*D] or None
    wproj: jax.Array,      # [D, D]
    bproj: Optional[jax.Array],  # [D] or None
    *,
    num_heads: int,
    L: int,
    eps: float,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One divided-attention sublayer, fused: returns
    ``(x_tok + proj(attn), x_cls + proj(cls_attn))``."""
    Bp, N, D = x_tok.shape
    if N % L:
        raise ValueError(f"tokens {N} not divisible by group length {L}")
    G = N // L
    hd = D // num_heads
    if D % 128 or 128 % hd:
        raise ValueError(f"D={D} must be lane-divisible and hd={hd} | 128")
    P = _pick_pack(G, L)
    R = P * L
    n_packs = G // P
    cdt = x_tok.dtype

    if bqkv is None:
        bqkv = jnp.zeros((3 * D,), jnp.float32)
    if bproj is None:
        bproj = jnp.zeros((D,), jnp.float32)
    wqkv = wqkv.astype(cdt)
    wq, wk, wv = wqkv[:, :D], wqkv[:, D : 2 * D], wqkv[:, 2 * D :]
    bqkv = bqkv.astype(jnp.float32)
    bq, bk, bv = bqkv[:D], bqkv[D : 2 * D], bqkv[2 * D :]
    wproj = wproj.astype(cdt)
    bproj = bproj.astype(jnp.float32)

    # CLS q/k/v in XLA (one row per segment-batch; trivially cheap)
    ln_cls = _layernorm(x_cls, ln_scale, ln_bias, eps).astype(cdt)
    cls_q = (
        jnp.einsum("bnd,df->bnf", ln_cls, wq.astype(cdt))
        + bq.astype(jnp.float32)
    ) * hd ** -0.5
    cls_k = jnp.einsum("bnd,df->bnf", ln_cls, wk.astype(cdt)) + bk.astype(
        jnp.float32
    )
    cls_v = jnp.einsum("bnd,df->bnf", ln_cls, wv.astype(cdt)) + bv.astype(
        jnp.float32
    )
    cls_q, cls_k, cls_v = (
        cls_q.astype(cdt), cls_k.astype(cdt), cls_v.astype(cdt)
    )

    tok_blk = pl.BlockSpec((1, R, D), lambda b, p: (b, p, 0))
    cls_blk = pl.BlockSpec((1, 1, D), lambda b, p: (b, 0, 0))
    vec_blk = pl.BlockSpec((1, D), lambda b, p: (0, 0))
    mat_blk = pl.BlockSpec((D, D), lambda b, p: (0, 0))
    # partials are 4-D [B', n_packs, 1, D] so the last two block dims are
    # full array dims (Mosaic requires div-(8,128) or full; a middle
    # size-1 block over the pack axis is neither)
    part_blk = pl.BlockSpec((1, 1, 1, D), lambda b, p: (b, p, 0, 0))

    kern = functools.partial(_kernel, L=L, hd=hd, eps=eps)
    y_tok, cls_m, cls_l, cls_a = pl.pallas_call(
        kern,
        grid=(Bp, n_packs),
        in_specs=[
            tok_blk, cls_blk, cls_blk, cls_blk, vec_blk, vec_blk,
            mat_blk, mat_blk, mat_blk, vec_blk, vec_blk, vec_blk,
            mat_blk, vec_blk,
        ],
        out_specs=(tok_blk, part_blk, part_blk, part_blk),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, N, D), cdt),
            jax.ShapeDtypeStruct((Bp, n_packs, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, n_packs, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, n_packs, 1, D), jnp.float32),
        ),
        interpret=interpret,
    )(
        x_tok, cls_q[:, None] if cls_q.ndim == 2 else cls_q,
        cls_k[:, None] if cls_k.ndim == 2 else cls_k,
        cls_v[:, None] if cls_v.ndim == 2 else cls_v,
        ln_scale.reshape(1, D), ln_bias.reshape(1, D),
        wq, wk, wv,
        bq.reshape(1, D), bk.reshape(1, D), bv.reshape(1, D),
        wproj, bproj.reshape(1, D),
    )

    # CLS combine: per-lane flash merge over packs + the CLS self-term.
    # Within each head's hd lanes m/l are broadcast-consistent, so the
    # merge is pure elementwise math — no head axis needed.
    cls_m = cls_m[:, :, 0]  # [B', n_packs, D]
    cls_l = cls_l[:, :, 0]
    cls_a = cls_a[:, :, 0]
    cqf = cls_q.astype(jnp.float32)[:, 0]  # [B', D]
    ckf = cls_k.astype(jnp.float32)[:, 0]
    cvf = cls_v.astype(jnp.float32)[:, 0]
    prod = (cqf * ckf).reshape(Bp, num_heads, hd)
    s_self = jnp.repeat(
        jnp.sum(prod, axis=-1, keepdims=True), hd, axis=-1
    ).reshape(Bp, D)  # per-lane broadcast of the per-head self score
    m_tot = jnp.maximum(jnp.max(cls_m, axis=1), s_self)  # [B', D]
    l_tot = (
        jnp.sum(cls_l * jnp.exp(cls_m - m_tot[:, None]), axis=1)
        + jnp.exp(s_self - m_tot)
    )
    a_tot = (
        jnp.sum(cls_a * jnp.exp(cls_m - m_tot[:, None]), axis=1)
        + jnp.exp(s_self - m_tot) * cvf
    )
    cls_attn = (a_tot / l_tot).astype(cdt)  # [B', D]
    y_cls = (
        x_cls.astype(jnp.float32)
        + jnp.einsum("bd,df->bf", cls_attn, wproj.astype(cdt)).astype(
            jnp.float32
        )[:, None]
        + bproj.astype(jnp.float32)
    ).astype(cdt)
    return y_tok, y_cls


def _pick_rows(N: int, max_rows: int = 256) -> int:
    """Token-block size for the MLP kernel: largest divisor of N up to
    max_rows, preferring sublane-aligned counts."""
    for align in (16, 8, 1):
        best = 0
        for r in range(1, min(N, max_rows) + 1):
            if N % r == 0 and r % align == 0:
                best = r
        if best:
            return best
    return N


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 —
    far below bf16 rounding); Mosaic has no erf/erfc lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # exact (erf) gelu to match the einsum path's approximate=False
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _mlp_kernel(
    x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
    *, eps: float, n_slabs: int, slab: int,
):
    cdt = x_ref.dtype
    x = x_ref[0]  # [R, D]
    ln = _layernorm(x, lns_ref[0], lnb_ref[0], eps).astype(cdt)
    acc = x.astype(jnp.float32) + b2_ref[0].astype(jnp.float32)
    for s in range(n_slabs):
        cols = slice(s * slab, (s + 1) * slab)
        h = jnp.dot(ln, w1_ref[:, cols], preferred_element_type=jnp.float32)
        h = _gelu_exact(h + b1_ref[:, cols].astype(jnp.float32)).astype(cdt)
        acc = acc + jnp.dot(
            h, w2_ref[cols, :], preferred_element_type=jnp.float32
        )
    y_ref[0] = acc.astype(cdt)


def fused_mlp_sublayer(
    x: jax.Array,          # [B', N, D]
    ln_scale: jax.Array,   # [D]
    ln_bias: jax.Array,    # [D]
    w1: jax.Array,         # [D, Dh]
    b1: Optional[jax.Array],
    w2: jax.Array,         # [Dh, D]
    b2: Optional[jax.Array],
    *,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``x + fc2(gelu(fc1(layernorm(x))))``: token-blocked, weights
    VMEM-resident, the [N, Dh] hidden activation never touches HBM (XLA
    pays 2 full hidden-tensor round-trips for the same math). The hidden
    dim is processed in D-wide slabs so only one [R, D] hidden slab is
    live at a time."""
    Bp, N, D = x.shape
    Dh = w1.shape[1]
    if Dh % D:
        raise ValueError(f"hidden {Dh} must be a multiple of D={D}")
    cdt = x.dtype
    if b1 is None:
        b1 = jnp.zeros((Dh,), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((D,), jnp.float32)
    R = _pick_rows(N)
    kern = functools.partial(
        _mlp_kernel, eps=eps, n_slabs=Dh // D, slab=D
    )
    return pl.pallas_call(
        kern,
        grid=(Bp, N // R),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda b, p: (b, p, 0)),
            pl.BlockSpec((1, D), lambda b, p: (0, 0)),
            pl.BlockSpec((1, D), lambda b, p: (0, 0)),
            pl.BlockSpec((D, Dh), lambda b, p: (0, 0)),
            pl.BlockSpec((1, Dh), lambda b, p: (0, 0)),
            pl.BlockSpec((Dh, D), lambda b, p: (0, 0)),
            pl.BlockSpec((1, D), lambda b, p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, D), lambda b, p: (b, p, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, N, D), cdt),
        interpret=interpret,
    )(
        x, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
        w1.astype(cdt), b1.astype(jnp.float32).reshape(1, Dh),
        w2.astype(cdt), b2.astype(jnp.float32).reshape(1, D),
    )


def reference_sublayer(
    x_tok, x_cls, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
    *, num_heads, L, eps,
):
    """Plain-jnp ground truth for the fused sublayer (mirrors
    ``DividedAttention``'s einsum math on the group-major layout);
    used by the parity tests."""
    Bp, N, D = x_tok.shape
    G = N // L
    hd = D // num_heads
    cdt = x_tok.dtype
    x = jnp.concatenate([x_cls, x_tok], axis=1)
    ln = _layernorm(x, ln_scale, ln_bias, eps).astype(cdt)
    qkv = jnp.einsum("bnd,df->bnf", ln, wqkv.astype(cdt))
    if bqkv is not None:
        qkv = qkv + bqkv.astype(cdt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q * hd ** -0.5
    qh = q.reshape(Bp, 1 + N, num_heads, hd)
    kh = k.reshape(Bp, 1 + N, num_heads, hd)
    vh = v.reshape(Bp, 1 + N, num_heads, hd)
    # CLS attends globally
    cls_s = jnp.einsum(
        "bhd,bnhd->bhn", qh[:, 0], kh, preferred_element_type=jnp.float32
    )
    cls_p = jax.nn.softmax(cls_s, axis=-1).astype(cdt)
    cls_out = jnp.einsum("bhn,bnhd->bhd", cls_p, vh).reshape(Bp, 1, D)
    # groups attend within-group + CLS column
    qg = qh[:, 1:].reshape(Bp, G, L, num_heads, hd)
    kg = kh[:, 1:].reshape(Bp, G, L, num_heads, hd)
    vg = vh[:, 1:].reshape(Bp, G, L, num_heads, hd)
    s = jnp.einsum(
        "bglhd,bgmhd->bghlm", qg, kg, preferred_element_type=jnp.float32
    )
    sc = jnp.einsum(
        "bglhd,bhd->bghl", qg, kh[:, 0], preferred_element_type=jnp.float32
    )[..., None]
    full = jnp.concatenate([sc, s], axis=-1)
    p = jax.nn.softmax(full, axis=-1)
    p_cls, p_tok = p[..., :1], p[..., 1:].astype(cdt)
    out = jnp.einsum("bghlm,bgmhd->bglhd", p_tok, vg)
    out = out + p_cls.transpose(0, 1, 3, 2, 4).astype(cdt) * vh[:, 0][
        :, None, None
    ]
    out = out.reshape(Bp, N, D)
    both = jnp.concatenate([cls_out, out], axis=1)
    proj = jnp.einsum("bnd,df->bnf", both, wproj.astype(cdt))
    if bproj is not None:
        proj = proj + bproj.astype(cdt)
    y = x + proj
    return y[:, 1:], y[:, :1]
