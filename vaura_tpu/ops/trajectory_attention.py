"""Trajectory attention + approximate spatial-attention kernels (TPU-first).

Behavioral equivalents of the reference's vendored Motionformer helpers
(reference ``models/modules/feature_extractors/avclip/motionformer_src/
vit_helper.py:174-313`` (TrajectoryAttention), ``nystrom_helper.py``,
``orthoformer_helper.py``, ``performer_helper.py``) for the
``attn_layer: trajectory`` encoder variant ("Keeping Your Eye on the
Ball: Trajectory Attention in Video Transformers", Patrick et al. 2021).
The reference default config disables them (``motionformer.py:137`` pins
``divided`` attention with ``APPROX_ATTN_TYPE='none'``); they are provided
for full encoder parity.

Design notes (vs the torch reference):
  * every function is a pure jittable map on ``[BH, N, d]`` arrays
    (batch x heads folded by the caller) with static ``num_frames`` — no
    data-dependent shapes, everything lowers to batched matmuls on the MXU;
  * softmax statistics in float32 regardless of input dtype;
  * the greedy orthogonal-landmark selection (a sequential algorithm by
    construction) runs as a ``lax.fori_loop`` over a fixed landmark count
    with masked argmin instead of in-place scatters;
  * performer random features take an explicit ``rng`` key instead of the
    reference's data-dependent seed hack (``vit_helper.py:252-254``), and
    orthogonalize via QR (same orthogonal-feature family as the Givens
    construction, reference ``performer_helper.py:12-70``).

The spatial step of trajectory attention returns ``[BH, N, F, d]``: for
every query token, one attention-aggregated "trajectory point" per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "trajectory_spatial_full",
    "nystrom_spatial_attn",
    "orthoformer",
    "performer_spatial_attn",
]


def _softmax32(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis)


# --------------------------------------------------------------------- #
# exact spatial step
# --------------------------------------------------------------------- #
def trajectory_spatial_full(
    q: jax.Array,  # [BH, N, d], pre-scaled is NOT expected (scale applied here)
    k: jax.Array,  # [BH, N, d]
    v: jax.Array,  # [BH, N, d]
    num_frames: int,
) -> jax.Array:
    """Full-attention trajectory formation (reference
    ``vit_helper.py:275-282``): scores of every query against all keys,
    softmax *within each frame*, per-frame value aggregation.

    Returns ``[BH, N, F, d]``.
    """
    BH, N, d = q.shape
    F = num_frames
    P = N // F
    scale = d**-0.5
    scores = jnp.einsum(
        "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = _softmax32(scores.reshape(BH, N, F, P), axis=-1)
    vf = v.reshape(BH, F, P, d)
    return jnp.einsum("bnfp,bfpd->bnfd", probs.astype(v.dtype), vf)


# --------------------------------------------------------------------- #
# Nystrom approximation
# --------------------------------------------------------------------- #
def _newton_schulz_pinv(K: jax.Array, n_iter: int = 6) -> jax.Array:
    """Quartic Newton-Schulz pseudo-inverse iteration for row-stochastic
    matrices (reference ``nystrom_helper.py:11-32``, init_option='exact')."""
    K = K.astype(jnp.float32)
    L = K.shape[-1]
    I = jnp.eye(L, dtype=jnp.float32)
    # ||K||_1 init: entries are softmax outputs (positive, rows sum to 1)
    V = K.swapaxes(-1, -2) / jnp.max(
        jnp.sum(K, axis=-2), axis=-1, keepdims=True
    )[..., None]
    for _ in range(n_iter):
        KV = K @ V
        V = 0.25 * V @ (13.0 * I - KV @ (15.0 * I - KV @ (7.0 * I - KV)))
    return V


def _segment_means(x: jax.Array, landmarks: int) -> jax.Array:
    """Mean-pool ``[BH, N, d]`` into ``landmarks`` contiguous segments,
    splitting unevenly exactly like the reference when ``N % landmarks``
    (reference ``nystrom_helper.py:52-95``): the first ``num_k`` landmarks
    average ``segs`` tokens, the rest ``segs + 1``."""
    BH, N, d = x.shape
    L = landmarks
    if N % L == 0:
        return x.reshape(BH, L, N // L, d).mean(axis=-2)
    segs = N // L
    num_k = (segs + 1) * L - N
    first = x[:, : num_k * segs].reshape(BH, num_k, segs, d).mean(axis=-2)
    last = (
        x[:, num_k * segs :].reshape(BH, L - num_k, segs + 1, d).mean(axis=-2)
    )
    return jnp.concatenate([first, last], axis=-2)


def nystrom_spatial_attn(
    q: jax.Array,  # [BH, N, d]
    k: jax.Array,
    v: jax.Array,
    landmarks: int = 64,
    num_frames: int = 8,
    inv_iters: int = 6,
    use_spatial_landmarks: bool = True,
) -> jax.Array:
    """Nystrom-approximated trajectory formation (reference
    ``nystrom_helper.py:35-111``): full space-time scores factorized
    through segment-mean landmarks, softmax over the spatial axis only.

    Returns ``[BH, N, F, d]``.
    """
    BH, N, d = k.shape
    F = num_frames
    P = N // F
    q = q * (d**-0.5)
    if use_spatial_landmarks:
        # group tokens by spatial location before segmenting, so each
        # landmark averages one spatial neighbourhood across time
        q2 = q.reshape(BH, F, P, d).swapaxes(1, 2).reshape(BH, N, d)
        k2 = k.reshape(BH, F, P, d).swapaxes(1, 2).reshape(BH, N, d)
    else:
        q2, k2 = q, k
    q_land = lax.stop_gradient(_segment_means(q2, landmarks))
    k_land = lax.stop_gradient(_segment_means(k2, landmarks))

    kernel_1 = _softmax32(jnp.einsum("bnd,bld->bnl", q, k_land))
    kernel_2 = _softmax32(jnp.einsum("bld,bmd->blm", q_land, k_land))
    kernel_3 = _softmax32(
        jnp.einsum("bld,bnd->bln", q_land, k).reshape(BH, landmarks, F, P)
    )
    attn = kernel_1 @ _newton_schulz_pinv(kernel_2, inv_iters)
    vf = v.reshape(BH, F, P, d)
    lv = jnp.einsum("blfp,bfpd->blfd", kernel_3.astype(v.dtype), vf)
    return jnp.einsum("bnl,blfd->bnfd", attn.astype(v.dtype), lv)


# --------------------------------------------------------------------- #
# Orthoformer approximation
# --------------------------------------------------------------------- #
def _orthogonal_landmarks(
    q: jax.Array, num_landmarks: int, rng: jax.Array
) -> jax.Array:
    """Greedily pick ``num_landmarks`` queries that are maximally mutually
    orthogonal (reference ``orthoformer_helper.py:11-67``): start from a
    random query, then repeatedly add the candidate whose worst-case
    |cosine similarity| to the selected set is smallest.

    q: [BH, N, d]. Returns the *unnormalized* selected queries
    ``[BH, num_landmarks, d]`` (gradients stopped by the caller).
    """
    BH, N, d = q.shape
    qn = q.astype(jnp.float32)
    qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)

    first = jax.random.randint(rng, (BH,), 0, N)
    sel_idx = jnp.zeros((BH, num_landmarks), jnp.int32).at[:, 0].set(first)
    selected = jnp.zeros((BH, N), jnp.bool_).at[jnp.arange(BH), first].set(True)
    # worst-case |cos| of every candidate against the selected set so far
    max_cos = jnp.zeros((BH, N), jnp.float32)
    batch = jnp.arange(BH)

    def body(m, carry):
        sel_idx, selected, max_cos = carry
        last = qn[batch, sel_idx[:, m - 1]]  # [BH, d]
        cos = jnp.abs(jnp.einsum("bnd,bd->bn", qn, last))
        max_cos = jnp.maximum(max_cos, cos)
        scored = jnp.where(selected, jnp.inf, max_cos)
        nxt = jnp.argmin(scored, axis=-1)
        sel_idx = sel_idx.at[:, m].set(nxt)
        selected = selected.at[batch, nxt].set(True)
        return sel_idx, selected, max_cos

    sel_idx, _, _ = lax.fori_loop(
        1, num_landmarks, body, (sel_idx, selected, max_cos)
    )
    return jnp.take_along_axis(q, sel_idx[..., None], axis=1)


def orthoformer(
    q: jax.Array,  # [BH, N, d]
    k: jax.Array,
    v: jax.Array,
    num_landmarks: int = 64,
    num_frames: int = 8,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Orthoformer-approximated trajectory formation with shared landmarks
    (reference ``orthoformer_helper.py:70-103``): queries and keys both
    attend through a set of near-orthogonal landmark queries.

    Returns ``[BH, N, F, d]``.
    """
    BH, N, d = k.shape
    F = num_frames
    P = N // F
    if rng is None:
        rng = jax.random.PRNGKey(0)
    scale = d**-0.25
    q = q * scale
    k = k * scale
    landmarks = lax.stop_gradient(_orthogonal_landmarks(q, num_landmarks, rng))
    kernel_1 = _softmax32(jnp.einsum("bnd,bld->bnl", q, landmarks))
    kernel_2 = _softmax32(
        jnp.einsum("bld,bnd->bln", landmarks, k).reshape(
            BH, num_landmarks, F, P
        )
    )
    vf = v.reshape(BH, F, P, d)
    lv = jnp.einsum("blfp,bfpd->blfd", kernel_2.astype(v.dtype), vf)
    return jnp.einsum("bnl,blfd->bnfd", kernel_1.astype(v.dtype), lv)


# --------------------------------------------------------------------- #
# Performer approximation (FAVOR+)
# --------------------------------------------------------------------- #
def _orthogonal_gaussian(rng: jax.Array, m: int, d: int) -> jax.Array:
    """Random features with orthogonal rows and chi-distributed row norms
    (reference ``performer_helper.py:12-70``; QR instead of Givens)."""
    blocks = []
    n_full = m // d
    rngs = jax.random.split(rng, n_full + 2)
    for i in range(n_full):
        g = jax.random.normal(rngs[i], (d, d), jnp.float32)
        qmat, _ = jnp.linalg.qr(g)
        blocks.append(qmat.T)
    rem = m - n_full * d
    if rem > 0:
        g = jax.random.normal(rngs[n_full], (d, d), jnp.float32)
        qmat, _ = jnp.linalg.qr(g)
        blocks.append(qmat.T[:rem])
    proj = jnp.concatenate(blocks, axis=0)  # [m, d]
    norms = jnp.sqrt(
        jnp.sum(
            jax.random.normal(rngs[-1], (m, d), jnp.float32) ** 2, axis=-1
        )
    )
    return proj * norms[:, None]


def _softmax_kernel(
    x: jax.Array, proj: jax.Array, is_query: bool, eps: float = 1e-6
) -> jax.Array:
    """FAVOR+ positive softmax-kernel features (reference
    ``performer_helper.py:73-113``): phi(x) = exp(Wx/d^{1/4} - |x|^2/(2 sqrt d)
    - stabilizer) / sqrt(m)."""
    m, d = proj.shape
    ratio = m**-0.5
    norm = d**-0.25
    wx = jnp.einsum("bnd,md->bnm", x.astype(jnp.float32) * norm, proj)
    sq = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True) / (
        2.0 * d**0.5
    )
    z = wx - sq
    if is_query:
        stab = jnp.max(z, axis=-1, keepdims=True)
    else:
        stab = jnp.max(z, axis=(-1, -2), keepdims=True)
    return ratio * (jnp.exp(z - stab) + eps)


def performer_spatial_attn(
    q: jax.Array,  # [BH, N, d]
    k: jax.Array,
    v: jax.Array,
    num_frames: int = 8,
    num_features: int = 256,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Performer-approximated trajectory formation (reference
    ``vit_helper.py:249-283``): linear attention through positive random
    features, normalized per frame.

    Returns ``[BH, N, F, d]``.
    """
    BH, N, d = k.shape
    F = num_frames
    P = N // F
    if rng is None:
        rng = jax.random.PRNGKey(0)
    proj = _orthogonal_gaussian(rng, num_features, d)
    q_p = _softmax_kernel(q, proj, is_query=True)  # [BH, N, m]
    k_p = _softmax_kernel(k, proj, is_query=False).reshape(BH, F, P, -1)
    vf = v.reshape(BH, F, P, d).astype(jnp.float32)
    kv = jnp.einsum("bfpm,bfpd->bfmd", k_p, vf)
    num = jnp.einsum("bnm,bfmd->bnfd", q_p, kv)
    den = jnp.einsum("bnm,bfm->bnf", q_p, jnp.sum(k_p, axis=2))
    return (num / den[..., None]).astype(v.dtype)
