"""Parity of the fused encoder attention-sublayer kernel
(ops/encoder_fused.py) and the whole fused-block path against the einsum
formulation (interpret mode on CPU). The einsum path remains the
oracle-parity anchor (tests/test_reference_oracle_vit.py); these tests
pin the fused path to it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.ops.encoder_fused import (
    _pick_pack,
    fused_attention_sublayer,
    reference_sublayer,
)


def _args(seed, Bp, G, L, D, dtype=jnp.float32, with_bias=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    return dict(
        x_tok=jax.random.normal(ks[0], (Bp, G * L, D), dtype),
        x_cls=jax.random.normal(ks[1], (Bp, 1, D), dtype),
        ln_scale=jax.random.normal(ks[2], (D,)) * 0.1 + 1.0,
        ln_bias=jax.random.normal(ks[3], (D,)) * 0.1,
        wqkv=jax.random.normal(ks[4], (D, 3 * D), dtype) * D**-0.5,
        bqkv=jax.random.normal(ks[5], (3 * D,)) * 0.02 if with_bias else None,
        wproj=jax.random.normal(ks[6], (D, D), dtype) * D**-0.5,
        bproj=jax.random.normal(ks[7], (D,)) * 0.02 if with_bias else None,
    )


@pytest.mark.parametrize(
    "G,L,H",
    [
        (4, 2, 4),     # tiny time-like (hd=32)
        (2, 4, 4),     # tiny space-like
        (6, 3, 2),     # odd group length, hd=64
        (196, 8, 2),   # flagship time grouping
        (8, 196, 2),   # flagship space grouping
        (3, 5, 1),     # hd=128 (one head per slab)
    ],
)
@pytest.mark.slow
def test_sublayer_parity(G, L, H):
    kw = _args(0, 2, G, L, 128)
    got_t, got_c = fused_attention_sublayer(
        **kw, num_heads=H, L=L, eps=1e-6, interpret=True
    )
    want_t, want_c = reference_sublayer(**kw, num_heads=H, L=L, eps=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=3e-5, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(want_c), rtol=3e-5, atol=3e-5
    )


@pytest.mark.slow
def test_sublayer_parity_no_bias_bf16():
    kw = _args(1, 2, 6, 4, 128, jnp.bfloat16, with_bias=False)
    got_t, got_c = fused_attention_sublayer(
        **kw, num_heads=4, L=4, eps=1e-6, interpret=True
    )
    want_t, want_c = reference_sublayer(**kw, num_heads=4, L=4, eps=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_t, np.float32), np.asarray(want_t, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(got_c, np.float32), np.asarray(want_c, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_pick_pack_flagship():
    # time axis: G=196 spatial locations, L=8 frames -> packs of 28
    # groups (224 rows, div-16); space: G=8 frames, L=196 -> 784 rows
    assert _pick_pack(196, 8) * 8 % 16 == 0
    assert _pick_pack(196, 8) * 8 <= 512
    p_space = _pick_pack(8, 196)
    assert 8 % p_space == 0 and p_space * 196 % 8 == 0
    # fallback: no aligned divisor fits -> full-array pack stays legal
    assert _pick_pack(3, 5) in (1, 3)


@pytest.mark.parametrize("N,D,mult", [(12, 128, 4), (56, 128, 2)])
def test_mlp_sublayer_parity(N, D, mult):
    from vaura_tpu.ops.encoder_fused import _layernorm, fused_mlp_sublayer

    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    x = jax.random.normal(ks[0], (2, N, D), jnp.float32)
    lns = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (D,)) * 0.1
    w1 = jax.random.normal(ks[3], (D, mult * D)) * D**-0.5
    b1 = jax.random.normal(ks[4], (mult * D,)) * 0.02
    w2 = jax.random.normal(ks[5], (mult * D, D)) * (mult * D) ** -0.5
    b2 = jax.random.normal(ks[6], (D,)) * 0.02
    got = fused_mlp_sublayer(
        x, lns, lnb, w1, b1, w2, b2, eps=1e-6, interpret=True
    )
    ln = _layernorm(x, lns, lnb, 1e-6).astype(x.dtype)
    h = jax.nn.gelu(ln @ w1 + b1, approximate=False)
    want = x + h @ w2 + b2
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def _encoder_pair(dtype):
    from vaura_tpu.models.motionformer import MotionFormerConfig

    kw = dict(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=4,
        temporal_resolution=2, drop_path_rate=0.0, max_segments=4,
        dtype=dtype,
    )
    return (
        MotionFormerConfig(fused_encoder_block=False, **kw).build(),
        MotionFormerConfig(fused_encoder_block=True, **kw).build(),
    )


@pytest.mark.slow
def test_full_encoder_fused_matches_einsum_f32():
    m_e, m_f = _encoder_pair(jnp.float32)
    frames = jax.random.normal(
        jax.random.PRNGKey(0), (2, 3, 3, 4, 32, 32), jnp.float32
    )
    params = m_e.init(jax.random.PRNGKey(1), frames, False)
    fe, _ = m_e.apply(params, frames, False)
    ff, _ = m_f.apply(params, frames, False)
    np.testing.assert_allclose(
        np.asarray(fe), np.asarray(ff), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_full_encoder_fused_param_tree_identical():
    """Checkpoints must load interchangeably: the fused path creates the
    exact same param tree (names, shapes, dtypes) as the einsum path."""
    m_e, m_f = _encoder_pair(jnp.bfloat16)
    frames = jnp.zeros((1, 2, 3, 4, 32, 32), jnp.float32)
    pe = m_e.init(jax.random.PRNGKey(1), frames, False)
    pf = m_f.init(jax.random.PRNGKey(1), frames, False)
    assert jax.tree_util.tree_structure(pe) == jax.tree_util.tree_structure(pf)
    for a, b in zip(jax.tree_util.tree_leaves(pe), jax.tree_util.tree_leaves(pf)):
        assert a.shape == b.shape and a.dtype == b.dtype
    fe, _ = m_e.apply(pf, frames, False)  # cross-apply
    ff, _ = m_f.apply(pe, frames, False)
    np.testing.assert_allclose(
        np.asarray(fe, np.float32), np.asarray(ff, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.slow
def test_fused_gated_off_when_training():
    """train=True must fall back to the einsum path (drop-path/dropout
    live there); fused forces only at inference."""
    from vaura_tpu.models.motionformer import MotionFormerConfig

    cfg = MotionFormerConfig(
        img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=4,
        temporal_resolution=2, drop_path_rate=0.2, max_segments=4,
        fused_encoder_block=True, dtype=jnp.float32,
    )
    m = cfg.build()
    frames = jax.random.normal(
        jax.random.PRNGKey(0), (2, 2, 3, 4, 32, 32), jnp.float32
    )
    params = m.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        frames, True,
    )
    out, _ = m.apply(
        params, frames, True, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    assert out.shape == (2, 2, 2, 128)
    assert bool(jnp.all(jnp.isfinite(out)))
