"""Parity of the fused Pallas divided attention (ops/divided_attention.py)
against the einsum reference path, op-level and module-level (interpret
mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.ops.divided_attention import (
    _pick_pack,
    _reference,
    grouped_cls_attention,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def _args(seed, BH, G, L, hd, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return (
        _rand(ks[0], (BH, G, L, hd), dtype) * hd**-0.5,
        _rand(ks[1], (BH, G, L, hd), dtype),
        _rand(ks[2], (BH, G, L, hd), dtype),
        _rand(ks[3], (BH, 1, hd), dtype),
        _rand(ks[4], (BH, 1, hd), dtype),
    )


@pytest.mark.parametrize("G,L", [(9, 4), (4, 17), (14, 8), (2, 96)])
def test_op_parity(G, L):
    args = _args(0, 3, G, L, 16)
    got = grouped_cls_attention(*args, True)
    want = _reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_op_parity_bf16():
    args = _args(1, 2, 6, 8, 32, jnp.bfloat16)
    got = np.asarray(grouped_cls_attention(*args, True), np.float32)
    want = np.asarray(_reference(*args), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_pick_pack():
    assert _pick_pack(196, 8) == 28   # 28*8 = 224 <= 256
    assert _pick_pack(8, 196) == 1
    assert _pick_pack(9, 4) == 9
    assert _pick_pack(196, 2) == 98   # 98*2 = 196 <= 256


def test_custom_vjp_matches_reference_grad():
    args = _args(2, 2, 4, 6, 8)

    def loss_fused(*a):
        return jnp.sum(grouped_cls_attention(*a, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_module_parity_divided_attention():
    """DividedAttention fused (interpret) vs einsum path, both axes."""
    from vaura_tpu.models.motionformer import (
        DividedAttention,
        MotionFormerConfig,
    )

    f, n, H, hd = 4, 9, 2, 16
    D = H * hd
    cfg_ein = MotionFormerConfig(
        embed_dim=D, num_heads=H, dtype=jnp.float32,
        fused_divided_attention=False,
    )
    cfg_fused = MotionFormerConfig(
        embed_dim=D, num_heads=H, dtype=jnp.float32,
        fused_divided_attention=True,
    )
    x = _rand(jax.random.PRNGKey(3), (2, 1 + f * n, D))
    params = DividedAttention(cfg_ein).init(
        jax.random.PRNGKey(4), x, "time", f, n
    )
    for axis in ("time", "space"):
        want = DividedAttention(cfg_ein).apply(params, x, axis, f, n)
        got = DividedAttention(cfg_fused).apply(params, x, axis, f, n)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=axis,
        )


@pytest.mark.slow
def test_full_encoder_parity_fused():
    """Small MotionFormer forward: fused kernel vs einsum path."""
    from vaura_tpu.models.motionformer import MotionFormer, MotionFormerConfig

    base = dict(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        temporal_resolution=2, z_block_size=2, drop_path_rate=0.0,
        dtype=jnp.float32,
    )
    m_ein = MotionFormer(MotionFormerConfig(
        **base, fused_divided_attention=False))
    m_fused = MotionFormer(MotionFormerConfig(
        **base, fused_divided_attention=True))
    frames = _rand(jax.random.PRNGKey(5), (2, 2, 3, 4, 32, 32))
    params = m_ein.init(jax.random.PRNGKey(6), frames)
    want, _ = m_ein.apply(params, frames, False)
    got, _ = m_fused.apply(params, frames, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
