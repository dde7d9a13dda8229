"""Pallas decode-attention kernel tests (interpret mode on CPU): parity
with the dense XLA reference across positions, including block-boundary
and zero-position edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.ops.pallas_attention import (
    DEFAULT_BLOCK,
    decode_attention,
    decode_attention_reference,
)


def _inputs(B=2, S=160, H=4, hd=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *shape: jnp.asarray(
        rng.standard_normal(shape).astype(np.float32)
    )
    return (
        mk(B, H, hd),
        mk(B, S, H, hd),
        mk(B, S, H, hd),
        mk(B, H, hd),
        mk(B, H, hd),
    )


@pytest.mark.parametrize(
    "pos", [0, 1, 63, 64, 65, 100, 159]
)
def test_kernel_matches_reference(pos):
    q, kc, vc, kcur, vcur = _inputs()
    out_k = decode_attention(
        q, kc, vc, kcur, vcur, jnp.int32(pos), interpret=True
    )
    out_r = decode_attention_reference(q, kc, vc, kcur, vcur, jnp.int32(pos))
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), atol=2e-5
    )


def test_kernel_ignores_stale_cache():
    """Positions >= pos must not affect the output."""
    q, kc, vc, kcur, vcur = _inputs(S=128)
    pos = 70
    out1 = decode_attention(q, kc, vc, kcur, vcur, jnp.int32(pos), interpret=True)
    kc2 = kc.at[:, pos:].set(99.0)
    vc2 = vc.at[:, pos:].set(-99.0)
    out2 = decode_attention(q, kc2, vc2, kcur, vcur, jnp.int32(pos), interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_kernel_nonmultiple_cache_len():
    q, kc, vc, kcur, vcur = _inputs(S=100)  # not a multiple of DEFAULT_BLOCK
    pos = 90
    out_k = decode_attention(q, kc, vc, kcur, vcur, jnp.int32(pos), interpret=True)
    out_r = decode_attention_reference(q, kc, vc, kcur, vcur, jnp.int32(pos))
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-5)
