"""RoPE parity: our interleaved-pair rotary embedding must match the
reference's gpt-fast formulation (llama.py:593-650) recomputed in torch."""

import numpy as np
import pytest

import jax.numpy as jnp

from vaura_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis

torch = pytest.importorskip("torch")


def torch_precompute(seq_len, n_elem, base=10000):
    freqs = 1.0 / (
        base ** (torch.arange(0, n_elem, 2)[: n_elem // 2].float() / n_elem)
    )
    t = torch.arange(seq_len)
    freqs = torch.outer(t, freqs)
    fc = torch.polar(torch.ones_like(freqs), freqs)
    return torch.stack([fc.real, fc.imag], dim=-1)


def torch_apply(x, freqs_cis):
    xs = x.float().reshape(*x.shape[:-1], -1, 2)
    fc = freqs_cis.view(1, xs.size(1), 1, xs.size(3), 2)
    out = torch.stack(
        [
            xs[..., 0] * fc[..., 0] - xs[..., 1] * fc[..., 1],
            xs[..., 1] * fc[..., 0] + xs[..., 0] * fc[..., 1],
        ],
        dim=-1,
    )
    return out.flatten(3)


def test_freqs_cache_matches_torch():
    ours = precompute_freqs_cis(32, 16)
    theirs = torch_precompute(32, 16).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_apply_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 4, 16)).astype(np.float32)
    fc = torch_precompute(12, 16)
    theirs = torch_apply(torch.from_numpy(x), fc).numpy()
    ours = apply_rotary_emb(jnp.asarray(x), jnp.asarray(fc.numpy()))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)
