"""DAC codec tests: layer semantics vs torch (conv/transposed-conv padding
contracts needed for checkpoint conversion), shape contracts of
encode/decode, and RVQ consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.models.dac.layers import Conv1d, ConvTranspose1d
from vaura_tpu.models.dac.model import Dac, DacConfig

TINY = DacConfig(
    sample_rate=44100,
    encoder_dim=8,
    encoder_rates=(2, 4),
    decoder_dim=32,
    decoder_rates=(4, 2),
    latent_dim=32,
    n_codebooks=3,
    codebook_size=32,
    codebook_dim=4,
)


def test_conv1d_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 20, 3)).astype(np.float32)
    m = Conv1d(5, kernel_size=7, stride=2, padding=3, dilation=1)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = m.apply({"params": params}, jnp.asarray(x))
    tconv = torch.nn.Conv1d(3, 5, 7, stride=2, padding=3)
    # flax kernel (W, I, O) -> torch (O, I, W)
    k = np.asarray(params["conv"]["kernel"]).transpose(2, 1, 0)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(k))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["conv"]["bias"])))
        tout = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(
        np.asarray(out), tout.transpose(0, 2, 1), atol=1e-5
    )


def test_conv_transpose1d_matches_torch():
    torch = pytest.importorskip("torch")
    stride, k, pad = 4, 8, 2
    x = np.random.default_rng(1).normal(size=(2, 10, 6)).astype(np.float32)
    m = ConvTranspose1d(3, kernel_size=k, stride=stride, padding=pad)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = m.apply({"params": params}, jnp.asarray(x))
    tconv = torch.nn.ConvTranspose1d(6, 3, k, stride=stride, padding=pad)
    # our kernel (W, in, out) -> torch (in, out, W)
    kk = np.asarray(params["kernel"]).transpose(1, 2, 0)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kk))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        tout = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    assert out.shape[1] == (x.shape[1] - 1) * stride - 2 * pad + k
    np.testing.assert_allclose(
        np.asarray(out), tout.transpose(0, 2, 1), atol=1e-5
    )


@pytest.fixture(scope="module")
def dac_setup():
    model = Dac(TINY)
    wav = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 1, TINY.hop_length * 10)) * 0.1,
        dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), wav)["params"]
    return model, params, wav


def test_encode_shape(dac_setup):
    model, params, wav = dac_setup
    codes = model.apply({"params": params}, wav, method=model.encode)
    B, K, T = codes.shape
    assert K == TINY.n_codebooks
    assert T == wav.shape[-1] // TINY.hop_length
    assert codes.dtype == jnp.int32
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < TINY.codebook_size).all()


def test_decode_shape(dac_setup):
    model, params, wav = dac_setup
    codes = model.apply({"params": params}, wav, method=model.encode)
    out = model.apply({"params": params}, codes, method=model.decode)
    assert out.shape == (1, 1, codes.shape[-1] * TINY.hop_length)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh output


def test_preprocess_pads_to_hop(dac_setup):
    model, params, _ = dac_setup
    wav = jnp.zeros((1, 1, TINY.hop_length * 3 + 5))
    codes = model.apply({"params": params}, wav, method=model.encode)
    assert codes.shape[-1] == 4  # padded up to 4 hops


def test_encode_deterministic_and_from_codes_shape(dac_setup):
    model, params, wav = dac_setup
    c1 = model.apply({"params": params}, wav, method=model.encode)
    c2 = model.apply({"params": params}, wav, method=model.encode)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    z_q = model.apply(
        {"params": params}, c1, method=lambda m, c: m.quantizer.from_codes(c)
    )
    assert z_q.shape == (1, c1.shape[-1], TINY.resolved_latent_dim)


def test_from_codes_partial_codebooks(dac_setup):
    """Decoding from fewer codebooks than the model has must work (the
    reference selects the first num_codebooks of the DAC,
    ``vaura_model.py:575``)."""
    model, params, wav = dac_setup
    codes = model.apply({"params": params}, wav, method=model.encode)
    z2 = model.apply(
        {"params": params}, codes[:, :2], method=lambda m, c: m.quantizer.from_codes(c)
    )
    assert z2.shape == (1, codes.shape[-1], TINY.resolved_latent_dim)
