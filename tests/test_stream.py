"""Streaming long-horizon generation (``VauraSystem.generate_long_stream``).

The stream must be a pure re-chunking of ``generate_long``: identical
codes from the same rng, and audio increments that concatenate to the
one-shot waveform (windowed DAC decode with margin >= the decoder's
receptive field — interior samples of a windowed decode equal the full
decode's). No reference counterpart: the reference's long-horizon path
(``scripts/generate.py:327-370``) is offline/batch only.
"""

import numpy as np
import pytest

SAMPLING = dict(use_sampling=True, temp=1.0, top_k=8, cfg_scale=3.0)


@pytest.fixture(scope="module")
def tiny_system():
    import jax
    import jax.numpy as jnp

    from vaura_tpu.models.dac.model import DacConfig
    from vaura_tpu.models.sampler import SamplerConfig
    from vaura_tpu.models.vaura import VauraSystem

    sys_ = VauraSystem(
        sampler_config=SamplerConfig(
            num_layers=2, d_model=48, d_codebook=16, num_codebooks=3,
            nhead=4, block_size_audio=96, block_size_video=64,
            dropout=0.0, class_dropout_prob=0.1, cond_in_dim=24,
            cond_token_num=8, codebook_dim=4, dtype=jnp.float32,
        ),
        dac_config=DacConfig(
            encoder_dim=8, encoder_rates=(2, 4), decoder_dim=32,
            decoder_rates=(4, 2), latent_dim=32, n_codebooks=3,
            codebook_size=16, codebook_dim=4,
        ),
        encoder_config=None,
        use_visual_conditioning=True,
    )
    params = sys_.init_params(jax.random.PRNGKey(0))
    params = sys_.load_dac_embeddings_into_sampler(params)
    return sys_, params


def test_windowed_decode_is_exact_in_the_interior(tiny_system):
    """Windowed DAC decode with enough margin reproduces the full
    decode's interior samples — the invariant generate_long_stream's
    audio increments rely on."""
    import jax

    sys_, params = tiny_system
    hop = sys_.dac_config.hop_length
    margin = sys_.dac_config.decoder_receptive_field_frames
    T, B = 64 + 2 * margin, 2
    codes = np.random.default_rng(0).integers(
        0, 16, size=(B, 3, T), dtype=np.int64
    )
    full = np.asarray(jax.jit(sys_.decode_audio)(params, codes))

    # emit an interior span from a window with `margin` frames each side
    lo, hi = margin, margin + 24
    win = codes[..., lo - margin : hi + margin]
    wav = np.asarray(jax.jit(sys_.decode_audio)(params, win))
    got = wav[..., margin * hop : (margin + hi - lo) * hop]
    want = full[..., lo * hop : hi * hop]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)

    # sanity: with NO margin the boundary is visibly wrong (so the
    # assertion above is actually discriminating)
    win0 = codes[..., lo:hi]
    wav0 = np.asarray(jax.jit(sys_.decode_audio)(params, win0))
    assert np.abs(wav0 - want).max() > 1e-3


@pytest.mark.slow
def test_stream_matches_generate_long(tiny_system):
    import jax

    sys_, params = tiny_system
    B, S_total, t_seg, D = 2, 8, 8, 24
    feats = (
        np.random.default_rng(1)
        .standard_normal((B, S_total, t_seg, D))
        .astype(np.float32)
    )
    kw = dict(
        total_tokens=72, stride_tokens=24, model_max_tokens=36,
        vis_feats_segments=feats, decode_buckets=1, **SAMPLING,
    )
    one = sys_.generate_long(
        params, None, jax.random.PRNGKey(3), decode_to_audio=True, **kw
    )
    chunks = list(
        sys_.generate_long_stream(params, None, jax.random.PRNGKey(3), **kw)
    )
    assert len(chunks) >= 2  # actually streamed in pieces
    # the published schedule predicts every increment's token count
    assert [np.asarray(c["codes"]).shape[-1] for c in chunks] == (
        sys_.long_chunk_schedule(72, 24, 36)
    )

    codes = np.concatenate([np.asarray(c["codes"]) for c in chunks], axis=-1)
    np.testing.assert_array_equal(codes, np.asarray(one["codes"]))

    hop = sys_.dac_config.hop_length
    starts = [c["token_start"] for c in chunks]
    sizes = [np.asarray(c["audio"]).shape[-1] for c in chunks]
    assert starts[0] == 0
    # increments tile the clip: each starts where the previous ended
    for prev_start, prev_n, start in zip(starts, sizes, starts[1:]):
        assert start * hop == prev_start * hop + prev_n
    audio = np.concatenate([np.asarray(c["audio"]) for c in chunks], axis=-1)
    want = np.asarray(one["audio"]).reshape(B, -1)
    assert audio.shape == want.shape
    np.testing.assert_allclose(audio, want, atol=1e-5, rtol=0)
