"""Rolling-KV streaming long generation (``generate_long_kv`` /
``generate_tokens_streaming``): the TPU-first replacement for the chunk
re-prefill striding of reference ``scripts/generate.py:327-370``.

Two contracts pin the semantics:

1. **No-drop exactness**: with ``window_chunks * chunk_steps >= S`` the
   rolling machinery never discards a chunk, so the output must be
   token-IDENTICAL to ``generate(max_new_tokens=total)`` (same rng, same
   cond layout) — this locks the segment scheduling, traced chunk
   starts, global RoPE positions, and cache-chunk bookkeeping.
2. **Windowed-mask oracle**: with a finite window, every position's K/V
   keep their original values while queries attend only the trailing
   ``window_chunks`` chunks (+ pinned sinks). That is exactly a
   teacher-forced forward whose attention mask is block-banded by chunk
   index at EVERY layer — verified greedy-step-for-step against
   ``sampler.__call__(attn_mask=...)``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.models.dac.model import DacConfig
from vaura_tpu.models.sampler import SamplerConfig
from vaura_tpu.models.vaura import VauraSystem

SAMPLER_TINY = SamplerConfig(
    num_layers=2,
    d_model=48,
    d_codebook=16,
    num_codebooks=3,
    nhead=4,
    block_size_audio=128,
    block_size_video=16,
    dropout=0.0,
    class_dropout_prob=0.1,
    cond_in_dim=24,
    cond_token_num=8,
    codebook_dim=4,
    dtype=jnp.float32,
)
DAC_TINY = DacConfig(
    encoder_dim=8,
    encoder_rates=(2, 4),
    decoder_dim=32,
    decoder_rates=(4, 2),
    latent_dim=32,
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
)


@pytest.fixture(scope="module")
def system():
    sys_ = VauraSystem(
        sampler_config=SAMPLER_TINY,
        dac_config=DAC_TINY,
        encoder_config=None,
        use_visual_conditioning=True,
    )
    tokens0 = jnp.zeros((1, 3, 8), jnp.int32)
    cond0 = jnp.zeros((1, 8, 24))
    params = {
        "sampler": sys_.sampler.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "cfg_dropout": jax.random.PRNGKey(2)},
            tokens0, cond0, False,
        )["params"]
    }
    return sys_, params


def _vis_segments(B=2, s_total=3, t_seg=4, d=24, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((B, s_total, t_seg, d)).astype(np.float32)
    )


def _flat_window(sys_, vis_segs, total_tokens, tokens_per_frame=7):
    """The continuous feature selection generate_long_kv lays out —
    reproduced host-side so generate() can be fed the identical stream."""
    B, s_total, t_seg, d = vis_segs.shape
    _, _, S = sys_.prepare_generation(total_tokens)
    n_feat = -(-S // tokens_per_frame)
    n_seg = -(-n_feat // t_seg)
    idx = np.arange(n_seg) % s_total
    return vis_segs[:, idx].reshape(B, n_seg * t_seg, d)


@pytest.mark.slow
@pytest.mark.parametrize("quantize_cache", [False, True])
def test_streamkv_nodrop_matches_generate(system, quantize_cache):
    sys_, params = system
    if quantize_cache:
        sys_ = dataclasses.replace(
            sys_,
            sampler_config=dataclasses.replace(
                SAMPLER_TINY, quantize_cache=True
            ),
        )
    vis_segs = _vis_segments()
    total = 40
    kw = dict(use_sampling=True, temp=1.0, top_k=8, cfg_scale=3.0)
    out_stream = sys_.generate_long_kv(
        params, None, jax.random.PRNGKey(5),
        total_tokens=total, tokens_per_frame=7,
        vis_feats_segments=vis_segs,
        window_chunks=16, chunk_steps=16,  # window >= S: nothing drops
        decode_to_audio=False, **kw,
    )
    out_ref = sys_.generate(
        params, None, jax.random.PRNGKey(5),
        vis_feats=_flat_window(sys_, vis_segs, total),
        max_new_tokens=total, tokens_per_frame=7,
        decode_to_audio=False, decode_buckets=1, **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(out_stream["codes"]), np.asarray(out_ref["codes"])
    )


@pytest.mark.slow
@pytest.mark.parametrize("sink_chunks", [0, 1])
def test_streamkv_windowed_matches_masked_oracle(system, sink_chunks):
    """Greedy rolling-window rollout == teacher-forced forward under the
    block-banded chunk mask, step for step (CFG 1)."""
    sys_, params = system
    vis_segs = _vis_segments(B=1)
    total, C, W = 76, 16, 2
    tpf = 7
    out = sys_.generate_long_kv(
        params, None, jax.random.PRNGKey(7),
        total_tokens=total, tokens_per_frame=tpf,
        vis_feats_segments=vis_segs,
        window_chunks=W, chunk_steps=C, sink_chunks=sink_chunks,
        decode_to_audio=False, use_sampling=False, cfg_scale=1.0,
    )
    codes = out["codes"]

    pattern, valid_mask, S = sys_.prepare_generation(total)
    gen_seq, _, _ = pattern.build_pattern_sequence(
        codes, sys_.special_token_id
    )
    # chunk index table exactly as generate_tokens_streaming derives it
    eff = [h for h in range(C, S, C)] + [S]
    chunk_bounds = np.array([0] + [h - 1 for h in eff[:-1]] + [S])
    cidx = np.searchsorted(chunk_bounds, np.arange(S), side="right") - 1
    causal = np.tril(np.ones((S, S), bool))
    in_window = cidx[None, :] >= (cidx[:, None] - (W - 1))
    is_sink = (cidx < sink_chunks)[None, :]
    mask = jnp.asarray(causal & (in_window | is_sink))

    logits = sys_.sampler.apply(
        {"params": params["sampler"]},
        gen_seq, _flat_window(sys_, vis_segs, total),
        False, tpf, mask,
    )  # [B, K, S, vocab]
    pred = np.asarray(jnp.argmax(logits, axis=-1))  # step s-1 predicts s
    seq = np.asarray(gen_seq)
    vm = np.asarray(valid_mask)  # [K, S]
    for s in range(1, S):
        for k in range(seq.shape[1]):
            if vm[k, s]:
                assert seq[0, k, s] == pred[0, k, s - 1], (s, k)


def test_streamkv_block_size_guard(system):
    sys_, params = system
    with pytest.raises(ValueError, match="block_size"):
        sys_.generate_long_kv(
            params, None, jax.random.PRNGKey(0),
            total_tokens=300,  # S > block_size_audio=128
            vis_feats_segments=_vis_segments(),
            decode_to_audio=False,
        )


@pytest.mark.slow
def test_streamkv_stream_matches_oneshot(system):
    """``generate_long_kv_stream``: streamed codes and waveform increments
    concatenate EXACTLY to ``generate_long_kv``'s one-shot output (same
    rng, same finite window), and each increment's ``token_start`` lines
    up with the samples emitted so far."""
    sys_, _ = system
    # full params (the module fixture inits only the sampler; this test
    # decodes waveforms, so it needs the DAC subtree too)
    params = sys_.init_params(jax.random.PRNGKey(0))
    params = sys_.load_dac_embeddings_into_sampler(params)
    vis_segs = _vis_segments()
    total = 60
    kw = dict(
        use_sampling=True, temp=1.0, top_k=8, cfg_scale=3.0,
        window_chunks=2, chunk_steps=16,  # finite window: chunks DO drop
    )
    one = sys_.generate_long_kv(
        params, None, jax.random.PRNGKey(11),
        total_tokens=total, tokens_per_frame=7,
        vis_feats_segments=vis_segs, decode_to_audio=True, **kw,
    )
    chunks = list(sys_.generate_long_kv_stream(
        params, None, jax.random.PRNGKey(11),
        total_tokens=total, tokens_per_frame=7,
        vis_feats_segments=vis_segs, **kw,
    ))
    assert len(chunks) >= 2  # actually streamed in pieces
    codes = np.concatenate([np.asarray(c["codes"]) for c in chunks], -1)
    np.testing.assert_array_equal(codes, np.asarray(one["codes"]))
    audio = np.concatenate([np.asarray(c["audio"]) for c in chunks], -1)
    want = np.asarray(one["audio"]).reshape(audio.shape[0], -1)
    assert audio.shape == want.shape
    # 5e-5: float reassociation across decode-window shapes; a missing
    # margin errs >1e-3 (test_stream.py's sanity check), so this still
    # discriminates
    np.testing.assert_allclose(audio, want, atol=5e-5, rtol=0)
    hop = sys_.dac_config.hop_length
    pos = 0
    for c in chunks:
        assert c["token_start"] * hop == pos
        pos += np.asarray(c["audio"]).shape[-1]
