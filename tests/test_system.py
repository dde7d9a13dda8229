"""End-to-end slice tests over the composite VauraSystem: train_forward
wiring, optimizer steps reduce loss (overfit one batch), and the KV-cache
generation loop produces valid code sequences with prompt preservation —
the behavior contracts of reference ``vaura_model.py`` forward/generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.models.dac.model import DacConfig
from vaura_tpu.models.motionformer import MotionFormerConfig
from vaura_tpu.models.sampler import SamplerConfig
from vaura_tpu.models.vaura import UNKNOWN_TOKEN, VauraSystem
from vaura_tpu.train.state import TrainState, make_optimizer
from vaura_tpu.train.steps import make_eval_step, make_train_step, split_params

SAMPLER_TINY = SamplerConfig(
    num_layers=2,
    d_model=48,
    d_codebook=16,
    num_codebooks=3,
    nhead=4,
    block_size_audio=64,
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
ENC_TINY = MotionFormerConfig(
    img_size=16,
    patch_size=8,
    embed_dim=24,
    depth=2,
    num_heads=2,
    temporal_resolution=2,
    z_block_size=2,
    drop_path_rate=0.0,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def system():
    sys = VauraSystem(
        sampler_config=SAMPLER_TINY,
        dac_config=DAC_TINY,
        encoder_config=ENC_TINY,
        freeze_feature_extractor=True,
    )
    params = sys.init_params(
        jax.random.PRNGKey(0), frames_per_segment=4, frame_hw=16
    )
    params = sys.load_dac_embeddings_into_sampler(params)
    return sys, params


def _batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    # 2 segments of 4 frames @16x16; audio = 20 hops of the tiny DAC
    frames = rng.standard_normal((B, 2, 3, 4, 16, 16)).astype(np.float32)
    audio = rng.standard_normal((B, 1, DAC_TINY.hop_length * 20)).astype(
        np.float32
    ) * 0.1
    return {"frames": jnp.asarray(frames), "audio": jnp.asarray(audio)}


@pytest.mark.slow
def test_train_forward_finite(system):
    sys, params = system
    loss, aux = sys.train_forward(
        params, _batch()["frames"], _batch()["audio"], jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))
    assert aux["loss_per_codebook"].shape == (3,)
    # zero-init heads => uniform logits => loss == log(card)
    assert float(loss) == pytest.approx(np.log(SAMPLER_TINY.d_codebook), rel=1e-3)


def test_dac_embedding_init_matches_quantizer(system):
    """Sampler token embeddings must equal the DAC codebooks after
    initialize_embeddings-style loading (reference llama.py:387-412)."""
    sys, params = system
    K, V, cd = 3, 16, 4
    emb = np.asarray(params["sampler"]["tok_embeddings"]["emb"]).reshape(
        K, V + 1, cd
    )
    cbs = np.asarray(params["dac"]["quantizer"]["codebooks"])[:K]
    np.testing.assert_allclose(emb[:, :V], cbs, atol=1e-6)


@pytest.mark.slow
def test_loss_decreases_overfitting(system):
    sys, params = system
    trainable, frozen = split_params(sys, params)
    tx = make_optimizer(1e-3, weight_decay=0.0, gradient_clip_val=1.0)
    state = TrainState.create(trainable, tx)
    step_fn = make_train_step(sys, donate=False)
    batch = _batch()
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses


def test_eval_step_runs(system):
    sys, params = system
    trainable, frozen = split_params(sys, params)
    metrics = make_eval_step(sys)(trainable, frozen, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_generate_valid_sequence(system):
    sys, params = system
    frames = _batch(B=1)["frames"]
    out = sys.generate(
        params,
        frames,
        jax.random.PRNGKey(7),
        max_new_tokens=12,
        temp=1.0,
        top_k=8,
        cfg_scale=2.0,
        decode_to_audio=True,
    )
    codes = np.asarray(out["codes"])
    assert codes.shape == (1, 3, 12)
    assert (codes != UNKNOWN_TOKEN).all()
    assert (codes >= 0).all() and (codes <= SAMPLER_TINY.d_codebook).all()
    audio = np.asarray(out["audio"])
    assert audio.shape == (1, 1, 12 * DAC_TINY.hop_length)


@pytest.mark.slow
def test_generate_preserves_prompt(system):
    sys, params = system
    frames = _batch(B=1)["frames"]
    prompt = jnp.asarray(
        np.random.default_rng(3).integers(0, 16, size=(1, 3, 5)), jnp.int32
    )
    out = sys.generate(
        params,
        frames,
        jax.random.PRNGKey(8),
        audio_prompt_codes=prompt,
        max_new_tokens=12,
        top_k=4,
        decode_to_audio=False,
    )
    codes = np.asarray(out["codes"])
    np.testing.assert_array_equal(codes[..., :5], np.asarray(prompt))
    assert (codes >= 0).all()


@pytest.mark.slow
def test_generate_greedy_deterministic(system):
    sys, params = system
    frames = _batch(B=1)["frames"]
    kw = dict(max_new_tokens=10, use_sampling=False, decode_to_audio=False)
    c1 = np.asarray(
        sys.generate(params, frames, jax.random.PRNGKey(0), **kw)["codes"]
    )
    c2 = np.asarray(
        sys.generate(params, frames, jax.random.PRNGKey(99), **kw)["codes"]
    )
    np.testing.assert_array_equal(c1, c2)


@pytest.mark.slow
def test_generate_long_chunked(system):
    """Chunked long-duration generation (reference generate.py:327-370):
    total = 2 chunks with prompt carry-over; output covers total_tokens and
    stays in the valid code range."""
    sys_, params = system
    frames = _batch(B=1)["frames"]  # [1, 2, 3, 4, 16, 16] -> 2 segments
    out = sys_.generate_long(
        params,
        frames,
        jax.random.PRNGKey(5),
        total_tokens=16,
        stride_tokens=8,
        model_max_tokens=12,
        vfps=6.25,  # 4 frames per 0.64s segment at this test scale
        frames_per_segment=4,
        tokens_per_frame=7,
        top_k=4,
        decode_to_audio=True,
    )
    codes = np.asarray(out["codes"])
    assert codes.shape == (1, 3, 16)
    assert (codes >= 0).all() and (codes <= SAMPLER_TINY.d_codebook).all()
    assert out["audio"].shape == (1, 1, 16 * DAC_TINY.hop_length)


@pytest.mark.slow
def test_visual_features_chunked_matches_full(system):
    """``visual_features(chunk_size=...)`` (lax.map over batch slices —
    lifts the ViT activation bound on the generation batch) must match the
    full-batch encoder run, including a non-divisor chunk request
    (largest-divisor fallback). Tolerance-based: slicing the batch changes
    XLA's matmul fusion/reduction order (measured max |delta| ~7e-9 f32)."""
    sys_, params = system
    frames = _batch(B=4)["frames"]
    full = np.asarray(sys_.visual_features(params, frames, train=False))
    for chunk in (2, 3):  # 3 -> divisor fallback to 2
        chunked = np.asarray(
            sys_.visual_features(params, frames, train=False, chunk_size=chunk)
        )
        np.testing.assert_allclose(full, chunked, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_train_forward_per_clip_audio(system):
    """Non-flattened training mode: audio arrives clip-partitioned
    [B, n_clips, 1, Ta_clip] with per-clip frames (reference
    _stack_list_repr path)."""
    sys_, params = system
    rng = np.random.default_rng(1)
    B, n_clips = 2, 2
    frames = jnp.asarray(
        rng.standard_normal((B, n_clips, 3, 4, 16, 16)).astype(np.float32)
    )
    audio = jnp.asarray(
        (rng.standard_normal((B, n_clips, 1, DAC_TINY.hop_length * 10)) * 0.1
         ).astype(np.float32)
    )
    loss, aux = sys_.train_forward(params, frames, audio, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # folded batch: B * n_clips samples
    assert aux["logits"].shape[0] == B * n_clips


@pytest.mark.slow
def test_prefill_prompt_path_matches_scan(system):
    """With a long prompt the public generate() uses the batched prefill
    fast path; its greedy output must match the pure-scan ingestion path
    step for step."""
    sys_, params = system
    frames = _batch(B=1)["frames"]
    prompt = jnp.asarray(
        np.random.default_rng(11).integers(0, 16, size=(1, 3, 20)), jnp.int32
    )
    kw = dict(
        audio_prompt_codes=prompt, max_new_tokens=40, use_sampling=False,
        decode_to_audio=False,
    )
    out_fast = sys_.generate(params, frames, jax.random.PRNGKey(0), **kw)

    # pure-scan reference: rebuild manually with start_step=1, no prefill
    pattern, valid_mask, S = sys_.prepare_generation(40)
    gen_codes = jnp.full((1, 3, 40), -1, jnp.int32)
    gen_codes = gen_codes.at[:, :, :20].set(prompt)
    gen_seq, _, _ = pattern.build_pattern_sequence(
        gen_codes, sys_.special_token_id
    )
    vis_feats = sys_.visual_features(params, frames, train=False)
    cond_seq = sys_.build_cond_seq_for_generation(params, vis_feats, S)
    gen_seq = sys_.generate_tokens(
        params, cond_seq, gen_seq, jax.random.PRNGKey(0),
        S=S, valid_mask=valid_mask, start_step=1, use_sampling=False,
    )
    codes_ref, _, _ = pattern.revert_pattern_sequence(gen_seq, -1)
    codes_ref = np.asarray(codes_ref)[..., :40]
    np.testing.assert_array_equal(np.asarray(out_fast["codes"]), codes_ref)


@pytest.mark.slow
def test_decode_buckets_match_unbucketed(system):
    """Segmented decode (each scan segment carries a physically
    bucket-sized KV cache, grown between segments) must reproduce the
    single-scan output token for token: padded cache positions get
    probability exactly 0 under the masked softmax, so buffer length
    cannot change the math, and the rng chain is bucket-independent."""
    sys_, params = system
    frames = _batch(B=2)["frames"]
    kw = dict(max_new_tokens=40, use_sampling=True, temp=1.0, top_k=8,
              cfg_scale=3.0, decode_to_audio=False)
    out1 = sys_.generate(
        params, frames, jax.random.PRNGKey(5), decode_buckets=1, **kw
    )
    out4 = sys_.generate(
        params, frames, jax.random.PRNGKey(5), decode_buckets=4, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(out1["codes"]), np.asarray(out4["codes"])
    )


@pytest.mark.slow
def test_decode_buckets_match_unbucketed_int4_dots(system):
    """Bucketing stays bit-exact under the int4 nibble-packed cache +
    int8 attention dots: quantization happens per committed position, so
    buffer length still cannot change the math."""
    import dataclasses

    sys_, params = system
    qsys = dataclasses.replace(
        sys_,
        sampler_config=dataclasses.replace(
            SAMPLER_TINY, quantize_cache=True, cache_bits=4, int8_dots=True
        ),
    )
    frames = _batch(B=2)["frames"]
    kw = dict(max_new_tokens=40, use_sampling=True, temp=1.0, top_k=8,
              cfg_scale=3.0, decode_to_audio=False)
    out1 = qsys.generate(
        params, frames, jax.random.PRNGKey(5), decode_buckets=1, **kw
    )
    out4 = qsys.generate(
        params, frames, jax.random.PRNGKey(5), decode_buckets=4, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(out1["codes"]), np.asarray(out4["codes"])
    )


@pytest.mark.slow
def test_decode_buckets_with_prompt_prefill(system):
    """Buckets + a long audio prompt: the prefill-produced full-length
    cache is sliced down to the first executed segment's buffer and the
    output still matches the unbucketed run."""
    sys_, params = system
    frames = _batch(B=1)["frames"]
    prompt = jnp.asarray(
        np.random.default_rng(13).integers(0, 16, size=(1, 3, 20)), jnp.int32
    )
    kw = dict(
        audio_prompt_codes=prompt, max_new_tokens=40, use_sampling=False,
        cfg_scale=2.0, decode_to_audio=False,
    )
    out1 = sys_.generate(
        params, frames, jax.random.PRNGKey(0), decode_buckets=1, **kw
    )
    out3 = sys_.generate(
        params, frames, jax.random.PRNGKey(0), decode_buckets=3, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(out1["codes"]), np.asarray(out3["codes"])
    )


def test_generate_check_mode(system):
    sys_, params = system
    frames = _batch(B=1)["frames"]
    out = sys_.generate(
        params, frames, jax.random.PRNGKey(3), max_new_tokens=10, top_k=4,
        decode_to_audio=False, check=True,
    )
    assert out["codes"].shape == (1, 3, 10)


@pytest.mark.slow
def test_generate_seed_reproducibility(system):
    """Same rng -> identical sampled codes; different rng -> different."""
    sys_, params = system
    frames = _batch(B=1)["frames"]
    kw = dict(max_new_tokens=12, top_k=8, temp=1.0, decode_to_audio=False)
    c1 = np.asarray(sys_.generate(params, frames, jax.random.PRNGKey(5), **kw)["codes"])
    c2 = np.asarray(sys_.generate(params, frames, jax.random.PRNGKey(5), **kw)["codes"])
    c3 = np.asarray(sys_.generate(params, frames, jax.random.PRNGKey(6), **kw)["codes"])
    np.testing.assert_array_equal(c1, c2)
    assert not np.array_equal(c1, c3)


@pytest.mark.slow
def test_decode_audio_chunked_matches_full(system):
    """Batch-chunked waveform decode (lax.map slices) matches the
    full-batch decode to float tolerance (fusion order differs) — the DAC
    decoder's activation temps, not the KV cache, bound the generation
    batch on 16 GB HBM (PERFORMANCE.md)."""
    sys_, params = system
    rng = np.random.default_rng(11)
    codes = jnp.asarray(
        rng.integers(0, DAC_TINY.codebook_size, size=(4, sys_.num_codebooks, 12))
    )
    full = np.asarray(sys_.decode_audio(params, codes))
    chunked = np.asarray(sys_.decode_audio(params, codes, chunk_size=2))
    np.testing.assert_allclose(full, chunked, atol=1e-4, rtol=1e-4)
    # a non-divisor chunk_size rounds DOWN to the largest divisor of B
    # (3 -> 2 for B=4), still matching the full decode
    odd = np.asarray(sys_.decode_audio(params, codes, chunk_size=3))
    np.testing.assert_allclose(full, odd, atol=1e-4, rtol=1e-4)
