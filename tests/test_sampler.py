"""AR sampler tests: shapes, causality, and KV-cache decode parity with the
full causal forward — the core correctness contract of the generation
redesign (the reference recomputes the full prefix per token,
``vaura_model.py:502-547``; we must produce identical logits from the
incremental cache path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.models.sampler import (
    Sampler,
    SamplerConfig,
    default_tokens_per_frame,
)

TINY = SamplerConfig(
    num_layers=2,
    d_model=48,
    d_codebook=16,
    num_codebooks=3,
    nhead=4,
    block_size_audio=16,
    block_size_video=8,
    dropout=0.0,
    class_dropout_prob=0.0,
    cond_in_dim=24,
    cond_token_num=8,
    codebook_dim=4,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def setup():
    model = Sampler(TINY)
    rng = jax.random.PRNGKey(0)
    B, K, S, Tv = 2, TINY.num_codebooks, 12, 4
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (B, K, S), 0, TINY.vocab_with_special
    )
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, Tv, TINY.cond_in_dim))
    params = model.init(
        {"params": rng, "dropout": rng, "cfg_dropout": rng}, tokens, cond, False
    )["params"]
    return model, params, tokens, cond


def test_forward_shapes(setup):
    model, params, tokens, cond = setup
    logits = model.apply({"params": params}, tokens, cond, False)
    B, K, S = tokens.shape
    assert logits.shape == (B, K, S, TINY.d_codebook)


def test_lm_head_zero_init(setup):
    """Reference zero-inits the LM heads (llama.py:384-385): initial logits
    must be exactly zero."""
    model, params, tokens, cond = setup
    logits = model.apply({"params": params}, tokens, cond, False)
    np.testing.assert_array_equal(np.asarray(logits), 0.0)


def test_causality(setup):
    """Changing a future token must not change past logits."""
    model, params, tokens, cond = setup
    params = _nonzero_head(params)
    l1 = model.apply({"params": params}, tokens, cond, False)
    tokens2 = tokens.at[:, :, -1].set((tokens[:, :, -1] + 1) % TINY.d_codebook)
    l2 = model.apply({"params": params}, tokens2, cond, False)
    np.testing.assert_allclose(
        np.asarray(l1[:, :, :-1]), np.asarray(l2[:, :, :-1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[:, :, -1]), np.asarray(l2[:, :, -1]))


def _nonzero_head(params):
    """Give the zero-init LM head real values so logits are informative."""
    import flax

    p = flax.core.unfreeze(params)
    kernel = p["lm_head"]["kernel"]
    p["lm_head"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(3), kernel.shape, kernel.dtype
    ) * 0.05
    return p


@pytest.mark.slow
def test_decode_matches_full_forward(setup):
    """Incremental KV-cache decode must reproduce the full-sequence causal
    forward position by position."""
    model, params, tokens, cond = setup
    params = _nonzero_head(params)
    B, K, S = tokens.shape
    tpf = default_tokens_per_frame(S, cond.shape[1], K)

    full = model.apply(
        {"params": params}, tokens, cond, False, tokens_per_frame=tpf
    )  # [B, K, S, card]

    # build the same per-position conditioning stream used by __call__
    cond_emb = model.apply(
        {"params": params}, cond, False, method=model.embed_cond
    )
    cond_seq = model.apply(
        {"params": params}, cond_emb, S, tpf, method=model.build_cond_seq
    )

    cache = model.apply({"params": params}, B, S, method=model.init_cache)
    outs = []
    for s in range(S):
        logits_s, cache = model.apply(
            {"params": params},
            tokens[:, :, s : s + 1],
            cond_seq[:, s : s + 1],
            cache,
            jnp.int32(s),
            method=model.decode_step,
        )
        outs.append(np.asarray(logits_s))
    incremental = np.stack(outs, axis=2)  # [B, K, S, card]
    np.testing.assert_allclose(np.asarray(full), incremental, atol=2e-4)


def test_prefill_matches_full_forward(setup):
    """Prefill writes the whole prompt's K/V in one pass and yields the
    same logits as the causal forward."""
    model, params, tokens, cond = setup
    params = _nonzero_head(params)
    B, K, S = tokens.shape
    tpf = default_tokens_per_frame(S, cond.shape[1], K)
    full = model.apply(
        {"params": params}, tokens, cond, False, tokens_per_frame=tpf
    )
    cond_emb = model.apply({"params": params}, cond, False, method=model.embed_cond)
    cond_seq = model.apply(
        {"params": params}, cond_emb, S, tpf, method=model.build_cond_seq
    )
    logits, new_cache = model.apply(
        {"params": params}, tokens, cond_seq, method=model.prefill
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(logits), atol=2e-4)
    assert new_cache["k"].shape == (
        TINY.num_layers, B, S, TINY.n_kv_heads, TINY.head_dim
    )


def test_tokens_per_frame_rule():
    # reference llama.py:544-553: delayed pattern subtracts one special per
    # codebook. 230-step sequence, 9 codebooks, 32 video tokens -> 7
    assert default_tokens_per_frame(230, 32, 9, "DelayedPatternProvider") == 7


def test_cfg_dropout_changes_cond(setup):
    """With class_dropout_prob=1 every sample's condition collapses to the
    uncond embedding during training."""
    model, params, tokens, cond = setup
    cfg = TINY.__class__(**{**TINY.__dict__, "class_dropout_prob": 1.0})
    model2 = Sampler(cfg)
    emb = model2.apply(
        {"params": params},
        cond,
        True,
        method=model2.embed_cond,
        rngs={"cfg_dropout": jax.random.PRNGKey(0)},
    )
    uncond = model2.apply(
        {"params": params}, cond.shape[0], cond.shape[1],
        method=model2.uncond_cond_emb,
    )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(uncond), atol=1e-5)


def test_quantized_decode_close_to_float(setup):
    """int8 weight-only decode must track the float path closely (the
    sampling distribution is logit-level; require small max deviation)."""
    import dataclasses

    from vaura_tpu.ops.quantization import quantize_sampler_params

    model, params, tokens, cond = setup
    params = _nonzero_head(params)
    full = model.apply({"params": params}, tokens, cond, False)

    qcfg = dataclasses.replace(TINY, quantize_weights=True)
    qmodel = Sampler(qcfg)
    qparams = quantize_sampler_params(params)
    qfull = qmodel.apply({"params": qparams}, tokens, cond, False)
    err = np.abs(np.asarray(full) - np.asarray(qfull)).max()
    scale = np.abs(np.asarray(full)).max()
    assert err < 0.05 * max(scale, 1.0), (err, scale)


@pytest.mark.slow
def test_quantized_cache_decode_close_to_float(setup):
    """int8 KV cache decode must track the float-cache decode closely."""
    import dataclasses

    model, params, tokens, cond = setup
    params = _nonzero_head(params)
    B, K, S = tokens.shape
    tpf = default_tokens_per_frame(S, cond.shape[1], K)
    cond_emb = model.apply({"params": params}, cond, False, method=model.embed_cond)
    cond_seq = model.apply(
        {"params": params}, cond_emb, S, tpf, method=model.build_cond_seq
    )

    def run(m):
        cache = m.apply({"params": params}, B, S, method=m.init_cache)
        outs = []
        for s in range(S):
            logits_s, cache = m.apply(
                {"params": params},
                tokens[:, :, s : s + 1],
                cond_seq[:, s : s + 1],
                cache,
                jnp.int32(s),
                method=m.decode_step,
            )
            outs.append(np.asarray(logits_s))
        return np.stack(outs, axis=2)

    ref = run(model)
    qmodel = Sampler(dataclasses.replace(TINY, quantize_cache=True))
    got = run(qmodel)
    err = np.abs(ref - got).max()
    assert err < 0.02 * max(np.abs(ref).max(), 1.0), err


def test_int4_pack_roundtrip():
    """Nibble packing is exact on the int4 grid, and quantize_kv4's
    dequantization error is bounded by half a quantization step."""
    from vaura_tpu.ops.quantization import quantize_kv4, unpack_int4

    rng = np.random.default_rng(0)
    q4 = rng.integers(-7, 8, size=(3, 5, 4, 16)).astype(np.int8)
    lo, hi = q4[..., :8], q4[..., 8:]
    packed = jnp.asarray((lo & 0x0F) | (hi << 4), jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), q4)

    x = jnp.asarray(rng.standard_normal((2, 7, 4, 16)), jnp.float32)
    p, s = quantize_kv4(x)
    assert p.shape == x.shape[:-1] + (8,) and p.dtype == jnp.int8
    deq = np.asarray(unpack_int4(p)).astype(np.float32) * np.asarray(s)[..., None]
    step = np.asarray(s)[..., None]
    assert np.abs(deq - np.asarray(x)).max() <= (step / 2 + 1e-6).max()


@pytest.mark.slow
def test_int4_cache_decode_close_to_float(setup):
    """int4 (nibble-packed) KV cache decode tracks the float-cache decode.
    Coarser than int8 (15 levels/head-row) — tolerance is correspondingly
    looser; quality at trained margins is gated separately
    (scripts/int8_margin_check.py --cache-bits 4)."""
    import dataclasses

    model, params, tokens, cond = setup
    params = _nonzero_head(params)
    B, K, S = tokens.shape
    tpf = default_tokens_per_frame(S, cond.shape[1], K)
    cond_emb = model.apply({"params": params}, cond, False, method=model.embed_cond)
    cond_seq = model.apply(
        {"params": params}, cond_emb, S, tpf, method=model.build_cond_seq
    )

    def run(m):
        cache = m.apply({"params": params}, B, S, method=m.init_cache)
        outs = []
        for s in range(S):
            logits_s, cache = m.apply(
                {"params": params},
                tokens[:, :, s : s + 1],
                cond_seq[:, s : s + 1],
                cache,
                jnp.int32(s),
                method=m.decode_step,
            )
            outs.append(np.asarray(logits_s))
        return np.stack(outs, axis=2)

    ref = run(model)
    q4 = Sampler(dataclasses.replace(TINY, quantize_cache=True, cache_bits=4))
    got4 = run(q4)
    err4 = np.abs(ref - got4).max()
    assert err4 < 0.15 * max(np.abs(ref).max(), 1.0), err4

    # int8 x int8 attention dots on top of the int4 cache: the dynamic
    # q/prob quantization adds ~1/254 relative error per dot — small
    # against the int4 cache error itself
    qd = Sampler(dataclasses.replace(
        TINY, quantize_cache=True, cache_bits=4, int8_dots=True
    ))
    gotd = run(qd)
    assert np.abs(got4 - gotd).max() < 0.05 * max(np.abs(ref).max(), 1.0)


@pytest.mark.slow
def test_int8_dots_decode_close_to_int8_cache(setup):
    """int8 x int8 attention dots (dynamic q/prob quantization) track the
    bf16-dot int8-cache decode closely."""
    import dataclasses

    model, params, tokens, cond = setup
    params = _nonzero_head(params)
    B, K, S = tokens.shape
    tpf = default_tokens_per_frame(S, cond.shape[1], K)
    cond_emb = model.apply({"params": params}, cond, False, method=model.embed_cond)
    cond_seq = model.apply(
        {"params": params}, cond_emb, S, tpf, method=model.build_cond_seq
    )

    def run(m):
        cache = m.apply({"params": params}, B, S, method=m.init_cache)
        outs = []
        for s in range(S):
            logits_s, cache = m.apply(
                {"params": params},
                tokens[:, :, s : s + 1],
                cond_seq[:, s : s + 1],
                cache,
                jnp.int32(s),
                method=m.decode_step,
            )
            outs.append(np.asarray(logits_s))
        return np.stack(outs, axis=2)

    base = run(Sampler(dataclasses.replace(TINY, quantize_cache=True)))
    dots = run(Sampler(dataclasses.replace(
        TINY, quantize_cache=True, int8_dots=True
    )))
    err = np.abs(base - dots).max()
    assert err < 0.03 * max(np.abs(base).max(), 1.0), err
