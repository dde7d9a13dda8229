"""Parity tests against the ACTUAL reference implementation.

Unlike the torch *replicas* in test_sampler/test_motionformer/test_convert,
these tests import the reference source from /root/reference (via the
minimal import shims in ``ref_oracle.py``) and use it as the oracle:

* pattern providers  — reference ``models/modules/misc/codebook_patterns.py``
* RoPE               — reference ``llama.py:593-650``
* AR decoder forward — reference ``llama.py:286-586`` (``Transformer``), with
  weights moved through ``convert_sampler_state_dict`` — the same converter
  a real checkpoint would go through.
* KV-cache decode    — our cached ``prefill``+``decode_step`` path vs the
  reference's full-prefix recompute at every position.

Everything runs on small shapes in float32 so CPU torch and CPU JAX agree
to tight tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import import_ref, make_fake_dac

torch = pytest.importorskip("torch")


# --------------------------------------------------------------------- #
# pattern providers — direct import, no shims needed
# --------------------------------------------------------------------- #
def _providers(ref_cp):
    from vaura_tpu.ops import patterns as ours

    K = 5
    return [
        ("delayed", ref_cp.DelayedPatternProvider(K), ours.DelayedPatternProvider(K)),
        (
            "delayed-custom",
            ref_cp.DelayedPatternProvider(K, delays=[0, 2, 2, 4, 4]),
            ours.DelayedPatternProvider(K, delays=[0, 2, 2, 4, 4]),
        ),
        (
            "delayed-flatten",
            ref_cp.DelayedPatternProvider(
                K, delays=list(range(K)), flatten_first=2, empty_initial=3
            ),
            ours.DelayedPatternProvider(
                K, delays=list(range(K)), flatten_first=2, empty_initial=3
            ),
        ),
        ("parallel", ref_cp.ParallelPatternProvider(K), ours.ParallelPatternProvider(K)),
        (
            "unrolled",
            ref_cp.UnrolledPatternProvider(K),
            ours.UnrolledPatternProvider(K),
        ),
        (
            "unrolled-partial",
            ref_cp.UnrolledPatternProvider(
                K, flattening=[0, 1, 1, 2, 2], delays=[0, 0, 0, 0, 0]
            ),
            ours.UnrolledPatternProvider(
                K, flattening=[0, 1, 1, 2, 2], delays=[0, 0, 0, 0, 0]
            ),
        ),
        (
            "unrolled-delayed",
            ref_cp.UnrolledPatternProvider(
                K, flattening=[0, 1, 1, 2, 2], delays=[0, 1, 1, 2, 2]
            ),
            ours.UnrolledPatternProvider(
                K, flattening=[0, 1, 1, 2, 2], delays=[0, 1, 1, 2, 2]
            ),
        ),
        (
            "valle",
            ref_cp.VALLEPattern(K, delays=[0, 1, 1, 2]),
            ours.VALLEPattern(K, delays=[0, 1, 1, 2]),
        ),
        # group_by must divide n_q (both implementations reject q >= n_q)
        ("musiclm", ref_cp.MusicLMPattern(4, group_by=2), ours.MusicLMPattern(4, group_by=2)),
    ]


def test_pattern_layouts_match_reference():
    """The full (t, q) layout of every provider equals the reference's."""
    ref_cp = import_ref("models.modules.misc.codebook_patterns")
    for name, ref_p, our_p in _providers(ref_cp):
        for T in (1, 7, 16):
            ref_pat = ref_p.get_pattern(T)
            our_pat = our_p.get_pattern(T)
            ref_layout = [sorted(step) for step in ref_pat.layout]
            our_layout = [sorted(step) for step in our_pat.layout]
            assert ref_layout == our_layout, f"{name} layout differs at T={T}"
            assert ref_pat.max_delay == our_pat.max_delay, name
            assert ref_pat.num_sequence_steps == our_pat.num_sequence_steps, name


@pytest.mark.parametrize("keep_only_valid_steps", [False, True])
def test_pattern_build_revert_parity_vs_reference(keep_only_valid_steps):
    """build/revert/logits-revert values + masks match the reference
    bit-for-bit on random codes (reference codebook_patterns.py:180-313)."""
    ref_cp = import_ref("models.modules.misc.codebook_patterns")
    rng = np.random.default_rng(0)
    B, T, card, special = 2, 11, 13, 999
    for name, ref_p, our_p in _providers(ref_cp):
        K = ref_p.n_q
        codes = rng.integers(0, card, size=(B, K, T)).astype(np.int64)
        ref_pat = ref_p.get_pattern(T)
        our_pat = our_p.get_pattern(T)

        rv, ri, rm = ref_pat.build_pattern_sequence(
            torch.from_numpy(codes), special, keep_only_valid_steps
        )
        ov, oi, om = our_pat.build_pattern_sequence(
            jnp.asarray(codes), special, keep_only_valid_steps
        )
        np.testing.assert_array_equal(rv.numpy(), np.asarray(ov), err_msg=name)
        np.testing.assert_array_equal(
            rm.numpy().reshape(np.asarray(om).shape), np.asarray(om), err_msg=name
        )

        # revert the built sequence -> recover the codes
        rv2, _, rm2 = ref_pat.revert_pattern_sequence(
            rv, special, keep_only_valid_steps
        )
        ov2, _, om2 = our_pat.revert_pattern_sequence(
            ov, special, keep_only_valid_steps
        )
        np.testing.assert_array_equal(rv2.numpy(), np.asarray(ov2), err_msg=name)
        np.testing.assert_array_equal(
            rm2.numpy().reshape(np.asarray(om2).shape), np.asarray(om2),
            err_msg=name,
        )

        # logits revert (model-output alignment)
        S = rv.shape[-1]
        logits = rng.normal(size=(B, card, K, S)).astype(np.float32)
        rl, _, rlm = ref_pat.revert_pattern_logits(
            torch.from_numpy(logits), float("nan"), keep_only_valid_steps
        )
        ol, _, olm = our_pat.revert_pattern_logits(
            jnp.asarray(logits), float("nan"), keep_only_valid_steps
        )
        np.testing.assert_array_equal(
            np.isnan(rl.numpy()), np.isnan(np.asarray(ol)), err_msg=name
        )
        np.testing.assert_allclose(
            np.nan_to_num(rl.numpy()), np.nan_to_num(np.asarray(ol)),
            rtol=0, atol=0, err_msg=name,
        )


def test_pattern_build_shorter_timesteps_than_pattern():
    """A pattern built for T may be applied to shorter code tensors
    (reference codebook_patterns.py:137-178 special-slot path)."""
    ref_cp = import_ref("models.modules.misc.codebook_patterns")
    from vaura_tpu.ops.patterns import DelayedPatternProvider

    K, T, Tz, special = 4, 12, 8, 777
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 100, size=(3, K, Tz)).astype(np.int64)
    ref_pat = ref_cp.DelayedPatternProvider(K).get_pattern(T)
    our_pat = DelayedPatternProvider(K).get_pattern(T)
    rv, _, rm = ref_pat.build_pattern_sequence(torch.from_numpy(codes), special)
    ov, _, om = our_pat.build_pattern_sequence(jnp.asarray(codes), special)
    np.testing.assert_array_equal(rv.numpy(), np.asarray(ov))
    np.testing.assert_array_equal(
        rm.numpy().reshape(np.asarray(om).shape), np.asarray(om)
    )


# --------------------------------------------------------------------- #
# RoPE
# --------------------------------------------------------------------- #
def test_rope_parity_vs_reference():
    """precompute_freqs_cis + apply_rotary_emb match reference
    llama.py:593-650 exactly."""
    llama = import_ref("models.modules.sampler.llama")
    from vaura_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis

    S, hd = 37, 12
    ref_cache = llama.precompute_freqs_cis(S, hd).numpy()
    our_cache = np.asarray(precompute_freqs_cis(S, hd))
    np.testing.assert_allclose(ref_cache, our_cache, rtol=1e-6, atol=1e-6)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, S, 4, hd)).astype(np.float32)
    ref_out = llama.apply_rotary_emb(
        torch.from_numpy(x), torch.from_numpy(ref_cache)
    ).numpy()
    our_out = np.asarray(apply_rotary_emb(jnp.asarray(x), jnp.asarray(our_cache)))
    np.testing.assert_allclose(ref_out, our_out, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------- #
# AR decoder (llama.Transformer)
# --------------------------------------------------------------------- #
L, D, NH, K, V, CD, SCALER = 2, 48, 4, 3, 17, 4, 3
TOKEN_DIM = D - D // SCALER  # 32 = channel-concat complement of cond_dim 16


@pytest.fixture(scope="module")
def ref_transformer():
    """A small reference Transformer with DAC-factored embeddings installed
    (the production configuration: llama.py:387-412) and non-zero heads."""
    llama = import_ref("models.modules.sampler.llama")
    torch.manual_seed(0)
    t = llama.Transformer(
        num_layers=L,
        d_model=D,
        d_codebook=V,
        block_size_audio=64,
        block_size_video=8,
        nhead=NH,
        dropout=0.1,
        num_codebooks=K,
        cond_feature_channel_scaler=SCALER,
    )
    t.initialize_embeddings(make_fake_dac(K, CD, V, TOKEN_DIM, seed=1))
    # heads are zero-init (llama.py:384-385) -> randomize for a meaningful test
    for head in t.lm_heads:
        torch.nn.init.normal_(head.weight, std=0.05)
    t.codebook_pattern = "delayed"
    t.eval()
    return t


@pytest.fixture(scope="module")
def our_sampler(ref_transformer):
    from vaura_tpu.models.convert import convert_sampler_state_dict
    from vaura_tpu.models.sampler import Sampler, SamplerConfig

    sd = ref_transformer.state_dict()
    params = convert_sampler_state_dict(sd, num_layers=L, num_codebooks=K, vocab=V)
    cfg = SamplerConfig(
        num_layers=L,
        d_model=D,
        d_codebook=V,
        num_codebooks=K,
        nhead=NH,
        block_size_audio=64,
        block_size_video=8,
        cond_feature_channel_scaler=SCALER,
        codebook_dim=CD,
        dtype=jnp.float32,
    )
    params = jax.tree.map(jnp.asarray, params)
    return Sampler(cfg), {"params": params}


def _random_inputs(S=23, Tv=4, B=2, seed=3):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, V + 1, size=(B, K, S)).astype(np.int32)
    cond = rng.normal(size=(B, Tv, 768)).astype(np.float32)
    return tokens, cond


def test_sampler_forward_parity_vs_reference(ref_transformer, our_sampler):
    """Full teacher-forced forward: converted weights + our scanned/fused
    decoder reproduce the reference Transformer's logits (llama.py:445-517),
    including x7 video repeat with empty-frame padding and trailing-residue
    trim (llama.py:555-586: S=23, Tv=4 -> tokens_per_frame 5, frame 4
    overflows -> empty_video_emb, res=2 -> trim)."""
    model, variables = our_sampler
    tokens, cond = _random_inputs()
    with torch.no_grad():
        ref_logits, _, _ = ref_transformer(
            tgt=torch.from_numpy(tokens).long(),
            memory=torch.from_numpy(cond),
        )
    our_logits = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(cond), False
    )
    np.testing.assert_allclose(
        ref_logits.numpy(), np.asarray(our_logits), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_sampler_decode_parity_vs_reference(ref_transformer, our_sampler):
    """Our KV-cache prefill+decode_step path reproduces the reference's
    full-prefix-recompute logits at EVERY position (the reference has no
    live cache — llama.py:213,477 — so its full forward at length p is the
    ground truth for our cached step at position p)."""
    model, variables = our_sampler
    S, Tv = 16, 4
    tokens, cond = _random_inputs(S=S, Tv=Tv, seed=4)
    tpf = 5  # match reference: ceil((16-3)/4) with codebook_pattern=delayed

    # reference: teacher-forced logits for the whole sequence
    with torch.no_grad():
        ref_logits, _, _ = ref_transformer(
            tgt=torch.from_numpy(tokens).long(),
            memory=torch.from_numpy(cond),
        )
    ref_np = ref_logits.numpy()  # [B, K, S, V]

    # ours: prefill the first P positions, then single-token decode steps
    P = 6
    cond_emb = model.apply(
        variables, jnp.asarray(cond), False, method=model.embed_cond
    )
    cond_seq = model.apply(
        variables, cond_emb, S, tpf, method=model.build_cond_seq
    )
    toks = jnp.asarray(tokens)
    prefill_logits, cache_small = model.apply(
        variables, toks[:, :, :P], cond_seq[:, :P], method=model.prefill
    )
    np.testing.assert_allclose(
        ref_np[:, :, :P], np.asarray(prefill_logits), rtol=2e-4, atol=2e-4
    )
    # grow the cache to S so decode steps have room
    cache = model.apply(variables, tokens.shape[0], S, method=model.init_cache)
    cache = {
        k: jax.lax.dynamic_update_slice(
            cache[k], cache_small[k], (0,) * cache[k].ndim
        )
        for k in cache
    }
    for pos in range(P, S):
        step_logits, cache = model.apply(
            variables,
            toks[:, :, pos : pos + 1],
            cond_seq[:, pos : pos + 1],
            cache,
            jnp.int32(pos),
            method=model.decode_step,
        )
        np.testing.assert_allclose(
            ref_np[:, :, pos],
            np.asarray(step_logits),
            rtol=3e-4,
            atol=3e-4,
            err_msg=f"decode mismatch at pos {pos}",
        )


def test_avclip_embedder_uncond_parity(ref_transformer, our_sampler):
    """CFG null-condition path: projecting the learned uncond buffer matches
    the reference's inference-time uncond branch (vaura_model.py:790-794
    feeds cls_embeddings.uncond_embedding through the same projection)."""
    model, variables = our_sampler
    B, Tv = 2, 4
    emb = ref_transformer.cls_embeddings
    with torch.no_grad():
        u = emb.uncond_embedding[:Tv].unsqueeze(0).expand(B, Tv, 768)
        ref_u = emb.projection(u).numpy()
    our_u = np.asarray(
        model.apply(variables, B, Tv, method=model.uncond_cond_emb)
    )
    np.testing.assert_allclose(ref_u, our_u, rtol=1e-5, atol=1e-5)
