"""AOT serving graphs (vaura_tpu.utils.aot): jax.export round-trip of the
full generation pipeline — the deserialized StableHLO artifact must
reproduce the live-jitted pipeline bit-for-bit from the same seed, and
scripts/serve.py must be able to export at warmup and serve from a loaded
artifact. No reference counterpart (serving is outside its scope)."""

import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

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
            nhead=4, block_size_audio=64, block_size_video=16,
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


@pytest.mark.slow
def test_export_load_parity(tiny_system, tmp_path):
    import jax

    sys_, params = tiny_system
    B, tv, n_tokens = 2, 8, 20
    art = tmp_path / "gen.jaxexport"

    from vaura_tpu.utils.aot import export_generate, load_generate

    meta = export_generate(
        sys_, params, batch=B, tv=tv, max_new_tokens=n_tokens,
        sampling=SAMPLING, path=art,
    )
    assert art.exists() and (tmp_path / "gen.jaxexport.json").exists()
    assert meta["batch"] == B and meta["cond_dim"] == 24

    fn, meta2 = load_generate(art)
    assert meta2 == json.loads((tmp_path / "gen.jaxexport.json").read_text())

    feats = np.random.default_rng(0).standard_normal(
        (B, tv, 24)
    ).astype(np.float32)
    audio_a, codes_a = fn(params, feats, np.int32(7))

    def direct(p, f, seed):
        out = sys_.generate(
            p, None, jax.random.PRNGKey(seed), vis_feats=f,
            max_new_tokens=n_tokens, tokens_per_frame=7,
            decode_to_audio=True, **SAMPLING,
        )
        return out["audio"], out["codes"]

    audio_j, codes_j = jax.jit(direct)(params, feats, np.int32(7))
    np.testing.assert_array_equal(np.asarray(codes_a), np.asarray(codes_j))
    np.testing.assert_array_equal(np.asarray(audio_a), np.asarray(audio_j))


@pytest.mark.slow
def test_serve_aot_roundtrip(tmp_path):
    """serve.py aot_export writes the artifact at warmup; a second service
    with aot_load serves from it and produces the jit path's exact codes
    (both paths build the rng from the same per-batch seed)."""
    from scripts.serve import GenerationService
    from vaura_tpu.config import assemble_config

    def make_cfg(**kw):
        cfg = dict(
            assemble_config(
                [f"config={REPO / 'configs/experiments/dummy.yaml'}"],
                defaults_path=REPO / "configs" / "vaura_defaults.yaml",
                base_dir=REPO,
            )
        )
        base = dict(batch=1, duration=0.15, top_k=8, max_wait_ms=10)
        base.update(kw)
        cfg.update(base)
        return cfg

    art = tmp_path / "serve.jaxexport"
    svc = GenerationService(make_cfg(aot_export=str(art)))
    svc.start()
    feats = np.random.default_rng(2).standard_normal(
        (4, svc.cond_dim)
    ).astype(np.float32)
    codes_jit = svc.submit(feats, want="codes")
    assert art.exists()

    svc2 = GenerationService(make_cfg(aot_load=str(art)))
    svc2.start()
    codes_aot = svc2.submit(feats, want="codes")
    np.testing.assert_array_equal(codes_jit, codes_aot)

    # artifact/server shape mismatch is refused at construction
    with pytest.raises(ValueError, match="does not match"):
        GenerationService(make_cfg(batch=3, aot_load=str(art)))
