"""Distribution-level quantization quality: sampled-rollout FAD table.

`int8_margin_check.py` measures token agreement of GREEDY rollouts — an
honest worst-case signal, but serving samples (temp 1.0, top-k 128,
CFG 6), where a flipped argmax need not change the *distribution* of the
generated audio at all. This script turns the "int8 CFG-6 rollouts are
not token-exact, needs FAD validation" caveat into numbers: for each
quantization arm, sampled rollouts from the SAME trained weights and the
SAME sampling seeds are decoded to waveforms through one shared bf16 DAC
and compared distributionally against the bf16 arm with the in-repo
melstats FAD embedder (``vaura_tpu.ops.fad``), next to a seed-split
noise floor (bf16 vs bf16 on disjoint seeds — any arm within the floor
is distribution-indistinguishable at this sample size).

Arms: bf16 (reference), int8 w+kv, int8 + int8_dots, int4 KV. Trained
weights come from the mid-scale overfit proxy (6L x 512d, CPU-runnable;
``--flagship`` for the 24L x 1536d recipe on the TPU). Reported per arm:

  * ``fad``          melstats FAD vs the bf16 arm (same seeds)
  * ``kld_melband``  paired KL between per-clip normalized mel-band
                     energy distributions vs bf16 (same seeds) — a
                     deterministic KLD-style stand-in for classifier
                     posteriors (no pretrained tagger offline)
  * ``token_agreement``  sampled-rollout token agreement (context only —
                     sampled tokens diverge by construction once any
                     step differs; the distributional rows are the
                     signal)

Prints one JSON dict. Run: ``python scripts/quant_quality_fad.py
[--mid] [--steps 150] [--clips 64]``.

Reference anchor: the reference delegates FAD/KLD to an external
framework (reference ``README.md:91-93``) and has no quantized serving
path at all; this table is the framework's own quality gate for its
beyond-reference int8 modes (PERFORMANCE.md "int8 honesty").
"""

from __future__ import annotations

if __package__ in (None, ""):
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import argparse
import dataclasses
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8,
                    help="overfit training batch")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--tokens", type=int, default=221)
    ap.add_argument("--clips", type=int, default=64,
                    help="sampled clips per arm (gen batch 16 per seed)")
    ap.add_argument("--gen-batch", type=int, default=16)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--mid", action="store_true",
                    help="6L x 512d CPU-runnable proxy (default is the "
                    "flagship 24L x 1536d — TPU only)")
    ap.add_argument("--tiny", action="store_true",
                    help="2L x 192d logic smoke (NOT representative)")
    ap.add_argument("--temp", type=float, default=1.0)
    ap.add_argument("--top-k", type=int, default=128)
    ap.add_argument("--cfg-scale", type=float, default=6.0)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", str(args.platform))
    import jax.numpy as jnp

    from vaura_tpu.models.dac.model import config_for_sample_rate
    from vaura_tpu.models.sampler import SamplerConfig
    from vaura_tpu.models.vaura import VauraSystem
    from vaura_tpu.ops.fad import (
        MelStatsEmbedder,
        frechet_audio_distance,
        paired_kl_divergence_from_probs,
    )
    from vaura_tpu.train.state import TrainState, make_optimizer
    from vaura_tpu.utils import cast_floats

    B = args.batch
    sampler_cfg = SamplerConfig(remat=True)  # flagship 24L x 1536d
    if args.tiny:
        sampler_cfg = dataclasses.replace(
            sampler_cfg, num_layers=2, d_model=192, nhead=4,
            block_size_audio=64,
        )
        args.tokens = min(args.tokens, 48)
        args.clips = min(args.clips, 2 * args.gen_batch)
    elif args.mid:
        sampler_cfg = dataclasses.replace(
            sampler_cfg, num_layers=6, d_model=512, nhead=8,
        )
    dac_cfg = config_for_sample_rate(44100)
    system = VauraSystem(
        sampler_config=sampler_cfg,
        dac_config=dac_cfg,
        encoder_config=None,
        use_visual_conditioning=True,
    )

    # ---- overfit the proxy (same recipe as int8_margin_check) ------- #
    rng = jax.random.PRNGKey(0)
    tokens0 = jnp.zeros((1, 9, 16), jnp.int32)
    cond0 = jnp.zeros((1, 8, 768))
    sam = jax.jit(
        lambda r: system.sampler.init(
            {"params": r, "dropout": r, "cfg_dropout": r}, tokens0, cond0,
            False,
        )["params"]
    )(rng)
    state = TrainState.create({"sampler": sam}, make_optimizer(args.lr))

    rngb = np.random.default_rng(0)
    codes = jnp.asarray(rngb.integers(0, 1024, size=(B, 9, args.tokens)))
    vis = jnp.asarray(rngb.standard_normal((B, 32, 768)).astype(np.float32))

    def train_step(state, rng):
        def loss_fn(trainable):
            loss, _ = system.train_forward(
                trainable, None, None, rng, train=True, vis_feats=vis,
                codes=codes,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    t0 = time.time()
    loss = None
    for i in range(args.steps):
        state, loss = step(state, jax.random.PRNGKey(10 + i))
    loss_final = float(np.asarray(loss))
    print(f"# overfit: loss -> {loss_final:.4f} "
          f"({args.steps} steps, {time.time()-t0:.0f}s)", flush=True)
    trained = jax.device_get(state.params["sampler"])
    del state

    # one shared bf16 DAC decodes EVERY arm's codes (the DAC is frozen
    # and identical in serving regardless of sampler quantization)
    dac_params = jax.jit(
        lambda r: system.dac.init(
            r, jnp.zeros((1, 1, dac_cfg.hop_length * 8))
        )["params"]
    )(jax.random.PRNGKey(7))
    dac_params = jax.device_get(cast_floats(dac_params, jnp.bfloat16))

    def build(quantize: bool, cache_bits: int = 8, int8_dots: bool = False,
              cache_only: bool = False):
        cfg = dataclasses.replace(
            sampler_cfg, remat=False, dropout=0.0,
            quantize_weights=quantize, quantize_cache=quantize or cache_only,
            cache_bits=cache_bits if (quantize or cache_only) else 8,
            int8_dots=int8_dots,
        )
        sys_ = VauraSystem(
            sampler_config=cfg, dac_config=dac_cfg, encoder_config=None,
            use_visual_conditioning=True,
        )
        if quantize:
            from vaura_tpu.ops.quantization import quantize_sampler_params

            p = cast_floats(quantize_sampler_params(trained), jnp.bfloat16)
        else:
            p = cast_floats(trained, jnp.bfloat16)
        return sys_, {"sampler": p, "dac": dac_params}

    arms = {
        "bf16": build(False),
        "int8_cache": build(False, cache_only=True),
        "int8": build(True),
        "int8_dots": build(True, int8_dots=True),
        "int4_kv": build(True, cache_bits=4),
    }

    # sampled rollouts: the SAME seed list for every arm; the extra
    # bf16 set on DISJOINT seeds is the FAD noise floor
    n_seeds = (args.clips + args.gen_batch - 1) // args.gen_batch
    seeds = list(range(100, 100 + n_seeds))
    floor_seeds = list(range(500, 500 + n_seeds))
    vis_gen = vis[: args.gen_batch]
    if args.gen_batch > B:
        reps = (args.gen_batch + B - 1) // B
        vis_gen = jnp.tile(vis, (reps, 1, 1))[: args.gen_batch]

    embedder = MelStatsEmbedder()
    sr = dac_cfg.sample_rate

    def run_arm(sys_, params, seed_list):
        from vaura_tpu.utils import cached_jit

        fn = cached_jit(
            sys_, "_fadqc_jit",
            (args.gen_batch, args.tokens, args.cfg_scale, args.temp,
             args.top_k),
            lambda p, v, r: sys_.generate(
                p, None, r, vis_feats=v,
                max_new_tokens=args.tokens, tokens_per_frame=7,
                use_sampling=True, temp=args.temp, top_k=args.top_k,
                cfg_scale=args.cfg_scale, decode_to_audio=True,
            ),
        )
        wavs, toks = [], []
        for s in seed_list:
            out = fn(params, vis_gen, jax.random.PRNGKey(s))
            wavs.append(np.asarray(out["audio"], np.float32))
            toks.append(np.asarray(out["codes"]))
        wav = np.concatenate(wavs)[: args.clips]
        tok = np.concatenate(toks)[: args.clips]
        emb = np.stack([embedder(w.reshape(-1), sr) for w in wav])
        # normalized mel-band energy distribution per clip (first n_mels
        # dims of the embedding are log-mel means)
        mel = np.exp(emb[:, : embedder.n_mels])
        return emb, mel, tok

    results = {}
    t0 = time.time()
    emb_ref, mel_ref, tok_ref = run_arm(*arms["bf16"], seeds)
    emb_floor, _, _ = run_arm(*arms["bf16"], floor_seeds)
    noise_floor = frechet_audio_distance(emb_ref, emb_floor)
    print(f"# bf16 + floor rollouts done ({time.time()-t0:.0f}s)",
          flush=True)
    for name in ("int8_cache", "int8", "int8_dots", "int4_kv"):
        emb, mel, tok = run_arm(*arms[name], seeds)
        results[name] = {
            "fad": round(frechet_audio_distance(emb_ref, emb), 4),
            "kld_melband": round(
                paired_kl_divergence_from_probs(mel_ref, mel), 5
            ),
            "token_agreement": round(float((tok == tok_ref).mean()), 4),
        }
        print(f"# {name} done ({time.time()-t0:.0f}s)", flush=True)

    print(json.dumps({
        "overfit_loss": round(loss_final, 4),
        "fad_noise_floor_bf16_seed_split": round(noise_floor, 4),
        "arms": results,
        "clips": int(args.clips),
        "sampling": {"temp": args.temp, "top_k": args.top_k,
                     "cfg_scale": args.cfg_scale},
        "scale": ("tiny" if args.tiny else "mid" if args.mid
                  else "flagship"),
    }))


if __name__ == "__main__":
    main()
