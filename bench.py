"""Headline benchmark: batched 2.56 s clip generation on one chip.

Measures the full generation hot path of the flagship V-AURA configuration
(24L x 1536d x 16h decoder, 9 DAC codebooks, CFG 2x batch, top-k 128
sampling, KV-cache decode via lax.scan, DAC decode to waveform) and prints
ONE JSON line:

    {"metric": "audio_sec_per_sec_per_chip", "value": X,
     "unit": "audio_sec/sec/chip", "vs_baseline": X / 5.0}

``vs_baseline`` is measured against the driver's north-star target of 5x
realtime per v5e chip (BASELINE.md); the reference repo publishes no
throughput numbers (it recomputes the full prefix per token — an O(S^2)
path that is far below realtime, reference ``vaura_model.py:502-547``).

Weights are randomly initialized — throughput does not depend on weight
values. Run: ``python bench.py [--batch B] [--tokens N]``.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SECONDS_PER_CLIP = 2.56
TOKENS_PER_SECOND = 86  # DAC 44.1kHz frame rate (reference generate.py:30)


def main() -> None:
    ap = argparse.ArgumentParser()
    # B=128 is the measured single-chip throughput sweet spot (int8 cache
    # ~8.6 GB; B=160 exhausts the 16 GB HBM): 49.1 (B=32) -> 55.2 (64)
    # -> 56.9 (96) -> 58.7 (128) audio-sec/s full pipeline
    # default None -> resolved after parsing: 128 (the measured generate
    # sweet spot), or 32 under --with-encoder (frames + ViT activations
    # must fit beside the cache)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--tokens", type=int, default=221)
    ap.add_argument("--cfg-scale", type=float, default=6.0)
    ap.add_argument("--top-k", type=int, default=128)
    ap.add_argument("--no-dac", action="store_true", help="skip waveform decode")
    ap.add_argument(
        "--int8", dest="quant_mode", action="store_const", const="int8",
        default=None,
        help="int8 weight + int8 KV-cache decoder (the r3/r4 headline "
             "mode; measured flagship logit deviation: mean 4e-2 of "
             "logit std — quality table in PERFORMANCE.md r5)",
    )
    ap.add_argument("--no-int8", dest="quant_mode", action="store_const",
                    const="none", help="fully bf16 (exact)")
    ap.add_argument(
        "--int8-cache-only", dest="quant_mode", action="store_const",
        const="cache",
        help="bf16 weights + int8 KV cache — the DEFAULT in generate "
             "mode (94.7 au-s/s at B=128, faster than full int8 since "
             "the loop is cache-bandwidth-bound, weight math exact; "
             "int8_cache FAD sits at the bf16 seed-split noise floor — "
             "PERFORMANCE.md r5 quant-quality table)",
    )
    ap.add_argument(
        "--cache-bits", type=int, choices=[8, 4], default=8,
        help="KV-cache width under --int8: 4 = nibble-packed int4. "
             "MEASURED DEAD END on v5e (44.3 vs 93.5 au-s/s at B=128 — "
             "nibble unpack beats the read saving; also not serving-safe "
             "quality-wise, PERFORMANCE.md r5)",
    )
    ap.add_argument(
        "--int8-dots", action="store_true",
        help="int8 x int8 attention dots in the decode loop (dynamic q/prob "
             "quantization; MXU reads the int8 cache without bf16 widening). "
             "MEASURED DEAD END on v5e (39.9 vs 93.5 au-s/s at B=128 — the "
             "per-step dynamic quantization costs more than the widening, "
             "PERFORMANCE.md r5)",
    )
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--mode", choices=["generate", "train", "encoder", "long"],
        default="generate",
        help="train: flagship train-step throughput; encoder: "
             "MotionFormer feature-extraction sweep (ms per 2.56 s clip); "
             "long: 10.24 s chunked generation with prompt carry "
             "(reference generate_vgg_sparse.yaml striding)",
    )
    ap.add_argument("--duration", type=float, default=10.24,
                    help="long mode: total seconds per sample")
    ap.add_argument("--stride", type=float, default=0.64,
                    help="long mode: chunk stride seconds (sparse config)")
    ap.add_argument("--long-kv", action="store_true",
                    help="long mode: rolling-KV streaming decode "
                         "(generate_long_kv) instead of chunk re-prefill "
                         "— one continuous scan, zero prompt recompute; "
                         "window defaults to 4x56 steps ~ the flagship's "
                         "trained 221-token context")
    ap.add_argument("--window-chunks", type=int, default=4,
                    help="--long-kv: trailing chunks queries attend")
    ap.add_argument("--chunk-steps", type=int, default=56,
                    help="--long-kv: steps per rolling cache chunk "
                         "(8-aligned)")
    ap.add_argument("--sink-chunks", type=int, default=0,
                    help="--long-kv: StreamingLLM-style pinned anchor "
                         "chunks (0 = pure sliding window)")
    ap.add_argument("--layers", type=int, default=None,
                    help="override decoder layer count (AR cost "
                         "decomposition: time(L) = fixed + L * per_layer)")
    ap.add_argument("--greedy", action="store_true",
                    help="argmax sampling (isolates top-k cost)")
    ap.add_argument("--decode-buckets", type=int, default=None,
                    help="segmented decode (default on, bit-exact): each "
                         "scan segment carries a KV-cache buffer physically "
                         "sized to its maximum attended length, cutting "
                         "early-step cache reads (AR-only B=128: 70.9 -> "
                         "100.7 au-s/s; 1 disables). Default 8; long mode "
                         "defaults to 2 (prefill dominates the carry "
                         "chunks, so higher n is noise: n=4 measured "
                         "35.7 vs n=2 35.4 au-s/s at B=128/10.24 s)")
    ap.add_argument(
        "--with-encoder", action="store_true",
        help="generate mode: true frames->waveform pipeline — the "
             "MotionFormer visual encoder runs inside the timed graph "
             "(225 MB of bf16 frames per 32-clip batch; default --batch "
             "drops to 32 where the whole pipeline fits)",
    )
    ap.add_argument(
        "--int8-encoder", action="store_true",
        help="int8 MotionFormer inference (encoder mode and "
             "--with-encoder): divided-block matmuls run int8 weights x "
             "dynamically-quantized int8 activations on the MXU's 2x "
             "int8 rate (quality bound: rel-L2 < 5%% at RANDOM weights, "
             "tests/test_encoder_quant.py; opt-in, never a default)",
    )
    ap.add_argument(
        "--encoder-chunk", type=int, default=None,
        help="with --with-encoder: run the visual encoder over sequential "
             "batch slices (lax.map) so the ViT's frame/activation "
             "footprint stops bounding the batch at 32 — e.g. "
             "--batch 128 --encoder-chunk 32 runs the AR loop at its "
             "sweet spot while the encoder streams 4 slices",
    )
    ap.add_argument(
        "--precomputed-codes", action="store_true",
        help="train mode: feed precomputed codec tokens (the "
             "scripts/precompute_codes.py pipeline) instead of encoding "
             "audio every step — measured 274 vs 200 ms/step at B=12",
    )
    ap.add_argument("--no-remat", action="store_true",
                    help="train mode: disable block rematerialization")
    ap.add_argument("--remat-policy", type=str, default=None,
                    choices=["dots", "dots_no_batch"],
                    help="train mode: checkpoint policy (default: save "
                         "nothing / recompute all). dots_no_batch saves "
                         "matmul outputs without batch dims — trades "
                         "memory for skipping big-dot recompute")
    ap.add_argument("--mu-dtype", type=str, default=None,
                    help="train mode: AdamW first-moment dtype (e.g. "
                         "bfloat16) — halves optimizer-state memory")
    ap.add_argument("--nu-dtype", type=str, default=None,
                    help="train mode: AdamW SECOND-moment dtype "
                         "(experimental; bf16 frees another ~1.4 GB at "
                         "flagship scale for batch-envelope probing)")
    ap.add_argument("--compilation-cache-dir", type=str, default=None,
                    help="persistent XLA compile cache (skips recompiles "
                    "across bench invocations; off by default so cold "
                    "numbers stay honest)")
    args = ap.parse_args()
    # quantization-mode resolution: generate mode defaults to the
    # quality-safe cache-only headline (PERFORMANCE.md r5); long/other
    # modes keep the historical int8 w+kv comparator unless overridden
    if args.quant_mode is None:
        args.quant_mode = "cache" if args.mode == "generate" else "int8"
    args.int8 = args.quant_mode == "int8"
    args.int8_cache_only = args.quant_mode == "cache"
    if args.batch is None:
        args.batch = 32 if args.with_encoder else 128
    if args.compilation_cache_dir:
        from vaura_tpu.utils import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache_dir)
    if args.decode_buckets is None:
        args.decode_buckets = 2 if args.mode == "long" else 8

    if args.mode == "train":
        return bench_train(args)
    if args.mode == "encoder":
        return bench_encoder(args)
    if args.mode == "long":
        return bench_long(args)

    from vaura_tpu.models.dac.model import config_for_sample_rate
    from vaura_tpu.models.motionformer import MotionFormerConfig
    from vaura_tpu.models.sampler import SamplerConfig
    from vaura_tpu.models.vaura import VauraSystem

    import dataclasses

    sampler_cfg = SamplerConfig()  # flagship config
    if args.layers:
        sampler_cfg = dataclasses.replace(sampler_cfg, num_layers=args.layers)
    dac_cfg = dataclasses.replace(
        config_for_sample_rate(44100), dtype=jnp.bfloat16
    )
    enc_cfg = (
        MotionFormerConfig(dtype=jnp.bfloat16, quantize=args.int8_encoder)
        if args.with_encoder else None
    )
    system = VauraSystem(
        sampler_config=sampler_cfg,
        dac_config=dac_cfg,
        encoder_config=enc_cfg,
        use_visual_conditioning=bool(args.with_encoder),
    )

    rng = jax.random.PRNGKey(0)
    B, Tv = args.batch, 32

    # random-initialized params (throughput is weight-value independent)
    r_dac, r_sam = jax.random.split(rng)
    wav = jnp.zeros((1, 1, dac_cfg.hop_length * 4))
    dac_params = jax.jit(lambda r: system.dac.init(r, wav)["params"])(r_dac)
    tokens0 = jnp.zeros((1, sampler_cfg.num_codebooks, 16), jnp.int32)
    cond0 = jnp.zeros((1, 8, sampler_cfg.cond_in_dim))
    sam_params = jax.jit(
        lambda r: system.sampler.init(
            {"params": r, "dropout": r, "cfg_dropout": r}, tokens0, cond0, False
        )["params"]
    )(r_sam)
    params = {"sampler": sam_params, "dac": dac_params}
    frames = None
    if args.with_encoder:
        # 2.56 s at the media contract: 4 segments x 16 frames @ 224^2
        params["encoder"] = jax.jit(
            lambda r: system.encoder.init(
                r, jnp.zeros((1, 1, 3, 16, 224, 224))
            )["params"]
        )(jax.random.PRNGKey(7))
        frames = jax.random.normal(
            jax.random.PRNGKey(8), (B, 4, 3, 16, 224, 224), jnp.bfloat16
        )

    vis_feats = jax.random.normal(
        jax.random.PRNGKey(1), (B, Tv, sampler_cfg.cond_in_dim), jnp.float32
    )

    pattern, valid_mask, S = system.prepare_generation(args.tokens)
    use_cfg = args.cfg_scale > 1.0

    @jax.jit
    def generate(params, vis_feats, rng, frames=None):
        if frames is not None:
            # true pipeline: the visual encoder runs inside the timed
            # graph (reference generate.py:279-285 pays this per sample)
            vis_feats = system.visual_features(
                params, frames, chunk_size=args.encoder_chunk
            )
        cond_seq = system.build_cond_seq_for_generation(
            params, vis_feats, S, tokens_per_frame=7, cfg=use_cfg
        )
        gen_seq = jnp.full(
            (B, sampler_cfg.num_codebooks, args.tokens), -1, jnp.int32
        )
        gen_seq, _, _ = pattern.build_pattern_sequence(
            gen_seq, system.special_token_id
        )
        gen_seq = system.generate_tokens(
            params,
            cond_seq,
            gen_seq,
            rng,
            S=S,
            valid_mask=valid_mask,
            use_sampling=not args.greedy,
            temp=1.0,
            top_k=args.top_k,
            cfg_scale=args.cfg_scale,
            decode_buckets=args.decode_buckets,
        )
        codes, _, _ = pattern.revert_pattern_sequence(gen_seq, -1)
        codes = jnp.clip(codes[..., : args.tokens], 0, sampler_cfg.d_codebook - 1)
        if args.no_dac:
            return codes
        # chunked waveform decode only where memory demands it: DAC
        # activation temps OOM at B>=144 on 16 GB HBM, but the serialized
        # lax.map slices cost ~12% at B=128 (65.8 -> 58.3), so full-batch
        # decode below that
        audio = system.decode_audio(
            params, codes, chunk_size=32 if B >= 144 else None
        )
        # return a checksum, not the waveform: the full 14 MB host fetch
        # would measure the PJRT transport, not the chip (production
        # serving writes device->host asynchronously / keeps audio on
        # device for the muxer)
        return jnp.sum(jnp.abs(audio))

    from vaura_tpu.utils import cast_floats

    # bf16 weights for inference: halves the per-step HBM weight streaming
    params = cast_floats(params, jnp.bfloat16)
    if args.int8_cache_only:
        args.int8 = False
        from vaura_tpu.models.vaura import VauraSystem as _VS

        sampler_cfg = dataclasses.replace(
            sampler_cfg, quantize_weights=False, quantize_cache=True,
            cache_bits=args.cache_bits, int8_dots=args.int8_dots,
        )
        system = _VS(
            sampler_config=sampler_cfg,
            dac_config=dac_cfg,
            encoder_config=enc_cfg,
            use_visual_conditioning=bool(args.with_encoder),
        )
    if args.int8:
        from vaura_tpu.models.vaura import VauraSystem as _VS
        from vaura_tpu.ops.quantization import quantize_sampler_params

        sampler_cfg = dataclasses.replace(
            sampler_cfg, quantize_weights=True, quantize_cache=True,
            cache_bits=args.cache_bits, int8_dots=args.int8_dots,
        )
        system = _VS(
            sampler_config=sampler_cfg,
            dac_config=dac_cfg,
            encoder_config=enc_cfg,
            use_visual_conditioning=bool(args.with_encoder),
        )
        q_params = {
            "sampler": cast_floats(
                quantize_sampler_params(jax.device_get(sam_params)),
                jnp.bfloat16,
            ),
            "dac": params["dac"],
        }
        if "encoder" in params:
            q_params["encoder"] = params["encoder"]
        params = q_params

    # warmup / compile (np.asarray forces a host sync — block_until_ready
    # can return early under remote-execution PJRT relays)
    out = generate(params, vis_feats, jax.random.PRNGKey(2), frames)
    np.asarray(jax.tree.leaves(out)[0])

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = generate(params, vis_feats, jax.random.PRNGKey(3 + i), frames)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    audio_seconds = B * args.tokens / TOKENS_PER_SECOND
    value = audio_seconds / elapsed
    metric = (
        "frames_to_audio_sec_per_sec_per_chip"
        if args.with_encoder else "audio_sec_per_sec_per_chip"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": round(value / 5.0, 3),
                "quant_mode": args.quant_mode,
                "batch": B,
            }
        )
    )


def bench_encoder(args) -> None:
    """MotionFormer feature extraction on its own: ms per 2.56 s clip
    (4 segments x 16 frames @ 224^2, divided space-time ViT-B/16 + spatial
    CLS agg — reference motionformer.py:252-342) over a batch sweep."""
    from vaura_tpu.models.motionformer import MotionFormer, MotionFormerConfig

    import dataclasses as _dc

    cfg = MotionFormerConfig(dtype=jnp.bfloat16)
    if args.layers is not None:
        # depth sweep decomposition: time(depth) = fixed + depth x
        # per-block (patch embed + pos emb + agg layers are the fixed
        # term) — run --layers {0,4,12} to locate the encoder's cost
        cfg = _dc.replace(cfg, depth=args.layers)
    if args.int8_encoder:
        cfg = _dc.replace(cfg, quantize=True)
    model = MotionFormer(cfg)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 1, 3, 16, 224, 224)))["params"]
    )(jax.random.PRNGKey(0))

    @jax.jit
    def feats(params, frames):
        out, _ = model.apply({"params": params}, frames, False)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    results = {}
    for B in (1, 8, 16, 32):
        frames = jax.random.normal(
            jax.random.PRNGKey(1), (B, 4, 3, 16, 224, 224), jnp.bfloat16
        )
        np.asarray(feats(params, frames))  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(feats(params, frames))
            times.append(time.perf_counter() - t0)
        ms_per_clip = min(times) / B * 1e3
        results[B] = round(ms_per_clip, 2)
        print(f"# encoder B={B}: {ms_per_clip:.2f} ms/clip "
              f"({min(times)*1e3:.1f} ms/batch)")
    best = min(results.values())
    print(json.dumps({
        "metric": "encoder_ms_per_clip",
        "value": best,
        "unit": "ms/clip",
        "vs_baseline": round((SECONDS_PER_CLIP * 1e3) / best, 2),
        "sweep": results,
    }))


def bench_long(args) -> None:
    """Long-horizon chunked generation (reference
    ``scripts/generate.py:327-370`` striding; generate_vgg_sparse.yaml:
    10.24 s, stride 0.64 s): first chunk generates the full 2.56 s
    window, later chunks carry the last (window - stride) tokens as an
    audio prompt and generate ``stride`` new tokens. Reports au-s/s and
    per-batch p50 wall time."""
    import dataclasses

    from vaura_tpu.models.dac.model import config_for_sample_rate
    from vaura_tpu.models.sampler import SamplerConfig
    from vaura_tpu.models.vaura import VauraSystem
    from vaura_tpu.ops.quantization import quantize_sampler_params
    from vaura_tpu.utils import cast_floats

    B = args.batch
    sampler_cfg = SamplerConfig()
    if args.int8_cache_only:
        sampler_cfg = dataclasses.replace(
            sampler_cfg, quantize_weights=False, quantize_cache=True,
            cache_bits=args.cache_bits, int8_dots=args.int8_dots,
        )
    if args.long_kv:
        # rolling-KV streaming needs the RoPE freqs table to cover the
        # whole horizon (RoPE is relative, so positions past the trained
        # range only ever appear at in-window relative offsets)
        need = int(args.duration * TOKENS_PER_SECOND) + 64
        sampler_cfg = dataclasses.replace(
            sampler_cfg,
            block_size_audio=max(sampler_cfg.block_size_audio, need),
        )
    if args.int8:
        sampler_cfg = dataclasses.replace(
            sampler_cfg, quantize_weights=True, quantize_cache=True,
            cache_bits=args.cache_bits, int8_dots=args.int8_dots,
        )
    dac_cfg = dataclasses.replace(
        config_for_sample_rate(44100), dtype=jnp.bfloat16
    )
    system = VauraSystem(
        sampler_config=sampler_cfg,
        dac_config=dac_cfg,
        encoder_config=None,
        use_visual_conditioning=False,
    )
    rng = jax.random.PRNGKey(0)
    base_cfg = dataclasses.replace(
        sampler_cfg, quantize_weights=False, quantize_cache=False
    )
    base_sys = VauraSystem(
        sampler_config=base_cfg, dac_config=dac_cfg, encoder_config=None,
        use_visual_conditioning=False,
    )
    tokens0 = jnp.zeros((1, sampler_cfg.num_codebooks, 16), jnp.int32)
    cond0 = jnp.zeros((1, 8, sampler_cfg.cond_in_dim))
    sam = jax.jit(
        lambda r: base_sys.sampler.init(
            {"params": r, "dropout": r, "cfg_dropout": r}, tokens0, cond0,
            False,
        )["params"]
    )(rng)
    dac = jax.jit(
        lambda r: system.dac.init(r, jnp.zeros((1, 1, 2048)))["params"]
    )(rng)
    sam = cast_floats(jax.device_get(sam), jnp.bfloat16)
    if args.int8:
        sam = cast_floats(quantize_sampler_params(sam), jnp.bfloat16)
    params = {"sampler": sam, "dac": dac}

    total_tokens = int(args.duration * TOKENS_PER_SECOND)
    stride_tokens = int(args.stride * TOKENS_PER_SECOND)
    n_seg = int(np.ceil(args.duration / 0.64))
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (B, n_seg, 8, sampler_cfg.cond_in_dim),
        jnp.float32,
    )

    # 4x-longer waveforms: DAC activation temps OOM at full batch
    # (measured B=32 x 10.24 s); decode in lax.map slices sized so
    # each slice carries ~the 2.56 s x 8-clip footprint
    dac_chunk = max(1, int(8 * 2.56 / args.duration * 4))

    def run(rng):
        if args.long_kv:
            out = system.generate_long_kv(
                params, None, rng,
                total_tokens=total_tokens,
                vis_feats_segments=feats,
                window_chunks=args.window_chunks,
                chunk_steps=args.chunk_steps,
                sink_chunks=args.sink_chunks,
                decode_to_audio=True,
                dac_chunk_size=dac_chunk,
                temp=1.0, top_k=args.top_k, cfg_scale=args.cfg_scale,
            )
        else:
            out = system.generate_long(
                params, None, rng,
                total_tokens=total_tokens,
                stride_tokens=stride_tokens,
                vis_feats_segments=feats,
                decode_to_audio=True,
                dac_chunk_size=dac_chunk,
                temp=1.0, top_k=args.top_k, cfg_scale=args.cfg_scale,
                decode_buckets=args.decode_buckets,
            )
        return np.asarray(
            jax.device_get(jnp.sum(jnp.abs(out["audio"])))
        )

    run(jax.random.PRNGKey(2))  # compile (first + steady chunk graphs)
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(3 + i))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    value = B * args.duration / min(times)
    print(json.dumps({
        "metric": "long_audio_sec_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(value / 5.0, 3),
        "duration_s": args.duration,
        "stride_s": args.stride,
        "long_kv": bool(args.long_kv),
        "batch": B,
        "p50_batch_seconds": round(p50, 3),
        "p50_latency_per_clip_s": round(p50, 3),
    }))


def bench_train(args) -> None:
    """Flagship decoder train-step throughput (frozen codec, remat)."""
    import dataclasses

    import optax

    from vaura_tpu.models.dac.model import config_for_sample_rate
    from vaura_tpu.models.sampler import SamplerConfig
    from vaura_tpu.models.vaura import VauraSystem
    from vaura_tpu.train.state import TrainState, make_optimizer

    # default --batch (128, the generate sweet spot) maps to the measured
    # 16 GB train envelope (12 with remat); an explicitly smaller/larger
    # train batch (<=64) is honored as-is for envelope probing
    B = args.batch if args.batch <= 64 else 12
    system = VauraSystem(
        sampler_config=SamplerConfig(
            remat=not args.no_remat, remat_policy=args.remat_policy
        ),
        dac_config=config_for_sample_rate(44100),
        encoder_config=None,
        use_visual_conditioning=True,
    )
    rng = jax.random.PRNGKey(0)
    tokens0 = jnp.zeros((1, 9, 16), jnp.int32)
    cond0 = jnp.zeros((1, 8, 768))
    sam = jax.jit(
        lambda r: system.sampler.init(
            {"params": r, "dropout": r, "cfg_dropout": r}, tokens0, cond0, False
        )["params"]
    )(rng)
    dac = jax.jit(
        lambda r: system.dac.init(r, jnp.zeros((1, 1, 2048)))["params"]
    )(rng)
    frozen = {"dac": dac}
    state = TrainState.create(
        {"sampler": sam},
        make_optimizer(1e-4, mu_dtype=args.mu_dtype, nu_dtype=args.nu_dtype)
    )

    def train_step(state, audio, codes, vis, rng):
        def loss_fn(trainable):
            params = {**frozen, **trainable}
            loss, _ = system.train_forward(
                params, None, audio, rng, train=True, vis_feats=vis,
                codes=codes,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    rngb = np.random.default_rng(0)
    if args.precomputed_codes:
        audio = None
        codes = jax.random.randint(rng, (B, 9, 221), 0, 1024)
    else:
        audio = jnp.asarray(
            (rngb.standard_normal((B, 1, 112896)) * 0.1).astype(np.float32)
        )
        codes = None
    vis = jnp.asarray(rngb.standard_normal((B, 32, 768)).astype(np.float32))
    state, l = step(state, audio, codes, vis, jax.random.PRNGKey(1))
    float(np.asarray(l))  # sync
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, l = step(state, audio, codes, vis, jax.random.PRNGKey(2 + i))
        float(np.asarray(l))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    value = B * 221 / dt
    # --- MFU: analytic model FLOPs (the standard 6*N*T transformer count
    # + the attention quadratic term 12*L*d*S^2; excludes remat recompute
    # and the DAC encode, so this is true *model* FLOPs utilization) ---
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(state.params)
    )
    S = 221
    cfg_s = system.sampler_config
    attn_quad = 12 * cfg_s.num_layers * cfg_s.d_model * S * S
    model_flops = 6 * n_params * B * S + attn_quad * B
    V5E_BF16_PEAK = 197e12
    mfu = model_flops / dt / V5E_BF16_PEAK
    # HFU (analytic): what the step actually executes. 6N/step splits
    # 2N forward + 4N backward; full remat ("save nothing") recomputes
    # the forward inside the backward (+2N -> 8/6), dots policies save
    # the matmul outputs (recompute is elementwise-only -> ~6/6). The
    # compiled-HLO cost_analysis() flop count is NOT used: on TPU (and
    # through the remote-relay PJRT client) it returns partial/garbage
    # numbers (measured 5.2% "HFU" under a 21.0% MFU, which is
    # impossible with remat).
    remat_mult = (
        8.0 / 6.0
        if (not args.no_remat and args.remat_policy is None)
        else 1.0
    )
    hfu = mfu * remat_mult
    print(f"# train MFU {mfu*100:.1f}% (model {model_flops/1e12:.2f} "
          f"TFLOP/step over {n_params/1e6:.0f}M params, {dt*1e3:.0f} ms)"
          f", HFU {hfu*100:.1f}% (analytic, remat x{remat_mult:.2f})")
    # vs_baseline: the reference recipe consumes 12 samples/step on each of
    # 4 GPUs; one chip matching one reference GPU's per-step batch in `dt`
    # seconds gives the ratio below (no published step time to compare to)
    print(
        json.dumps(
            {
                "metric": "train_codec_tokens_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "tokens/sec/chip",
                "vs_baseline": round(B / 12 / dt, 3),
                "mfu": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
