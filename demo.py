"""Demo: the reference ``demo.ipynb`` path as a script.

Loads (or synthesizes) a demo video, extracts MotionFormer features,
generates 2.56 s of audio with the KV-cache sampler (single chunk), then a
longer clip via chunked striding, and muxes the generated audio back onto
the video (reference demo cells 3-8).

Without a converted checkpoint the model runs with random weights — the
pipeline is exercised end-to-end either way. Point ``--ckpt`` at a tree
produced by ``scripts/convert_checkpoints.py vaura`` for real audio.

Usage::

    python demo.py [--video data/demo/clip.mp4] [--ckpt converted/]
                   [--duration 2.56] [--out demo_out/]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("demo")


def synthesize_demo_video(path: Path, seconds: float = 4.0, fps: float = 25.0) -> None:
    """A moving test pattern with click audio — stands in for the bundled
    demo MP4s (which we cannot download in this environment)."""
    from vaura_tpu.data import media

    n = int(seconds * fps)
    h = w = 256
    t = np.arange(n)[:, None, None]
    y = np.arange(h)[None, :, None]
    x = np.arange(w)[None, None, :]
    r = ((x + t * 6) % 256).astype(np.uint8)
    g = ((y + t * 3) % 256).astype(np.uint8)
    b = ((x + y) % 256).astype(np.uint8)
    frames = np.stack(
        [np.broadcast_to(c, (n, h, w)) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)
    sr = 44100
    audio = np.zeros(int(seconds * sr), np.float32)
    for k in range(int(seconds * 4)):  # 4 clicks/s
        i = int(k * sr / 4)
        audio[i : i + 200] = 0.8 * np.hanning(200)
    media.write_video(path, frames, fps=fps, audio=audio, audio_sample_rate=sr)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--video", type=Path, default=None)
    ap.add_argument("--ckpt", type=Path, default=None,
                    help="orbax tree from scripts/convert_checkpoints.py, "
                         "or a reference Lightning .ckpt / experiment dir")
    ap.add_argument("--platform", type=str, default=None,
                    help="jax platform override (e.g. cpu; a bare run on a "
                         "TPU box claims the exclusive chip)")
    ap.add_argument("--duration", type=float, default=2.56)
    ap.add_argument("--long-duration", type=float, default=0.0,
                    help="if > model max (2.56), also run chunked generation")
    ap.add_argument("--out", type=Path, default=Path("demo_out"))
    ap.add_argument("--cfg-scale", type=float, default=6.0)
    ap.add_argument("--temperature", type=float, default=0.95)
    ap.add_argument("--top-k", type=int, default=128)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", str(args.platform))
    import jax.numpy as jnp

    from vaura_tpu.config import load_config
    from vaura_tpu.data import media
    from vaura_tpu.models.factory import build_system
    from vaura_tpu.ops.audio import write_wav
    from vaura_tpu.utils import cast_floats
    from vaura_tpu.utils.seeding import seed_everything

    args.out.mkdir(parents=True, exist_ok=True)
    video = args.video
    if video is None:
        # prefer the bundled demo clips (data/demo, reference demo.ipynb
        # cell 3); fall back to synthesizing one
        bundled = sorted((Path(__file__).parent / "data" / "demo").glob("*.mp4"))
        if bundled:
            video = bundled[0]
            logger.info("using bundled demo clip %s", video)
        else:
            video = args.out / "demo_input.mp4"
            if not video.exists():
                logger.info("synthesizing demo video at %s", video)
                synthesize_demo_video(video)

    # build the flagship system from the default module configs — or, for
    # a reference-distribution checkpoint (Lightning .ckpt / experiment
    # dir), from its own hparams.yaml
    from vaura_tpu.utils.reference_ckpt import (
        is_reference_checkpoint,
        load_reference_experiment,
    )

    repo = Path(__file__).parent
    ref_load = args.ckpt is not None and is_reference_checkpoint(args.ckpt)
    if ref_load:
        model_cfg, ref_params, ckpt_file = load_reference_experiment(args.ckpt)
        logger.info("using reference checkpoint %s", ckpt_file)
    else:
        model_cfg = {
            "sampler_config": load_config(repo / "configs/modules/samplers/llama_9cbs.yaml"),
            "audio_encoder_config": load_config(
                repo / "configs/modules/audio_codecs/dac_8kbps_wrapper.yaml"
            ),
            "feature_extractor_config": load_config(
                repo / "configs/modules/feature_extractors/avclip_vggsound.yaml"
            ),
            "pattern_provider_config": load_config(
                repo / "configs/modules/codebook_patterns/delayed_9cbs.yaml"
            ),
            "freeze_feature_extractor": True,
        }
    system = build_system(model_cfg)
    rng = seed_everything(666)
    rng, init_rng = jax.random.split(rng)
    logger.info("initializing parameters...")
    params = system.init_params(init_rng)
    params = system.load_dac_embeddings_into_sampler(params)
    if ref_load:
        import numpy as np_

        params.update({
            k: jax.tree.map(np_.asarray, v) for k, v in ref_params.items()
        })
        logger.info("loaded reference checkpoint subtrees: %s",
                    sorted(ref_params))
    elif args.ckpt is not None:
        import orbax.checkpoint as ocp
        from vaura_tpu.train.checkpoint import abstract_like

        ckptr = ocp.StandardCheckpointer()
        loaded = ckptr.restore(Path(args.ckpt).resolve(), abstract_like(params))
        params.update({k: v for k, v in loaded.items() if v is not None})
        logger.info("loaded converted checkpoint from %s", args.ckpt)
    else:
        logger.warning("no checkpoint: generating with random weights")
    params = cast_floats(params, jnp.bfloat16)

    # read frames at the model contract: 25 fps, 224x224 center crop
    frames, _, info = media.read_video(
        video, duration=max(args.duration, args.long_duration) + 0.66,
        fps=25.0, min_side=256,
    )
    H, W = frames.shape[1:3]
    y0, x0 = (H - 224) // 2, (W - 224) // 2
    frames = frames[:, y0 : y0 + 224, x0 : x0 + 224]
    frames = (frames.astype(np.float32) / 255.0 - 0.5) / 0.5
    # frames per segment from the encoder geometry (flagship: 8*2 = 16)
    enc = system.encoder_config
    seg_t = (enc.temporal_resolution * enc.z_block_size) if enc else 16
    n_seg = frames.shape[0] // seg_t
    frames = frames[: n_seg * seg_t].reshape(n_seg, seg_t, 224, 224, 3)
    frames = np.transpose(frames, (0, 4, 1, 2, 3))[None]  # [1, S, C, T, H, W]
    logger.info("video -> %s segments", n_seg)

    sampling = dict(
        temp=args.temperature, top_k=args.top_k, cfg_scale=args.cfg_scale
    )
    tokens = int(args.duration * 86)
    seg_for_chunk = max(int(np.ceil(args.duration / 0.64)), 1)
    rng, gen_rng = jax.random.split(rng)
    logger.info("single-chunk generation: %d tokens...", tokens)
    # jit the whole pipeline (encoder+prefill+decode+DAC): eager dispatch
    # compiles only the decode scans and runs everything else op-by-op
    out = jax.jit(
        lambda p, f, r: system.generate(
            p, f, r, max_new_tokens=tokens, tokens_per_frame=7, **sampling
        )
    )(params, jnp.asarray(frames[:, :seg_for_chunk]), gen_rng)
    audio = np.clip(np.asarray(out["audio"], np.float32), -1, 1)
    write_wav(args.out / "generated.wav", audio[0], 44100)
    media.write_video(
        args.out / "generated.mp4",
        ((frames[0, :seg_for_chunk].transpose(0, 2, 3, 4, 1).reshape(-1, 224, 224, 3)) * 0.5 + 0.5),
        fps=25.0,
        audio=audio[0, 0],
        audio_sample_rate=44100,
    )
    logger.info("wrote %s", args.out / "generated.mp4")

    if args.long_duration > 2.56:
        total = int(args.long_duration * 86)
        rng, gen_rng = jax.random.split(rng)
        logger.info("chunked generation: %d tokens...", total)
        out = system.generate_long(
            params,
            jnp.asarray(frames),
            gen_rng,
            total_tokens=total,
            stride_tokens=int(0.64 * 86),
            **sampling,
        )
        audio = np.clip(np.asarray(out["audio"], np.float32), -1, 1)
        write_wav(args.out / "generated_long.wav", audio[0], 44100)
        logger.info("wrote %s", args.out / "generated_long.wav")


if __name__ == "__main__":
    main()
