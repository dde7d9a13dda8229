"""Generate action (reference ``scripts/generate.py``): load a trained
checkpoint, iterate a generation dataloader, run single-chunk or chunked
long-duration generation, and save WAV (+ MP4 mux when the native media
module is available).

The batched KV-cache generation replaces the reference's per-sample
O(S^2) host loop; samples still stream from the dataloader but decode in
fixed-shape compiled steps.
"""

from __future__ import annotations

import logging
import math
import traceback
import types
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import yaml

from vaura_tpu.utils import cached_jit

from vaura_tpu.data import get_datamodule_from_type
from vaura_tpu.models.factory import build_system
from vaura_tpu.ops.audio import normalize_audio, write_wav
from vaura_tpu.train.checkpoint import CheckpointManager, abstract_like
from vaura_tpu.train.steps import split_params
from vaura_tpu.utils.experiment import (
    load_hparams,
    resolve_best_checkpoint,
    resolve_experiment_paths,
)
from vaura_tpu.utils.seeding import seed_everything

logger = logging.getLogger(__name__)

COMPRESSION_MODEL_FRAME_RATE = 86  # DAC tokens/s (reference generate.py:30)


def scale_audio(
    audio: np.ndarray, strategy: str = "clip", sample_rate: int = 44100
) -> np.ndarray:
    """Reference ``scripts/generate.py:443-461``."""
    return normalize_audio(
        audio, strategy=strategy, sample_rate=sample_rate, peak_clip_headroom_db=6.0
    ).reshape(1, -1)


def save_results(
    audio: np.ndarray,
    frames: Optional[np.ndarray],
    output_dir: Path,
    fn: str,
    v_fps: float = 25.0,
    a_fps: int = 44100,
    audio_norm_strategy: str = "clip",
) -> None:
    """WAV always; MP4 mux via the native libav module when built
    (reference ``save_results``, ``generate.py:392-440``)."""
    if fn.endswith(".mp4") or fn.endswith(".wav"):
        fn = fn[:-4]
    audio = scale_audio(audio, audio_norm_strategy, a_fps)
    write_wav(output_dir / f"{fn}.wav", audio, a_fps)
    if frames is not None:
        try:
            from vaura_tpu.data.media import write_video

            write_video(
                str(output_dir / f"{fn}.mp4"),
                frames,
                fps=v_fps,
                audio=audio,
                audio_sample_rate=a_fps,
            )
        except Exception as e:  # native module absent or mux failure
            logger.warning("mp4 mux skipped for %s: %s", fn, e)


def generate(cfg: dict) -> dict:
    logging.basicConfig(level=logging.INFO)
    logging.getLogger().setLevel(logging.INFO)
    duration = float(cfg.get("duration", 2.56))
    stride = float(cfg.get("stride", 0.64))
    assert (
        abs(stride / 0.64 - round(stride / 0.64)) < 1e-6
    ), "Stride must be a multiple of 0.64"
    vfps = float(cfg.get("vfps", 25))
    model_max_duration = cfg.get("model_max_duration")
    use_sampling = bool(cfg.get("use_sampling", True))
    temp = float(cfg.get("temperature", 1.0))
    top_k = int(cfg.get("top_k", 256))
    top_p = float(cfg.get("top_p", 0.0))
    cfg_scale = float(cfg.get("cfg_scale", 1.0))
    audio_norm_strategy = cfg.get("audio_norm_strategy", "clip")

    # resolve experiment checkpoint + hparams. Two formats:
    #   * our training runs (orbax trees under logs/<stamp>/checkpoints)
    #   * the reference distribution (Lightning .ckpt + hparams.yaml,
    #     reference scripts/generate.py:43-128) — accepted under the
    #     reference's own config key `checkpoint_path`
    from vaura_tpu.utils.reference_ckpt import (
        is_reference_checkpoint,
        load_reference_experiment,
    )

    exp_path = cfg.get("experiment_path")
    hparams = None
    ckpt_path = cfg.get("ckpt_path") or cfg.get("checkpoint_path")
    ref_params = None
    probe = ckpt_path or exp_path
    if probe and is_reference_checkpoint(probe):
        model_cfg, ref_params, ckpt_file = load_reference_experiment(
            probe,
            overridden_hparams=cfg["overridden_hparams"]
            if "overridden_hparams" in cfg else None,
            hparams=cfg.get("hparams"),
        )
        logger.info("Loaded reference checkpoint %s", ckpt_file)
        ckpt_path = None  # params come converted, not via orbax restore
    else:
        if exp_path:
            paths = resolve_experiment_paths(exp_path)
            if ckpt_path is None:
                best = resolve_best_checkpoint(paths["checkpoints"])
                ckpt_path = str(best) if best else None
            if paths["hparams"] is not None:
                hparams = load_hparams(paths["hparams"])
        source = hparams if hparams and "model" in hparams else cfg
        if "model" not in source:
            # No experiment and no inline model section: fall back to the
            # flagship defaults so shipped generate configs run out of the
            # box (random weights, like demo.py without --ckpt).
            from vaura_tpu.config.loader import load_config

            repo_root = Path(__file__).resolve().parents[1]
            source = load_config(
                repo_root / "configs" / "vaura_defaults.yaml", repo_root
            )
            logger.warning(
                "no experiment_path/model config: using flagship defaults "
                "with random weights"
            )
        model_cfg = source["model"]
        overridden = cfg.get("overridden_hparams") or {}
        for k, v in overridden.items():
            model_cfg[k] = v

    system = build_system(model_cfg)
    rng = seed_everything(int(cfg.get("seed", 666)))
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    params = system.load_dac_embeddings_into_sampler(params)
    trainable, frozen = split_params(system, params)
    if ckpt_path:
        from vaura_tpu.train.checkpoint import restore_trainable_params

        trainable = restore_trainable_params(
            ckpt_path, trainable, model_cfg, cfg.get("trainer")
        )
        logger.info("Loaded checkpoint %s", ckpt_path)
    params = {**frozen, **trainable}
    if ref_params is not None:
        import numpy as _onp

        params.update({
            k: jax.tree.map(_onp.asarray, v) for k, v in ref_params.items()
        })
    # bf16 weights for inference: halves weight-streaming HBM traffic
    import jax.numpy as jnp

    from vaura_tpu.utils import cast_floats

    params = cast_floats(params, jnp.bfloat16)
    if cfg.get("quantize"):
        # int8 weight-only decoder + int8 KV cache (fastest; measured
        # flagship logit deviation mean ~4e-2 of logit std — validate
        # sample quality on real weights before serving int8;
        # PERFORMANCE.md has the measurement)
        import dataclasses as _dc

        from vaura_tpu.ops.quantization import quantize_sampler_params

        params = dict(params)
        params["sampler"] = quantize_sampler_params(
            jax.device_get(params["sampler"])
        )
        system.sampler_config = _dc.replace(
            system.sampler_config, quantize_weights=True, quantize_cache=True
        )
        system.__post_init__()
        logger.info("int8 weight + KV-cache quantization enabled")

    if model_max_duration is None:
        model_max_duration = (
            2.56 if system.sampler_config.block_size > 64 else 0.64
        )  # reference generate.py:221-226
    total_gen_len = int(duration * COMPRESSION_MODEL_FRAME_RATE)
    stride_tokens = int(COMPRESSION_MODEL_FRAME_RATE * stride)
    model_max_tokens = int(model_max_duration * COMPRESSION_MODEL_FRAME_RATE)

    # long_mode: "reprefill" (reference generate.py:327-370 striding) or
    # "stream_kv" (rolling-KV continuous decode, generate_long_kv — zero
    # prompt recompute; ~2x long-horizon throughput, PERFORMANCE.md r5)
    long_mode = str(cfg.get("long_mode", "reprefill")).lower()
    if long_mode not in ("reprefill", "stream_kv"):
        raise ValueError(f"unknown long_mode: {long_mode!r}")
    if long_mode == "stream_kv" and duration > model_max_duration:
        import dataclasses as _dc_lm

        need = total_gen_len + 64  # interleave delays + headroom
        if system.sampler_config.block_size < need:
            system.sampler_config = _dc_lm.replace(
                system.sampler_config, block_size_audio=need
            )
            system.__post_init__()

    out_dir = Path(cfg.get("output_dir", "./generated"))
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    # `dataset_to_use` / `samples_per_video` are action-level keys carried
    # inside the dataloader section (reference generate.py:135-137 pops
    # them before the datamodule sees the kwargs)
    dl_cfg = dict(cfg["dataloader"])
    split = str(
        dl_cfg.pop("dataset_to_use", cfg.get("dataset_to_use", "test"))
    ).lower()
    dl_cfg.pop("samples_per_video", None)
    datamodule = get_datamodule_from_type(dl_cfg["dataset_type"], dl_cfg)
    datamodule.setup(split)
    loader = {
        "train": datamodule.train_dataloader,
        "test": datamodule.test_dataloader,
        "validation": datamodule.val_dataloader,
    }[split]()

    # multi-chip batched generation: shard the batch over a data mesh and
    # replicate params (the 'VisualSound test split on v5e-8' config,
    # BASELINE.json). Params could also be fsdp-sharded via
    # vaura_tpu.parallel.partitioning for bigger models.
    batch_sharding = None
    if jax.device_count() > 1:
        bs = int(cfg["dataloader"].get("batch_size", 1))
        if bs % jax.device_count() == 0:
            from vaura_tpu.parallel.mesh import batch_sharding as _bs, make_mesh

            mesh = make_mesh(data=-1, fsdp=1, model=1)
            batch_sharding = _bs(mesh)
            from vaura_tpu.parallel.partitioning import param_shardings

            params = jax.tree.map(
                jax.device_put, params, param_shardings(mesh, params)
            )
            logger.info(
                "sharding generation batch %d over %d devices",
                bs, jax.device_count(),
            )

    sampling = dict(
        use_sampling=use_sampling, temp=temp, top_k=top_k, top_p=top_p,
        cfg_scale=cfg_scale,
    )
    # encoder_chunk_size: run the visual encoder over lax.map batch slices
    # so the ViT's frame/activation footprint stops capping the generation
    # batch (v5e: encoder OOMs at B>=64 while the AR loop peaks at 128)
    if cfg.get("encoder_chunk_size"):
        sampling["encoder_chunk_size"] = int(cfg["encoder_chunk_size"])
    # ground-truth audio handling (reference generate.py:181-182,286-301):
    # save_original_files writes the GT audio alongside the generated clip,
    # by default round-tripped through the codec (compress_original_audio)
    # so codec ceiling and model quality separate cleanly. prompt_duration
    # exposes audio-prompted generation (the model supports prompt codes
    # internally — reference vaura_model.py:455-469 — but the reference CLI
    # never surfaces it).
    save_original_files = bool(cfg.get("save_original_files", False))
    compress_original_audio = bool(cfg.get("compress_original_audio", True))
    prompt_duration = float(cfg.get("prompt_duration", 0.0))
    remove_prompts = bool(cfg.get("remove_prompts", False))
    a_sr = system.dac_config.sample_rate

    max_batches = cfg.get("max_batches")
    _jits = types.SimpleNamespace()

    # GT codec round-trip (save_original_files + compress_original_audio)
    # runs once per sample — jit it or the ~50 DAC convs dispatch
    # one-by-one per clip on a remote device
    def _codec_roundtrip(ga: np.ndarray) -> np.ndarray:
        fn = cached_jit(
            _jits, "roundtrip", ga.shape,
            lambda p, a: system.decode_audio(p, system.encode_audio(p, a)),
        )
        return np.asarray(fn(params, jax.numpy.asarray(ga)), dtype=np.float32)

    n_done = 0
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= int(max_batches):
            break
        try:
            frames = batch["frames"]
            gt_audio = batch.get("audio")
            if gt_audio is not None:
                gt_audio = np.asarray(gt_audio, dtype=np.float32)
                if gt_audio.ndim == 4:  # clip-partitioned [B, n, 1, T]
                    gt_audio = gt_audio.transpose(0, 2, 1, 3).reshape(
                        gt_audio.shape[0], 1, -1
                    )
            prompt_codes = None
            if prompt_duration > 0 and gt_audio is not None:
                n_samp = int(prompt_duration * a_sr)
                n_tok = int(prompt_duration * COMPRESSION_MODEL_FRAME_RATE)
                prompt_codes = system.encode_audio(
                    params, jax.numpy.asarray(gt_audio[:, :, :n_samp])
                )[:, :, :n_tok]
            frame_step = int(cfg.get("frame_step", 1) or 1)
            if frame_step > 1:
                # temporal subsample within each segment
                # (reference generate.py:311,345)
                frames = frames[:, :, :, ::frame_step]
            if batch_sharding is not None:
                frames = jax.device_put(np.asarray(frames), batch_sharding)
            rng, gen_rng = jax.random.split(rng)
            if duration <= model_max_duration:
                # jit per (frames, prompt) shape — steady batches share one
                # graph, the last short batch compiles a second. Eager
                # dispatch runs only the decode scans compiled; the
                # encoder/prefill/DAC ops would go op-by-op (25x slower on
                # a tunneled TPU; see serve.py _generate).
                key = (
                    tuple(frames.shape),
                    None if prompt_codes is None else tuple(prompt_codes.shape),
                )
                has_prompt = prompt_codes is not None

                def _gen(params, frames, rng, prompt, _hp=has_prompt):
                    return system.generate(
                        params, frames, rng,
                        max_new_tokens=total_gen_len,
                        tokens_per_frame=7,
                        audio_prompt_codes=prompt if _hp else None,
                        remove_prompts=remove_prompts,
                        **sampling,
                    )

                fn = cached_jit(_jits, "gen", key, _gen)
                item = fn(params, frames, gen_rng, prompt_codes)
            elif long_mode == "stream_kv":
                item = system.generate_long_kv(
                    params, frames, gen_rng,
                    total_tokens=total_gen_len,
                    vfps=vfps,
                    window_chunks=int(cfg.get("window_chunks", 4)),
                    chunk_steps=int(cfg.get("chunk_steps", 56)),
                    sink_chunks=int(cfg.get("sink_chunks", 0)),
                    **sampling,
                )
            else:
                item = system.generate_long(
                    params, frames, gen_rng,
                    total_tokens=total_gen_len,
                    stride_tokens=stride_tokens,
                    model_max_tokens=model_max_tokens,
                    vfps=vfps,
                    **sampling,
                )
            audio = np.asarray(item["audio"])
            codes = (
                np.asarray(item["codes"])
                if cfg.get("return_sampled_indices")
                else None
            )
            for i in range(audio.shape[0]):
                fn = Path(batch["meta"]["filepath"][i]).name
                if codes is not None:
                    # sampled codebook indices for token-distribution
                    # analysis (reference generate.py:316,358 +
                    # vaura_model.py:594-595)
                    np.save(out_dir / f"{Path(fn).stem}.codes.npy", codes[i])
                orig_frames = None
                if cfg.get("save_video", True):
                    # re-read the source video so the mux carries original
                    # pixels (reference get_original_data,
                    # generate.py:279-285,464-520)
                    try:
                        from vaura_tpu.data import media

                        start = batch["meta"].get("start_pts")
                        start = (
                            float(np.asarray(start)[i])
                            if start is not None
                            else 0.0
                        )
                        orig_frames, _, _ = media.read_video(
                            batch["meta"]["filepath"][i],
                            start=start,
                            duration=duration,
                            fps=vfps,
                            want_audio=False,
                        )
                    except Exception as e:
                        logger.debug("original reload failed for %s: %s", fn, e)
                save_results(
                    audio[i], orig_frames, out_dir, fn,
                    v_fps=vfps, a_fps=system.dac_config.sample_rate,
                    audio_norm_strategy=audio_norm_strategy,
                )
                if save_original_files and gt_audio is not None:
                    # GT audio next to the generated clip; DAC round-trip by
                    # default (reference generate.py:286-301,428-440 writes
                    # {fn}_original with the codec-compressed GT track)
                    ga = gt_audio[i : i + 1]
                    if compress_original_audio:
                        ga = _codec_roundtrip(ga)
                    save_results(
                        ga.reshape(-1), orig_frames, out_dir,
                        f"{Path(fn).stem}_original",
                        v_fps=vfps, a_fps=a_sr,
                        audio_norm_strategy=audio_norm_strategy,
                    )
                n_done += 1
        except Exception as e:
            # per-sample robustness (reference generate.py:386-389)
            logger.error("Error generating batch: %s", e)
            traceback.print_exc()
            continue
    logger.info("Generated %d clips into %s", n_done, out_dir)
    return {"output_dir": str(out_dir), "num_generated": n_done}
