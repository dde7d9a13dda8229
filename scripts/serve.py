"""Batched generation server (production-serving front-end).

The reference has no serving path (its generate loop is an offline
O(S^2)-per-token host script); this server packages the TPU-native
pipeline for deployment: one compiled fixed-shape generation graph, a
micro-batching queue in front of it (requests are padded to the compiled
batch and answered individually), and a plain-HTTP surface so any client
can drive it.

Endpoints::

    GET  /healthz            -> {"status": "ok"|"draining", "batch": B, ...}
    GET  /metrics            -> Prometheus counters (requests, batches,
                                fill ratio, latency avg, inflight)
    POST /generate           body: {"features": [[...768 floats...] x Tv]}
                             or    {"video_b64": "<base64 mp4>"}
                             -> WAV bytes (audio/wav)
    POST /generate?raw=codes -> JSON {"codes": [[...]]} (token output)
    POST /generate_long      body: {"features_segments": [[...] x t] x S}
                             or .npy bytes [S, t, cond_dim]
                             -> live WAV stream (chunks written as they
                                decode; stream_duration/stream_stride
                                server config sets the geometry;
                                stream_mode=kv switches to the rolling-KV
                                continuous decode — zero re-prefill,
                                ~1.6x the long-horizon throughput)
    POST /reload             body: {"ckpt_path": "..."} (optional; defaults
                             to the startup checkpoint) -> hot-swap the
                             serving weights without recompiling: same
                             architecture, new checkpoint; int8 agreement
                             gate re-runs and a failing reload keeps the
                             current weights serving

Batching: requests queue up; the worker drains up to ``--batch`` of them
(or waits ``--max-wait-ms``), pads the batch, runs the single compiled
graph, and replies per-request. Throughput at the compiled batch follows
bench.py (91.3 audio-sec/s/chip at B=128 int8 on v5e; serving default is
bf16 — see PERFORMANCE.md for the measured HTTP serving numbers).

Usage::

    python scripts/serve.py config=CONFIG.yaml [experiment_path=...]
        [port=8800] [batch=8] [duration=2.56] [quantize=true]
        [batch_buckets=1,4]  # extra smaller compiled batches: micro-
                             # batches pad to the smallest bucket that
                             # fits (low-load p50 ~ bucket/batch ratio)
        [trainer.platform=cpu]
        [aot_export=PATH]   # write a jax.export StableHLO serving graph
        [aot_load=PATH]     # serve from one (skips the startup trace)
"""

from __future__ import annotations

if __package__ in (None, ""):  # direct `python scripts/X.py` invocation
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import base64
import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger("serve")


class DrainingError(RuntimeError):
    """Raised for requests arriving after shutdown began (HTTP 503)."""


def _parse_batch_buckets(buckets, batch: int) -> list[int]:
    """Normalize the batch_buckets knob to a sorted list ending in batch.

    Accepts a comma string ("1,4"), a YAML list, or a bare int (the CLI
    overlay coerces "batch_buckets=1" to int). The full batch is always
    included as the largest bucket.
    """
    if not buckets:
        return [batch]
    if isinstance(buckets, str):
        buckets = [int(b) for b in buckets.split(",") if b.strip()]
    elif isinstance(buckets, int):
        buckets = [buckets]
    out = sorted({int(b) for b in buckets} | {batch})
    if out[-1] != batch or out[0] < 1:
        raise ValueError(
            f"batch_buckets {out} must be within [1, batch={batch}]"
        )
    return out


class GenerationService:
    """Owns the compiled generation graph and the micro-batching queue."""

    def __init__(self, cfg: dict):
        import jax

        platform = (cfg.get("trainer") or {}).get("platform")
        if platform:
            jax.config.update("jax_platforms", str(platform))
        cache_dir = cfg.get("compilation_cache_dir") or (
            cfg.get("trainer") or {}
        ).get("compilation_cache_dir")
        if cache_dir:
            from vaura_tpu.utils import enable_compilation_cache

            enable_compilation_cache(cache_dir)
        import jax.numpy as jnp

        from vaura_tpu.models.factory import build_system, maybe_load_pretrained
        from vaura_tpu.train.steps import split_params
        from vaura_tpu.utils import cast_floats
        from vaura_tpu.utils.experiment import (
            load_hparams,
            resolve_best_checkpoint,
            resolve_experiment_paths,
        )

        self.batch = int(cfg.get("batch", 8))
        # batch buckets: additional SMALLER compiled batch sizes; the
        # worker pads each micro-batch to the smallest bucket that fits
        # instead of always padding to the full compiled batch. A lone
        # request at batch=128 otherwise pays the 128-wide decode (the
        # per-step cost is HBM-bound on cache reads, ~linear in B), so
        # low-load p50 drops by roughly the bucket ratio. Every bucket is
        # compiled at warmup — startup cost scales with the list.
        self.batch_buckets = _parse_batch_buckets(
            cfg.get("batch_buckets"), self.batch
        )
        self.duration = float(cfg.get("duration", 2.56))
        self.tokens = int(self.duration * 86)
        # Fixed conditioning length: every request is padded to this many
        # feature rows so the jitted graph compiles exactly once (25 fps,
        # 16-frame segments, 8 features/segment — divided_224_16x4
        # contract; 2.56 s -> 32). Variable tv would recompile per batch
        # and block the first real request on a cold remote compile.
        self.tv = max(1, int(self.duration * 25.0) // 16) * 8
        self.max_wait_s = float(cfg.get("max_wait_ms", 20)) / 1e3
        # decode-graph knobs, bench.py's measured defaults: the chunked
        # DAC waveform decode keeps the throughput tier inside HBM (the
        # unchunked transposed-conv activations OOM the 16 GB chip at
        # B=128), bucketed decode is the r3/r4 KV-cache formulation
        self.decode_buckets = int(cfg.get("decode_buckets", 8))
        self.dac_chunk_size = int(
            cfg.get("dac_chunk_size")
            or max(1, int(8 * 2.56 / self.duration * 4))
        )
        # long-horizon streaming (/generate_long): fixed stream geometry so
        # the chunk graphs compile once (first request; steady-state chunks
        # share shapes -> two decode graphs total)
        self.stream_tokens = int(
            cfg.get("stream_tokens")
            or float(cfg.get("stream_duration", 10.24)) * 86
        )
        self.stream_stride_tokens = int(
            cfg.get("stream_stride_tokens")
            or float(cfg.get("stream_stride", 0.64)) * 86
        )
        self.stream_max_tokens = int(cfg.get("stream_max_tokens", 221))
        # video geometry follows the AUDIO horizon: when stream_tokens is
        # given without stream_duration the segments must still cover the
        # generated seconds, or positions%%S_total would silently wrap the
        # conditioning window (vaura.py _long_chunk_tokens)
        stream_secs = float(
            cfg.get("stream_duration") or self.stream_tokens / 86.0
        )
        self.stream_segments = max(1, int(stream_secs * 25.0) // 16)
        self.stream_t = int(cfg.get("stream_features_per_segment", 8))
        # /generate_long decode mode: "reprefill" (reference striding
        # semantics via generate_long_stream) or "kv" (rolling-KV
        # continuous decode via generate_long_kv_stream — zero chunk
        # re-prefill, ~1.6x long-horizon throughput; PERFORMANCE.md r5)
        self.stream_mode = str(cfg.get("stream_mode", "reprefill")).lower()
        if self.stream_mode not in ("reprefill", "kv"):
            raise ValueError(f"unknown stream_mode: {self.stream_mode!r}")
        self.stream_window_chunks = int(cfg.get("stream_window_chunks", 4))
        self.stream_chunk_steps = int(cfg.get("stream_chunk_steps", 56))
        self.sampling = dict(
            use_sampling=bool(cfg.get("use_sampling", True)),
            temp=float(cfg.get("temperature", 1.0)),
            top_k=int(cfg.get("top_k", 128)),
            top_p=float(cfg.get("top_p", 0.0)),
            cfg_scale=float(cfg.get("cfg_scale", 6.0)),
        )

        model_cfg = cfg["model"]
        ckpt_path = cfg.get("ckpt_path")
        exp = cfg.get("experiment_path")
        if exp:
            paths = resolve_experiment_paths(exp)
            if paths["hparams"] is not None:
                model_cfg = load_hparams(paths["hparams"])["model"]
            if ckpt_path is None:
                best = resolve_best_checkpoint(paths["checkpoints"])
                ckpt_path = str(best) if best else None

        self.system = build_system(model_cfg)
        if self.stream_mode == "kv":
            # the rolling-KV decode runs ONE continuous scan over the full
            # stream horizon, so the RoPE freqs table must cover it
            # (pattern delay + headroom; mirrors scripts/generate.py's
            # stream_kv block_size handling)
            import dataclasses as _dc_bs

            need = self.stream_tokens + 64
            if self.system.sampler_config.block_size < need:
                self.system.sampler_config = _dc_bs.replace(
                    self.system.sampler_config, block_size_audio=need
                )
                self.system.__post_init__()
        rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))
        params = self.system.init_params(rng)
        params = maybe_load_pretrained(params, model_cfg)
        params = self.system.load_dac_embeddings_into_sampler(params)
        if ckpt_path:
            from vaura_tpu.train.checkpoint import restore_trainable_params

            trainable, frozen = split_params(self.system, params)
            trainable = restore_trainable_params(
                ckpt_path, trainable, model_cfg, cfg.get("trainer")
            )
            params = {**frozen, **trainable}
            logger.info("loaded %s", ckpt_path)
        else:
            logger.warning("serving RANDOM weights (no checkpoint given)")
        # hot-reload state (POST /reload): the f32 trainable skeleton that
        # orbax restores against + the config needed to rebuild the
        # optimizer skeleton for training checkpoints; the frozen bf16
        # subtrees are shared by every swap (codec/encoder never train)
        from vaura_tpu.train.checkpoint import abstract_like

        _trainable_f32, _ = split_params(self.system, params)
        self._trainable_abstract = abstract_like(_trainable_f32)
        self._model_cfg = model_cfg
        self._trainer_cfg = cfg.get("trainer")
        self.ckpt_path = str(ckpt_path) if ckpt_path else None
        params = cast_floats(params, jnp.bfloat16)
        _, self._frozen_bf16 = split_params(self.system, params)
        qmode = cfg.get("quantize")
        # "cache": int8 KV cache with bf16 weights — the quality-safe
        # large-batch mode (a bf16 cache alone is ~17 GB at B=128; the
        # cache, not the weights, is the HBM wall). Cache quantization
        # is a graph property, not a params transform, so the reload
        # path's weight re-quantization (self._quantize) stays off and
        # the teacher-forced agreement gate does not apply (the decode
        # cache never exists in a teacher-forced forward) — rollout
        # validation lives in PERFORMANCE.md's quant-quality table.
        self._quantize = bool(qmode) and qmode != "cache"
        self._quantize_min_agreement = 0.0
        if qmode == "cache":
            import dataclasses as _dc

            self.system.sampler_config = _dc.replace(
                self.system.sampler_config, quantize_cache=True
            )
            self.system.__post_init__()
            logger.info("int8 KV cache with bf16 weights (quantize=cache)")
        elif self._quantize:
            import dataclasses as _dc

            from vaura_tpu.ops.quantization import quantize_sampler_params

            fp_sampler = params["sampler"]
            params = dict(params)
            params["sampler"] = quantize_sampler_params(
                jax.device_get(params["sampler"])
            )
            self.system.sampler_config = _dc.replace(
                self.system.sampler_config,
                quantize_weights=True, quantize_cache=True,
            )
            self.system.__post_init__()
            # quality gate: int8 must reproduce the bf16 argmax at the
            # loaded weights' own margins before it is allowed to serve
            # (measured at trained margins in PERFORMANCE.md "int8
            # quantization error"; random weights fail this by design)
            min_agree = float(cfg.get("quantize_min_agreement", 0.0) or 0.0)
            self._quantize_min_agreement = min_agree
            if min_agree > 0.0:
                agree = self._int8_agreement_probe(
                    fp_sampler, params["sampler"]
                )
                msg = (
                    "int8 teacher-forced argmax agreement vs bf16: %.4f "
                    "(gate: %.2f)" % (agree, min_agree)
                )
                if agree < min_agree:
                    raise RuntimeError(
                        msg + " — refusing to serve int8 at these weights; "
                        "serve without quantize or lower "
                        "quantize_min_agreement"
                    )
                logger.info(msg)
            else:
                # a disabled gate can never fail: skip the probe's two
                # extra graph compiles (minutes each on a cold tunnel)
                logger.info(
                    "int8 agreement gate disabled "
                    "(quantize_min_agreement=0); skipping probe"
                )
        self.params = params
        # multi-chip serving: shard the compiled batch over a data mesh,
        # params placed by the same partitioning rules as training (fsdp/
        # model axes are 1 here -> replicated; raise them via trainer.mesh
        # for models that don't fit one chip). Mirrors the generate
        # action's multi-chip path (scripts/generate.py:205-225).
        self._batch_sharding = None
        self._mesh = None
        mesh_cfg = dict((cfg.get("trainer") or {}).get("mesh") or {})
        if (
            jax.device_count() > 1
            and bool(cfg.get("mesh_serving", True))
            and self.batch % jax.device_count() == 0
        ):
            from vaura_tpu.parallel.mesh import (
                batch_sharding as _bs,
                make_mesh,
                replicated,
            )
            from vaura_tpu.parallel.partitioning import shard_params

            mesh = make_mesh(
                data=int(mesh_cfg.get("data", -1)),
                fsdp=int(mesh_cfg.get("fsdp", 1)),
                model=int(mesh_cfg.get("model", 1)),
            )
            bad = [b for b in self.batch_buckets
                   if b % jax.device_count() != 0]
            if bad:
                raise ValueError(
                    f"batch_buckets {bad} not divisible by the "
                    f"{jax.device_count()}-device serving mesh; every "
                    "bucket must shard evenly (or set mesh_serving=false)"
                )
            self._batch_sharding = _bs(mesh)
            self._replicated = replicated(mesh)
            self._mesh = mesh
            self.params = shard_params(mesh, self.params)
            if cfg.get("aot_export") or cfg.get("aot_load"):
                raise ValueError(
                    "aot_export/aot_load and mesh serving are mutually "
                    "exclusive (exported artifacts are single-device); "
                    "set mesh_serving=false to use AOT graphs"
                )
            logger.info(
                "serving batch %d sharded over %d devices (mesh %s)",
                self.batch, jax.device_count(),
                dict(zip(mesh.axis_names, mesh.devices.shape)),
            )
        self.cond_dim = self.system.sampler_config.cond_in_dim
        self.sample_rate = self.system.dac_config.sample_rate
        self._next_seed = int(cfg.get("seed", 0))
        self._batch_ema_s = 0.0  # EMA batch latency -> collection window
        self._jax = jax
        self._q: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        # observability + graceful shutdown
        self._metrics_lock = threading.Lock()
        self._metrics = {
            "requests_total": 0,
            "stream_requests_total": 0,
            "batches_total": 0,
            "batch_slots_total": 0,
            "errors_total": 0,
            "reloads_total": 0,
            "batch_capacity_total": 0,
            "batch_seconds_sum": 0.0,
        }
        self._bucket_counts = {b: 0 for b in self.batch_buckets}
        self._reload_lock = threading.Lock()
        self._inflight = 0
        self._draining = False
        # AOT serving graph (vaura_tpu.utils.aot): `aot_load` replaces the
        # startup jit trace+lower with a deserialized StableHLO artifact
        # (model code/config no longer shape the graph); `aot_export`
        # writes one after warmup for the next deploy.
        self.aot_export = cfg.get("aot_export")
        self._aot = None
        if (self.aot_export or cfg.get("aot_load")) and len(
            self.batch_buckets
        ) > 1:
            raise ValueError(
                "batch_buckets and aot_export/aot_load are mutually "
                "exclusive (exported artifacts are single fixed-batch "
                "graphs); drop the buckets or the AOT flags"
            )
        aot_load = cfg.get("aot_load")
        if aot_load:
            from vaura_tpu.utils.aot import load_generate

            fn, meta = load_generate(aot_load)
            for key, want in (("batch", self.batch), ("tv", self.tv),
                              ("cond_dim", self.cond_dim)):
                got = meta.get(key)
                if got is not None and int(got) != int(want):
                    raise ValueError(
                        f"aot_load artifact {key}={got} does not match "
                        f"server {key}={want} (re-export with this config)"
                    )
            # sampling is BAKED into the exported graph: a mismatch would
            # silently serve the artifact's temperature/top_k/cfg, not the
            # configured ones
            baked = meta.get("sampling")
            mine = {k: str(v) for k, v in self.sampling.items()}
            if baked is not None and baked != mine:
                raise ValueError(
                    f"aot_load artifact sampling {baked} does not match "
                    f"server sampling {mine} (re-export, or start the "
                    "server with the artifact's sampling config)"
                )
            self._aot = fn
            logger.info("loaded AOT generation graph %s (%s)",
                        aot_load, meta.get("platforms"))

    # ------------------------------------------------------------------ #
    def _int8_agreement_probe(
        self, fp_sampler, q_sampler, batch: int = 2, tokens: int = 32
    ) -> float:
        """Teacher-forced argmax agreement between the bf16 and int8
        sampler at the loaded weights, on a fixed synthetic probe batch.
        Cheap (two short forwards) and run once at startup."""
        import dataclasses as _dc

        import jax
        import jax.numpy as jnp
        import numpy as np

        from vaura_tpu.models.vaura import VauraSystem

        cfg_q = self.system.sampler_config
        cfg_f = _dc.replace(
            cfg_q, quantize_weights=False, quantize_cache=False
        )
        rng = np.random.default_rng(0)
        codes = jnp.asarray(
            rng.integers(0, cfg_q.d_codebook, size=(batch, cfg_q.num_codebooks, tokens))
        )
        vis = jnp.asarray(
            rng.standard_normal((batch, 8, cfg_q.cond_in_dim)).astype(np.float32)
        )

        def logits_for(cfg, sampler_params):
            sys_ = VauraSystem(
                sampler_config=cfg,
                dac_config=self.system.dac_config,
                encoder_config=None,
                use_visual_conditioning=True,
            )
            _, aux = jax.jit(
                lambda p: sys_.train_forward(
                    p, None, None, jax.random.PRNGKey(0), train=False,
                    vis_feats=vis, codes=codes,
                )
            )({"sampler": sampler_params})
            return np.asarray(aux["logits"], np.float32), np.asarray(
                aux["mask"], bool
            )

        lf, mask = logits_for(cfg_f, fp_sampler)
        lq, _ = logits_for(cfg_q, q_sampler)
        return float(
            (lf.argmax(-1)[mask] == lq.argmax(-1)[mask]).mean()
        )

    def reload(self, ckpt_path: Optional[str] = None) -> dict:
        """Hot-swap serving weights from a checkpoint without restarting
        or recompiling (POST /reload).

        The compiled graphs close over shapes/dtypes only — params are
        runtime arguments (both the jit and AOT paths), so a new
        checkpoint with the same architecture swaps in between batches.
        Restores the trainable subtree against the startup skeleton,
        reuses the shared frozen codec/encoder subtrees, re-applies int8
        quantization (re-running the agreement gate — a reload that fails
        the gate keeps the current weights serving), and re-shards onto
        the serving mesh. The swap is a single attribute assignment read
        once per batch by the worker, so in-flight batches finish on the
        old weights and the next batch uses the new ones.
        """
        import jax
        import jax.numpy as jnp

        from vaura_tpu.train.checkpoint import restore_trainable_params
        from vaura_tpu.utils import cast_floats

        path = str(ckpt_path or self.ckpt_path or "")
        if not path:
            raise ValueError(
                "no checkpoint to reload: pass ckpt_path (the server was "
                "started without one)"
            )
        with self._reload_lock:
            t0 = time.time()
            trainable = restore_trainable_params(
                path, self._trainable_abstract, self._model_cfg,
                self._trainer_cfg,
            )
            params = cast_floats(
                {**self._frozen_bf16, **trainable}, jnp.bfloat16
            )
            gate = None
            if self._quantize:
                from vaura_tpu.ops.quantization import (
                    quantize_sampler_params,
                )

                fp_sampler = params["sampler"]
                params = dict(params)
                params["sampler"] = quantize_sampler_params(
                    jax.device_get(params["sampler"])
                )
                if self._quantize_min_agreement > 0.0:
                    gate = self._int8_agreement_probe(
                        fp_sampler, params["sampler"]
                    )
                    if gate < self._quantize_min_agreement:
                        raise RuntimeError(
                            "reload refused: int8 agreement %.4f < gate "
                            "%.2f at %s — current weights keep serving"
                            % (gate, self._quantize_min_agreement, path)
                        )
            if self._mesh is not None:
                from vaura_tpu.parallel.partitioning import shard_params

                params = shard_params(self._mesh, params)
            self.params = params  # atomic swap; next batch picks it up
            self.ckpt_path = path
            with self._metrics_lock:
                self._metrics["reloads_total"] += 1
            dt = time.time() - t0
            logger.info("reloaded weights from %s (%.2fs)", path, dt)
            info = {"reloaded": True, "ckpt_path": path,
                    "seconds": round(dt, 3)}
            if gate is not None:
                info["int8_agreement"] = round(gate, 4)
            return info

    def start(self):
        self._warmup()
        if self.aot_export:
            from vaura_tpu.utils.aot import export_generate

            meta = export_generate(
                self.system, self.params,
                batch=self.batch, tv=self.tv,
                max_new_tokens=self.tokens,
                sampling=self.sampling,
                decode_buckets=self.decode_buckets,
                dac_chunk_size=self.dac_chunk_size,
                path=self.aot_export,
            )
            logger.info("exported AOT generation graph to %s (%s)",
                        self.aot_export, meta["platforms"])
        self._worker.start()

    def _generate(self, feats, seed: int):
        # One compiled graph for the whole request pipeline. Without it
        # only the decode scans execute compiled (lax.scan is compiled
        # even eagerly); the prefill/embed/DAC-decode ops would dispatch
        # one-by-one — measured 21 s vs 0.9 s per 8-batch on the tunneled
        # v5e. The rng key is built inside the graph from the seed scalar
        # so the jit and AOT paths are bit-identical.
        if self._aot is not None:
            audio, codes = self._aot(
                self.params, feats, np.int32(seed)
            )
            return {"audio": audio, "codes": codes}
        import jax

        from vaura_tpu.utils import cached_jit

        def _run(params, feats, seed):
            return self.system.generate(
                params, None, jax.random.PRNGKey(seed),
                vis_feats=feats,
                max_new_tokens=self.tokens,
                tokens_per_frame=7,
                decode_to_audio=True,
                dac_chunk_size=self.dac_chunk_size,
                decode_buckets=self.decode_buckets,
                **self.sampling,
            )

        gen = cached_jit(self, "_gen_jit", feats.shape, _run)
        return gen(self.params, feats, np.int32(seed))

    def _put_batch(self, feats):
        import jax
        import jax.numpy as jnp

        if self._batch_sharding is not None:
            return jax.device_put(np.asarray(feats), self._batch_sharding)
        return jnp.asarray(feats)

    def _warmup(self):
        for b in self.batch_buckets:
            t0 = time.time()
            feats = self._put_batch(
                np.zeros((b, self.tv, self.cond_dim), np.float32)
            )
            out = self._generate(feats, 0)
            np.asarray(out["audio"])
            logger.info(
                "compiled generation graph: batch=%d tv=%d duration=%.2fs "
                "(%.1fs)", b, self.tv, self.duration, time.time() - t0,
            )

    def video_to_features(self, video_bytes: bytes) -> np.ndarray:
        """mp4 bytes -> [Tv, cond_dim] features via the visual encoder."""
        assert self.system.encoder is not None, "no visual encoder configured"
        import tempfile

        import jax.numpy as jnp

        from vaura_tpu.data import media

        with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
            f.write(video_bytes)
            f.flush()
            frames, _, _ = media.read_video(
                f.name, fps=25.0, duration=self.duration + 0.01,
                want_audio=False,
            )
        fps = 16  # frames per segment (divided_224_16x4 contract)
        if frames.shape[0] < fps:
            raise ValueError(
                f"video too short: {frames.shape[0]} frames at 25 fps < "
                f"one {fps}-frame segment (need >= 0.64 s)"
            )
        n_seg = max(1, frames.shape[0] // fps)
        # read_video already truncates at `duration`, but clamp explicitly:
        # segments beyond the server window would compile a never-again-used
        # encoder graph (minutes cold over the tunnel) only for submit() to
        # reject the features afterwards
        n_seg = min(n_seg, max(1, int((self.duration + 1e-6) / 0.64)))
        frames = frames[: n_seg * fps]
        # [-1, 1] normalization (mean/std 0.5) — the training/eval/demo
        # transform contract (configs' video_transforms Normalize);
        # [0, 1] inputs would condition the encoder off-distribution
        x = (frames.astype(np.float32) / 255.0 - 0.5) / 0.5
        x = np.transpose(x, (3, 0, 1, 2)).reshape(
            3, n_seg, fps, *frames.shape[1:3]
        ).transpose(1, 0, 2, 3, 4)[None]  # [1, S, C, T, H, W]
        from vaura_tpu.utils import cached_jit

        fn = cached_jit(
            self, "_vis_jit", x.shape,
            lambda p, f: self.system.visual_features(p, f),
        )
        feats = fn(self.params, jnp.asarray(x))
        return np.asarray(feats)[0]

    def submit(self, feats: np.ndarray, want: str = "audio"):
        """Enqueue one request; blocks until its result is ready.

        ``feats`` must have at most ``self.tv`` rows — shorter requests
        are zero-padded to the fixed conditioning length (matching the
        empty-video padding semantics of ``_repeat_and_pad_video``,
        reference llama.py:555-586); longer ones are rejected rather than
        silently truncated or recompiled at a new shape.
        """
        if feats.shape[0] > self.tv:
            raise ValueError(
                f"features too long: {feats.shape[0]} rows > tv={self.tv} "
                f"(duration {self.duration:.2f}s); re-encode a shorter clip "
                "or start the server with a larger duration"
            )
        done = threading.Event()
        slot: dict = {"feats": feats, "want": want, "done": done}
        self._enqueue(slot)
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def _enqueue(self, slot: dict) -> None:
        with self._metrics_lock:
            if self._draining:
                raise DrainingError(
                    "server is draining (shutdown in progress)"
                )
            self._inflight += 1
            key = (
                "stream_requests_total" if slot.get("stream")
                else "requests_total"
            )
            self._metrics[key] += 1
        self._q.put(slot)

    def _finish(self, slots, error: Optional[str] = None) -> None:
        with self._metrics_lock:
            self._inflight -= len(slots)
            if error is not None:
                self._metrics["errors_total"] += len(slots)
        for s in slots:
            if error is not None:
                s["error"] = error
            s["done"].set()

    def begin_drain(self) -> None:
        """Stop accepting work; queued/in-flight requests still finish."""
        with self._metrics_lock:
            if self._draining:
                return
            self._draining = True
        logger.info("draining: no new requests accepted")

    def drain(self, timeout: float = 120.0) -> bool:
        """Block until every accepted request has been answered (or
        ``timeout``). Returns True when fully drained."""
        self.begin_drain()
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._metrics_lock:
                if self._inflight == 0:
                    return True
            time.sleep(0.05)
        with self._metrics_lock:
            left = self._inflight
        logger.warning("drain timeout: %d requests still in flight", left)
        return False

    def metrics_text(self) -> str:
        """Prometheus exposition-format counters."""
        with self._metrics_lock:
            m = dict(self._metrics)
            buckets = dict(self._bucket_counts)
            inflight = self._inflight
            draining = int(self._draining)
        batches = max(1, m["batches_total"])
        capacity = max(1, m["batch_capacity_total"])
        lines = [
            "# TYPE vaura_requests_total counter",
            f"vaura_requests_total {m['requests_total']}",
            f"vaura_stream_requests_total {m['stream_requests_total']}",
            f"vaura_batches_total {m['batches_total']}",
            f"vaura_errors_total {m['errors_total']}",
            f"vaura_reloads_total {m['reloads_total']}",
        ] + [
            'vaura_bucket_batches_total{bucket="%d"} %d' % (b, n)
            for b, n in buckets.items()
        ] + [
            "# TYPE vaura_batch_fill_ratio gauge",
            "vaura_batch_fill_ratio "
            f"{m['batch_slots_total'] / capacity:.4f}",
            f"vaura_batch_seconds_avg {m['batch_seconds_sum'] / batches:.4f}",
            f"vaura_inflight {inflight}",
            f"vaura_draining {draining}",
            f"vaura_compiled_batch {self.batch}",
        ]
        return "\n".join(lines) + "\n"

    def submit_stream(self, feats_segments: np.ndarray, writer) -> None:
        """Enqueue one streaming long-generation request; ``writer`` is
        called from the worker thread with a float32 waveform increment
        ``[n_samples]`` per chunk, as soon as that chunk is decoded.
        Blocks until the stream completes. ``feats_segments``:
        ``[S_total, t, cond_dim]`` per-segment visual features."""
        want = (self.stream_segments, self.stream_t, self.cond_dim)
        if tuple(feats_segments.shape) != want:
            raise ValueError(
                f"stream features must be {list(want)} (server "
                f"stream_duration geometry x features/segment); got "
                f"{list(feats_segments.shape)}"
            )
        done = threading.Event()
        slot: dict = {
            "stream": True, "feats": feats_segments, "writer": writer,
            "done": done,
        }
        self._enqueue(slot)
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])

    def _run_stream(self, slot: dict) -> None:
        """Run one streaming request exclusively (B=1): chunks of
        ``generate_long_stream`` are written out as they decode, so the
        client hears audio at one-chunk latency while later chunks are
        still generating."""
        import jax
        import jax.numpy as jnp

        try:
            seed = self._next_seed
            self._next_seed += 1
            t0 = time.time()
            n = 0
            feats = jnp.asarray(slot["feats"])[None]
            if self._batch_sharding is not None:
                # B=1 streams can't split on the data axis: replicate
                feats = jax.device_put(feats, self._replicated)
            if self.stream_mode == "kv":
                gen = self.system.generate_long_kv_stream(
                    self.params, None, jax.random.PRNGKey(seed),
                    total_tokens=self.stream_tokens,
                    vis_feats_segments=feats,
                    window_chunks=self.stream_window_chunks,
                    chunk_steps=self.stream_chunk_steps,
                    **self.sampling,
                )
            else:
                gen = self.system.generate_long_stream(
                    self.params, None, jax.random.PRNGKey(seed),
                    total_tokens=self.stream_tokens,
                    stride_tokens=self.stream_stride_tokens,
                    model_max_tokens=self.stream_max_tokens,
                    vis_feats_segments=feats,
                    **self.sampling,
                )
            for chunk in gen:
                audio = np.asarray(chunk["audio"], np.float32)[0]
                if audio.size:
                    slot["writer"](audio)
                n += 1
            logger.info(
                "stream done: %d chunks, %d tokens, %.2fs",
                n, self.stream_tokens, time.time() - t0,
            )
            self._finish([slot])
        except Exception as e:
            logger.exception("stream failed")
            self._finish([slot], error=str(e))

    def close(self, timeout: float = 10.0) -> bool:
        """Drain, stop the worker thread, and release the service.

        Idempotent; used by tests and the server's signal path so a
        retired service does not leave its micro-batch worker (which
        holds ``self`` — params plus compiled graphs) alive forever.
        """
        drained = self.drain(timeout=timeout)
        self._q.put(None)  # wake + stop the worker
        if self._worker.is_alive():
            self._worker.join(timeout=timeout)
        return drained

    def _dispatch(self, slots):
        """Pad ``slots`` to the smallest compiled bucket and launch the
        generation graph WITHOUT blocking on the result (jax dispatch is
        async) — returns the in-flight batch record for ``_fetch``."""
        bucket = next(b for b in self.batch_buckets if b >= len(slots))
        feats = np.zeros((bucket, self.tv, self.cond_dim), np.float32)
        for i, s in enumerate(slots):
            feats[i, : s["feats"].shape[0]] = s["feats"]
        seed = self._next_seed
        self._next_seed += 1
        t0 = time.time()
        try:
            out = self._generate(self._put_batch(feats), seed)
        except Exception as e:  # tracing/shape errors surface eagerly
            logger.exception("batch dispatch failed")
            self._finish(slots, error=str(e))
            return None
        return {"slots": slots, "bucket": bucket, "out": out, "t0": t0}

    def _fetch(self, p) -> None:
        """Block on an in-flight batch's device results and reply to its
        requests; device-side failures surface here (async dispatch)."""
        slots = p["slots"]
        try:
            audio = np.asarray(p["out"]["audio"], np.float32)
            codes = np.asarray(p["out"]["codes"])
            dt = time.time() - p["t0"]
            self._batch_ema_s = (
                dt if self._batch_ema_s == 0.0
                else 0.7 * self._batch_ema_s + 0.3 * dt
            )
            for i, s in enumerate(slots):
                s["result"] = codes[i] if s["want"] == "codes" else audio[i]
            with self._metrics_lock:
                self._metrics["batches_total"] += 1
                self._metrics["batch_slots_total"] += len(slots)
                self._metrics["batch_capacity_total"] += p["bucket"]
                self._bucket_counts[p["bucket"]] += 1
                self._metrics["batch_seconds_sum"] += dt
            self._finish(slots)
            logger.info(
                "batch n=%d/%d total=%.3fs", len(slots), p["bucket"], dt
            )
        except Exception as e:  # pragma: no cover - defensive
            logger.exception("batch failed")
            self._finish(slots, error=str(e))

    def _loop(self):
        """Micro-batch worker, double-buffered: while the device runs
        batch N, the worker keeps collecting batch N+1 (so under burst
        load every batch fills to capacity during the previous batch's
        compute window instead of only during ``max_wait_ms``) and
        dispatches it BEFORE blocking on batch N's results — the device
        goes back-to-back while the host overlaps batch N's result
        transfer (~14 MB/batch over the PJRT tunnel) and replies with
        batch N+1's compute. Collection while the device is busy is
        bounded by the EMA of recent batch times, so a batch is never
        held longer than the compute it is hiding behind.

        Streaming requests and the close() sentinel still serialize:
        they run only once every dispatched batch has been fetched."""
        pending = None  # in-flight batch (dispatched, results not fetched)
        special = None  # intercepted stream slot, or "close"
        while True:
            slots: list = []
            if special is None:
                if pending is None:
                    s = self._q.get()  # idle: block until work arrives
                    if s is None:
                        return
                    if s.get("stream"):
                        self._run_stream(s)
                        continue
                    slots.append(s)
                    deadline = time.time() + self.max_wait_s
                else:
                    # device busy: collect until it is expected to finish
                    est = pending["t0"] + max(self._batch_ema_s - 0.05, 0.0)
                    deadline = max(est, time.time() + self.max_wait_s)
                while len(slots) < self.batch:
                    timeout = deadline - time.time()
                    if timeout <= 0:
                        break
                    try:
                        s = self._q.get(timeout=timeout)
                    except queue.Empty:
                        break
                    if s is None:
                        special = "close"
                        break
                    if s.get("stream"):
                        special = s  # run once the device drains
                        break
                    slots.append(s)
            new = self._dispatch(slots) if slots else None
            if pending is not None:
                self._fetch(pending)
            pending = new
            if special is not None and pending is None:
                if special == "close":
                    return
                self._run_stream(special)
                special = None


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.client_address[0], *args)

        def _reply(self, code, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/metrics"):
                self._reply(
                    200, service.metrics_text().encode(),
                    "text/plain; version=0.0.4",
                )
                return
            if self.path.startswith("/healthz"):
                info = {
                    "status": "draining" if service._draining else "ok",
                    "batch": service.batch,
                    "batch_buckets": service.batch_buckets,
                    "duration_s": service.duration,
                    "max_feature_rows": service.tv,
                    "sample_rate": service.sample_rate,
                    "cond_dim": service.cond_dim,
                    "ckpt_path": service.ckpt_path,
                }
                self._reply(200, json.dumps(info).encode())
            else:
                self._reply(404, b'{"error": "not found"}')

        def do_POST(self):
            if self.path.startswith("/generate_long"):
                self._do_stream()
                return
            if self.path.startswith("/reload"):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    info = service.reload(req.get("ckpt_path"))
                    self._reply(200, json.dumps(info).encode())
                except Exception as e:
                    self._reply(400, json.dumps({"error": str(e)}).encode())
                return
            if not self.path.startswith("/generate"):
                self._reply(404, b'{"error": "not found"}')
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype == "application/octet-stream":
                    # binary fast path: .npy bytes of a [Tv, cond_dim]
                    # float array. A 32x768 request is ~100 KB and parses
                    # in microseconds, vs ~600 KB JSON whose parse cost
                    # serializes on the host and under-fills batches at
                    # high concurrency.
                    feats = np.load(io.BytesIO(body), allow_pickle=False)
                    feats = np.asarray(feats, np.float32)
                    assert feats.ndim == 2 and feats.shape[1] == service.cond_dim, (
                        f"features must be [Tv, {service.cond_dim}]"
                    )
                else:
                    req = json.loads(body or b"{}")
                    if "features" in req:
                        feats = np.asarray(req["features"], np.float32)
                        assert feats.ndim == 2 and feats.shape[1] == service.cond_dim, (
                            f"features must be [Tv, {service.cond_dim}]"
                        )
                    elif "video_b64" in req:
                        feats = service.video_to_features(
                            base64.b64decode(req["video_b64"])
                        )
                    else:
                        raise ValueError(
                            "body needs 'features' or 'video_b64' (JSON), "
                            "or .npy bytes as application/octet-stream"
                        )
                want = "codes" if "raw=codes" in self.path else "audio"
                result = service.submit(feats, want)
                if want == "codes":
                    self._reply(
                        200, json.dumps({"codes": result.tolist()}).encode()
                    )
                else:
                    from vaura_tpu.ops.audio import write_wav

                    buf = io.BytesIO()
                    write_wav(buf, result.reshape(1, -1), service.sample_rate)
                    self._reply(200, buf.getvalue(), "audio/wav")
            except DrainingError as e:
                self._reply(503, json.dumps({"error": str(e)}).encode())
            except Exception as e:
                self._reply(400, json.dumps({"error": str(e)}).encode())

        def _do_stream(self):
            """POST /generate_long — long-horizon generation streamed as a
            live WAV (unknown-length RIFF header + PCM increments, close-
            delimited): the client hears the first chunk while later
            chunks are still decoding. Body: .npy bytes (octet-stream) or
            JSON {"features_segments": ...} of [S_total, t, cond_dim]
            per-segment visual features."""
            from vaura_tpu.ops.audio import pcm16, wav_stream_header

            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype == "application/octet-stream":
                    feats = np.load(io.BytesIO(body), allow_pickle=False)
                else:
                    feats = np.asarray(
                        json.loads(body or b"{}")["features_segments"]
                    )
                feats = np.asarray(feats, np.float32)
                assert feats.ndim == 3, "features_segments must be 3-D"
            except Exception as e:
                self._reply(400, json.dumps({"error": str(e)}).encode())
                return
            headers_sent = False

            def write_increment(audio: np.ndarray):
                nonlocal headers_sent
                if not headers_sent:
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Connection", "close")
                    self.end_headers()
                    self.wfile.write(
                        wav_stream_header(service.sample_rate)
                    )
                    headers_sent = True
                self.wfile.write(pcm16(audio))
                self.wfile.flush()

            try:
                service.submit_stream(feats, write_increment)
                if not headers_sent:  # zero-length stream edge case
                    write_increment(np.zeros((0,), np.float32))
                self.close_connection = True
            except DrainingError as e:
                self._reply(503, json.dumps({"error": str(e)}).encode())
            except Exception as e:
                if headers_sent:
                    # mid-stream failure: the status line is gone; all we
                    # can do is cut the close-delimited stream short
                    logger.error("stream aborted mid-response: %s", e)
                    self.close_connection = True
                else:
                    self._reply(400, json.dumps({"error": str(e)}).encode())

    return Handler


def main() -> None:
    import sys

    logging.basicConfig(level=logging.INFO)
    from vaura_tpu.config import assemble_config

    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    cfg = assemble_config(
        sys.argv[1:],
        defaults_path=repo / "configs" / "vaura_defaults.yaml",
        base_dir=repo,
    )
    run_server(cfg)


def run_server(cfg: dict) -> None:
    """Start the micro-batching HTTP server from an assembled config
    (also dispatched as ``python main.py ... action=serve``)."""
    # WARNING at startup, INFO inside actions (reference main.py:91)
    logging.getLogger().setLevel(logging.INFO)
    service = GenerationService(cfg)
    service.start()
    port = int(cfg.get("port", 8800))
    # listen backlog must exceed the target concurrency: the http.server
    # default (5) RSTs connects beyond it under burst load (measured: 65
    # of 256 requests reset at concurrency 64)
    ThreadingHTTPServer.request_queue_size = int(
        cfg.get("listen_backlog", 256)
    )
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))

    # graceful shutdown: SIGTERM/SIGINT -> stop accepting work (new
    # requests get 503), answer everything already accepted, then exit 0
    import signal

    def _shutdown(signum, frame):
        logger.info("signal %d: draining", signum)
        service.begin_drain()
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)

    logger.info("serving on http://127.0.0.1:%d (batch=%d)", port, service.batch)
    server.serve_forever()
    drained = service.close(timeout=float(cfg.get("drain_timeout_s", 120)))
    logger.info("shutdown complete (drained=%s)", drained)


if __name__ == "__main__":
    main()
