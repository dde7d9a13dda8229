"""The composite V-AURA system: codec + visual encoder + bridge + AR sampler
+ codebook pattern, with training loss and CFG generation.

Behavioral equivalent of reference ``models/vaura_model.py`` (VAURAModel),
re-architected for TPU:

  * Pure-functional: parameters live in an explicit pytree with separate
    subtrees for the trainable sampler/bridge and the *frozen* codec and
    (optionally) visual encoder — fixing the reference's checkpoint-bloat
    FIXME (``vaura_model.py:61``) by keeping frozen submodules out of the
    train state.
  * ``train_forward`` is one jittable function: DAC encode (stop-gradient),
    MotionFormer features, pattern build (static index tables), causal
    sampler forward, pattern-reverted masked CE
    (reference ``vaura_model.py:136-295``).
  * ``generate`` replaces the reference's O(S^2)-per-token full-prefix
    recompute loop (``vaura_model.py:502-547``, "no caching is
    implemented") with a single compiled ``lax.scan`` over a real KV cache:
    prompt ingestion and free-running decode are the same step function, so
    one compilation serves every prompt length. CFG runs as a fused
    2B-batch through the decoder (reference ``vaura_model.py:786-794``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaura_tpu.models.dac.model import Dac, DacConfig
from vaura_tpu.models.motionformer import MotionFormer, MotionFormerConfig
from vaura_tpu.models.sampler import (
    Sampler,
    SamplerConfig,
    default_tokens_per_frame,
)
from vaura_tpu.ops.losses import masked_codebook_cross_entropy
from vaura_tpu.ops.patterns import CodebooksPatternProvider, DelayedPatternProvider
from vaura_tpu.ops.sampling import cfg_blend, sample_tokens

UNKNOWN_TOKEN = -1


@dataclasses.dataclass
class VauraSystem:
    """Holds the module set and exposes pure functions over param pytrees.

    Params layout::

        params = {
          "sampler": {...},   # trainable
          "dac":     {...},   # frozen codec
          "encoder": {...},   # visual encoder (frozen or trainable)
        }
    """

    sampler_config: SamplerConfig
    dac_config: DacConfig
    encoder_config: Optional[MotionFormerConfig] = None
    pattern_provider: Optional[CodebooksPatternProvider] = None
    bridge: Optional[Any] = None  # flax module or None (identity)
    use_visual_conditioning: bool = True
    freeze_feature_extractor: bool = False
    flatten_vis_feats: bool = False
    # LoRA finetuning (vaura_tpu.train.lora): rank 0 disables. The
    # reference only carries dead LoRA kwargs (scripts/test.py:63-65).
    lora_rank: int = 0
    lora_targets: Optional[Tuple[str, ...]] = None
    lora_alpha: Optional[float] = None

    def __post_init__(self):
        self.sampler = Sampler(self.sampler_config)
        self.dac = Dac(self.dac_config)
        self.encoder = (
            MotionFormer(self.encoder_config)
            if (self.use_visual_conditioning and self.encoder_config is not None)
            else None
        )
        from vaura_tpu.models.bridges import IdentityBridge

        if self.bridge is not None and isinstance(self.bridge, IdentityBridge):
            self.bridge = None  # identity bridge carries no params; skip
        if self.pattern_provider is None:
            self.pattern_provider = DelayedPatternProvider(
                n_q=self.sampler_config.num_codebooks
            )
        self.pattern_name = type(self.pattern_provider).__name__

    # ------------------------------------------------------------------ #
    def _resolve_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Fold LoRA adapters (if present) into the sampler kernels —
        called at the jitted entry points so adapter gradients flow while
        the base weights stay in the frozen tree."""
        if "lora_sampler" not in params:
            return params
        from vaura_tpu.train.lora import merge_lora

        params = dict(params)
        params["sampler"] = merge_lora(
            params["sampler"], params.pop("lora_sampler"), self.lora_alpha
        )
        return params

    @property
    def num_codebooks(self) -> int:
        return self.sampler_config.num_codebooks

    @property
    def special_token_id(self) -> int:
        """Codebook padding + BOS token (reference ``vaura_model.py:124-127``)."""
        return self.sampler_config.special_token_id

    # ------------------------------------------------------------------ #
    def init_params(
        self,
        rng: jax.Array,
        batch: int = 1,
        audio_len: int = 22016,
        n_segments: int = 4,
        frames_per_segment: Optional[int] = None,
        frame_hw: int = 224,
    ) -> Dict[str, Any]:
        """Initialize all parameter subtrees with tiny tracing shapes."""
        r_dac, r_enc, r_sam = jax.random.split(rng, 3)
        params: Dict[str, Any] = {}
        wav = jnp.zeros((1, 1, self.dac_config.hop_length * 4))
        params["dac"] = self.dac.init(r_dac, wav)["params"]
        if self.encoder is not None:
            if frames_per_segment is None:
                # segment length from the encoder geometry (flagship 8*2=16)
                frames_per_segment = (
                    self.encoder_config.temporal_resolution
                    * self.encoder_config.z_block_size
                )
            frames = jnp.zeros(
                (1, 1, 3, frames_per_segment, frame_hw, frame_hw), jnp.float32
            )
            params["encoder"] = self.encoder.init(r_enc, frames)["params"]
        if self.bridge is not None:
            feats = jnp.zeros((1, 8, self.sampler_config.cond_in_dim))
            params["bridge"] = self.bridge.init(r_enc, feats)["params"]
        Ta = 16
        tokens = jnp.zeros((1, self.num_codebooks, Ta), jnp.int32)
        cond = jnp.zeros((1, 8, self.sampler_config.cond_in_dim))
        params["sampler"] = self.sampler.init(
            {"params": r_sam, "dropout": r_sam, "cfg_dropout": r_sam},
            tokens,
            cond,
            False,
        )["params"]
        if self.lora_rank > 0:
            from vaura_tpu.train.lora import DEFAULT_TARGETS, init_lora

            params["lora_sampler"] = init_lora(
                jax.random.fold_in(r_sam, 1),
                params["sampler"],
                self.lora_rank,
                tuple(self.lora_targets or DEFAULT_TARGETS),
            )
        return params

    def load_dac_embeddings_into_sampler(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Initialize the sampler's factored token embeddings from the DAC
        quantizer (reference ``initialize_embeddings``,
        ``llama.py:387-412``): copy each codebook table (adding a random
        special row) and the out-projection weights."""
        import flax

        cfg = self.sampler_config
        q = params["dac"]["quantizer"]
        K, V, cd = cfg.num_codebooks, cfg.d_codebook, cfg.codebook_dim
        dac_cfg = self.dac_config
        if (
            dac_cfg.codebook_dim != cd
            or dac_cfg.codebook_size != V
            or dac_cfg.n_codebooks < K
            or dac_cfg.resolved_latent_dim != cfg.token_dim
        ):
            import logging

            logging.getLogger(__name__).warning(
                "sampler embedding geometry (%d x %d -> %d) does not match "
                "the DAC quantizer (%d x %d -> %d); keeping random init",
                V, cd, cfg.token_dim,
                dac_cfg.codebook_size, dac_cfg.codebook_dim,
                dac_cfg.resolved_latent_dim,
            )
            return params
        codebooks = np.asarray(q["codebooks"])[:K]  # [K, V, cd]
        rng = np.random.default_rng(0)
        special_rows = (
            rng.standard_normal((K, 1, cd)).astype(np.float32)
            * cfg.initializer_range
        )
        emb = np.concatenate([codebooks, special_rows], axis=1).reshape(
            K * (V + 1), cd
        )
        out_w = np.asarray(q["out_proj_w"])[:K]  # [K, cd, D]
        out_b = np.asarray(q["out_proj_b"])[:K]  # [K, D]
        sampler = flax.core.unfreeze(params["sampler"])
        tok = dict(sampler["tok_embeddings"])
        tok["emb"] = jnp.asarray(emb)
        # folded DAC out_proj (already weight-norm folded) -> v with unit
        # gain: store v = W^T, g = ||column norm|| so g*v/||v|| == W
        W = np.transpose(out_w, (0, 2, 1))  # [K, D, cd]
        norms = np.linalg.norm(W, axis=-1, keepdims=True) + 1e-12
        tok["proj_v"] = jnp.asarray(W)
        tok["proj_g"] = jnp.asarray(norms)
        tok["proj_b"] = jnp.asarray(out_b)
        sampler["tok_embeddings"] = tok
        params = dict(params)
        params["sampler"] = sampler
        return params

    # ------------------------------------------------------------------ #
    # visual conditioning
    # ------------------------------------------------------------------ #
    def visual_features(
        self,
        params: Dict[str, Any],
        frames: jax.Array,  # [B, S, C, T, H, W]
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
        chunk_size: Optional[int] = None,
    ) -> jax.Array:
        """Run the visual encoder and flatten segments
        (reference ``_handle_visual_conditioning``,
        ``vaura_model.py:194-214``). Returns [B, S*8, 768].

        With no encoder configured, a 3-D ``frames`` tensor is taken as
        already-extracted ``[B, Tv, D]`` features (feature-cached
        datasets / precomputed-feature training).

        ``chunk_size`` runs the encoder over sequential batch slices via
        ``lax.map`` (same pattern as ``decode_audio``): the ViT's frame +
        activation footprint otherwise bounds the generation batch at ~32
        on a v5e while the AR loop's sweet spot is 128. Inference-only
        (dropout rngs don't thread through the map)."""
        if self.encoder is None:
            assert frames is not None and frames.ndim == 3, (
                "no visual encoder configured: pass [B, Tv, D] features"
            )
            feats = frames
        else:
            enc = lambda f: self.encoder.apply(
                {"params": params["encoder"]}, f, train=train,
                rngs=rngs or {},
            )[0]
            B = frames.shape[0]
            if chunk_size and B > chunk_size and not (train or rngs):
                chunk = next(
                    c for c in range(min(chunk_size, B), 0, -1) if B % c == 0
                )
                feats = jax.lax.map(
                    enc, frames.reshape(B // chunk, chunk, *frames.shape[1:])
                )
                feats = feats.reshape(B, *feats.shape[2:])
            else:
                feats = enc(frames)
            B, S, t, D = feats.shape
            feats = feats.reshape(B, S * t, D)
        if self.freeze_feature_extractor:
            feats = jax.lax.stop_gradient(feats)
        if self.bridge is not None:
            feats = self.bridge.apply({"params": params["bridge"]}, feats)
        return feats

    # ------------------------------------------------------------------ #
    # training forward + loss
    # ------------------------------------------------------------------ #
    def train_forward(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],
        audio: jax.Array,  # [B, 1, Ta_samples]
        rng: jax.Array,
        train: bool = True,
        vis_feats: Optional[jax.Array] = None,
        codes: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Teacher-forced loss (reference ``forward`` + ``_compute_loss``,
        ``vaura_model.py:136-295``). Returns ``(loss, aux)`` with
        ``aux = {loss_per_codebook, logits, targets, mask}``.

        Clip-partitioned audio ``[B, n_clips, 1, Ta_clip]`` (the
        non-``flatten_vis_feats`` training mode, reference
        ``_stack_list_repr``/``_shared_step``, ``vaura_model.py:229-287``)
        is folded into the batch axis with the matching per-clip frames.

        ``codes`` (``[B, K, Ta]`` int) bypasses the DAC encode — for
        datasets with precomputed codec tokens and for parity tests.
        """
        params = self._resolve_params(params)
        K = self.num_codebooks
        if codes is None:
            if audio.ndim == 4:
                B0, n_clips = audio.shape[:2]
                audio = audio.reshape(B0 * n_clips, *audio.shape[2:])
                if frames is not None and frames.shape[1] == n_clips:
                    frames = frames.reshape(B0 * n_clips, 1, *frames.shape[2:])
            codes = self.encode_audio(params, audio)  # [B, K, Ta]
        codes = jax.lax.stop_gradient(codes)
        B, _, Ta = codes.shape

        if vis_feats is None:
            r_drop, r_cfg, r_enc = jax.random.split(rng, 3)
            vis_feats = self.visual_features(
                params, frames, train=train and not self.freeze_feature_extractor,
                rngs={"dropout": r_enc},
            )
        else:
            r_drop, r_cfg = jax.random.split(rng, 2)

        pattern = self.pattern_provider.get_pattern(Ta)
        # implicit BOS shift: build over codes[:, :, :-1]
        # (reference vaura_model.py:157-167)
        seq, _, _ = pattern.build_pattern_sequence(
            codes[:, :K, :-1], self.special_token_id
        )
        logits = self.sampler.apply(
            {"params": params["sampler"]},
            seq,
            vis_feats,
            train,
            rngs={"dropout": r_drop, "cfg_dropout": r_cfg},
        )  # [B, K, S, card]
        # align logits to original timesteps (NaN marks invalid slots,
        # reference vaura_model.py:178-191)
        logits_bckt = jnp.transpose(logits, (0, 3, 1, 2))  # [B, card, K, S]
        reverted, _, logits_mask = pattern.revert_pattern_logits(
            logits_bckt, float("nan")
        )
        reverted = jnp.transpose(reverted, (0, 2, 3, 1))  # [B, K, Ta, card]
        mask = jnp.broadcast_to(logits_mask[None], (B, K, Ta))
        targets = codes[:, :K, :]
        loss, loss_per_cb = masked_codebook_cross_entropy(reverted, targets, mask)
        aux = {
            "loss_per_codebook": loss_per_cb,
            "logits": reverted,
            "targets": targets,
            "mask": mask,
        }
        return loss, aux

    # ------------------------------------------------------------------ #
    # codec wrappers
    # ------------------------------------------------------------------ #
    def encode_audio(self, params: Dict[str, Any], audio: jax.Array) -> jax.Array:
        return self.dac.apply(
            {"params": params["dac"]}, audio, method=self.dac.encode
        )

    def decode_audio(
        self,
        params: Dict[str, Any],
        codes: jax.Array,
        chunk_size: Optional[int] = None,
    ) -> jax.Array:
        """Codes -> waveform. ``chunk_size`` decodes the batch in
        sequential slices via ``lax.map``: the DAC decoder's intermediate
        activations (up to ~27 MB/clip at 2.56 s) otherwise bound the
        generation batch — at B=144 the decode temps alone exceed v5e HBM
        while the AR loop still fits. Opt-in: the serialized slices cost
        ~12% at B=128, so only chunk when the full-batch decode OOMs."""
        dec = lambda c: self.dac.apply(
            {"params": params["dac"]}, c, method=self.dac.decode
        )
        B = codes.shape[0]
        if chunk_size and B > chunk_size:
            # largest divisor of B not exceeding the requested chunk
            chunk = next(c for c in range(min(chunk_size, B), 0, -1) if B % c == 0)
            if chunk > 1 or B > 64:
                out = jax.lax.map(
                    dec, codes.reshape(B // chunk, chunk, *codes.shape[1:])
                )
                return out.reshape(B, *out.shape[2:])
        return dec(codes)

    # ------------------------------------------------------------------ #
    # generation
    # ------------------------------------------------------------------ #
    def prepare_generation(self, max_new_tokens: int):
        """Host-side static tables for a generation of ``max_new_tokens``
        timesteps. Returns (pattern, valid_mask [K, S], S)."""
        pattern = self.pattern_provider.get_pattern(max_new_tokens)
        _, mask = pattern._build_seq_tables(max_new_tokens, False)
        return pattern, mask, mask.shape[1]

    def build_generation_step(
        self,
        *,
        S: int,
        valid_mask: np.ndarray,  # [K, S]
        use_sampling: bool = True,
        temp: float = 1.0,
        top_k: int = 256,
        top_p: float = 0.0,
        cfg_scale: float = 1.0,
        chunk_starts: Tuple[int, ...] = (0,),
    ):
        """Returns the scan body for the unified prompt-ingest/decode loop.

        Each step s (1..S-1): embed the token at s-1, advance the KV cache,
        obtain logits for step s, CFG-blend, sample, mask invalid codebook
        slots to the special token, and write into the sequence only where
        it is still UNKNOWN (prompt tokens win) — the same invariants as
        reference ``vaura_model.py:502-547`` but cache-incremental.

        ``chunk_starts`` are the static global offsets of the carried
        cache chunks (bucketed decode); the carry's cache is the aligned
        tuple of chunk dicts.
        """
        sampler = self.sampler
        special = self.special_token_id
        use_cfg = cfg_scale > 1.0
        valid_mask_dev = jnp.asarray(valid_mask)  # [K, S]

        def step(sampler_params, carry, s):
            cache, gen_seq, cond_seq, rng = carry
            B = gen_seq.shape[0]
            K = gen_seq.shape[1]
            prev_tok = jax.lax.dynamic_slice(
                gen_seq, (0, 0, s - 1), (B, K, 1)
            )
            tok_in = jnp.tile(prev_tok, (2, 1, 1)) if use_cfg else prev_tok
            cond_t = jax.lax.dynamic_slice(
                cond_seq, (0, s - 1, 0), (cond_seq.shape[0], 1, cond_seq.shape[2])
            )
            logits, cache = sampler.apply(
                {"params": sampler_params},
                tok_in,
                cond_t,
                cache,
                s - 1,
                None,
                chunk_starts,
                method=sampler.decode_step,
            )  # [(2)B, K, card]
            if use_cfg:
                cond_logits, uncond_logits = logits[:B], logits[B:]
                logits = cfg_blend(cond_logits, uncond_logits, cfg_scale)
            rng, sub = jax.random.split(rng)
            next_tok = sample_tokens(
                sub,
                logits,
                use_sampling=use_sampling,
                temp=temp,
                top_k=top_k,
                top_p=top_p,
            )  # [B, K]
            valid = jax.lax.dynamic_slice(valid_mask_dev, (0, s), (K, 1))[:, 0]
            next_tok = jnp.where(valid[None, :], next_tok, special)
            cur = jax.lax.dynamic_slice(gen_seq, (0, 0, s), (B, K, 1))[:, :, 0]
            write = jnp.where(cur == UNKNOWN_TOKEN, next_tok, cur)
            gen_seq = jax.lax.dynamic_update_slice(
                gen_seq, write[:, :, None], (0, 0, s)
            )
            return (cache, gen_seq, cond_seq, rng), None

        return step

    def generate_tokens(
        self,
        params: Dict[str, Any],
        cond_seq: jax.Array,  # [(2)B, S, cond_dim] per-position conditioning
        gen_seq_init: jax.Array,  # [B, K, S] int32 (UNKNOWN where to generate)
        rng: jax.Array,
        *,
        S: int,
        valid_mask: np.ndarray,
        start_step: int = 1,
        use_sampling: bool = True,
        temp: float = 1.0,
        top_k: int = 256,
        top_p: float = 0.0,
        cfg_scale: float = 1.0,
        cache_dtype=None,
        decode_buckets: int = 1,
        initial_cache: Optional[Dict[str, jax.Array]] = None,
        step_unroll: int = 1,
    ) -> jax.Array:
        """Run the generation scan; returns the completed ``[B, K, S]``
        sequence. ``start_step`` is static; steps scan from there to S.

        ``decode_buckets`` splits the step range into segments and the KV
        cache into *physically separate* per-segment chunk buffers:
        segment j's ``lax.scan`` carries only chunks 0..j, so early steps
        stream only the cache prefix they can actually attend to (the
        dominant HBM term), and growing the cache between segments means
        appending a fresh zero chunk — there is NO whole-buffer pad/copy
        and no old+new transient, so peak cache memory equals the
        unbucketed buffer exactly (this is what previously made bf16
        B=128 and int8 B>=160 fail to compile). In-scan carry aliasing is
        preserved: frozen chunks pass through unchanged and the active
        chunk takes one in-place ``dynamic_update_slice`` per step.
        Attention concatenates per-chunk scores into one softmax (order-
        invariant) — vs a monolithic buffer the only numeric difference
        is f32 summation grouping of the per-chunk prob@value partials.
        (The r1 formulation that sliced a full-size carried buffer per
        step LOSES ~12% — the slice materializes a copy each step; the r3
        formulation resized one monolithic carry between segments — see
        the dead-ends table.)
        """
        cache_batch = cond_seq.shape[0]
        cdtype = cache_dtype or self.sampler_config.dtype

        sampling_kwargs = dict(
            use_sampling=use_sampling, temp=temp, top_k=top_k, top_p=top_p,
            cfg_scale=cfg_scale,
        )
        # segment boundaries over [start_step, S), aligned to multiples of 8
        n_b = max(int(decode_buckets), 1)
        bounds = sorted(
            {min(-(-((i + 1) * S) // n_b // 8) * 8, S) for i in range(n_b)}
        )
        eff = [hi for hi in bounds if hi > start_step]
        # chunk j backs segment j's writes: steps s in [lo_j, hi_j) write
        # positions [lo_j - 1, hi_j - 1), so chunk boundaries sit one
        # below the step bounds; the last chunk extends to S (position
        # S-1, written by step S... the final step writes S-1 = S_max-1)
        chunk_bounds = [0] + [h - 1 for h in eff[:-1]] + [S]

        def make_chunk(a: int, b: int) -> Dict[str, jax.Array]:
            if initial_cache is not None:
                return {k: v[:, :, a:b] for k, v in initial_cache.items()}
            return self.sampler.init_cache(cache_batch, b - a, dtype=cdtype)

        chunks: Tuple[Dict[str, jax.Array], ...] = ()
        rest = (gen_seq_init, cond_seq, rng)
        lo = start_step
        for j, hi in enumerate(eff):
            chunks = chunks + (make_chunk(chunk_bounds[j], chunk_bounds[j + 1]),)
            step = self.build_generation_step(
                S=S, valid_mask=valid_mask,
                chunk_starts=tuple(chunk_bounds[: j + 1]),
                **sampling_kwargs,
            )

            def body(carry, s, _step=step):
                return _step(params["sampler"], carry, s)

            steps = jnp.arange(lo, hi, dtype=jnp.int32)
            carry, _ = jax.lax.scan(
                body, (chunks,) + rest, steps, unroll=step_unroll
            )
            chunks, gen_seq_c, cond_seq_c, rng_c = carry
            rest = (gen_seq_c, cond_seq_c, rng_c)
            lo = hi
        return rest[0]

    def generate_tokens_streaming(
        self,
        params: Dict[str, Any],
        cond_seq: jax.Array,  # [(2)B, S, cond_dim]
        gen_seq_init: jax.Array,  # [B, K, S]
        rng: jax.Array,
        *,
        S: int,
        valid_mask: np.ndarray,
        window_chunks: int = 4,
        chunk_steps: int = 56,
        sink_chunks: int = 0,
        cache_dtype=None,
        use_sampling: bool = True,
        temp: float = 1.0,
        top_k: int = 256,
        top_p: float = 0.0,
        cfg_scale: float = 1.0,
    ) -> jax.Array:
        """Continuous decode over the FULL ``S``-step sequence with a
        fixed-size **rolling** chunked KV cache — the long-horizon fast
        path that replaces per-chunk re-prefill (``generate_long`` /
        reference ``scripts/generate.py:327-370``) with zero recompute:

        * The step range splits into ``chunk_steps``-sized segments; each
          segment's K/V live in their own physically separate chunk
          buffer (the ``generate_tokens`` bucketed-decode machinery).
        * Segment j's scan carries only the ``sink_chunks`` oldest chunks
          plus the trailing ``window_chunks`` chunks — queries attend a
          sliding window of the last ``(window_chunks-1)..window_chunks *
          chunk_steps`` positions (plus optional StreamingLLM-style sink
          anchors). Dropping a chunk is just not carrying it: no copy, no
          mask change (frozen chunks always hold positions below ``pos``).
        * Positions stay GLOBAL. RoPE scores depend only on ``p - m``
          (the rotation is a unitary map applied to both sides), so
          un-rebased absolute positions are *exact*: no de-rotation, no
          int8 cache re-quantization at window slides. The only
          requirement is ``sampler_config.block_size >= S`` for the
          freqs table.
        * Chunk start offsets and step indices enter the per-segment jit
          as traced scalars, so every steady-state segment reuses ONE
          compiled graph (ramp/final segments differ in chunk shapes and
          compile once each).

        Semantics note (why this is not bit-equal to the re-prefill
        path): re-prefill recomputes carried tokens' K/V against the new
        chunk's truncated history; here each position's K/V keep the
        history they were originally computed with (strictly more
        context). With ``window_chunks * chunk_steps >= S`` nothing ever
        drops and the result is token-identical to ``generate`` —
        locked by ``tests/test_stream_kv.py``.
        """
        out = gen_seq_init
        for _, out in self._stream_kv_segments(
            params, cond_seq, gen_seq_init, rng,
            S=S, valid_mask=valid_mask,
            window_chunks=window_chunks, chunk_steps=chunk_steps,
            sink_chunks=sink_chunks, cache_dtype=cache_dtype,
            use_sampling=use_sampling, temp=temp, top_k=top_k, top_p=top_p,
            cfg_scale=cfg_scale,
        ):
            pass
        return out

    def _stream_kv_segments(
        self,
        params: Dict[str, Any],
        cond_seq: jax.Array,
        gen_seq_init: jax.Array,
        rng: jax.Array,
        *,
        S: int,
        valid_mask: np.ndarray,
        window_chunks: int = 4,
        chunk_steps: int = 56,
        sink_chunks: int = 0,
        cache_dtype=None,
        use_sampling: bool = True,
        temp: float = 1.0,
        top_k: int = 256,
        top_p: float = 0.0,
        cfg_scale: float = 1.0,
    ):
        """Generator behind ``generate_tokens_streaming``: yields
        ``(hi, gen_seq)`` after each rolling segment — sequence positions
        ``[0, hi)`` of the yielded ``gen_seq`` are final at yield time
        (steps ``[1, hi)`` have run; position 0 is the BOS row).

        The yielded buffer is DONATED into the next segment's jit call:
        consume it (e.g. revert + decode) before resuming the generator.
        """
        cache_batch = cond_seq.shape[0]
        cdtype = cache_dtype or self.sampler_config.dtype
        C = int(chunk_steps)
        assert C % 8 == 0, "chunk_steps must be 8-aligned (cache layout)"
        assert window_chunks >= 1
        sampling_kwargs = dict(
            use_sampling=use_sampling, temp=temp, top_k=top_k, top_p=top_p,
            cfg_scale=cfg_scale,
        )
        # segment step bounds [1,C), [C,2C), ..., [kC, S); chunk j backs
        # steps [lo_j, hi_j) which write positions [lo_j-1, hi_j-1)
        eff = [h for h in range(C, S, C)] + [S]
        chunk_bounds = [0] + [h - 1 for h in eff[:-1]] + [S]

        def _seg_fn(params, chunks, starts, gen_seq, cond_seq, rng, steps):
            step = self.build_generation_step(
                S=S, valid_mask=valid_mask, chunk_starts=starts,
                **sampling_kwargs,
            )

            def body(carry, s):
                return step(params["sampler"], carry, s)

            carry, _ = jax.lax.scan(
                body, (chunks, gen_seq, cond_seq, rng), steps
            )
            return carry

        from vaura_tpu.utils import cached_jit

        fn = cached_jit(
            self, "_streamkv_jit",
            (S, C, window_chunks, sink_chunks, cache_batch,
             str(cdtype), gen_seq_init.shape, cond_seq.shape,
             tuple(sorted(sampling_kwargs.items()))),
            _seg_fn,
            donate_argnums=(1, 3, 4, 5),
        )

        kept: list = []  # [(chunk_index, buffers)] — sinks + trailing window
        gen_seq, cond, rng_c = gen_seq_init, cond_seq, rng
        lo = 1
        for j, hi in enumerate(eff):
            kept.append((
                j,
                self.sampler.init_cache(
                    cache_batch, chunk_bounds[j + 1] - chunk_bounds[j],
                    dtype=cdtype,
                ),
            ))
            sink = [e for e in kept if e[0] < sink_chunks]
            roll = [e for e in kept if e[0] >= sink_chunks]
            if len(roll) > window_chunks:
                roll = roll[-window_chunks:]
            kept = sink + roll
            chunk_tuple = tuple(c for _, c in kept)
            starts = tuple(
                jnp.int32(chunk_bounds[i]) for i, _ in kept
            )
            steps = jnp.arange(lo, hi, dtype=jnp.int32)
            chunk_tuple, gen_seq, cond, rng_c = fn(
                params, chunk_tuple, starts, gen_seq, cond, rng_c, steps
            )
            kept = [(i, c) for (i, _), c in zip(kept, chunk_tuple)]
            lo = hi
            yield hi, gen_seq

    def build_cond_seq_for_generation(
        self,
        params: Dict[str, Any],
        vis_feats: jax.Array,  # [B, Tv, 768] raw (bridged) visual features
        S: int,
        tokens_per_frame: Optional[int] = None,
        cfg: bool = False,
    ) -> jax.Array:
        """Project visual features and lay them out per sequence position;
        with ``cfg`` the uncond stream is appended on the batch axis."""
        B, Tv, _ = vis_feats.shape
        if tokens_per_frame is None:
            tokens_per_frame = default_tokens_per_frame(
                S, Tv, self.num_codebooks, self.pattern_name
            )
        sp = {"params": params["sampler"]}
        cond_emb = self.sampler.apply(
            sp, vis_feats, False, method=self.sampler.embed_cond
        )
        if cfg:
            uncond_emb = self.sampler.apply(
                sp, B, Tv, method=self.sampler.uncond_cond_emb
            )
            cond_emb = jnp.concatenate([cond_emb, uncond_emb], axis=0)
        return self.sampler.apply(
            sp, cond_emb, S, tokens_per_frame, method=self.sampler.build_cond_seq
        )

    def generate(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],
        rng: jax.Array,
        *,
        audio_prompt_codes: Optional[jax.Array] = None,  # [B, K, T0]
        max_new_tokens: int = 221,
        use_sampling: bool = True,
        temp: float = 1.0,
        top_k: int = 256,
        top_p: float = 0.0,
        cfg_scale: float = 1.0,
        tokens_per_frame: Optional[int] = None,
        remove_prompts: bool = False,
        vis_feats: Optional[jax.Array] = None,
        decode_to_audio: bool = True,
        dac_chunk_size: Optional[int] = None,
        encoder_chunk_size: Optional[int] = None,
        decode_buckets: int = 8,
        check: bool = False,
    ) -> Dict[str, jax.Array]:
        """Full generation pipeline (reference ``VAURAModel.generate``,
        ``vaura_model.py:410-597``). Returns dict with ``codes`` and
        (optionally) ``audio``."""
        params = self._resolve_params(params)
        K = self.num_codebooks
        pattern, valid_mask, S = self.prepare_generation(max_new_tokens)

        if vis_feats is None and self.encoder is not None and frames is not None:
            vis_feats = self.visual_features(
                params, frames, train=False, chunk_size=encoder_chunk_size
            )
        B = (
            vis_feats.shape[0]
            if vis_feats is not None
            else (audio_prompt_codes.shape[0] if audio_prompt_codes is not None else 1)
        )

        # prompt handling: fill gen_codes with UNKNOWN, copy prompt, build
        # the interleaved sequence (UNKNOWN survives interleaving; special
        # fills the structural slots)
        gen_codes = jnp.full((B, K, max_new_tokens), UNKNOWN_TOKEN, jnp.int32)
        start_offset = 0
        if audio_prompt_codes is not None:
            start_offset = int(audio_prompt_codes.shape[-1])
            assert start_offset < max_new_tokens
            gen_codes = jax.lax.dynamic_update_slice(
                gen_codes, audio_prompt_codes.astype(jnp.int32), (0, 0, 0)
            )
        gen_seq, _, _ = pattern.build_pattern_sequence(
            gen_codes, self.special_token_id
        )
        use_cfg = cfg_scale > 1.0
        cond_seq = self.build_cond_seq_for_generation(
            params, vis_feats, S, tokens_per_frame, cfg=use_cfg
        )

        # Prompt ingestion. Short/no prompt: the decode scan starts at step
        # 1 and prompt steps flow through the same compiled step (their
        # sampled tokens are discarded by the write-guard). Long prompts
        # (chunked generation carries ~3/4 of a chunk): one batched
        # `prefill` forward writes all K/V in parallel and the scan starts
        # at the first step containing the `start_offset` timestep —
        # positions >= that hold garbage K/V from the padded prefill, but
        # decode attends strictly below its own position, which the scan has
        # rewritten by then.
        start_step = 1
        initial_cache = None
        if start_offset > 0:
            first_gen_step = pattern.get_first_step_with_timesteps(start_offset)
            if first_gen_step is not None and first_gen_step > 16:
                tok_in = jnp.tile(gen_seq, (2, 1, 1)) if use_cfg else gen_seq
                # clamp UNKNOWN placeholders so the embedding gather reads a
                # real row (those positions' K/V are never attended)
                tok_in = jnp.maximum(tok_in, 0)
                _, initial_cache = self.sampler.apply(
                    {"params": params["sampler"]},
                    tok_in,
                    cond_seq,
                    method=self.sampler.prefill,
                )
                start_step = first_gen_step

        gen_seq = self.generate_tokens(
            params,
            cond_seq,
            gen_seq,
            rng,
            S=S,
            valid_mask=valid_mask,
            start_step=start_step,
            initial_cache=initial_cache,
            use_sampling=use_sampling,
            temp=temp,
            top_k=top_k,
            top_p=top_p,
            cfg_scale=cfg_scale,
            decode_buckets=decode_buckets,
        )

        if check:
            # post-hoc coherence checks (reference vaura_model.py:508-515,
            # 549-572): sequence fully materialized and mask-consistent
            seq_np = np.asarray(gen_seq)
            mask_np = np.asarray(valid_mask)[None]
            assert not (seq_np == UNKNOWN_TOKEN).any(), "unfilled positions"
            assert (
                seq_np == np.where(mask_np, seq_np, self.special_token_id)
            ).all(), "sequence/mask mismatch"

        out_codes, _, _ = pattern.revert_pattern_sequence(gen_seq, UNKNOWN_TOKEN)
        out_codes = out_codes[..., :max_new_tokens]
        if check:
            c = np.asarray(out_codes)
            assert (c >= 0).all() and (c <= self.special_token_id).all()
        if remove_prompts:
            out_codes = out_codes[..., start_offset:]
        result: Dict[str, jax.Array] = {"codes": out_codes}
        if decode_to_audio:
            result["audio"] = self.decode_audio(
                params, out_codes, chunk_size=dac_chunk_size
            )
        return result

    def generate_long(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],  # [B, S_total, C, T, H, W]
        rng: jax.Array,
        *,
        total_tokens: int,
        stride_tokens: int,
        model_max_tokens: int = 221,
        vfps: float = 25.0,
        frames_per_segment: int = 16,
        tokens_per_frame: int = 7,
        vis_feats_segments: Optional[jax.Array] = None,  # [B, S_total, t, D]
        decode_to_audio: bool = True,
        dac_chunk_size: Optional[int] = None,
        encoder_chunk_size: Optional[int] = None,
        decode_buckets: int = 2,
        **sampling,
    ) -> Dict[str, jax.Array]:
        """Chunked long-duration generation with prompt carry-over
        (reference ``scripts/generate.py:327-370``): generate a
        <= ``model_max_tokens`` chunk, keep its last ``chunk - stride``
        tokens as the next prompt, slide the video-segment window (modulo
        wrap) by the stride, repeat.

        TPU-first difference: the visual encoder runs ONCE over all
        segments; chunks re-index the cached per-segment features instead
        of re-running the ViT on overlapping windows.

        ``decode_buckets`` defaults to 2 here (not ``generate``'s 8):
        each chunk jits prefill + n segment scans as ONE XLA program and
        the prompt-carry chunks skip every segment below the prompt
        length anyway (prefill dominates), so high n is noise (measured
        at B=128/10.24 s: n=1 34.6, n=2 35.4, n=4 35.7 au-s/s — n=4
        compiles fine under the r4 chunked-cache formulation; the old
        pre-chunked-cache program failed remote compile at n>=4).
        """
        from vaura_tpu.utils import cached_jit

        params = self._resolve_params(params)
        vis_feats_segments = self._long_encode_segments(
            params, frames, vis_feats_segments
        )
        all_tokens = list(
            self._long_chunk_tokens(
                params, rng, vis_feats_segments,
                total_tokens=total_tokens,
                stride_tokens=stride_tokens,
                model_max_tokens=model_max_tokens,
                vfps=vfps,
                frames_per_segment=frames_per_segment,
                tokens_per_frame=tokens_per_frame,
                decode_buckets=decode_buckets,
                sampling=sampling,
            )
        )

        codes = jnp.concatenate(all_tokens, axis=-1)[..., :total_tokens]
        result: Dict[str, jax.Array] = {"codes": codes}
        if decode_to_audio:
            dac_fn = cached_jit(
                self, "_long_dac_jit", (codes.shape, dac_chunk_size),
                lambda p, c, _cs=dac_chunk_size: self.decode_audio(
                    p, c, chunk_size=_cs
                ),
            )
            result["audio"] = dac_fn(params, codes)
        return result

    def _long_encode_segments(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],
        vis_feats_segments: Optional[jax.Array],
        chunk_size: Optional[int] = None,
    ) -> jax.Array:
        """Run the visual encoder ONCE over all long-horizon segments
        (chunks re-index the cached features; see ``generate_long``).
        ``chunk_size`` slices the batch through ``lax.map`` like
        ``visual_features`` — long-horizon frames are S_total segments
        deep, so the activation bound bites at even smaller batches."""
        from vaura_tpu.utils import cached_jit

        if vis_feats_segments is not None:
            return vis_feats_segments
        assert self.encoder is not None and frames is not None

        def _enc(p, f):
            return self.encoder.apply(
                {"params": p["encoder"]}, f, train=False
            )[0]

        def _enc_chunked(p, f):
            B = f.shape[0]
            if chunk_size and B > chunk_size:
                chunk = next(
                    c for c in range(min(chunk_size, B), 0, -1) if B % c == 0
                )
                out = jax.lax.map(
                    lambda fc: _enc(p, fc),
                    f.reshape(B // chunk, chunk, *f.shape[1:]),
                )
                return out.reshape(B, *out.shape[2:])
            return _enc(p, f)

        # jitted + cached: the un-jitted ViT pass over all segments
        # dispatches op-by-op on a remote device (CLAUDE.md rule)
        enc_fn = cached_jit(
            self, "_long_enc_jit", (frames.shape, chunk_size), _enc_chunked
        )
        return enc_fn(params, frames)  # [B, S_total, t, D]

    @staticmethod
    def long_chunk_schedule(
        total_tokens: int, stride_tokens: int, model_max_tokens: int
    ) -> list:
        """NEW tokens produced by each long-horizon chunk — the pure
        arithmetic of ``_long_chunk_tokens``'s sliding window, computable
        before any model work (used by the streaming path to know the
        last chunk WITHOUT generating one chunk ahead, and by clients to
        predict increment sizes). Invariant: ``sum == total_tokens``."""
        sizes = []
        prompt_len = current = 0
        while current + prompt_len < total_tokens:
            n = min(total_tokens - current, model_max_tokens)
            sizes.append(n - prompt_len)
            prompt_len = max(0, n - stride_tokens)
            current += stride_tokens
        assert sum(sizes) == total_tokens
        return sizes

    def _long_chunk_tokens(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        vis_feats_segments: jax.Array,
        *,
        total_tokens: int,
        stride_tokens: int,
        model_max_tokens: int,
        vfps: float,
        frames_per_segment: int,
        tokens_per_frame: int,
        decode_buckets: int,
        sampling: Dict[str, Any],
    ):
        """Generator over the chunked long-horizon decode: yields the NEW
        tokens of each chunk (``[B, K, n_new]`` — the carried prompt
        prefix already stripped). ``generate_long`` consumes it whole;
        ``generate_long_stream`` yields per-chunk results to the caller
        as they are generated (reference ``scripts/generate.py:327-370``
        runs the same sliding window, but offline/batch only).

        The sliding-window arithmetic lives in ONE place,
        :meth:`long_chunk_schedule`; this loop consumes its sizes (so the
        streaming path's last-chunk flush can never desync from the
        actual chunk count)."""
        import math as _math

        frame_rate = 86  # codec tokens/s (reference generate.py:30)
        B, S_total, t_seg, D = vis_feats_segments.shape

        sizes = self.long_chunk_schedule(
            total_tokens, stride_tokens, model_max_tokens
        )
        prompt: Optional[jax.Array] = None
        for i, n_new in enumerate(sizes):
            current = i * stride_tokens
            time_offset = current / frame_rate
            chunk_duration_tokens = n_new + (
                0 if prompt is None else prompt.shape[-1]
            )
            chunk_duration = chunk_duration_tokens / frame_rate
            initial_position = _math.ceil(time_offset * vfps)
            video_target_length = _math.ceil(chunk_duration * vfps)
            seg_lo = initial_position // frames_per_segment
            seg_hi = (initial_position + video_target_length) // frames_per_segment
            positions = np.arange(seg_lo, max(seg_hi, seg_lo + 1)) % S_total
            sel = vis_feats_segments[:, positions].reshape(
                B, len(positions) * t_seg, D
            )
            rng, chunk_rng = jax.random.split(rng)
            # chunk calls re-trace the full decode scan unless jitted and
            # cached: steady-state chunks share shapes, so the whole loop
            # compiles exactly two graphs (first chunk, carry chunk) and
            # later calls/batches hit this cache (keyed per shape tuple)
            chunk_sampling = dict(sampling)
            chunk_sampling["decode_buckets"] = decode_buckets
            check = bool(chunk_sampling.pop("check", False))
            key = (
                sel.shape,
                None if prompt is None else prompt.shape,
                chunk_duration_tokens,
                tokens_per_frame,
                tuple(sorted(chunk_sampling.items())),
            )
            has_prompt = prompt is not None

            def _chunk(params, sel, prompt, rng,
                       _n=chunk_duration_tokens, _hp=has_prompt,
                       _sampling=chunk_sampling):
                return self.generate(
                    params, None, rng,
                    vis_feats=sel,
                    audio_prompt_codes=prompt if _hp else None,
                    max_new_tokens=_n,
                    tokens_per_frame=tokens_per_frame,
                    decode_to_audio=False,
                    **_sampling,
                )["codes"]

            from vaura_tpu.utils import cached_jit

            gen_tokens = cached_jit(self, "_chunk_jit_cache", key, _chunk)(
                params, sel, prompt, chunk_rng
            )
            if check:
                c = np.asarray(gen_tokens)
                assert (c >= 0).all() and (c <= self.special_token_id).all()
                if prompt is not None:
                    np.testing.assert_array_equal(
                        c[..., : prompt.shape[-1]], np.asarray(prompt)
                    )
            new = (
                gen_tokens if prompt is None
                else gen_tokens[:, :, prompt.shape[-1] :]
            )
            assert new.shape[-1] == n_new  # schedule <-> generate contract
            yield new
            prompt = gen_tokens[:, :, stride_tokens:]

    def _longkv_setup(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],
        vis_feats_segments: Optional[jax.Array],
        *,
        total_tokens: int,
        tokens_per_frame: int,
        encoder_chunk_size: Optional[int],
        cfg_scale: float,
    ):
        """Shared prep for the rolling-KV long paths (``generate_long_kv``
        / ``generate_long_kv_stream``): resolve params, run the visual
        encoder once over all segments, lay the conditioning out over the
        whole horizon (segments wrap modulo the video length), and build
        the pattern-interleaved UNKNOWN sequence to fill."""
        params = self._resolve_params(params)
        K = self.num_codebooks
        pattern, valid_mask, S = self.prepare_generation(total_tokens)
        if self.sampler_config.block_size < S:
            raise ValueError(
                f"generate_long_kv: horizon needs {S} RoPE positions but "
                f"sampler block_size is {self.sampler_config.block_size} "
                "— raise SamplerConfig.block_size_audio"
            )
        vis_feats_segments = self._long_encode_segments(
            params, frames, vis_feats_segments, chunk_size=encoder_chunk_size
        )
        B, S_total, t_seg, D = vis_feats_segments.shape
        n_feat = -(-S // tokens_per_frame)
        n_seg = -(-n_feat // t_seg)
        seg_idx = np.arange(n_seg) % S_total  # video wraps when audio outlasts it
        use_cfg = cfg_scale > 1.0

        from vaura_tpu.utils import cached_jit

        def _prep(params, vis_segs):
            vis_all = vis_segs[:, seg_idx].reshape(B, n_seg * t_seg, D)
            cond_seq = self.build_cond_seq_for_generation(
                params, vis_all, S, tokens_per_frame, cfg=use_cfg
            )
            gen_codes = jnp.full((B, K, total_tokens), UNKNOWN_TOKEN, jnp.int32)
            gen_seq, _, _ = pattern.build_pattern_sequence(
                gen_codes, self.special_token_id
            )
            return cond_seq, gen_seq

        cond_seq, gen_seq = cached_jit(
            self, "_longkv_prep_jit",
            (vis_feats_segments.shape, S, tokens_per_frame, use_cfg),
            _prep,
        )(params, vis_feats_segments)
        return params, pattern, valid_mask, S, cond_seq, gen_seq

    def generate_long_kv(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],  # [B, S_total, C, T, H, W]
        rng: jax.Array,
        *,
        total_tokens: int,
        vfps: float = 25.0,
        frames_per_segment: int = 16,
        tokens_per_frame: int = 7,
        vis_feats_segments: Optional[jax.Array] = None,  # [B, S_total, t, D]
        window_chunks: int = 4,
        chunk_steps: int = 56,
        sink_chunks: int = 0,
        decode_to_audio: bool = True,
        dac_chunk_size: Optional[int] = None,
        encoder_chunk_size: Optional[int] = None,
        check: bool = False,
        **sampling,
    ) -> Dict[str, jax.Array]:
        """Long-horizon generation with a CARRIED rolling KV cache — the
        TPU-first alternative to ``generate_long``'s chunk re-prefill
        (reference ``scripts/generate.py:327-370``): ONE continuous
        decode over the full token horizon, windowed attention via the
        rolling chunk machinery (``generate_tokens_streaming``), zero
        prompt re-prefill. The visual encoder still runs once over all
        segments; the conditioning stream is laid out over the whole
        horizon (segments wrap modulo the video length, like the
        re-prefill path's sliding window).

        Attention window: ``(window_chunks-1)..window_chunks *
        chunk_steps`` trailing steps (defaults 168..224 ≈ the flagship's
        trained 221-token context) + ``sink_chunks`` pinned anchor
        chunks. The RoPE freqs table must cover the horizon:
        ``sampler_config.block_size >= S`` (raise ``block_size_audio``
        when constructing the system for long-form use).

        Exactness contract: with ``window_chunks * chunk_steps >= S``
        this is token-identical to ``generate(max_new_tokens=
        total_tokens)``; with a finite window each position's K/V keep
        their original full-history values (strictly MORE context than
        the re-prefill path, which truncates carried tokens' history to
        the chunk window) — semantics locked by ``tests/test_stream_kv.py``
        against a windowed-mask teacher-forced oracle.
        """
        params, pattern, valid_mask, S, cond_seq, gen_seq = (
            self._longkv_setup(
                params, frames, vis_feats_segments,
                total_tokens=total_tokens,
                tokens_per_frame=tokens_per_frame,
                encoder_chunk_size=encoder_chunk_size,
                cfg_scale=float(sampling.get("cfg_scale", 1.0)),
            )
        )
        from vaura_tpu.utils import cached_jit

        gen_seq = self.generate_tokens_streaming(
            params, cond_seq, gen_seq, rng,
            S=S, valid_mask=valid_mask,
            window_chunks=window_chunks, chunk_steps=chunk_steps,
            sink_chunks=sink_chunks,
            **sampling,
        )
        def _post(gen_seq):
            out, _, _ = pattern.revert_pattern_sequence(gen_seq, UNKNOWN_TOKEN)
            return out[..., :total_tokens]

        out_codes = cached_jit(
            self, "_longkv_post_jit", (gen_seq.shape, total_tokens), _post
        )(gen_seq)
        if check:
            c = np.asarray(out_codes)
            assert (c >= 0).all() and (c <= self.special_token_id).all()
        result: Dict[str, jax.Array] = {"codes": out_codes}
        if decode_to_audio:
            dac_fn = cached_jit(
                self, "_long_dac_jit", (out_codes.shape, dac_chunk_size),
                lambda p, c, _cs=dac_chunk_size: self.decode_audio(
                    p, c, chunk_size=_cs
                ),
            )
            result["audio"] = dac_fn(params, out_codes)
        return result

    def generate_long_kv_stream(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],  # [B, S_total, C, T, H, W]
        rng: jax.Array,
        *,
        total_tokens: int,
        vfps: float = 25.0,
        frames_per_segment: int = 16,
        tokens_per_frame: int = 7,
        vis_feats_segments: Optional[jax.Array] = None,  # [B, S_total, t, D]
        window_chunks: int = 4,
        chunk_steps: int = 56,
        sink_chunks: int = 0,
        emit_margin_tokens: Optional[int] = None,
        encoder_chunk_size: Optional[int] = None,
        **sampling,
    ):
        """Streaming ``generate_long_kv``: a generator yielding one dict
        per rolling-cache segment as soon as that segment's tokens are
        final —

            {"codes":       [B, K, n_new]   newly final codec tokens,
             "audio":       [B, n_emit*hop] the next waveform increment,
             "token_start": int             token index of audio[..., 0]}

        i.e. ``generate_long_stream``'s first-sound-latency contract at
        ``generate_long_kv``'s zero-re-prefill throughput (55.6 vs 35.4
        au-s/s at B=128 — PERFORMANCE.md r5). Token stream is identical
        to ``generate_long_kv`` with the same rng/window; audio
        increments concatenate EXACTLY to its one-shot waveform (windowed
        DAC decode with ``emit_margin_tokens`` >= the decoder's analytic
        receptive field on each side — same mechanism and default as
        ``generate_long_stream``). No reference counterpart
        (``scripts/generate.py:327-370`` is offline re-prefill only).

        A timestep is "final" once every one of its pattern coordinates
        (the K delayed codebook slots) lies at a sequence position the
        decode has passed, so emission trails the decode head by the
        pattern's max delay plus the DAC margin.
        """
        params, pattern, valid_mask, S, cond_seq, gen_seq = (
            self._longkv_setup(
                params, frames, vis_feats_segments,
                total_tokens=total_tokens,
                tokens_per_frame=tokens_per_frame,
                encoder_chunk_size=encoder_chunk_size,
                cfg_scale=float(sampling.get("cfg_scale", 1.0)),
            )
        )
        from vaura_tpu.utils import cached_jit

        if emit_margin_tokens is None:
            emit_margin_tokens = self.dac_config.decoder_receptive_field_frames
        hop = self.dac_config.hop_length
        # host table: timestep t is final iff all its layout coords sit at
        # sequence positions < hi (positions [0, hi) are written after the
        # segment ending at step hi); prefix-safe via the running max
        last_step = np.zeros(total_tokens, dtype=np.int64)
        for s, coords in enumerate(pattern.layout):
            for t, _q in coords:
                if t < total_tokens:
                    last_step[t] = max(last_step[t], s)
        known_bar = np.maximum.accumulate(last_step) + 1

        def _revert(seq):
            out, _, _ = pattern.revert_pattern_sequence(seq, UNKNOWN_TOKEN)
            return out[..., :total_tokens]

        revert_fn = cached_jit(
            self, "_longkv_stream_revert_jit",
            (gen_seq.shape, total_tokens), _revert,
        )
        emitted = 0
        n_prev = 0
        for hi, seq in self._stream_kv_segments(
            params, cond_seq, gen_seq, rng,
            S=S, valid_mask=valid_mask,
            window_chunks=window_chunks, chunk_steps=chunk_steps,
            sink_chunks=sink_chunks,
            **sampling,
        ):
            final = hi >= S
            codes = revert_fn(seq)  # [B, K, total_tokens]; > n_known is garbage
            n_known = (
                total_tokens if final
                else min(int(np.searchsorted(known_bar, hi, side="right")),
                         total_tokens)
            )
            if n_known <= n_prev and not final:
                continue  # segment finalized nothing (ramp under max delay)
            emit_to = (
                n_known if final
                else max(emitted, n_known - emit_margin_tokens)
            )
            if emit_to > emitted:
                win_lo = max(0, emitted - emit_margin_tokens)
                window = codes[..., win_lo:n_known]
                dec_fn = cached_jit(
                    self, "_stream_dac_jit", window.shape,
                    lambda p, c: self.decode_audio(p, c),
                )
                wav = dec_fn(params, window)  # [B, 1, T*hop]
                audio = wav[
                    ..., (emitted - win_lo) * hop : (emit_to - win_lo) * hop
                ].reshape(wav.shape[0], -1)
            else:  # margin still swallows everything known: no decode
                audio = jnp.zeros((codes.shape[0], 0), jnp.float32)
            yield {
                "codes": codes[..., n_prev:n_known],
                "audio": audio,
                "token_start": emitted,
            }
            emitted = emit_to
            n_prev = n_known

    def generate_long_stream(
        self,
        params: Dict[str, Any],
        frames: Optional[jax.Array],  # [B, S_total, C, T, H, W]
        rng: jax.Array,
        *,
        total_tokens: int,
        stride_tokens: int,
        model_max_tokens: int = 221,
        vfps: float = 25.0,
        frames_per_segment: int = 16,
        tokens_per_frame: int = 7,
        vis_feats_segments: Optional[jax.Array] = None,  # [B, S_total, t, D]
        emit_margin_tokens: Optional[int] = None,
        encoder_chunk_size: Optional[int] = None,
        decode_buckets: int = 2,
        **sampling,
    ):
        """Streaming ``generate_long``: a generator yielding one dict per
        chunk as soon as that chunk's tokens exist —

            {"codes":       [B, K, n_new]   new tokens of this chunk,
             "audio":       [B, n_emit*hop] the next waveform increment,
             "token_start": int             token index of audio[..., 0]}

        so a client hears audio while later chunks are still decoding
        (first-sound latency = one chunk instead of the full clip). The
        reference's long-horizon path (``scripts/generate.py:327-370``)
        is offline-only; streaming has no counterpart there.

        The audio increments concatenate EXACTLY to ``generate_long``'s
        one-shot waveform: each increment is cut from a windowed DAC
        decode with ``emit_margin_tokens`` context frames on both sides
        (default: the decoder's analytic receptive field,
        ``DacConfig.decoder_receptive_field_frames`` — ~11 frames /
        ~128 ms for the flagship codec), so interior samples of the
        windowed decode equal the full decode's; exactness at the
        default margin is locked by ``tests/test_stream.py``. The final
        chunk flushes the right-margin holdback.
        """
        params = self._resolve_params(params)
        vis_feats_segments = self._long_encode_segments(
            params, frames, vis_feats_segments, chunk_size=encoder_chunk_size
        )
        from vaura_tpu.utils import cached_jit

        if emit_margin_tokens is None:
            emit_margin_tokens = self.dac_config.decoder_receptive_field_frames
        hop = self.dac_config.hop_length
        chunks = self._long_chunk_tokens(
            params, rng, vis_feats_segments,
            total_tokens=total_tokens,
            stride_tokens=stride_tokens,
            model_max_tokens=model_max_tokens,
            vfps=vfps,
            frames_per_segment=frames_per_segment,
            tokens_per_frame=tokens_per_frame,
            decode_buckets=decode_buckets,
            sampling=sampling,
        )
        n_chunks = len(
            self.long_chunk_schedule(
                total_tokens, stride_tokens, model_max_tokens
            )
        )
        codes_so_far: Optional[jax.Array] = None
        emitted = 0
        for i, new in enumerate(chunks):
            last = i == n_chunks - 1
            codes_so_far = (
                new if codes_so_far is None
                else jnp.concatenate([codes_so_far, new], axis=-1)
            )
            n_known = codes_so_far.shape[-1]
            emit_to = (
                n_known if last
                else max(emitted, n_known - emit_margin_tokens)
            )
            if emit_to > emitted:
                win_lo = max(0, emitted - emit_margin_tokens)
                window = codes_so_far[..., win_lo:n_known]
                dec_fn = cached_jit(
                    self, "_stream_dac_jit", window.shape,
                    lambda p, c: self.decode_audio(p, c),
                )
                wav = dec_fn(params, window)  # [B, 1, T*hop]
                audio = wav[
                    ..., (emitted - win_lo) * hop : (emit_to - win_lo) * hop
                ].reshape(wav.shape[0], -1)
            else:  # margin still swallows everything known: no decode
                audio = jnp.zeros((codes_so_far.shape[0], 0), jnp.float32)
            yield {"codes": new, "audio": audio, "token_start": emitted}
            emitted = emit_to
