"""Multi-codebook autoregressive sampler (Llama-style decoder), TPU-first.

Behavioral equivalent of the reference's LlamaGen-style ``Transformer``
(reference ``models/modules/sampler/llama.py:286-586``): per-codebook token
embeddings summed, AVCLIP visual features MLP-projected and fused by channel
concatenation, RoPE, RMSNorm + SwiGLU blocks, per-codebook LM heads.

TPU-first redesign:
  * The 24 decoder blocks run under ``nn.scan`` with stacked parameters —
    one compiled block, fast compile, and a natural ``layers`` axis for
    FSDP/TP sharding.
  * The KV cache is a *live* design (the reference defines one but never
    uses it — ``llama.py:180-196,213,477``): an explicit ``[L, B, S, H, D]``
    pytree threaded functionally through ``prefill``/``decode_step`` so a
    single compiled step serves every decode position.
  * The 9 LM heads are one fused ``[d_model, K*vocab]`` matmul (zero-init
    like reference ``llama.py:384-385``).
  * The per-codebook DAC-factored embeddings (8-d codebook entry ->
    weight-normed 1x1 projection, reference ``llama.py:60-73,387-412``) are
    a flattened gather + batched matmul.

Compute runs in ``config.dtype`` (bfloat16 by default) with float32 norms
and softmax; parameters stay float32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vaura_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis


def find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static hyperparameters of the decoder.

    Field names track the reference YAML schema
    (``configs/modules/samplers/llama_9cbs.yaml``) where applicable.
    """

    num_layers: int = 24
    d_model: int = 1536
    d_codebook: int = 1024  # vocabulary per codebook (without the special token)
    num_codebooks: int = 9
    nhead: int = 16
    n_kv_head: Optional[int] = None
    block_size_audio: int = 256
    block_size_video: int = 64
    dropout: float = 0.1
    class_dropout_prob: float = 0.1
    attn_dropout_p: float = 0.0
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-5
    rope_base: float = 10000.0
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    initializer_range: float = 0.02
    cond_in_dim: int = 768  # AVCLIP feature dim
    cond_feature_channel_scaler: int = 3
    cond_token_num: int = 32
    codebook_dim: int = 8  # DAC codebook entry dim (factored embedding)
    dac_factored_embeddings: bool = True
    use_visual_conditioning: bool = True
    use_pallas_decode: bool = False  # Pallas bounded-read decode attention
    remat: bool = False  # rematerialize blocks (activation memory ~/L)
    # remat checkpoint policy: None = save nothing (recompute all);
    # 'dots_no_batch' = save matmul outputs without batch dims (the usual
    # transformer sweet spot: skips recomputing the big dots at modest
    # memory cost); 'dots' = save all dot outputs
    remat_policy: Optional[str] = None
    quantize_weights: bool = False  # int8 weight-only matmuls (inference)
    quantize_cache: bool = False  # int8 KV cache (halves decode cache reads)
    # KV-cache storage width when quantize_cache: 8 = int8 (default), 4 =
    # nibble-packed int4 (halves the cache stream again; coarser scales —
    # quality must be gated at trained margins, see PERFORMANCE.md)
    cache_bits: int = 8
    # int8 x int8 attention dots: dynamically quantize the decode q vector
    # and the (v-scale-folded) prob rows so the MXU consumes the int8 cache
    # directly instead of widening it to bf16 first (the widening costs
    # ~18% of cache-read bandwidth — PERFORMANCE.md roofline)
    int8_dots: bool = False
    scan_unroll: int = 1  # unroll factor for the layer scan (perf knob)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def block_size(self) -> int:
        return max(self.block_size_audio, self.block_size_video)

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.nhead == 0
        return self.d_model // self.nhead

    @property
    def n_kv_heads(self) -> int:
        return self.n_kv_head if self.n_kv_head is not None else self.nhead

    @property
    def cond_dim(self) -> int:
        return self.d_model // self.cond_feature_channel_scaler

    @property
    def token_dim(self) -> int:
        # channel-concat fusion: cond_dim + token_dim == d_model
        # (reference llama.py:471-473; 512 + 1024 = 1536 for the 9cb config)
        return self.d_model - self.cond_dim

    @property
    def ffn_hidden_dim(self) -> int:
        hidden = int(2 * (4 * self.d_model) / 3)
        if self.ffn_dim_multiplier is not None:
            hidden = int(self.ffn_dim_multiplier * hidden)
        return find_multiple(hidden, self.multiple_of)

    @property
    def vocab_with_special(self) -> int:
        return self.d_codebook + 1

    @property
    def special_token_id(self) -> int:
        return self.d_codebook

    def build(self) -> "Sampler":
        return Sampler(self)


def SamplerSpec(**kwargs) -> SamplerConfig:
    """Config shim accepting the reference YAML parameter set
    (``llama_9cbs.yaml``). Keys the reference itself ignores
    (``dim_feedforward`` — see reference ``llama.py:161-177`` — plus
    torch-API artifacts) are accepted and dropped.
    """
    ignored = {
        "dim_feedforward",
        "activation",
        "batch_first",
        "norm_first",
        "positional_embedder",
        "use_delay_strategy",
    }
    clean = {k: v for k, v in kwargs.items() if k not in ignored}
    if "dropout" in clean:
        clean.setdefault("class_dropout_prob", 0.1)
    valid = {f.name for f in dataclasses.fields(SamplerConfig)}
    unknown = set(clean) - valid
    if unknown:
        raise TypeError(f"Unknown sampler config keys: {sorted(unknown)}")
    return SamplerConfig(**clean)


# --------------------------------------------------------------------- #
# building blocks
# --------------------------------------------------------------------- #
class PDense(nn.Module):
    """Bias-free dense with a param layout stable across precision modes:
    ``kernel`` (float) normally, or ``kernel_q``+``scale`` (int8 weight-only,
    see ``vaura_tpu.ops.quantization``) when ``config.quantize_weights``.
    Replaces ``nn.Dense`` for the decoder's big matmuls so quantized
    inference keeps identical tree paths."""

    features: int
    config: SamplerConfig
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        if cfg.quantize_weights:
            from vaura_tpu.ops.quantization import quant_dense

            q = self.param(
                "kernel_q", nn.initializers.zeros,
                (x.shape[-1], self.features), jnp.int8,
            )
            s = self.param(
                "scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            return quant_dense(x.astype(cfg.dtype), {"kernel_q": q, "scale": s})
        init = self.kernel_init or nn.initializers.normal(cfg.initializer_range)
        kernel = self.param(
            "kernel", init, (x.shape[-1], self.features), cfg.param_dtype
        )
        return jnp.dot(x.astype(cfg.dtype), kernel.astype(cfg.dtype))


class RMSNorm(nn.Module):
    """Root-mean-square norm in float32 (reference ``llama.py:147-158``)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (norm * weight).astype(x.dtype)


class FeedForward(nn.Module):
    """SwiGLU FFN (reference ``llama.py:161-177``)."""

    config: SamplerConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        cfg = self.config
        dense = lambda feats, name: PDense(feats, cfg, name=name)
        h = jax.nn.silu(dense(cfg.ffn_hidden_dim, "w1")(x)) * dense(
            cfg.ffn_hidden_dim, "w3"
        )(x)
        out = dense(cfg.d_model, "w2")(h)
        return nn.Dropout(cfg.dropout, deterministic=not train)(out)


class Attention(nn.Module):
    """Causal self-attention with fused QKV, RoPE, and an explicit KV cache.

    Reference ``llama.py:198-260``; unlike the reference, the cache path is
    live. TPU-first cache protocol: the layer NEVER writes the cache —
    in ``decode`` mode it reads the (stale-at-``pos``) cache, attends over
    cached positions ``< pos`` plus the freshly-computed current K/V, and
    returns the current position's ``(k, v)`` so the caller can commit one
    in-place ``dynamic_update_slice`` on the scan carry. This keeps the
    per-step HBM traffic at one cache *read* + a 1-position write instead
    of a full-cache rewrite per layer.
    """

    config: SamplerConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, S, d_model]
        freqs_cis: jax.Array,  # [S, head_dim//2, 2]
        mask: Optional[jax.Array],  # [S, S] bool (train/prefill causal mask)
        # decode: tuple of per-chunk cache tuples, each ([B,S_c,H,hd] k, v
        # [, k_scale, v_scale]) — the KV sequence axis is physically split
        # into chunks so the bucketed-decode scan carries only the chunks
        # it can attend to (vaura.py::generate_tokens)
        cache_kv: Optional[Tuple[Tuple[jax.Array, ...], ...]],
        pos: jax.Array,  # scalar int32: current position (decode)
        train: bool,
        # decode: per-chunk validity masks ([S_c] bool or None = all valid);
        # only the chunk being written needs one — frozen chunks hold
        # positions strictly below every pos in the current scan segment
        chunk_masks: Tuple[Optional[jax.Array], ...] = (None,),
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        cfg = self.config
        B, S, _ = x.shape
        kv_dim = cfg.n_kv_heads * cfg.head_dim
        qkv = PDense(cfg.d_model + 2 * kv_dim, cfg, name="wqkv")(x)
        q, k, v = jnp.split(qkv, [cfg.d_model, cfg.d_model + kv_dim], axis=-1)
        q = q.reshape(B, S, cfg.nhead, cfg.head_dim)
        k = k.reshape(B, S, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, S, cfg.n_kv_heads, cfg.head_dim)
        q = apply_rotary_emb(q, freqs_cis)
        k = apply_rotary_emb(k, freqs_cis)

        scale = 1.0 / math.sqrt(cfg.head_dim)
        rep = cfg.nhead // cfg.n_kv_heads

        if cache_kv is not None:
            # chunk_masks must align with cache_kv: zip() would silently
            # drop later chunks from attention (wrong logits, no crash)
            assert len(cache_kv) == len(chunk_masks), (
                f"cache_kv has {len(cache_kv)} chunks but chunk_masks has "
                f"{len(chunk_masks)} entries"
            )
        if (cache_kv is not None and cfg.use_pallas_decode and rep == 1
                and not cfg.quantize_cache and len(cache_kv) == 1
                # decode_attention pads the cache to a 64-multiple length
                # with a jnp.pad — a full-cache HBM copy EVERY step for
                # misaligned chunks (bucketed segments are 8-aligned, not
                # 64); keep the Pallas path to copy-free shapes
                and cache_kv[0][0].shape[1] % 64 == 0):
            # Pallas kernel: DMAs exactly ceil(pos/BLOCK) cache blocks
            from vaura_tpu.ops.pallas_attention import decode_attention

            ck, cv = cache_kv[0]
            out = decode_attention(
                q[:, 0], ck, cv, k[:, 0], v[:, 0], pos
            ).reshape(B, S, cfg.d_model)
        elif cache_kv is not None:
            # decode: S == 1. Attend over cached positions < pos (spread
            # across the physically separate chunk buffers) + current k/v:
            # per-chunk scores concatenate into ONE softmax (order-
            # invariant, so bit-exact vs a monolithic buffer), then the
            # output accumulates per-chunk prob@value dots.
            k_cur, v_cur = k, v
            if rep != 1:
                k_cur = jnp.repeat(k_cur, rep, axis=2)
                v_cur = jnp.repeat(v_cur, rep, axis=2)
            if cfg.quantize_cache and cfg.int8_dots:
                from vaura_tpu.ops.quantization import quantize_rows

                q8, q_s = quantize_rows(q)  # [B,1,H,hd] i8, [B,1,H]
            all_scores = []
            chunk_vs = []  # (values, v_scale) for the output pass
            for chunk, cmask in zip(cache_kv, chunk_masks):
                if cfg.quantize_cache:
                    # int8 cache: per-(position, head) scales fold outside
                    # the dots, so the matmuls read int8 directly
                    ck, cv, ck_s, cv_s = chunk  # [B,S_c,H,hd] i8 + [B,S_c,H]
                    if cfg.cache_bits == 4:
                        from vaura_tpu.ops.quantization import unpack_int4

                        ck = unpack_int4(ck)  # [.., hd/2] packed -> [.., hd]
                        cv = unpack_int4(cv)
                else:
                    ck, cv = chunk  # [B, S_c, n_kv, hd]
                    ck_s = cv_s = None
                keys, values = ck, cv
                if rep != 1:
                    keys = jnp.repeat(keys, rep, axis=2)
                    values = jnp.repeat(values, rep, axis=2)
                    if ck_s is not None:
                        ck_s = jnp.repeat(ck_s, rep, axis=2)
                        cv_s = jnp.repeat(cv_s, rep, axis=2)
                if ck_s is not None and cfg.int8_dots:
                    # int8 x int8 qk dot: the MXU reads the int8 cache
                    # directly; q's dynamic scale folds onto scores
                    scores_c = jnp.einsum(
                        "bshd,bthd->bhst", q8, keys,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * (
                        scale * jnp.transpose(q_s, (0, 2, 1))[:, :, :, None]
                    )
                else:
                    scores_c = jnp.einsum(
                        "bshd,bthd->bhst", q, keys.astype(q.dtype),
                        preferred_element_type=jnp.float32,
                    ) * scale  # [B, H, 1, S_c]
                if ck_s is not None:
                    scores_c = (
                        scores_c * jnp.transpose(ck_s, (0, 2, 1))[:, :, None, :]
                    )
                if cmask is not None:
                    scores_c = jnp.where(
                        cmask[None, None, None, :], scores_c, -1e30
                    )
                all_scores.append(scores_c)
                chunk_vs.append((values, cv_s))
            scores_s = jnp.einsum(
                "bshd,bthd->bhst", q, k_cur, preferred_element_type=jnp.float32
            ) * scale  # [B, H, 1, 1]
            scores = jnp.concatenate(all_scores + [scores_s], axis=-1)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.zeros((B, S, cfg.nhead, cfg.head_dim), jnp.float32)
            off = 0
            for values, cv_s in chunk_vs:
                S_c = values.shape[1]
                p_cache = probs[..., off:off + S_c]
                off += S_c
                if cv_s is not None:
                    p_cache = (
                        p_cache * jnp.transpose(cv_s, (0, 2, 1))[:, :, None, :]
                    )
                if cv_s is not None and cfg.int8_dots:
                    from vaura_tpu.ops.quantization import quantize_rows

                    p8, p_s = quantize_rows(p_cache)  # i8, [B,H,1]
                    out_c = jnp.einsum(
                        "bhst,bthd->bshd", p8, values,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * (
                        jnp.transpose(p_s, (0, 2, 1))[..., None]
                    )
                    out = out + out_c
                else:
                    out = out + jnp.einsum(
                        "bhst,bthd->bshd",
                        p_cache.astype(cfg.dtype),
                        values.astype(cfg.dtype),
                    ).astype(jnp.float32)
            out = out + jnp.einsum(
                "bhst,bthd->bshd", probs[..., off:].astype(v_cur.dtype), v_cur
            ).astype(jnp.float32)
            out = out.astype(cfg.dtype).reshape(B, S, cfg.d_model)
        else:
            keys, values = k, v
            if rep != 1:
                keys = jnp.repeat(keys, rep, axis=2)
                values = jnp.repeat(values, rep, axis=2)
            scores = jnp.einsum(
                "bshd,bthd->bhst", q, keys, preferred_element_type=jnp.float32
            ) * scale
            scores = jnp.where(mask[None, None, :, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            self.sow("intermediates", "attn_probs", jnp.mean(probs, axis=1))
            if cfg.attn_dropout_p > 0.0 and train:
                probs = nn.Dropout(cfg.attn_dropout_p, deterministic=False)(probs)
            out = jnp.einsum(
                "bhst,bthd->bshd", probs.astype(values.dtype), values
            ).reshape(B, S, cfg.d_model)

        out = PDense(cfg.d_model, cfg, name="wo")(out.astype(cfg.dtype))
        out = nn.Dropout(cfg.dropout, deterministic=not train)(out)
        return out, (k, v)


class TransformerBlock(nn.Module):
    """Pre-norm residual block (reference ``llama.py:263-283``).

    Shaped for ``nn.scan``: the carry is the hidden state, the per-layer
    scanned input/output is the layer's KV-cache slice. ``train`` rides in
    the broadcast tuple as a static python bool; a zero-length cache
    (``S == 0``) statically disables the cache path.
    """

    config: SamplerConfig

    @nn.compact
    def __call__(self, x, broadcast_in, cache_layer, train, mode):
        freqs_cis, mask, pos, chunk_masks = broadcast_in
        cfg = self.config
        attn_out, (k_new, v_new) = Attention(cfg, name="attention")(
            RMSNorm(cfg.d_model, cfg.layer_norm_eps, name="attention_norm")(x),
            freqs_cis,
            mask,
            cache_layer if mode == "decode" else None,
            pos,
            train,
            chunk_masks,
        )
        h = x + self._drop_path(attn_out, train)
        ffn_out = FeedForward(cfg, name="feed_forward")(
            RMSNorm(cfg.d_model, cfg.layer_norm_eps, name="ffn_norm")(h), train
        )
        out = h + self._drop_path(ffn_out, train)
        if mode == "train":
            # no cache product: zero-size ys keeps nn.scan from stacking
            # activation-sized K/V during training
            ys = jnp.zeros((x.shape[0], 0), dtype=x.dtype)
        else:
            ys = (k_new, v_new)
        return out, ys

    def _drop_path(self, x: jax.Array, train: bool) -> jax.Array:
        # stochastic depth (reference utils/drop_path.py); default rate 0
        rate = self.config.drop_path_rate
        if rate == 0.0 or not train:
            return x
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class MultiCodebookEmbedding(nn.Module):
    """Sum of per-codebook token embeddings (reference ``llama.py:455-460``).

    Two parameterizations:
      * DAC-factored (default, matches reference ``initialize_embeddings``,
        ``llama.py:387-412``): per codebook an ``[V+1, codebook_dim]`` table
        (DAC codebook + trainable special row) followed by a weight-normed
        1x1 projection to ``token_dim``.
      * Plain: per codebook an ``[V+1, token_dim]`` table.
    All codebooks are gathered from one flattened table in a single take.
    """

    config: SamplerConfig

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:  # [B, K, S] -> [B, S, D]
        cfg = self.config
        K, V1 = cfg.num_codebooks, cfg.vocab_with_special
        init = nn.initializers.normal(cfg.initializer_range)
        B, Kt, S = tokens.shape
        assert Kt == K
        offsets = (jnp.arange(K, dtype=jnp.int32) * V1)[None, :, None]
        flat_idx = tokens.astype(jnp.int32) + offsets  # [B, K, S]
        if cfg.dac_factored_embeddings:
            emb = self.param("emb", init, (K * V1, cfg.codebook_dim), cfg.param_dtype)
            proj_v = self.param(
                "proj_v", init, (K, cfg.token_dim, cfg.codebook_dim), cfg.param_dtype
            )
            proj_g = self.param(
                "proj_g", nn.initializers.ones, (K, cfg.token_dim, 1), cfg.param_dtype
            )
            proj_b = self.param(
                "proj_b", nn.initializers.zeros, (K, cfg.token_dim), cfg.param_dtype
            )
            e = jnp.take(emb, flat_idx.reshape(-1), axis=0).reshape(
                B, K, S, cfg.codebook_dim
            )
            # weight norm: W = g * v / ||v|| over the input axis
            norm = jnp.sqrt(jnp.sum(proj_v**2, axis=-1, keepdims=True) + 1e-12)
            W = (proj_g * proj_v / norm).astype(cfg.dtype)
            out = jnp.einsum(
                "bksc,ktc->bst", e.astype(cfg.dtype), W,
                preferred_element_type=jnp.float32,
            )
            out = out + jnp.sum(proj_b, axis=0)[None, None, :]
            return out.astype(cfg.dtype)
        emb = self.param("emb", init, (K * V1, cfg.token_dim), cfg.param_dtype)
        e = jnp.take(emb, flat_idx.reshape(-1), axis=0).reshape(
            B, K, S, cfg.token_dim
        )
        return jnp.sum(e, axis=1).astype(cfg.dtype)


class AVCLIPEmbedder(nn.Module):
    """Visual-feature projection + CFG condition dropout
    (reference ``llama.py:95-141``).

    ``uncond_embedding`` mirrors the reference's registered buffer: it joins
    the param pytree for checkpointing but is excluded from optimization by
    the train-state freeze mask (see ``vaura_tpu.train.state``).
    """

    config: SamplerConfig

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        self.fc1 = nn.Dense(
            cfg.cond_dim, use_bias=False, kernel_init=init,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1",
        )
        self.fc2 = nn.Dense(
            cfg.cond_dim, use_bias=False, kernel_init=init,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc2",
        )
        self.uncond_embedding = self.param(
            "uncond_embedding",
            lambda rng, shape: jax.random.normal(rng, shape, jnp.float32)
            / cfg.cond_in_dim**0.5,
            (cfg.cond_token_num, cfg.cond_in_dim),
        )

    def _uncond_rows(self, n_tokens: int) -> jax.Array:
        """First ``n_tokens`` rows of the uncond embedding, tiled
        cyclically when the conditioning is longer than ``cond_token_num``
        (the reference's buffer is sized exactly for its 32-token setup,
        ``llama.py:113-117``; tiling generalizes it)."""
        u = self.uncond_embedding
        if n_tokens > u.shape[0]:
            reps = -(-n_tokens // u.shape[0])
            u = jnp.tile(u, (reps, 1))
        return u[:n_tokens]

    def token_drop(self, feats: jax.Array, rng: jax.Array) -> jax.Array:
        """Replace whole samples with the uncond embedding w.p.
        ``class_dropout_prob`` (reference ``llama.py:125-134``)."""
        drop = jax.random.uniform(rng, (feats.shape[0],)) < self.config.class_dropout_prob
        uncond = jnp.broadcast_to(
            self._uncond_rows(feats.shape[1]).astype(feats.dtype), feats.shape
        )
        return jnp.where(drop[:, None, None], uncond, feats)

    def project(self, x: jax.Array) -> jax.Array:
        h = self.fc1(x.astype(self.config.dtype))
        h = nn.gelu(h, approximate=True)
        return self.fc2(h)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if train and self.config.class_dropout_prob > 0.0:
            x = self.token_drop(x, self.make_rng("cfg_dropout"))
        return self.project(x)

    def uncond(self, batch: int, n_tokens: int) -> jax.Array:
        """The projected null condition for CFG inference
        (reference ``vaura_model.py:790-794``)."""
        uncond = self._uncond_rows(n_tokens)[None].astype(self.config.dtype)
        uncond = jnp.broadcast_to(
            uncond, (batch, n_tokens, self.config.cond_in_dim)
        )
        return self.project(uncond)


def repeat_video_tokens(
    cond_emb: jax.Array,  # [B, Tv, D] projected visual tokens
    seq_len: int,
    tokens_per_frame: int,
    empty_emb: jax.Array,  # [D] learned padding embedding
) -> jax.Array:
    """Repeat each video token ``tokens_per_frame``x along the audio axis,
    padding overflow positions with ``empty_emb``
    (reference ``llama.py:555-586``)."""
    B, Tv, D = cond_emb.shape
    pos = jnp.arange(seq_len, dtype=jnp.int32)
    frame = pos // tokens_per_frame
    gathered = jnp.take(cond_emb, jnp.clip(frame, 0, Tv - 1), axis=1)  # [B, S, D]
    valid = (frame < Tv)[None, :, None]
    return jnp.where(valid, gathered, empty_emb.astype(cond_emb.dtype)[None, None, :])


def default_tokens_per_frame(seq_len: int, n_video_tokens: int, num_codebooks: int,
                             pattern_name: str = "delayed") -> int:
    """Reference ``llama.py:544-553``: subtract the special-token tail
    (one per codebook for the delayed pattern), then ceil-divide."""
    ta = seq_len - num_codebooks if "delayed" in pattern_name.lower() else seq_len - 1
    return math.ceil(ta / n_video_tokens)


# --------------------------------------------------------------------- #
# the sampler
# --------------------------------------------------------------------- #
class Sampler(nn.Module):
    """The AR decoder. Three entry points:

    * ``__call__(tokens, cond_feats, train)`` — full-sequence causal forward
      for training/teacher-forcing; returns ``[B, K, S, vocab]`` logits.
    * ``prefill(tokens, cond_seq, cache)`` — full causal forward that also
      writes every position's K/V into the cache (prompt ingestion).
    * ``decode_step(tokens_t, cond_t, cache, pos)`` — one-token step against
      the cache; the compiled unit of the generation loop.
    """

    config: SamplerConfig

    def setup(self):
        cfg = self.config
        self.tok_embeddings = MultiCodebookEmbedding(cfg, name="tok_embeddings")
        self.cls_embeddings = AVCLIPEmbedder(cfg, name="cls_embeddings")
        self.empty_video_emb = self.param(
            "empty_video_emb",
            nn.initializers.normal(cfg.initializer_range),
            (cfg.cond_dim,),
            cfg.param_dtype,
        )
        if cfg.remat:
            policy = {
                "dots": jax.checkpoint_policies.dots_saveable,
                "dots_no_batch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                None: None,
            }[cfg.remat_policy]
            block_def = nn.remat(
                TransformerBlock, static_argnums=(4, 5), policy=policy
            )
        else:
            block_def = TransformerBlock
        block = nn.scan(
            block_def,
            # intermediates must be declared or nn.scan silently drops
            # the per-layer attn_probs sow (reference attention-weight
            # videos, train_utils.py:204-255, read layer -1)
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, 0, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
            unroll=cfg.scan_unroll,
        )
        self.layers = block(cfg, name="layers")
        self.tok_dropout = nn.Dropout(cfg.dropout)
        self.norm = RMSNorm(cfg.d_model, cfg.layer_norm_eps, name="norm")
        # fused per-codebook heads, zero-init (reference llama.py:356-361,384-385)
        self.lm_head = PDense(
            cfg.num_codebooks * cfg.d_codebook,
            cfg,
            kernel_init=nn.initializers.zeros,
            name="lm_head",
        )

    # -------------------------- helpers -------------------------- #
    def _freqs(self) -> jax.Array:
        return jnp.asarray(
            precompute_freqs_cis(
                self.config.block_size, self.config.head_dim, self.config.rope_base
            )
        )

    def _run_blocks(self, h, freqs_cis, mask, cache, pos, train, mode,
                    chunk_masks=(None,)):
        """mode: 'train' (no cache product), 'prefill' (ys = full K/V per
        layer, stacked into the cache by the caller), or 'decode' (cache is
        a tuple of per-chunk tuples, read-only xs; ys = current-position
        K/V per layer). ``chunk_masks`` aligns with the cache chunks."""
        cfg = self.config
        if cache is None:
            empty = jnp.zeros(
                (cfg.num_layers, h.shape[0], 0, cfg.n_kv_heads, cfg.head_dim),
                dtype=cfg.dtype,
            )
            cache = ((empty, empty),)
        h, ys = self.layers(
            h, (freqs_cis, mask, pos, chunk_masks), cache, train, mode
        )
        return h, ys

    def _logits(self, h: jax.Array) -> jax.Array:
        cfg = self.config
        B, S, _ = h.shape
        out = self.lm_head(self.norm(h))
        out = out.reshape(B, S, cfg.num_codebooks, cfg.d_codebook)
        return jnp.transpose(out, (0, 2, 1, 3))  # [B, K, S, vocab]

    def embed_cond(self, cond_feats: jax.Array, train: bool) -> jax.Array:
        """Project raw AVCLIP features ``[B, Tv, 768] -> [B, Tv, cond_dim]``
        (CFG token-drop applied when training)."""
        return self.cls_embeddings(cond_feats, train=train)

    def uncond_cond_emb(self, batch: int, n_tokens: int) -> jax.Array:
        return self.cls_embeddings.uncond(batch, n_tokens)

    def build_cond_seq(
        self, cond_emb: jax.Array, seq_len: int, tokens_per_frame: int
    ) -> jax.Array:
        """[B, Tv, cond_dim] -> [B, seq_len, cond_dim] per-position stream."""
        return repeat_video_tokens(
            cond_emb, seq_len, tokens_per_frame, self.empty_video_emb
        )

    # ------------------------ entry points ------------------------ #
    def __call__(
        self,
        tokens: jax.Array,  # [B, K, S] int
        cond_feats: jax.Array,  # [B, Tv, cond_in_dim] raw visual features
        train: bool = False,
        tokens_per_frame: Optional[int] = None,
        attn_mask: Optional[jax.Array] = None,  # [S, S] bool (causal subset)
    ) -> jax.Array:
        """Teacher-forced causal forward (reference ``llama.py:445-517``).

        ``attn_mask`` overrides the causal tril (must be a subset of it) —
        used by the windowed-attention oracle that pins the rolling-KV
        streaming decode's semantics (``tests/test_stream_kv.py``)."""
        cfg = self.config
        B, K, S = tokens.shape
        tok_emb = self.tok_embeddings(tokens)  # [B, S, token_dim]
        if tokens_per_frame is None:
            tokens_per_frame = default_tokens_per_frame(
                S, cond_feats.shape[1], cfg.num_codebooks
            )
        cond_emb = self.embed_cond(cond_feats, train)
        cond_seq = self.build_cond_seq(cond_emb, S, tokens_per_frame)
        h = jnp.concatenate([cond_seq, tok_emb], axis=-1)  # [B, S, d_model]
        h = self.tok_dropout(h, deterministic=not train)
        freqs_cis = self._freqs()[:S]
        mask = (
            attn_mask if attn_mask is not None
            else jnp.tril(jnp.ones((S, S), dtype=bool))
        )
        h, _ = self._run_blocks(
            h, freqs_cis, mask, None, jnp.int32(0), train, "train"
        )
        return self._logits(h)

    def init_cache(self, batch: int, max_seq: int, dtype=None) -> Dict[str, jax.Array]:
        cfg = self.config
        dtype = dtype or cfg.dtype
        shape = (cfg.num_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim)
        if cfg.quantize_cache:
            store_hd = cfg.head_dim // 2 if cfg.cache_bits == 4 else cfg.head_dim
            return {
                "k": jnp.zeros(shape[:-1] + (store_hd,), jnp.int8),
                "v": jnp.zeros(shape[:-1] + (store_hd,), jnp.int8),
                "k_scale": jnp.zeros(shape[:-1], jnp.float32),
                "v_scale": jnp.zeros(shape[:-1], jnp.float32),
            }
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    def _cache_tuple(self, cache: Dict[str, jax.Array]):
        if self.config.quantize_cache:
            return (cache["k"], cache["v"], cache["k_scale"], cache["v_scale"])
        return (cache["k"], cache["v"])

    def prefill(
        self,
        tokens: jax.Array,  # [B, K, S_max] (padded; garbage beyond valid_len is fine)
        cond_seq: jax.Array,  # [B, S_max, cond_dim] prebuilt per-position stream
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Causal forward over the padded prompt producing all K/V as a
        fresh cache. Returns logits ``[B, K, S_max, vocab]`` and the cache.
        Decode steps mask by position, so positions beyond the prompt's
        valid length holding garbage K/V are never attended."""
        cfg = self.config
        B, K, S = tokens.shape
        tok_emb = self.tok_embeddings(tokens)
        h = jnp.concatenate([cond_seq.astype(tok_emb.dtype), tok_emb], axis=-1)
        freqs_cis = self._freqs()[:S]
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        h, ys = self._run_blocks(
            h, freqs_cis, mask, None, jnp.int32(0), False, "prefill"
        )
        k_full, v_full = ys  # [L, B, S, n_kv, hd]
        if cfg.quantize_cache:
            from vaura_tpu.ops.quantization import quantize_kv, quantize_kv4

            qfn = quantize_kv4 if cfg.cache_bits == 4 else quantize_kv
            kq, ks = qfn(k_full)
            vq, vs = qfn(v_full)
            return self._logits(h), {
                "k": kq, "v": vq, "k_scale": ks, "v_scale": vs,
            }
        return self._logits(h), {
            "k": k_full.astype(cfg.dtype),
            "v": v_full.astype(cfg.dtype),
        }

    def decode_step(
        self,
        tokens_t: jax.Array,  # [B, K, 1] tokens at position `pos`
        cond_t: jax.Array,  # [B, 1, cond_dim] conditioning at position `pos`
        cache: Any,  # Dict (one chunk) | Tuple[Dict, ...] (chunked, see below)
        pos: jax.Array,  # scalar int32
        key_len: Optional[int] = None,
        chunk_starts: Optional[Tuple[int, ...]] = None,
    ) -> Tuple[jax.Array, Any]:
        """One decode step: returns next-token logits ``[B, K, vocab]`` and
        the updated cache. The cache flows through the layer scan read-only;
        the single-position commit happens here so the surrounding
        ``lax.scan`` can alias the buffers in place.

        Chunked cache (the bucketed-decode optimization): ``cache`` may be
        a tuple of per-chunk dicts whose buffers physically partition the
        sequence axis at the static global offsets ``chunk_starts`` —
        early scan segments carry (and therefore read) only the chunks
        they can attend to, and growing the cache between segments is
        appending a fresh zero chunk instead of copying the whole buffer.
        Writes go into the LAST chunk at ``pos - chunk_starts[-1]``; only
        that chunk is masked by position (earlier chunks hold positions
        strictly below every ``pos`` of the current segment).

        ``key_len`` (static, single-chunk form only) bounds the attended
        prefix by slicing the chunk view."""
        cfg = self.config
        B = tokens_t.shape[0]
        tok_emb = self.tok_embeddings(tokens_t)  # [B, 1, token_dim]
        h = jnp.concatenate([cond_t.astype(tok_emb.dtype), tok_emb], axis=-1)
        freqs_cis = jax.lax.dynamic_slice(
            self._freqs(), (pos, 0, 0), (1, cfg.head_dim // 2, 2)
        )
        single = isinstance(cache, dict)
        chunks = (cache,) if single else tuple(cache)
        starts = (0,) if single else tuple(chunk_starts)
        assert len(starts) == len(chunks)
        cache_in = []
        chunk_masks = []
        for i, (c, g0) in enumerate(zip(chunks, starts)):
            tup = self._cache_tuple(c)
            if (single and key_len is not None
                    and key_len < tup[0].shape[2]):
                tup = tuple(t[:, :, :key_len] for t in tup)
            cache_in.append(tup)
            if i == len(chunks) - 1:
                # active chunk: positions g0..g0+S_c-1, attend strictly
                # below pos (the current token's score is added separately)
                chunk_masks.append(g0 + jnp.arange(tup[0].shape[2]) < pos)
            else:
                chunk_masks.append(None)
        h, ys = self._run_blocks(
            h, freqs_cis, None, tuple(cache_in), pos, False, "decode",
            tuple(chunk_masks),
        )
        k_cur, v_cur = ys  # [L, B, 1, n_kv, hd]
        off = pos - starts[-1]
        last = chunks[-1]
        if cfg.quantize_cache:
            from vaura_tpu.ops.quantization import quantize_kv, quantize_kv4

            qfn = quantize_kv4 if cfg.cache_bits == 4 else quantize_kv
            kq, ks = qfn(k_cur)
            vq, vs = qfn(v_cur)
            new_last = {
                "k": jax.lax.dynamic_update_slice(
                    last["k"], kq, (0, 0, off, 0, 0)
                ),
                "v": jax.lax.dynamic_update_slice(
                    last["v"], vq, (0, 0, off, 0, 0)
                ),
                "k_scale": jax.lax.dynamic_update_slice(
                    last["k_scale"], ks, (0, 0, off, 0)
                ),
                "v_scale": jax.lax.dynamic_update_slice(
                    last["v_scale"], vs, (0, 0, off, 0)
                ),
            }
        else:
            new_last = {
                "k": jax.lax.dynamic_update_slice(
                    last["k"], k_cur.astype(last["k"].dtype), (0, 0, off, 0, 0)
                ),
                "v": jax.lax.dynamic_update_slice(
                    last["v"], v_cur.astype(last["v"].dtype), (0, 0, off, 0, 0)
                ),
            }
        new_cache = new_last if single else chunks[:-1] + (new_last,)
        logits = self._logits(h)  # [B, K, 1, vocab]
        return logits[:, :, 0, :], new_cache
