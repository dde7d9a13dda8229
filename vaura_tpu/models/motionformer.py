"""MotionFormer / Segment-AVCLIP visual encoder (flax), TPU-first.

Behavioral equivalent of the reference's vendored Motionformer ViT and its
Synchformer feature-extraction wrapper (reference
``models/modules/feature_extractors/avclip/motionformer.py`` and
``.../motionformer_src/video_model_builder.py``, ``vit_helper.py``), in the
``divided_224_16x4`` configuration the reference pins
(``motionformer.py:115-141``):

  * 3D patch embed: Conv3d kernel/stride (2, 16, 16) over 16-frame 224x224
    segments -> (t=8, h=14, w=14) tokens, 768-d.
  * separate positional embeddings: spatial (196+CLS) tiled over time +
    temporal (8) interleaved over space.
  * 12 divided space-time blocks: time attention (per spatial location over
    frames, CLS attends globally), then space attention (per frame over
    locations), then MLP; LayerNorm eps 1e-6. The *time* residual carries no
    drop-path, matching ``vit_helper.py:449-466``.
  * feature extraction head: drop CLS, final LayerNorm, restore (t, h, w),
    then per-frame spatial aggregation with a CLS-token transformer encoder
    layer (``motionformer.py:367-497``); temporal aggregation is identity.

Output: ``(B, S, 8, 768)`` per-segment features, like the reference
(``motionformer.py:252-303``).

TPU-first notes: the 12 blocks run under ``nn.scan`` with stacked params and
a per-layer drop-path rate vector; attention keeps heads as a tensor axis
(no head-folding reshapes); softmax in float32; compute dtype bfloat16.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MotionFormerConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    qkv_bias: bool = True
    temporal_resolution: int = 8  # tokens along time (16 frames / z_block 2)
    z_block_size: int = 2
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    pos_embed_type: str = "separate"  # separate | joint
    attn_layer: str = "divided"  # divided | joint | trajectory (VIT.ATTN_LAYER)
    approx_attn_type: str = "none"  # none | nystrom | orthoformer | performer
    approx_attn_dim: int = 128  # landmarks / random features for approx attn
    use_original_code: bool = True  # trajectory temporal values = traj pts
    norm_eps: float = 1e-6
    # Fused Pallas divided attention (ops/divided_attention.py): None =
    # auto (on when running on TPU), True/False force. The einsum path
    # stays the reference implementation (oracle-parity-tested); the
    # kernel is numerically equivalent up to bf16 rounding.
    fused_divided_attention: Optional[bool] = None
    # Whole-sublayer fused encoder blocks (ops/encoder_fused.py): each
    # divided-attention sublayer (LN + qkv + grouped attention + proj +
    # residual) runs as ONE Pallas kernel with VMEM-resident weights, the
    # CLS row carried as a separate [B,1,D] array and two XLA transposes
    # per block alternating the token layout between the time (n-major)
    # and space (f-major) sublayers. Inference-only (falls back to the
    # einsum/fused-core path when training, quantized, or non-divided).
    # None = auto (on on TPU); True forces it elsewhere (interpret mode).
    fused_encoder_block: Optional[bool] = None
    # int8 inference for the frozen encoder (opt-in, never default): the
    # divided block's Dense layers take int8 per-output-channel weights
    # (ops.quantization.quantize_encoder_params) and dynamically
    # per-token-quantized int8 activations — the v5e MXU's int8 path is
    # 2x bf16 peak and the block stack is ~92% of encoder time (depth
    # sweep: 2.5 ms/clip fixed + 2.41 ms/clip/block at B=32). Attention
    # cores, LayerNorms, patch embed and agg layers stay bf16. Only the
    # divided attn_layer is wired; joint/trajectory blocks stay float.
    quantize: bool = False
    factorize_space_time: bool = True
    agg_space_module: str = "TransformerEncoderLayer"  # | AveragePooling
    agg_time_module: str = "Identity"  # | TransformerEncoderLayer | AveragePooling
    add_global_repr: bool = False
    agg_segments_module: str = "TransformerEncoderLayer"  # | AveragePooling
    max_segments: int = 16
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def grid_hw(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_spatial_patches(self) -> int:
        return self.grid_hw * self.grid_hw

    @property
    def num_patches(self) -> int:
        return self.num_spatial_patches * self.temporal_resolution

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def build(self) -> "MotionFormer":
        return MotionFormer(self)


def MotionFormerSpec(
    extract_features: bool = True,
    ckpt_path: Optional[str] = None,
    factorize_space_time: bool = True,
    agg_space_module: str = "TransformerEncoderLayer",
    agg_time_module: str = "torch.nn.Identity",
    add_global_repr: bool = False,
    agg_segments_module: Optional[str] = None,
    max_segments: Optional[int] = None,
    **kwargs,
) -> MotionFormerConfig:
    """Config shim accepting the reference wrapper's parameter names
    (``motionformer.py:66-76``). ``ckpt_path`` is handled by the checkpoint
    loader in ``vaura_tpu.models.convert``, not here."""
    return MotionFormerConfig(
        factorize_space_time=factorize_space_time,
        agg_space_module=agg_space_module,
        agg_time_module=(
            "Identity" if "Identity" in agg_time_module else agg_time_module
        ),
        add_global_repr=add_global_repr,
        agg_segments_module=(
            agg_segments_module
            if agg_segments_module is not None
            else "TransformerEncoderLayer"
        ),
        max_segments=max_segments if max_segments is not None else 16,
        **kwargs,
    )


def _trunc_normal(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std)


class EncDense(nn.Module):
    """``nn.Dense`` drop-in for the divided block's matmuls. Float path
    is numerically identical to ``nn.Dense`` (same param names/shapes, so
    checkpoints and the oracle-parity tests are unaffected). When
    ``config.quantize`` the kernel arrives as int8 ``kernel_q`` +
    per-output-channel ``scale`` (``quantize_encoder_params``) and the
    activation is dynamically per-token int8-quantized so the MXU runs
    the dot at its int8 rate (2x bf16 on v5e); the product rescales as
    ``(xq @ wq) * x_scale * w_scale`` in f32, then bias."""

    config: MotionFormerConfig
    features: int
    use_bias: bool = True
    in_features: Optional[int] = None  # for x=None param access only

    @nn.compact
    def __call__(
        self, x: Optional[jax.Array], return_params: bool = False
    ):
        cfg = self.config
        if cfg.quantize:
            if x is None:
                raise ValueError(
                    "EncDense param access (x=None) is float-path only; "
                    "the fused encoder block is gated off under quantize"
                )
            from vaura_tpu.ops.quantization import quantize_rows

            q = self.param(
                "kernel_q", nn.initializers.zeros,
                (x.shape[-1], self.features), jnp.int8,
            )
            s = self.param(
                "scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            xq, xs = quantize_rows(x)
            y = jax.lax.dot_general(
                xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * xs[..., None] * s
            if self.use_bias:
                b = self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    jnp.float32,
                )
                y = y + b
            return y.astype(cfg.dtype)
        if x is not None:
            in_dim = x.shape[-1]
        else:
            in_dim = self.in_features or cfg.embed_dim
        kernel = self.param(
            "kernel", _trunc_normal(), (in_dim, self.features),
            cfg.param_dtype,
        )
        b = None
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                cfg.param_dtype,
            )
        y = None
        if x is not None:
            y = jnp.dot(x.astype(cfg.dtype), kernel.astype(cfg.dtype))
            if b is not None:
                y = y + b.astype(cfg.dtype)
        if return_params:
            return y, (kernel, b)
        return y


class EncLayerNorm(nn.Module):
    """``nn.LayerNorm`` drop-in for the divided blocks (identical param
    names/shapes and numerics: f32 fast-variance stats, scale/bias in f32,
    cast to compute dtype) that can hand its raw params to the fused
    sublayer kernel (``__call__(None)`` returns ``(scale, bias)``)."""

    config: MotionFormerConfig

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None):
        cfg = self.config
        D = cfg.embed_dim
        scale = self.param("scale", nn.initializers.ones, (D,), cfg.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (D,), cfg.param_dtype)
        if x is None:
            return scale, bias
        from vaura_tpu.ops.encoder_fused import _layernorm

        return _layernorm(x, scale, bias, cfg.norm_eps).astype(cfg.dtype)


def _masked_softmax_attn(q, k, v):
    """Plain attention with float32 softmax. q: [B, H, Nq, D], k/v:
    [B, H, Nk, D]; q pre-scaled."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


class DividedAttention(nn.Module):
    """Divided attention (reference ``vit_helper.py:80-172``): the CLS token
    attends globally; other tokens attend within a single axis (time or
    space) with the CLS key/value appended to every group."""

    config: MotionFormerConfig

    @nn.compact
    def __call__(self, x, axis: str, f: int, n: int):
        cfg = self.config
        if isinstance(x, tuple):
            # Whole-sublayer fused path (ops/encoder_fused.py): x is
            # (x_cls [B,1,D], x_tok [B,G*L,D] group-major, ln_scale,
            # ln_bias); LN + qkv + grouped attention + proj + residual
            # run as one Pallas kernel. Returns (y_cls, y_tok).
            from vaura_tpu.ops.encoder_fused import fused_attention_sublayer

            x_cls, x_tok, lns, lnb = x
            D = cfg.embed_dim
            _, (wqkv, bqkv) = EncDense(
                cfg, 3 * D, use_bias=cfg.qkv_bias, name="qkv"
            )(None, return_params=True)
            _, (wproj, bproj) = EncDense(cfg, D, name="proj")(
                None, return_params=True
            )
            y_tok, y_cls = fused_attention_sublayer(
                x_tok, x_cls, lns, lnb, wqkv, bqkv, wproj, bproj,
                num_heads=cfg.num_heads,
                L=f if axis == "time" else n,
                eps=cfg.norm_eps,
                interpret=jax.default_backend() != "tpu",
            )
            return y_cls, y_tok

        B, N, D = x.shape  # N = 1 + f*n
        H, hd = cfg.num_heads, cfg.head_dim
        qkv = EncDense(cfg, 3 * D, use_bias=cfg.qkv_bias, name="qkv")(x)
        # TPU note: everything below is einsum-indexed on the natural
        # [B, f, n, H, hd] layout — no explicit 5-D regroup/ungroup
        # transposes (the r2 formulation materialized ~6 full-activation
        # relayouts per attention; at 308 MB of bf16 tokens per 32-clip
        # batch those HBM round-trips, not FLOPs, dominated the encoder).
        qkv = qkv.reshape(B, N, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        q = q * (hd**-0.5)

        # CLS query attends over every token (reference vit_helper.py:93-108)
        cls_q = q[:, 0]  # [B, H, hd]
        cls_scores = jnp.einsum(
            "bhd,bnhd->bhn", cls_q, k, preferred_element_type=jnp.float32
        )
        cls_p = jax.nn.softmax(cls_scores, axis=-1).astype(v.dtype)
        cls_out = jnp.einsum("bhn,bnhd->bhd", cls_p, v)  # [B, H, hd]

        qf = q[:, 1:].reshape(B, f, n, H, hd)
        kf = k[:, 1:].reshape(B, f, n, H, hd)
        vf = v[:, 1:].reshape(B, f, n, H, hd)
        cls_k, cls_v = k[:, 0], v[:, 0]  # [B, H, hd]

        use_fused = cfg.fused_divided_attention
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        if use_fused:
            # Fused Pallas path (ops/divided_attention.py): pack the many
            # small per-group attentions into MXU-shaped tiles with a
            # fused VMEM softmax — measured time-core 8.7 -> 3.7 and
            # space-core 11.0 -> 4.0 ms/clip at B=32 vs the einsum
            # formulation below (PERFORMANCE.md round 4).
            from vaura_tpu.ops.divided_attention import grouped_cls_attention

            if axis == "time":
                perm, G, L = (0, 3, 2, 1, 4), n, f  # [B, H, n, f, hd]
            else:
                perm, G, L = (0, 3, 1, 2, 4), f, n  # [B, H, f, n, hd]
            to_k = lambda tns: jnp.transpose(tns, perm).reshape(B * H, G, L, hd)
            o = grouped_cls_attention(
                to_k(qf), to_k(kf), to_k(vf),
                cls_k.reshape(B * H, 1, hd), cls_v.reshape(B * H, 1, hd),
                jax.default_backend() != "tpu",  # interpret off-TPU
            )
            o = o.reshape(B, H, G, L, hd)
            inv = (0, 3, 2, 1, 4) if axis == "time" else (0, 2, 3, 1, 4)
            out = jnp.transpose(o, inv)  # [B, f, n, H, hd]
        elif axis == "time":
            # each (spatial location n) attends over the f frames + CLS
            scores = jnp.einsum(
                "bfnhd,bgnhd->bnhfg", qf, kf,
                preferred_element_type=jnp.float32,
            )  # [B, n, H, f, f]
            sc_cls = jnp.einsum(
                "bfnhd,bhd->bnhf", qf, cls_k,
                preferred_element_type=jnp.float32,
            )[..., None]  # [B, n, H, f, 1]
            full = jnp.concatenate([sc_cls, scores], axis=-1)
            p = jax.nn.softmax(full, axis=-1)
            p_cls, p_tok = p[..., :1], p[..., 1:].astype(vf.dtype)
            out = jnp.einsum("bnhfg,bgnhd->bfnhd", p_tok, vf)
            out = out + jnp.einsum(
                "bnhf,bhd->bfnhd", p_cls[..., 0].astype(cls_v.dtype), cls_v
            )
        elif axis == "space":
            # each (frame f) attends over its n spatial locations + CLS
            scores = jnp.einsum(
                "bfnhd,bfmhd->bfhnm", qf, kf,
                preferred_element_type=jnp.float32,
            )  # [B, f, H, n, n]
            sc_cls = jnp.einsum(
                "bfnhd,bhd->bfhn", qf, cls_k,
                preferred_element_type=jnp.float32,
            )[..., None]
            full = jnp.concatenate([sc_cls, scores], axis=-1)
            p = jax.nn.softmax(full, axis=-1)
            p_cls, p_tok = p[..., :1], p[..., 1:].astype(vf.dtype)
            out = jnp.einsum("bfhnm,bfmhd->bfnhd", p_tok, vf)
            out = out + jnp.einsum(
                "bfhn,bhd->bfnhd", p_cls[..., 0].astype(cls_v.dtype), cls_v
            )
        else:
            raise ValueError(axis)

        out = out.reshape(B, f * n, D)
        out = jnp.concatenate(
            [cls_out.reshape(B, 1, D).astype(out.dtype), out], axis=1
        )
        return EncDense(cfg, D, name="proj")(out)


class Mlp(nn.Module):
    config: MotionFormerConfig
    hidden: int
    out: int

    @nn.compact
    def __call__(
        self, x: Optional[jax.Array], train: bool, return_params: bool = False
    ):
        cfg = self.config
        if return_params:
            # fused-block path: expose raw fc1/fc2 params for the Pallas
            # MLP sublayer kernel (float path only; same param tree)
            _, (w1, b1) = EncDense(cfg, self.hidden, name="fc1")(
                None, return_params=True
            )
            _, (w2, b2) = EncDense(
                cfg, self.out, in_features=self.hidden, name="fc2"
            )(None, return_params=True)
            return (w1, b1, w2, b2)
        x = EncDense(cfg, self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(cfg.drop_rate, deterministic=not train)(x)
        x = EncDense(cfg, self.out, name="fc2")(x)
        return nn.Dropout(cfg.drop_rate, deterministic=not train)(x)


class DividedSpaceTimeBlock(nn.Module):
    """Reference ``vit_helper.py:391-473``: time attn (no drop-path on its
    residual), space attn, MLP. Shaped for ``nn.scan``: per-layer drop-path
    rate arrives as the scanned input."""

    config: MotionFormerConfig

    @nn.compact
    def __call__(self, x, broadcast_in, drop_path_rate):
        cfg = self.config
        f, n, train = broadcast_in
        if isinstance(x, tuple):
            # Fused-sublayer path (inference): the carry is
            # (x_cls [B,1,D], x_tok [B,f*n,D] f-major). Each attention
            # sublayer is one Pallas kernel on group-major tokens; the
            # residual stream transposes f-major <-> n-major around the
            # time sublayer (2 XLA transposes per block). Drop-path is
            # identity here (gated on ``not train``).
            x_cls, x_tok = x
            B, D = x_tok.shape[0], cfg.embed_dim
            s3, b3 = EncLayerNorm(cfg, name="norm3")(None)
            xt = x_tok.reshape(B, f, n, D).transpose(0, 2, 1, 3)
            xt = xt.reshape(B, n * f, D)
            y_cls, y_tok = DividedAttention(cfg, name="timeattn")(
                (x_cls, xt, s3, b3), "time", f, n
            )
            y_tok = y_tok.reshape(B, n, f, D).transpose(0, 2, 1, 3)
            x_tok, x_cls = y_tok.reshape(B, f * n, D), y_cls
            s1, b1 = EncLayerNorm(cfg, name="norm1")(None)
            x_cls, x_tok = DividedAttention(cfg, name="attn")(
                (x_cls, x_tok, s1, b1), "space", f, n
            )
            ln2 = EncLayerNorm(cfg, name="norm2")
            mlp = Mlp(
                cfg, int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim,
                name="mlp",
            )
            from vaura_tpu.ops.encoder_fused import fused_mlp_sublayer

            w1, b1, w2, b2 = mlp(None, False, return_params=True)
            s2, b2n = ln2(None)
            x_tok = fused_mlp_sublayer(
                x_tok, s2, b2n, w1, b1, w2, b2,
                eps=cfg.norm_eps,
                interpret=jax.default_backend() != "tpu",
            )
            x_cls = x_cls + mlp(ln2(x_cls), False)
            return (x_cls, x_tok), drop_path_rate

        ln = lambda name: EncLayerNorm(cfg, name=name)
        time_out = DividedAttention(cfg, name="timeattn")(
            ln("norm3")(x), "time", f, n
        )
        x = x + time_out
        space_out = DividedAttention(cfg, name="attn")(ln("norm1")(x), "space", f, n)
        x = x + self._drop_path(space_out, drop_path_rate, train)
        mlp_out = Mlp(
            cfg, int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim, name="mlp"
        )(ln("norm2")(x), train)
        x = x + self._drop_path(mlp_out, drop_path_rate, train)
        return x, drop_path_rate

    def _drop_path(self, x, rate, train: bool):
        if not train or self.config.drop_path_rate == 0.0:
            return x
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep


class JointSpaceTimeBlock(nn.Module):
    """Standard pre-norm ViT block with joint space-time attention
    (reference ``vit_helper.py:47-77`` + ``Block``): one attention over all
    1 + t*hw tokens. Selected by ``attn_layer: joint``
    (``joint_224_16x4.yaml``)."""

    config: MotionFormerConfig

    @nn.compact
    def __call__(self, x, broadcast_in, drop_path_rate):
        cfg = self.config
        f, n, train = broadcast_in
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
        B, N, D = x.shape
        H, hd = cfg.num_heads, cfg.head_dim
        h = ln("norm1")(x)
        qkv = nn.Dense(
            3 * D, use_bias=cfg.qkv_bias, kernel_init=_trunc_normal(),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="attn_qkv",
        )(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        out = _masked_softmax_attn(reshape(q) * (hd**-0.5), reshape(k), reshape(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(
            D, kernel_init=_trunc_normal(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="attn_proj",
        )(out)
        x = x + self._drop_path(out, drop_path_rate, train)
        mlp_out = Mlp(
            cfg, int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim, name="mlp"
        )(ln("norm2")(x), train)
        x = x + self._drop_path(mlp_out, drop_path_rate, train)
        return x, drop_path_rate

    _drop_path = DividedSpaceTimeBlock._drop_path


class TrajectoryBlock(nn.Module):
    """Pre-norm ViT block with trajectory attention (reference
    ``vit_helper.py:174-313``; selected by ``attn_layer: trajectory`` as in
    ``motionformer_224_16x4.yaml``). Two-step attention: (1) a spatial
    step forms, for every query token, one attention-aggregated
    "trajectory point" per frame (optionally approximated —
    ``approx_attn_type``: nystrom / orthoformer / performer, see
    ``vaura_tpu.ops.trajectory_attention``); (2) a temporal step attends
    along each token's trajectory, querying with its own-frame point. The
    CLS token attends globally. With ``use_original_code`` the temporal
    values are the raw trajectory points (the reference keeps this
    behavior for checkpoint replication, ``vit_helper.py:196-200``)."""

    config: MotionFormerConfig

    @nn.compact
    def __call__(self, x, broadcast_in, drop_path_rate):
        from vaura_tpu.ops.trajectory_attention import (
            nystrom_spatial_attn,
            orthoformer,
            performer_spatial_attn,
            trajectory_spatial_full,
        )

        cfg = self.config
        f, n, train = broadcast_in
        B, N1, D = x.shape  # N1 = 1 + f*n
        N = f * n
        H, hd = cfg.num_heads, cfg.head_dim
        scale = hd**-0.5
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name,
        )
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=cfg.qkv_bias, kernel_init=_trunc_normal(),
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name,
        )

        h = ln("norm1")(x)
        qkv = dense(3 * D, "attn_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_heads = lambda t_: t_.reshape(B, N1, H, hd).transpose(0, 2, 1, 3)
        q, k, v = map(to_heads, (q, k, v))  # [B, H, N1, hd]

        # CLS query attends over every key (reference vit_helper.py:219-221)
        cls_scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q[:, :, :1] * scale, k,
            preferred_element_type=jnp.float32,
        )
        cls_probs = jax.nn.softmax(cls_scores, axis=-1)
        cls_out = jnp.einsum(
            "bhqk,bhkd->bhqd", cls_probs.astype(v.dtype), v
        ).transpose(0, 2, 1, 3).reshape(B, 1, D)

        # spatial (trajectory-formation) step on non-CLS tokens, heads folded
        fold = lambda t_: t_[:, :, 1:].reshape(B * H, N, hd)
        qs, ks, vs = map(fold, (q, k, v))
        if cfg.approx_attn_type == "nystrom":
            traj = nystrom_spatial_attn(
                qs, ks, vs, landmarks=cfg.approx_attn_dim, num_frames=f
            )
        elif cfg.approx_attn_type == "orthoformer":
            traj = orthoformer(
                qs, ks, vs, num_landmarks=cfg.approx_attn_dim, num_frames=f
            )
        elif cfg.approx_attn_type == "performer":
            traj = performer_spatial_attn(
                qs, ks, vs, num_frames=f, num_features=cfg.approx_attn_dim
            )
        else:
            traj = trajectory_spatial_full(qs, ks, vs, num_frames=f)
        # [B*H, N, f, hd] -> merged-head trajectory points [B, N, f, D]
        traj_h = traj.reshape(B, H, N, f, hd)
        x_traj = traj_h.transpose(0, 2, 3, 1, 4).reshape(B, N, f, D)

        # temporal step: token (fi, p) queries with its own-frame point
        x_diag = jnp.diagonal(
            x_traj.reshape(B, f, n, f, D), axis1=1, axis2=3
        )  # [B, n, D, f]
        x_diag = x_diag.transpose(0, 3, 1, 2).reshape(B, N, D)
        q2 = dense(D, "attn_proj_q")(x_diag)
        k2, v2 = jnp.split(dense(2 * D, "attn_proj_kv")(x_traj), 2, axis=-1)
        q2 = q2.reshape(B, N, H, hd).transpose(0, 2, 1, 3) * scale
        heads5 = lambda t_: t_.reshape(B, N, f, H, hd).transpose(0, 3, 1, 2, 4)
        k2 = heads5(k2)
        t_scores = jnp.einsum(
            "bhnd,bhnfd->bhnf", q2, k2, preferred_element_type=jnp.float32
        )
        t_probs = jax.nn.softmax(t_scores, axis=-1)
        t_vals = traj_h if cfg.use_original_code else heads5(v2)
        out = jnp.einsum(
            "bhnf,bhnfd->bhnd", t_probs.astype(t_vals.dtype), t_vals
        ).transpose(0, 2, 1, 3).reshape(B, N, D)

        out = jnp.concatenate([cls_out, out], axis=1)
        out = nn.Dense(
            D, kernel_init=_trunc_normal(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="attn_proj",
        )(out)
        out = nn.Dropout(cfg.drop_rate, deterministic=not train)(out)
        x = x + self._drop_path(out, drop_path_rate, train)
        mlp_out = Mlp(
            cfg, int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim, name="mlp"
        )(ln("norm2")(x), train)
        x = x + self._drop_path(mlp_out, drop_path_rate, train)
        return x, drop_path_rate

    _drop_path = DividedSpaceTimeBlock._drop_path


class SpatialAggregationLayer(nn.Module):
    """CLS-token transformer encoder layer aggregating the 196 spatial
    tokens of each frame into one 768-d vector (reference
    ``motionformer.py:367-497``, a ``nn.TransformerEncoderLayer`` with
    ``norm_first=True``, GELU, ffn = mlp_ratio * d). With ``add_pos_emb``
    it doubles as the reference's temporal/global aggregation layer
    (``BaseEncoderLayer``'s positional-embedding mode,
    ``motionformer.py:377-440``)."""

    config: MotionFormerConfig
    add_pos_emb: bool = False
    pos_max_len: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # x: [Bt, N, D] -> [Bt, D] (CLS output)
        cfg = self.config
        D, H, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
        Bt, N, _ = x.shape
        cls = self.param("cls_token", _trunc_normal(), (1, 1, D), cfg.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (Bt, 1, D)), x], axis=1
        )
        if self.add_pos_emb:
            assert N + 1 <= 1 + self.pos_max_len, (N, self.pos_max_len)
            pos = self.param(
                "pos_emb", _trunc_normal(), (1, 1 + self.pos_max_len, D),
                cfg.param_dtype,
            )
            x = x + pos[:, : N + 1].astype(x.dtype)
            x = nn.Dropout(cfg.drop_rate, deterministic=not train)(x)
        # --- self-attention sublayer (pre-norm) ---
        h = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="norm1",
        )(x)
        qkv = nn.Dense(
            3 * D, kernel_init=_trunc_normal(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="in_proj",
        )(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(Bt, N + 1, H, hd).transpose(0, 2, 1, 3)
        attn = _masked_softmax_attn(reshape(q) * (hd**-0.5), reshape(k), reshape(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(Bt, N + 1, D)
        attn = nn.Dense(
            D, kernel_init=_trunc_normal(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="out_proj",
        )(attn)
        x = x + nn.Dropout(cfg.drop_rate, deterministic=not train)(attn)
        # --- feedforward sublayer (pre-norm) ---
        h = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="norm2",
        )(x)
        h = nn.Dense(
            cfg.mlp_ratio * D, kernel_init=_trunc_normal(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="linear1",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(cfg.drop_rate, deterministic=not train)(h)
        h = nn.Dense(
            D, kernel_init=_trunc_normal(), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="linear2",
        )(h)
        x = x + nn.Dropout(cfg.drop_rate, deterministic=not train)(h)
        return x[:, 0]


class MotionFormer(nn.Module):
    """Divided space-time ViT feature extractor.

    ``__call__(frames)`` takes ``[B, S, C, T, H, W]`` (reference torch
    layout) and returns ``(features, global_repr)`` with features
    ``[B, S, t, D]`` (t=8) — matching reference ``motionformer.py:252-303``.
    """

    config: MotionFormerConfig

    @nn.compact
    def __call__(
        self, frames: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        cfg = self.config
        B, S, C, T, H, W = frames.shape
        t = T // cfg.z_block_size
        hw = cfg.num_spatial_patches
        x = frames.reshape(B * S, C, T, H, W).transpose(0, 2, 3, 4, 1)  # NTHWC
        x = x.astype(cfg.dtype)
        # 3D patch embed (torch flatten order: t-major, then h, w)
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.z_block_size, cfg.patch_size, cfg.patch_size),
            strides=(cfg.z_block_size, cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="patch_embed_3d",
        )(x)
        x = x.reshape(B * S, t * hw, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", _trunc_normal(), (1, 1, cfg.embed_dim), cfg.param_dtype
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (B * S, 1, cfg.embed_dim)), x],
            axis=1,
        )

        pos_embed = self.param(
            "pos_embed", _trunc_normal(), (1, hw + 1, cfg.embed_dim), cfg.param_dtype
        )
        if cfg.pos_embed_type == "separate":
            temp_embed = self.param(
                "temp_embed",
                nn.initializers.zeros,
                (1, cfg.temporal_resolution, cfg.embed_dim),
                cfg.param_dtype,
            )
            tile_pos = jnp.tile(pos_embed[:, 1:], (1, cfg.temporal_resolution, 1))
            tile_temp = jnp.repeat(temp_embed, hw, axis=1)
            total = jnp.concatenate([pos_embed[:, :1], tile_pos + tile_temp], axis=1)
        else:  # joint
            total = self.param(
                "st_embed",
                _trunc_normal(),
                (1, cfg.num_patches + 1, cfg.embed_dim),
                cfg.param_dtype,
            )
        x = x + total.astype(x.dtype)
        x = nn.Dropout(cfg.drop_rate, deterministic=not train)(x)

        dpr = jnp.asarray(
            np.linspace(0.0, cfg.drop_path_rate, cfg.depth), dtype=jnp.float32
        )
        block_cls = {
            "joint": JointSpaceTimeBlock,
            "trajectory": TrajectoryBlock,
        }.get(cfg.attn_layer, DividedSpaceTimeBlock)
        blocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
            length=cfg.depth,
        )(cfg, name="blocks")
        use_fused_block = cfg.fused_encoder_block
        if use_fused_block is None:
            use_fused_block = jax.default_backend() == "tpu"
        from vaura_tpu.ops.encoder_fused import _MAX_ROWS

        use_fused_block = (
            use_fused_block
            and cfg.attn_layer == "divided"
            and not cfg.quantize
            and not train
            # kernel shape contract (ops/encoder_fused.py): lane-divisible
            # embed dim, head dim dividing a 128-lane slab, and a hidden
            # dim that slabs into D-wide chunks — odd/tiny configs fall
            # back to the einsum path instead of raising
            and cfg.embed_dim % 128 == 0
            and 128 % (cfg.embed_dim // cfg.num_heads) == 0
            and int(cfg.embed_dim * cfg.mlp_ratio) % cfg.embed_dim == 0
            # VMEM pack contract: each attention group (L=t on the time
            # axis, L=hw on the space axis) must fit one grid cell's
            # [R, R] f32 score buffer — at img_size=384 hw=576 > 512
            # and no legal pack exists, so fall back instead of letting
            # _pick_pack raise at trace time
            and t <= _MAX_ROWS
            and hw <= _MAX_ROWS
        )
        if use_fused_block:
            # CLS carried as a separate [B,1,D] array so the fused
            # sublayer kernels see Mosaic-legal token packs; the final
            # feature path drops CLS anyway (x[:, 1:] below).
            (_, x), _ = blocks((x[:, :1], x[:, 1:]), (t, hw, train), dpr)
        else:
            x, _ = blocks(x, (t, hw, train), dpr)
            x = x[:, 1:]

        # feature extraction: CLS already dropped above, then norm
        # (reference motionformer.py:317-321)
        x = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="norm",
        )(x)

        if not cfg.factorize_space_time:
            return x.reshape(B, S, t * hw, cfg.embed_dim), None

        # restore (t, h*w) and aggregate space per frame
        x = x.reshape(B * S, t, hw, cfg.embed_dim)
        if cfg.agg_space_module == "TransformerEncoderLayer":
            x = x.reshape(B * S * t, hw, cfg.embed_dim)
            x = SpatialAggregationLayer(cfg, name="spatial_attn_agg")(x, train)
            x = x.reshape(B * S, t, cfg.embed_dim)
        else:  # AveragePooling
            x = jnp.mean(x, axis=2)

        if cfg.agg_time_module == "TransformerEncoderLayer":
            # (B*S, t, D) -> (B*S, D): CLS-token encoder layer over time
            # (reference TemporalTransformerEncoderLayer, motionformer.py:494-510)
            x = SpatialAggregationLayer(cfg, name="temp_attn_agg")(x, train)
        elif cfg.agg_time_module == "AveragePooling":
            x = jnp.mean(x, axis=1)

        feats = x.reshape(B, S, *x.shape[1:])
        global_repr = None
        if cfg.add_global_repr and feats.ndim == 3:
            # aggregate segments into one clip-level vector (reference
            # motionformer.py:200-216, 294-301): CLS encoder layer with a
            # positional embedding over segments, or mean pooling
            if cfg.agg_segments_module == "AveragePooling":
                global_repr = jnp.mean(feats, axis=1)
            else:
                global_repr = SpatialAggregationLayer(
                    cfg,
                    add_pos_emb=True,
                    pos_max_len=cfg.max_segments,
                    name="global_attn_agg",
                )(feats, train)
        return feats, global_repr
