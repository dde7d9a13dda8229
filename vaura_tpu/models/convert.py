"""torch -> JAX checkpoint converters.

Converts the reference ecosystem's torch checkpoints into this framework's
parameter pytrees:

  * ``convert_dac_state_dict`` — descript-audio-codec weights (weight-norm
    convs folded; reference consumes the pip package,
    ``models/modules/dac/model.py``).
  * ``convert_motionformer_state_dict`` — Motionformer / Synchformer
    stage-I (AVCLIP) weights incl. the ``v_encoder.`` prefix surgery
    (reference ``motionformer.py:217-241``).
  * ``convert_sampler_state_dict`` — the reference AR decoder
    (``llama.py``) into the scanned/stacked layout.
  * ``convert_vaura_checkpoint`` — a full reference Lightning ``.ckpt``
    into ``{sampler, dac, encoder}`` subtrees.

Layout conventions: torch ``Linear.weight`` [out, in] -> flax ``kernel``
[in, out]; torch ``Conv1d.weight`` [O, I, W] -> channels-last kernel
[W, I, O]; torch ``ConvTranspose1d.weight`` [I, O, W] -> [W, I, O]
(gradient-kernel layout, see ``dac/layers.py``). Weight-norm
(``weight_g``/``weight_v``) is folded: ``W = g * v / ||v||``.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _fold_wn(sd: Dict[str, Any], prefix: str) -> np.ndarray:
    """Fold weight-norm params at ``prefix`` into a single weight."""
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])
        g = _np(sd[f"{prefix}.weight_g"])
        norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        return g * v / (norm + 1e-12)
    # parametrize-style weight norm
    if f"{prefix}.parametrizations.weight.original1" in sd:
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        return g * v / (norm + 1e-12)
    return _np(sd[f"{prefix}.weight"])


def _conv1d(sd, prefix) -> Dict[str, Any]:
    """torch WNConv1d -> {conv: {kernel [W,I,O], bias}}."""
    W = _fold_wn(sd, prefix)  # [O, I, W]
    out = {"kernel": W.transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return {"conv": out}


def _convT1d(sd, prefix) -> Dict[str, Any]:
    """torch WNConvTranspose1d [I, O, W] -> {kernel [W, I, O], bias}."""
    W = _fold_wn(sd, prefix)
    return {
        "kernel": W.transpose(2, 0, 1),
        "bias": _np(sd.get(f"{prefix}.bias", np.zeros(W.shape[1], np.float32))),
    }


def _snake(sd, prefix) -> Dict[str, Any]:
    return {"alpha": _np(sd[f"{prefix}.alpha"]).reshape(-1)}


def _res_unit(sd, prefix) -> Dict[str, Any]:
    # DAC ResidualUnit: block.0 Snake, block.1 WNConv1d(k7), block.2 Snake,
    # block.3 WNConv1d(k1)
    return {
        "snake1": _snake(sd, f"{prefix}.block.0"),
        "conv1": _conv1d(sd, f"{prefix}.block.1"),
        "snake2": _snake(sd, f"{prefix}.block.2"),
        "conv2": _conv1d(sd, f"{prefix}.block.3"),
    }


def convert_dac_state_dict(sd: Dict[str, Any],
                           n_enc_blocks: Optional[int] = None,
                           n_dec_blocks: Optional[int] = None,
                           n_codebooks: Optional[int] = None) -> Dict[str, Any]:
    """descript-audio-codec state dict -> ``Dac`` params. Block/codebook
    counts default to what the key set encodes (encoder.block.N spans
    conv_in + blocks + snake + conv_out, so blocks = N_max - 2)."""
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k: v
          for k, v in sd.items()}
    if n_enc_blocks is None:
        n_enc_blocks = _max_index(sd, "encoder.block.") - 3
    if n_dec_blocks is None:
        n_dec_blocks = _max_index(sd, "decoder.model.") - 3
    if n_codebooks is None:
        n_codebooks = _max_index(sd, "quantizer.quantizers.")
    enc: Dict[str, Any] = {"conv_in": _conv1d(sd, "encoder.block.0")}
    for i in range(n_enc_blocks):
        p = f"encoder.block.{i + 1}.block"
        enc[f"block{i}"] = {
            "res1": _res_unit(sd, f"{p}.0"),
            "res2": _res_unit(sd, f"{p}.1"),
            "res3": _res_unit(sd, f"{p}.2"),
            "snake": _snake(sd, f"{p}.3"),
            "down": _conv1d(sd, f"{p}.4"),
        }
    enc["snake_out"] = _snake(sd, f"encoder.block.{n_enc_blocks + 1}")
    enc["conv_out"] = _conv1d(sd, f"encoder.block.{n_enc_blocks + 2}")

    dec: Dict[str, Any] = {"conv_in": _conv1d(sd, "decoder.model.0")}
    for i in range(n_dec_blocks):
        p = f"decoder.model.{i + 1}.block"
        dec[f"block{i}"] = {
            "snake": _snake(sd, f"{p}.0"),
            "up": _convT1d(sd, f"{p}.1"),
            "res1": _res_unit(sd, f"{p}.2"),
            "res2": _res_unit(sd, f"{p}.3"),
            "res3": _res_unit(sd, f"{p}.4"),
        }
    dec["snake_out"] = _snake(sd, f"decoder.model.{n_dec_blocks + 1}")
    dec["conv_out"] = _conv1d(sd, f"decoder.model.{n_dec_blocks + 2}")

    codebooks, in_w, in_b, out_w, out_b = [], [], [], [], []
    for k in range(n_codebooks):
        p = f"quantizer.quantizers.{k}"
        codebooks.append(_np(sd[f"{p}.codebook.weight"]))  # [V, cd]
        Wi = _fold_wn(sd, f"{p}.in_proj")[:, :, 0]  # [cd, D]
        in_w.append(Wi.T)  # [D, cd]
        in_b.append(_np(sd[f"{p}.in_proj.bias"]))
        Wo = _fold_wn(sd, f"{p}.out_proj")[:, :, 0]  # [D, cd]
        out_w.append(Wo.T)  # [cd, D]
        out_b.append(_np(sd[f"{p}.out_proj.bias"]))
    quant = {
        "codebooks": np.stack(codebooks),
        "in_proj_w": np.stack(in_w),
        "in_proj_b": np.stack(in_b),
        "out_proj_w": np.stack(out_w),
        "out_proj_b": np.stack(out_b),
    }
    return {"encoder": enc, "quantizer": quant, "decoder": dec}


# ------------------------------------------------------------------ #
# MotionFormer
# ------------------------------------------------------------------ #
def _linear(sd, prefix) -> Dict[str, Any]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix) -> Dict[str, Any]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def strip_avclip_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only the visual branch of a Synchformer stage-I (AVCLIP) ckpt
    (reference ``motionformer.py:217-241``)."""
    out = {}
    for k, v in sd.items():
        if k.startswith(("module.v_encoder.", "v_encoder.")):
            out[k.replace("module.", "").replace("v_encoder.", "")] = v
    return out if out else sd


def convert_motionformer_state_dict(
    sd: Dict[str, Any], depth: Optional[int] = None
) -> Dict[str, Any]:
    """Motionformer/Synchformer visual encoder -> ``MotionFormer`` params
    (scanned/stacked blocks). ``depth`` defaults to the block count the
    key set encodes."""
    if depth is None:
        depth = _max_index(sd, "blocks.")
    params: Dict[str, Any] = {}
    pe = _np(sd["patch_embed_3d.proj.weight"])  # [D, C, z, p, p]
    params["patch_embed_3d"] = {
        "kernel": pe.transpose(2, 3, 4, 1, 0),
        "bias": _np(sd["patch_embed_3d.proj.bias"]),
    }
    params["cls_token"] = _np(sd["cls_token"])
    params["pos_embed"] = _np(sd["pos_embed"])
    if "temp_embed" in sd:
        params["temp_embed"] = _np(sd["temp_embed"])
    if "st_embed" in sd:
        params["st_embed"] = _np(sd["st_embed"])

    def stack(fn):
        return {
            key: np.stack([layer[key] for layer in fn])
            for key in fn[0]
        }

    # detect the block variant from the torch key layout:
    # trajectory (vit_helper.py:174) has attn.proj_q/proj_kv; divided
    # (vit_helper.py:392) has a separate timeattn; joint has neither
    if "blocks.0.attn.proj_q.weight" in sd:

        def block_tree(i: int) -> Dict[str, Any]:
            p = f"blocks.{i}"
            return {
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "attn_qkv": _linear(sd, f"{p}.attn.qkv"),
                "attn_proj_q": _linear(sd, f"{p}.attn.proj_q"),
                "attn_proj_kv": _linear(sd, f"{p}.attn.proj_kv"),
                "attn_proj": _linear(sd, f"{p}.attn.proj"),
                "mlp": {
                    "fc1": _linear(sd, f"{p}.mlp.fc1"),
                    "fc2": _linear(sd, f"{p}.mlp.fc2"),
                },
            }

    elif "blocks.0.timeattn.qkv.weight" in sd:

        def block_tree(i: int) -> Dict[str, Any]:
            p = f"blocks.{i}"
            return {
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "norm3": _layernorm(sd, f"{p}.norm3"),
                "attn": {
                    "qkv": _linear(sd, f"{p}.attn.qkv"),
                    "proj": _linear(sd, f"{p}.attn.proj"),
                },
                "timeattn": {
                    "qkv": _linear(sd, f"{p}.timeattn.qkv"),
                    "proj": _linear(sd, f"{p}.timeattn.proj"),
                },
                "mlp": {
                    "fc1": _linear(sd, f"{p}.mlp.fc1"),
                    "fc2": _linear(sd, f"{p}.mlp.fc2"),
                },
            }

    else:  # joint space-time attention

        def block_tree(i: int) -> Dict[str, Any]:
            p = f"blocks.{i}"
            return {
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "attn_qkv": _linear(sd, f"{p}.attn.qkv"),
                "attn_proj": _linear(sd, f"{p}.attn.proj"),
                "mlp": {
                    "fc1": _linear(sd, f"{p}.mlp.fc1"),
                    "fc2": _linear(sd, f"{p}.mlp.fc2"),
                },
            }

    import jax

    blocks = [block_tree(i) for i in range(depth)]
    params["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
    params["norm"] = _layernorm(sd, "norm")

    # CLS-token aggregation layers (reference BaseEncoderLayer,
    # motionformer.py:367-462): spatial (per-frame), temporal (per-segment)
    # and global (over segments, with positional embedding) share one layout
    def _agg_layer(p: str) -> Dict[str, Any]:
        out = {
            "cls_token": _np(sd[f"{p}.cls_token"]),
            "in_proj": {
                "kernel": _np(sd[f"{p}.self_attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{p}.self_attn.in_proj_bias"]),
            },
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
        if f"{p}.pos_emb" in sd:
            out["pos_emb"] = _np(sd[f"{p}.pos_emb"])
        return out

    for agg in ("spatial_attn_agg", "temp_attn_agg", "global_attn_agg"):
        if f"{agg}.cls_token" in sd:
            params[agg] = _agg_layer(agg)
    return params


# ------------------------------------------------------------------ #
# AR sampler
# ------------------------------------------------------------------ #
def convert_sampler_state_dict(
    sd: Dict[str, Any], num_layers: int = 24, num_codebooks: int = 9,
    vocab: int = 1024,
) -> Dict[str, Any]:
    """Reference ``Transformer`` (llama.py) weights -> ``Sampler`` params
    (fused LM head, stacked scanned layers, factored DAC embeddings)."""
    params: Dict[str, Any] = {}
    params["cls_embeddings"] = {
        "fc1": {"kernel": _np(sd["cls_embeddings.projection.fc1.weight"]).T},
        "fc2": {"kernel": _np(sd["cls_embeddings.projection.fc2.weight"]).T},
        "uncond_embedding": _np(sd["cls_embeddings.uncond_embedding"]),
    }
    params["empty_video_emb"] = _np(sd["empty_video_emb"]).reshape(-1)

    # factored token embeddings (DacEmbeddingProjection per codebook)
    embs, pv, pg, pb = [], [], [], []
    for k in range(num_codebooks):
        p = f"tok_embeddings.{k}"
        embs.append(_np(sd[f"{p}.emb.weight"]))  # [V+1, cd]
        if f"{p}.out_proj.weight_v" in sd or f"{p}.out_proj.weight" in sd:
            v = (
                _np(sd[f"{p}.out_proj.weight_v"])
                if f"{p}.out_proj.weight_v" in sd
                else _np(sd[f"{p}.out_proj.weight"])
            )  # [D, cd, 1]
            g = (
                _np(sd[f"{p}.out_proj.weight_g"]).reshape(-1, 1, 1)
                if f"{p}.out_proj.weight_g" in sd
                else np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
            )
            pv.append(v[:, :, 0])
            pg.append(g[:, :, 0])
            pb.append(_np(sd[f"{p}.out_proj.bias"]))
    params["tok_embeddings"] = {
        "emb": np.concatenate(embs, axis=0),
        "proj_v": np.stack(pv),
        "proj_g": np.stack(pg),
        "proj_b": np.stack(pb),
    }

    def layer_tree(i: int) -> Dict[str, Any]:
        p = f"layers.{i}"
        return {
            "attention": {
                "wqkv": {"kernel": _np(sd[f"{p}.attention.wqkv.weight"]).T},
                "wo": {"kernel": _np(sd[f"{p}.attention.wo.weight"]).T},
            },
            "feed_forward": {
                "w1": {"kernel": _np(sd[f"{p}.feed_forward.w1.weight"]).T},
                "w2": {"kernel": _np(sd[f"{p}.feed_forward.w2.weight"]).T},
                "w3": {"kernel": _np(sd[f"{p}.feed_forward.w3.weight"]).T},
            },
            "attention_norm": {"weight": _np(sd[f"{p}.attention_norm.weight"])},
            "ffn_norm": {"weight": _np(sd[f"{p}.ffn_norm.weight"])},
        }

    import jax

    layers = [layer_tree(i) for i in range(num_layers)]
    params["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    params["norm"] = {"weight": _np(sd["norm.weight"])}

    heads = [
        _np(sd[f"lm_heads.{k}.weight"]).T for k in range(num_codebooks)
    ]  # each [d_model, vocab]
    params["lm_head"] = {"kernel": np.concatenate(heads, axis=1)}
    return params


# ------------------------------------------------------------------ #
# full V-AURA Lightning checkpoint
# ------------------------------------------------------------------ #
def _max_index(sd: Dict[str, Any], prefix: str) -> int:
    """1 + highest integer following ``prefix`` in the key set (0 if none)."""
    best = -1
    plen = len(prefix)
    for k in sd:
        if k.startswith(prefix):
            head = k[plen:].split(".", 1)[0]
            if head.isdigit():
                best = max(best, int(head))
    return best + 1


def infer_sampler_dims(sd: Dict[str, Any]) -> Dict[str, int]:
    """Read layer/codebook counts off a reference ``Transformer`` state
    dict so converter callers don't have to know them up front."""
    return {
        "num_layers": _max_index(sd, "layers."),
        "num_codebooks": _max_index(sd, "lm_heads."),
    }


def convert_vaura_checkpoint(
    ckpt_path: str,
    num_layers: Optional[int] = None,
    num_codebooks: Optional[int] = None,
    encoder_depth: Optional[int] = None,
) -> Dict[str, Any]:
    """Reference ``VAURAModel`` Lightning .ckpt -> {sampler, dac, encoder}
    param subtrees (frozen submodules were serialized inside the ckpt —
    the reference's FIXME at ``vaura_model.py:61`` works in our favor
    here). Layer/codebook/depth counts default to what the state dict
    itself encodes."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)

    def sub(prefix: str) -> Dict[str, Any]:
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

    out: Dict[str, Any] = {}
    sampler_sd = sub("sampler.")
    if sampler_sd:
        dims = infer_sampler_dims(sampler_sd)
        out["sampler"] = convert_sampler_state_dict(
            sampler_sd,
            num_layers=num_layers or dims["num_layers"],
            num_codebooks=num_codebooks or dims["num_codebooks"],
        )
        num_codebooks = num_codebooks or dims["num_codebooks"]
    dac_sd = sub("audio_encoder.model.")
    if dac_sd:
        out["dac"] = convert_dac_state_dict(dac_sd, n_codebooks=num_codebooks)
    enc_sd = sub("visual_feature_extractor.")
    if enc_sd:
        # depth=None lets the callee run its own blocks.-key inference
        out["encoder"] = convert_motionformer_state_dict(
            enc_sd, depth=encoder_depth
        )
    return out
