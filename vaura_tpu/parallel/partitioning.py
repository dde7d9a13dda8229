"""Parameter partitioning rules (NamedSharding over the mesh).

Path-pattern -> PartitionSpec rules for the V-AURA parameter pytrees. The
decoder's blocks are scanned with stacked parameters, so every block param
carries a leading ``layers`` axis that is never sharded; the contracting /
output feature axes map onto ``fsdp`` (ZeRO-style) and ``model`` (TP, over
attention heads / FFN hidden), following the megatron layout: column-split
the up-projections (wqkv, w1/w3), row-split the down-projections (wo, w2)
so each block needs one all-reduce per sublayer.

The 694M-param decoder (SURVEY.md §6) fits one v5e chip in bf16 but not
with AdamW state in f32 — hence fsdp sharding of params+optimizer is the
default scale-out for training (SURVEY.md §2.5 build target).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over "/"-joined param path, spec builder given param ndim)
# Specs are written for the *trailing* dims; a leading scan ("layers") axis
# is padded with None automatically based on ndim.
_RULES: Tuple[Tuple[str, Tuple[Optional[str], ...]], ...] = (
    # --- sampler decoder blocks (stacked: leading layers axis) ---
    (r"layers/.*attention/wqkv/kernel", ("fsdp", "model")),
    (r"layers/.*attention/wo/kernel", ("model", "fsdp")),
    (r"layers/.*feed_forward/w1/kernel", ("fsdp", "model")),
    (r"layers/.*feed_forward/w3/kernel", ("fsdp", "model")),
    (r"layers/.*feed_forward/w2/kernel", ("model", "fsdp")),
    (r"layers/.*norm/weight", (None,)),
    # --- embeddings & heads ---
    (r"lm_head/kernel", ("fsdp", "model")),
    (r"tok_embeddings/emb", (None, None)),
    (r"tok_embeddings/proj_v", (None, "model", None)),
    (r"tok_embeddings/proj_g", (None, "model", None)),
    (r"tok_embeddings/proj_b", (None, "model")),
    (r"cls_embeddings/.*/kernel", (None, "model")),
    # --- visual encoder (ViT) blocks + CLS aggregation layers
    # (spatial_attn_agg / temp_attn_agg / global_attn_agg share the
    # encoder-layer shape; caught replicated by test_flagship_sharding) ---
    (r"(blocks|attn_agg)/.*(qkv|fc1|in_proj|linear1)/kernel", ("fsdp", "model")),
    # trajectory attention temporal-step projections (column-split)
    (r"blocks/.*attn_proj_(q|kv)/kernel", ("fsdp", "model")),
    (r"(blocks|attn_agg)/.*(proj|fc2|out_proj|linear2)/kernel", ("model", "fsdp")),
    (r"patch_embed_3d/kernel", (None, None, None, None, "model")),
    # --- DAC codec: small convs, replicate ---
    (r"(dac|encoder_dac)/.*", ()),
)


def spec_for(path: str, ndim: int) -> P:
    for pattern, axes in _RULES:
        if re.search(pattern, path):
            if not axes:
                return P()
            axes = tuple(axes)
            if len(axes) < ndim:
                axes = (None,) * (ndim - len(axes)) + axes
            elif len(axes) > ndim:
                axes = axes[-ndim:]
            return P(*axes)
    return P()  # replicate by default


def param_specs(params: Any) -> Any:
    flat = flatten_dict(params)
    out = {k: spec_for("/".join(map(str, k)), v.ndim) for k, v in flat.items()}
    return unflatten_dict(out)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Device-put params with their NamedShardings (use under the mesh)."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
