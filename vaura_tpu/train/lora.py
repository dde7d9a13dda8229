"""LoRA adapters for finetuning (functional weight-merge design).

The reference carries vestigial LoRA kwargs that its model ignores
(``scripts/test.py:63-65`` passes ``lora_finetune_feature_extractor`` /
``lora_target_modules`` / ``lora_rank`` into a ``VAURAModel.__init__``
that doesn't accept them — the ``test`` action crashes). Here LoRA is
implemented properly, TPU-first:

* adapters are a *separate pytree* ``{path: {"a": [..., in, r],
  "b": [..., r, out]}}`` mirroring the selected sampler kernels — the
  model code is untouched;
* the merge ``W' = W + (alpha/r) * a @ b`` happens functionally at the
  entry of ``train_forward``/``generate`` under jit, so gradients flow to
  the adapters while the base weights ride in the frozen tree (never
  touched by the optimizer, never checkpointed per-run);
* scanned/stacked decoder kernels ``[L, in, out]`` get per-layer adapters
  ``[L, in, r] x [L, r, out]`` via one batched einsum.

Standard LoRA init (Hu et al. 2021): ``a`` gaussian, ``b`` zero — the
merged model equals the base model at step 0.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

DEFAULT_TARGETS: Tuple[str, ...] = ("wqkv", "wo", "w1", "w2", "w3")


def lora_target_paths(
    sampler_params: Dict[str, Any], targets: Sequence[str]
) -> Dict[tuple, Any]:
    """Flat ``{path: kernel}`` of the sampler kernels LoRA attaches to:
    a param named ``kernel`` whose parent module is in ``targets``
    (e.g. ``layers/attention/wqkv/kernel``), or ``lm_head`` if listed."""
    out = {}
    for path, leaf in flatten_dict(sampler_params).items():
        if path[-1] != "kernel" or len(path) < 2:
            continue
        if path[-2] in targets:
            assert leaf.ndim in (2, 3), (path, leaf.shape)
            out[path] = leaf
    return out


def init_lora(
    rng: jax.Array,
    sampler_params: Dict[str, Any],
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    init_std: float = 0.02,
) -> Dict[str, Any]:
    """Adapter pytree mirroring the selected kernels (a: gaussian,
    b: zeros -> zero delta at init)."""
    assert rank > 0
    sel = lora_target_paths(sampler_params, targets)
    assert sel, f"no LoRA targets matched {targets!r}"
    flat = {}
    for i, (path, leaf) in enumerate(sorted(sel.items())):
        *lead, d_in, d_out = leaf.shape
        a = jax.random.normal(
            jax.random.fold_in(rng, i), (*lead, d_in, rank), jnp.float32
        ) * init_std
        b = jnp.zeros((*lead, rank, d_out), jnp.float32)
        flat[path[:-1] + ("lora_a",)] = a
        flat[path[:-1] + ("lora_b",)] = b
    return unflatten_dict(flat)


def merge_lora(
    sampler_params: Dict[str, Any],
    lora: Dict[str, Any],
    alpha: float | None = None,
) -> Dict[str, Any]:
    """``W + (alpha/r) * a @ b`` for every adapted kernel (einsum batches
    the stacked layers axis). ``alpha`` defaults to the rank (scale 1)."""
    flat = dict(flatten_dict(sampler_params))
    for path, leaf in flatten_dict(lora).items():
        if path[-1] != "lora_a":
            continue
        a = leaf
        b = flatten_dict(lora)[path[:-1] + ("lora_b",)]
        kpath = path[:-1] + ("kernel",)
        W = flat[kpath]
        assert W.ndim == a.ndim, (kpath, W.shape, a.shape)
        rank = a.shape[-1]
        scale = (alpha if alpha is not None else float(rank)) / float(rank)
        spec = "lir,lro->lio" if a.ndim == 3 else "ir,ro->io"
        delta = jnp.einsum(spec, a, b) * scale
        flat[kpath] = (W + delta.astype(W.dtype)).astype(W.dtype)
    return unflatten_dict(flat)


def count_lora_params(lora: Dict[str, Any]) -> int:
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(lora)))
