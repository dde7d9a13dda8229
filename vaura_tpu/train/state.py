"""Train state and optimizer assembly.

Mirrors the reference's optimizer recipe
(``VAURAModel._configure_sampler_optimizers``, ``vaura_model.py:599-616``):
AdamW with configurable betas where parameters of rank >= 2 receive weight
decay and rank < 2 (biases, norms) do not; gradient clipping by value
(``configs/vaura_defaults.yaml:55-57``); step-interval LR schedules.

Frozen leaves (the reference's registered buffers, e.g. the CFG
``uncond_embedding``, ``llama.py:113-117``) get zeroed updates via an optax
mask so they ride in the param pytree for checkpointing but never train.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

FROZEN_LEAF_NAMES = ("uncond_embedding",)


def param_labels(params) -> Any:
    """Label each leaf: ``decay`` (rank >= 2, reference
    ``vaura_model.py:606-609``), ``nodecay`` (biases/norms), or ``frozen``
    (registered-buffer equivalents)."""
    flat = flatten_dict(params)
    out = {}
    for k, v in flat.items():
        if k[-1] in FROZEN_LEAF_NAMES:
            out[k] = "frozen"
        elif getattr(v, "ndim", 0) >= 2:
            out[k] = "decay"
        else:
            out[k] = "nodecay"
    return unflatten_dict(out)


def decay_mask(params) -> Any:
    labels = flatten_dict(param_labels(params))
    return unflatten_dict({k: v == "decay" for k, v in labels.items()})


def trainable_mask(params) -> Any:
    labels = flatten_dict(param_labels(params))
    return unflatten_dict({k: v != "frozen" for k, v in labels.items()})


def make_optimizer(
    learning_rate: float | Callable,
    weight_decay: float = 0.0,
    betas: Tuple[float, float] = (0.9, 0.95),
    gradient_clip_val: Optional[float] = 1.0,
    gradient_clip_algorithm: str = "value",
    accumulate_grad_batches: int = 1,
    mu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW with per-rank decay masking + value/norm clipping; frozen
    buffer leaves get zero updates. ``accumulate_grad_batches`` wraps the
    whole transform in ``optax.MultiSteps`` (reference
    ``trainer.accumulate_grad_batches``). ``mu_dtype`` (e.g.
    ``"bfloat16"``) halves the first-moment memory — the flagship's
    AdamW state is ~11 GB f32, the usual OOM driver on one chip."""
    chain = []
    if gradient_clip_val is not None and gradient_clip_val > 0:
        if gradient_clip_algorithm == "value":
            chain.append(optax.clip(gradient_clip_val))
        elif gradient_clip_algorithm == "norm":
            chain.append(optax.clip_by_global_norm(gradient_clip_val))
        else:
            raise ValueError(gradient_clip_algorithm)

    def adamw(wd: float) -> optax.GradientTransformation:
        return optax.adamw(
            learning_rate=learning_rate, b1=betas[0], b2=betas[1], weight_decay=wd,
            mu_dtype=mu_dtype,
        )

    chain.append(
        optax.multi_transform(
            {
                "decay": adamw(weight_decay),
                "nodecay": adamw(0.0),
                "frozen": optax.set_to_zero(),
            },
            param_labels,
        )
    )
    tx = optax.chain(*chain)
    if accumulate_grad_batches and accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accumulate_grad_batches))
    return tx


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params here = trainable subtrees)."""

    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def build_schedule(
    lr_scheduler_cfg: Optional[dict], base_lr: float
) -> float | Callable:
    """Resolve a reference-style ``lr_scheduler`` config block into an optax
    schedule (or the constant base LR)."""
    if lr_scheduler_cfg is None:
        return base_lr
    from vaura_tpu.config import instantiate_from_config

    spec = instantiate_from_config(
        {k: v for k, v in lr_scheduler_cfg.items() if k in ("target", "params")}
    )
    return spec.build(base_lr)
