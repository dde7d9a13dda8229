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


def _scale_by_adam_dtypes(
    b1: float, b2: float, eps: float, mu_dtype, nu_dtype
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moment dtypes configurable
    (optax only exposes ``mu_dtype``). The second moment is a smoothed
    average of g^2 — bf16 keeps f32's exponent range and drops 16
    mantissa bits, perturbing the adaptive scale ``sqrt(nu)+eps`` by
    ~0.2-0.4% — an *experimental* memory lever (flagship nu is ~2.8 GB
    f32), gated behind ``model.adam_nu_dtype`` and never a default.
    Moment math runs in the update dtype; storage casts on commit."""
    mu_dt = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_dt = jnp.dtype(nu_dtype) if nu_dtype else None

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dt or p.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dt or p.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(g.dtype) + (1.0 - b1) * g,
            updates, state.mu,
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(g.dtype) + (1.0 - b2) * (g * g),
            updates, state.nu,
        )
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(
                lambda m: m.astype(mu_dt) if mu_dt else m, mu
            ),
            nu=jax.tree_util.tree_map(
                lambda v: v.astype(nu_dt) if nu_dt else v, nu
            ),
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    learning_rate: float | Callable,
    weight_decay: float = 0.0,
    betas: Tuple[float, float] = (0.9, 0.95),
    gradient_clip_val: Optional[float] = 1.0,
    gradient_clip_algorithm: str = "value",
    accumulate_grad_batches: int = 1,
    mu_dtype: Optional[str] = None,
    nu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW with per-rank decay masking + value/norm clipping; frozen
    buffer leaves get zero updates. ``accumulate_grad_batches`` wraps the
    whole transform in ``optax.MultiSteps`` (reference
    ``trainer.accumulate_grad_batches``). ``mu_dtype`` (e.g.
    ``"bfloat16"``) halves the first-moment memory — the flagship's
    AdamW state is ~11 GB f32, the usual OOM driver on one chip.
    ``nu_dtype`` additionally halves the second moment (experimental —
    see ``_scale_by_adam_dtypes``)."""
    chain = []
    if gradient_clip_val is not None and gradient_clip_val > 0:
        if gradient_clip_algorithm == "value":
            chain.append(optax.clip(gradient_clip_val))
        elif gradient_clip_algorithm == "norm":
            chain.append(optax.clip_by_global_norm(gradient_clip_val))
        else:
            raise ValueError(gradient_clip_algorithm)

    def adamw(wd: float) -> optax.GradientTransformation:
        if nu_dtype is not None:
            parts = [_scale_by_adam_dtypes(
                betas[0], betas[1], 1e-8, mu_dtype, nu_dtype
            )]
            if wd:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)
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
