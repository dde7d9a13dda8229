"""Jitted train/eval step factories.

The two hot entry points of the training system (SURVEY.md §7): a single
compiled ``train_step`` (loss + grads + optimizer update) and ``eval_step``
(teacher-forced loss), both over a ``VauraSystem``. Frozen subtrees (codec,
optionally encoder) are passed separately and never differentiated —
the TPU-native fix for the reference's frozen-weights-in-checkpoint FIXME
(``vaura_model.py:61``).

With a mesh, shardings constrain batch (data axes) and params (fsdp/model
axes); XLA inserts the gradient all-reduce that Lightning/NCCL did
implicitly in the reference (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vaura_tpu.models.vaura import VauraSystem
from vaura_tpu.train.state import TrainState


def split_params(
    system: VauraSystem, params: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(trainable, frozen) partition of the param tree. The codec is always
    frozen (reference ``vaura_model.py:89-92``); the visual encoder follows
    ``freeze_feature_extractor``."""
    if "lora_sampler" in params:
        # LoRA finetuning: only the adapters train; the base sampler is
        # frozen and folded in at the jitted entry points
        # (VauraSystem._resolve_params)
        trainable = {"lora_sampler": params["lora_sampler"]}
        frozen = {"dac": params["dac"], "sampler": params["sampler"]}
    else:
        trainable = {"sampler": params["sampler"]}
        frozen = {"dac": params["dac"]}
    if "encoder" in params:
        if system.freeze_feature_extractor:
            frozen["encoder"] = params["encoder"]
        else:
            trainable["encoder"] = params["encoder"]
    if "bridge" in params:
        trainable["bridge"] = params["bridge"]
    return trainable, frozen


def make_train_step(
    system: VauraSystem,
    donate: bool = True,
) -> Callable:
    """Returns ``train_step(state, frozen, batch, rng) ->
    (state, metrics)``; jit-compiled, donating the state buffers."""

    def train_step(state: TrainState, frozen: Dict[str, Any], batch, rng):
        batch = array_batch(batch)
        def loss_fn(trainable):
            params = {**frozen, **trainable}
            loss, aux = system.train_forward(
                params, batch.get("frames"), batch.get("audio"), rng,
                train=True, codes=batch.get("codes"),
            )
            return loss, aux["loss_per_codebook"]

        (loss, per_cb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads)
        metrics = {"loss": loss, "loss_per_codebook": per_cb}
        return state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return lambda state, frozen, batch, rng: jitted(
        state, frozen, array_batch(batch), rng
    )


def make_eval_step(system: VauraSystem) -> Callable:
    def eval_step(trainable: Dict[str, Any], frozen: Dict[str, Any], batch, rng):
        params = {**frozen, **trainable}
        loss, aux = system.train_forward(
            params, batch.get("frames"), batch.get("audio"), rng,
            train=False, codes=batch.get("codes"),
        )
        return {"loss": loss, "loss_per_codebook": aux["loss_per_codebook"]}

    jitted = jax.jit(eval_step)
    return lambda trainable, frozen, batch, rng: jitted(
        trainable, frozen, array_batch(batch), rng
    )


def array_batch(batch: dict) -> dict:
    """Keep only the jit-compatible array leaves the step functions consume
    (meta strings/lists never cross the jit boundary)."""
    return {k: batch[k] for k in ("frames", "audio", "codes") if k in batch}


def batch_to_device(batch: dict, sharding=None) -> dict:
    """Move the array leaves of a host batch onto device (optionally with a
    NamedSharding for the batch axes). Meta (non-array) leaves are kept."""
    import numpy as np

    def put(x):
        if isinstance(x, np.ndarray) and np.issubdtype(x.dtype, np.number):
            return jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)
        return x

    return {
        k: (batch_to_device(v, sharding) if isinstance(v, dict) else put(v))
        if not isinstance(v, list)
        else v
        for k, v in batch.items()
    }


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffer host batches onto device so H2D transfer overlaps the
    previous step's compute (the torch-DataLoader pin_memory+overlap
    equivalent). Yields device batches."""
    import collections

    queue = collections.deque()

    def put(batch):
        queue.append(batch_to_device(batch, sharding))

    for batch in iterator:
        put(batch)
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
