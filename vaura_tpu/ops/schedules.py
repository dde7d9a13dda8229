"""Learning-rate schedules as optax-compatible pure functions.

TPU-native equivalents of the reference's step-interval schedulers
(reference ``models/modules/misc/lr_schedulers.py``). Each factory returns an
``optax``-style schedule ``step -> lr`` usable directly in
``optax.inject_hyperparams``/``optax.scale_by_schedule`` — no stateful
scheduler objects.

The classes (``InverseSquareRootLRScheduler`` etc.) are thin config shims so
reference-style ``{target, params}`` configs instantiate to schedule
callables through the registry.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def inverse_sqrt_schedule(
    base_lr: float, warmup_steps: int, warmup_init_lr: Optional[float] = 0.0
) -> Schedule:
    """Linear warmup then lr * sqrt(warmup/step) decay
    (reference ``lr_schedulers.py:14-47``).

    Matches the reference's REALIZED sequence: torch ``_LRScheduler``
    pre-steps once at construction (``_step_count`` starts at 1), so the
    optimizer never sees the 0-LR warmup point — caught by
    ``tests/test_reference_oracle_schedules.py``."""
    warmup_init = warmup_init_lr or 0.0

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32) + 1.0
        warm = warmup_init + step * (base_lr - warmup_init) / max(warmup_steps, 1)
        decay = base_lr * (warmup_steps**0.5) * jnp.maximum(step, 1.0) ** -0.5
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def warmup_to_static_schedule(
    base_lr: float, warmup_steps: int, warmup_init_lr: Optional[float] = 0.0
) -> Schedule:
    """Linear warmup then constant (reference ``lr_schedulers.py:50-71``;
    same +1 realized-step indexing as ``inverse_sqrt_schedule``)."""
    warmup_init = warmup_init_lr or 0.0

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32) + 1.0
        warm = warmup_init + step * (base_lr - warmup_init) / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, base_lr)

    return schedule


def cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    lr_min_ratio: float = 0.0,
    cycle_length: float = 1.0,
) -> Schedule:
    """Linear warmup then cosine decay to ``lr_min_ratio * base_lr``
    (reference ``lr_schedulers.py:74-118``)."""
    assert warmup_steps >= 0 and total_steps >= 0

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm_ratio = step / max(warmup_steps, 1)
        s = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos_ratio = lr_min_ratio + 0.5 * (1 - lr_min_ratio) * (
            1.0 + jnp.cos(math.pi * s / cycle_length)
        )
        ratio = jnp.where(
            step < warmup_steps,
            warm_ratio,
            jnp.where(step <= total_steps, cos_ratio, lr_min_ratio),
        )
        return base_lr * ratio

    return schedule


# --------------------------------------------------------------------- #
# Config shims: reference-style {target, params} instantiation
# --------------------------------------------------------------------- #
class _ScheduleSpec:
    """Holds schedule params from config; ``build(base_lr)`` returns the
    optax schedule. The reference passes the torch optimizer into the
    scheduler (``vaura_model.py:398``); functionally the base LR is the only
    coupling, so we take just that."""

    def build(self, base_lr: float) -> Schedule:
        raise NotImplementedError

    def __call__(self, step):
        raise TypeError(
            "Schedule specs must be built with .build(base_lr) before use"
        )


class InverseSquareRootLRScheduler(_ScheduleSpec):
    def __init__(self, warmup_steps: int, warmup_init_lr: float = 0.0, **_ignored):
        self.warmup_steps = warmup_steps
        self.warmup_init_lr = warmup_init_lr

    def build(self, base_lr: float) -> Schedule:
        return inverse_sqrt_schedule(base_lr, self.warmup_steps, self.warmup_init_lr)


class WarmUpToStaticLRScheduler(_ScheduleSpec):
    def __init__(self, warmup_steps: int, warmup_init_lr: float = 0.0, **_ignored):
        self.warmup_steps = warmup_steps
        self.warmup_init_lr = warmup_init_lr

    def build(self, base_lr: float) -> Schedule:
        return warmup_to_static_schedule(
            base_lr, self.warmup_steps, self.warmup_init_lr
        )


class CosineLRScheduler(_ScheduleSpec):
    def __init__(
        self,
        total_steps: int,
        warmup_steps: int,
        lr_min_ratio: float = 0.0,
        cycle_length: float = 1.0,
        **_ignored,
    ):
        self.total_steps = total_steps
        self.warmup_steps = warmup_steps
        self.lr_min_ratio = lr_min_ratio
        self.cycle_length = cycle_length

    def build(self, base_lr: float) -> Schedule:
        return cosine_schedule(
            base_lr,
            self.total_steps,
            self.warmup_steps,
            self.lr_min_ratio,
            self.cycle_length,
        )
