"""LR-schedule parity against the ACTUAL reference schedulers.

``models/modules/misc/lr_schedulers.py`` imports cleanly (torch only), so
the oracle is the real reference: drive each torch scheduler through an
optimizer step loop and compare the realized LR sequence with our optax
schedules (reference ``lr_schedulers.py:14-118``).

Note the reference's step indexing: torch ``_LRScheduler`` calls
``get_lr`` with ``_step_count`` starting at 1 (inverse-sqrt / warmup) or
``last_epoch`` starting at 0 (cosine); our schedules reproduce the exact
realized sequence an optimizer sees.
"""

import numpy as np
import pytest

import jax  # noqa: F401  (conftest forces CPU before torch loads)

torch = pytest.importorskip("torch")

from ref_oracle import import_ref  # noqa: E402


def _ref_lr_sequence(make_sched, base_lr: float, steps: int):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = make_sched(opt)
    lrs = []
    for _ in range(steps):
        lrs.append(opt.param_groups[0]["lr"])  # LR used for this step
        opt.step()
        sched.step()
    return np.asarray(lrs)


def _our_lr_sequence(schedule, steps: int):
    return np.asarray([float(schedule(s)) for s in range(steps)])


STEPS = 50


def test_inverse_sqrt_parity():
    ref_mod = import_ref("models.modules.misc.lr_schedulers")
    from vaura_tpu.ops.schedules import inverse_sqrt_schedule

    base = 1e-3
    ref = _ref_lr_sequence(
        lambda o: ref_mod.InverseSquareRootLRScheduler(o, warmup_steps=10),
        base, STEPS,
    )
    ours = _our_lr_sequence(
        inverse_sqrt_schedule(base, warmup_steps=10), STEPS
    )
    np.testing.assert_allclose(ref, ours, rtol=1e-6, atol=1e-9)


def test_warmup_to_static_parity():
    ref_mod = import_ref("models.modules.misc.lr_schedulers")
    from vaura_tpu.ops.schedules import warmup_to_static_schedule

    base = 2e-4
    ref = _ref_lr_sequence(
        lambda o: ref_mod.WarmUpToStaticLRScheduler(o, warmup_steps=12),
        base, STEPS,
    )
    ours = _our_lr_sequence(
        warmup_to_static_schedule(base, warmup_steps=12), STEPS
    )
    np.testing.assert_allclose(ref, ours, rtol=1e-6, atol=1e-9)


def test_cosine_parity():
    ref_mod = import_ref("models.modules.misc.lr_schedulers")
    from vaura_tpu.ops.schedules import cosine_schedule

    base = 1.08e-4  # the main experiment's recipe (SURVEY §6)
    ref = _ref_lr_sequence(
        lambda o: ref_mod.CosineLRScheduler(
            o, total_steps=40, warmup_steps=8, lr_min_ratio=0.1
        ),
        base, STEPS,
    )
    ours = _our_lr_sequence(
        cosine_schedule(
            base, total_steps=40, warmup_steps=8, lr_min_ratio=0.1
        ),
        STEPS,
    )
    np.testing.assert_allclose(ref, ours, rtol=1e-6, atol=1e-9)
