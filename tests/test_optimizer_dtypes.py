"""Reduced-precision AdamW moment storage (``make_optimizer`` mu/nu
dtypes): state dtypes land as configured, updates track f32 AdamW, and a
tiny overfit still converges under bf16 moments. The nu_dtype path is the
repo's experimental second-moment memory lever (PERFORMANCE.md train-MFU
section); the reference trains f32 AdamW only (``vaura_model.py:599-616``)."""

import jax
import jax.numpy as jnp
import numpy as np

from vaura_tpu.train.state import TrainState, make_optimizer


def _params(seed=0):
    r = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(r.standard_normal((8, 8)), jnp.float32),
        "b": jnp.asarray(r.standard_normal((8,)), jnp.float32),
    }


def _adam_leaves(opt_state):
    return [
        s for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "mu")
        ) if hasattr(x := s, "mu")
    ]


def test_nu_dtype_state_and_update_tracks_f32():
    params = _params()
    grads = jax.tree_util.tree_map(lambda p: 0.01 * jnp.ones_like(p), params)

    tx32 = make_optimizer(1e-3, weight_decay=0.1, gradient_clip_val=None)
    txbf = make_optimizer(
        1e-3, weight_decay=0.1, gradient_clip_val=None,
        mu_dtype="bfloat16", nu_dtype="bfloat16",
    )
    s32 = TrainState.create(params, tx32)
    sbf = TrainState.create(params, txbf)

    mus = [l.mu for l in _adam_leaves(sbf.opt_state)]
    nus = [l.nu for l in _adam_leaves(sbf.opt_state)]
    assert mus and nus
    for tree in mus + nus:
        for leaf in jax.tree_util.tree_leaves(tree):
            assert leaf.dtype == jnp.bfloat16

    for i in range(5):
        s32 = s32.apply_gradients(grads)
        sbf = sbf.apply_gradients(grads)
    w32 = np.asarray(s32.params["w"], np.float32)
    wbf = np.asarray(sbf.params["w"], np.float32)
    # moment rounding perturbs the step by O(bf16 eps), not its direction
    step32 = w32 - np.asarray(params["w"])
    stepbf = wbf - np.asarray(params["w"])
    rel = np.abs(stepbf - step32).max() / (np.abs(step32).max() + 1e-12)
    assert rel < 0.05, rel


def test_nu_dtype_overfit_converges():
    params = _params(1)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((16, 8)),
                    jnp.float32)
    y = x @ jnp.ones((8, 8)) * 0.3

    tx = make_optimizer(
        3e-2, gradient_clip_val=1.0,
        mu_dtype="bfloat16", nu_dtype="bfloat16",
    )
    state = TrainState.create(params, tx)

    @jax.jit
    def step(state):
        def loss_fn(p):
            pred = x @ p["w"] + p["b"]
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    first = None
    for i in range(60):
        state, loss = step(state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.1 * first
