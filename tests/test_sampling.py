"""Sampling primitive tests: support constraints, distribution sanity, CFG
blend, schedule values, masked CE loss (reference utils/utils.py:139-196,
vaura_model.py:246-280,810-813; lr_schedulers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.ops.losses import masked_codebook_cross_entropy
from vaura_tpu.ops.sampling import (
    cfg_blend,
    sample_top_k,
    sample_top_p,
    sample_tokens,
)
from vaura_tpu.ops.schedules import (
    cosine_schedule,
    inverse_sqrt_schedule,
    warmup_to_static_schedule,
)


def test_top_k_support():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3, 100)))
    k = 5
    top_idx = np.argsort(np.asarray(logits), axis=-1)[..., -k:]
    fn = jax.jit(lambda r: sample_top_k(r, logits, k))
    keys = jax.random.split(rng, 30)
    samples = np.asarray(jax.vmap(fn)(keys))  # [30, 4, 3]
    for b in range(4):
        for q in range(3):
            assert set(samples[:, b, q]) <= set(top_idx[b, q])


def test_top_p_support():
    rng = jax.random.PRNGKey(1)
    # peaked distribution: one token holds 90% of the mass
    logits = jnp.log(jnp.asarray([[0.9, 0.04, 0.03, 0.02, 0.01]]))
    keys = jax.random.split(rng, 20)
    samples = jax.vmap(lambda r: sample_top_p(r, logits, 0.5))(keys)
    assert (np.asarray(samples) == 0).all()  # nucleus at p=0.5 is the top token


def test_top_p_keeps_boundary_token():
    # reference keeps tokens while cumsum - prob <= p: for p=0.95 tokens 0
    # and 1 stay (0.9-0.9 <= .95, 0.98-.08 <= .95); token 2 is dropped
    # (0.99 - 0.01 <= 0.95 is false)
    logits = jnp.log(jnp.asarray([[0.9, 0.08, 0.01, 0.01]]))
    keys = jax.random.split(jax.random.PRNGKey(2), 100)
    samples = jax.vmap(lambda r: sample_top_p(r, logits, 0.95))(keys)
    assert set(np.asarray(samples).ravel()) <= {0, 1}


def test_greedy_and_temp_zero():
    logits = jnp.asarray([[0.1, 3.0, 0.2]])
    rng = jax.random.PRNGKey(0)
    assert int(sample_tokens(rng, logits, use_sampling=False)[0]) == 1
    assert int(sample_tokens(rng, logits, use_sampling=True, temp=0.0)[0]) == 1


def test_multinomial_distribution():
    rng = jax.random.PRNGKey(3)
    probs = np.array([0.7, 0.2, 0.1])
    logits = jnp.log(jnp.asarray(probs))[None, :]
    counts = np.zeros(3)
    n = 2000
    keys = jax.random.split(rng, n)
    samples = jax.vmap(lambda k: sample_tokens(k, logits, temp=1.0))(keys)
    for s in np.asarray(samples).ravel():
        counts[s] += 1
    assert np.allclose(counts / n, probs, atol=0.05)


def test_cfg_blend():
    cond = jnp.asarray([2.0, 0.0])
    uncond = jnp.asarray([1.0, 1.0])
    out = cfg_blend(cond, uncond, 6.0)
    np.testing.assert_allclose(np.asarray(out), [7.0, -5.0])
    np.testing.assert_allclose(np.asarray(cfg_blend(cond, uncond, 1.0)), cond)


def test_sampling_is_jittable():
    @jax.jit
    def fn(rng, logits):
        return sample_tokens(rng, logits, temp=0.95, top_k=8)

    out = fn(jax.random.PRNGKey(0), jnp.zeros((2, 9, 1024)))
    assert out.shape == (2, 9)


# ------------------------- schedules ------------------------- #
def test_inverse_sqrt_schedule():
    # realized-step indexing: step s evaluates the torch scheduler at
    # s+1 (test_reference_oracle_schedules locks the full sequence)
    sched = inverse_sqrt_schedule(1e-3, warmup_steps=100, warmup_init_lr=1e-6)
    assert float(sched(0)) == pytest.approx(1e-6 + 0.01 * (1e-3 - 1e-6))
    assert float(sched(49)) == pytest.approx(1e-6 + 0.5 * (1e-3 - 1e-6), rel=1e-3)
    assert float(sched(99)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(399)) == pytest.approx(1e-3 * (100 / 400) ** 0.5, rel=1e-3)


def test_warmup_to_static():
    sched = warmup_to_static_schedule(2e-4, warmup_steps=10)
    assert float(sched(0)) == pytest.approx(2e-5)
    assert float(sched(9)) == pytest.approx(2e-4)
    assert float(sched(1000)) == pytest.approx(2e-4)


def test_cosine_schedule():
    sched = cosine_schedule(1.0, total_steps=1000, warmup_steps=100, lr_min_ratio=0.1)
    assert float(sched(50)) == pytest.approx(0.5, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1.0, rel=1e-2)
    # midpoint of cosine: ratio = 0.1 + 0.45*(1+cos(pi/2)) = 0.55
    assert float(sched(550)) == pytest.approx(0.55, rel=1e-2)
    assert float(sched(1000)) == pytest.approx(0.1, abs=1e-6)
    assert float(sched(2000)) == pytest.approx(0.1, abs=1e-6)


# ------------------------- loss ------------------------- #
def test_masked_ce_matches_manual():
    rng = np.random.default_rng(0)
    B, K, T, card = 2, 3, 5, 7
    logits = rng.normal(size=(B, K, T, card)).astype(np.float32)
    targets = rng.integers(0, card, size=(B, K, T))
    mask = rng.random((B, K, T)) > 0.3
    mask[:, :, 0] = True  # ensure every codebook has valid entries
    loss, per_cb = masked_codebook_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)
    )
    # manual per-codebook mean CE over valid positions
    expected_cbs = []
    for k in range(K):
        lk = logits[:, k].reshape(-1, card)
        tk = targets[:, k].reshape(-1)
        mk = mask[:, k].reshape(-1)
        logp = lk - np.log(np.exp(lk).sum(-1, keepdims=True))
        nll = -logp[np.arange(len(tk)), tk]
        expected_cbs.append(nll[mk].mean())
    np.testing.assert_allclose(np.asarray(per_cb), expected_cbs, rtol=1e-5)
    assert float(loss) == pytest.approx(np.mean(expected_cbs), rel=1e-5)


def test_masked_ce_ignores_nan_fill():
    """NaN at masked logit positions (pattern revert fill) must not poison
    the loss."""
    B, K, T, card = 1, 2, 4, 5
    logits = np.zeros((B, K, T, card), dtype=np.float32)
    mask = np.ones((B, K, T), dtype=bool)
    mask[:, :, -1] = False
    logits[:, :, -1] = np.nan
    targets = np.zeros((B, K, T), dtype=np.int32)
    loss, _ = masked_codebook_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)
    )
    assert np.isfinite(float(loss))


# ------------------------- misc ops ------------------------- #
def test_nullify_condition():
    from vaura_tpu.ops.dropout import nullify_condition

    cond = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)))
    out = nullify_condition(cond, dim=1)
    assert out.shape == (2, 1, 3)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_cfg_batch_dropout():
    from vaura_tpu.ops.dropout import classifier_free_guidance_dropout

    cond = jnp.ones((2, 4, 3))
    out, dropped = classifier_free_guidance_dropout(
        jax.random.PRNGKey(0), cond, p=1.0, train=True
    )
    assert bool(dropped)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    out, dropped = classifier_free_guidance_dropout(
        jax.random.PRNGKey(0), cond, p=0.0, train=True
    )
    assert not bool(dropped)
    np.testing.assert_array_equal(np.asarray(out), 1.0)


def test_attn_rows_to_video():
    from vaura_tpu.utils.viz import attn_rows_to_video, scale_to_01

    rows = np.random.default_rng(0).random((6, 20)).astype(np.float32)
    video = attn_rows_to_video(rows, scale=2, height=8)
    assert video.shape == (6, 8, 40, 3)
    assert video.dtype == np.uint8
    x = np.asarray([-2.0, 0.0, 6.0])
    s = scale_to_01(x)
    assert s.min() == 0.0 and s.max() == 1.0
