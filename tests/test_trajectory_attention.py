"""Trajectory attention: exact-path parity against an independent torch
replica of the reference algorithm (``vit_helper.py:174-313``), plus
approximation-quality checks for the nystrom/orthoformer/performer
spatial kernels (``nystrom_helper.py``/``orthoformer_helper.py``/
``performer_helper.py``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.models.motionformer import MotionFormerConfig, TrajectoryBlock
from vaura_tpu.ops.trajectory_attention import (
    nystrom_spatial_attn,
    orthoformer,
    performer_spatial_attn,
    trajectory_spatial_full,
)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _exact_reference_numpy(q, k, v, F):
    """Straightforward numpy statement of the trajectory spatial step:
    softmax over each frame's keys, per-frame value aggregation."""
    BH, N, d = q.shape
    P = N // F
    scale = d**-0.5
    out = np.zeros((BH, N, F, d), np.float32)
    for b in range(BH):
        for nq in range(N):
            scores = (q[b, nq] @ k[b].T) * scale  # [N]
            for f in range(F):
                s = scores[f * P : (f + 1) * P]
                p = np.exp(s - s.max())
                p /= p.sum()
                out[b, nq, f] = p @ v[b, f * P : (f + 1) * P]
    return out


def test_spatial_full_matches_manual():
    rng = np.random.default_rng(0)
    BH, F, P, d = 2, 3, 5, 8
    q, k, v = (_rand(rng, BH, F * P, d) for _ in range(3))
    got = np.asarray(
        trajectory_spatial_full(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), F)
    )
    want = _exact_reference_numpy(q, k, v, F)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_nystrom_approximates_exact():
    # with landmarks == N the Nystrom factorization is near-exact
    rng = np.random.default_rng(1)
    BH, F, P, d = 2, 4, 8, 16
    N = F * P
    q, k, v = (0.5 * _rand(rng, BH, N, d) for _ in range(3))
    exact = _exact_reference_numpy(q, k, v, F)
    approx = np.asarray(
        nystrom_spatial_attn(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            landmarks=N, num_frames=F,
        )
    )
    # the Nystrom softmax-kernel factorization is approximate even at
    # landmarks == N; require a tight but not exact match
    err = np.abs(approx - exact).max() / (np.abs(exact).max() + 1e-9)
    assert err < 0.15, err
    corr = np.corrcoef(approx.ravel(), exact.ravel())[0, 1]
    assert corr > 0.99, corr


@pytest.mark.slow
def test_nystrom_uneven_landmarks_shape():
    rng = np.random.default_rng(2)
    BH, F, P, d = 1, 2, 7, 8  # N = 14, landmarks = 4 -> uneven segments
    q, k, v = (_rand(rng, BH, F * P, d) for _ in range(3))
    out = nystrom_spatial_attn(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        landmarks=4, num_frames=F,
    )
    assert out.shape == (BH, F * P, F, d)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_orthoformer_approximates_exact():
    rng = np.random.default_rng(3)
    BH, F, P, d = 2, 2, 12, 16
    N = F * P
    q, k, v = (0.5 * _rand(rng, BH, N, d) for _ in range(3))
    exact = _exact_reference_numpy(q, k, v, F)
    approx = np.asarray(
        orthoformer(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            num_landmarks=N // 2, num_frames=F,
            rng=jax.random.PRNGKey(0),
        )
    )
    assert approx.shape == exact.shape
    assert np.isfinite(approx).all()
    # landmark-factorized attention correlates strongly with exact
    corr = np.corrcoef(approx.ravel(), exact.ravel())[0, 1]
    assert corr > 0.9, corr


def test_performer_approximates_exact():
    rng = np.random.default_rng(4)
    BH, F, P, d = 2, 2, 10, 16
    N = F * P
    q, k, v = (0.3 * _rand(rng, BH, N, d) for _ in range(3))
    exact = _exact_reference_numpy(q, k, v, F)
    # NOTE the FAVOR+ kernel estimates softmax(q k^T / sqrt(d)) without the
    # reference's extra head-dim scale; at small scale inputs they agree
    approx = np.asarray(
        performer_spatial_attn(
            jnp.asarray(q * d**-0.25), jnp.asarray(k * d**-0.25),
            jnp.asarray(v), num_frames=F, num_features=512,
            rng=jax.random.PRNGKey(1),
        )
    )
    assert np.isfinite(approx).all()
    corr = np.corrcoef(approx.ravel(), exact.ravel())[0, 1]
    assert corr > 0.9, corr


@pytest.mark.slow
@pytest.mark.parametrize("approx", ["none", "nystrom", "orthoformer", "performer"])
def test_trajectory_block_forward(approx):
    cfg = MotionFormerConfig(
        embed_dim=32, depth=1, num_heads=4, temporal_resolution=2,
        attn_layer="trajectory", approx_attn_type=approx, approx_attn_dim=8,
        drop_path_rate=0.0, dtype=jnp.float32,
    )
    f, n = 2, 9
    B, N1 = 2, 1 + f * n
    block = TrajectoryBlock(cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((B, N1, 32)), jnp.float32)
    params = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, (f, n, False), jnp.float32(0.0),
    )
    out, _ = block.apply(params, x, (f, n, False), jnp.float32(0.0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # jittable with static frame/space sizes
    jit_out, _ = jax.jit(
        lambda p, x_: block.apply(p, x_, (f, n, False), jnp.float32(0.0))
    )(params, x)
    np.testing.assert_allclose(np.asarray(jit_out), np.asarray(out), atol=1e-5)


@pytest.mark.slow
def test_trajectory_block_matches_torch_replica():
    """Full-block parity against an independent torch implementation of the
    reference trajectory algorithm (exact path, use_original_code=True)."""
    torch = pytest.importorskip("torch")

    cfg = MotionFormerConfig(
        embed_dim=24, depth=1, num_heads=3, temporal_resolution=2,
        attn_layer="trajectory", drop_path_rate=0.0, drop_rate=0.0,
        dtype=jnp.float32, qkv_bias=True,
    )
    f, n = 2, 4
    B, N1, D = 2, 1 + f * n, 24
    H, hd = 3, 8
    block = TrajectoryBlock(cfg)
    x_np = np.random.default_rng(7).standard_normal((B, N1, D)).astype(np.float32)
    params = block.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        jnp.asarray(x_np), (f, n, False), jnp.float32(0.0),
    )["params"]
    got, _ = block.apply(
        {"params": params}, jnp.asarray(x_np), (f, n, False), jnp.float32(0.0)
    )

    # torch replica using the SAME weights
    def W(name):
        return torch.tensor(np.asarray(params[name]["kernel"]).T)

    def b(name):
        return torch.tensor(np.asarray(params[name]["bias"]))

    import torch.nn.functional as Fn

    xt = torch.tensor(x_np)
    g, bb = params["norm1"]["scale"], params["norm1"]["bias"]
    h = Fn.layer_norm(xt, (D,), torch.tensor(np.asarray(g)), torch.tensor(np.asarray(bb)), 1e-6)
    qkv = h @ W("attn_qkv").T + b("attn_qkv")
    q, k, v = qkv.chunk(3, dim=-1)
    heads = lambda t: t.reshape(B, N1, H, hd).permute(0, 2, 1, 3)
    q, k, v = map(heads, (q, k, v))
    scale = hd**-0.5
    cls_probs = torch.softmax((q[:, :, :1] * scale) @ k.transpose(-1, -2), -1)
    cls_out = (cls_probs @ v).permute(0, 2, 1, 3).reshape(B, 1, D)
    N = f * n
    qs = q[:, :, 1:].reshape(B * H, N, hd)
    ks = k[:, :, 1:].reshape(B * H, N, hd)
    vs = v[:, :, 1:].reshape(B * H, N, hd)
    scores = (qs @ ks.transpose(-1, -2) * scale).reshape(B * H, N, f, n)
    probs = torch.softmax(scores, -1)
    traj = torch.einsum("bnfp,bfpd->bnfd", probs, vs.reshape(B * H, f, n, hd))
    x_traj = traj.reshape(B, H, N, f, hd).permute(0, 2, 3, 1, 4).reshape(B, N, f, D)
    x_diag = torch.diagonal(x_traj.reshape(B, f, n, f, D), dim1=1, dim2=3)
    x_diag = x_diag.permute(0, 3, 1, 2).reshape(B, N, D)
    q2 = (x_diag @ W("attn_proj_q").T + b("attn_proj_q"))
    q2 = q2.reshape(B, N, H, hd).permute(0, 2, 1, 3) * scale
    kv2 = x_traj @ W("attn_proj_kv").T + b("attn_proj_kv")
    k2, _v2 = kv2.chunk(2, dim=-1)
    k2 = k2.reshape(B, N, f, H, hd).permute(0, 3, 1, 2, 4)
    t_probs = torch.softmax(torch.einsum("bhnd,bhnfd->bhnf", q2, k2), -1)
    t_vals = traj.reshape(B, H, N, f, hd)
    out = torch.einsum("bhnf,bhnfd->bhnd", t_probs, t_vals)
    out = out.permute(0, 2, 1, 3).reshape(B, N, D)
    out = torch.cat([cls_out, out], 1)
    out = out @ W("attn_proj").T + b("attn_proj")
    xt = xt + out
    g2, b2 = params["norm2"]["scale"], params["norm2"]["bias"]
    h2 = Fn.layer_norm(xt, (D,), torch.tensor(np.asarray(g2)), torch.tensor(np.asarray(b2)), 1e-6)
    fc1 = h2 @ torch.tensor(np.asarray(params["mlp"]["fc1"]["kernel"])) + torch.tensor(
        np.asarray(params["mlp"]["fc1"]["bias"])
    )
    act = Fn.gelu(fc1, approximate="none")
    fc2 = act @ torch.tensor(np.asarray(params["mlp"]["fc2"]["kernel"])) + torch.tensor(
        np.asarray(params["mlp"]["fc2"]["bias"])
    )
    want = (xt + fc2).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.slow
def test_motionformer_trajectory_end_to_end():
    from vaura_tpu.models.motionformer import MotionFormer

    cfg = MotionFormerConfig(
        img_size=32, patch_size=16, embed_dim=24, depth=2, num_heads=3,
        temporal_resolution=2, z_block_size=2, attn_layer="trajectory",
        approx_attn_type="nystrom", approx_attn_dim=4, dtype=jnp.float32,
    )
    model = MotionFormer(cfg)
    # one segment of 4 frames, 32x32 ([B, S, C, T, H, W] torch layout)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, 1, 3, 4, 32, 32)),
        jnp.float32,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, False,
    )
    out, _ = model.apply(params, x, False)
    assert out.shape == (1, 1, cfg.temporal_resolution, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
