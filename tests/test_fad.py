"""FAD / paired-KLD metric math (vaura_tpu.ops.fad). The reference
delegates these to an external eval framework (reference README.md:93);
we validate the in-repo math against analytic Gaussian cases."""

import numpy as np

from vaura_tpu.ops.fad import (
    MelStatsEmbedder,
    embedding_stats,
    frechet_audio_distance,
    frechet_distance,
    paired_kl_divergence,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(256, 8))
    assert abs(frechet_audio_distance(emb, emb)) < 1e-8


def test_frechet_distance_mean_shift_analytic():
    # equal covariances: FD == |mu1 - mu2|^2 exactly
    d = 6
    mu1, mu2 = np.zeros(d), np.full(d, 0.5)
    cov = np.eye(d) * 2.0
    fd = frechet_distance(mu1, cov, mu2, cov)
    assert abs(fd - 0.25 * d) < 1e-10


def test_frechet_distance_isotropic_scale_analytic():
    # zero means, C1 = a*I, C2 = b*I: FD == d*(sqrt(a) - sqrt(b))^2
    d, a, b = 4, 4.0, 1.0
    fd = frechet_distance(
        np.zeros(d), a * np.eye(d), np.zeros(d), b * np.eye(d)
    )
    assert abs(fd - d * (np.sqrt(a) - np.sqrt(b)) ** 2) < 1e-10


def test_frechet_distance_sampled_gaussians():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(5000, 4))
    B = rng.normal(size=(5000, 4)) + np.array([1.0, 0, 0, 0])
    fd = frechet_audio_distance(A, B)
    assert 0.7 < fd < 1.3, fd  # true value 1.0, finite-sample noise


def test_embedding_stats_shapes():
    mu, cov = embedding_stats(np.random.default_rng(2).normal(size=(10, 3)))
    assert mu.shape == (3,) and cov.shape == (3, 3)


def test_paired_kl():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(32, 10))
    assert abs(paired_kl_divergence(logits, logits)) < 1e-12
    shifted = logits + rng.normal(size=(32, 10))
    kl = paired_kl_divergence(logits, shifted)
    assert kl > 0.01


def test_mel_stats_embedder():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noise = np.random.default_rng(4).normal(size=sr).astype(np.float32)
    emb = MelStatsEmbedder(n_mels=32)
    e1, e2 = emb(tone, sr), emb(noise, sr)
    assert e1.shape == (64,)
    # deterministic + discriminative
    np.testing.assert_array_equal(e1, emb(tone, sr))
    assert np.linalg.norm(e1 - e2) > 1.0
