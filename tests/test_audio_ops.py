"""Audio ops tests: normalization strategies, loudness measurement,
resampling, WAV round-trip (reference utils/data_utils.py:337-507
behavior contracts)."""

import numpy as np
import pytest

from vaura_tpu.ops.audio import (
    integrated_loudness,
    normalize_audio,
    read_wav,
    resample_poly,
    write_wav,
)


def sine(freq=440.0, sr=44100, seconds=1.5, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_clip_strategy():
    wav = np.array([[-2.0, 0.2, 3.0]], np.float32)
    out = normalize_audio(wav, strategy="clip", peak_clip_headroom_db=6.0)
    peak = 10 ** (-6.0 / 20)
    assert out.max() == pytest.approx(peak)
    assert out.min() == pytest.approx(-peak)


def test_peak_strategy():
    wav = np.array([[0.1, -0.25]], np.float32)
    out = normalize_audio(wav, strategy="peak", peak_clip_headroom_db=6.0)
    assert np.abs(out).max() == pytest.approx(10 ** (-6.0 / 20), rel=1e-5)


def test_rms_strategy():
    wav = sine()[None]
    out = normalize_audio(wav, strategy="rms", rms_headroom_db=18.0)
    rms = np.sqrt((out**2).mean())
    assert rms == pytest.approx(10 ** (-18.0 / 20), rel=1e-2)


def test_loudness_sanity():
    """A 0.1-amplitude 1 kHz sine has mean-square -23.7 dB; with the
    ~+0.7 dB K-weighting gain at 1 kHz it should measure ~= -23 LUFS.
    Doubling amplitude adds ~6 LU."""
    wav = sine(freq=1000.0, amp=0.1)
    l1 = integrated_loudness(wav, 44100)
    assert -25.0 < l1 < -21.0
    l2 = integrated_loudness(2 * wav, 44100)
    assert l2 - l1 == pytest.approx(6.02, abs=0.5)


def test_loudness_normalize_targets():
    wav = sine(freq=500.0, amp=0.05)[None]
    out = normalize_audio(
        wav, strategy="loudness", loudness_headroom_db=14.0, sample_rate=44100
    )
    assert integrated_loudness(out[0], 44100) == pytest.approx(-14.0, abs=1.0)


def test_resample_preserves_frequency():
    sr1, sr2 = 44100, 24000
    wav = sine(freq=440.0, sr=sr1, seconds=1.0)
    res = resample_poly(wav, sr1, sr2)
    assert res.shape[-1] == pytest.approx(24000, abs=2)
    # dominant FFT bin still at 440 Hz
    spec = np.abs(np.fft.rfft(res))
    freq = np.fft.rfftfreq(len(res), 1 / sr2)
    assert freq[spec.argmax()] == pytest.approx(440.0, abs=2.0)


def test_wav_roundtrip(tmp_path):
    wav = sine(seconds=0.25)[None]
    path = tmp_path / "t.wav"
    write_wav(path, wav, 44100)
    back, sr = read_wav(path)
    assert sr == 44100
    np.testing.assert_allclose(back, wav, atol=1e-3)


def test_eval_metrics_pair(tmp_path):
    """eval_metrics: identical files score ~perfect; noise scores worse."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from scripts.eval_metrics import evaluate_pair

    wav = sine(seconds=1.0)
    write_wav(tmp_path / "a.wav", wav[None], 44100)
    write_wav(tmp_path / "b.wav", wav[None], 44100)
    same = evaluate_pair(tmp_path / "a.wav", tmp_path / "b.wav")
    assert same["si_snr_db"] > 30
    assert same["melspec_l1"] < 0.05
    noise = (np.random.default_rng(0).standard_normal(len(wav)) * 0.3).astype(
        np.float32
    )
    write_wav(tmp_path / "c.wav", noise[None], 44100)
    diff = evaluate_pair(tmp_path / "c.wav", tmp_path / "a.wav")
    assert diff["si_snr_db"] < 0
    assert diff["melspec_l1"] > same["melspec_l1"]
