"""Native media module tests (skipped when libav/toolchain is absent):
write -> probe -> read round trip, fps resampling, min-side scaling,
reencode contract."""

import numpy as np
import pytest

from vaura_tpu.data import media

pytestmark = pytest.mark.skipif(
    not media.available(), reason="native media module unavailable"
)


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    path = tmp_path_factory.mktemp("media") / "clip.mp4"
    n, h, w = 50, 96, 128
    t = np.arange(n)[:, None, None]
    x = np.arange(w)[None, None, :]
    red = np.broadcast_to(((x * 2 + t * 5) % 256).astype(np.uint8), (n, h, w))
    frames = np.stack([red, np.zeros_like(red), np.full_like(red, 64)], axis=-1)
    sr = 44100
    audio = (
        0.5 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)
    ).astype(np.float32)
    media.write_video(path, frames.copy(), fps=25.0, audio=audio, audio_sample_rate=sr)
    return path, frames, audio


def test_probe(test_video):
    path, frames, audio = test_video
    info = media.probe(path)
    assert info["has_video"] and info["has_audio"]
    assert (info["width"], info["height"]) == (128, 96)
    assert info["audio_sample_rate"] == 44100
    assert info["duration"] == pytest.approx(2.0, abs=0.1)


def test_read_roundtrip(test_video):
    path, frames, audio = test_video
    fr, au, info = media.read_video(path, fps=25.0, sample_rate=44100)
    assert fr.shape[1:] == (96, 128, 3)
    assert abs(fr.shape[0] - 50) <= 1
    # codec-lossy but close
    err = np.abs(
        fr[0, :, :, 0].astype(float) - frames[0, :, :, 0].astype(float)
    ).mean()
    assert err < 6.0
    # audio correlation with the original sine
    L = min(au.shape[1], len(audio))
    corr = np.corrcoef(au[0, 2000:L], audio[2000:L])[0, 1]
    assert corr > 0.98


def test_min_side_scaling(test_video):
    path, _, _ = test_video
    fr, _, _ = media.read_video(path, min_side=48, want_audio=False)
    assert min(fr.shape[1], fr.shape[2]) == 48
    # aspect preserved (128/96 = 4/3)
    assert fr.shape[2] == pytest.approx(fr.shape[1] * 4 / 3, abs=2)


def test_fps_downsample(test_video):
    path, _, _ = test_video
    fr, _, info = media.read_video(path, fps=5.0, want_audio=False)
    assert abs(fr.shape[0] - 10) <= 1
    assert info["video_fps"] == 5.0


def test_time_window(test_video):
    path, _, _ = test_video
    fr, au, _ = media.read_video(path, start=1.0, duration=0.5, fps=25.0)
    assert abs(fr.shape[0] - 13) <= 2


def test_reencode_contract(test_video, tmp_path):
    path, _, _ = test_video
    dst = tmp_path / "re.mp4"
    media.reencode(path, dst, fps=25, min_side=64, sample_rate=44100)
    info = media.probe(dst)
    assert min(info["width"], info["height"]) == 64
    assert info["audio_sample_rate"] == 44100
    assert info["audio_channels"] == 1
