"""Offline tool contract tests: the GreatestHit preprocessor
(``scripts/preprocess_greatest_hit.py``, reference
``scripts/preprocess_greatest_hit.py``) and the A+V muxer
(``scripts/generate_video.py``, reference ``scripts/generate_video.py``)
driven end-to-end on synthetic media through their real CLIs."""

import sys
import wave
from pathlib import Path

import numpy as np
import pytest

from vaura_tpu.data import media

pytestmark = pytest.mark.skipif(
    not media.available(), reason="native media module unavailable"
)

REPO = Path(__file__).resolve().parents[1]
FPS = 25.0
SR = 44100


def _time_coded_video(path: Path, seconds: float) -> None:
    """Every frame's red channel equals its frame index (mod 250), so a
    clip's source window is recoverable from pixel values."""
    n, h, w = int(seconds * FPS), 64, 96
    t = (np.arange(n)[:, None, None] % 250).astype(np.uint8)
    red = np.broadcast_to(t, (n, h, w))
    frames = np.stack([red, np.zeros_like(red), np.zeros_like(red)], axis=-1)
    audio = (
        0.1 * np.sin(2 * np.pi * 440 * np.arange(int(seconds * SR)) / SR)
    ).astype(np.float32)
    media.write_video(path, frames.copy(), fps=FPS, audio=audio,
                      audio_sample_rate=SR)


def _run_cli(module_main, argv) -> None:
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


def test_preprocess_greatest_hit_annotations(tmp_path):
    from scripts.preprocess_greatest_hit import main

    src_dir, out_dir = tmp_path / "src", tmp_path / "out"
    src_dir.mkdir()
    _time_coded_video(src_dir / "vid1_denoised.mp4", 8.0)
    # two in-range hits (one early: start clamps to 0) + one past EOF
    (src_dir / "vid1_times.txt").write_text(
        "0.5 wood hit\n4.0 metal scratch\n99.0 x y\n"
    )
    _run_cli(main, [
        "preprocess_greatest_hit.py", str(src_dir), str(out_dir),
        "--tactic", "annotations", "--clip-duration", "2.56",
        "--min-side", "48",
    ])
    clips = sorted(out_dir.glob("*.mp4"))
    assert [c.name for c in clips] == [
        "vid1_denoised_0_wood_hit.mp4",
        "vid1_denoised_1_metal_scratch.mp4",
    ]
    for clip, want_start in zip(clips, [0.0, 4.0 - 1.28]):
        frames, audio, info = media.read_video(clip, sample_rate=SR)
        assert abs(frames.shape[0] - 64) <= 2  # 2.56 s @ 25 fps
        # short-clip container timestamps make the probed fps approximate
        assert info["video_fps"] == pytest.approx(FPS, rel=0.05)
        assert audio is not None and audio.shape[1] > 2.3 * SR
        # the time-coded red channel pins the source window
        got_idx = float(frames[0, :, :, 0].mean())
        # x264 PTS delay shifts frame timestamps vs raw index by a few
        # frames; the window must land within ~0.25 s of the hit-centered
        # start (vs 1.5-4 s error if centering/clamping were wrong)
        assert abs(got_idx - want_start * FPS) < 6.0, (clip, got_idx)


def test_preprocess_greatest_hit_dummy_spacing(tmp_path):
    from scripts.preprocess_greatest_hit import main

    src_dir, out_dir = tmp_path / "src", tmp_path / "out"
    src_dir.mkdir()
    _time_coded_video(src_dir / "v_denoised.mp4", 6.0)
    _run_cli(main, [
        "preprocess_greatest_hit.py", str(src_dir), str(out_dir),
        "--tactic", "dummy", "--clip-duration", "2.56", "--min-side", "48",
    ])
    # floor(6.0 / 2.56) = 2 uniformly spaced clips
    assert len(list(out_dir.glob("*.mp4"))) == 2


def test_generate_video_mux(tmp_path):
    from scripts.generate_video import main

    vid_dir, wav_dir, out_dir = (
        tmp_path / "v", tmp_path / "w", tmp_path / "o"
    )
    vid_dir.mkdir(), wav_dir.mkdir()
    _time_coded_video(vid_dir / "clip.mp4", 2.0)
    gen = (0.2 * np.sin(
        2 * np.pi * 880 * np.arange(int(2.0 * SR)) / SR
    )).astype(np.float32)
    with wave.open(str(wav_dir / "clip.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((gen * 32767).astype(np.int16).tobytes())
    # a WAV with no source video is skipped, not fatal
    (wav_dir / "orphan.wav").write_bytes((wav_dir / "clip.wav").read_bytes())

    _run_cli(main, [
        "generate_video.py", str(vid_dir), str(wav_dir), str(out_dir),
    ])
    out = out_dir / "clip.mp4"
    assert out.exists() and not (out_dir / "orphan.mp4").exists()
    frames, audio, info = media.read_video(out, sample_rate=SR)
    src_frames, _, _ = media.read_video(
        vid_dir / "clip.mp4", want_audio=False
    )
    assert frames.shape[0] == src_frames.shape[0]  # video untouched
    # the muxed track is the generated 880 Hz tone, not the source 440 Hz
    seg = audio[0, SR // 2: SR // 2 + 4096].astype(np.float64)
    t = np.arange(len(seg)) / SR
    def tone_power(f):
        return np.hypot(seg @ np.cos(2 * np.pi * f * t),
                        seg @ np.sin(2 * np.pi * f * t))
    assert tone_power(880.0) > 10 * tone_power(440.0)
