"""Bridges (reference ``models/modules/misc/bridges.py``) and the
re-encoder CLI (reference ``scripts/reencode_videos.py``): registry
construction, forward shapes/semantics, and the 25fps/min-side/44.1kHz
media contract through the real CLI."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _build(target, params):
    # the package front door registers the reference-target aliases
    from vaura_tpu.config import instantiate_from_config

    return instantiate_from_config({"target": target, "params": params})


def test_identity_bridge_via_reference_targets():
    for target in ("torch.nn.Identity",
                   "models.modules.misc.bridges.BridgeBase"):
        bridge = _build(target, {})
        x = jnp.arange(12.0).reshape(2, 6)
        p = bridge.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(bridge.apply(p, x)),
                                      np.asarray(x))


def test_mlp_bridge_shapes_and_activation():
    bridge = _build(
        "models.modules.misc.bridges.MLPBridge",
        {"input_dim": 8, "hidden_dim": 16, "output_dim": 4,
         "activation": "relu"},
    )
    x = jnp.ones((2, 5, 8))
    p = bridge.init(jax.random.PRNGKey(0), x)
    out = bridge.apply(p, x)
    assert out.shape == (2, 5, 4)
    assert p["params"]["fc1"]["kernel"].shape == (8, 16)
    assert p["params"]["fc2"]["kernel"].shape == (16, 4)
    with pytest.raises(KeyError):
        _build("models.modules.misc.bridges.MLPBridge",
               {"input_dim": 8, "hidden_dim": 16, "output_dim": 4,
                "activation": "nope"}).init(jax.random.PRNGKey(0), x)


def test_conv_bridges_keep_torch_layout():
    b3 = _build("models.modules.misc.bridges.ConvBridgeVisual",
                {"in_channels": 6, "out_channels": 10})
    x3 = jnp.ones((2, 6, 3, 4, 5))  # [B, C, T, H, W]
    p3 = b3.init(jax.random.PRNGKey(0), x3)
    assert b3.apply(p3, x3).shape == (2, 10, 3, 4, 5)

    b2 = _build("models.modules.misc.bridges.ConvBridge2D",
                {"in_channels": 6, "out_channels": 7,
                 "kernel_size": (3, 3), "stride": (2, 2)})
    x2 = jnp.ones((2, 6, 8, 8))  # [B, C, H, W]
    p2 = b2.init(jax.random.PRNGKey(0), x2)
    assert b2.apply(p2, x2).shape == (2, 7, 4, 4)


def test_reencode_cli_contract(tmp_path):
    from vaura_tpu.data import media

    if not media.available():
        pytest.skip("native media module unavailable")
    from scripts.reencode_videos import main

    src_dir, out_dir = tmp_path / "in", tmp_path / "out"
    src_dir.mkdir()
    # off-contract source: 30 fps, 160x120, 22.05 kHz audio
    n, h, w, sr = 45, 120, 160, 22050
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
    frames = np.broadcast_to(base, (n, h, w, 3)).copy()
    audio = (0.1 * np.sin(
        2 * np.pi * 440 * np.arange(int(1.5 * sr)) / sr
    )).astype(np.float32)
    media.write_video(src_dir / "a.mp4", frames, fps=30.0, audio=audio,
                      audio_sample_rate=sr)
    media.write_video(src_dir / "b.mp4", frames, fps=30.0, audio=audio,
                      audio_sample_rate=sr)

    old = sys.argv
    sys.argv = ["reencode_videos.py", str(src_dir), str(out_dir),
                "--min-side", "64", "--workers", "1"]
    try:
        main()
    finally:
        sys.argv = old

    for name in ("a.mp4", "b.mp4"):
        info = media.probe(out_dir / name)
        assert info["has_video"] and info["has_audio"]
        assert info["audio_sample_rate"] == 44100
        assert min(info["width"], info["height"]) == 64
        assert info["video_fps"] == pytest.approx(25.0, rel=0.05)
