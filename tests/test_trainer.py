"""Trainer loop smoke test on CPU: fit over the dummy datamodule with the
tiny system (fast_dev_run), exercising checkpoint save, frozen-subtree
persistence, validation, and the test action."""

import jax
import numpy as np
import pytest

from vaura_tpu.data.dummy import DummyDataModule
from vaura_tpu.models.vaura import VauraSystem
from vaura_tpu.train.loop import Trainer
from vaura_tpu.utils.experiment import init_log_directory

from tests.test_system import DAC_TINY, ENC_TINY, SAMPLER_TINY


@pytest.mark.slow
def test_fit_and_test(tmp_path):
    system = VauraSystem(
        sampler_config=SAMPLER_TINY,
        dac_config=DAC_TINY,
        encoder_config=ENC_TINY,
        freeze_feature_extractor=True,
    )
    params = system.init_params(
        jax.random.PRNGKey(0), frames_per_segment=4, frame_hw=16
    )
    dm = DummyDataModule(
        batch_size=2,
        frame_shape=(16, 16),
        video_length=0.64,
        sample_rate_audio=400,
        sample_rate_video=25.0,
        frames_per_clip=4,
        num_clips=4,
    )
    dm.setup()
    dirs = init_log_directory(tmp_path / "logs", "tiny-test", run_name="run")
    trainer_cfg = {
        "fast_dev_run": 2,
        "max_epochs": 1,
        "early_stop_patience": 3,
        "gradient_clip_val": 1.0,
    }
    model_cfg = {"learning_rate": 1e-3, "weight_decay": 0.0}
    trainer = Trainer(system, trainer_cfg, model_cfg, dirs)
    result = trainer.fit(params, dm, jax.random.PRNGKey(1))
    assert int(result["state"].step) == 2
    # checkpoints written: frozen + one epoch ckpt + last
    ckpts = list(dirs["checkpoints"].iterdir())
    names = {p.name for p in ckpts}
    assert "frozen" in names
    assert any(n.startswith("epoch=") for n in names)
    assert "last" in names
    # test action runs
    metrics = trainer.test(
        result["state"].params, result["frozen"], dm, jax.random.PRNGKey(2)
    )
    assert np.isfinite(metrics["test_loss"])


def test_early_stopping_logic():
    from vaura_tpu.train.loop import EarlyStopping

    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(0.9)
    assert not es.update(0.95)  # 1st bad epoch
    assert es.update(0.99)  # 2nd bad epoch -> stop


@pytest.mark.slow
def test_tb_media_logging_paths(tmp_path, monkeypatch):
    """The TB media hooks (tracked-file audio, predict sample,
    attention-weight video) are try/except-guarded — a regression there
    only warns. Drive both hooks directly and fail on any warning."""
    from pathlib import Path

    import vaura_tpu.train.loop as loop_mod
    from vaura_tpu.train.steps import split_params

    system = VauraSystem(
        sampler_config=SAMPLER_TINY,
        dac_config=DAC_TINY,
        encoder_config=ENC_TINY,
        freeze_feature_extractor=True,
    )
    params = system.init_params(
        jax.random.PRNGKey(0), frames_per_segment=4, frame_hw=16
    )
    dm = DummyDataModule(
        batch_size=2,
        frame_shape=(16, 16),
        video_length=0.64,
        sample_rate_audio=400,
        sample_rate_video=25.0,
        frames_per_clip=4,
        num_clips=4,
    )
    dm.setup()
    dirs = init_log_directory(tmp_path / "logs", "tiny-media", run_name="run")
    trainer = Trainer(
        system,
        {"max_epochs": 1},
        {
            "learning_rate": 1e-3,
            "weight_decay": 0.0,
            "return_attention_weights": True,
        },
        dirs,
    )
    warnings_seen = []
    monkeypatch.setattr(
        loop_mod.logger, "warning",
        lambda *a, **k: warnings_seen.append(a),
    )
    trainable, frozen = split_params(system, params)
    batch = next(iter(dm.train_dataloader()))
    stem = Path(str(batch["meta"]["filepath"][0])).stem
    trainer.model_cfg["files_to_track_during_training"] = [stem]
    trainer._log_tracked_files(trainable, frozen, batch, step=1)
    trainer._log_predict_media(
        trainable, frozen, dm, jax.random.PRNGKey(3), step=1
    )
    assert not warnings_seen, f"media logging fell back: {warnings_seen}"
    # jit caches populated (the hooks run compiled, not op-by-op)
    assert getattr(trainer, "_tracked_jit", {})
    assert getattr(trainer, "_predict_gen_jit", {})
    assert getattr(trainer, "_attn_jit", {})
