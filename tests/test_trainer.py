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


@pytest.mark.slow
def test_resume_continues_epochs(tmp_path):
    """Resuming from a checkpoint continues at the saved epoch with the
    early-stop callback state restored (reference: Lightning ckpt_path
    resume restores model+optimizer+epoch, scripts/train.py:93)."""
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
        num_clips=2,
    )
    dm.setup()
    trainer_cfg = {
        "max_epochs": 2,
        "limit_train_batches": 1,
        "limit_val_batches": 1,
        "limit_test_batches": 1,
        "early_stop_patience": 10,
    }
    model_cfg = {"learning_rate": 1e-3, "weight_decay": 0.0}
    dirs = init_log_directory(tmp_path / "logs", "resume-test", run_name="a")
    t1 = Trainer(system, trainer_cfg, model_cfg, dirs)
    r1 = t1.fit(params, dm, jax.random.PRNGKey(1))
    assert int(r1["state"].step) == 2  # 2 epochs x 1 batch
    from vaura_tpu.train.checkpoint import CheckpointManager

    last = dirs["checkpoints"] / "last"
    meta1 = CheckpointManager.read_meta(last)
    assert meta1["epoch"] == 1

    # resume into a fresh run dir with a higher epoch budget: exactly one
    # more epoch (2) runs, and its checkpoint carries the resumed state
    dirs2 = init_log_directory(tmp_path / "logs", "resume-test", run_name="b")
    cfg2 = dict(trainer_cfg, max_epochs=3)
    t2 = Trainer(system, cfg2, model_cfg, dirs2)
    # fresh param buffers: the first fit's train_step donated the originals
    params2 = system.init_params(
        jax.random.PRNGKey(0), frames_per_segment=4, frame_hw=16
    )
    r2 = t2.fit(params2, dm, jax.random.PRNGKey(2), resume_path=str(last))
    assert int(r2["state"].step) == 3  # one more epoch, not three
    meta2 = CheckpointManager.read_meta(dirs2["checkpoints"] / "last")
    assert meta2["epoch"] == 2
    # early-stop state is monotone across the resumed epoch
    assert meta2["early_stop_best"] <= meta1["early_stop_best"]
    # exact-restore check: a fit whose epoch budget is already exhausted
    # (start_epoch == max_epochs) runs zero epochs, so the early-stop state
    # after fit is exactly what resume restored from the checkpoint meta
    dirs3 = init_log_directory(tmp_path / "logs", "resume-test", run_name="c")
    t3 = Trainer(system, dict(trainer_cfg, max_epochs=2), model_cfg, dirs3)
    params3 = system.init_params(
        jax.random.PRNGKey(0), frames_per_segment=4, frame_hw=16
    )
    t3.fit(params3, dm, jax.random.PRNGKey(3), resume_path=str(last))
    assert t3.early_stop.best == meta1["early_stop_best"]
    assert t3.early_stop.count == meta1["early_stop_count"]


@pytest.mark.slow
def test_emergency_resume_reruns_interrupted_epoch(tmp_path):
    """Resuming from an emergency crash checkpoint (epoch N interrupted)
    re-runs epoch N instead of skipping its remainder, and restores the
    early-stop state the crash save carried (advisor r3; the reference's
    Lightning resume re-runs the in-progress epoch)."""
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
        batch_size=2, frame_shape=(16, 16), video_length=0.64,
        sample_rate_audio=400, sample_rate_video=25.0,
        frames_per_clip=4, num_clips=2,
    )
    dm.setup()
    trainer_cfg = {
        "max_epochs": 1, "limit_train_batches": 1, "limit_val_batches": 1,
        "early_stop_patience": 10,
    }
    model_cfg = {"learning_rate": 1e-3, "weight_decay": 0.0}
    dirs = init_log_directory(tmp_path / "logs", "em-resume", run_name="a")
    t1 = Trainer(system, trainer_cfg, model_cfg, dirs)
    r1 = t1.fit(params, dm, jax.random.PRNGKey(1))
    assert int(r1["state"].step) == 1
    # simulate a crash during epoch 1: emergency save carries the callback
    # state and marks epoch 1 incomplete
    em = t1.ckpt.save_emergency(
        r1["state"], epoch=1,
        metadata={"early_stop_best": t1.early_stop.best,
                  "early_stop_count": t1.early_stop.count},
    )
    dirs2 = init_log_directory(tmp_path / "logs", "em-resume", run_name="b")
    t2 = Trainer(system, dict(trainer_cfg, max_epochs=2), model_cfg, dirs2)
    params2 = system.init_params(
        jax.random.PRNGKey(0), frames_per_segment=4, frame_hw=16
    )
    r2 = t2.fit(params2, dm, jax.random.PRNGKey(2), resume_path=str(em))
    # epoch 1 re-ran (a completed-epoch ckpt at epoch=1 would run nothing)
    assert int(r2["state"].step) == 2
    # early-stop state was restored (not reset to +inf) before the re-run
    assert t2.early_stop.best <= t1.early_stop.best


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
