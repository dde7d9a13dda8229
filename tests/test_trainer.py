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
