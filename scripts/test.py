"""Test action (reference ``scripts/test.py``): teacher-forced loss over the
test split from a checkpoint. (The reference's test action is broken by
stale lora kwargs — ``scripts/test.py:63-65`` vs ``vaura_model.py:28-48``;
this one works.)"""

from __future__ import annotations

import logging

import jax

from vaura_tpu.data import get_datamodule_from_type
from vaura_tpu.models.factory import build_system
from vaura_tpu.train.checkpoint import CheckpointManager, abstract_like
from vaura_tpu.train.loop import Trainer
from vaura_tpu.train.state import TrainState, make_optimizer
from vaura_tpu.train.steps import split_params
from vaura_tpu.utils.experiment import (
    init_log_directory,
    resolve_best_checkpoint,
    save_hparams,
)
from vaura_tpu.utils.seeding import seed_everything

logger = logging.getLogger(__name__)


def test(cfg: dict) -> dict:
    logging.basicConfig(level=logging.INFO)
    logging.getLogger().setLevel(logging.INFO)
    trainer_cfg = cfg["trainer"]
    model_cfg = cfg["model"]
    dirs = init_log_directory(
        trainer_cfg.get("log_dir", "./logs"),
        trainer_cfg.get("experiment_name", "test"),
    )
    save_hparams(dirs["experiment"], cfg)

    datamodule = get_datamodule_from_type(
        cfg["dataloader"]["dataset_type"], cfg["dataloader"]
    )
    datamodule.setup("test")

    system = build_system(model_cfg, precision=trainer_cfg.get("precision"))
    rng = seed_everything(int(trainer_cfg.get("seed", 666)))
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    params = system.load_dac_embeddings_into_sampler(params)
    trainable, frozen = split_params(system, params)

    ckpt_path = trainer_cfg.get("ckpt_path")
    if ckpt_path:
        from vaura_tpu.train.checkpoint import restore_trainable_params

        trainable = restore_trainable_params(
            ckpt_path, trainable, model_cfg, trainer_cfg
        )
        logger.info("Loaded checkpoint %s", ckpt_path)

    trainer = Trainer(system, trainer_cfg, model_cfg, dirs)
    metrics = trainer.test(trainable, frozen, datamodule, rng)
    logger.info("test: %s", metrics)
    return metrics
