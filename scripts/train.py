"""Train action (reference ``scripts/train.py``): build datamodule + system,
fit with the TPU Trainer, then run the test loop on the best checkpoint."""

from __future__ import annotations

import logging

import jax

from vaura_tpu.data import get_datamodule_from_type
from vaura_tpu.models.factory import build_system
from vaura_tpu.train.loop import Trainer
from vaura_tpu.utils.experiment import init_log_directory, save_hparams
from vaura_tpu.utils.seeding import seed_everything

logger = logging.getLogger(__name__)


def train(cfg: dict) -> dict:
    logging.basicConfig(level=logging.INFO)
    logging.getLogger().setLevel(logging.INFO)
    trainer_cfg = cfg["trainer"]
    model_cfg = cfg["model"]
    dirs = init_log_directory(
        trainer_cfg.get("log_dir", "./logs"), trainer_cfg["experiment_name"]
    )
    save_hparams(dirs["experiment"], cfg)
    logger.info("Logging to %s", dirs["root"])

    datamodule = get_datamodule_from_type(
        cfg["dataloader"]["dataset_type"], cfg["dataloader"]
    )
    datamodule.setup()

    system = build_system(model_cfg, precision=trainer_cfg.get("precision"))
    rng = seed_everything(int(trainer_cfg.get("seed", 666)))
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    from vaura_tpu.models.factory import maybe_load_pretrained

    params = maybe_load_pretrained(params, model_cfg)
    params = system.load_dac_embeddings_into_sampler(params)

    mesh = None
    mesh_cfg = trainer_cfg.get("mesh") or {}
    if jax.device_count() > 1:
        from vaura_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            data=int(mesh_cfg.get("data", -1)),
            fsdp=int(mesh_cfg.get("fsdp", 1)),
            model=int(mesh_cfg.get("model", 1)),
        )
        batch_ways = mesh.shape["data"] * mesh.shape["fsdp"]
        batch_size = int(cfg["dataloader"].get("batch_size", 1))
        if batch_size % batch_ways != 0:
            logger.warning(
                "batch_size %d not divisible by data*fsdp=%d; "
                "running unsharded", batch_size, batch_ways,
            )
            mesh = None
        else:
            logger.info("Mesh: %s", dict(mesh.shape))

    trainer = Trainer(system, trainer_cfg, model_cfg, dirs, mesh=mesh)
    result = trainer.fit(
        params, datamodule, rng, resume_path=trainer_cfg.get("ckpt_path")
    )
    # test with the best checkpoint (reference scripts/train.py:94)
    from vaura_tpu.train.checkpoint import abstract_like

    state = result["state"]
    try:
        best = trainer.ckpt.restore_best(
            {"params": abstract_like(state.params),
             "opt_state": abstract_like(state.opt_state),
             "step": abstract_like(state.step)}
        )
        best_params = best["params"]
    except Exception as e:  # no ckpt / slow or failed restore: test in-memory
        logger.warning("best-ckpt restore failed (%s); testing current params", e)
        best_params = state.params
    rng, test_rng = jax.random.split(result["rng"])
    metrics = trainer.test(best_params, result["frozen"], datamodule, test_rng)
    logger.info("test: %s", metrics)
    return {"dirs": dirs, "metrics": metrics}
