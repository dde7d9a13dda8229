"""Finetune action: continue training from a converted checkpoint.

The reference leaves this unimplemented (``main.py:114-115`` raises
NotImplementedError; ``scripts/test.py`` carries vestigial LoRA kwargs).
Here: load pretrained weights (a tree from
``scripts/convert_checkpoints.py`` or a training run's checkpoint), reset
the optimizer, optionally unfreeze the visual encoder, and run the normal
training loop.

Config: ``finetune.init_from`` (path), ``finetune.unfreeze_encoder``
(bool). Everything else follows the train action.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax

from vaura_tpu.data import get_datamodule_from_type
from vaura_tpu.models.factory import build_system, maybe_load_pretrained
from vaura_tpu.train.checkpoint import abstract_like
from vaura_tpu.train.loop import Trainer
from vaura_tpu.utils.experiment import init_log_directory, save_hparams
from vaura_tpu.utils.seeding import seed_everything

logger = logging.getLogger(__name__)


def finetune(cfg: dict) -> dict:
    logging.basicConfig(level=logging.INFO)
    logging.getLogger().setLevel(logging.INFO)
    trainer_cfg = cfg["trainer"]
    model_cfg = dict(cfg["model"])
    ft_cfg = cfg.get("finetune") or {}
    if ft_cfg.get("unfreeze_encoder"):
        model_cfg["freeze_feature_extractor"] = False
    # LoRA finetuning: finetune.lora_rank > 0 trains low-rank adapters on
    # the sampler kernels only (vaura_tpu/train/lora.py); the base weights
    # stay frozen and out of the per-run checkpoints
    for key in ("lora_rank", "lora_target_modules", "lora_alpha"):
        if ft_cfg.get(key) is not None:
            model_cfg[key] = ft_cfg[key]
    # hparams must carry the effective model config (incl. lora keys) so
    # generate/test rebuild the same system from the experiment dir
    cfg = dict(cfg)
    cfg["model"] = model_cfg

    dirs = init_log_directory(
        trainer_cfg.get("log_dir", "./logs"),
        trainer_cfg.get("experiment_name", "finetune"),
    )
    save_hparams(dirs["experiment"], cfg)

    datamodule = get_datamodule_from_type(
        cfg["dataloader"]["dataset_type"], cfg["dataloader"]
    )
    datamodule.setup()

    system = build_system(model_cfg, precision=trainer_cfg.get("precision"))
    rng = seed_everything(int(trainer_cfg.get("seed", 666)))
    rng, init_rng = jax.random.split(rng)
    params = system.init_params(init_rng)
    params = maybe_load_pretrained(params, model_cfg)
    params = system.load_dac_embeddings_into_sampler(params)

    init_from = ft_cfg.get("init_from")
    if init_from:
        from vaura_tpu.train.checkpoint import restore_trainable_params

        # base checkpoints never contain adapters: restore everything else
        base_params = {k: v for k, v in params.items() if k != "lora_sampler"}
        try:
            # converted full tree ({sampler, dac, encoder})
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            loaded = ckptr.restore(
                Path(init_from).resolve(), abstract_like(base_params)
            )
            params.update({k: v for k, v in loaded.items() if v is not None})
        except Exception:
            from vaura_tpu.train.steps import split_params

            template, _ = split_params(system, params)
            if "lora_sampler" in template:
                # a prior run's ckpt holds base weights, not adapters
                template = {"sampler": params["sampler"]}
            params.update(
                restore_trainable_params(
                    init_from, template, model_cfg, trainer_cfg
                )
            )
        logger.info("finetuning from %s", init_from)
    else:
        logger.warning("finetune.init_from not set: training from scratch")
    if int(model_cfg.get("lora_rank", 0) or 0) > 0:
        from vaura_tpu.train.lora import count_lora_params

        logger.info(
            "LoRA finetuning: rank %s, %d adapter params",
            model_cfg["lora_rank"],
            count_lora_params(params["lora_sampler"]),
        )

    trainer = Trainer(system, trainer_cfg, model_cfg, dirs)
    result = trainer.fit(params, datamodule, rng)
    rng, test_rng = jax.random.split(result["rng"])
    metrics = trainer.test(
        result["state"].params, result["frozen"], datamodule, test_rng
    )
    logger.info("finetune test: %s", metrics)
    return {"dirs": dirs, "metrics": metrics}
