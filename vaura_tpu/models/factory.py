"""Config -> VauraSystem assembly.

Consumes the reference's ``model`` config block (``configs/
vaura_defaults.yaml``: ``sampler_config`` / ``audio_encoder_config`` /
``feature_extractor_config`` / ``visual_bridge_config`` /
``pattern_provider_config`` as ``{target, params}`` dicts, plus the flat
flags) and builds the TPU-native system. Reference-style target strings
resolve through the registry aliases (``vaura_tpu.config.registry``), so
configs written for the reference work unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from vaura_tpu.config import instantiate_from_config
from vaura_tpu.models.dac.model import DacConfig, DacSpec
from vaura_tpu.models.motionformer import MotionFormerConfig
from vaura_tpu.models.sampler import SamplerConfig
from vaura_tpu.models.vaura import VauraSystem


def build_system(
    model_cfg: Dict[str, Any], precision: Optional[str] = None
) -> VauraSystem:
    """Reference ``VAURAModel.__init__`` wiring (``vaura_model.py:28-122``)
    as a pure factory. ``precision``: 'bf16' (default) or 'f32' sets the
    compute dtype of the sampler/encoder (params stay f32) — the analogue
    of the reference's Lightning ``precision: 16-mixed`` knob."""
    import dataclasses

    import jax.numpy as jnp

    use_vis = model_cfg.get("use_visual_conditioning", True)

    sampler_spec = instantiate_from_config(model_cfg["sampler_config"])
    assert isinstance(sampler_spec, SamplerConfig), type(sampler_spec)
    dtype = None
    if precision is not None:
        dtype = {
            "bf16": jnp.bfloat16,
            "16-mixed": jnp.bfloat16,
            "f32": jnp.float32,
            "32": jnp.float32,
            32: jnp.float32,
        }.get(precision)
    if dtype is not None:
        sampler_spec = dataclasses.replace(sampler_spec, dtype=dtype)

    dac_spec = instantiate_from_config(model_cfg["audio_encoder_config"])
    dac_config = getattr(dac_spec, "config", dac_spec)
    assert isinstance(dac_config, DacConfig), type(dac_config)
    if dtype is not None:
        dac_config = dataclasses.replace(dac_config, dtype=dtype)
    # The reference Transformer derives its factored-embedding entry dim
    # from the frozen codec at initialize_embeddings time (llama.py:387-412)
    # — sampler configs (and Lightning hparams) never carry codebook_dim,
    # so sync it from the codec spec here.
    if sampler_spec.codebook_dim != dac_config.codebook_dim:
        sampler_spec = dataclasses.replace(
            sampler_spec, codebook_dim=dac_config.codebook_dim
        )

    encoder_config: Optional[MotionFormerConfig] = None
    if use_vis and model_cfg.get("feature_extractor_config") is not None:
        enc = instantiate_from_config(model_cfg["feature_extractor_config"])
        assert isinstance(enc, MotionFormerConfig), type(enc)
        if dtype is not None:
            enc = dataclasses.replace(enc, dtype=dtype)
        encoder_config = enc

    bridge = None
    if use_vis and model_cfg.get("visual_bridge_config") is not None:
        bridge = instantiate_from_config(model_cfg["visual_bridge_config"])

    pattern_provider = None
    if model_cfg.get("pattern_provider_config") is not None:
        pp_cfg = dict(model_cfg["pattern_provider_config"])
        # reference double-checks n_q against the sampler
        # (vaura_model.py:699-714)
        pp_params = dict(pp_cfg.get("params") or {})
        if pp_params.get("n_q") != sampler_spec.num_codebooks:
            pp_params["n_q"] = sampler_spec.num_codebooks
            pp_cfg["params"] = pp_params
        pattern_provider = instantiate_from_config(pp_cfg)

    lora_targets = model_cfg.get("lora_target_modules")  # reference kwarg name
    if model_cfg.get("lora_finetune_feature_extractor"):
        import logging

        logging.getLogger(__name__).warning(
            "lora_finetune_feature_extractor is accepted for config "
            "compatibility (reference scripts/test.py:63-65) but LoRA "
            "currently targets the sampler only"
        )
    return VauraSystem(
        sampler_config=sampler_spec,
        dac_config=dac_config,
        encoder_config=encoder_config,
        pattern_provider=pattern_provider,
        bridge=bridge,
        use_visual_conditioning=use_vis,
        freeze_feature_extractor=model_cfg.get("freeze_feature_extractor", False),
        flatten_vis_feats=model_cfg.get("flatten_vis_feats", False),
        lora_rank=int(model_cfg.get("lora_rank", 0) or 0),
        lora_targets=tuple(lora_targets) if lora_targets else None,
        lora_alpha=model_cfg.get("lora_alpha"),
    )


def maybe_load_pretrained(params: Dict[str, Any], model_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Load pretrained frozen-submodule weights referenced by the config:
    ``audio_encoder_config.params.ckpt_path`` (DAC) and
    ``feature_extractor_config.params.ckpt_path`` (AVCLIP/MotionFormer).
    Accepts either a pre-converted orbax directory
    (``scripts/convert_checkpoints.py``) or a raw torch checkpoint file
    (converted on the fly)."""
    import logging
    from pathlib import Path

    logger = logging.getLogger(__name__)

    def load_tree(path: Path, key: str):
        if path.is_dir():
            import orbax.checkpoint as ocp

            from vaura_tpu.train.checkpoint import abstract_like

            ckptr = ocp.StandardCheckpointer()
            target = {key: abstract_like(params[key])}
            try:
                return ckptr.restore(path.resolve(), target)[key]
            except Exception:
                return ckptr.restore(path.resolve(), abstract_like(params[key]))
        import torch

        from vaura_tpu.models import convert as C

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt.get("model_state", ckpt))
        if key == "dac":
            return C.convert_dac_state_dict(sd)
        sd = C.strip_avclip_prefix(sd)
        return C.convert_motionformer_state_dict(sd)

    for cfg_key, tree_key in (
        ("audio_encoder_config", "dac"),
        ("feature_extractor_config", "encoder"),
    ):
        sub = model_cfg.get(cfg_key) or {}
        ckpt_path = (sub.get("params") or {}).get("ckpt_path")
        if ckpt_path and tree_key in params:
            try:
                params = dict(params)
                params[tree_key] = load_tree(Path(ckpt_path), tree_key)
                logger.info("loaded pretrained %s from %s", tree_key, ckpt_path)
            except Exception as e:
                logger.warning(
                    "could not load pretrained %s from %s: %s",
                    tree_key, ckpt_path, e,
                )
    return params
