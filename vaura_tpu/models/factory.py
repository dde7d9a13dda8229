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


def build_system(model_cfg: Dict[str, Any]) -> VauraSystem:
    """Reference ``VAURAModel.__init__`` wiring (``vaura_model.py:28-122``)
    as a pure factory."""
    use_vis = model_cfg.get("use_visual_conditioning", True)

    sampler_spec = instantiate_from_config(model_cfg["sampler_config"])
    assert isinstance(sampler_spec, SamplerConfig), type(sampler_spec)

    dac_spec = instantiate_from_config(model_cfg["audio_encoder_config"])
    dac_config = dac_spec.config if isinstance(dac_spec, DacSpec) else dac_spec
    assert isinstance(dac_config, DacConfig)

    encoder_config: Optional[MotionFormerConfig] = None
    if use_vis and model_cfg.get("feature_extractor_config") is not None:
        enc = instantiate_from_config(model_cfg["feature_extractor_config"])
        assert isinstance(enc, MotionFormerConfig), type(enc)
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

    return VauraSystem(
        sampler_config=sampler_spec,
        dac_config=dac_config,
        encoder_config=encoder_config,
        pattern_provider=pattern_provider,
        bridge=bridge,
        use_visual_conditioning=use_vis,
        freeze_feature_extractor=model_cfg.get("freeze_feature_extractor", False),
        flatten_vis_feats=model_cfg.get("flatten_vis_feats", False),
    )
