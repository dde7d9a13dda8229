"""Reference-config compatibility: assemble the *actual* reference YAML
files (mounted read-only at /root/reference) through our config engine and
build the system from them — target strings like
``models.modules.sampler.llama.Transformer`` and torchvision transform
targets must resolve through the registry aliases unchanged."""

from pathlib import Path

import pytest

from vaura_tpu.config import assemble_config, instantiate_from_config
from vaura_tpu.models.factory import build_system

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference repo not mounted"
)


def test_reference_main_experiment_builds():
    cfg_path = (
        REF / "configs/experiments/vggsound/avclip/"
        "9cb-viscond-avclip-channel_concat-llama.yaml"
    )
    cfg = assemble_config(
        [f"config={cfg_path}"],
        defaults_path=REF / "configs" / "vaura_defaults.yaml",
        base_dir=REF,
    )
    assert cfg["action"] == "train"
    assert cfg["model"]["sampler_config"]["target"] == (
        "models.modules.sampler.llama.Transformer"
    )
    system = build_system(cfg["model"])
    assert system.sampler_config.num_layers == 24
    assert system.sampler_config.d_model == 1536
    assert system.sampler_config.num_codebooks == 9
    assert system.sampler_config.nhead == 16
    assert system.sampler_config.cond_dim == 512  # d_model // channel_scaler 3
    assert system.dac_config.sample_rate == 44100
    assert system.freeze_feature_extractor is True
    assert type(system.pattern_provider).__name__ == "DelayedPatternProvider"


def test_reference_generate_config_loads():
    cfg = assemble_config(
        [f"config={REF / 'configs/generate_vgg.yaml'}"],
        defaults_path=REF / "configs" / "vaura_defaults.yaml",
        base_dir=REF,
    )
    assert cfg["action"] == "generate"
    assert cfg["cfg_scale"] == 6.0
    assert cfg["top_k"] == 128
    assert cfg["dataloader"]["samples_per_video"] == 5
    # the torchvision transform targets in the dataloader block resolve
    # to our numpy transforms
    tf_cfgs = cfg["dataloader"]["video_transforms_test"]
    transforms = [instantiate_from_config(c) for c in tf_cfgs]
    import numpy as np

    from vaura_tpu.data.transforms import Compose

    pipeline = Compose(transforms)
    frames = np.zeros((4, 64, 80, 3), dtype=np.uint8)
    out = pipeline(frames)
    assert out.shape[-3:] == (224, 224, 3) or out.shape[-2:] == (224, 224)


def _all_reference_experiment_configs():
    if not REF.exists():
        return []
    return sorted((REF / "configs" / "experiments").rglob("*.yaml"))


@pytest.mark.parametrize(
    "cfg_path",
    _all_reference_experiment_configs(),
    ids=lambda p: p.stem,
)
def test_every_reference_experiment_config_builds(cfg_path):
    """Every training config shipped by the reference (including the
    ImageBind-filtering study variants) assembles and builds a system
    through our registry aliases without edits."""
    cfg = assemble_config(
        [f"config={cfg_path}"],
        defaults_path=REF / "configs" / "vaura_defaults.yaml",
        base_dir=REF,
    )
    system = build_system(cfg["model"])
    assert system.sampler_config.num_codebooks == 9


@pytest.mark.parametrize(
    "name",
    ["generate_vgg", "generate_vas", "generate_vgg_sparse", "generate_visualsound"],
)
def test_every_reference_generate_config_loads(name):
    cfg = assemble_config(
        [f"config={REF / 'configs' / (name + '.yaml')}"],
        defaults_path=REF / "configs" / "vaura_defaults.yaml",
        base_dir=REF,
    )
    assert cfg["action"] == "generate"
    for c in cfg["dataloader"]["video_transforms_test"]:
        assert instantiate_from_config(c) is not None


def test_reference_defaults_interpolations():
    cfg = assemble_config(
        [
            f"config={REF / 'configs/experiments/vggsound/avclip/9cb-viscond-avclip-channel_concat-llama.yaml'}",
            "dataloader.batch_size=4",
        ],
        defaults_path=REF / "configs" / "vaura_defaults.yaml",
        base_dir=REF,
    )
    # cross-section interpolation + negation from the reference defaults
    assert cfg["model"]["batch_size"] == 4
    assert cfg["dataloader"]["partition_audio_to_clips"] == (
        not cfg["model"]["flatten_vis_feats"]
    )
