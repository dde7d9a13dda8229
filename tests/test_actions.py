"""Action-level tests on CPU: the full train action (config assembly ->
datamodule -> trainer -> checkpoints -> test loop) and the generate action
over the dummy datamodule — the CLI contracts of reference main.py /
scripts/{train,test,generate}.py."""

from pathlib import Path

import numpy as np
import pytest
import yaml

from vaura_tpu.config import assemble_config

# full CLI actions take minutes each on this 1-CPU box
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def dummy_cfg(tmp_path_factory):
    log_dir = tmp_path_factory.mktemp("logs")
    cfg = assemble_config(
        [
            f"config={REPO / 'configs/experiments/dummy.yaml'}",
            f"trainer.log_dir={log_dir}",
            "trainer.fast_dev_run=2",
        ],
        defaults_path=REPO / "configs" / "vaura_defaults.yaml",
        base_dir=REPO,
    )
    return cfg


def test_train_action(dummy_cfg):
    from scripts.train import train

    result = train(dummy_cfg)
    ckpt_dir = result["dirs"]["checkpoints"]
    assert (ckpt_dir / "frozen").exists()
    assert any(p.name.startswith("epoch=") for p in ckpt_dir.iterdir())
    assert np.isfinite(result["metrics"]["test_loss"])
    # hparams snapshot saved
    hp = result["dirs"]["experiment"] / "hparams.yaml"
    assert hp.exists()
    loaded = yaml.safe_load(hp.read_text())
    assert loaded["action"] == "train"


def test_generate_action(dummy_cfg, tmp_path):
    from scripts.generate import generate

    cfg = dict(dummy_cfg)
    cfg["action"] = "generate"
    cfg["duration"] = 0.15  # ~12 tokens at 86 tok/s
    cfg["model_max_duration"] = 0.64
    cfg["top_k"] = 8
    cfg["cfg_scale"] = 1.5
    cfg["output_dir"] = str(tmp_path / "gen")
    cfg["dataloader"] = dict(cfg["dataloader"])
    cfg["dataloader"]["batch_size"] = 1
    cfg["dataset_to_use"] = "test"
    cfg["max_batches"] = 1
    cfg["return_sampled_indices"] = True
    result = generate(cfg)
    assert result["num_generated"] >= 1
    wavs = list((tmp_path / "gen").glob("*.wav"))
    assert wavs, "no wav written"
    from vaura_tpu.ops.audio import read_wav

    wav, sr = read_wav(wavs[0])
    assert sr == 44100
    assert wav.shape[-1] > 0
    # sampled codebook indices saved for analysis (reference
    # return_sampled_indices, generate.py:316)
    codes_files = list((tmp_path / "gen").glob("*.codes.npy"))
    assert codes_files, "no sampled-indices file written"
    codes = np.load(codes_files[0])
    assert codes.ndim == 2 and codes.shape[0] >= 1  # [K, T]


def test_generate_action_gt_roundtrip_and_prompt(dummy_cfg, tmp_path):
    """save_original_files writes the DAC-round-tripped GT audio as
    {fn}_original.wav next to the generated clip (reference
    generate.py:181-182,286-301,428-440); prompt_duration feeds the first
    N seconds of GT audio back as prompt codes (audio-prompted generation,
    reference vaura_model.py:455-469 — never CLI-exposed there)."""
    from scripts.generate import generate

    cfg = dict(dummy_cfg)
    cfg["action"] = "generate"
    cfg["duration"] = 0.15
    cfg["model_max_duration"] = 0.64
    cfg["top_k"] = 8
    cfg["output_dir"] = str(tmp_path / "gen_gt")
    cfg["dataloader"] = dict(cfg["dataloader"])
    cfg["dataloader"]["batch_size"] = 1
    cfg["dataset_to_use"] = "test"
    cfg["max_batches"] = 1
    cfg["save_original_files"] = True
    cfg["compress_original_audio"] = True
    cfg["prompt_duration"] = 0.05  # ~4 prompt tokens
    result = generate(cfg)
    assert result["num_generated"] >= 1
    out = tmp_path / "gen_gt"
    gen_wavs = [p for p in out.glob("*.wav") if "_original" not in p.name]
    gt_wavs = list(out.glob("*_original.wav"))
    assert gen_wavs and gt_wavs, sorted(p.name for p in out.iterdir())
    from vaura_tpu.ops.audio import read_wav

    wav, sr = read_wav(gt_wavs[0])
    assert sr == 44100 and wav.shape[-1] > 0


def test_finetune_action(dummy_cfg, tmp_path):
    """Finetune: init from a prior run's best checkpoint, fresh optimizer."""
    from scripts.finetune import finetune
    from scripts.train import train

    first = train(dummy_cfg)
    from vaura_tpu.utils.experiment import resolve_best_checkpoint

    best = resolve_best_checkpoint(first["dirs"]["checkpoints"])
    cfg = dict(dummy_cfg)
    cfg["finetune"] = {"init_from": str(best)}
    result = finetune(cfg)
    assert np.isfinite(result["metrics"]["test_loss"])


def test_train_then_generate_from_experiment(dummy_cfg, tmp_path):
    """The reference's main workflow: train, then generate pointing at the
    experiment directory (hparams + best checkpoint resolved automatically,
    reference scripts/generate.py:43-128)."""
    from scripts.generate import generate
    from scripts.train import train

    first = train(dummy_cfg)
    run_dir = first["dirs"]["root"]
    cfg = dict(dummy_cfg)
    cfg["action"] = "generate"
    cfg["experiment_path"] = str(run_dir)
    cfg["duration"] = 0.15
    cfg["model_max_duration"] = 0.64
    cfg["top_k"] = 8
    cfg["output_dir"] = str(tmp_path / "gen2")
    cfg["dataloader"] = dict(cfg["dataloader"])
    cfg["dataloader"]["batch_size"] = 1
    cfg["max_batches"] = 1
    result = generate(cfg)
    assert result["num_generated"] >= 1
    assert list((tmp_path / "gen2").glob("*.wav"))


def test_train_resume_from_checkpoint(dummy_cfg):
    """trainer.ckpt_path resumes a previous run's optimizer state + step
    (reference Lightning ``ckpt_path`` resume; loop.py fit(resume_path))."""
    import json

    from scripts.train import train

    cfg = dict(dummy_cfg)
    cfg["trainer"] = dict(cfg["trainer"])
    cfg["trainer"]["fast_dev_run"] = False
    cfg["trainer"]["max_epochs"] = 1
    cfg["trainer"]["limit_train_batches"] = 2
    cfg["trainer"]["limit_val_batches"] = 1
    first = train(cfg)
    last = first["dirs"]["checkpoints"] / "last"
    step1 = json.loads((last / "meta.json").read_text())["step"]
    assert step1 > 0

    cfg2 = dict(cfg)
    cfg2["trainer"] = dict(cfg["trainer"])
    cfg2["trainer"]["ckpt_path"] = str(last)
    second = train(cfg2)
    last2 = second["dirs"]["checkpoints"] / "last"
    step2 = json.loads((last2 / "meta.json").read_text())["step"]
    assert step2 > step1  # optimizer step counter continued, not reset
    assert np.isfinite(second["metrics"]["test_loss"])


@pytest.mark.parametrize("long_mode", ["reprefill", "stream_kv"])
def test_generate_action_long_modes(dummy_cfg, tmp_path, long_mode):
    """duration > model_max_duration takes the long-horizon path in both
    modes: the reference's striding (`generate_long`, reference
    scripts/generate.py:327-370) and the rolling-KV continuous decode
    (`long_mode: stream_kv` -> `generate_long_kv`, no reference
    counterpart)."""
    from scripts.generate import generate

    cfg = dict(dummy_cfg)
    cfg["action"] = "generate"
    cfg["duration"] = 1.28  # 2 chunks of 0.64 at stride 0.64
    cfg["model_max_duration"] = 0.64
    cfg["stride"] = 0.64
    cfg["long_mode"] = long_mode
    cfg["top_k"] = 8
    cfg["output_dir"] = str(tmp_path / f"gen_long_{long_mode}")
    cfg["dataloader"] = dict(cfg["dataloader"])
    cfg["dataloader"]["batch_size"] = 1
    cfg["dataset_to_use"] = "test"
    cfg["max_batches"] = 1
    result = generate(cfg)
    assert result["num_generated"] >= 1
    wavs = list((tmp_path / f"gen_long_{long_mode}").glob("*.wav"))
    assert wavs, "no wav written"
    from vaura_tpu.ops.audio import read_wav

    wav, sr = read_wav(wavs[0])
    assert sr == 44100
    # the full 110-token horizon was decoded (dummy codec hop = product
    # of its encoder_rates = 8 samples/token)
    total_tokens = int(1.28 * 86)
    hop = 8
    assert wav.shape[-1] == total_tokens * hop
