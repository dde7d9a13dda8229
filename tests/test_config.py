"""Config engine tests: interpolation, from_file, negation, CLI merge,
mandatory markers — the semantics of reference ``main.py:48-80``."""

import pytest

from vaura_tpu.config import (
    MissingMandatoryValue,
    assemble_config,
    check_mandatory,
    deep_merge,
    instantiate_from_config,
    load_config,
    parse_dotlist,
    resolve_config,
)


def test_deep_merge_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    override = {"a": {"b": 10}, "e": 4}
    merged = deep_merge(base, override)
    assert merged == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # no mutation


def test_parse_dotlist_types():
    cfg = parse_dotlist(["a.b=1", "a.c=true", "d=hello", "e=[1, 2]", "f=1.5", "g=null"])
    assert cfg["a"]["b"] == 1
    assert cfg["a"]["c"] is True
    assert cfg["d"] == "hello"
    assert cfg["e"] == [1, 2]
    assert cfg["f"] == 1.5
    assert cfg["g"] is None


def test_interpolation_and_negation():
    cfg = {
        "model": {"flatten": False},
        "dataloader": {"batch_size": 12, "partition": "${negation:${model.flatten}}"},
        "copy": "${dataloader.batch_size}",
    }
    resolved = resolve_config(cfg)
    assert resolved["dataloader"]["partition"] is True
    assert resolved["copy"] == 12


def test_from_file_resolver(tmp_path):
    sub = tmp_path / "sub.yaml"
    sub.write_text("target: foo\nparams:\n  x: 1\n")
    main = tmp_path / "main.yaml"
    main.write_text("module: ${from_file:sub.yaml}\n")
    cfg = load_config(main)
    assert cfg["module"] == {"target": "foo", "params": {"x": 1}}


def test_embedded_interpolation():
    cfg = {"name": "exp", "path": "logs/${name}/run"}
    assert resolve_config(cfg)["path"] == "logs/exp/run"


def test_mandatory_value():
    with pytest.raises(MissingMandatoryValue):
        check_mandatory({"trainer": {"experiment_name": "???"}})
    check_mandatory({"trainer": {"experiment_name": "ok"}})


def test_assemble_config_cli_overrides(tmp_path):
    defaults = tmp_path / "defaults.yaml"
    defaults.write_text(
        "action: ???\nmodel:\n  learning_rate: 1e-3\n  batch_size: ${dataloader.batch_size}\ndataloader:\n  batch_size: 2\n"
    )
    exp = tmp_path / "exp.yaml"
    exp.write_text("action: train\nmodel:\n  learning_rate: 5.0e-5\n")
    cfg = assemble_config(
        [f"config={exp}", "dataloader.batch_size=8"], defaults_path=defaults
    )
    assert cfg["action"] == "train"
    assert cfg["model"]["learning_rate"] == 5.0e-5
    assert cfg["dataloader"]["batch_size"] == 8
    assert cfg["model"]["batch_size"] == 8  # interpolation sees CLI override


def test_instantiate_reference_target_alias():
    cfg = {
        "target": "models.modules.misc.codebook_patterns.DelayedPatternProvider",
        "params": {"n_q": 4},
    }
    provider = instantiate_from_config(cfg)
    assert provider.n_q == 4
    assert provider.get_pattern(8).max_delay == 3
