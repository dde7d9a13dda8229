"""CLI action dispatch (reference ``main.py:105-117``): each action
routes the assembled config to its script entry point; unknown actions
fail loudly. Entry points are stubbed so this tests ROUTING, not the
actions themselves (those have their own e2e tests)."""

from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
CFG = str(REPO / "configs" / "experiments" / "dummy.yaml")


@pytest.mark.parametrize(
    "action,module,attr",
    [
        ("train", "scripts.train", "train"),
        ("test", "scripts.test", "test"),
        ("generate", "scripts.generate", "generate"),
        ("predict", "scripts.generate", "generate"),  # reference alias
        ("finetune", "scripts.finetune", "finetune"),
        ("serve", "scripts.serve", "run_server"),
    ],
)
def test_action_routes_to_entry_point(monkeypatch, action, module, attr):
    import importlib

    import main as cli

    mod = importlib.import_module(module)
    seen = {}
    monkeypatch.setattr(mod, attr, lambda cfg: seen.update(cfg=cfg))
    rc = cli.main([f"config={CFG}", f"action={action}", "port=9999"])
    assert rc == 0
    assert seen["cfg"]["action"] == action
    assert seen["cfg"]["port"] == 9999  # CLI dotlist reached the action


def test_unknown_action_raises():
    import main as cli

    with pytest.raises(ValueError, match="Unknown action"):
        cli.main([f"config={CFG}", "action=nope"])
