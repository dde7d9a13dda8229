"""Checkpoint manager tests: save/restore round trip, top-k retention by
val_loss, last-symlink, frozen-subtree separation, emergency save, and
best-checkpoint resolution by name (reference utils/utils.py:30-45,
train_utils.py:101-144 contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaura_tpu.train.checkpoint import CheckpointManager, abstract_like
from vaura_tpu.train.state import TrainState, make_optimizer
from vaura_tpu.utils.experiment import (
    checkpoint_name,
    resolve_best_checkpoint,
)


def _state(seed=0):
    params = {
        "sampler": {
            "w": jax.random.normal(jax.random.PRNGKey(seed), (4, 4)),
            "uncond_embedding": jnp.ones((2, 3)),
        }
    }
    return TrainState.create(params, make_optimizer(1e-3))


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpts")
    state = _state()
    mgr.save(state, epoch=0, step=10, val_loss=1.5)
    payload = mgr.restore(
        tmp_path / "ckpts" / checkpoint_name(0, 10, 1.5),
        {"params": abstract_like(state.params),
         "opt_state": abstract_like(state.opt_state),
         "step": abstract_like(state.step)},
    )
    np.testing.assert_allclose(
        np.asarray(payload["params"]["sampler"]["w"]),
        np.asarray(state.params["sampler"]["w"]),
    )


def test_topk_and_best(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpts", top_k=2)
    for i, vl in enumerate([3.0, 1.0, 2.0, 0.5]):
        mgr.save(_state(i), epoch=i, step=i * 10, val_loss=vl)
    names = sorted(
        p.name for p in (tmp_path / "ckpts").iterdir()
        if p.name.startswith("epoch=")
    )
    # top-2 by val_loss: 0.5 and 1.0 survive
    assert len(names) == 2
    assert any("val_loss=0.500" in n for n in names)
    assert any("val_loss=1.000" in n for n in names)
    best = resolve_best_checkpoint(tmp_path / "ckpts")
    assert "val_loss=0.500" in best.name
    # last symlink points at the most recent save
    last = tmp_path / "ckpts" / "last"
    assert last.is_symlink()
    assert "val_loss=0.500" in str(last.readlink())


def test_frozen_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpts")
    frozen = {"dac": {"w": jnp.arange(6.0).reshape(2, 3)}}
    mgr.save_frozen(frozen)
    back = mgr.restore_frozen(abstract_like(frozen))
    np.testing.assert_allclose(np.asarray(back["dac"]["w"]), np.arange(6.0).reshape(2, 3))


def test_emergency_save(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpts")
    path = mgr.save_emergency(_state(), epoch=4)
    assert path.exists()
    assert path.name.startswith("e4_last_at_")


def test_restore_best_via_manager(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpts", top_k=3)
    s1, s2 = _state(1), _state(2)
    mgr.save(s1, 0, 1, 2.0)
    mgr.save(s2, 1, 2, 1.0)
    payload = mgr.restore_best({"params": abstract_like(s2.params),
                                "opt_state": abstract_like(s2.opt_state),
                                "step": abstract_like(s2.step)})
    np.testing.assert_allclose(
        np.asarray(payload["params"]["sampler"]["w"]),
        np.asarray(s2.params["sampler"]["w"]),
    )


def test_async_save_semantics(tmp_path):
    """async_save defers meta.json/top-k/`last` bookkeeping to the next
    save/restore/finalize; all observable contracts (round trip, top-k
    retention, best resolution, symlink) must match the sync manager."""
    import json

    mgr = CheckpointManager(tmp_path / "ckpts", top_k=2, async_save=True)
    states = [_state(i) for i in range(4)]
    for i, vl in enumerate([3.0, 1.0, 2.0, 0.5]):
        mgr.save(states[i], epoch=i, step=i * 10, val_loss=vl)
    # restore while the last save may still be in flight: must block +
    # finalize first, then read back exactly what was saved
    payload = mgr.restore(
        tmp_path / "ckpts" / "last",
        {"params": abstract_like(states[3].params),
         "opt_state": abstract_like(states[3].opt_state),
         "step": abstract_like(states[3].step)},
    )
    np.testing.assert_allclose(
        np.asarray(payload["params"]["sampler"]["w"]),
        np.asarray(states[3].params["sampler"]["w"]),
    )
    names = sorted(
        p.name for p in (tmp_path / "ckpts").iterdir()
        if p.name.startswith("epoch=")
    )
    assert len(names) == 2
    assert any("val_loss=0.500" in n for n in names)
    assert any("val_loss=1.000" in n for n in names)
    best = resolve_best_checkpoint(tmp_path / "ckpts")
    assert "val_loss=0.500" in best.name
    meta = json.loads((best / "meta.json").read_text())
    assert meta["epoch"] == 3 and meta["step"] == 30
    mgr.finalize()  # idempotent


def test_ledger_rebuilt_across_instances(tmp_path):
    """A resumed process's manager must prune top-k against checkpoints
    already on disk, not only its own saves (the reference's Lightning
    ModelCheckpoint carries its ledger in the resumed callback state)."""
    mgr1 = CheckpointManager(tmp_path / "ckpts", top_k=2)
    mgr1.save(_state(0), epoch=0, step=1, val_loss=1.0)
    mgr1.save(_state(1), epoch=1, step=2, val_loss=2.0)
    # fresh manager in the same dir (process restart / resume)
    mgr2 = CheckpointManager(tmp_path / "ckpts", top_k=2)
    mgr2.save(_state(2), epoch=2, step=3, val_loss=0.5)
    names = {
        p.name for p in (tmp_path / "ckpts").iterdir()
        if p.name.startswith("epoch=")
    }
    assert len(names) == 2, names
    assert any("val_loss=0.500" in n for n in names)
    assert any("val_loss=1.000" in n for n in names)  # 2.0 pruned


def test_resume_save_worse_keeps_last_target(tmp_path):
    """Advisor r3 (medium): after a same-dir resume, saving a checkpoint
    whose val_loss is worse than everything already on disk must NOT prune
    the just-saved weights out from under the `last` symlink."""
    mgr1 = CheckpointManager(tmp_path / "ckpts", top_k=2)
    mgr1.save(_state(0), epoch=0, step=1, val_loss=1.0)
    mgr1.save(_state(1), epoch=1, step=2, val_loss=2.0)
    # process restart: fresh manager rebuilds the ledger from disk, then
    # saves a checkpoint worse than both existing ones
    mgr2 = CheckpointManager(tmp_path / "ckpts", top_k=2)
    path = mgr2.save(_state(2), epoch=2, step=3, val_loss=3.0)
    assert path.exists(), "just-saved checkpoint was pruned"
    last = tmp_path / "ckpts" / "last"
    assert last.is_symlink()
    assert (last.parent / last.readlink()).exists(), "`last` dangles"
    assert "val_loss=3.000" in str(last.readlink())
    # top-k survivors unchanged
    names = {p.name for p in (tmp_path / "ckpts").iterdir()
             if p.name.startswith("epoch=")}
    assert any("val_loss=1.000" in n for n in names)
    assert any("val_loss=2.000" in n for n in names)
    # once `last` moves to a newer save, the ex-protected worse ckpt and
    # everything outside the new top-k get pruned
    mgr2.save(_state(3), epoch=3, step=4, val_loss=0.9)
    names = {p.name for p in (tmp_path / "ckpts").iterdir()
             if p.name.startswith("epoch=")}
    assert len(names) == 2, names
    assert any("val_loss=0.900" in n for n in names)
    assert any("val_loss=1.000" in n for n in names)
    assert (last.parent / last.readlink()).exists()


def test_save_overwrite_same_name_no_stale_ledger(tmp_path):
    """Advisor r3 (low): overwriting a same-named checkpoint must not leave
    two ledger entries for one path (the stale one could prune the fresh
    write while the duplicate holds a top-k slot at a deleted dir)."""
    mgr = CheckpointManager(tmp_path / "ckpts", top_k=2)
    p1 = mgr.save(_state(0), epoch=0, step=1, val_loss=1.0)
    p2 = mgr.save(_state(1), epoch=0, step=1, val_loss=1.0)  # same name
    assert p1 == p2
    assert len(mgr._saved) == 1
    # fill top-k: the overwritten path must survive exactly once
    mgr.save(_state(2), epoch=1, step=2, val_loss=0.5)
    mgr.save(_state(3), epoch=2, step=3, val_loss=0.7)
    names = {p.name for p in (tmp_path / "ckpts").iterdir()
             if p.name.startswith("epoch=")}
    assert len(names) <= 3  # top-2 + possibly the `last` target
    assert p2.exists() or not any("step=1-" in n for n in names)


def test_read_meta(tmp_path):
    mgr = CheckpointManager(tmp_path / "ckpts")
    mgr.save(_state(), epoch=3, step=30, val_loss=1.25,
             metadata={"early_stop_best": 1.25, "early_stop_count": 1})
    meta = CheckpointManager.read_meta(tmp_path / "ckpts" / "last")
    assert meta["epoch"] == 3 and meta["step"] == 30
    assert meta["early_stop_best"] == 1.25 and meta["early_stop_count"] == 1
    em = mgr.save_emergency(
        _state(), epoch=7,
        metadata={"early_stop_best": 2.5, "early_stop_count": 1, "step": 70},
    )
    em_meta = CheckpointManager.read_meta(em)
    assert em_meta["epoch"] == 7 and em_meta["epoch_complete"] is False
    assert em_meta["early_stop_best"] == 2.5 and em_meta["step"] == 70
    # legacy emergency dirs (no meta.json) parse epoch from the name and
    # are still treated as incomplete
    (em / "meta.json").unlink()
    legacy = CheckpointManager.read_meta(em)
    assert legacy == {"epoch": 7, "epoch_complete": False}
    assert CheckpointManager.read_meta(tmp_path / "ckpts" / "frozen") is None


def test_restore_trainable_params_from_training_ckpt(tmp_path):
    """restore_trainable_params must read the params subtree out of a
    training checkpoint by rebuilding the optimizer skeleton abstractly."""
    from vaura_tpu.train.checkpoint import restore_trainable_params

    mgr = CheckpointManager(tmp_path / "ckpts")
    state = _state(7)
    mgr.save(state, epoch=0, step=5, val_loss=1.0)
    path = tmp_path / "ckpts" / checkpoint_name(0, 5, 1.0)
    got = restore_trainable_params(
        path, state.params, {"learning_rate": 1e-3}, {}
    )
    np.testing.assert_allclose(
        np.asarray(got["sampler"]["w"]), np.asarray(state.params["sampler"]["w"])
    )
