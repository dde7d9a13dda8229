"""Orbax checkpointing.

TPU-native equivalent of the reference's Lightning ``ModelCheckpoint``
(top-k by ``val_loss`` + ``save_last``, filename-encoded metrics,
``utils/train_utils.py:136-144``) plus the emergency crash checkpoint
(``utils/train_utils.py:101-110``). Frozen submodule params (codec,
frozen encoder) are stored once per run in ``frozen/`` instead of inside
every training checkpoint — fixing the reference's ckpt-bloat FIXME
(``vaura_model.py:61``).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vaura_tpu.utils.experiment import checkpoint_name, resolve_best_checkpoint


class CheckpointManager:
    def __init__(
        self,
        ckpt_dir: str | Path,
        top_k: int = 3,
        save_last: bool = True,
        async_save: bool = False,
    ):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.save_last = save_last
        self.async_save = async_save
        # Rebuild the top-k ledger from checkpoints already on disk so a
        # resumed run prunes against them instead of only its own saves
        # (the reference's Lightning ModelCheckpoint keeps its ledger in
        # the resumed callback state; ours is derivable from meta.json)
        self._saved: list[tuple[float, Path]] = sorted(
            (
                (float(meta["val_loss"]), p)
                for p in self.ckpt_dir.iterdir()
                if p.is_dir() and not p.is_symlink()
                for meta in [self.read_meta(p)]
                if meta is not None and "val_loss" in meta
            ),
            key=lambda t: t[0],
        )
        # async_save overlaps checkpoint serialization/IO with the next
        # training epoch (``trainer.async_checkpointing``). Orbax copies
        # device arrays to host synchronously inside save(), then writes
        # in a background thread; bookkeeping that must see the finalized
        # directory (meta.json, top-k prune, `last` symlink) is deferred
        # to the next save / restore / finalize().
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.StandardCheckpointer()
        self._pending: Optional[tuple[Path, dict, float]] = None

    # ------------------------------------------------------------------ #
    def _save_raw(self, path: Path, payload: Any) -> None:
        if self.async_save:
            self._ckptr.save(path, args=ocp.args.StandardSave(payload))
        else:
            self._ckptr.save(path, payload)

    def _restore_raw(self, path: Path, abstract: Any) -> Any:
        if self.async_save:
            return self._ckptr.restore(
                path, args=ocp.args.StandardRestore(abstract)
            )
        return self._ckptr.restore(path, abstract)

    def finalize(self) -> None:
        """Block until any in-flight async save committed, then run its
        deferred bookkeeping. Idempotent; no-op for sync managers."""
        self._ckptr.wait_until_finished()
        if self._pending is None:
            return
        path, meta, val_loss = self._pending
        self._pending = None
        (path / "meta.json").write_text(json.dumps(meta))
        # An overwritten same-named checkpoint must not keep its stale
        # ledger entry: pruning via the stale tuple would rmtree the
        # freshly written directory while the duplicate kept occupying a
        # top-k slot pointing at a deleted path.
        self._saved = [t for t in self._saved if t[1] != path]
        self._saved.append((val_loss, path))
        self._saved.sort(key=lambda t: t[0])
        if self.save_last:
            last = self.ckpt_dir / "last"
            if last.is_symlink() or last.exists():
                if last.is_symlink():
                    last.unlink()
                else:
                    shutil.rmtree(last, ignore_errors=True)
            last.symlink_to(path.name)
        # Keep the top-k best by val_loss PLUS the just-saved path while
        # save_last points at it (Lightning's save_last keeps last.ckpt
        # regardless of top-k — otherwise a resume into a dir of better
        # checkpoints would delete the newest weights and leave `last`
        # dangling). The protected entry stays in the ledger and becomes
        # prunable once `last` moves to a newer save.
        keep = {p for _, p in self._saved[: self.top_k]}
        if self.save_last:
            keep.add(path)
        for entry in [t for t in self._saved if t[1] not in keep]:
            self._saved.remove(entry)
            shutil.rmtree(entry[1], ignore_errors=True)

    # ------------------------------------------------------------------ #
    def save_frozen(self, frozen_params: Dict[str, Any]) -> None:
        """Persist frozen submodules once per run."""
        self.finalize()
        path = self.ckpt_dir / "frozen"
        if path.exists():
            shutil.rmtree(path)
        self._save_raw(path.resolve(), frozen_params)
        self._ckptr.wait_until_finished()

    def restore_frozen(self, abstract: Dict[str, Any]) -> Dict[str, Any]:
        self.finalize()
        return self._restore_raw((self.ckpt_dir / "frozen").resolve(), abstract)

    # ------------------------------------------------------------------ #
    def save(
        self,
        state: Any,
        epoch: int,
        step: int,
        val_loss: float,
        metadata: Optional[dict] = None,
    ) -> Path:
        """Save trainable state, keep top-k by val_loss + last.

        With ``async_save`` the call returns as soon as device arrays are
        on the host; directory finalization + bookkeeping complete at the
        next save/restore/``finalize()``."""
        self.finalize()  # at most one save in flight
        name = checkpoint_name(epoch, step, val_loss)
        path = self.ckpt_dir / name
        if path.exists():
            shutil.rmtree(path)
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        self._save_raw(path.resolve(), payload)
        meta = {"epoch": epoch, "step": step, "val_loss": float(val_loss)}
        meta.update(metadata or {})
        self._pending = (path, meta, float(val_loss))
        if not self.async_save:
            self.finalize()
        return path

    def save_emergency(
        self, state: Any, epoch: int, tag: str = "",
        metadata: Optional[dict] = None,
    ) -> Path:
        """Crash checkpoint (reference ``maybe_save_checkpoint``,
        ``train_utils.py:101-110``). Always synchronous. Writes a
        ``meta.json`` marking the epoch incomplete (``epoch_complete:
        false``) so a resume re-runs the interrupted epoch instead of
        skipping its remainder, and carrying any callback state passed in
        ``metadata`` (early-stop best/count)."""
        from vaura_tpu.utils.experiment import timestamp_dirname

        self.finalize()
        name = f"e{epoch}_last_at_{timestamp_dirname(jitter=False)}{tag}"
        path = self.ckpt_dir / name
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        self._save_raw(path.resolve(), payload)
        self._ckptr.wait_until_finished()
        meta = {"epoch": int(epoch), "epoch_complete": False}
        meta.update(metadata or {})
        # no val_loss key: emergency saves never enter the top-k ledger
        meta.pop("val_loss", None)
        (path / "meta.json").write_text(json.dumps(meta))
        return path

    # ------------------------------------------------------------------ #
    def restore(self, path: str | Path, abstract_payload: Any) -> Any:
        self.finalize()
        path = Path(path)
        if path.is_symlink():
            path = path.parent / path.readlink()
        return self._restore_raw(path.resolve(), abstract_payload)

    def restore_best(self, abstract_payload: Any) -> Any:
        best = resolve_best_checkpoint(self.ckpt_dir)
        assert best is not None, f"no checkpoints under {self.ckpt_dir}"
        return self.restore(best, abstract_payload)

    @staticmethod
    def read_meta(path: str | Path) -> Optional[dict]:
        """Bookkeeping metadata of a checkpoint: ``meta.json`` if present
        (epoch/step/val_loss + any extras the saver attached); emergency
        checkpoints carry only the epoch, parsed from their
        ``e{epoch}_last_at_...`` name (reference ``train_utils.py:101-110``
        naming). Returns None for unrecognizable paths."""
        import re

        path = Path(path)
        if path.is_symlink():
            path = path.parent / path.readlink()
        meta_file = path / "meta.json"
        if meta_file.exists():
            try:
                return json.loads(meta_file.read_text())
            except (OSError, json.JSONDecodeError):
                return None
        m = re.match(r"e(\d+)_last_at_", path.name)
        if m:
            # legacy emergency checkpoint without meta.json: the epoch was
            # interrupted mid-training, so mark it incomplete
            return {"epoch": int(m.group(1)), "epoch_complete": False}
        return None


def abstract_like(tree: Any) -> Any:
    """Shape/dtype skeleton for orbax restore (passes through trees that
    already hold ShapeDtypeStructs)."""

    def to_sds(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)

    return jax.tree.map(to_sds, tree)


def restore_trainable_params(
    ckpt_path, trainable: Any, model_cfg: dict,
    trainer_cfg: Optional[dict] = None,
) -> Dict[str, Any]:
    """Load trainable params from either a converted-checkpoint tree or a
    training checkpoint ({params, opt_state, step}). ``trainable`` is the
    (real or abstract) trainable param pytree; for training checkpoints the
    optimizer-state skeleton is rebuilt abstractly from the same recipe the
    Trainer uses (no device allocation)."""
    from pathlib import Path as _Path

    from vaura_tpu.train.state import build_schedule, make_optimizer

    trainer_cfg = trainer_cfg or {}
    path = _Path(ckpt_path)
    if path.is_symlink():
        path = (path.parent / path.readlink()).resolve()
    ckptr = ocp.StandardCheckpointer()
    abstract = abstract_like(trainable)
    try:
        # converted tree holding the same subtrees as `trainable`
        return ckptr.restore(path.resolve(), abstract)
    except Exception:
        pass
    tx = make_optimizer(
        build_schedule(
            model_cfg.get("lr_scheduler"),
            float(model_cfg.get("learning_rate", 1e-3)),
        ),
        weight_decay=float(model_cfg.get("weight_decay", 0.0)),
        betas=tuple(model_cfg.get("betas", (0.9, 0.95))),
        gradient_clip_val=trainer_cfg.get("gradient_clip_val", 1.0),
        gradient_clip_algorithm=trainer_cfg.get(
            "gradient_clip_algorithm", "value"
        ),
        accumulate_grad_batches=int(
            trainer_cfg.get("accumulate_grad_batches", 1) or 1
        ),
        mu_dtype=model_cfg.get("adam_mu_dtype"),
        nu_dtype=model_cfg.get("adam_nu_dtype"),
    )
    opt_abstract = jax.eval_shape(tx.init, abstract)
    payload = ckptr.restore(
        path.resolve(),
        {
            "params": abstract,
            "opt_state": abstract_like(opt_abstract),
            "step": jax.ShapeDtypeStruct((), np.int32),
        },
    )
    return payload["params"]
