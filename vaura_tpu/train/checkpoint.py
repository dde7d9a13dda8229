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
    def __init__(self, ckpt_dir: str | Path, top_k: int = 3, save_last: bool = True):
        self.ckpt_dir = Path(ckpt_dir)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.save_last = save_last
        self._saved: list[tuple[float, Path]] = []
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------ #
    def save_frozen(self, frozen_params: Dict[str, Any]) -> None:
        """Persist frozen submodules once per run."""
        path = self.ckpt_dir / "frozen"
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path.resolve(), frozen_params)
        self._ckptr.wait_until_finished()

    def restore_frozen(self, abstract: Dict[str, Any]) -> Dict[str, Any]:
        return self._ckptr.restore((self.ckpt_dir / "frozen").resolve(), abstract)

    # ------------------------------------------------------------------ #
    def save(
        self,
        state: Any,
        epoch: int,
        step: int,
        val_loss: float,
        metadata: Optional[dict] = None,
    ) -> Path:
        """Save trainable state, keep top-k by val_loss + last."""
        name = checkpoint_name(epoch, step, val_loss)
        path = self.ckpt_dir / name
        if path.exists():
            shutil.rmtree(path)
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        self._ckptr.save(path.resolve(), payload)
        self._ckptr.wait_until_finished()
        meta = {"epoch": epoch, "step": step, "val_loss": float(val_loss)}
        meta.update(metadata or {})
        (path / "meta.json").write_text(json.dumps(meta))
        self._saved.append((float(val_loss), path))
        self._saved.sort(key=lambda t: t[0])
        while len(self._saved) > self.top_k:
            _, worst = self._saved.pop()
            shutil.rmtree(worst, ignore_errors=True)
        if self.save_last:
            last = self.ckpt_dir / "last"
            if last.is_symlink() or last.exists():
                if last.is_symlink():
                    last.unlink()
                else:
                    shutil.rmtree(last, ignore_errors=True)
            last.symlink_to(path.name)
        return path

    def save_emergency(self, state: Any, epoch: int, tag: str = "") -> Path:
        """Crash checkpoint (reference ``maybe_save_checkpoint``,
        ``train_utils.py:101-110``)."""
        from vaura_tpu.utils.experiment import timestamp_dirname

        name = f"e{epoch}_last_at_{timestamp_dirname(jitter=False)}{tag}"
        path = self.ckpt_dir / name
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        self._ckptr.save(path.resolve(), payload)
        self._ckptr.wait_until_finished()
        return path

    # ------------------------------------------------------------------ #
    def restore(self, path: str | Path, abstract_payload: Any) -> Any:
        path = Path(path)
        if path.is_symlink():
            path = path.parent / path.readlink()
        return self._ckptr.restore(path.resolve(), abstract_payload)

    def restore_best(self, abstract_payload: Any) -> Any:
        best = resolve_best_checkpoint(self.ckpt_dir)
        assert best is not None, f"no checkpoints under {self.ckpt_dir}"
        return self.restore(best, abstract_payload)


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
