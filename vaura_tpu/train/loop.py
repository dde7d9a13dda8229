"""Training loop (the Lightning ``Trainer`` equivalent).

Drives epochs of jitted train steps with: validation each epoch (or at a
fractional ``val_check_interval``), early stopping on ``val_loss``
(reference ``train_utils.py:130-155``), LR monitoring, top-k + last
checkpointing, emergency crash checkpoints (``scripts/train.py:91-98``),
gradient accumulation, the debug knobs (``fast_dev_run``,
``overfit_batches``, ``limit_*_batches``, ``vaura_defaults.yaml:63-67``),
and optional ``jax.profiler`` traces (reference ``get_profiler``,
``train_utils.py:174-195``).

Device placement: batches are host numpy; arrays are device_put with the
mesh's batch sharding before each step; everything else stays on device
across steps.
"""

from __future__ import annotations

import logging
import math
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vaura_tpu.models.vaura import VauraSystem
from vaura_tpu.train.checkpoint import CheckpointManager, abstract_like
from vaura_tpu.train.state import TrainState, build_schedule, make_optimizer
from vaura_tpu.train.steps import (
    batch_to_device,
    make_eval_step,
    make_train_step,
    split_params,
)
from vaura_tpu.utils import cached_jit
from vaura_tpu.utils.tb import TBLogger

logger = logging.getLogger(__name__)


class EarlyStopping:
    """Min-mode early stop on epoch val loss (reference uses Lightning
    ``EarlyStopping(val_loss_epoch, patience)``)."""

    def __init__(self, patience: int = 3, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.count = 0

    def update(self, value: float) -> bool:
        """Returns True if training should stop."""
        if value < self.best - self.min_delta:
            self.best = value
            self.count = 0
            return False
        self.count += 1
        return self.count >= self.patience


class Trainer:
    def __init__(
        self,
        system: VauraSystem,
        trainer_cfg: Dict[str, Any],
        model_cfg: Dict[str, Any],
        log_dirs: Dict[str, Any],
        mesh=None,
    ):
        self.system = system
        self.cfg = trainer_cfg
        self.model_cfg = model_cfg
        self.dirs = log_dirs
        self.mesh = mesh
        self.tb = TBLogger(str(log_dirs["root"]))
        self.tb.add_custom_scalar_layout(system.num_codebooks)
        self.ckpt = CheckpointManager(
            log_dirs["checkpoints"],
            async_save=bool(trainer_cfg.get("async_checkpointing", False)),
        )
        self.early_stop = EarlyStopping(
            patience=int(trainer_cfg.get("early_stop_patience", 3) or 10**9)
        )
        fdr = trainer_cfg.get("fast_dev_run", False)
        self.fast_dev_run = int(fdr) if fdr else 0
        self.batch_sharding = None
        if mesh is not None:
            from vaura_tpu.parallel.mesh import batch_sharding

            self.batch_sharding = batch_sharding(mesh)

    # ------------------------------------------------------------------ #
    def _limit(self, key: str, n: int) -> int:
        lim = self.cfg.get(key)
        if self.fast_dev_run:
            return min(n, self.fast_dev_run)
        if lim is None:
            return n
        if isinstance(lim, float) and lim <= 1.0:
            return max(1, int(n * lim))
        return min(n, int(lim))

    def _put(self, batch: dict) -> dict:
        return batch_to_device(batch, self.batch_sharding)

    # ------------------------------------------------------------------ #
    def fit(
        self,
        params: Dict[str, Any],
        datamodule,
        rng: jax.Array,
        resume_path: Optional[str] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        system = self.system
        trainable, frozen = split_params(system, params)
        if self.mesh is not None:
            from vaura_tpu.parallel.partitioning import param_shardings

            trainable = jax.tree.map(
                jax.device_put, trainable, param_shardings(self.mesh, trainable)
            )
            frozen = jax.tree.map(
                jax.device_put, frozen, param_shardings(self.mesh, frozen)
            )

        base_lr = float(self.model_cfg.get("learning_rate", 1e-3))
        if cfg.get("scale_lr_with_device_count") or cfg.get("scale_lr_with_gpu_count"):
            # sqrt(world) LR scaling (reference train_utils.py:282-283)
            base_lr *= math.sqrt(jax.device_count())
        schedule = build_schedule(self.model_cfg.get("lr_scheduler"), base_lr)
        tx = make_optimizer(
            schedule,
            weight_decay=float(self.model_cfg.get("weight_decay", 0.0)),
            betas=tuple(self.model_cfg.get("betas", (0.9, 0.95))),
            gradient_clip_val=cfg.get("gradient_clip_val", 1.0),
            gradient_clip_algorithm=cfg.get("gradient_clip_algorithm", "value"),
            accumulate_grad_batches=int(cfg.get("accumulate_grad_batches", 1) or 1),
            mu_dtype=self.model_cfg.get("adam_mu_dtype"),
            nu_dtype=self.model_cfg.get("adam_nu_dtype"),
        )
        state = TrainState.create(trainable, tx)
        start_epoch = 0
        if resume_path:
            payload = self.ckpt.restore(
                resume_path,
                {"params": abstract_like(state.params),
                 "opt_state": abstract_like(state.opt_state),
                 "step": abstract_like(state.step)},
            )
            state = state.replace(
                params=payload["params"],
                opt_state=payload["opt_state"],
                step=payload["step"],
            )
            # resume at the saved epoch + callback state (the reference's
            # Lightning ckpt_path resume restores both, scripts/train.py:93)
            meta = CheckpointManager.read_meta(resume_path) or {}
            # a crash checkpoint marks its epoch incomplete -> re-run that
            # epoch (Lightning resume re-runs the in-progress epoch); a
            # regular end-of-epoch save continues at the next one
            saved_epoch = int(meta.get("epoch", -1))
            start_epoch = (
                saved_epoch
                if meta.get("epoch_complete") is False
                else saved_epoch + 1
            )
            self.early_stop.best = float(
                meta.get("early_stop_best", self.early_stop.best)
            )
            self.early_stop.count = int(
                meta.get("early_stop_count", self.early_stop.count)
            )
            logger.info(
                "Resumed from %s at step %s (epoch %d)",
                resume_path, state.step, start_epoch,
            )

        self.ckpt.save_frozen(frozen)
        train_step = make_train_step(system)
        eval_step = make_eval_step(system)

        max_epochs = self.fast_dev_run and 1 or int(cfg.get("max_epochs", 50))
        min_epochs = int(cfg.get("min_epochs", 1))
        overfit = int(cfg.get("overfit_batches", 0) or 0)
        profiler = cfg.get("profiler")

        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()

        vci = cfg.get("val_check_interval", 1.0)
        tracked = set(self.model_cfg.get("files_to_track_during_training") or [])

        global_step = int(state.step)
        stop = False
        epoch = start_epoch
        try:
            for epoch in range(start_epoch, max_epochs):
                if stop:
                    break
                train_loader.set_epoch(epoch)
                n_batches = self._limit("limit_train_batches", len(train_loader))
                if overfit:
                    n_batches = min(n_batches, overfit)
                epoch_losses = []
                t_epoch = time.time()
                cached_batches = []
                # double-buffer H2D: device_put for batch N+1 is issued
                # (async) before step N's compute is consumed, so the
                # transfer rides under the previous step
                # (prefetch_batches=0 disables; default 2)
                n_prefetch = int(self.cfg.get("prefetch_batches", 2) or 0)
                it = iter(train_loader)
                if n_prefetch > 1:
                    from vaura_tpu.train.steps import prefetch_to_device

                    it = prefetch_to_device(
                        it, size=n_prefetch, sharding=self.batch_sharding
                    )
                for bi in range(n_batches):
                    if overfit and bi < len(cached_batches):
                        batch = cached_batches[bi]
                    else:
                        batch = next(it) if n_prefetch > 1 else self._put(next(it))
                        if overfit:
                            cached_batches.append(batch)
                    if profiler == "jax" and epoch == 0 and bi == 3:
                        jax.profiler.start_trace(str(self.dirs["root"] / "profile"))
                    rng, step_rng = jax.random.split(rng)
                    state, metrics = train_step(state, frozen, batch, step_rng)
                    if profiler == "jax" and epoch == 0 and bi == 6:
                        jax.block_until_ready(metrics["loss"])
                        jax.profiler.stop_trace()
                    global_step += 1
                    loss = float(metrics["loss"])
                    epoch_losses.append(loss)
                    self.tb.scalar("train_loss_step", loss, global_step)
                    self.tb.scalar(
                        "lr",
                        float(schedule(global_step))
                        if callable(schedule)
                        else schedule,
                        global_step,
                    )
                    if tracked:
                        self._log_tracked_files(
                            state.params, frozen, batch, global_step
                        )
                    # mid-epoch validation (fractional val_check_interval,
                    # reference vaura_defaults.yaml:58)
                    if (
                        isinstance(vci, float)
                        and 0 < vci < 1.0
                        and (bi + 1) % max(1, int(n_batches * vci)) == 0
                        and bi + 1 < n_batches
                    ):
                        v_loss, _ = self._run_eval(
                            eval_step, state.params, frozen, val_loader,
                            self._limit("limit_val_batches", len(val_loader)),
                            rng,
                        )
                        self.tb.scalar("val_loss_step", v_loss, global_step)
                train_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
                self.tb.scalar("train_loss_epoch", train_loss, global_step)

                # ---------------- predict-run media logging ----------------
                if self.model_cfg.get("predict_at_val_start") and not self.fast_dev_run:
                    try:
                        rng, p_rng = jax.random.split(rng)
                        self._log_predict_media(
                            state.params, frozen, datamodule, p_rng, global_step
                        )
                    except Exception as e:
                        logger.warning("predict-media logging failed: %s", e)

                # ---------------- validation ----------------
                val_loss, val_per_cb = self._run_eval(
                    eval_step, state.params, frozen, val_loader,
                    self._limit("limit_val_batches", len(val_loader)), rng,
                )
                self.tb.scalar("val_loss_epoch", val_loss, global_step)
                self.tb.scalars_per_codebook(
                    "val_loss_per_codebook", val_per_cb, global_step
                )
                logger.info(
                    "epoch %d: train %.4f val %.4f (%.1fs)",
                    epoch, train_loss, val_loss, time.time() - t_epoch,
                )
                if epoch + 1 >= min_epochs and self.early_stop.update(val_loss):
                    logger.info("early stopping at epoch %d", epoch)
                    stop = True
                self.ckpt.save(
                    state, epoch, global_step, val_loss,
                    metadata={
                        "early_stop_best": self.early_stop.best,
                        "early_stop_count": self.early_stop.count,
                    },
                )
                if self.fast_dev_run:
                    break
        except BaseException:
            # emergency checkpoint (reference scripts/train.py:91-98);
            # carries the callback state so a resume doesn't silently
            # reset early stopping
            self.ckpt.save_emergency(
                state, epoch,
                metadata={
                    "step": global_step,
                    "early_stop_best": self.early_stop.best,
                    "early_stop_count": self.early_stop.count,
                },
            )
            raise
        finally:
            # commit any in-flight async save before the run returns
            # (test action / resume may read `last` right after fit)
            self.ckpt.finalize()
            self.tb.flush()

        return {"state": state, "frozen": frozen, "rng": rng}

    # ------------------------------------------------------------------ #
    def _run_eval(self, eval_step, trainable, frozen, loader, n_batches, rng):
        losses, per_cbs = [], []
        it = iter(loader)
        for _ in range(n_batches):
            batch = self._put(next(it))
            rng, step_rng = jax.random.split(rng)
            m = eval_step(trainable, frozen, batch, step_rng)
            losses.append(float(m["loss"]))
            per_cbs.append(np.asarray(m["loss_per_codebook"]))
        if not losses:
            return float("nan"), np.zeros(self.system.num_codebooks)
        return float(np.mean(losses)), np.mean(per_cbs, axis=0)

    def _log_tracked_files(self, trainable, frozen, batch, step):
        """Greedy-decode audio for tracked training files and log it
        (reference ``_log_training_samples``, ``vaura_model.py:618-636``)."""
        meta = batch.get("meta") or {}
        files = meta.get("filepath")
        if not isinstance(files, list):
            return
        tracked = set(self.model_cfg.get("files_to_track_during_training") or [])
        idxs = [
            i for i, f in enumerate(files) if Path(str(f)).stem in tracked
        ]
        if not idxs:
            return
        try:
            params = {**frozen, **trainable}
            sub_audio = batch["audio"][np.asarray(idxs)]
            sub_frames = (
                batch["frames"][np.asarray(idxs)]
                if batch.get("frames") is not None
                else None
            )
            # jit (cached per tracked-subset shape): the eager forward +
            # DAC decode would dispatch op-by-op on a remote device
            shapes = (
                sub_audio.shape,
                None if sub_frames is None else sub_frames.shape,
            )
            has_frames = sub_frames is not None

            def _tracked_fwd(params, frames, audio, _hf=has_frames):
                _, aux = self.system.train_forward(
                    params, frames if _hf else None, audio,
                    jax.random.PRNGKey(0), train=False,
                )
                tokens = jnp.argmax(aux["logits"], axis=-1)
                return self.system.decode_audio(params, tokens)

            fn = cached_jit(self, "_tracked_jit", shapes, _tracked_fwd)
            wav = np.clip(
                np.asarray(fn(params, sub_frames, sub_audio), np.float32),
                -1, 1,
            )
            sr = self.system.dac_config.sample_rate
            for j, i in enumerate(idxs):
                name = Path(str(files[i])).stem
                self.tb.audio(
                    f"generated_audio_of_training_data/{name}",
                    wav[j, 0], step, sr,
                )
        except Exception as e:
            logger.warning("tracked-file logging failed: %s", e)

    def _log_predict_media(self, trainable, frozen, datamodule, rng, step):
        """Generate audio for one predict sample and log audio +
        conditioned-frames video to TB (reference
        ``on_validation_epoch_start`` + ``_log_predict_run``,
        ``vaura_model.py:349-388,638-688``)."""
        from vaura_tpu.utils.viz import scale_to_01

        item = next(iter(datamodule.predict_dataloader()))
        frames = np.asarray(item["frames"])
        params = {**frozen, **trainable}
        # reference uses 221 tokens when vis feats are flattened, else 48
        # (vaura_model.py:644-649)
        n_tokens = 221 if self.system.flatten_vis_feats else 48
        n_tokens = min(n_tokens, self.system.sampler_config.block_size_audio - 16)
        # jit once (cached on self; same predict sample shape every epoch)
        # so the epoch-interval sample doesn't run the encoder/DAC ops
        # eagerly on a remote device
        def _predict_gen(params, frames, rng, _n=n_tokens):
            return self.system.generate(
                params, frames, rng,
                max_new_tokens=_n, top_k=128, decode_to_audio=True,
            )

        fn = cached_jit(
            self, "_predict_gen_jit", (frames.shape, n_tokens), _predict_gen
        )
        out = fn(params, jax.numpy.asarray(frames), rng)
        audio = np.clip(np.asarray(out["audio"], np.float32), -1, 1)
        sr = self.system.dac_config.sample_rate
        name = "sample_0"
        if isinstance(item.get("meta"), dict):
            fps = item["meta"].get("filepath")
            if isinstance(fps, list) and fps:
                name = str(Path(fps[0]).stem)
        self.tb.audio(f"generated_audio/{name}", audio[0, 0], step, sr)
        # conditioned frames: [B, S, C, T, H, W] -> [S*T, H, W, C]
        fr = frames[0]
        video = scale_to_01(
            fr.transpose(0, 2, 3, 4, 1).reshape(-1, *fr.shape[-2:], fr.shape[1])
        )
        self.tb.video(f"conditioned_frames/{name}", video, step, fps=25)
        if self.model_cfg.get("plot_distr_of_pred_indices", True):
            # predicted-token-index distribution (reference
            # ``plot_distr_of_pred_indices``, vaura_model.py:651-668)
            self.tb.histogram(
                f"sampled_indices/{name}", np.asarray(out["codes"]).ravel(), step
            )
        if self.model_cfg.get("return_attention_weights"):
            # teacher-forced forward over the generated codes with sown
            # attention probs -> per-step attention-row video (reference
            # attention-weight videos, train_utils.py:204-255)
            try:
                from vaura_tpu.ops.patterns import DelayedPatternProvider
                from vaura_tpu.utils.viz import attn_rows_to_video

                codes = out["codes"]
                pattern = self.system.pattern_provider.get_pattern(
                    codes.shape[-1]
                )
                seq, _, _ = pattern.build_pattern_sequence(
                    codes[:, :, :-1], self.system.special_token_id
                )
                def _attn_fwd(params, frames, seq):
                    vis_feats = self.system.visual_features(
                        params, frames, train=False
                    )
                    return self.system.sampler.apply(
                        {"params": params["sampler"]},
                        seq,
                        vis_feats,
                        False,
                        mutable=["intermediates"],
                    )

                afn = cached_jit(
                    self, "_attn_jit", (seq.shape, frames.shape), _attn_fwd
                )
                _, inter = afn(
                    params, jax.numpy.asarray(frames), seq
                )
                # sown under layers -> stacked [L, ...]; take the last layer
                probs = jax.tree.leaves(inter)[0]
                attn = np.asarray(probs)[-1, 0]  # [S, S]
                self.tb.video(
                    f"s_attention_weights/{name}",
                    attn_rows_to_video(attn),
                    step,
                    fps=10,
                )
            except Exception as e:
                logger.warning("attention-video logging failed: %s", e)

    def test(self, params, frozen, datamodule, rng) -> Dict[str, float]:
        """Teacher-forced test loss (reference ``scripts/test.py:97-99``)."""
        eval_step = make_eval_step(self.system)
        loader = datamodule.test_dataloader()
        n = self._limit("limit_test_batches", len(loader))
        loss, per_cb = self._run_eval(eval_step, params, frozen, loader, n, rng)
        self.tb.scalar("test_loss_epoch", loss, 0)
        self.tb.scalars_per_codebook("test_loss_per_codebook", per_cb, 0)
        return {"test_loss": loss}
