"""CLI entry point (reference ``main.py``): layered config assembly + action
dispatch.

Usage::

    python main.py config=configs/experiments/dummy.yaml [key=value ...]

Actions: ``train`` | ``test`` | ``generate`` | ``finetune`` | ``eval`` |
``serve``. The last three go beyond the reference, where ``eval`` only
prints a pointer to the external evaluation framework (``main.py:109-111``)
and ``finetune`` raises NotImplementedError (``main.py:114-115``): here
``eval`` runs the in-repo FAD/KLD metrics (``scripts/eval_metrics.py``),
``finetune`` supports full and LoRA finetuning (``scripts/finetune.py``),
and ``serve`` starts the micro-batching HTTP server (``scripts/serve.py``).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).absolute().parent

logging.basicConfig(level=logging.WARNING)
logger = logging.getLogger("vaura_tpu")


def get_config(argv):
    from vaura_tpu.config import assemble_config, check_mandatory

    cfg = assemble_config(
        argv,
        defaults_path=REPO_ROOT / "configs" / "vaura_defaults.yaml",
        base_dir=REPO_ROOT,
    )
    check_mandatory(cfg)
    return cfg


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    cfg = get_config(argv)
    action = cfg.get("action")
    logger.setLevel(logging.INFO)

    # trainer.platform=cpu|tpu|gpu forces the JAX backend before first
    # device use (the reference delegates this to Lightning's
    # `accelerator`, configs/vaura_defaults.yaml:49). Essential for smoke
    # runs on machines where the default backend is an exclusive TPU.
    platform = (cfg.get("trainer") or {}).get("platform")
    if platform:
        import jax

        jax.config.update("jax_platforms", str(platform))

    # persistent XLA compilation cache: a restarted process loads the
    # binaries a previous run compiled instead of re-lowering (minutes of
    # flagship cold compile -> seconds)
    cache_dir = (cfg.get("trainer") or {}).get("compilation_cache_dir")
    if cache_dir:
        from vaura_tpu.utils import enable_compilation_cache

        enable_compilation_cache(cache_dir)

    # multi-host bootstrap (the reference reads torchrun/SLURM env at
    # main.py:37-45 and defers to Lightning/NCCL). Must run before any
    # backend-initializing jax call; no-ops single-process. Knobs:
    # trainer.coordinator_address / num_processes / process_id, else
    # SLURM/TPU-pod auto-detection.
    tr = cfg.get("trainer") or {}
    if tr.get("coordinator_address") or tr.get("num_processes"):
        from vaura_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(
            coordinator_address=tr.get("coordinator_address"),
            num_processes=tr.get("num_processes"),
            process_id=tr.get("process_id"),
        )
    else:
        import os as _os

        if int(_os.environ.get("SLURM_NTASKS", _os.environ.get("WORLD_SIZE", 1))) > 1:
            from vaura_tpu.parallel.multihost import initialize_distributed

            initialize_distributed()

    if action == "train":
        from scripts.train import train

        train(cfg)
    elif action == "test":
        from scripts.test import test

        test(cfg)
    elif action in ("generate", "predict"):
        from scripts.generate import generate

        generate(cfg)
    elif action == "eval":
        gen_dir = cfg.get("generated_dir") or cfg.get("output_dir")
        ref_dir = cfg.get("reference_dir")
        if gen_dir and ref_dir:
            # in-repo objective metrics (mel-L1 / SI-SNR / LUFS delta) +
            # FAD with a named embedder: embedder=vggish embedder_ckpt=...
            # gives the standard published-FAD embedding (ops/vggish.py);
            # melstats is the offline deterministic fallback
            import json as _json

            from scripts.eval_metrics import evaluate_dirs

            report = evaluate_dirs(
                gen_dir, ref_dir,
                fad=bool(cfg.get("fad")),
                embedder=str(cfg.get("embedder", "melstats")),
                embedder_ckpt=cfg.get("embedder_ckpt"),
            )
            print(_json.dumps(report["mean"], indent=2))
        else:
            print(
                "eval: pass generated_dir=... reference_dir=... for the "
                "in-repo objective metrics (scripts/eval_metrics.py), or "
                "use an external FAD/KLD framework as the reference does "
                "(reference README.md:93)."
            )
    elif action == "finetune":
        # goes beyond the reference, which raises NotImplementedError here
        # (reference main.py:114-115)
        from scripts.finetune import finetune

        finetune(cfg)
    elif action == "serve":
        # serving front-end (no reference counterpart; scripts/serve.py)
        from scripts.serve import run_server

        run_server(cfg)
    else:
        raise ValueError(f"Unknown action {action!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
