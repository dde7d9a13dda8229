"""Multi-host initialization.

The reference bootstraps ranks from torchrun/SLURM env vars
(``main.py:37-45``) and lets Lightning/NCCL coordinate. The TPU-native
equivalent is ``jax.distributed.initialize()`` (reads the TPU pod runtime
env on Cloud TPU; SLURM/manual env supported through the coordinator
address), after which every process sees the global device set and
``jax.process_index()`` replaces rank bookkeeping
(``utils/train_utils.py:57-70``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops when single-process. Arguments
    default to auto-detection (TPU pod metadata or SLURM env).

    Must run before ANY backend-initializing call — even
    ``jax.process_count()``/``jax.devices()`` would lock in a
    single-process backend, so the already-initialized check goes through
    ``jax.distributed.is_initialized`` only."""
    if jax.distributed.is_initialized():
        return
    env_world = int(os.environ.get("SLURM_NTASKS", os.environ.get("WORLD_SIZE", 1)))
    if coordinator_address is None and env_world <= 1 and num_processes is None:
        logger.info("single-process run; skipping jax.distributed.initialize")
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logger.info(
        "initialized distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_main_process() -> bool:
    """Host-0 gating for side effects (checkpoints, TB) — the analogue of
    the reference's rank-zero-only logic (``train_utils.py:57-62,101``)."""
    return jax.process_index() == 0
