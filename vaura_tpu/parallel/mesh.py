"""Device mesh construction.

The reference's only parallelism is Lightning DDP over NCCL
(``scripts/train.py:66-69``, SURVEY.md §2.5). The TPU-native story is a
``jax.sharding.Mesh`` with up to three axes:

  * ``data``  — batch (pure DP),
  * ``fsdp``  — parameter/optimizer sharding (ZeRO-style) that also carries
    batch shards,
  * ``model`` — tensor parallelism over attention heads / FFN hidden.

Collectives are inserted by XLA from ``NamedSharding`` annotations; on a
multi-host slice initialize with ``jax.distributed.initialize()`` first
(``vaura_tpu.parallel.multihost``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "fsdp", "model")


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ``(data, fsdp, model)`` mesh. ``data=-1`` absorbs the
    remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * model) == 0, f"{n} devices not divisible by {fsdp * model}"
        data = n // (fsdp * model)
    assert data * fsdp * model == n, (
        f"mesh {data}x{fsdp}x{model} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(arr, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch is sharded over both data-like axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
