"""AOT-compiled serving graphs via ``jax.export``.

The HTTP server (``scripts/serve.py``) jit-compiles its generation
pipeline at startup — minutes of cold XLA compile on a fresh serving
host. ``jax.export`` lets the pipeline be traced + lowered ONCE (e.g. on
a staging box with the same chip topology), serialized as versioned
StableHLO, and reloaded by any process with compatible devices — no
Python retracing, no re-lowering, and the model code doesn't even need
to be importable at load time. (The backend XLA compile of the StableHLO
still runs at the first call and hits the compile cache when warm — what
the artifact removes is the Python/tracing half of startup and the
model-code dependency.) Weights stay OUTSIDE the artifact
(runtime arguments), so one artifact serves every checkpoint of the same
architecture.

No reference counterpart: the reference re-traces per process and
serving is outside its scope (its inference entry is a batch script,
``/root/reference/scripts/generate.py``).

Artifact layout: ``<path>`` is the serialized export; ``<path>.json``
records the input contract (shapes, sampling config, platforms) for
honest mismatch errors at load time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


def _abstractify(tree):
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree
    )


def export_generate(
    system,
    params: Dict[str, Any],
    *,
    batch: int,
    tv: int,
    max_new_tokens: int,
    path: str | Path,
    tokens_per_frame: int = 7,
    sampling: Optional[Dict[str, Any]] = None,
    decode_buckets: int = 8,
    dac_chunk_size: Optional[int] = None,
) -> Dict[str, Any]:
    """Export ``system.generate`` (features -> audio + codes) as a
    serialized StableHLO artifact at ``path``.

    The exported callable has signature ``(params, feats[batch, tv, D],
    seed int32[]) -> (audio, codes)`` — the rng key is built inside the
    graph from the seed scalar so callers don't need typed key arrays.
    Returns the metadata dict (also written to ``<path>.json``).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    sampling = dict(sampling or {})
    cond_dim = system.sampler_config.cond_in_dim

    def fn(p, feats, seed):
        out = system.generate(
            p, None, jax.random.PRNGKey(seed),
            vis_feats=feats,
            max_new_tokens=max_new_tokens,
            tokens_per_frame=tokens_per_frame,
            decode_to_audio=True,
            decode_buckets=decode_buckets,
            dac_chunk_size=dac_chunk_size,
            **sampling,
        )
        return out["audio"], out["codes"]

    exp = jexport.export(jax.jit(fn))(
        _abstractify(params),
        jax.ShapeDtypeStruct((batch, tv, cond_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(exp.serialize())
    meta = {
        "batch": batch,
        "tv": tv,
        "cond_dim": cond_dim,
        "max_new_tokens": max_new_tokens,
        "tokens_per_frame": tokens_per_frame,
        "decode_buckets": decode_buckets,
        "dac_chunk_size": dac_chunk_size,
        "sampling": {k: str(v) for k, v in sampling.items()},
        "platforms": list(exp.platforms),
        "sample_rate": int(system.dac_config.sample_rate),
    }
    Path(str(path) + ".json").write_text(
        json.dumps(meta, indent=1), encoding="utf-8"
    )
    return meta


def load_generate(
    path: str | Path,
) -> Tuple[Callable[..., Tuple[Any, Any]], Dict[str, Any]]:
    """Load an artifact written by :func:`export_generate`.

    Returns ``(fn, meta)`` where ``fn(params, feats, seed)`` runs the
    AOT-compiled graph (``feats`` float32 ``[batch, tv, cond_dim]``,
    ``seed`` int32 scalar). Shape/dtype mismatches raise at call time
    with the export's recorded signature.
    """
    from jax import export as jexport

    path = Path(path)
    exp = jexport.deserialize(path.read_bytes())
    meta_path = Path(str(path) + ".json")
    meta = (
        json.loads(meta_path.read_text(encoding="utf-8"))
        if meta_path.exists()
        else {}
    )
    return exp.call, meta
