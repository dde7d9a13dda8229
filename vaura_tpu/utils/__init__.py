from vaura_tpu.utils.seeding import seed_everything

__all__ = [
    "seed_everything", "cast_floats", "cached_jit",
    "enable_compilation_cache",
]

import jax.numpy as _jnp
import jax as _jax


def cached_jit(owner, attr: str, key, fn, **jit_kwargs):
    """Shape-keyed jitted-closure cache stored as ``owner.<attr>`` (a dict).

    The repo-wide "(shape-keyed, cached) ``jax.jit`` at every user surface"
    discipline (CLAUDE.md) in one place: returns the jitted ``fn`` cached
    under ``key``, compiling and storing it on first use. ``key`` must
    capture every static the closure binds (shapes, flags, token counts);
    ``owner`` may be any object with settable attributes, including a
    module. ``fn`` is only jitted on a cache miss — passing a fresh lambda
    per call is fine.
    """
    cache = getattr(owner, attr, None)
    if cache is None:
        cache = {}
        setattr(owner, attr, cache)
    got = cache.get(key)
    if got is None:
        got = _jax.jit(fn, **jit_kwargs)
        cache[key] = got
    return got


def enable_compilation_cache(path) -> None:
    """Persistent XLA compilation cache at ``path`` (jax's disk cache):
    a process that re-lowers a graph another process already compiled
    loads the binary instead of recompiling — cold serving/training
    starts drop from minutes (flagship generation scan) to seconds.
    Exposed as ``trainer.compilation_cache_dir`` / serve
    ``compilation_cache_dir``. Safe to call more than once."""
    _jax.config.update("jax_compilation_cache_dir", str(path))
    # cache every graph: the default thresholds skip small/fast compiles,
    # but the per-chunk/per-shape graph families here are exactly the
    # many-medium-graphs case the thresholds pessimize
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def cast_floats(tree, dtype=_jnp.bfloat16):
    """Cast floating-point leaves of a pytree (e.g. params for inference)."""
    def cast(x):
        if hasattr(x, "dtype") and _jnp.issubdtype(x.dtype, _jnp.floating):
            return x.astype(dtype)
        return x

    return _jax.tree.map(cast, tree)
