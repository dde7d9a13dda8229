from vaura_tpu.utils.seeding import seed_everything

__all__ = ["seed_everything", "cast_floats", "cached_jit"]

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


def cast_floats(tree, dtype=_jnp.bfloat16):
    """Cast floating-point leaves of a pytree (e.g. params for inference)."""
    def cast(x):
        if hasattr(x, "dtype") and _jnp.issubdtype(x.dtype, _jnp.floating):
            return x.astype(dtype)
        return x

    return _jax.tree.map(cast, tree)
