from vaura_tpu.utils.seeding import seed_everything

__all__ = ["seed_everything"]

import jax.numpy as _jnp
import jax as _jax


def cast_floats(tree, dtype=_jnp.bfloat16):
    """Cast floating-point leaves of a pytree (e.g. params for inference)."""
    def cast(x):
        if hasattr(x, "dtype") and _jnp.issubdtype(x.dtype, _jnp.floating):
            return x.astype(dtype)
        return x

    return _jax.tree.map(cast, tree)
