"""Deterministic seeding (reference ``main.py:83-87``: global seed 666).

JAX RNG is explicit (threaded keys), so "seeding everything" means seeding
host-side numpy/python RNGs (data pipeline) and creating the root JAX key
from which all device randomness derives.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
