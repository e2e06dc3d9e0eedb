"""Deterministic seeding across numpy + JAX."""

from __future__ import annotations

import random
from typing import Tuple

import jax
import numpy as np


def seed_everything(seed: int) -> Tuple[np.random.Generator, jax.Array]:
    """Seed Python/numpy global RNGs (host-side init code paths, e.g. the
    condition-number pool) and return (np Generator, jax PRNG key) for
    explicit streams. Mirrors reference main_mlp.py:132-135."""
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed), jax.random.PRNGKey(seed)
