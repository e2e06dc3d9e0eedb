"""Jit-safe numerical sanitizers.

The reference asserts on NaNs eagerly (losses.py:214,233) — impossible
under jit. Here the guards are jax.experimental.checkify checks, enabled
by CL_ICA_TPU_DEBUG=1 (zero cost otherwise)."""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
from jax.experimental import checkify


def debug_enabled() -> bool:
    return os.environ.get("CL_ICA_TPU_DEBUG", "0") == "1"


def nan_check(x, name: str = "value"):
    """Inside jit: error (under checkify) if x has NaN/Inf. Identity
    passthrough when debugging is off."""
    if not debug_enabled():
        return x
    checkify.check(jnp.all(jnp.isfinite(x)), f"non-finite values in {name}")
    return x


def checkify_wrap(fn):
    """Wrap a jitted function so checkify errors surface as Python
    exceptions when debugging is on; transparent otherwise.

    Returns fn' with the same signature; raises ValueError on failed
    checks."""
    if not debug_enabled():
        return fn

    checked = checkify.checkify(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
