"""Training state pytree."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    """Everything the jitted step mutates, as one donate-able pytree.

    Replaces the reference's loose (model, optimizer, global_step)
    triple; adding the RNG key makes runs resumable and bitwise
    replayable from a checkpoint.
    """

    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    key: jnp.ndarray  # PRNG key
    batch_stats: Optional[Any] = None  # for BatchNorm models (ResNet)

    @classmethod
    def create(cls, params, opt_state, key, batch_stats=None):
        return cls(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), dtype=jnp.int32),
            key=key,
            batch_stats=batch_stats,
        )
