"""Latent spaces: a space × marginal × conditional sampler.

Reference parity: /root/reference/latent_spaces.py. The sampler callables
take an explicit PRNG key; a LatentSpace can therefore be closed over by
a jitted training step and sample on-device every iteration.

Callable signatures:
    sample_marginal(space, key, size) -> (size, dim)
    sample_conditional(space, key, z, size) -> (size, dim)
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from .spaces import Space


class LatentSpace:
    """Combines a topological space with marginal/conditional densities
    (reference latent_spaces.py:8-46)."""

    def __init__(
        self,
        space: Space,
        sample_marginal: Optional[Callable] = None,
        sample_conditional: Optional[Callable] = None,
    ):
        self.space = space
        self._sample_marginal = sample_marginal
        self._sample_conditional = sample_conditional

    @property
    def sample_conditional(self):
        if self._sample_conditional is None:
            raise RuntimeError("sample_conditional was not set")
        return lambda key, z, size, **kw: self._sample_conditional(
            self.space, key, z, size, **kw
        )

    @sample_conditional.setter
    def sample_conditional(self, value: Callable):
        assert callable(value)
        self._sample_conditional = value

    @property
    def sample_marginal(self):
        if self._sample_marginal is None:
            raise RuntimeError("sample_marginal was not set")
        return lambda key, size, **kw: self._sample_marginal(self.space, key, size, **kw)

    @sample_marginal.setter
    def sample_marginal(self, value: Callable):
        assert callable(value)
        self._sample_marginal = value

    def sample_pair(self, key, size: int):
        """Draw (z ~ marginal, z̃ ~ conditional(z)) in one call — the
        per-step data generator of main_mlp.py:196-200, jit-friendly."""
        km, kc = jax.random.split(key)
        z = self.sample_marginal(km, size)
        z_tilde = self.sample_conditional(kc, z, size)
        return z, z_tilde

    @property
    def dim(self) -> int:
        return self.space.dim


class ProductLatentSpace(LatentSpace):
    """Cartesian product of latent spaces (reference latent_spaces.py:49-75)."""

    def __init__(self, spaces: List[LatentSpace]):
        self.spaces = spaces

    def sample_conditional(self, key, z, size: int, **kw):
        keys = jax.random.split(key, len(self.spaces))
        x = []
        n = 0
        for s, k in zip(self.spaces, keys):
            z_s = z[..., n : n + s.space.n]
            n += s.space.n
            x.append(s.sample_conditional(k, z_s, size, **kw))
        return jnp.concatenate(x, axis=-1)

    def sample_marginal(self, key, size: int, **kw):
        keys = jax.random.split(key, len(self.spaces))
        x = [s.sample_marginal(k, size, **kw) for s, k in zip(self.spaces, keys)]
        return jnp.concatenate(x, axis=-1)

    def sample_pair(self, key, size: int):
        km, kc = jax.random.split(key)
        z = self.sample_marginal(km, size)
        z_tilde = self.sample_conditional(kc, z, size)
        return z, z_tilde

    @property
    def dim(self) -> int:
        return sum(s.dim for s in self.spaces)
