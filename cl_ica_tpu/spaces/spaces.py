"""Topological spaces with probability densities, TPU-first.

Reference parity: /root/reference/spaces.py. Design difference: every
sampler here is a pure function of an explicit PRNG key with static
shapes, so a Space can live inside a jitted training step (the reference
samples on the host each step and pays a host→device copy,
main_mlp.py:260-261, plus a CPU round-trip for vMF, spaces.py:246-255).

Spaces are frozen dataclasses holding only Python scalars — they hash as
static jit arguments.
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from . import utils as sut
from .vmf import sample_vmf


def _broadcast_mean(mean, n):
    mean = jnp.asarray(mean, dtype=jnp.float32)
    if mean.ndim == 1:
        mean = mean[None, :]
    assert mean.shape[-1] == n
    return mean


@dataclasses.dataclass(frozen=True)
class Space(ABC):
    """Base class. Samplers: (key, ... , size) -> (size, n) float32."""

    @abstractmethod
    def uniform(self, key, size: int):
        ...

    @abstractmethod
    def normal(self, key, mean, std, size: int):
        ...

    @abstractmethod
    def laplace(self, key, mean, lbd, size: int):
        ...

    @abstractmethod
    def generalized_normal(self, key, mean, lbd, p, size: int):
        ...

    @property
    @abstractmethod
    def dim(self) -> int:
        ...


@dataclasses.dataclass(frozen=True)
class NRealSpace(Space):
    """Unconstrained R^N (reference spaces.py:35-119)."""

    n: int

    @property
    def dim(self) -> int:
        return self.n

    def uniform(self, key, size: int):
        raise NotImplementedError("Not defined on R^n")

    def normal(self, key, mean, std, size: int):
        mean = _broadcast_mean(mean, self.n)
        std = jnp.asarray(std, dtype=jnp.float32)
        return jax.random.normal(key, (size, self.n)) * std + mean

    def laplace(self, key, mean, lbd, size: int):
        mean = _broadcast_mean(mean, self.n)
        return jax.random.laplace(key, (size, self.n)) * lbd + mean

    def generalized_normal(self, key, mean, lbd, p, size: int):
        mean = _broadcast_mean(mean, self.n)
        return sut.sample_generalized_normal(key, mean, lbd, p, (size, self.n))


@dataclasses.dataclass(frozen=True)
class NSphereSpace(Space):
    """Hypersphere {x : |x| = r} ⊂ R^N (reference spaces.py:122-257).

    normal/laplace/generalized_normal sample in R^N around the (on-sphere)
    mean and project back; von_mises_fisher is the intrinsic conditional.
    """

    n: int
    r: float = 1.0

    @property
    def dim(self) -> int:
        return self.n

    def _project(self, x):
        return x / jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))

    def uniform(self, key, size: int):
        # Gaussian-normalize; note the reference (spaces.py:134-138) also
        # does not scale by r here — parity kept.
        return self._project(jax.random.normal(key, (size, self.n)))

    def normal(self, key, mean, std, size: int):
        mean = _broadcast_mean(mean, self.n)
        std = jnp.asarray(std, dtype=jnp.float32)
        return self._project(jax.random.normal(key, (size, self.n)) * std + mean)

    def laplace(self, key, mean, lbd, size: int):
        mean = _broadcast_mean(mean, self.n)
        return self._project(jax.random.laplace(key, (size, self.n)) * lbd + mean)

    def generalized_normal(self, key, mean, lbd, p, size: int):
        mean = _broadcast_mean(mean, self.n)
        return self._project(
            sut.sample_generalized_normal(key, mean, lbd, p, (size, self.n))
        )

    def von_mises_fisher(self, key, mean, kappa, size: int):
        """Intrinsic Normal on the sphere; fully on-device (cf. the
        reference's CPU round-trip at spaces.py:246-255)."""
        mean = _broadcast_mean(mean, self.n)
        if mean.shape[0] == 1:
            mean = jnp.broadcast_to(mean, (size, self.n))
        return sample_vmf(key, mean, kappa, size)


@dataclasses.dataclass(frozen=True)
class NBoxSpace(Space):
    """Box {x : min_ <= x_i <= max_} ⊂ R^N (reference spaces.py:260-351).

    Conditionals are truncated by elementwise rejection resampling inside
    a bounded while_loop (see utils.truncated_rejection_resampling).

    ``rej_mult`` is the reference README's ``--rej-mult`` memory/latency
    trade-off (buffer_size_factor: candidates drawn per rejection-loop
    iteration = rej_mult x size). The reference documents the flag at
    README.md:44 but never threads it into main_mlp; here it is wired.
    """

    n: int
    min_: float = -1.0
    max_: float = 1.0
    rej_mult: int = 1

    @property
    def dim(self) -> int:
        return self.n

    def uniform(self, key, size: int):
        return (
            jax.random.uniform(key, (size, self.n)) * (self.max_ - self.min_)
            + self.min_
        )

    def normal(self, key, mean, std, size: int):
        mean = _broadcast_mean(mean, self.n)
        std = jnp.asarray(std, dtype=jnp.float32)
        sampler = lambda k, s: jax.random.normal(k, (s, self.n)) * std + mean
        return sut.truncated_rejection_resampling(
            sampler, key, self.min_, self.max_, size, self.n,
            buffer_size_factor=self.rej_mult,
        )

    def laplace(self, key, mean, lbd, size: int):
        mean = _broadcast_mean(mean, self.n)
        sampler = lambda k, s: jax.random.laplace(k, (s, self.n)) * lbd + mean
        return sut.truncated_rejection_resampling(
            sampler, key, self.min_, self.max_, size, self.n,
            buffer_size_factor=self.rej_mult,
        )

    def generalized_normal(self, key, mean, lbd, p, size: int):
        mean = _broadcast_mean(mean, self.n)
        sampler = lambda k, s: sut.sample_generalized_normal(
            k, mean, lbd, p, (s, self.n)
        )
        return sut.truncated_rejection_resampling(
            sampler, key, self.min_, self.max_, size, self.n,
            buffer_size_factor=self.rej_mult,
        )
