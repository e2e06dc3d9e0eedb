"""Sampling / coordinate primitives as pure, jittable JAX functions.

Reference parity: /root/reference/spaces_utils.py. The reference's
rejection loops run unbounded on the host (spaces_utils.py:106-142); here
rejection is a fixed-shape ``lax.while_loop`` with elementwise acceptance
masks, so the whole sampler stays inside one XLA program on TPU.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def spherical_to_cartesian(r, phi):
    """Convert spherical coordinates to cartesian coordinates.

    ``phi`` holds (..., n-1) angles; returns (..., n) cartesian points with
    radius ``r``. Matches the cumprod-of-sines construction of the
    reference (spaces_utils.py:8-39).
    """
    phi = jnp.asarray(phi)
    flat = phi.ndim == 1
    if flat:
        phi = phi[None, :]
    r = jnp.asarray(r, dtype=phi.dtype)
    if r.ndim == 0:
        r = jnp.full((phi.shape[0],), r, dtype=phi.dtype)

    # a = [2π, φ_1, ..., φ_{n-1}]; si = cumprod(sin(a)) with si[0]=1;
    # co = cos(a) rolled left so the last entry pairs with sin of all angles.
    a = jnp.concatenate(
        [jnp.full((phi.shape[0], 1), 2 * np.pi, dtype=phi.dtype), phi], axis=1
    )
    si = jnp.sin(a).at[:, 0].set(1.0)
    si = jnp.cumprod(si, axis=1)
    co = jnp.roll(jnp.cos(a), -1, axis=1)
    result = si * co * r[:, None]
    return result[0] if flat else result


def cartesian_to_spherical(x):
    """Convert cartesian to spherical coordinates; returns (r, phi).

    Matches reference spaces_utils.py:42-79 (incl. the 2π wrap of the last
    angle when x[..., -1] <= 0).
    """
    x = jnp.asarray(x)
    flat = x.ndim == 1
    if flat:
        x = x[None, :]

    # rs[:, i] = sqrt(sum_{j>=i} x_j^2): suffix L2 norms.
    rs = jnp.sqrt(
        jnp.cumsum((x**2)[:, ::-1], axis=1)[:, ::-1]
    )
    rs_safe = jnp.where(rs == 0, 1.0, rs)
    phi = jnp.arccos(jnp.clip(x / rs_safe, -1.0, 1.0))[:, :-1]
    wrap = (x[:, -1] <= 0).astype(phi.dtype)
    phi = phi.at[:, -1].add((2 * np.pi - 2 * phi[:, -1]) * wrap)
    r = rs[:, 0]
    if flat:
        return r[0], phi[0]
    return r, phi


def sample_generalized_normal(key, mean, lbd: float, p: float, shape):
    """Sample from a generalized Normal (Lp-exponential) distribution.

    density ∝ exp(-(|x-mean|/lbd)^p); sampled as sign * Gamma(1/p, 1)^{1/p}
    scaled by lbd, the same construction as the reference
    (spaces_utils.py:82-103, after TFP's GeneralizedNormal).
    """
    kg, ks = jax.random.split(key)
    ipower = 1.0 / p
    gamma_sample = jax.random.gamma(kg, ipower, shape=shape)
    sign = jax.random.rademacher(ks, shape=shape, dtype=jnp.float32)
    sampled = sign * jnp.power(jnp.abs(gamma_sample), ipower)
    return mean + lbd * sampled


def truncated_rejection_resampling(
    sampler_fn: Callable,
    key,
    min_: float,
    max_: float,
    size: int,
    n: int,
    max_iters: int = 128,
    buffer_size_factor: int = 1,
):
    """Elementwise rejection resampling onto the box [min_, max_]^n.

    ``sampler_fn(key, size) -> (size, n)`` draws untruncated proposals.
    Each *element* (not row) is kept once it lands inside the box,
    mirroring the per-element copy masks of the reference
    (spaces_utils.py:127-142), but as a fixed-shape ``lax.while_loop`` so
    it compiles into the surrounding jit. ``max_iters`` bounds the loop
    (acceptance per draw is ≥ the truncated mass, so for the
    concentrations used in practice a handful of iterations suffice).
    ``buffer_size_factor`` is the reference's memory/latency trade-off
    (the ``--rej-mult`` knob): draw factor×size candidates per loop
    iteration, folding them in order.
    """

    def cond(state):
        _, _, done, it = state
        return jnp.logical_and(~jnp.all(done), it < max_iters)

    def body(state):
        key, result, done, it = state
        key, sub = jax.random.split(key)
        buf = sampler_fn(sub, size * buffer_size_factor)
        buf = buf.reshape(buffer_size_factor, size, n)
        ok = (buf >= min_) & (buf <= max_)
        for i in range(buffer_size_factor):
            take = ok[i] & ~done
            result = jnp.where(take, buf[i], result)
            done = done | take
        return key, result, done, it + 1

    init = (
        key,
        jnp.zeros((size, n), dtype=jnp.float32),
        jnp.zeros((size, n), dtype=bool),
        jnp.array(0, dtype=jnp.int32),
    )
    _, result, done, _ = jax.lax.while_loop(cond, body, init)
    # Any element still unaccepted after max_iters is clamped into the box
    # (probability ~0 for reasonable concentrations; keeps shapes static).
    return jnp.clip(result, min_, max_) if max_iters else result
