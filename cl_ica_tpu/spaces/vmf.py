"""Vectorized von Mises-Fisher sampling on TPU.

Reference parity: /root/reference/vmf.py (Wood's algorithm: beta proposal
+ log-acceptance test, vmf.py:88-114). The reference runs an unbounded
numpy loop on the host and forces a CPU round-trip on every conditional
draw (spaces.py:246-255). Here the rejection loop is a fixed-shape
``lax.while_loop`` over the whole batch with acceptance masks, so vMF
sampling jits into the training step and runs on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_weights(key, kappa, dim: int, num_samples: int, max_iters: int = 256):
    """Rejection-sample the cosine w of the angle to mu on S^{dim-1}.

    Wood (1994): propose z ~ Beta(a, a) with a = (dim-1)/2, map through
    w = (1-(1+b)z)/(1-(1-b)z), accept when
    kappa*w + (dim-1)*log(1-x*w) - c >= log(u).
    """
    d = dim - 1  # S^{n-1}
    kappa = jnp.asarray(kappa, dtype=jnp.float32)
    b = d / (jnp.sqrt(4.0 * kappa**2 + d**2) + 2.0 * kappa)
    x = (1.0 - b) / (1.0 + b)
    c = kappa * x + d * jnp.log(1.0 - x**2)

    def cond(state):
        _, _, accepted, it = state
        return jnp.logical_and(~jnp.all(accepted), it < max_iters)

    def body(state):
        key, w, accepted, it = state
        key, kb, ku = jax.random.split(key, 3)
        z = jax.random.beta(kb, d / 2.0, d / 2.0, shape=(num_samples,))
        w_prop = (1.0 - (1.0 + b) * z) / (1.0 - (1.0 - b) * z)
        u = jax.random.uniform(ku, shape=(num_samples,))
        acc = kappa * w_prop + d * jnp.log(1.0 - x * w_prop) - c >= jnp.log(u)
        w = jnp.where(acc & ~accepted, w_prop, w)
        return key, w, accepted | acc, it + 1

    init = (
        key,
        jnp.full((num_samples,), x, dtype=jnp.float32),  # mode as safe fallback
        jnp.zeros((num_samples,), dtype=bool),
        jnp.array(0, dtype=jnp.int32),
    )
    _, w, _, _ = jax.lax.while_loop(cond, body, init)
    return w


def _sample_orthonormal_to(key, mu):
    """Sample unit vectors orthogonal to each row of mu (vmf.py:125-134)."""
    v = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    proj = (
        mu
        * jnp.sum(mu * v, axis=-1, keepdims=True)
        / jnp.linalg.norm(mu, axis=-1, keepdims=True)
    )
    ortho = v - proj
    return ortho / jnp.linalg.norm(ortho, axis=-1, keepdims=True)


def sample_vmf(key, mu, kappa, num_samples: int):
    """Draw vMF samples around per-row means mu with concentration kappa.

    mu: (num_samples, n) or (n,) unit vectors. Fully jittable; all shapes
    static. Matches the construction of reference vmf.py:48-68:
    result = v * sqrt(1-w²) + w * mu with v ⟂ mu.
    """
    mu = jnp.asarray(mu, dtype=jnp.float32)
    if mu.ndim == 1:
        mu = jnp.broadcast_to(mu[None, :], (num_samples, mu.shape[0]))
    dim = mu.shape[1]
    kw, kv = jax.random.split(key)
    w = _sample_weights(kw, kappa, dim, num_samples)
    v = _sample_orthonormal_to(kv, mu)
    return v * jnp.sqrt(jnp.maximum(1.0 - w**2, 0.0))[:, None] + w[:, None] * mu


def sample_vmf_sequential(key, mu, kappa, num_samples: int):
    """API-parity alias for the reference's sequential variant
    (vmf.py:18-45). The vectorized sampler is used under the hood — the
    sequential path existed only because numpy rejection loops don't
    vectorize; under jit the distinction disappears."""
    return sample_vmf(key, mu, kappa, num_samples)
