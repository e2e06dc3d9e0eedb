"""SlowVAE baseline loss (Klindt et al.), JAX-native.

Reference parity: losses.py:289-402 (SlowVAELoss): beta-VAE ELBO over a
temporal pair plus a gamma-weighted KL between the posterior and a
Laplace transition prior:

  L = 2·recon + beta·KL(q ‖ N(0,1)) + gamma·KL_laplace(q, rate_prior)

where KL_laplace uses the closed-form cross entropy of a Normal under a
Laplace(rate_prior) density on the *difference* of the pair's means,
applied both ways (losses.py:347-372). The encoder output packs
[mu, logvar] (z_rec[:, :n] / z_rec[:, n:]).

Design deviation (functional JAX): the decoder/mixing are passed as
callables, and the reparametrization key is explicit — pass `key=` to
the call (the reference samples implicitly from torch's global RNG).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .infonce import CLLoss


def _normal_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))


@dataclasses.dataclass
class SlowVAELoss(CLLoss):
    """beta-VAE + Laplace-transition KL over temporal pairs."""

    dec_h: Callable  # decoder: (B, n) latents -> (B, ...) reconstruction logits
    g: Optional[Callable] = None  # mixing z -> observation (target of recon)
    gamma: float = 10.0
    beta: float = 1.0
    rate_prior: float = 6.0
    n: int = 1
    decoder_dist: str = "bernoulli"
    no_sigmoid: bool = False

    def _reconstruction_loss(self, x, x_recon):
        batch_size = x.shape[0]
        assert batch_size != 0
        if self.decoder_dist == "bernoulli":
            # sum BCE-with-logits / batch (losses.py:323-327)
            bce = jnp.maximum(x_recon, 0) - x_recon * x + jnp.log1p(
                jnp.exp(-jnp.abs(x_recon))
            )
            return jnp.sum(bce) / batch_size
        elif self.decoder_dist == "gaussian":
            if not self.no_sigmoid:
                x_recon = jax.nn.sigmoid(x_recon)
            return jnp.sum((x_recon - x) ** 2) / batch_size
        return None

    @staticmethod
    def _reparametrize(key, mu, logvar):
        std = jnp.exp(logvar / 2.0)
        return mu + std * jax.random.normal(key, mu.shape)

    @staticmethod
    def _ent_normal(logvar):
        return 0.5 * (logvar + jnp.log(2 * np.pi * np.e))

    @staticmethod
    def _cross_ent_normal(mu, logvar):
        return 0.5 * (mu**2 + jnp.exp(logvar)) + jnp.log(np.sqrt(2 * np.pi))

    def _cross_ent_laplace(self, mean, logvar, rate_prior):
        var = jnp.exp(logvar)
        sigma = jnp.sqrt(var)
        return (
            -jnp.log(rate_prior / 2.0)
            + rate_prior * sigma * np.sqrt(2.0 / np.pi)
            * jnp.exp(-(mean**2) / (2 * var))
            - rate_prior * mean * (1.0 - 2.0 * _normal_cdf(mean / sigma))
        )

    def _cross_ent_combined(self, mu0, mu1, logvar0, logvar1):
        logvar = jnp.concatenate([logvar0, logvar1])
        mu = jnp.concatenate([mu0, mu1])
        normal_entropy = self._ent_normal(logvar)
        cross_ent_normal = self._cross_ent_normal(mu, logvar)
        # couples: Laplace cross entropy both ways (losses.py:365-368)
        cross_ent_laplace = self._cross_ent_laplace(
            mu0 - mu1, logvar0, self.rate_prior
        ) + self._cross_ent_laplace(mu1 - mu0, logvar1, self.rate_prior)
        return [
            jnp.mean(jnp.sum(x, axis=1))
            for x in (normal_entropy, cross_ent_normal, cross_ent_laplace)
        ]

    def loss(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec, key=None):
        assert key is not None, "SlowVAELoss needs an explicit PRNG key"
        n = self.n
        assert z1.shape[1] == n
        mu0, logvar0 = z1_rec[:, :n], z1_rec[:, n:]
        mu1, logvar1 = z2_con_z1_rec[:, :n], z2_con_z1_rec[:, n:]

        target = self.g(jnp.concatenate([z1, z2_con_z1])) if self.g else (
            jnp.concatenate([z1, z2_con_z1])
        )
        z_sample = self._reparametrize(
            key, jnp.concatenate([mu0, mu1]), jnp.concatenate([logvar0, logvar1])
        )
        recon_loss = self._reconstruction_loss(target, self.dec_h(z_sample))

        normal_entropy, cross_ent_normal, cross_ent_laplace = (
            self._cross_ent_combined(mu0, mu1, logvar0, logvar1)
        )
        kl_normal = cross_ent_normal - normal_entropy
        kl_laplace = cross_ent_laplace - normal_entropy
        vae_loss = 2 * recon_loss + self.beta * kl_normal + self.gamma * kl_laplace
        return (
            vae_loss,
            jnp.full((z1.shape[0],), jnp.nan),
            [recon_loss, kl_normal, kl_laplace],
        )

    def __call__(self, z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec, key=None):
        return self.loss(z1, z2_con_z1, z3, z1_rec, z2_con_z1_rec, z3_rec, key=key)
