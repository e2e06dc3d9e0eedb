"""Coupling-flow networks (GIN / GLOW) in Flax.

Reference parity: encoders.get_flow (encoders.py:88-152) and
construct_invertible_flow (invertible_network_utils.py:126-142), which
delegate to FrEIA's GINCouplingBlock / GLOWCouplingBlock. Reimplemented
natively: each block applies two affine half-couplings (transform x1
conditioned on x2, then x2 conditioned on the new x1) with FrEIA's
soft-clamped scale e^{clamp·(2/π)·atan(s/clamp)}; GIN additionally
centers the log-scales per half so each block is volume-preserving
(log-det 0). The subnet is the reference's Linear-ReLU-Linear-ReLU-
Linear stack (encoders.py:113-124), optionally zero-initialized to the
identity flow.

Both directions are exact inverses; `forward` also returns the
log-determinant (0 for GIN by construction).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLAMP = 2.0


class _Subnet(nn.Module):
    c_out: int
    width: int
    init_identity: bool

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width)(x)
        x = nn.relu(x)
        x = nn.Dense(self.width)(x)
        x = nn.relu(x)
        last_kwargs = (
            dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
            if self.init_identity
            else {}
        )
        return nn.Dense(self.c_out, **last_kwargs)(x)


def _soft_scale(s):
    """FrEIA soft clamp: exp(clamp * 0.636 * atan(s / clamp))."""
    return CLAMP * 0.636 * jnp.arctan(s / CLAMP)


class CouplingBlock(nn.Module):
    """One GIN/GLOW block: two conditional affine half-couplings."""

    n: int
    coupling: str  # 'gin' | 'glow'
    width: int
    init_identity: bool

    def setup(self):
        half1 = self.n // 2
        half2 = self.n - half1
        self.split = half1
        self.subnet1 = _Subnet(2 * half1, self.width, self.init_identity)
        self.subnet2 = _Subnet(2 * half2, self.width, self.init_identity)

    def _affine_params(self, subnet, cond, out_dim):
        st = subnet(cond)
        s, t = st[..., :out_dim], st[..., out_dim:]
        log_scale = _soft_scale(s)
        if self.coupling == "gin":
            # volume preserving: per-sample zero-mean log-scales
            log_scale = log_scale - jnp.mean(log_scale, axis=-1, keepdims=True)
        return log_scale, t

    def forward(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x1, x2 = x[..., : self.split], x[..., self.split :]
        ls1, t1 = self._affine_params(self.subnet1, x2, self.split)
        y1 = x1 * jnp.exp(ls1) + t1
        ls2, t2 = self._affine_params(self.subnet2, y1, self.n - self.split)
        y2 = x2 * jnp.exp(ls2) + t2
        logdet = jnp.sum(ls1, -1) + jnp.sum(ls2, -1)
        return jnp.concatenate([y1, y2], -1), logdet

    def inverse(self, y):
        y1, y2 = y[..., : self.split], y[..., self.split :]
        ls2, t2 = self._affine_params(self.subnet2, y1, self.n - self.split)
        x2 = (y2 - t2) * jnp.exp(-ls2)
        ls1, t1 = self._affine_params(self.subnet1, x2, self.split)
        x1 = (y1 - t1) * jnp.exp(-ls1)
        return jnp.concatenate([x1, x2], -1)

    def __call__(self, x):
        return self.forward(x)


class CouplingFlow(nn.Module):
    """Stack of num_nodes coupling blocks (reference default 8,
    encoders.py:94)."""

    n: int
    coupling_block: str = "gin"
    num_nodes: int = 8
    node_size_factor: int = 1
    init_identity: bool = False

    def setup(self):
        assert self.coupling_block in ("gin", "glow")
        # reference subnet width: c_in * node_size (encoders.py:115);
        # c_in here is the half-width conditioned on
        width = max(self.n * self.node_size_factor, 2)
        self.blocks = [
            CouplingBlock(
                n=self.n,
                coupling=self.coupling_block,
                width=width,
                init_identity=self.init_identity,
            )
            for _ in range(self.num_nodes)
        ]

    def forward(self, x):
        logdet = jnp.zeros(x.shape[:-1], dtype=x.dtype)
        for blk in self.blocks:
            x, ld = blk.forward(x)
            logdet = logdet + ld
        return x, logdet

    def inverse(self, y):
        for blk in reversed(self.blocks):
            y = blk.inverse(y)
        return y

    def __call__(self, x):
        return self.forward(x)[0]


def get_flow(
    n_in: int,
    n_out: int,
    init_identity: bool = False,
    coupling_block: str = "gin",
    num_nodes: int = 8,
    node_size_factor: int = 1,
) -> CouplingFlow:
    """Factory mirroring reference encoders.get_flow (encoders.py:88-152)."""
    assert n_in == n_out
    return CouplingFlow(
        n=n_in,
        coupling_block=coupling_block,
        num_nodes=num_nodes,
        node_size_factor=node_size_factor,
        init_identity=init_identity,
    )


class FrozenFlow:
    """Frozen flow mixing g (invertible_network_utils.py:126-142):
    module + fixed params as one jit-safe callable."""

    def __init__(self, module: CouplingFlow, params):
        self.module = module
        self.params = params

    def __call__(self, x):
        return self.module.apply(self.params, x)

    def inverse(self, y):
        return self.module.apply(self.params, y, method=CouplingFlow.inverse)


def construct_invertible_flow(
    n: int,
    coupling_block: str = "gin",
    num_nodes: int = 8,
    node_size_factor: int = 1,
    key=None,
) -> FrozenFlow:
    """Frozen invertible flow mixing (invertible_network_utils.py:126-142)."""
    module = get_flow(n, n, False, coupling_block, num_nodes, node_size_factor)
    key = key if key is not None else jax.random.PRNGKey(np.random.randint(2**31))
    params = module.init(key, jnp.zeros((1, n)))
    return FrozenFlow(module, params)
