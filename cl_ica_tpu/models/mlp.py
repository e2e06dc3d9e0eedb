"""MLP encoder factory (Flax).

Reference parity: /root/reference/encoders.py:10-85 (get_mlp): Linear
stack + LeakyReLU, optional batch/group norm, and an output-constraint
head matching the assumed latent topology. Linear inits follow the
PyTorch default (uniform ±1/sqrt(fan_in) for kernel and bias) so the
init distribution matches the reference's.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import RescaleLayer, SoftclipLayer


def _torch_linear_init(scale_by_fan_in=True):
    """PyTorch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def kernel_init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel_init


class TorchLinear(nn.Module):
    """Dense layer with PyTorch-default initialization (both kernel and
    bias ~ U(±1/sqrt(fan_in))), for init-distribution parity with the
    reference encoders.

    dtype: optional COMPUTE dtype (params stay fp32 — same convention
    as the ResNet backbone's `dtype`); bfloat16 doubles MXU issue rate
    on TPU for the wide hidden layers."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / jnp.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (fan_in, self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.features,),
            )
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y


class MLPEncoder(nn.Module):
    """LeakyReLU MLP with optional normalization and constraint head.

    output_normalization ∈ {None, 'fixed_sphere', 'learnable_sphere',
    'fixed_box', 'learnable_box'} — encoders.py:64-79.
    layer_normalization ∈ {None, 'bn', 'gn'} — encoders.py:42-45.
    """

    n_out: int
    hidden: Sequence[int]
    layer_normalization: Optional[str] = None
    output_normalization: Optional[str] = None
    output_normalization_kwargs: Any = None
    # compute dtype for the Linear stack (params fp32; the constraint
    # head and everything downstream run fp32 — same convention as the
    # ResNet backbone's `dtype`). main_mlp exposes it as --bf16.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kwargs = dict(self.output_normalization_kwargs or {})
        widths = list(self.hidden) + [self.n_out]
        for i, w in enumerate(widths):
            x = TorchLinear(w, dtype=self.dtype)(x)
            if i < len(widths) - 1:
                if self.layer_normalization == "bn":
                    x = nn.BatchNorm(use_running_average=not train)(x)
                elif self.layer_normalization == "gn":
                    # GroupNorm(1, C) == LayerNorm over features
                    x = nn.GroupNorm(num_groups=1)(x)
                x = nn.leaky_relu(x)  # negative_slope 0.01, torch default
        x = x.astype(jnp.float32)  # head + loss in fp32

        if self.output_normalization == "fixed_sphere":
            x = RescaleLayer(fixed_r=True, **kwargs)(x)
        elif self.output_normalization == "learnable_sphere":
            x = RescaleLayer(init_r=1.0, fixed_r=False)(x)
        elif self.output_normalization == "fixed_box":
            x = SoftclipLayer(n=self.n_out, fixed_abs_bound=True, **kwargs)(x)
        elif self.output_normalization == "learnable_box":
            x = SoftclipLayer(n=self.n_out, fixed_abs_bound=False, **kwargs)(x)
        elif self.output_normalization is not None:
            raise ValueError(self.output_normalization)
        return x


def get_mlp(
    n_in: int,
    n_out: int,
    layers: Sequence[int],
    layer_normalization: Optional[str] = None,
    output_normalization: Optional[str] = None,
    output_normalization_kwargs=None,
    dtype: Any = None,
) -> MLPEncoder:
    """Factory mirroring reference encoders.get_mlp (encoders.py:10-85).

    dtype: optional compute dtype for the Linear stack (e.g.
    jnp.bfloat16 for MXU throughput; params and the constraint head
    stay fp32)."""
    if len(layers) == 0:
        assert n_in == n_out, "Network with no layers must have matching n_in/n_out"
    return MLPEncoder(
        n_out=n_out,
        hidden=tuple(layers),
        layer_normalization=layer_normalization,
        output_normalization=output_normalization,
        output_normalization_kwargs=output_normalization_kwargs,
        dtype=dtype,
    )
