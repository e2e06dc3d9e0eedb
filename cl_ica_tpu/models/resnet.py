"""ResNet-18/50/101/152 in Flax (NHWC, TPU-native).

Reference parity: main_3dident.py:288-385 uses torchvision ResNets as the
3DIdent image encoder backbone. This is a from-scratch Flax
implementation of the standard architecture (He et al. 2016, v1 with
post-activation), matching torchvision's structure: 7×7/2 stem + maxpool,
4 stages, BasicBlock (18/34) or Bottleneck (50/101/152), global average
pool, final Dense(num_classes).

TPU notes: NHWC layout, fused conv+BN+ReLU left to XLA, and an optional
bfloat16 compute dtype for MXU throughput (params stay fp32).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int]
    conv: ModuleDef
    norm: ModuleDef
    # fused_bn: norm is a MinResBN ModuleDef — BN+ReLU and the block
    # tail's BN+add+ReLU run as single minimal-residual custom-VJP ops
    # (ops/bn_minres.py) instead of separate norm/relu/add HLOs.
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides)(x)
        if self.fused_bn:
            y = self.norm()(y)  # MinResBN: BN+ReLU fused
            y = self.conv(self.filters, (3, 3))(y)
            if residual.shape[-1] != self.filters or self.strides != (1, 1):
                residual = self.conv(
                    self.filters, (1, 1), self.strides, name="conv_proj"
                )(residual)
                residual = self.norm(act="none", name="norm_proj")(residual)
            return self.norm(scale_init=nn.initializers.zeros)(y, res=residual)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides, name="conv_proj")(
                residual
            )
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class Bottleneck(nn.Module):
    filters: int
    strides: Tuple[int, int]
    conv: ModuleDef
    norm: ModuleDef
    fused_bn: bool = False  # see BasicBlock.fused_bn

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        if self.fused_bn:
            y = self.norm()(y)
            y = self.conv(self.filters, (3, 3), self.strides)(y)
            y = self.norm()(y)
            y = self.conv(self.filters * 4, (1, 1))(y)
            if residual.shape[-1] != self.filters * 4 or self.strides != (1, 1):
                residual = self.conv(
                    self.filters * 4, (1, 1), self.strides, name="conv_proj"
                )(residual)
                residual = self.norm(act="none", name="norm_proj")(residual)
            return self.norm(scale_init=nn.initializers.zeros)(y, res=residual)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), self.strides)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), self.strides, name="conv_proj"
            )(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class _Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int
    num_filters: int = 64
    dtype: Any = jnp.float32  # compute dtype; bfloat16 for MXU throughput
    stem: str = "conv7"  # 'conv7' (torchvision parity) | 's2d' (MXU-friendly)
    # 'batch':  flax nn.BatchNorm (fp32 residuals under autodiff)
    # 'fast':   FastBatchNorm — same math, bf16 residuals (the HBM-traffic
    #           fix for the stem/stage1 bottleneck; see layers.FastBatchNorm)
    # 'minres': MinResBN — same math as 'fast', plus a minimal-residual
    #           custom VJP fusing BN+ReLU(+residual add): drops the
    #           pre-activation tensor from every block's residual set
    #           (ops/bn_minres.py — the round-3 HBM byte-floor attack)
    # 'minres8': minres with the saved activation quantized to
    #           float8_e4m3 (ops/bn_minres8.py) — the sub-bf16 residual
    #           probe, measured byte-NEUTRAL on v5e (XLA remats the
    #           quantize into backward; EXPERIMENTS). Opt-in record.
    # 'none':   no normalization (diagnostic)
    norm_kind: str = "batch"
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM traffic
    # Fuse the stem's BN+ReLU+maxpool into one Pallas kernel with a
    # minimal-residual VJP (ops/stem_pallas.py) — deletes the 112²×64
    # post-BN activation and the backward SelectAndScatter from HBM.
    # Same math/params as norm_kind='fast' (checkpoints interchange).
    fused_stem_pool: bool = False
    # 'xla' (default): BN+ReLU custom VJP + XLA maxpool/SelectAndScatter
    # 'argmax' (minres only): argmax-code pool VJP (ops/pool_minres.py)
    #          — measured NEGATIVE on v5e, kept for the record
    stem_pool: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_normal(),
        )
        if self.norm_kind == "none":
            def norm(*a, **k):
                k.pop("scale_init", None)
                k.pop("name", None)
                return _Identity()
        elif self.norm_kind == "fast":
            from .layers import FastBatchNorm

            norm = partial(
                FastBatchNorm,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
            )
        elif self.norm_kind in ("minres", "minres8"):
            from .layers import MinResBN

            norm = partial(
                MinResBN,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                residuals_f8=self.norm_kind == "minres8",
            )
        else:
            norm = partial(
                nn.BatchNorm,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )
        x = x.astype(self.dtype)
        if self.stem == "s2d_exact":
            # EXACT reformulation of the 7x7/stride-2 stem conv: identical
            # linear map (and identical (7,7,3,64) parameter, so
            # checkpoints interchange with stem='conv7'), but computed as
            # a 4x4/stride-1 conv over the 2x2 space-to-depth input.
            # Derivation: output(i,j) = sum_{u,v} K[u,v] X[2i+u-3, 2j+v-3];
            # substituting u-3 = 2k+a (k in -2..1, a in {0,1}) gives a 4x4
            # kernel over X'[p,q,(a,b,c)] = X[2p+a, 2q+b, c] with padding
            # (2,1). The 3-channel 7x7 conv runs at ~20 TF/s on the MXU
            # (3 input lanes of 128 used); the 12-channel 4x4 geometry is
            # ~4x denser. Zero-padding K to 8x8 supplies the (k,a)=(-2,0)
            # taps that fall outside the 7x7 support.
            kernel = self.param(
                "conv_init_kernel",
                nn.initializers.kaiming_normal(),
                (7, 7, x.shape[-1], self.num_filters),
                jnp.float32,
            ).astype(self.dtype)
            b, h, w, c = x.shape
            xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 8x8, u=2k+a+1
            kp = kp.reshape(4, 2, 4, 2, c, self.num_filters)
            kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.num_filters)
            x = jax.lax.conv_general_dilated(
                xs, kp,
                window_strides=(1, 1),
                padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
        elif self.stem == "s2d":
            # MLPerf-style space-to-depth stem: 2x2 patches into channels
            # (3 -> 12) then a 4x4/1 conv. Same output resolution and
            # receptive-field class as conv7/2, 4x better MXU input-lane
            # utilization on the first (lowest-arithmetic-intensity) conv.
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            x = conv(self.num_filters, (4, 4), (1, 1), padding="SAME",
                     name="conv_init")(x)
        else:
            x = conv(self.num_filters, (7, 7), (2, 2),
                     padding=[(3, 3), (3, 3)], name="conv_init")(x)
        if self.fused_stem_pool:
            # the fused stem ALWAYS batch-normalizes; combining it with
            # the no-norm diagnostic would silently diverge from the
            # unfused path (ADVICE r2)
            if self.norm_kind == "none":
                raise ValueError(
                    "fused_stem_pool=True applies BatchNorm in the stem "
                    "and cannot be combined with norm_kind='none'"
                )
            from .layers import StemBNReLUPool

            x = StemBNReLUPool(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="bn_init",
            )(x)
        elif self.norm_kind == "minres8" and self.stem_pool == "argmax":
            # MinResBNPool has no float8-residual variant: the stem —
            # the single largest activation — would silently keep bf16
            # residuals while the caller asked for f8 (same
            # silent-ignore class as fused_stem_pool + 'none' above)
            raise ValueError(
                "stem_pool='argmax' does not support norm_kind='minres8' "
                "(the argmax-pool stem keeps bf16 residuals); use "
                "norm_kind='minres' or the default stem_pool='xla'"
            )
        elif self.norm_kind == "minres" and self.stem_pool == "argmax":
            from .layers import MinResBNPool

            # BN+ReLU+maxpool as ONE custom VJP saving an int8 argmax
            # code instead of z (ops/pool_minres.py). MEASURED NEGATIVE
            # on v5e (EXPERIMENTS r3): XLA materializes reduce-window
            # operands (the int32 iota costs 3.3 GB) and pads don't
            # fuse, so HLO bytes REGRESS 63→92 GB. Kept opt-in for the
            # record; default stem_pool='xla' below is at the byte
            # floor the SelectAndScatter pipeline allows.
            x = MinResBNPool(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="bn_init",
            )(x)
        elif self.norm_kind in ("minres", "minres8"):
            x = norm(name="bn_init")(x)  # MinResBN: BN+ReLU in one VJP
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        else:
            x = norm(name="bn_init")(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        block_cls = (
            nn.remat(self.block_cls) if self.remat else self.block_cls
        )
        for i, block_size in enumerate(self.stage_sizes):
            for j in range(block_size):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    fused_bn=self.norm_kind in ("minres", "minres8"),
                )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


ResNet18 = partial(ResNet, stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock)
ResNet34 = partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=BasicBlock)
ResNet50 = partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=Bottleneck)
ResNet101 = partial(ResNet, stage_sizes=[3, 4, 23, 3], block_cls=Bottleneck)
ResNet152 = partial(ResNet, stage_sizes=[3, 8, 36, 3], block_cls=Bottleneck)
