"""64×64 conv encoder for the KITTI Masks experiment (Flax, NHWC).

Reference parity: /root/reference/kitti_masks/model.py:28-99 (BetaVAE_H,
the Higgins et al. beta-VAE encoder stripped to encoder-only and trained
contrastively). Layout is NHWC (TPU-native) rather than the reference's
NCHW; kaiming-normal init matches kitti_masks/model.py:102-106.
"""

from __future__ import annotations

import flax.linen as nn

from .layers import SoftclipLayer

_kaiming = nn.initializers.kaiming_normal()


class ConvEncoder64(nn.Module):
    """64×64×nc → z_dim conv encoder.

    conv(32,4,s2) → conv(32,4,s2) → conv(64,4,s2) → conv(64,4,s2)
    → conv(256,4,valid) → Linear(256, z_dim) [→ Softclip if box_norm],
    each conv followed by ReLU (kitti_masks/model.py:41-56).
    """

    z_dim: int = 10
    nc: int = 3
    box_norm: bool = False

    @nn.compact
    def __call__(self, x):
        # torch Conv2d(k=4, s=2, p=1) == SAME-style halving; express as
        # explicit padding (1,1) for exactness.
        for feat in (32, 32, 64, 64):
            x = nn.Conv(
                feat, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                kernel_init=_kaiming,
            )(x)
            x = nn.relu(x)
        x = nn.Conv(256, (4, 4), strides=(1, 1), padding="VALID", kernel_init=_kaiming)(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))  # B, 256
        x = nn.Dense(self.z_dim, kernel_init=_kaiming)(x)
        if self.box_norm:
            x = SoftclipLayer(n=self.z_dim, init_abs_bound=1.0, fixed_abs_bound=False)(x)
        return x


class ConvDecoder64(nn.Module):
    """z_dim → 64×64×nc transposed-conv decoder — the beta-VAE decoder
    the reference keeps commented out (kitti_masks/model.py:57-72) but
    needs for the SlowVAE baseline loss (losses.py:289-402). Mirror of
    ConvEncoder64: Linear(256) → deconv(64,4,valid) → deconv(64,4,s2)
    → deconv(32,4,s2) → deconv(32,4,s2) → deconv(nc,4,s2), ReLU between.
    Returns logits (no sigmoid; the loss applies it when appropriate)."""

    z_dim: int = 10
    nc: int = 3

    @nn.compact
    def __call__(self, z):
        x = nn.Dense(256, kernel_init=_kaiming)(z)
        x = x.reshape((x.shape[0], 1, 1, 256))
        x = nn.relu(x)
        x = nn.ConvTranspose(64, (4, 4), strides=(1, 1), padding="VALID",
                             kernel_init=_kaiming)(x)  # 4x4
        x = nn.relu(x)
        for feat in (64, 32, 32):
            x = nn.ConvTranspose(feat, (4, 4), strides=(2, 2),
                                 padding=((1, 1), (1, 1)),
                                 kernel_init=_kaiming)(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.nc, (4, 4), strides=(2, 2),
                             padding=((1, 1), (1, 1)), kernel_init=_kaiming)(x)
        return x
