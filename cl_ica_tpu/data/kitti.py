"""KITTI Masks temporal-pair pipeline, TPU-first.

Reference parity: kitti_masks/dataset.py. Latents encode (center-of-mass
vertical, horizontal, area); a sample is frame t plus frame
t+Δ, Δ ~ U{1..max_delta_t} clamped within the same pedestrian sequence
(dataset.py:90-101). The default augmentation — a fixed 2° rotation,
±5 px random translation, and a shared horizontal flip applied
IDENTICALLY to both frames (the reference stacks them as channels of one
PIL image, dataset.py:31-42,110-120) — is reimplemented as a jitted,
vmapped nearest-neighbor affine warp on device, so the host only gathers
raw uint8 frames.

The Zenodo download of kitti_peds_v2.pickle (dataset.py:27-57) is kept
but gated: this environment has no egress, so a missing file raises with
instructions instead of silently retrying.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

KITTI_URL = "https://zenodo.org/record/3931823/files/kitti_peds_v2.pickle?download=1"


class KittiMasks:
    """Pedestrian-mask video sequences with temporal-pair sampling."""

    def __init__(
        self,
        path: str = "./data/kitti/",
        transform: Optional[str] = None,
        max_delta_t: int = 5,
        download: bool = True,
    ):
        self.path = path
        self.max_delta_t = max_delta_t
        self.use_augmentation = transform == "default"
        self.fname = "kitti_peds_v2.pickle"
        self._load(download)

    def _load(self, download: bool):
        file_path = os.path.join(self.path, self.fname)
        if not os.path.exists(file_path):
            if not download:
                raise FileNotFoundError(file_path)
            os.makedirs(self.path, exist_ok=True)
            print(f"file not found, downloading from {KITTI_URL} ...")
            from urllib import request

            try:
                request.urlretrieve(KITTI_URL, file_path)
            except Exception as e:
                raise FileNotFoundError(
                    f"{file_path} missing and download failed ({e}). Fetch "
                    f"kitti_peds_v2.pickle from Zenodo record 3931823 and "
                    f"place it at {file_path}."
                ) from e
        with open(file_path, "rb") as fh:
            data = pickle.load(fh)
        self.data = data["pedestrians"]
        self.latents = data["pedestrians_latents"]
        # first frame of a sequence can never be a pair start
        self.lens = [len(seq) - 1 for seq in self.data]
        self.cumlens = np.cumsum(self.lens)

    def __len__(self):
        return int(self.cumlens[-1])

    def locate(self, index: int) -> Tuple[int, int]:
        seq = int(np.searchsorted(self.cumlens, index, side="right"))
        start = index if seq == 0 else index - int(self.cumlens[seq - 1])
        return seq, start

    def get_pair(self, index: int, rng: np.random.Generator):
        """Raw (uint8 frame_t, frame_t+Δ, latents_t, latents_t+Δ)."""
        seq, start = self.locate(index)
        seq_len = len(self.data[seq])
        dt = int(rng.integers(1, self.max_delta_t + 1))
        end = min(start + dt, seq_len - 1)
        x1 = (self.data[seq][start].astype(np.uint8)) * 255
        x2 = (self.data[seq][end].astype(np.uint8)) * 255
        return x1, x2, self.latents[seq][start], self.latents[seq][end]

    def sample_pair_batch(self, batch_pairs: int, rng: np.random.Generator):
        """Host side: gather a batch of raw frame pairs + latents.
        -> x1, x2 uint8 (B, H, W); l1, l2 float (B, 3)."""
        idx = rng.choice(len(self), batch_pairs, replace=True)
        x1s, x2s, l1s, l2s = [], [], [], []
        for i in idx:
            a, b, l1, l2 = self.get_pair(int(i), rng)
            x1s.append(a)
            x2s.append(b)
            l1s.append(l1)
            l2s.append(l2)
        return (
            np.stack(x1s),
            np.stack(x2s),
            np.stack(l1s).astype(np.float32),
            np.stack(l2s).astype(np.float32),
        )

    # ---- dis-lib protocol (dataset.py:69-88) ----

    def sample_observations(self, num, random_state, return_latents=False):
        assert not (num % 2)
        rng = np.random.default_rng(random_state.randint(2**31))
        indices = random_state.choice(len(self), num, replace=False)
        batch, lats = [], []
        for ind in indices:
            x1, _, l1, _ = self.get_pair(int(ind), rng)
            x = x1.astype(np.float32)[None] / 255.0
            batch.append(x)
            lats.append(l1)
        batch = np.stack(batch)
        if return_latents:
            return batch, np.stack(lats)
        return batch

    def sample(self, num, random_state):
        x, y = self.sample_observations(num, random_state, return_latents=True)
        return y, x


def _affine_warp_nearest(img, angle_deg, tx, ty, flip):
    """Nearest-neighbor rotate(angle)+translate warp of one (H, W) image
    about its center, with optional horizontal flip. Matches PIL's
    inverse-mapping convention (output pixel pulls from input coords)."""
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse rotation then inverse translation
    src_x = cos * xx + sin * yy - tx
    src_y = -sin * xx + cos * yy - ty
    sx = jnp.round(src_x + cx).astype(jnp.int32)
    sy = jnp.round(src_y + cy).astype(jnp.int32)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    sx = jnp.clip(sx, 0, w - 1)
    sy = jnp.clip(sy, 0, h - 1)
    out = jnp.where(valid, img[sy, sx], 0.0)
    return jnp.where(flip, out[:, ::-1], out)


@jax.jit
def augment_mask_pairs(key, x1_u8, x2_u8, max_translate: float = 5.0):
    """Paired augmentation on device, vmapped over the batch: fixed +2°
    rotation (torchvision RandomAffine(degrees=(2, 2)) always draws
    exactly 2°), translation ~ U[-5, 5] px each axis, shared HFlip
    p=0.5 — identical parameters for both frames of each pair
    (dataset.py:31-42,110-120). Returns float32 in [0, 1]."""
    b = x1_u8.shape[0]
    k_t, k_f = jax.random.split(key)
    t = jax.random.uniform(k_t, (b, 2), minval=-max_translate, maxval=max_translate)
    flips = jax.random.bernoulli(k_f, 0.5, (b,))
    x1 = x1_u8.astype(jnp.float32) / 255.0
    x2 = x2_u8.astype(jnp.float32) / 255.0
    warp = jax.vmap(
        lambda a, b_, tx, ty, fl: (
            _affine_warp_nearest(a, 2.0, tx, ty, fl),
            _affine_warp_nearest(b_, 2.0, tx, ty, fl),
        )
    )
    y1, y2 = warp(x1, x2, t[:, 0], t[:, 1], flips)
    return y1, y2


def interleave_pairs(x1, x2):
    """Batch rows [x1_0, x2_0, x1_1, x2_1, ...] — the reference's
    custom_collate layout (dataset.py:138-145); its consumers then
    de-interleave with [::2]/[1::2] (solver.py:64-65)."""
    b = x1.shape[0]
    out = jnp.stack([x1, x2], axis=1)
    return out.reshape((2 * b,) + x1.shape[1:])


def return_data(args):
    """Dataset construction mirroring kitti_masks/dataset.py:148-179:
    batch halved for pairs; only KittiMasks supported; returns
    (dataset, batch_pairs, num_channels)."""
    assert args.image_size == 64, "currently only image size of 64 is supported"
    assert not (args.batch_size % 2)
    if args.dataset.lower() != "kittimasks":
        raise NotImplementedError(args.dataset)
    transform = None if getattr(args, "evaluate", False) else "default"
    data = KittiMasks(
        path=getattr(args, "dset_dir", "./data/kitti/"),
        transform=transform,
        max_delta_t=args.kitti_max_delta_t,
    )
    return data, args.batch_size // 2, 1
