"""Data pipelines: 3DIdent NN-matched pairs, KITTI temporal pairs.

Reference parity: datasets/threedident_dataset.py, kitti_masks/dataset.py,
infinite_iterator.py — redesigned TPU-first: batched on-device NN
matching (ops.knn) instead of per-sample FAISS in DataLoader workers, a
packed uint8 image store instead of per-sample PNG decode, and paired
augmentation as jitted device code instead of per-sample PIL transforms.
"""

from .threedident import (
    PrefetchingPairLoader,
    ThreeDIdentBatchSampler,
    SequentialThreeDIdent,
    PackedImageStore,
    pack_images,
    normalize_3dident,
    THREEDIDENT_MEAN,
    THREEDIDENT_STD,
)
from .kitti import KittiMasks, augment_mask_pairs, interleave_pairs, return_data
from .infinite_iterator import InfiniteIterator

__all__ = [
    "ThreeDIdentBatchSampler",
    "PrefetchingPairLoader",
    "SequentialThreeDIdent",
    "PackedImageStore",
    "pack_images",
    "normalize_3dident",
    "THREEDIDENT_MEAN",
    "THREEDIDENT_STD",
    "KittiMasks",
    "augment_mask_pairs",
    "interleave_pairs",
    "return_data",
    "InfiniteIterator",
]
