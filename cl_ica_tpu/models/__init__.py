"""Encoders, constraint heads, and invertible mixing networks (Flax).

Reference parity: encoders.py, layers.py, invertible_network_utils.py,
kitti_masks/model.py.
"""

from .layers import (
    PositionalEncoding2D,
    RescaleLayer,
    SoftclipLayer,
    smooth_leaky_relu,
)
from .mlp import MLPEncoder, get_mlp
from .invertible import (
    InvertibleMLP,
    construct_invertible_mlp,
    stack_mixings,
)
from .conv import ConvDecoder64, ConvEncoder64
from .resnet import ResNet, ResNet18, ResNet50, ResNet101, ResNet152
from .flows import CouplingFlow, FrozenFlow, get_flow, construct_invertible_flow

__all__ = [
    "PositionalEncoding2D",
    "RescaleLayer",
    "SoftclipLayer",
    "smooth_leaky_relu",
    "MLPEncoder",
    "get_mlp",
    "InvertibleMLP",
    "construct_invertible_mlp",
    "stack_mixings",
    "ConvEncoder64",
    "ConvDecoder64",
    "ResNet",
    "ResNet18",
    "ResNet50",
    "ResNet101",
    "ResNet152",
    "CouplingFlow",
    "FrozenFlow",
    "get_flow",
    "construct_invertible_flow",
]
