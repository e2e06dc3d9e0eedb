"""Topological spaces with densities, as pure-JAX samplers.

Reference parity: spaces.py, spaces_utils.py, vmf.py, latent_spaces.py.
"""

from .utils import (
    spherical_to_cartesian,
    cartesian_to_spherical,
    sample_generalized_normal,
    truncated_rejection_resampling,
)
from .vmf import sample_vmf
from .spaces import Space, NRealSpace, NSphereSpace, NBoxSpace
from .latent_spaces import LatentSpace, ProductLatentSpace

__all__ = [
    "spherical_to_cartesian",
    "cartesian_to_spherical",
    "sample_generalized_normal",
    "truncated_rejection_resampling",
    "sample_vmf",
    "Space",
    "NRealSpace",
    "NSphereSpace",
    "NBoxSpace",
    "LatentSpace",
    "ProductLatentSpace",
]
