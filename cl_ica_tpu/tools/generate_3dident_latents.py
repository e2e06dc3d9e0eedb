"""Create the 3DIdent latent grid (offline step 1 of dataset creation).

Reference parity: tools/3dident/generate_clevr_dataset_latents.py —
samples n_points uniform latents from Box³ × Sphere⁸ (periodic) or
Box¹⁰ (non-periodic), optionally fixes factor subsets for ablations,
and writes two arrays:
  raw_latents.npy — model-facing latents (what the NN matcher indexes);
  latents.npy     — renderer-facing values, reordered per-object as
                    [pos³, rot³, spot θ, hue obj, hue spot] + bg hue,
                    with spherical→angle conversion for the periodic
                    case (generate_clevr_dataset_latents.py:125-156).

The renderer semantics the value ranges map onto (per object: xyz
position ±3, three rotation angles, spotlight θ, object/spotlight hue;
per scene: background hue) are documented at
generate_clevr_dataset_latents.py:33-49. Rendering itself (Blender
Cycles) stays external; this tool produces its input.

Usage: python -m cl_ica_tpu.tools.generate_3dident_latents \
           --output-folder DIR [--n-points N] [flags]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..spaces import (
    LatentSpace,
    NBoxSpace,
    NSphereSpace,
    ProductLatentSpace,
    cartesian_to_spherical,
    spherical_to_cartesian,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-points", default=1000000, type=int)
    parser.add_argument("--n-objects", default=1, type=int)
    parser.add_argument("--output-folder", required=True, type=str)
    parser.add_argument("--position-only", action="store_true")
    parser.add_argument("--rotation-and-color-only", action="store_true")
    parser.add_argument("--rotation-only", action="store_true")
    parser.add_argument("--color-only", action="store_true")
    parser.add_argument("--fixed-spotlight", action="store_true")
    parser.add_argument("--non-periodic-rotation-and-color", action="store_true")
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args(argv)
    print(args)

    assert not (args.position_only and args.rotation_and_color_only), (
        "Only either position-only or rotation-and-color-only can be set"
    )
    os.makedirs(args.output_folder, exist_ok=True)

    n_ang = args.n_objects * 6 + 1
    n_non_ang = args.n_objects * 3
    uniform = lambda sp, k, size: sp.uniform(k, size)

    if args.non_periodic_rotation_and_color:
        s = LatentSpace(NBoxSpace(n_non_ang + n_ang), uniform, None)
    else:
        s = ProductLatentSpace(
            [
                LatentSpace(NBoxSpace(n_non_ang), uniform, None),
                LatentSpace(NSphereSpace(n_ang + 1), uniform, None),
            ]
        )

    key = jax.random.PRNGKey(args.seed)
    raw_latents = np.asarray(s.sample_marginal(key, args.n_points))

    if args.position_only or args.rotation_and_color_only:
        assert args.n_objects == 1, "Only one object is supported for fixed variables"

    if args.non_periodic_rotation_and_color:
        if args.position_only:
            raw_latents[:, n_non_ang:] = np.array(
                [-1, -0.66, -0.33, 0, 0.33, 0.66, 1]
            )
        if args.rotation_and_color_only or args.rotation_only or args.color_only:
            raw_latents[:, :n_non_ang] = np.array([0, 0, 0])
        if args.rotation_only:
            raw_latents[:, -3:] = np.array([-1, 0, 1.0])
        if args.color_only:
            raw_latents[:, n_non_ang:n_non_ang + 4] = np.array([-1, -0.5, 0.5, 1.0])
        if args.fixed_spotlight:
            raw_latents[:, [-2, -4]] = np.array([0.0, 0.0])

        np.save(os.path.join(args.output_folder, "raw_latents.npy"), raw_latents)

        rotation_and_color = raw_latents[:, n_non_ang:] * (np.pi / 2)
        position = raw_latents[:, :n_non_ang] * 3
    else:
        if args.position_only:
            spherical_fixed = np.array(
                [np.pi / 4, np.pi / 4, np.pi / 4, np.pi / 2, np.pi / 2, 0,
                 1.5 * np.pi]
            )
            raw_latents[:, n_non_ang:] = np.asarray(
                spherical_to_cartesian(1.0, spherical_fixed)
            )
        if args.rotation_and_color_only:
            raw_latents[:, :n_non_ang] = np.array([0, 0, 0])

        np.save(os.path.join(args.output_folder, "raw_latents.npy"), raw_latents)

        # cartesian (on-sphere) -> angles; all but the last map [0,π]→[0,2π]
        rotation_and_color = np.array(
            cartesian_to_spherical(raw_latents[:, n_non_ang:])[1], copy=True
        )
        rotation_and_color[:, :-1] *= 2

        position = raw_latents[:, :n_non_ang].copy()
        # z coordinate from [-1,1] to [0,1]
        position[:, 2:n_non_ang:3] = (position[:, 2:n_non_ang:3] + 1) / 2.0
        position *= 3

    latents = np.concatenate((position, rotation_and_color), axis=1)

    # reorder to renderer layout: per object [pos³, rot³+spotθ+hues(6)] + bg hue
    reordered = []
    for n in range(args.n_objects):
        reordered.append(latents.T[n * 3 : n * 3 + 3])
        reordered.append(latents.T[n_non_ang + n * 6 : n_non_ang + n * 6 + 6])
    reordered.append(latents.T[-1].reshape(1, -1))
    np.save(
        os.path.join(args.output_folder, "latents.npy"),
        np.concatenate(reordered, 0).T,
    )


if __name__ == "__main__":
    main()
