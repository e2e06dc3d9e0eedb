"""Post-training disentanglement evaluation for KITTI Masks.

Reference parity: kitti_masks/evaluate_disentanglement.py — load the
'last' checkpoint, build a mean_rep encoder, run the MCC metric through
the dis-lib protocol (generate a batch-factor code from the dataset,
compute representations, Hungarian-match correlations), write a
structured results json.

The reference routes this through gin + TF1 + disentanglement_lib
(installed at runtime, main_kitti.py:10-13) and reads a metric_configs/
directory that is not shipped in the repo. Here the harness is plain
Python: for continuous datasets (kittimasks) only 'mcc' runs
(evaluate_disentanglement.py:66-72); defaults num_train=10000,
batch_size=16 match dis-lib's standard mcc config.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from ..evaluation import compute_mcc, compute_mig, compute_sap


def generate_batch_factor_code(
    dataset, representation_function, num_points, random_state, batch_size
):
    """dis-lib utils.generate_batch_factor_code protocol: returns
    (representations (rep_dim, N), factors (factor_dim, N))."""
    reps, factors = [], []
    i = 0
    while i < num_points:
        num = min(batch_size, num_points - i)
        num += num % 2  # sample_observations needs even counts
        obs, fac = dataset.sample_observations(
            num, random_state, return_latents=True
        )
        reps.append(representation_function(obs[: num_points - i]))
        factors.append(fac[: num_points - i])
        i += len(factors[-1])
    return np.concatenate(reps, axis=0).T, np.concatenate(factors, axis=0).T


def evaluate_disentanglement(
    args,
    dataset,
    representation_function,
    num_train: int = 10000,
    batch_size: int = 16,
):
    """Run the metric set; continuous datasets -> only MCC."""
    continuous = args.dataset == "kittimasks" or (
        args.dataset == "natural" and not getattr(args, "natural_discrete", False)
    )
    # continuous datasets -> MCC only (evaluate_disentanglement.py:66-72);
    # discrete ones also get the standard dis-lib metrics
    metric_names = ["mcc"] if continuous else ["mcc", "mig", "sap"]
    random_state = np.random.RandomState(0)

    all_results = {}
    for post in ["mean"]:
        for metric_name in metric_names:
            if args.specify and not any(
                s in metric_name for s in args.specify.split("_")
            ):
                continue
            if args.verbose:
                print(f"Computing metric '{metric_name}' on '{post}'...")
            seed = random_state.randint(2**32)
            t0 = time.time()
            mus, ys = generate_batch_factor_code(
                dataset,
                representation_function,
                num_train,
                np.random.RandomState(seed),
                batch_size,
            )
            if metric_name == "mcc":
                results_dict = compute_mcc(
                    mus, ys, "Pearson", np.random.RandomState(seed)
                )
            elif metric_name == "mig":
                results_dict = compute_mig(mus, ys)
            else:
                results_dict = compute_sap(mus, ys)
            results_dict["elapsed_time"] = time.time() - t0
            output_dir = os.path.join(
                args.output_dir, "evaluation", args.ckpt_name, post, metric_name
            )
            os.makedirs(output_dir, exist_ok=True)
            with open(
                os.path.join(output_dir, "evaluation_results.json"), "w"
            ) as fh:
                json.dump(
                    {k: float(v) for k, v in results_dict.items()}, fh, indent=2
                )
            all_results[(post, metric_name)] = results_dict
            if args.verbose:
                headline = next(iter(results_dict.items()))
                print(f"{metric_name}: {headline[0]}={headline[1]:.4f} "
                      f"took {results_dict['elapsed_time']:.1f}s")
    return all_results


def main(args, dataset):
    """Load checkpoint + evaluate (evaluate_disentanglement.py:20-97)."""
    import jax
    import jax.numpy as jnp
    import pickle

    from ..models import ConvEncoder64

    net = ConvEncoder64(
        z_dim=args.z_dim, nc=args.num_channel, box_norm=bool(args.box_norm)
    )
    file_path = os.path.join(args.ckpt_dir, args.ckpt_name)
    with open(file_path, "rb") as fh:
        checkpoint = pickle.load(fh)
    params = jax.tree.map(jnp.asarray, checkpoint["model_states"]["net"])
    apply_jit = jax.jit(net.apply)

    def mean_rep(x):
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim == 4 and x.shape[1] in (1, 3):  # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        return np.asarray(apply_jit(params, x))

    return evaluate_disentanglement(args, dataset, mean_rep)
