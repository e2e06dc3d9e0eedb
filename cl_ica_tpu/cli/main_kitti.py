"""KITTI Masks experiment orchestration (TPU-native).

Reference parity: /root/reference/main_kitti.py — same flag inventory
(README.md:148-188), experiment-dir layout
{dataset}_{param}/{p}_{box_norm}/{seed}, args json dump, train via
Solver then automatic disentanglement eval, and the random-search /
random-seeds outer loops over (beta, gamma, rate_prior).

Differences by design: no runtime `pip install` of TF1/dis-lib/gin (the
reference mutates the environment at import, main_kitti.py:10-13); the
metric harness is the plain-Python equivalent in kitti_evaluate.

Usage: python -m cl_ica_tpu.cli.main_kitti [flags]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np

from ..data.kitti import return_data
from .kitti_solver import Solver
from .kitti_evaluate import main as eval_dis


def build_parser():
    # flag inventory mirrors main_kitti.py:100-242
    parser = argparse.ArgumentParser(
        description="Disentanglement with InfoNCE/Contrastive Learning - KITTI Masks"
    )
    parser.add_argument("--box-norm", type=int, default=0)
    parser.add_argument("--p", type=int, default=1)
    parser.add_argument("--experiment-dir", type=str, default="", help="specify path")
    parser.add_argument("--evaluate", action="store_true", default=False,
                        help="evaluate instead of train")
    parser.add_argument("--specify", default="", type=str,
                        help="use argument to only compute a subset of metrics")
    parser.add_argument("--random-search", action="store_true", default=False,
                        help="whether to random search for params")
    parser.add_argument("--random-seeds", action="store_true", default=False,
                        help="whether to go over random seeds with UDR params")
    parser.add_argument("--seed", default=2, type=int, help="random seed")
    parser.add_argument("--beta", default=1, type=float, help="weight for kl to normal")
    parser.add_argument("--gamma", default=10, type=float,
                        help="weight for kl to laplace")
    parser.add_argument("--rate-prior", default=6, type=float,
                        help="rate (or inverse scale) for prior laplace "
                             "(larger -> sparser).")
    parser.add_argument("--data-distribution", default="laplace", type=str,
                        help="(laplace, uniform)")
    parser.add_argument("--rate-data", default=1, type=float,
                        help="rate (or inverse scale) for data laplace (larger -> "
                             "sparser). (-1 = rand).")
    parser.add_argument("--data-k", default=-1, type=int,
                        help="k for data uniform (-1 = rand).")
    parser.add_argument("--betavae", action="store_true", default=False,
                        help="whether to do standard betavae training (gamma=0)")
    parser.add_argument("--search-beta", action="store_true", default=False,
                        help="whether to do rand search over beta")
    parser.add_argument("--output-dir", default="outputs", type=str,
                        help="output directory")
    parser.add_argument("--log-dir", default="logs", type=str, help="log directory")
    parser.add_argument("--ckpt-dir", default="checkpoints", type=str,
                        help="checkpoint directory")
    parser.add_argument("--max-iter", default=300000, type=float,
                        help="maximum training iteration")
    parser.add_argument("--dataset", default="kittimasks", type=str,
                        help="dataset name (dsprites, cars3d, smallnorb, shapes3d, "
                             "mpi3d, kittimasks, natural")
    parser.add_argument("--batch-size", default=64, type=int, help="batch size")
    parser.add_argument("--num-workers", default=2, type=int,
                        help="dataloader num_workers (parity no-op here: "
                             "the corpus is device-resident and sampling "
                             "is fused into the scanned train step, so "
                             "there is no host dataloader to parallelize)")
    parser.add_argument("--image-size", default=64, type=int,
                        help="image size. now only (64,64) is supported")
    parser.add_argument("--use-writer", action="store_true", default=False,
                        help="whether to use a log writer")
    parser.add_argument("--z-dim", default=10, type=int,
                        help="dimension of the representation z")
    parser.add_argument("--lr", default=1e-4, type=float, help="learning rate")
    parser.add_argument("--beta1", default=0.9, type=float,
                        help="Adam optimizer beta1")
    parser.add_argument("--beta2", default=0.999, type=float,
                        help="Adam optimizer beta2")
    parser.add_argument("--ckpt-name", default="last", type=str,
                        help="load previous checkpoint. insert checkpoint filename")
    parser.add_argument("--resume", action="store_true", default=False,
                        help="continue training from --ckpt-name, restoring "
                             "{iter, params, optim, RNG} — trajectory "
                             "identical to an uninterrupted run (the "
                             "reference's equivalent load is dead code, "
                             "solver.py:42-43)")
    parser.add_argument("--log-step", default=1000, type=int,
                        help="numer of iterations after which data is logged")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of the training "
                             "loop into this directory (TensorBoard/XProf).")
    parser.add_argument("--mesh", type=int, default=0,
                        help="Train data-parallel over an N-device mesh: "
                             "batch rows sharded inside the scanned chunk, "
                             "InfoNCE negatives global (same loss as "
                             "single-device). 0/1 = single device.")
    parser.add_argument("--fused-loss", action="store_true",
                        help="Force the streaming Pallas InfoNCE kernel "
                             "(default: auto — fused on TPU; under "
                             "--mesh it runs per-shard via shard_map)")
    parser.add_argument("--no-fused-loss", action="store_true",
                        help="Force the materialized XLA loss path "
                             "(escape hatch for the fused kernel)")
    parser.add_argument("--save-step", default=10000, type=int,
                        help="number of iterations after which a checkpoint is saved")
    parser.add_argument("--kitti-max-delta-t", default=1, type=int,
                        help="max t difference between frames sampled from "
                             "kitti data loader.")
    # ---- flags beyond the reference set (documented in PARITY.md) ----
    parser.add_argument("--augment", action="store_true", default=False,
                        help="enable the paired RandomAffine+HFlip "
                             "augmentation the reference defines but "
                             "never wires into training "
                             "(kitti_masks/dataset.py:31-42 vs :158-163)")
    parser.add_argument("--lr-cosine", action="store_true", default=False,
                        help="cosine-decay the learning rate to 0 over "
                             "max-iter (late-run norm-drift mitigation)")
    parser.add_argument("--weight-decay", default=0.0, type=float,
                        help="AdamW decoupled weight decay (norm-drift "
                             "mitigation; 0 = reference Adam)")
    parser.add_argument("--seeds", type=int, default=0,
                        help="Train N seeds (base --seed, --seed+1, ...) "
                             "in lockstep as ONE vmapped scanned program "
                             "(kitti_solver.EnsembleSolver). The KITTI "
                             "path is latency-bound at ~11%% of the "
                             "matmul ceiling, so N seeds cost ~1x the "
                             "wall of one; each lane writes the same "
                             "per-seed artifacts (log.csv, checkpoints, "
                             "auto-eval) a serial run would. The "
                             "reference loops seeds serially "
                             "(main_kitti.py:251-261). 0/1 = off.")
    parser.add_argument("--natural-discrete", action="store_true", default=False,
                        help="discretize natural sprites")
    parser.add_argument("--verbose", action="store_true", default=False,
                        help="for evaluation")
    parser.add_argument("--cuda", action="store_true", default=False)
    parser.add_argument("--num_runs", default=10, type=int,
                        help="when searching over seeds, do 10")
    parser.add_argument("--dset-dir", default="./data/kitti/", type=str,
                        help="dataset directory")
    return parser


def randint(low, high):
    return int(np.random.randint(low, high, 1)[0])


def uniform(low, high):
    return float(np.random.uniform(low, high, 1)[0])


def run_ensemble_experiment(args, dataset):
    """--seeds N: one lockstep vmapped train over N seeds, then the
    standard per-seed auto-eval. Per-seed dir layout is identical to N
    serial run_experiment calls ({experiment_dir}/{seed})."""
    from .kitti_solver import EnsembleSolver

    t0 = time.time()
    if not args.experiment_dir:
        if "kitti" in args.dataset:
            dataset_param = args.kitti_max_delta_t
        elif "natural" in args.dataset:
            dataset_param = args.natural_discrete
        else:
            dataset_param = args.data_distribution
        args.experiment_dir = os.path.join(
            f"{args.dataset}_{dataset_param}", f"{args.p}_{args.box_norm}"
        )
    seeds = [args.seed + i for i in range(args.seeds)]
    out_dirs, ckpt_dirs = [], []
    for s in seeds:
        od = os.path.join(args.output_dir, args.experiment_dir, str(s))
        cd = os.path.join(args.ckpt_dir, args.experiment_dir, str(s))
        os.makedirs(od, exist_ok=True)
        os.makedirs(cd, exist_ok=True)
        with open(os.path.join(od, "args"), "w") as fh:
            json.dump({**args.__dict__, "seed": s}, fh)
        out_dirs.append(od)
        ckpt_dirs.append(cd)
    print(f"Ensemble over seeds: {seeds}")

    solver = EnsembleSolver(args, dataset, seeds, out_dirs, ckpt_dirs)
    from ..utils.profiling import trace_context

    with trace_context(args.profile_dir):
        solver.train()

    # per-lane auto-eval through the unchanged single-seed harness
    import copy

    for s, od, cd in zip(seeds, out_dirs, ckpt_dirs):
        a = copy.copy(args)
        a.seed, a.output_dir, a.ckpt_dir, a.evaluate = s, od, cd, True
        eval_dataset, _, _ = return_data(a)  # no augmentation for eval
        eval_dis(a, eval_dataset)
    print("done in %.2fs" % (time.time() - t0))


def run_experiment(args, dataset, batch_pairs):
    """One train(+eval) run (main_kitti.py:23-83)."""
    t0 = time.time()
    if not args.experiment_dir:
        if "kitti" in args.dataset:
            dataset_param = args.kitti_max_delta_t
        elif "natural" in args.dataset:
            dataset_param = args.natural_discrete
        else:
            dataset_param = args.data_distribution
        args.experiment_dir = os.path.join(
            f"{args.dataset}_{dataset_param}", f"{args.p}_{args.box_norm}"
        )
    output_root = args.output_dir
    ckpt_root = args.ckpt_dir
    args.output_dir = os.path.join(args.output_dir, args.experiment_dir)
    os.makedirs(args.output_dir, exist_ok=True)
    existing = os.listdir(args.output_dir)
    if args.random_search or args.random_seeds:
        while str(args.seed) in existing:
            args.seed = randint(1000000, 9999999)
    args.output_dir = os.path.join(args.output_dir, str(args.seed))
    os.makedirs(args.output_dir, exist_ok=True)
    args.ckpt_dir = os.path.join(args.ckpt_dir, args.experiment_dir, str(args.seed))
    os.makedirs(args.ckpt_dir, exist_ok=True)
    if args.use_writer:
        from ..train import MetricsLogger

        log_dir = os.path.join(args.log_dir, args.experiment_dir, str(args.seed))
        writer = MetricsLogger(log_dir=log_dir, use_tensorboard=True)
        writer.log_args(vars(args))
    with open(os.path.join(args.output_dir, "args"), "w") as fh:
        json.dump(args.__dict__, fh)
    np.random.seed(args.seed)

    if args.evaluate:
        eval_dis(args, dataset)
    else:
        mesh = None
        if getattr(args, "mesh", 0) and args.mesh > 1:
            from ..parallel import make_mesh

            mesh = make_mesh(args.mesh)
        net = Solver(args, dataset, mesh=mesh)
        from ..utils.profiling import trace_context

        with trace_context(args.profile_dir):
            failure = net.train()
        if failure:
            print("failed in %.2fs" % (time.time() - t0))
            shutil.rmtree(args.output_dir)
        else:
            args.evaluate = True
            eval_dataset, _, _ = return_data(args)  # no augmentation for eval
            eval_dis(args, eval_dataset)
            print("done in %.2fs" % (time.time() - t0))

    # restore roots for outer search loops
    args.output_dir = output_root
    args.ckpt_dir = ckpt_root
    args.experiment_dir = ""
    args.evaluate = False
    return args


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)

    assert not (args.random_search and args.betavae and not args.search_beta)
    assert not ((args.random_search or args.random_seeds) and args.evaluate)
    if args.evaluate and args.mesh and args.mesh > 1:
        raise SystemExit(
            "--mesh covers only training; --evaluate runs the host-side "
            "metric harness single-device — drop --mesh"
        )

    if args.seeds and args.seeds > 1:
        if args.random_search or args.random_seeds:
            raise SystemExit(
                "--seeds (lockstep vmapped ensemble) and --random-search/"
                "--random-seeds (serial relaunch loops) are mutually "
                "exclusive — pick one seed-multiplexing mechanism"
            )
        if args.evaluate:
            raise SystemExit(
                "--seeds covers training (+auto-eval); to re-evaluate "
                "existing lanes run --evaluate per seed"
            )
        if args.mesh and args.mesh > 1:
            raise SystemExit(
                "--seeds and --mesh both claim the leading device axis; "
                "run the ensemble single-device (it exists because the "
                "path is latency-bound, not compute-bound)"
            )
    dataset, batch_pairs, num_channel = return_data(args)
    args.num_channel = num_channel

    if args.seeds and args.seeds > 1:
        run_ensemble_experiment(args, dataset)
        return

    if args.random_search:
        while True:
            args.seed = randint(1000000, 9999999)
            args.beta = uniform(1, 16) if args.search_beta else 1
            args.gamma = uniform(1, 16) if not args.betavae else 0
            args.rate_prior = uniform(1, 10) if not args.betavae else 1
            args = run_experiment(args, dataset, batch_pairs)
    elif args.random_seeds:
        for _ in range(args.num_runs):
            args.seed = randint(1000000, 9999999)
            args = run_experiment(args, dataset, batch_pairs)
    else:
        run_experiment(args, dataset, batch_pairs)


if __name__ == "__main__":
    main()
