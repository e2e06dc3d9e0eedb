"""MLP-mixing identifiability experiment (TPU-native).

Reference parity: /root/reference/main_mlp.py — same flags (README.md:
13-58), same experiment flow: choose space/marginal/conditional, build a
frozen invertible mixing g, train encoder f on h = f∘g with LpSimCLR /
SimCLR InfoNCE, evaluate linear R² + permutation MCC every n_log_steps
on 4096 fresh marginal samples, then a final num-eval-batches mean/std.

TPU design difference: sampling + mixing + encoder + loss + Adam all
compile into ONE jitted step (the reference crosses host<->device every
step at main_mlp.py:260-261,328 and detours through CPU numpy for vMF at
spaces.py:246-255).

Usage: python -m cl_ica_tpu.cli.main_mlp [flags]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..evaluation import linear_disentanglement, permutation_disentanglement
from . import fused_arg
from ..losses import LpSimCLRLoss, SimCLRLoss
from ..models import construct_invertible_mlp, get_mlp
from ..spaces import LatentSpace, NBoxSpace, NRealSpace, NSphereSpace
from ..train import (
    CheckpointManager,
    MetricsLogger,
    TrainState,
    Throughput,
    make_scanned_synthetic_train_steps,
)
from ..utils import trace_context


def parse_args(argv=None):
    # flag inventory mirrors main_mlp.py:21-127
    parser = argparse.ArgumentParser(
        description="Disentanglement with InfoNCE/Contrastive Learning - MLP Mixing"
    )
    parser.add_argument("--sphere-r", type=float, default=1.0)
    parser.add_argument("--box-min", type=float, default=0.0,
                        help="For box normalization only. Minimal value of box.")
    parser.add_argument("--box-max", type=float, default=1.0,
                        help="For box normalization only. Maximal value of box.")
    parser.add_argument("--sphere-norm", action="store_true",
                        help="Normalize output to a sphere.")
    parser.add_argument("--box-norm", action="store_true",
                        help="Normalize output to a box.")
    parser.add_argument("--only-supervised", action="store_true",
                        help="Only train supervised model.")
    parser.add_argument("--only-unsupervised", action="store_true",
                        help="Only train unsupervised model.")
    parser.add_argument("--more-unsupervised", type=int, default=3,
                        help="How many more steps to do for unsupervised compared "
                             "to supervised training.")
    parser.add_argument("--save-dir", type=str, default="")
    parser.add_argument("--rej-mult", type=int, default=1,
                        help="Memory/CPU trade-off factor for rejection "
                             "resampling (buffer_size_factor: candidates "
                             "drawn per rejection iteration = rej-mult x "
                             "batch). Wired here; the reference documents "
                             "the flag (README.md:44) but drops it.")
    parser.add_argument("--num-eval-batches", type=int, default=10,
                        help="Number of batches to average evaluation performance "
                             "at the end.")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--act-fct", type=str, default="leaky_relu",
                        help="Activation function in mixing network g.")
    parser.add_argument("--c-param", type=float, default=0.05,
                        help="Concentration parameter of the conditional distribution.")
    parser.add_argument("--m-param", type=float, default=1.0,
                        help="Additional parameter for the marginal (only relevant if "
                             "it is not uniform).")
    parser.add_argument("--tau", type=float, default=1.0)
    parser.add_argument("--n-mixing-layer", type=int, default=3,
                        help="Number of layers in nonlinear mixing network g.")
    parser.add_argument("--n", type=int, default=10,
                        help="Dimensionality of the latents.")
    parser.add_argument("--space-type", type=str, default="box",
                        choices=("box", "sphere", "unbounded"))
    parser.add_argument("--m-p", type=int, default=0,
                        help="Type of ground-truth marginal distribution. p=0 means "
                             "uniform; all other p values correspond to (projected) "
                             "Lp Exponential")
    parser.add_argument("--c-p", type=int, default=2,
                        help="Exponent of ground-truth Lp Exponential distribution.")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr-cosine", action="store_true",
                        help="cosine-decay the lr over the phase "
                             "(norm-drift mitigation; default = reference "
                             "constant-lr Adam)")
    parser.add_argument("--weight-decay", type=float, default=0.0,
                        help="AdamW decoupled weight decay (norm-drift "
                             "mitigation; 0 = reference Adam)")
    parser.add_argument("--p", type=int, default=2,
                        help="Exponent of the assumed model Lp Exponential "
                             "distribution.")
    parser.add_argument("--fused-loss", action="store_true",
                        help="Force the InfoNCE loss through the Pallas "
                             "streaming-logsumexp kernel "
                             "(ops/infonce_pallas) instead of the "
                             "materialized B×B XLA path. Default: auto "
                             "— every p>=1 already routes through the "
                             "kernel on TPU (p=2 measured 1.30x e2e at "
                             "batch 6144 and required for B ≳ 32k "
                             "where B²·4 bytes blows HBM); p=0 SimCLR "
                             "stays on the materialized MXU path.")
    parser.add_argument("--no-fused-loss", action="store_true",
                        help="Force the materialized B×B XLA loss path, "
                             "overriding the TPU auto-route (A/B "
                             "debugging / kernel-suspect escape hatch).")
    parser.add_argument("--batch-size", type=int, default=6144)
    parser.add_argument("--n-log-steps", type=int, default=250)
    parser.add_argument("--n-steps", type=int, default=100001)
    parser.add_argument("--resume-training", action="store_true")
    parser.add_argument("--save-every", type=int, default=0,
                        help="Every N steps, write a full-fidelity "
                             "resume checkpoint (params + opt state + "
                             "step + train/eval RNG keys + loss/score "
                             "history) into --save-dir. 0 = off. The "
                             "reference saves weights only at phase end "
                             "(main_mlp.py:373-381).")
    parser.add_argument("--resume", action="store_true",
                        help="Restore the latest --save-every checkpoint "
                             "from --save-dir and continue; the resumed "
                             "trajectory (losses, eval milestones) is "
                             "step-identical to the uninterrupted run "
                             "(tests/test_resume.py).")
    # TPU-native additions (not in the reference flag set):
    parser.add_argument("--seeds", type=int, default=0,
                        help="Train N independent seeds (base --seed, "
                             "base+1, ...) in lockstep via one vmapped "
                             "step — params, optimizer states, RNG "
                             "streams and the per-seed frozen mixings "
                             "all carry a leading seed axis. The MLP "
                             "path is latency-bound (13%% of the matmul "
                             "ceiling), so S seeds cost ~1x the wall of "
                             "one. The reference runs seeds serially "
                             "(main_mlp.py:132-135). 0/1 = single run.")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute in the encoder Linear "
                             "stack (2x MXU issue rate; params, the "
                             "constraint head, mixing and loss stay "
                             "fp32). Measured quality-neutral at the "
                             "headline configs (EXPERIMENTS).")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of the training "
                             "loop into this directory (TensorBoard/XProf).")
    parser.add_argument("--mesh", type=int, default=0,
                        help="Train data-parallel over an N-device mesh: "
                             "per-chip latent sampling, row-sharded "
                             "similarity matrix, global negatives via one "
                             "ICI all-gather (parallel.sharded). The "
                             "batch size is the GLOBAL batch.")
    parser.add_argument("--mesh-model", type=int, default=0,
                        help="With --mesh N: carve an M-way tensor-"
                             "parallel axis out of the mesh; encoder "
                             "kernels column-sharded (megatron-style) "
                             "via parallel.sharded. 0/1 = pure DP.")
    args = parser.parse_args(argv)
    if args.seeds and args.seeds > 1:
        if args.mesh and args.mesh > 1:
            raise SystemExit(
                "--seeds (vmapped ensemble) and --mesh (sharded step) "
                "are not composable yet; run the ensemble single-chip"
            )
        if args.resume_training:
            raise SystemExit("--resume-training is per-run; not "
                             "supported with --seeds")
        if (args.resume or args.save_every) and not (
            args.only_unsupervised or args.only_supervised
        ):
            raise SystemExit(
                "--resume/--save-every with --seeds checkpoints one "
                "training phase; pass --only-unsupervised or "
                "--only-supervised (the multi-phase sup->unsup flow "
                "is not resumable for the ensemble yet)")
    if (args.resume or args.save_every) and not args.save_dir:
        raise SystemExit("--resume/--save-every need --save-dir (the "
                         "checkpoint lives there)")
    if args.mesh_model and args.mesh_model > 1:
        if not (args.mesh and args.mesh > 1):
            raise SystemExit("--mesh-model requires --mesh N")
        if args.mesh % args.mesh_model:
            raise SystemExit(
                f"--mesh {args.mesh} must be divisible by "
                f"--mesh-model {args.mesh_model} (2-D data x model mesh)"
            )
    n_data_axis = (
        args.mesh // args.mesh_model
        if args.mesh_model and args.mesh_model > 1 else args.mesh
    )
    if args.mesh and args.mesh > 1 and args.batch_size % n_data_axis:
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by "
            f"the mesh's data axis ({n_data_axis}; row-sharded batches)"
        )

    print("Arguments:")
    for k, v in vars(args).items():
        print(f"\t{k}: {v}")
    return args


def build_latent_space(args) -> LatentSpace:
    """Space + marginal + conditional selection (main_mlp.py:136-194)."""
    if args.space_type == "box":
        space = NBoxSpace(args.n, args.box_min, args.box_max,
                          rej_mult=getattr(args, "rej_mult", 1))
    elif args.space_type == "sphere":
        space = NSphereSpace(args.n, args.sphere_r)
    else:
        space = NRealSpace(args.n)

    eta = np.zeros(args.n, dtype=np.float32)
    if args.space_type == "sphere":
        eta[0] = 1.0
    eta = jnp.asarray(eta)

    if args.m_p:
        if args.m_p == 1:
            sample_marginal = lambda sp, k, size: sp.laplace(k, eta, args.m_param, size)
        elif args.m_p == 2:
            sample_marginal = lambda sp, k, size: sp.normal(k, eta, args.m_param, size)
        else:
            sample_marginal = lambda sp, k, size: sp.generalized_normal(
                k, eta, args.m_param, args.m_p, size
            )
    else:
        sample_marginal = lambda sp, k, size: sp.uniform(k, size)

    if args.c_p:
        if args.c_p == 1:
            sample_conditional = lambda sp, k, z, size: sp.laplace(
                k, z, args.c_param, size
            )
        elif args.c_p == 2:
            sample_conditional = lambda sp, k, z, size: sp.normal(
                k, z, args.c_param, size
            )
        else:
            sample_conditional = lambda sp, k, z, size: sp.generalized_normal(
                k, z, args.c_param, args.c_p, size
            )
    else:
        sample_conditional = lambda sp, k, z, size: sp.von_mises_fisher(
            k, z, args.c_param, size
        )

    return LatentSpace(space, sample_marginal, sample_conditional)


def _resume_tree(state, root_key, phase, step, losses, lin_scores, perm_scores):
    """The full-state resume pytree: meta + history ride INSIDE the one
    atomic Orbax artifact (no sidecar to desynchronize from)."""
    return {
        "state": state,
        "root_key": root_key,
        "phase": np.asarray(phase, np.int64),
        "step": np.asarray(step, np.int64),
        "losses": np.asarray(losses, np.float64),
        "linear_scores": np.asarray(lin_scores, np.float64),
        "perm_scores": np.asarray(perm_scores, np.float64),
    }


_marginal_jit_cache = {}


def _jit_marginal(latent_space):
    """Cached jitted marginal sampler (eager rejection/vMF while_loops
    dispatch op-by-op — pathological on remote-dispatch backends)."""
    fn = _marginal_jit_cache.get(id(latent_space))
    if fn is None:
        fn = jax.jit(
            lambda k, n: latent_space.sample_marginal(k, n), static_argnums=(1,)
        )
        _marginal_jit_cache[id(latent_space)] = fn
    return fn


def evaluate_scores(latent_space, h_fn, key, n_samples=4096):
    """Eval on fresh marginal samples (main_mlp.py:334-356)."""
    z = _jit_marginal(latent_space)(key, n_samples)
    hz = np.asarray(h_fn(z))
    z = np.asarray(z)
    (lin, _), _ = linear_disentanglement(z, hz, mode="r2")
    (perm, _), _ = permutation_disentanglement(
        z, hz, mode="pearson", solver="munkres", rescaling=True
    )
    return lin, perm


def run_ensemble(args):
    """Train args.seeds independent seeds in one vmapped program.

    Per-seed flow mirrors main() exactly — same RNG split order (root
    key per seed, k_init / k_train / per-eval splits), same per-seed
    frozen mixing g built from numpy default_rng(seed), same phase
    structure — so lane i reproduces a serial run with --seed base+i
    (verified in tests/test_ensemble.py). Returns per-seed final
    (linear, perm) score lists ordered like the seed list."""
    from ..models import stack_mixings
    from ..train import make_ensemble_synthetic_train_steps

    S = args.seeds
    logger = MetricsLogger(log_dir=args.save_dir or None, print_to_stdout=False)
    if args.save_dir:
        logger.log_args(vars(args))
    base = args.seed if args.seed is not None else int(time.time()) % 2**31
    seed_list = [base + i for i in range(S)]
    print(f"Ensemble over seeds: {seed_list}")

    # full-fidelity ensemble resume (--save-every/--resume with --seeds):
    # one crash-consistent artifact holding the stacked TrainState, the
    # per-seed RNG keys, and the (steps, S) loss history. Single-phase
    # only (guarded in parse_args) — the claim-matrix protocol's shape.
    resume_dir = (os.path.join(args.save_dir, "resume_ens")
                  if args.save_dir and (args.resume or args.save_every)
                  else None)
    resume_found = None
    if args.resume and resume_dir:
        from ..train.checkpoint import load_resume_meta

        resume_found = load_resume_meta(resume_dir)
        if resume_found is None:
            print("--resume: no ensemble checkpoint found; starting "
                  "fresh", flush=True)

    latent_space = build_latent_space(args)
    fused = fused_arg(args)
    if args.p:
        loss = LpSimCLRLoss(p=args.p, tau=args.tau,
                            simclr_compatibility_mode=True, use_fused=fused)
    else:
        loss = SimCLRLoss(normalize=False, tau=args.tau,
                          use_fused=fused)

    gs = [
        construct_invertible_mlp(
            n=args.n,
            n_layers=args.n_mixing_layer,
            act_fct=args.act_fct,
            cond_thresh_ratio=0.0,
            n_iter_cond_thresh=25000,
            rng=np.random.default_rng(s),
        )
        for s in seed_list
    ]
    weights_stack, mixing_apply = stack_mixings(gs)
    root_keys = [jax.random.PRNGKey(s) for s in seed_list]

    def next_key(i):
        root_keys[i], sub = jax.random.split(root_keys[i])
        return sub

    # identity-solution sanity per seed: one compiled forward shared by
    # all lanes (weights are an argument, not a constant)
    g_fwd = jax.jit(mixing_apply)
    if resume_found is None:
        for i, s in enumerate(seed_list):
            lin0, perm0 = evaluate_scores(
                latent_space,
                lambda z: g_fwd(jax.tree.map(lambda a: a[i], weights_stack), z),
                jax.random.PRNGKey(s + 1),
            )
            print(f"[seed {s}] Id. Lin. Disentanglement: {lin0:.4f}\t"
                  f"Id. Perm. Disentanglement: {perm0:.4f}")
    else:
        print("(resuming: identity-solution sanity evals skipped — "
              "they are deterministic in the seed and already logged)")

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        for i, s in enumerate(seed_list):
            np.savez(os.path.join(args.save_dir, f"g_s{s}.npz"),
                     *[np.asarray(w) for w in gs[i].weights])

    if args.only_unsupervised:
        test_list = [False]
    elif args.only_supervised:
        test_list = [True]
    else:
        test_list = [True, False]

    if args.box_norm:
        output_normalization = "learnable_box"
    elif args.sphere_norm:
        output_normalization = "learnable_sphere"
    elif args.p == 0:
        output_normalization = "fixed_sphere"
    else:
        output_normalization = None

    marginal_jit = _jit_marginal(latent_space)
    final_scores = None

    for test in test_list:
        print(f"supervised test: {test}")
        f = get_mlp(
            n_in=args.n,
            n_out=args.n,
            layers=[args.n * 10, args.n * 50, args.n * 50,
                    args.n * 50, args.n * 50, args.n * 10],
            output_normalization=output_normalization,
            dtype=jnp.bfloat16 if args.bf16 else None,
        )
        k_inits = jnp.stack([next_key(i) for i in range(S)])
        params_stack = jax.vmap(lambda k: f.init(k, jnp.zeros((2, args.n))))(
            k_inits
        )
        phase_steps = args.n_steps * (args.more_unsupervised if not test else 1)
        lr = (
            optax.cosine_decay_schedule(args.lr, max(phase_steps, 1))
            if args.lr_cosine else args.lr
        )
        optimizer = (
            optax.adamw(lr, weight_decay=args.weight_decay)
            if args.weight_decay > 0 else optax.adam(lr)
        )
        k_trains = jnp.stack([next_key(i) for i in range(S)])
        states = jax.vmap(
            lambda p, k: TrainState.create(p, optimizer.init(p), k)
        )(params_stack, k_trains)

        make_steps = lambda n_inner: make_ensemble_synthetic_train_steps(
            latent_space.sample_pair,
            weights_stack,
            mixing_apply,
            lambda p, x: f.apply(p, x),
            loss,
            optimizer,
            args.batch_size,
            n_inner=n_inner,
            supervised=test,
        )
        step_1 = make_steps(1)
        step_chunk = make_steps(args.n_log_steps)
        # eval forward shared by all lanes: h_i(z) = f(params_i, g_i(z))
        eval_fwd = jax.jit(lambda p, w, z: f.apply(p, mixing_apply(w, z)))

        losses = []  # list of (S,) per-step losses
        last_saved = 0
        if resume_found is not None:
            from ..train.checkpoint import restore_pytree

            artifact, raw = resume_found
            target = {
                "state": states,
                "root_keys": jnp.stack(root_keys),
                "step": np.asarray(0, np.int64),
                "losses": np.zeros_like(np.asarray(raw["losses"])),
            }
            restored = restore_pytree(artifact, target)
            states = restored["state"]
            rk = restored["root_keys"]
            for i in range(S):
                root_keys[i] = rk[i]
            losses = [row for row in np.asarray(restored["losses"])]
            last_saved = len(losses)
            print(f"Resuming ensemble at step {len(losses)}", flush=True)

        def save_resume(force=False):
            nonlocal last_saved
            if not (resume_dir and args.save_every):
                return
            if not force and len(losses) - last_saved < args.save_every:
                return
            from ..train.checkpoint import save_resume_state

            save_resume_state(resume_dir, len(losses), {
                "state": states,
                "root_keys": jnp.stack(root_keys),
                "step": np.asarray(len(losses), np.int64),
                "losses": (np.stack(losses) if losses
                           else np.zeros((0, S), np.float32)),
            })
            last_saved = len(losses)

        throughput = Throughput()

        def run_chunk(fn, n):
            nonlocal states
            states, metrics = fn(states)
            m = np.asarray(metrics["loss"]).reshape(-1, S)
            losses.extend(list(m))
            throughput.update(args.batch_size * n * S)

        def do_eval():
            lins, perms = [], []
            for i in range(S):
                z = marginal_jit(next_key(i), 4096)
                hz = np.asarray(eval_fwd(
                    jax.tree.map(lambda a: a[i], states.params),
                    jax.tree.map(lambda a: a[i], weights_stack),
                    z,
                ))
                zn = np.asarray(z)
                (lin, _), _ = linear_disentanglement(zn, hz, mode="r2")
                (perm, _), _ = permutation_disentanglement(
                    zn, hz, mode="pearson", solver="munkres", rescaling=True
                )
                lins.append(lin)
                perms.append(perm)
            step = len(losses)
            last = losses[-1]
            mean_last = np.mean(np.stack(losses[-args.n_log_steps:]), axis=0)
            pps = throughput.pairs_per_sec
            print(
                f"Step: {step} \t",
                f"<Loss>: {np.mean(mean_last):.4f} \t",
                f"Lin. Disentanglement: {np.mean(lins):.4f} ± {np.std(lins):.4f} \t",
                f"Perm. Disentanglement: {np.mean(perms):.4f} ± {np.std(perms):.4f} \t",
                "per-seed MCC: [" + " ".join(f"{p:.4f}" for p in perms) + "]"
                + (f" \t pairs/s: {pps:.0f}" if pps else ""),
                flush=True,
            )
            for i, s in enumerate(seed_list):
                logger.log(
                    step,
                    {
                        "seed": s,
                        "loss": float(last[i]),
                        "mean_loss": float(mean_last[i]),
                        "linear_disentanglement": lins[i],
                        "perm_disentanglement": perms[i],
                        "pairs_per_sec": pps or 0.0,
                        "supervised": float(test),
                    },
                )
            return lins, perms

        n_steps = args.n_steps if test else args.n_steps * args.more_unsupervised
        phase_done_on_restore = len(losses) >= n_steps
        with trace_context(args.profile_dir):
            if not losses:
                run_chunk(step_1, 1)
                do_eval()
            while len(losses) + args.n_log_steps <= n_steps:
                run_chunk(step_chunk, args.n_log_steps)
                do_eval()
                save_resume()
            while len(losses) < n_steps:
                run_chunk(step_1, 1)
        if len(losses) % args.n_log_steps != 1 and not phase_done_on_restore:
            do_eval()
        save_resume(force=True)

        if args.save_dir:
            import pickle

            tag = "sup" if test else "unsup"
            for i, s in enumerate(seed_list):
                with open(os.path.join(args.save_dir, f"{tag}_f_s{s}.pkl"),
                          "wb") as fh:
                    pickle.dump(
                        jax.tree.map(lambda a: np.asarray(a[i]), states.params),
                        fh,
                    )
            # one Orbax artifact holding the whole stacked ensemble state
            # (step is vmapped to shape (S,): pass the shared scalar)
            mgr = CheckpointManager(os.path.join(args.save_dir, f"ckpt_{tag}"))
            mgr.save(states, step=int(np.asarray(states.step)[0]))
            mgr.close()

        final_params = states.params
        final_eval_fwd = eval_fwd

    # final per-seed mean/std over num_eval_batches (main_mlp.py:383-416)
    sample_pair_jit = jax.jit(
        lambda k: latent_space.sample_pair(k, args.batch_size)
    )
    final_linear = [[] for _ in range(S)]
    final_perm = [[] for _ in range(S)]
    for _ in range(args.num_eval_batches):
        for i in range(S):
            z1, _ = sample_pair_jit(next_key(i))
            z1_rec = np.asarray(final_eval_fwd(
                jax.tree.map(lambda a: a[i], final_params),
                jax.tree.map(lambda a: a[i], weights_stack),
                z1,
            ))
            z1 = np.asarray(z1)
            (lin, _), _ = linear_disentanglement(z1, z1_rec, mode="r2")
            (perm, _), _ = permutation_disentanglement(
                z1, z1_rec, mode="pearson", solver="munkres", rescaling=True
            )
            final_linear[i].append(lin)
            final_perm[i].append(perm)
    per_seed_lin = [float(np.mean(v)) for v in final_linear]
    per_seed_perm = [float(np.mean(v)) for v in final_perm]
    for i, s in enumerate(seed_list):
        print(f"[seed {s}] linear mean: {per_seed_lin[i]} "
              f"std: {np.std(final_linear[i])}")
        print(f"[seed {s}] perm mean: {per_seed_perm[i]} "
              f"std: {np.std(final_perm[i])}")
    print(f"linear mean: {np.mean(per_seed_lin)} std: {np.std(per_seed_lin)}")
    print(f"perm mean: {np.mean(per_seed_perm)} std: {np.std(per_seed_perm)}")
    logger.close()
    return per_seed_lin, per_seed_perm


def main(argv=None):
    args = parse_args(argv)
    if args.seeds and args.seeds > 1:
        return run_ensemble(args)
    # full-fidelity resume (--save-every/--resume): ONE crash-consistent
    # Orbax artifact per checkpoint {TrainState, eval root_key, phase,
    # step, loss/score history} behind an atomically-replaced LATEST
    # pointer (train.checkpoint.save_resume_state) — the resumed
    # trajectory is step-identical to the uninterrupted run because both
    # RNG streams restore to their exact save-point values.
    resume_dir = os.path.join(args.save_dir, "resume") if args.save_dir else None
    resume_info = None
    resume_artifact = None
    if args.resume:
        from ..train.checkpoint import load_resume_meta

        found = load_resume_meta(resume_dir) if resume_dir else None
        if found:
            resume_artifact, _meta = found
            resume_info = {
                "phase": int(_meta["phase"]),
                "step": int(_meta["step"]),
                "losses": [float(x) for x in _meta["losses"]],
                "linear_scores": [float(x) for x in _meta["linear_scores"]],
                "perm_scores": [float(x) for x in _meta["perm_scores"]],
                "root_key": np.asarray(_meta["root_key"]),
            }
            print(f"Resuming: phase {resume_info['phase']} "
                  f"step {resume_info['step']}", flush=True)
            n_phases = 1 if (args.only_supervised or args.only_unsupervised) else 2
            if resume_info["phase"] >= n_phases and resume_info["step"] == 0:
                raise SystemExit(
                    "--resume: checkpoint marks all training phases "
                    "complete; nothing to resume (the final artifacts "
                    "are already in --save-dir)"
                )
        else:
            print("--resume: no checkpoint found; starting fresh", flush=True)
    # structured metrics (stdout prints keep the reference's format; the
    # CSV/args.json artifacts land in --save-dir when given)
    logger = MetricsLogger(log_dir=args.save_dir or None, print_to_stdout=False)
    if args.save_dir:
        logger.log_args(vars(args))
    seed = args.seed if args.seed is not None else int(time.time()) % 2**31
    np_rng = np.random.default_rng(seed)
    root_key = jax.random.PRNGKey(seed)

    latent_space = build_latent_space(args)

    fused = fused_arg(args)
    if args.p:
        loss = LpSimCLRLoss(p=args.p, tau=args.tau,
                            simclr_compatibility_mode=True, use_fused=fused)
    else:
        loss = SimCLRLoss(normalize=False, tau=args.tau,
                          use_fused=fused)

    g = construct_invertible_mlp(
        n=args.n,
        n_layers=args.n_mixing_layer,
        act_fct=args.act_fct,
        cond_thresh_ratio=0.0,
        n_iter_cond_thresh=25000,
        rng=np_rng,
    )
    g_jit = jax.jit(g)

    # identity-solution sanity scores (main_mlp.py:216-232)
    key_eval = jax.random.PRNGKey(seed + 1)
    lin0, perm0 = evaluate_scores(latent_space, g_jit, key_eval)
    print(f"Id. Lin. Disentanglement: {lin0:.4f}")
    print(f"Id. Perm. Disentanglement: {perm0:.4f}")

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        np.savez(
            os.path.join(args.save_dir, "g.npz"),
            *[np.asarray(w) for w in g.weights],
        )

    if args.only_unsupervised:
        test_list = [False]
    elif args.only_supervised:
        test_list = [True]
    else:
        test_list = [True, False]

    # output head selection (main_mlp.py:287-296)
    if args.box_norm:
        output_normalization = "learnable_box"
    elif args.sphere_norm:
        output_normalization = "learnable_sphere"
    elif args.p == 0:
        output_normalization = "fixed_sphere"
    else:
        output_normalization = None

    total_loss_values = []
    linear_scores = []
    perm_scores = []

    for phase_idx, test in enumerate(test_list):
        if resume_info is not None and phase_idx < resume_info["phase"]:
            print(f"supervised test: {test} — completed before resume; "
                  "skipping", flush=True)
            continue
        resuming_here = (
            resume_info is not None and phase_idx == resume_info["phase"]
        )
        if resuming_here and resume_info["step"] == 0:
            # phase-boundary checkpoint: only the eval RNG stream (and,
            # under --resume-training, the carried histories) survives —
            # the phase re-inits f/optimizer from it, exactly as the
            # uninterrupted run did after its save
            root_key = jnp.asarray(resume_info["root_key"])
            total_loss_values = list(resume_info["losses"])
            linear_scores = list(resume_info["linear_scores"])
            perm_scores = list(resume_info["perm_scores"])
            resume_info = None
            resuming_here = False
        print(f"supervised test: {test}")
        f = get_mlp(
            n_in=args.n,
            n_out=args.n,
            layers=[args.n * 10, args.n * 50, args.n * 50,
                    args.n * 50, args.n * 50, args.n * 10],
            output_normalization=output_normalization,
            dtype=jnp.bfloat16 if args.bf16 else None,
        )
        root_key, k_init = jax.random.split(root_key)
        params = f.init(k_init, jnp.zeros((2, args.n)))
        # reference: constant-lr Adam (main_mlp.py). Opt-in mitigations
        # for the unconstrained-head norm runaway (EXPERIMENTS r1/r3).
        phase_steps = args.n_steps * (
            args.more_unsupervised if not test else 1
        )
        lr = (
            optax.cosine_decay_schedule(args.lr, max(phase_steps, 1))
            if args.lr_cosine else args.lr
        )
        optimizer = (
            optax.adamw(lr, weight_decay=args.weight_decay)
            if args.weight_decay > 0 else optax.adam(lr)
        )

        # per-step dispatch would dominate this experiment's wall time on
        # TPU (the fused step is ~100 µs of compute); scan n_log_steps
        # training steps per device call — same math, one dispatch per
        # eval window (the reference evaluates at step ≡ 1 mod n_log).
        if args.mesh and args.mesh > 1:
            # multi-chip: same scanned contract, but sampling/encoder/
            # similarity rows are sharded over the mesh with global
            # negatives (one ICI all-gather per step)
            from ..parallel import make_dp_tp_mesh, make_sharded_synthetic_train_step

            mesh, _ = make_dp_tp_mesh(args.mesh, args.mesh_model)
            tp_kwargs = {}
            if "model" in mesh.shape:
                # shapes only — eval_shape avoids allocating a throwaway
                # optimizer state just to derive the sharding pytree
                tp_kwargs = dict(
                    model_axis="model",
                    example_state=jax.eval_shape(
                        lambda p: TrainState.create(
                            p, optimizer.init(p), jax.random.PRNGKey(0)
                        ),
                        params,
                    ),
                )
            make_steps = lambda n_inner: make_sharded_synthetic_train_step(
                mesh,
                latent_space.sample_pair,
                g,
                lambda p, x: f.apply(p, x),
                loss,
                optimizer,
                args.batch_size,
                n_inner=n_inner,
                supervised=test,
                **tp_kwargs,
            )
        else:
            make_steps = lambda n_inner: make_scanned_synthetic_train_steps(
                latent_space.sample_pair,
                g,
                lambda p, x: f.apply(p, x),
                loss,
                optimizer,
                args.batch_size,
                n_inner=n_inner,
                supervised=test,
            )
        step_1 = make_steps(1)
        step_chunk = make_steps(args.n_log_steps)
        root_key, k_train = jax.random.split(root_key)
        state = TrainState.create(params, optimizer.init(params), k_train)
        h_jit = jax.jit(lambda p, z: f.apply(p, g(z)))

        if not args.resume_training:
            total_loss_values = []
            linear_scores = []
            perm_scores = []

        if resuming_here:
            # mid-phase checkpoint: restore the full TrainState (params
            # + Adam moments + step + train key) and the eval key; the
            # fresh k_init/k_train splits above are discarded, exactly
            # mirroring the uninterrupted run's key consumption.
            from ..train.checkpoint import restore_pytree

            loaded = restore_pytree(
                resume_artifact,
                _resume_tree(state, root_key, 0, 0,
                             resume_info["losses"],
                             resume_info["linear_scores"],
                             resume_info["perm_scores"]),
            )
            state = loaded["state"]
            root_key = loaded["root_key"]
            total_loss_values = list(resume_info["losses"])
            linear_scores = list(resume_info["linear_scores"])
            perm_scores = list(resume_info["perm_scores"])
            resume_info = None

        last_saved = [len(total_loss_values) // args.save_every
                      if args.save_every else 0]

        def save_resume(phase, step):
            from ..train.checkpoint import save_resume_state

            save_resume_state(
                resume_dir,
                phase * (10 ** 9) + step,
                _resume_tree(state, root_key, phase, step,
                             total_loss_values, linear_scores, perm_scores),
            )

        n_steps = args.n_steps if test else args.n_steps * args.more_unsupervised
        throughput = Throughput()

        def run_chunk(fn, n):
            nonlocal state
            state, metrics = fn(state)
            # scanned steps return (n_inner,) losses; a single sharded
            # step returns a scalar — atleast_1d covers both contracts
            total_loss_values.extend(
                np.atleast_1d(np.asarray(metrics["loss"])).tolist()
            )
            throughput.update(args.batch_size * n)

        def do_eval():
            nonlocal root_key
            root_key, k_eval = jax.random.split(root_key)
            lin, perm = evaluate_scores(
                latent_space, lambda z: h_jit(state.params, z), k_eval
            )
            linear_scores.append(lin)
            perm_scores.append(perm)
            pps = throughput.pairs_per_sec
            print(
                f"Step: {len(total_loss_values)} \t",
                f"Loss: {total_loss_values[-1]:.4f} \t",
                f"<Loss>: {np.mean(total_loss_values[-args.n_log_steps:]):.4f} \t",
                f"Lin. Disentanglement: {lin:.4f} \t",
                f"Perm. Disentanglement: {perm:.4f}"
                + (f" \t pairs/s: {pps:.0f}" if pps else ""),
                flush=True,
            )
            logger.log(
                len(total_loss_values),
                {
                    "loss": total_loss_values[-1],
                    "mean_loss": float(
                        np.mean(total_loss_values[-args.n_log_steps:])
                    ),
                    "linear_disentanglement": lin,
                    "perm_disentanglement": perm,
                    "pairs_per_sec": pps or 0.0,
                    "supervised": float(test),
                },
            )

        # step 1 + eval, then full n_log_steps chunks with eval after each
        with trace_context(args.profile_dir):
            if not total_loss_values:  # fresh phase (not a mid-phase resume)
                run_chunk(step_1, 1)
                do_eval()
            while len(total_loss_values) + args.n_log_steps <= n_steps:
                run_chunk(step_chunk, args.n_log_steps)
                do_eval()
                if (args.save_every and
                        len(total_loss_values) // args.save_every
                        > last_saved[0]):
                    last_saved[0] = (
                        len(total_loss_values) // args.save_every
                    )
                    save_resume(phase_idx, len(total_loss_values))
            while len(total_loss_values) < n_steps:
                run_chunk(step_1, 1)
        if len(total_loss_values) % args.n_log_steps != 1:
            do_eval()
        if args.save_every:
            # phase-boundary checkpoint: next phase restarts fresh from
            # the carried eval RNG stream
            save_resume(phase_idx + 1, 0)  # final eval at n_steps (reference: global_step == n_steps)

        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
            import pickle

            tag = "sup" if test else "unsup"
            with open(os.path.join(args.save_dir, f"{tag}_f.pkl"), "wb") as fh:
                pickle.dump(jax.tree.map(np.asarray, state.params), fh)
            # Orbax TrainState checkpoint (params + opt state + step + RNG
            # key) alongside the reference-shaped pickle (SURVEY.md §5)
            mgr = CheckpointManager(os.path.join(args.save_dir, f"ckpt_{tag}"))
            mgr.save(state)
            mgr.close()

        # keep final-phase h for the closing eval
        final_params = state.params

    # final mean/std over num_eval_batches (main_mlp.py:383-416)
    final_linear, final_perm = [], []
    h_final = jax.jit(lambda z: f.apply(final_params, g(z)))
    # jit the sampler: eager rejection/vMF while_loops dispatch op-by-op
    # (pathological on remote-dispatch backends)
    sample_pair_jit = jax.jit(
        lambda k: latent_space.sample_pair(k, args.batch_size)
    )
    for i in range(args.num_eval_batches):
        root_key, k1 = jax.random.split(root_key)
        z1, _ = sample_pair_jit(k1)
        z1_rec = np.asarray(h_final(z1))
        z1 = np.asarray(z1)
        (lin, _), _ = linear_disentanglement(z1, z1_rec, mode="r2")
        (perm, _), _ = permutation_disentanglement(
            z1, z1_rec, mode="pearson", solver="munkres", rescaling=True
        )
        final_linear.append(lin)
        final_perm.append(perm)
    print(f"linear mean: {np.mean(final_linear)} std: {np.std(final_linear)}")
    print(f"perm mean: {np.mean(final_perm)} std: {np.std(final_perm)}")
    logger.close()
    return float(np.mean(final_linear)), float(np.mean(final_perm))


if __name__ == "__main__":
    main()
