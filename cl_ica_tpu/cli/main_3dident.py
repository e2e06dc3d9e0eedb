"""3DIdent image-scale identifiability experiment (TPU-native).

Reference parity: /root/reference/main_3dident.py — same flag inventory
(README.md:59-147) and experiment flow: mixed-topology latent space
(Box³ position × Sphere⁸ rotation/color with vMF conditional, or all-Box
non-periodic), ResNet encoder with constraint heads, split InfoNCE
(LpSimCLR on non-angular dims + SimCLR on angular dims), NN-matched
rendered pairs, periodic eval (linear R² with train/test split, MCC,
per-dim MSE, linear-fit MSE).

TPU redesign: batched on-device NN matching + packed-image gathers
replace per-sample FAISS/PNG DataLoader workers (data.threedident); the
train step (encoder fwd/bwd + loss + Adam/SGD) is one jitted program;
torch DataParallel is unnecessary — run under a jax mesh for multi-chip
(parallel/).

Usage: python -m cl_ica_tpu.cli.main_3dident --offline-dataset DIR [flags]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import (
    SequentialThreeDIdent,
    ThreeDIdentBatchSampler,
    normalize_3dident,
)
from ..evaluation import linear_disentanglement, permutation_disentanglement
from . import fused_arg
from ..losses import LpSimCLRLoss, R2Loss, SimCLRLoss
from ..models import construct_invertible_mlp, get_mlp
from ..models.layers import RescaleLayer, SoftclipLayer
from ..models.resnet import ResNet18, ResNet50, ResNet101, ResNet152
from ..spaces import LatentSpace, NBoxSpace, NSphereSpace, ProductLatentSpace
from ..train import MetricsLogger, Throughput
from ..train.checkpoint import restore_pytree, save_pytree
from ..utils import checkify_wrap, nan_check, trace_context

import flax.linen as nn


def parse_args(argv=None):
    # flag inventory mirrors main_3dident.py:27-107
    parser = argparse.ArgumentParser(
        description="Disentanglement with InfoNCE/Contrastive Learning - 3DIdent"
    )
    parser.add_argument("--batch-size", default=512, type=int)
    parser.add_argument("--n-eval-samples", default=4096, type=int)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--optimizer", default="adam", choices=("adam", "sgd"))
    parser.add_argument("--iterations", default=30000, type=int,
                        help="How long to train the model")
    parser.add_argument("--n-log-steps", default=100, type=int,
                        help="How often to calculate scores and print them")
    parser.add_argument("--load-model", default=None, type=str,
                        help="Path from where to load the model")
    parser.add_argument("--save-model", default=None, type=str,
                        help="Path where to save the model")
    parser.add_argument("--save-every", default=None, type=int,
                        help="After how many steps to save the model (will always "
                             "be saved at the end)")
    parser.add_argument("--resume", action="store_true",
                        help="Restore the full train state (params + "
                             "batch stats + opt state + step + RNG keys "
                             "+ loss history) saved by --save-every at "
                             "<save-model>.train_state and continue. On "
                             "the device-store and mesh paths the "
                             "resumed trajectory is step-identical to "
                             "the uninterrupted run; on the host-"
                             "prefetch pipeline batches are IID so the "
                             "continuation is statistically (not "
                             "bitwise) identical. The reference saves "
                             "weights only (main_3dident.py:561-566).")
    parser.add_argument("--no-cuda", action="store_true")  # accepted, no-op on TPU
    parser.add_argument("--position-only", action="store_true")
    parser.add_argument("--rotation-and-color-only", action="store_true")
    parser.add_argument("--rotation-only", action="store_true")
    parser.add_argument("--color-only", action="store_true")
    parser.add_argument("--no-spotlight-position", action="store_true")
    parser.add_argument("--no-spotlight-color", action="store_true")
    parser.add_argument("--no-spotlight", action="store_true")
    parser.add_argument("--non-periodic-rotation-and-color", action="store_true")
    parser.add_argument("--dummy-mixing", action="store_true")
    parser.add_argument("--identity-solution", action="store_true")
    parser.add_argument("--identity-mixing-and-solution", action="store_true")
    # accepted, no-op: the reference's approximate FAISS index (IVF/HNSW)
    # trades recall for CPU speed; the on-device exact top-k already
    # searches the full 250k table in ~4 ms/batch (EXPERIMENTS r3)
    parser.add_argument("--approximate-dataset-nn-search", action="store_true")
    parser.add_argument("--offline-dataset", type=str, required=True)
    parser.add_argument("--faiss-omp-threads", type=int, default=16)  # accepted; NN runs on device
    parser.add_argument("--box-constraint", type=str, default=None,
                        choices=(None, "fix", "learnable"))
    parser.add_argument("--sphere-constraint", type=str, default=None,
                        choices=(None, "fix", "learnable"))
    parser.add_argument("--workers", default=0, type=int,
                        help="Number of workers to use (0=#cpus)")
    parser.add_argument("--mode", default="supervised",
                        choices=("supervised", "unsupervised", "test"))
    parser.add_argument("--supervised-loss", default="mse", type=str,
                        choices=("mse", "r2"))
    parser.add_argument("--unsupervised-loss", default="l2", type=str,
                        choices=("l1", "l2", "l3", "vmf"))
    parser.add_argument("--non-periodical-conditional", default="l2",
                        choices=("l1", "l2", "l3"))
    parser.add_argument("--sigma", default=0.1, type=float,
                        help="Sigma of the conditional distribution (for vMF: 1/kappa)")
    parser.add_argument("--encoder", default="rn18",
                        choices=("rn18", "rn50", "rn101", "rn151"))
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--fused-loss", action="store_true",
                        help="Force the streaming Pallas InfoNCE kernel "
                             "for the contrastive loss (default: auto — "
                             "fused on TPU)")
    parser.add_argument("--no-fused-loss", action="store_true",
                        help="Force the materialized XLA loss path "
                             "(escape hatch for the fused kernel)")
    parser.add_argument("--fused-stem", action="store_true",
                        help="Fused Pallas BN+ReLU+maxpool stem + "
                             "FastBatchNorm (exact same math, less HBM "
                             "traffic; checkpoints interchange)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute in the encoder backbone "
                             "(MXU throughput; params stay fp32)")
    parser.add_argument("--norm-kind", default="minres",
                        choices=("minres", "minres8", "fast", "batch"),
                        help="Encoder BatchNorm flavor. 'minres' "
                             "(default, torch-parity math) since r3; "
                             "'minres8' additionally stores the BN "
                             "backward residuals in float8 (the "
                             "sub-bf16 probe, measured byte-neutral "
                             "on v5e — ops/bn_minres8.py); pass 'batch' "
                             "to load checkpoints saved under the "
                             "pre-r3 flax nn.BatchNorm naming")
    parser.add_argument("--scan", action="store_true",
                        help="Fuse unsupervised training steps into "
                             "lax.scan segments between log/save "
                             "boundaries: ONE device dispatch per "
                             "segment instead of two dispatches plus a "
                             "blocking loss fetch per step. The 64^2 "
                             "device-store run is dispatch-bound at "
                             "that per-step round-trip (chip ~90%% "
                             "idle, EXPERIMENTS r3). Same math and the "
                             "same RNG key sequence as the per-step "
                             "loop. Device-store and --dummy-mixing "
                             "batch paths only.")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of the training "
                             "loop into this directory (TensorBoard/XProf).")
    parser.add_argument("--log-dir", type=str, default=None,
                        help="Write structured metrics (log.csv + args.json) "
                             "into this directory.")
    parser.add_argument("--mesh", type=int, default=0,
                        help="Train data-parallel over an N-device mesh: "
                             "image store row-sharded across chips (fits "
                             "datasets beyond one chip's HBM), encoder "
                             "row-sharded, InfoNCE negatives global. "
                             "0/1 = single device.")
    parser.add_argument("--mesh-model", type=int, default=0,
                        help="With --mesh N: carve an M-way tensor-"
                             "parallel axis out of the mesh (2-D "
                             "(N/M)x(M) data x model layout). Encoder "
                             "conv/dense kernels are channel-sharded "
                             "over it (parallel.sharded.tp_param_rule; "
                             "BN statistics stay exact). The image "
                             "store is sharded over the data axis only, "
                             "so per-chip store memory grows by M. "
                             "0/1 = pure data parallelism.")
    parser.add_argument("--lr-cosine", action="store_true",
                        help="cosine-decay the learning rate to 0 over "
                             "--iterations (late-run norm-drift "
                             "mitigation; default = reference constant lr)")
    parser.add_argument("--weight-decay", default=0.0, type=float,
                        help="AdamW decoupled weight decay (norm-drift "
                             "mitigation; 0 = reference Adam)")
    args = parser.parse_args(argv)

    if args.no_spotlight:
        args.no_spotlight_color = True
        args.no_spotlight_position = True

    print(args)

    assert args.save_every is None or args.save_every > 0
    assert not (args.save_model is None and args.save_every is not None), \
        "--save-every requires --save-model to be set"
    if args.resume and args.save_model is None:
        raise SystemExit("--resume needs --save-model (the train state "
                         "lives at <save-model>.train_state)")
    assert not (args.position_only and args.rotation_and_color_only), \
        "Only one of these flags can be set."
    assert not (
        args.position_only
        and (args.non_periodic_rotation_and_color or args.no_spotlight_color
             or args.no_spotlight_position)
    )
    assert not (args.box_constraint is not None and args.sphere_constraint is not None)
    if args.mesh_model and args.mesh_model > 1:
        if not (args.mesh and args.mesh > 1):
            raise SystemExit("--mesh-model requires --mesh N")
        if args.mesh % args.mesh_model:
            raise SystemExit(
                f"--mesh {args.mesh} must be divisible by "
                f"--mesh-model {args.mesh_model} (2-D data x model mesh)"
            )
    if args.scan:
        # loud guards, not silent degradation (r3 convention): every
        # combination --scan cannot fuse exits with the reason
        if args.mode != "unsupervised":
            raise SystemExit("--scan fuses unsupervised train steps; "
                             "use it with --mode unsupervised")
        if args.identity_mixing_and_solution:
            raise SystemExit("--scan: --identity-mixing-and-solution "
                             "is interactive per step (scale prompt); "
                             "drop one of the two flags")
        if args.mesh:
            raise SystemExit("--scan: the --mesh path has its own "
                             "sharded per-step program; scanned mesh "
                             "segments are not implemented — drop one")
        from ..utils import debug_enabled

        if debug_enabled():  # same "=1" test checkify_wrap keys off
            raise SystemExit("--scan: checkify NaN guards functionalize "
                             "per-step jits, not scan bodies; unset "
                             "CL_ICA_TPU_DEBUG or drop --scan")
    if args.fused_stem and args.norm_kind == "batch":
        raise SystemExit(
            "--fused-stem forces the FastBatchNorm module naming, so it "
            "cannot load the pre-r3 nn.BatchNorm checkpoints that "
            "--norm-kind batch exists for; drop one of the two flags"
        )
    if args.fused_stem and args.norm_kind == "minres8":
        raise SystemExit(
            "--fused-stem forces norm-kind 'fast' throughout the "
            "backbone, which would silently ignore the requested "
            "float8 residuals; drop one of the two flags"
        )
    if args.save_model is not None:
        assert os.path.exists(os.path.dirname(args.save_model) or "."), \
            f"Directory to save model does not exist"
    return args


def setup_latent_space(args, n_objects=1):
    """Mixed-topology latent space (main_3dident.py:142-285)."""
    n_color_rot = (
        n_objects * (4 + (0 if args.no_spotlight_color else 1)
                     + (0 if args.no_spotlight_position else 1)) + 1
    )
    n_pos = n_objects * 3
    sigma = args.sigma

    cond_p = {"l1": 1, "l2": 2, "l3": 3}[args.non_periodical_conditional]

    def non_periodic_cond(sp, k, z, size):
        if cond_p == 1:
            return sp.laplace(k, z, sigma, size)
        if cond_p == 2:
            return sp.normal(k, z, sigma, size)
        return sp.generalized_normal(k, z, sigma, 3, size)

    uniform = lambda sp, k, size: sp.uniform(k, size)

    position_space = LatentSpace(NBoxSpace(n_pos), uniform, non_periodic_cond)

    if args.non_periodic_rotation_and_color:
        rc_dim = n_objects * (4 + (0 if args.no_spotlight_color else 1)
                              + (0 if args.no_spotlight_position else 1) + 1)
        rotation_and_color_space = LatentSpace(
            NBoxSpace(rc_dim), uniform, non_periodic_cond
        )
        rotation_space = LatentSpace(
            NBoxSpace(n_objects * 3 + (0 if args.no_spotlight_position else 1)),
            uniform, non_periodic_cond,
        )
        color_space = LatentSpace(
            NBoxSpace(n_objects * (1 + (0 if args.no_spotlight_color else 1)) + 1),
            uniform, non_periodic_cond,
        )
    else:
        vmf_cond = lambda sp, k, z, size: sp.von_mises_fisher(k, z, 1.0 / sigma, size)
        rotation_and_color_space = LatentSpace(
            NSphereSpace(n_color_rot + 1), uniform, vmf_cond
        )
        rotation_space = LatentSpace(NSphereSpace(n_objects * 3 + 1), uniform, vmf_cond)
        color_space = LatentSpace(NSphereSpace(n_objects * 3 + 2), uniform, vmf_cond)

    if args.non_periodic_rotation_and_color:
        if args.rotation_and_color_only:
            return rotation_and_color_space, rotation_and_color_space.dim, 0
        if args.position_only:
            raise ValueError()
        if args.rotation_only:
            return rotation_space, rotation_space.dim, 0
        if args.color_only:
            return color_space, color_space.dim, 0
        ls = ProductLatentSpace([position_space, rotation_and_color_space])
        return ls, rotation_and_color_space.dim + position_space.dim, 0
    else:
        if args.position_only:
            return position_space, position_space.dim, 0
        if args.rotation_and_color_only:
            return rotation_and_color_space, 0, rotation_and_color_space.dim
        if args.rotation_only:
            return rotation_space, 0, rotation_space.dim
        if args.color_only:
            return color_space, 0, color_space.dim
        ls = ProductLatentSpace([position_space, rotation_and_color_space])
        return ls, position_space.dim, rotation_and_color_space.dim


class ThreeDIdentEncoder(nn.Module):
    """ResNet backbone → LeakyReLU → Dense(n_latents) → constraint head
    (main_3dident.py:288-371)."""

    n_latents: int
    n_non_angular: int
    encoder: str = "rn18"
    box_constraint: str = None
    sphere_constraint: str = None
    non_periodic: bool = False
    position_only: bool = False
    subset_only: bool = False  # rotation/color/rotation-and-color only
    dummy_mixing: bool = False
    identity_solution: bool = False
    dtype: object = jnp.float32
    # fused Pallas stem + FastBatchNorm (ops/stem_pallas.py): same math,
    # less HBM traffic; checkpoints interchange with the default stem
    fused_stem: bool = False
    # BN flavor. 'minres' (default): torch-parity BN math + minimal-
    # residual custom VJP. 'batch' (flax nn.BatchNorm) was the default
    # through round 2 — its checkpoints use different flax module names
    # (BatchNorm_i vs MinResBN_i), so pass --norm-kind batch to load
    # pre-r3 saves. 'fast' = FastBatchNorm (what fused_stem uses).
    norm_kind: str = "minres"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.n_latents
        if self.identity_solution:
            # f = Flatten (main_3dident.py:296-298)
            return x.reshape((x.shape[0], -1))
        if self.dummy_mixing:
            h = get_mlp(n, n, [n * 10, n * 50, n * 50, n * 50, n * 50, n * 10])(x)
        else:
            backbone = {
                "rn18": ResNet18, "rn50": ResNet50,
                "rn101": ResNet101, "rn151": ResNet152,
            }[self.encoder]
            # 'minres' = torch-parity BN math (unbiased running var,
            # fast variance) + minimal-residual custom VJP; byte-equal
            # or better vs flax nn.BatchNorm (EXPERIMENTS r3 ledger)
            h = backbone(
                num_classes=n * 10,
                dtype=self.dtype,
                norm_kind="fast" if self.fused_stem else self.norm_kind,
                fused_stem_pool=self.fused_stem,
            )(x, train=train)
            h = nn.leaky_relu(h)
            h = nn.Dense(n)(h)

        def non_periodic_head(y, width):
            if self.box_constraint is not None:
                return SoftclipLayer(
                    n=width, fixed_abs_bound=self.box_constraint == "fix"
                )(y)
            if self.sphere_constraint is not None:
                return RescaleLayer(fixed_r=self.sphere_constraint == "fix")(y)
            return y

        periodic_head = lambda y: RescaleLayer(fixed_r=False, mode="eq")(y)

        if self.position_only:
            return non_periodic_head(h, self.n_non_angular)
        if self.subset_only:
            return non_periodic_head(h, n) if self.non_periodic else periodic_head(h)
        if self.non_periodic:
            return non_periodic_head(h, self.n_non_angular)
        na = self.n_non_angular
        return jnp.concatenate(
            [non_periodic_head(h[:, :na], na), periodic_head(h[:, na:])], axis=1
        )


def build_split_loss(args, n_non_angular, use_fused=None, wrap=None):
    """Split InfoNCE: Lp on non-angular + SimCLR on angular dims
    (main_3dident.py:402-449).

    use_fused: None = auto (Pallas kernel on TPU), True/False forced —
    the --fused-loss/--no-fused-loss escape hatch. wrap: applied to each
    component loss object (the --mesh path passes
    parallel.collective.gspmd_safe_loss so GSPMD never meets a
    pallas_call; the wrapped per-shard composition keeps the kernel)."""
    spherical = SimCLRLoss(normalize=False, tau=1.0, use_fused=use_fused)
    if args.unsupervised_loss == "vmf":
        nonspherical = SimCLRLoss(normalize=True, tau=1.0, use_fused=use_fused)
    else:
        p = {"l1": 1, "l2": 2, "l3": 3}[args.unsupervised_loss]
        nonspherical = LpSimCLRLoss(p=p, tau=1.0, simclr_compatibility_mode=True,
                                    pow=True, use_fused=use_fused)
    if wrap is not None:
        spherical = wrap(spherical)
        nonspherical = wrap(nonspherical)

    def split(z1r, z2r, z3r):
        na = n_non_angular
        nsl = nonspherical(None, None, None, z1r[:, :na], z2r[:, :na], z3r[:, :na])
        sl = spherical(None, None, None, z1r[:, na:], z2r[:, na:], z3r[:, na:])
        return sl[0] + nsl[0], sl[1] + nsl[1], [sl[0], nsl[0]]

    if args.position_only or args.non_periodic_rotation_and_color:
        return lambda z1r, z2r, z3r: nonspherical(None, None, None, z1r, z2r, z3r)
    if args.rotation_and_color_only or args.rotation_only or args.color_only:
        return lambda z1r, z2r, z3r: spherical(None, None, None, z1r, z2r, z3r)
    return split


def latent_dims_to_use(args):
    """Dataset latent-dim filtering tables (main_3dident.py:798-832)."""
    if args.non_periodic_rotation_and_color:
        if args.rotation_and_color_only:
            dims = [3, 4, 5, 6, 7, 8, 9]
        elif args.rotation_only:
            dims = [3, 4, 5, 6]
        elif args.color_only:
            dims = [7, 8, 9]
        elif args.position_only:
            raise ValueError("Not supported")
        else:
            dims = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
        if args.no_spotlight_position:
            dims = [d for d in dims if d != 6]
        if args.no_spotlight_color:
            dims = [d for d in dims if d != 8]
        return dims
    if args.position_only:
        return [0, 1, 2]
    if args.rotation_and_color_only:
        return [3, 4, 5, 6, 7, 8, 9, 10]
    if args.no_spotlight_position or args.no_spotlight_color:
        raise NotImplementedError(
            "This is only supported for non-periodic variables at the moment."
        )
    return None


def main(argv=None):
    args = parse_args(argv)
    assert os.path.exists(args.offline_dataset)
    print("Using dataset:", args.offline_dataset)
    logger = MetricsLogger(log_dir=args.log_dir, print_to_stdout=False)
    if args.log_dir:
        logger.log_args(vars(args))

    latent_space, n_non_ang, n_ang = setup_latent_space(args)
    n_latents = n_non_ang + n_ang
    print(f"#Latents: {n_latents} , #Non-periodic latents: {n_non_ang} , "
          f"#Periodic latents: {n_ang}")

    root_key = jax.random.PRNGKey(args.seed)
    np_rng = np.random.default_rng(args.seed)

    subset_only = (args.rotation_and_color_only or args.rotation_only
                   or args.color_only)
    model = ThreeDIdentEncoder(
        n_latents=n_latents,
        n_non_angular=n_non_ang,
        encoder=args.encoder,
        box_constraint=args.box_constraint,
        sphere_constraint=args.sphere_constraint,
        non_periodic=args.non_periodic_rotation_and_color,
        position_only=args.position_only,
        subset_only=subset_only,
        dummy_mixing=args.dummy_mixing,
        identity_solution=args.identity_solution,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        fused_stem=args.fused_stem,
        norm_kind=args.norm_kind,
    )

    g = None
    g_jit = None
    if args.dummy_mixing:
        g = construct_invertible_mlp(
            n_latents, n_layers=3, act_fct="leaky_relu",
            cond_thresh_ratio=0.0, n_iter_cond_thresh=25000, rng=np_rng,
        )
        g_jit = jax.jit(g)  # eager per-step mixing would cost 3 dispatches

    dims = latent_dims_to_use(args)
    print("Using latent dimensions:", dims)
    load_images = not (args.dummy_mixing or args.identity_mixing_and_solution)

    # --mesh covers all three modes (r4; the reference's DataParallel(f)
    # wraps the encoder for supervised/test too, main_3dident.py:373,
    # 569-653): unsupervised/supervised get sharded train steps, test
    # gets sharded batch encodes over the row-sharded store.
    use_mesh = bool(args.mesh and args.mesh > 1)
    if use_mesh and not load_images:
        raise SystemExit(
            "--mesh is incompatible with --dummy-mixing/"
            "--identity-mixing-and-solution: there is no image store to "
            "shard, so the run would silently stay single-device"
        )
    if args.mode in ("supervised", "unsupervised"):
        sampler = ThreeDIdentBatchSampler(
            args.offline_dataset, latent_space, args.batch_size,
            latent_dimensions_to_use=dims, load_images=load_images,
            # mesh path shards the store itself; skip the single-device copy
            device_images=False if use_mesh else None,
        )
    else:
        sampler = SequentialThreeDIdent(
            args.offline_dataset, latent_dimensions_to_use=dims,
            load_images=load_images,
        )

    # ---- model init / load ----
    example_x = (
        jnp.zeros((1, n_latents)) if args.dummy_mixing
        else jnp.zeros((1, 224, 224, 3))
    )
    root_key, k_init = jax.random.split(root_key)
    variables = jax.jit(model.init, static_argnames=("train",))(
        k_init, example_x, train=False
    )
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", None)

    if args.load_model is not None:
        if os.path.isdir(args.load_model):  # Orbax artifact (save_pytree)
            loaded = restore_pytree(
                args.load_model,
                {"params": params, "batch_stats": batch_stats},
            )
        else:
            with open(args.load_model, "rb") as fh:
                loaded = pickle.load(fh)
        params = jax.tree.map(jnp.asarray, loaded["params"])
        batch_stats = (
            jax.tree.map(jnp.asarray, loaded["batch_stats"])
            if loaded.get("batch_stats") is not None else None
        )
        print("Model loaded:", args.load_model)

    def save_model(path):
        with open(path, "wb") as fh:
            pickle.dump(
                {
                    "params": jax.tree.map(np.asarray, params),
                    "batch_stats": (
                        jax.tree.map(np.asarray, batch_stats)
                        if batch_stats is not None else None
                    ),
                },
                fh,
            )
        # Orbax artifact alongside the reference-shaped pickle (SURVEY.md
        # §5: one shared checkpoint layer); --load-model accepts either
        save_pytree(
            path + ".orbax",
            {
                "params": params,
                "batch_stats": batch_stats,
            },
        )
        print("Model saved as", path)

    # reference: constant-lr Adam/SGD (main_3dident.py:451-454).
    # --lr-cosine / --weight-decay are opt-in norm-drift mitigations
    # (EXPERIMENTS r3); defaults reproduce the reference exactly.
    lr = args.lr
    if args.lr_cosine:
        lr = optax.cosine_decay_schedule(args.lr, max(args.iterations, 1))
    if args.optimizer == "adam":
        optimizer = (
            optax.adamw(lr, weight_decay=args.weight_decay)
            if args.weight_decay > 0 else optax.adam(lr)
        )
    else:
        if args.weight_decay > 0:
            # decoupled decay for SGD too, rather than silently ignoring
            # the requested mitigation
            optimizer = optax.chain(
                optax.add_decayed_weights(args.weight_decay),
                optax.sgd(lr),
            )
        else:
            optimizer = optax.sgd(lr)
    opt_state = optimizer.init(params)

    # ---- jitted apply / steps ----

    def apply_model(params, batch_stats, x, train):
        vs = {"params": params}
        if batch_stats is not None:
            vs["batch_stats"] = batch_stats
            if train:
                out, mut = model.apply(vs, x, train=True, mutable=["batch_stats"])
                return out, mut["batch_stats"]
            return model.apply(vs, x, train=False), batch_stats
        return model.apply(vs, x, train=train), None

    # test mode iterates the sequential split as a shuffled WITHOUT-
    # replacement sweep: one epoch permutation, consumed in batch-size
    # slices, reshuffled when exhausted — the semantics of the
    # reference's DataLoader(shuffle=True) over SequentialThreeDIdent
    # (main_3dident.py:852-858). Per-batch choice() could revisit
    # samples across batches and miss others.
    test_perm = {"order": None, "pos": 0}

    def _next_test_indices(bs):
        if (test_perm["order"] is None
                or test_perm["pos"] + bs > len(test_perm["order"])):
            test_perm["order"] = np_rng.permutation(len(sampler))
            test_perm["pos"] = 0
        out = test_perm["order"][test_perm["pos"]:test_perm["pos"] + bs]
        test_perm["pos"] += bs
        return out

    def make_batch(key):
        """Device-side batch: latents (+ images via host gather)."""
        if args.mode == "test":
            idx = _next_test_indices(args.batch_size)
            z, x = sampler.batch(idx)
            return jnp.asarray(z), (None if x is None else
                                    normalize_3dident(jnp.asarray(x))), None, None
        idx_z, idx_zt, z, zt = sampler.sample_latent_batch(key)
        if load_images:
            if getattr(sampler, "device_store", None) is not None:
                # store fits HBM: gather on device (the supervised-mode
                # hot path; the unsupervised loop uses the fully fused
                # _sample_with_images instead)
                x = normalize_3dident(
                    jnp.take(sampler.device_store, idx_z, axis=0)
                )
                xt = normalize_3dident(
                    jnp.take(sampler.device_store, idx_zt, axis=0)
                )
            else:
                x = normalize_3dident(jnp.asarray(
                    sampler.images.gather(np.asarray(idx_z))))
                xt = normalize_3dident(jnp.asarray(
                    sampler.images.gather(np.asarray(idx_zt))))
        elif args.dummy_mixing:
            x, xt = g_jit(z), g_jit(zt)
        else:  # identity mixing
            x, xt = z, zt
        return z, x, zt, xt

    fused = fused_arg(args)
    split_loss = build_split_loss(args, n_non_ang, use_fused=fused)

    if args.supervised_loss == "r2":
        sup_loss = R2Loss(reduction="mean", mode="negative_r2")
    else:
        sup_loss = lambda pred, target: jnp.mean((pred - target) ** 2)

    identity_scale = 1.0

    def _unsup_body(params, opt_state, batch_stats, x1, x2):
        b = x1.shape[0]

        def objective(p):
            # both views in one 2B forward (MXU utilization, see bench.py)
            z, bs = apply_model(p, batch_stats, jnp.concatenate([x1, x2], 0), True)
            z1r, z2r = z[:b], z[b:]
            z3r = jnp.roll(z1r, 1, axis=0)
            total, per_item, comps = split_loss(z1r, z2r, z3r)
            total = nan_check(total, "unsupervised loss")
            return total, (per_item, bs)

        (total, (per_item, bs)), grads = jax.value_and_grad(
            objective, has_aux=True
        )(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, bs, total, per_item

    unsup_step = checkify_wrap(jax.jit(_unsup_body))

    def make_scanned_unsup(n_inner):
        """--scan: n_inner fused steps in one device program.

        lax.scan over (sample pair -> NN match -> store gather ->
        normalize -> fwd/bwd -> Adam), carrying (params, opt_state,
        batch_stats, key) and emitting per-step (loss, sigma(loss)).
        The key is split per step exactly like the eager loop, so the
        batch sequence is identical. The image store rides as a jit
        ARGUMENT (scan-invariant), never a baked-in constant — the
        remote-compile gotcha at data/threedident.py:264-266.
        """
        from ..train.trainer import MAX_SCAN_LEN, make_chunked_steps

        use_store = getattr(sampler, "device_store", None) is not None
        if not use_store and g_jit is None:
            # Host-prefetch image path (packed store larger than the
            # device_image_budget, data/threedident.py:259): the scan
            # body cannot call back into the host pipeline, and falling
            # through would feed raw latents to the conv encoder. Keep
            # the failure loud like every other unsupported --scan combo.
            raise SystemExit(
                "--scan: the image store exceeds the on-device budget so "
                "batches come from the host prefetch pipeline, which a "
                "fused lax.scan body cannot drive. Drop --scan (eager "
                "loop supports host prefetch), use --mesh to shard the "
                "store across chips, or raise the device image budget."
            )

        def jit_scan(length):
            def run(carry, store):
                def one_step(c, _):
                    p, o, bs_, key = c
                    key, k = jax.random.split(key)
                    if use_store:
                        idx_z, idx_zt, _, _ = sampler.sample_latent_batch(k)
                        x1 = normalize_3dident(store[idx_z])
                        x2 = normalize_3dident(store[idx_zt])
                    else:
                        _, _, z, zt = sampler.sample_latent_batch(k)
                        if g_jit is not None:  # --dummy-mixing MLP
                            x1, x2 = g_jit(z), g_jit(zt)
                        else:  # identity mixing
                            x1, x2 = z, zt
                    p, o, bs_, total, per_item = _unsup_body(p, o, bs_, x1, x2)
                    return (p, o, bs_, key), (total, jnp.std(per_item))

                return jax.lax.scan(one_step, carry, None, length)

            jitted = jax.jit(run, donate_argnums=(0,))
            if use_store:
                return lambda carry: jitted(carry, sampler.device_store)
            return lambda carry: jitted(carry, jnp.zeros((), jnp.float32))

        return make_chunked_steps(jit_scan, n_inner, MAX_SCAN_LEN)

    @checkify_wrap
    @jax.jit
    def sup_step(params, opt_state, batch_stats, x1, z1):
        def objective(p):
            hz1, bs = apply_model(p, batch_stats, x1, True)
            return nan_check(sup_loss(hz1, z1), "supervised loss"), bs

        (total, bs), grads = jax.value_and_grad(objective, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, bs, total

    encode = jax.jit(lambda p, bs, x: apply_model(p, bs, x, False)[0])

    # set by the mesh block below: sharded eval encode over the
    # mesh-sharded store (no host memmap gather — VERDICT r2 weak #4)
    mesh_eval = None

    def evaluate(eval_perm=True, no_pairs=False):
        """Accumulate n_eval_samples; linear R² (train/test split), MCC,
        per-dim MSE, linear-fit MSE (main_3dident.py:656-748).

        eval_perm=False skips the Hungarian MCC (reference test():
        evaluate(..., not args.identity_solution, ...)); no_pairs marks
        the sequential (z, x) test path, where make_batch returns no
        conditional partner."""
        del no_pairs  # make_batch's test branch is already pair-free
        zs, hzs = [], []
        nonlocal root_key
        for _ in range(args.n_eval_samples // args.batch_size):
            root_key, k = jax.random.split(root_key)
            if mesh_eval is not None:
                z, hz = mesh_eval(params, batch_stats, k, sharded_store)
            elif mesh_test_encode is not None:
                idx = _next_test_indices(args.batch_size)
                z = sampler.latents[idx]
                hz = mesh_test_encode(
                    params, batch_stats,
                    jnp.asarray(idx, jnp.int32), sharded_store,
                )
            else:
                z, x, _, _ = make_batch(k)
                if args.identity_mixing_and_solution:
                    hz = z
                else:
                    hz = encode(params, batch_stats, x)
            zs.append(np.asarray(z))
            hzs.append(np.asarray(hz))
        if not zs:
            return np.inf, np.inf, np.inf, np.inf
        z = np.concatenate(zs)
        hz = np.concatenate(hzs)
        # norm-drift telemetry (EXPERIMENTS r3): mean ||hz||
        evaluate.last_znorm = float(np.linalg.norm(hz, axis=1).mean())
        (lin, _), (z_test, hz_lin) = linear_disentanglement(
            z, hz, mode="r2", train_test_split=True
        )
        if eval_perm:
            (mcc, _), _ = permutation_disentanglement(
                z, hz, mode="pearson", solver="munkres", rescaling=True
            )
        else:
            mcc = np.inf
        mse = ((z - hz) ** 2).mean(0) if not args.identity_solution else np.inf
        lin_mse = ((z_test - hz_lin) ** 2).mean(0)
        return mcc, lin, mse, lin_mse

    # ---- multi-chip path: mesh-sharded store + sharded train step ----
    mesh_step = None
    mesh_sup_step = None
    mesh_test_encode = None
    if use_mesh and load_images and (
        sampler.images is None or sampler.images._packed is None
    ):
        # refuse to silently degrade to the single-device host path
        raise SystemExit(
            "--mesh needs the packed uint8 image store "
            "(images_packed_*.u8), which is built automatically from an "
            f"images/ directory — neither found under "
            f"{args.offline_dataset!r}, so the sharded store cannot be "
            "constructed (and silently falling back to the single-"
            "device host path would defeat --mesh)."
        )
    if use_mesh and load_images and sampler.images is not None \
            and sampler.images._packed is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import (
            make_dp_tp_mesh,
            make_sharded_3dident_sup_step,
            make_sharded_3dident_train_step,
            pad_rows_to_multiple,
        )

        mesh, n_data = make_dp_tp_mesh(args.mesh, args.mesh_model)
        mesh_model = mesh.shape.get("model", 0)
        if args.batch_size % n_data:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by "
                f"the mesh's data axis ({n_data}; row-sharded batches)"
            )
        padded, _ = pad_rows_to_multiple(sampler.images._packed, n_data)
        sharded_store = jax.device_put(
            padded, NamedSharding(mesh, P("data"))
        )
        tp_kwargs = {}
        if mesh_model:
            tp_kwargs = dict(
                model_axis="model",
                example_params=params,
                example_opt_state=opt_state,
                example_batch_stats=batch_stats,
            )
        if args.mode == "unsupervised":
            # rebuild the split loss with GSPMD-safe components: each
            # fused-eligible piece becomes a per-shard shard_map
            # composition (kernel stays manual-sharded), the rest is
            # pinned materialized — GSPMD never meets a pallas_call
            from functools import partial as _partial

            from ..parallel.collective import gspmd_safe_loss

            mesh_split_loss = build_split_loss(
                args, n_non_ang, use_fused=fused,
                wrap=_partial(gspmd_safe_loss, mesh),
            )
            mesh_step = make_sharded_3dident_train_step(
                mesh, sampler._sample, apply_model, mesh_split_loss,
                optimizer, padded.shape, normalize_3dident, **tp_kwargs,
            )
        elif args.mode == "supervised":
            mesh_sup_step = make_sharded_3dident_sup_step(
                mesh, sampler._sample, apply_model, sup_loss, optimizer,
                padded.shape, normalize_3dident, **tp_kwargs,
            )
        root_key, mesh_key = jax.random.split(root_key)

        # sharded eval encode: gather rows from the sharded store with
        # the uint8 reduce-scatter, run the encoder data-parallel, and
        # only the (B, n) codes + latents come back to the host — at
        # 250k renders the old path would stream eval images through
        # the host memmap every eval window
        from ..parallel.collective import store_gather_scatter

        _eval_gather = store_gather_scatter(mesh, padded.shape)
        _dsh = NamedSharding(mesh, P("data"))
        _rep = NamedSharding(mesh, P())

        def _mesh_eval(p, bs, key, store):
            idx_z, _, z, _ = sampler._sample(key)
            x = normalize_3dident(
                _eval_gather(store, idx_z).astype(jnp.float32)
            )
            x = jax.lax.with_sharding_constraint(x, _dsh)
            return z, apply_model(p, bs, x, False)[0]

        def _mesh_test(p, bs, idx, store):
            # test mode: encode an explicit index batch of the
            # sequential sweep over the row-sharded store
            x = normalize_3dident(
                _eval_gather(store, idx).astype(jnp.float32)
            )
            x = jax.lax.with_sharding_constraint(x, _dsh)
            return apply_model(p, bs, x, False)[0]

        if mesh_model:
            # params/stats arrive (and stay) TP-sharded after the first
            # train step — match them so eval never gathers the tree
            from ..parallel.sharded import tp_param_rule

            _rule = tp_param_rule(mesh, "model")
            _p_sh = jax.tree.map(_rule, params)
            _b_sh = jax.tree.map(_rule, batch_stats)
        else:
            _p_sh = _rep
            _b_sh = _rep
        if args.mode in ("unsupervised", "supervised"):
            mesh_eval = jax.jit(
                _mesh_eval,
                in_shardings=(_p_sh, _b_sh, _rep,
                              NamedSharding(mesh, P("data"))),
                out_shardings=(_rep, _rep),
            )
        else:  # test: sharded encodes over the sequential sweep
            mesh_test_encode = jax.jit(
                _mesh_test,
                in_shardings=(_p_sh, _b_sh, _rep,
                              NamedSharding(mesh, P("data"))),
                out_shardings=_rep,
            )
        print(f"mesh path: {args.mesh} devices"
              + (f" ({n_data} data x {mesh_model} model)" if mesh_model
                 else "")
              + f", store {padded.shape} row-sharded, mode {args.mode}, "
              "eval sharded",
              flush=True)

    throughput = Throughput()
    total_loss_values = []

    prefetcher = None
    if (args.mode == "unsupervised" and load_images and mesh_step is None
            and getattr(sampler, "device_store", None) is None):
        from ..data import PrefetchingPairLoader

        root_key, k_loader = jax.random.split(root_key)
        prefetcher = PrefetchingPairLoader(
            sampler, k_loader,
            num_workers=args.workers or (os.cpu_count() or 1),
        )

    def next_train_batch(k):
        """Training batches: fully on-device when the packed image store
        fits HBM (sampling + NN matching + gather + normalize in one
        jitted call); else prefetched host pipeline; else direct."""
        if getattr(sampler, "device_store", None) is not None:
            (z, zt), (x, xt) = sampler._sample_with_images(k)
            return z, x, zt, xt
        if prefetcher is not None:
            (z, zt), (x, xt) = next(prefetcher)
            return (z, normalize_3dident(jnp.asarray(x)),
                    zt, normalize_3dident(jnp.asarray(xt)))
        return make_batch(k)

    # ---- full-fidelity resume (--save-every writes it, --resume reads
    # it; VERDICT r3 weak #1 / SURVEY §5): everything the training loop
    # mutates, in ONE crash-consistent Orbax artifact per checkpoint
    # (train.checkpoint.save_resume_state) alongside the reference-
    # shaped weights-only snapshots.
    from ..train.checkpoint import load_resume_meta, save_resume_state

    start_step = 0
    state_dir = (args.save_model + ".train_state") if args.save_model else None

    def _mesh_active():
        return mesh_step is not None or mesh_sup_step is not None

    def _state_tree(step, losses):
        tree = {"params": params, "batch_stats": batch_stats,
                "opt_state": opt_state, "root_key": root_key,
                "step": np.asarray(step, np.int64),
                "losses": np.asarray(losses, np.float64),
                "mesh": np.asarray(_mesh_active(), np.int64)}
        if _mesh_active():
            tree["mesh_key"] = mesh_key
        return tree

    def save_train_state(next_step):
        save_resume_state(state_dir, next_step,
                          _state_tree(next_step, total_loss_values))

    if args.resume:
        _found = load_resume_meta(state_dir) if state_dir else None
        if _found:
            _artifact, _meta = _found
            if int(_meta["mesh"]) != _mesh_active():
                raise SystemExit(
                    "--resume: this train state was written "
                    + ("by a --mesh run; rerun with the same --mesh so "
                       "the restored mesh RNG key has a consumer"
                       if int(_meta["mesh"]) else
                       "single-device; rerun without --mesh (the saved "
                       "state has no mesh RNG key)")
                )
            _loaded = restore_pytree(
                _artifact,
                _state_tree(0, [0.0] * len(_meta["losses"])),
            )
            params = _loaded["params"]
            batch_stats = _loaded["batch_stats"]
            opt_state = _loaded["opt_state"]
            root_key = _loaded["root_key"]
            if _mesh_active():
                mesh_key = _loaded["mesh_key"]
            start_step = int(_loaded["step"])
            total_loss_values = list(np.asarray(_loaded["losses"]))
            print(f"Resumed full train state at step {start_step} "
                  f"from {_artifact}", flush=True)
        else:
            print("--resume: no train state found; starting fresh",
                  flush=True)

    profile_ctx = trace_context(args.profile_dir)
    if args.mode in ("unsupervised", "supervised"):
        profile_ctx.__enter__()
    if args.mode == "unsupervised" and args.scan:
        # --scan: drive training as fused lax.scan segments between host
        # boundaries (evaluate/log at step % n_log_steps == 0, checkpoint
        # at (step+1) % save_every == 0). One device dispatch per segment
        # replaces the eager loop's two dispatches + blocking float()
        # fetch per step — the tunnel round-trip that left the chip ~90%
        # idle on the 64^2 true-N runs (EXPERIMENTS r3: 700 ms/step).
        # Math and RNG key sequence are identical to the eager loop
        # (test_cli_3dident.py::test_scan_matches_eager).
        scan_cache = {}

        def _next_boundary(s):
            """Smallest step >= s at which the eager loop touches the
            host: a log step, a checkpoint step, or the final step."""
            nl = s if s % args.n_log_steps == 0 else (
                s + args.n_log_steps - s % args.n_log_steps)
            end = min(nl, args.iterations - 1)
            if args.save_every is not None:
                ns = s + ((args.save_every - (s + 1) % args.save_every)
                          % args.save_every)
                end = min(end, ns)
            return end

        step = start_step
        while step < args.iterations:
            seg_end = _next_boundary(step)
            n_inner = seg_end - step + 1
            if n_inner not in scan_cache:
                scan_cache[n_inner] = make_scanned_unsup(n_inner)
            (params, opt_state, batch_stats, root_key), (totals, stds) = (
                scan_cache[n_inner](
                    (params, opt_state, batch_stats, root_key))
            )
            totals = np.asarray(totals, np.float64)
            total_loss_values.extend(float(t) for t in totals)
            throughput.update(args.batch_size * n_inner)
            if seg_end % args.n_log_steps == 0:
                mcc, lin, mse, lin_mse = evaluate()
                pps = throughput.pairs_per_sec
                print(
                    f"[{datetime.now().strftime('%Y-%m-%d_%H:%M:%S')}] \t",
                    f"Step: {seg_end + 1} \t",
                    f"Loss: {totals[-1]:.6f} \t",
                    f"sigma(loss): {float(stds[-1])} \t",
                    f"<Loss>: {np.mean(total_loss_values[-args.n_log_steps:]):.6f} \t",
                    f"Lin. Disentanglement: {lin:.6f} \t",
                    f"Perm. Disentanglement (MCC): {mcc:.4f}",
                    f"L2: {mse}",
                    f"lin. L2: {lin_mse}",
                    (f"pairs/s: {pps:.0f}" if pps else ""),
                    flush=True,
                )
                logger.log(seg_end + 1, {
                    "loss": float(totals[-1]),
                    "linear_disentanglement": lin,
                    "perm_disentanglement": mcc,
                    "pairs_per_sec": pps or 0.0,
                    "mean_znorm": getattr(evaluate, "last_znorm", 0.0),
                })
            if (args.save_every is not None
                    and (seg_end + 1) % args.save_every == 0):
                save_model(args.save_model + f".iteration_{seg_end + 1}")
                save_train_state(seg_end + 1)
            step = seg_end + 1
    elif args.mode == "unsupervised":
        for step in range(start_step, args.iterations):
            if mesh_step is not None:
                params, opt_state, batch_stats, mesh_key, total = mesh_step(
                    params, opt_state, batch_stats, mesh_key, sharded_store
                )
                total = float(total)
                per_item_std = 0.0
                total_loss_values.append(total)
                throughput.update(args.batch_size)
                if step % args.n_log_steps == 0 or step == args.iterations:
                    mcc, lin, mse, lin_mse = evaluate()
                    pps = throughput.pairs_per_sec
                    print(
                        f"[{datetime.now().strftime('%Y-%m-%d_%H:%M:%S')}] \t",
                        f"Step: {step + 1} \t",
                        f"Loss: {total:.6f} \t",
                        f"Lin. Disentanglement: {lin:.6f} \t",
                        f"Perm. Disentanglement (MCC): {mcc:.4f}",
                        (f"pairs/s: {pps:.0f}" if pps else ""),
                        flush=True,
                    )
                    logger.log(step + 1, {
                        "loss": total,
                        "linear_disentanglement": lin,
                        "perm_disentanglement": mcc,
                        "pairs_per_sec": pps or 0.0,
                        "mean_znorm": getattr(evaluate, "last_znorm", 0.0),
                    })
                if (args.save_every is not None
                        and (step + 1) % args.save_every == 0):
                    save_model(args.save_model + f".iteration_{step + 1}")
                    save_train_state(step + 1)
                continue
            root_key, k = jax.random.split(root_key)
            z1, x1, z2, x2 = next_train_batch(k)
            if args.identity_mixing_and_solution:
                total = float(
                    split_loss(z1 * identity_scale, z2 * identity_scale,
                               jnp.roll(z1 * identity_scale, 1, axis=0))[0]
                )
                per_item_std = 0.0
            else:
                params, opt_state, batch_stats, total, per_item = unsup_step(
                    params, opt_state, batch_stats, x1, x2
                )
                total = float(total)
                per_item_std = float(jnp.std(per_item))
            total_loss_values.append(total)
            throughput.update(args.batch_size)
            if step % args.n_log_steps == 0 or step == args.iterations:
                mcc, lin, mse, lin_mse = evaluate()
                pps = throughput.pairs_per_sec
                print(
                    f"[{datetime.now().strftime('%Y-%m-%d_%H:%M:%S')}] \t",
                    f"Step: {step + 1} \t",
                    f"Loss: {total:.6f} \t",
                    f"sigma(loss): {per_item_std} \t",
                    f"<Loss>: {np.mean(total_loss_values[-args.n_log_steps:]):.6f} \t",
                    f"Lin. Disentanglement: {lin:.6f} \t",
                    f"Perm. Disentanglement (MCC): {mcc:.4f}",
                    f"L2: {mse}",
                    f"lin. L2: {lin_mse}",
                    (f"pairs/s: {pps:.0f}" if pps else ""),
                    flush=True,
                )
                logger.log(step + 1, {
                    "loss": total,
                    "linear_disentanglement": lin,
                    "perm_disentanglement": mcc,
                    "pairs_per_sec": pps or 0.0,
                    "mean_znorm": getattr(evaluate, "last_znorm", 0.0),
                })
                if args.identity_mixing_and_solution and sys.stdin.isatty():
                    identity_scale = float(input("scale?: "))
                    print("scale:", identity_scale)
            if args.save_every is not None and (step + 1) % args.save_every == 0:
                save_model(args.save_model + f".iteration_{step + 1}")
                save_train_state(step + 1)
    elif args.mode == "supervised":
        for step in range(start_step, args.iterations):
            if step % args.n_log_steps == 0 or step == args.iterations:
                mcc, lin, mse, lin_mse = evaluate()
                print(
                    f"[{datetime.now().strftime('%Y-%m-%d_%H:%M:%S')}] \t"
                    f"Step: {step} \t",
                    f"Loss: {total_loss_values[-1] if total_loss_values else np.inf:.6f} \t",
                    f"Lin. Disentanglement: {lin:.6f} \t",
                    f"L2: {mse}",
                    f"lin. L2: {lin_mse}",
                    flush=True,
                )
                logger.log(step, {
                    "loss": (total_loss_values[-1]
                             if total_loss_values else float("inf")),
                    "linear_disentanglement": lin,
                })
            if mesh_sup_step is not None and not args.identity_solution:
                # sharded supervised step: latent sampling + u8 store
                # gather + row-sharded fwd/bwd in one jitted program
                params, opt_state, batch_stats, mesh_key, total = (
                    mesh_sup_step(params, opt_state, batch_stats,
                                  mesh_key, sharded_store)
                )
                total_loss_values.append(float(total))
            elif not args.identity_solution:
                root_key, k = jax.random.split(root_key)
                z1, x1, _, _ = make_batch(k)
                params, opt_state, batch_stats, total = sup_step(
                    params, opt_state, batch_stats, x1, z1
                )
                total_loss_values.append(float(total))
            else:
                root_key, k = jax.random.split(root_key)
                make_batch(k)
                total_loss_values.append(np.inf)
            if args.save_every is not None and (step + 1) % args.save_every == 0:
                save_model(args.save_model + f".iteration_{step + 1}")
                save_train_state(step + 1)
    else:  # test
        mcc, lin, mse, lin_mse = evaluate(
            eval_perm=not args.identity_solution, no_pairs=True
        )
        print(f"Lin. Disentanglement: {lin}, MCC: {mcc}, MSE: {mse}, "
              f"lin. fit MSE: {lin_mse}")

    if args.mode in ("unsupervised", "supervised"):
        profile_ctx.__exit__(None, None, None)
    logger.close()
    if prefetcher is not None:
        prefetcher.close()
    if args.save_model is not None:
        save_model(args.save_model)
        print(f"Saving final model at: {args.save_model}")


if __name__ == "__main__":
    main()
