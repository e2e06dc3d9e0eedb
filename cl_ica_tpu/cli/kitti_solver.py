"""KITTI Masks training solver (TPU-native).

Reference parity: kitti_masks/solver.py — conv encoder (ConvEncoder64 ==
BetaVAE_H stripped to encoder), Adam(lr, beta1, beta2), LpSimCLR
(p=args.p, tau=1.0, simclr_compatibility_mode=True), negatives by
rolling z1's encodings (solver.py:66), running-loss log.csv every
log_step, checkpoint 'last' every save_step plus a numbered one every
50k iters.

TPU redesign: by default the whole mask corpus lives in HBM
(KittiDeviceSampler) and log_step training steps — pair sampling, paired
augmentation, 2B conv forward, loss, Adam — run as ONE scanned XLA
program per device call (110k pairs/s at the reference's batch 64 on a
v5e vs 340 pairs/s for the torch-CPU reference). A host-fed per-step
path remains as fallback.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.kitti import (
    KittiDeviceSampler,
    KittiMasks,
    augment_mask_pairs,
    augment_mask_pairs_fast,
)
from ..losses import LpSimCLRLoss
from ..models import ConvEncoder64
from ..train.checkpoint import restore_pytree, save_pytree
from ..utils import checkify_wrap, nan_check


from . import fused_arg as _fused_arg


def _device_one_step(net, loss, optim, sampler, pairs, augment,
                     constrain=None):
    """One fused KITTI train step — temporal-pair sampling, optional
    paired augmentation, 2B conv forward, LpSimCLR with rolled
    negatives, Adam — as a lax.scan body carrying
    (params, opt_state, key, arrays).

    Shared by the single-seed scanned chunk and the vmapped --seeds
    ensemble so both run literally the same per-step program."""
    cst = constrain or (lambda x: x)

    def one_step(carry, _):
        params, opt_state, key, arrays = carry
        key, k_data, k_aug = jax.random.split(key, 3)
        x1_u8, x2_u8, _, _ = sampler.sample_batch(k_data, pairs, arrays)
        x1_u8 = cst(x1_u8)
        x2_u8 = cst(x2_u8)
        if augment:
            # fast variant: shared-index rotation + integer-grid
            # translation (see data.kitti.augment_mask_pairs_fast)
            x1, x2 = augment_mask_pairs_fast(k_aug, x1_u8, x2_u8)
        else:
            x1 = x1_u8.astype(jnp.float32) / 255.0
            x2 = x2_u8.astype(jnp.float32) / 255.0

        def objective(p):
            z = net.apply(p, jnp.concatenate([x1, x2], 0)[..., None])
            z1_rec, z2_rec = z[:pairs], z[pairs:]
            z3_rec = jnp.roll(z1_rec, 1, axis=0)
            total, _, _ = loss(None, None, None, z1_rec, z2_rec, z3_rec)
            # mean code norm: the norm-drift telemetry
            znorm = jnp.mean(jnp.linalg.norm(z1_rec, axis=1))
            return nan_check(total, "loss"), znorm

        (total, znorm), grads = jax.value_and_grad(
            objective, has_aux=True
        )(params)
        updates, new_opt = optim.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates), new_opt, key, arrays
        ), (total, znorm)

    return one_step


class Solver:
    """device_sampling=True (default) holds the whole mask corpus in HBM
    (data.kitti.KittiDeviceSampler) and scans log_step training steps per
    device call — sampling, paired augmentation, encoding, loss and Adam
    fuse into one XLA program with no host data path. Set False for the
    host-fed per-step path (needed only if the corpus outgrew HBM).

    mesh: optional jax.sharding.Mesh with a 'data' axis — batches are
    row-sharded across it inside the scanned chunk (GSPMD inserts the
    global-negative all-gather + grad psums), params/corpus replicated.
    Same global-batch loss semantics as single-device (the multi-chip
    analog the other two drivers expose via --mesh)."""

    def __init__(self, args, dataset: KittiMasks, device_sampling: bool = True,
                 mesh=None):
        self.mesh = mesh
        self.ckpt_dir = args.ckpt_dir
        self.output_dir = args.output_dir
        self.dataset = dataset
        self.max_iter = int(args.max_iter)
        self.global_iter = 0
        self.z_dim = args.z_dim
        self.nc = args.num_channel
        self.log_step = args.log_step
        self.save_step = args.save_step
        self.batch_pairs = args.batch_size // 2
        self.augment = dataset.use_augmentation

        self.net = ConvEncoder64(z_dim=self.z_dim, nc=self.nc,
                                 box_norm=bool(args.box_norm))
        self.key = jax.random.PRNGKey(args.seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = jax.jit(self.net.init)(
            k_init, jnp.zeros((2, 64, 64, self.nc))
        )
        # reference: plain Adam (solver.py:44-47). --lr-cosine /
        # --weight-decay are opt-in mitigations for the late-run norm
        # drift (EXPERIMENTS r3); defaults reproduce the reference.
        lr = args.lr
        if getattr(args, "lr_cosine", False):
            lr = optax.cosine_decay_schedule(args.lr, self.max_iter)
        wd = float(getattr(args, "weight_decay", 0.0) or 0.0)
        if wd > 0.0:
            self.optim = optax.adamw(
                lr, b1=args.beta1, b2=args.beta2, weight_decay=wd
            )
        else:
            self.optim = optax.adam(lr, b1=args.beta1, b2=args.beta2)
        self.opt_state = self.optim.init(self.params)
        self.loss = LpSimCLRLoss(p=args.p, tau=1.0,
                                 simclr_compatibility_mode=True,
                                 use_fused=_fused_arg(args))
        self.np_rng = np.random.default_rng(args.seed)

        net, loss, optim, augment = self.net, self.loss, self.optim, self.augment
        if mesh is not None:
            # the scanned chunk is GSPMD-jitted: route a would-fuse loss
            # through the per-shard shard_map composition (or pin it
            # materialized) so GSPMD never meets a pallas_call
            from ..parallel.collective import gspmd_safe_loss

            loss = gspmd_safe_loss(mesh, self.loss)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if self.batch_pairs % n_data:
                raise SystemExit(
                    f"batch pairs {self.batch_pairs} (= --batch-size/2) "
                    f"must be divisible by the mesh's data axis {n_data}"
                )
            _dsh = NamedSharding(mesh, P("data"))

            def constrain(x):
                return jax.lax.with_sharding_constraint(x, _dsh)
        else:
            def constrain(x):
                return x

        self.device_sampler = None
        if device_sampling:
            self.device_sampler = KittiDeviceSampler(dataset)
            sampler = self.device_sampler
            pairs = self.batch_pairs

            one_step = _device_one_step(
                net, loss, optim, sampler, pairs, augment, constrain
            )

            n_inner = max(1, min(self.log_step, self.save_step))

            @checkify_wrap
            @jax.jit
            def chunk(params, opt_state, key, arrays):
                # corpus arrays enter as jit arguments (see
                # KittiDeviceSampler.arrays), never as baked constants
                (params, opt_state, key, _), (losses, znorms) = jax.lax.scan(
                    one_step, (params, opt_state, key, arrays), None,
                    length=n_inner,
                )
                return params, opt_state, key, losses, znorms

            self._chunk = chunk
            self._n_inner = n_inner

        @checkify_wrap
        @jax.jit
        def step(params, opt_state, key, x1_u8, x2_u8):
            x1_u8 = constrain(x1_u8)
            x2_u8 = constrain(x2_u8)
            if augment:
                k_aug, key = jax.random.split(key)
                x1, x2 = augment_mask_pairs(k_aug, x1_u8, x2_u8)
            else:
                x1 = x1_u8.astype(jnp.float32) / 255.0
                x2 = x2_u8.astype(jnp.float32) / 255.0

            b = x1.shape[0]

            def objective(p):
                # both frames in one 2B forward (the reference's
                # interleaved batch does the same thing implicitly:
                # solver.py:63-65 encodes the 2B batch then de-interleaves)
                z = net.apply(p, jnp.concatenate([x1, x2], 0)[..., None])
                z1_rec, z2_rec = z[:b], z[b:]
                z3_rec = jnp.roll(z1_rec, 1, axis=0)
                total, _, _ = loss(None, None, None, z1_rec, z2_rec, z3_rec)
                znorm = jnp.mean(jnp.linalg.norm(z1_rec, axis=1))
                return nan_check(total, "loss"), znorm

            (total, znorm), grads = jax.value_and_grad(
                objective, has_aux=True
            )(params)
            updates, new_opt = optim.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt, key,
                    total, znorm)

        self._step = step
        self._apply_jit = jax.jit(self.net.apply)

        # --resume: continue a run from --ckpt-name. The reference keeps
        # the equivalent load behind dead code (solver.py:42-43
        # `if False and ...`); we wire it for real, restoring
        # {iter, params, optim, RNG} so the resumed trajectory is
        # step-identical to an uninterrupted one (tests/test_resume.py).
        if getattr(args, "resume", False):
            self.load_checkpoint(args.ckpt_name)

    def train(self) -> bool:
        failure = False
        running_loss = 0.0
        running_norm = 0.0
        running_count = 0
        # append mode for checkpoint-resumed runs; write the header only
        # when the file is fresh so a resume does not interleave a second
        # header row into the data (kitti_analysis.load_csv expects one)
        log = open(os.path.join(self.output_dir, "log.csv"), "a", 1)
        if log.tell() == 0:
            log.write("Total Loss\n")
        # norm-drift telemetry (ours; separate file so log.csv keeps the
        # reference's single-column format for kitti_analysis.load_csv)
        nlog = open(os.path.join(self.output_dir, "norms.csv"), "a", 1)
        if nlog.tell() == 0:
            nlog.write("Mean zNorm\n")

        def on_progress(losses, norms):
            nonlocal running_loss, running_norm, running_count
            for v, nm in zip(losses, norms):
                running_loss += float(v)
                running_norm += float(nm)
                running_count += 1
                self.global_iter += 1
                if self.global_iter % self.log_step == 0:
                    log.write("%.6f\n" % (running_loss / running_count))
                    nlog.write("%.6f\n" % (running_norm / running_count))
                    running_loss = 0.0
                    running_norm = 0.0
                    running_count = 0
                if self.global_iter % self.save_step == 0:
                    self.save_checkpoint("last")
                if self.global_iter % 50000 == 0:
                    self.save_checkpoint(str(self.global_iter))

        while self.global_iter < self.max_iter:
            if self.device_sampler is not None:
                n = min(self._n_inner, self.max_iter - self.global_iter)
                if n == self._n_inner:
                    (self.params, self.opt_state, self.key, losses,
                     znorms) = self._chunk(
                        self.params, self.opt_state, self.key,
                        self.device_sampler.arrays,
                    )
                    on_progress(np.asarray(losses).tolist(),
                                np.asarray(znorms).tolist())
                    continue
            # host-fed per-step path (also used for ragged final steps)
            x1, x2, _, _ = self.dataset.sample_pair_batch(
                self.batch_pairs, self.np_rng
            )
            self.params, self.opt_state, self.key, total, znorm = self._step(
                self.params, self.opt_state, self.key,
                jnp.asarray(x1), jnp.asarray(x2),
            )
            on_progress([total], [znorm])
        log.close()
        nlog.close()
        self.save_checkpoint("last")
        return failure

    def encode(self, x_np: np.ndarray) -> np.ndarray:
        """mean_rep: encode (B, C, H, W) float arrays (dis-lib layout,
        evaluate_disentanglement.py:28-33)."""
        x = jnp.asarray(x_np, dtype=jnp.float32)
        if x.ndim == 4 and x.shape[1] in (1, 3):  # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        return np.asarray(self._apply_jit(self.params, x))

    def save_checkpoint(self, filename: str, silent: bool = True):
        states = {
            "iter": self.global_iter,
            "model_states": {"net": jax.tree.map(np.asarray, self.params)},
            "optim_states": {"optim": jax.tree.map(np.asarray, self.opt_state)},
        }
        file_path = os.path.join(self.ckpt_dir, filename)
        with open(file_path + ".tmp", "wb") as fh:
            # RNG rides the pickle only (np PCG64 state holds 128-bit
            # ints an Orbax array pytree cannot carry); extra key on the
            # reference-shaped dict, harmless to reference-style readers
            pickle.dump({**states, "rng": {
                "key": np.asarray(self.key),
                "np_state": self.np_rng.bit_generator.state,
            }}, fh)
        os.replace(file_path + ".tmp", file_path)
        # Orbax artifact alongside the reference-shaped pickle
        # (SURVEY.md §5: one shared checkpoint layer)
        save_pytree(file_path + ".orbax", states)
        if not silent:
            print(f"=> saved checkpoint '{file_path}' (iter {self.global_iter})")

    def load_checkpoint(self, filename: str):
        file_path = os.path.join(self.ckpt_dir, filename)
        if not os.path.isfile(file_path) and os.path.isdir(file_path + ".orbax"):
            target = {
                "iter": 0,
                "model_states": {
                    "net": jax.tree.map(np.asarray, self.params)
                },
                "optim_states": {
                    "optim": jax.tree.map(np.asarray, self.opt_state)
                },
            }
            ckpt = restore_pytree(file_path + ".orbax", target)
            self.global_iter = int(ckpt["iter"])
            self.params = jax.tree.map(jnp.asarray, ckpt["model_states"]["net"])
            self.opt_state = jax.tree.map(
                jnp.asarray, ckpt["optim_states"]["optim"]
            )
            print(f"=> loaded checkpoint '{file_path}.orbax "
                  f"(iter {self.global_iter})'")
            return
        if os.path.isfile(file_path):
            with open(file_path, "rb") as fh:
                ckpt = pickle.load(fh)
            self.global_iter = ckpt["iter"]
            self.params = jax.tree.map(jnp.asarray, ckpt["model_states"]["net"])
            self.opt_state = jax.tree.map(
                jnp.asarray, ckpt["optim_states"]["optim"]
            )
            if "rng" in ckpt:  # full-fidelity resume (absent in
                # reference-written pickles: those restart the streams)
                self.key = jnp.asarray(ckpt["rng"]["key"])
                self.np_rng.bit_generator.state = ckpt["rng"]["np_state"]
            print(f"=> loaded checkpoint '{file_path} (iter {self.global_iter})'")
        else:
            print(f"=> no checkpoint found at '{file_path}'")


class EnsembleSolver:
    """Train S KITTI seeds in lockstep in ONE vmapped scanned program.

    The KITTI path runs at ~11% of the chip's matmul ceiling at the
    reference batch (latency/shape-bound, EXPERIMENTS r3 continuation),
    so stacking S seeds' parameters, optimizer states and RNG streams
    over a leading device axis trains S runs for roughly the wall of
    one — the same measured exploit main_mlp --seeds ships for the MLP
    path. The reference trains seeds strictly serially
    (main_kitti.py:251-261 relaunches the whole experiment per seed).

    Lane i runs the same per-step program as a serial Solver with
    seeds[i]: identical init (bit-equal params, same root-key split
    order) and the scan body IS Solver's own `_device_one_step`, so
    per-step losses agree to float-reassociation level (~1e-5 over the
    first chunk, tests/test_kitti_ensemble.py). Exact long-horizon
    bit-equality with a serial run is NOT guaranteed: vmap batches the
    convolutions differently, and Adam amplifies the reassociation
    noise — lanes are statistically identical runs, not bit-identical
    ones (unlike the all-matmul MLP ensemble, which is exact).

    Every lane writes the artifacts a serial run would — per-seed
    log.csv / norms.csv, reference-shaped checkpoint pickles (+ Orbax
    twins) — so kitti_evaluate and the analysis tools consume lanes
    unchanged. Device-sampling only (the host-fed fallback has no seed
    axis); incompatible with --mesh (one leading axis is the seed
    axis).
    """

    def __init__(self, args, dataset: KittiMasks, seeds, out_dirs, ckpt_dirs):
        assert len(seeds) == len(out_dirs) == len(ckpt_dirs) and len(seeds) > 1
        self.seeds = list(seeds)
        self.out_dirs = list(out_dirs)
        self.ckpt_dirs = list(ckpt_dirs)
        self.dataset = dataset
        self.max_iter = int(args.max_iter)
        self.global_iter = 0
        self.z_dim = args.z_dim
        self.nc = args.num_channel
        self.log_step = args.log_step
        self.save_step = args.save_step
        self.batch_pairs = args.batch_size // 2
        self.augment = dataset.use_augmentation

        self.net = ConvEncoder64(z_dim=self.z_dim, nc=self.nc,
                                 box_norm=bool(args.box_norm))
        lr = args.lr
        if getattr(args, "lr_cosine", False):
            lr = optax.cosine_decay_schedule(args.lr, self.max_iter)
        wd = float(getattr(args, "weight_decay", 0.0) or 0.0)
        if wd > 0.0:
            self.optim = optax.adamw(
                lr, b1=args.beta1, b2=args.beta2, weight_decay=wd
            )
        else:
            self.optim = optax.adam(lr, b1=args.beta1, b2=args.beta2)
        self.loss = LpSimCLRLoss(p=args.p, tau=1.0,
                                 simclr_compatibility_mode=True,
                                 use_fused=_fused_arg(args))
        # host RNG per lane: unused on the device path but round-tripped
        # through checkpoints so lane pickles stay Solver-loadable
        self.np_rngs = [np.random.default_rng(s) for s in self.seeds]

        init_jit = jax.jit(self.net.init)
        lanes = []
        for s in self.seeds:
            key = jax.random.PRNGKey(s)
            key, k_init = jax.random.split(key)
            params = init_jit(k_init, jnp.zeros((2, 64, 64, self.nc)))
            lanes.append((params, self.optim.init(params), key))
        self.states = jax.tree.map(lambda *xs: jnp.stack(xs), *lanes)

        self.device_sampler = KittiDeviceSampler(dataset)
        one_step = _device_one_step(
            self.net, self.loss, self.optim, self.device_sampler,
            self.batch_pairs, self.augment,
        )

        def lane_step(state, arrays):
            params, opt_state, key = state
            (params, opt_state, key, _), out = one_step(
                (params, opt_state, key, arrays), None
            )
            return (params, opt_state, key), out

        vstep = jax.vmap(lane_step, in_axes=(0, None))

        def make_chunk(length):
            @checkify_wrap
            @jax.jit
            def chunk(states, arrays):
                def body(carry, _):
                    sts, arr = carry
                    sts, out = vstep(sts, arr)
                    return (sts, arr), out

                (states2, _), (losses, znorms) = jax.lax.scan(
                    body, (states, arrays), None, length=length
                )
                return states2, losses, znorms  # (length, S)

            return chunk

        self._make_chunk = make_chunk
        self._chunks = {}
        self._n_inner = max(1, min(self.log_step, self.save_step))

        if getattr(args, "resume", False):
            self._load_all(getattr(args, "ckpt_name", "last"))

    # -- checkpointing (Solver-shaped, per lane) ------------------------

    def _lane_state(self, i):
        sl = jax.tree.map(lambda x: x[i], self.states)
        return sl  # (params, opt_state, key)

    def save_checkpoint(self, filename: str):
        for i in range(len(self.seeds)):
            params, opt_state, key = self._lane_state(i)
            states = {
                "iter": self.global_iter,
                "model_states": {"net": jax.tree.map(np.asarray, params)},
                "optim_states": {"optim": jax.tree.map(np.asarray, opt_state)},
            }
            file_path = os.path.join(self.ckpt_dirs[i], filename)
            with open(file_path + ".tmp", "wb") as fh:
                pickle.dump({**states, "rng": {
                    "key": np.asarray(key),
                    "np_state": self.np_rngs[i].bit_generator.state,
                }}, fh)
            os.replace(file_path + ".tmp", file_path)
            save_pytree(file_path + ".orbax", states)

    def _load_all(self, filename: str):
        lanes, iters = [], []
        for i, d in enumerate(self.ckpt_dirs):
            file_path = os.path.join(d, filename)
            if not os.path.isfile(file_path):
                print(f"--resume: no checkpoint at '{file_path}'; "
                      "starting the ensemble fresh")
                return
            with open(file_path, "rb") as fh:
                ckpt = pickle.load(fh)
            iters.append(int(ckpt["iter"]))
            key = (jnp.asarray(ckpt["rng"]["key"]) if "rng" in ckpt
                   else jax.random.PRNGKey(self.seeds[i]))
            if "rng" in ckpt:
                self.np_rngs[i].bit_generator.state = ckpt["rng"]["np_state"]
            lanes.append((
                jax.tree.map(jnp.asarray, ckpt["model_states"]["net"]),
                jax.tree.map(jnp.asarray, ckpt["optim_states"]["optim"]),
                key,
            ))
        if len(set(iters)) != 1:
            raise SystemExit(
                f"--resume --seeds: lane checkpoints disagree on iter "
                f"{iters}; the ensemble trains lanes in lockstep — "
                "finish/redo the stragglers serially or delete the "
                "checkpoints"
            )
        self.global_iter = iters[0]
        self.states = jax.tree.map(lambda *xs: jnp.stack(xs), *lanes)
        print(f"=> loaded {len(lanes)}-lane ensemble checkpoint "
              f"'{filename}' (iter {self.global_iter})")

    # -- training --------------------------------------------------------

    def train(self) -> bool:
        S = len(self.seeds)
        logs, nlogs = [], []
        for d in self.out_dirs:
            log = open(os.path.join(d, "log.csv"), "a", 1)
            if log.tell() == 0:
                log.write("Total Loss\n")
            nlog = open(os.path.join(d, "norms.csv"), "a", 1)
            if nlog.tell() == 0:
                nlog.write("Mean zNorm\n")
            logs.append(log)
            nlogs.append(nlog)

        running = np.zeros(S)
        running_n = np.zeros(S)
        count = 0
        while self.global_iter < self.max_iter:
            n = min(self._n_inner, self.max_iter - self.global_iter)
            if n not in self._chunks:
                self._chunks[n] = self._make_chunk(n)
            self.states, losses, znorms = self._chunks[n](
                self.states, self.device_sampler.arrays
            )
            losses = np.asarray(losses)
            znorms = np.asarray(znorms)
            for t in range(n):
                running += losses[t]
                running_n += znorms[t]
                count += 1
                self.global_iter += 1
                if self.global_iter % self.log_step == 0:
                    for i in range(S):
                        logs[i].write("%.6f\n" % (running[i] / count))
                        nlogs[i].write("%.6f\n" % (running_n[i] / count))
                    running[:] = 0.0
                    running_n[:] = 0.0
                    count = 0
                if self.global_iter % self.save_step == 0:
                    self.save_checkpoint("last")
                if self.global_iter % 50000 == 0:
                    self.save_checkpoint(str(self.global_iter))
        for fh in logs + nlogs:
            fh.close()
        self.save_checkpoint("last")
        return False
