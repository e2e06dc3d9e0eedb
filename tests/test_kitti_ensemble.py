"""main_kitti --seeds: the vmapped lockstep ensemble must reproduce
serial Solver runs lane-for-lane (same RNG split order, same scan body
via kitti_solver._device_one_step) and write Solver-shaped artifacts.

The reference runs KITTI seeds strictly serially by relaunching the
whole experiment (main_kitti.py:251-261); the ensemble is the TPU-native
multiplexing of that protocol over a vmap axis (the path is
latency-bound at ~11% of the matmul ceiling, EXPERIMENTS r3)."""

import os
import pickle
import types

import numpy as np
import pytest

from cl_ica_tpu.data.kitti import KittiMasks

SEEDS = [0, 1, 2]


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("kitti")
    seqs, lats = [], []
    for t in (6, 9, 12):
        seqs.append(rng.integers(0, 2, (t, 64, 64)).astype(bool))
        lats.append(rng.normal(size=(t, 3)).astype(np.float32))
    with open(root / "kitti_peds_v2.pickle", "wb") as fh:
        pickle.dump({"pedestrians": seqs, "pedestrians_latents": lats}, fh)
    return str(root)


def _mk_args(ck, out, max_iter=10, seed=0, **kw):
    os.makedirs(ck, exist_ok=True)
    os.makedirs(out, exist_ok=True)
    base = dict(
        ckpt_dir=str(ck), output_dir=str(out), max_iter=max_iter,
        z_dim=3, num_channel=1, log_step=5, save_step=5, batch_size=8,
        box_norm=0, lr=1e-3, beta1=0.9, beta2=0.999, p=1, seed=seed,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def _ensemble(tmp_path, ds, tag, max_iter=10, resume=False):
    from cl_ica_tpu.cli.kitti_solver import EnsembleSolver

    outs = [str(tmp_path / tag / f"out{s}") for s in SEEDS]
    cks = [str(tmp_path / tag / f"ck{s}") for s in SEEDS]
    for d in outs + cks:
        os.makedirs(d, exist_ok=True)
    args = _mk_args(cks[0], outs[0], max_iter=max_iter, resume=resume)
    return EnsembleSolver(args, ds, SEEDS, outs, cks), outs, cks


def test_ensemble_matches_serial_lanes(kitti_root, tmp_path):  # noqa: F811
    """Lane == serial program: bit-equal init, per-step losses at
    float-reassociation level over the first chunk, trajectory-level
    agreement over the full (short) run. Exact param equality is NOT
    asserted: vmap batches the convs differently and Adam amplifies the
    reassociation noise (see EnsembleSolver docstring)."""
    from cl_ica_tpu.cli.kitti_solver import Solver

    ds = KittiMasks(path=kitti_root, download=False, transform="default")

    # first-chunk ensemble probe, computed once and checked against
    # EVERY lane below (ADVICE r4: lanes 1-2 must get the tight
    # per-step rtol too, not just lane 0)
    ens0, _, _ = _ensemble(tmp_path, ds, "probe")
    chunk = ens0._make_chunk(ens0._n_inner)
    _, e_losses, _ = chunk(ens0.states, ens0.device_sampler.arrays)
    e_losses = np.asarray(e_losses)

    serial = []
    for i, s in enumerate(SEEDS):
        args = _mk_args(tmp_path / f"s{s}" / "ck", tmp_path / f"s{s}" / "out",
                        seed=s)
        sol = Solver(args, ds)
        # init bit-equality + first-chunk per-step loss agreement,
        # asserted for every lane against its serial twin
        lane_p, _, lane_k = ens0._lane_state(i)
        for a, b in zip(jax_tree_leaves(sol.params),
                        jax_tree_leaves(lane_p)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(sol.key),
                                      np.asarray(lane_k))
        _, _, _, s_losses, _ = sol._chunk(
            sol.params, sol.opt_state, sol.key,
            sol.device_sampler.arrays,
        )
        s_losses = np.asarray(s_losses)
        # step 1 is pre-reassociation-drift: tight on every lane (a
        # wiring bug — wrong seed/lane — would be O(1) off here)
        np.testing.assert_allclose(e_losses[0, i], s_losses[0], rtol=1e-5)
        # across the chunk the vmap-conv reassociation noise compounds
        # through Adam (measured ~3e-4 rel by step 5 on lanes 1-2 on
        # CPU); lane 0 happens to share the serial layout and stays
        # at float-reassociation level
        rtol = 1e-4 if i == 0 else 2e-3
        np.testing.assert_allclose(
            e_losses[:, i], s_losses, rtol=rtol, atol=1e-6,
        )
        assert sol.train() is False
        with open(os.path.join(args.output_dir, "log.csv")) as fh:
            losses = [float(x) for x in fh.read().splitlines()[1:]]
        serial.append(losses)

    ens, outs, cks = _ensemble(tmp_path, ds, "ens")
    assert ens.train() is False

    for i, s in enumerate(SEEDS):
        # per-lane log.csv tracks the serial run's trajectory
        with open(os.path.join(outs[i], "log.csv")) as fh:
            losses = [float(x) for x in fh.read().splitlines()[1:]]
        # First logged window is tight (per-step agreement asserted at
        # rtol 1e-4 above); later windows only loosely — Adam amplifies
        # the vmap-conv reassociation noise chaotically (~1e-2 by step
        # 10 on CPU), so this is a wiring check (right lane/seed), not
        # a numerical-equality claim.
        np.testing.assert_allclose(losses[0], serial[i][0], rtol=1e-3)
        np.testing.assert_allclose(losses, serial[i], rtol=5e-2)
        # lane checkpoint is Solver/kitti_evaluate-shaped
        with open(os.path.join(cks[i], "last"), "rb") as fh:
            ckpt = pickle.load(fh)
        assert ckpt["iter"] == 10
        assert "net" in ckpt["model_states"] and "rng" in ckpt


def jax_tree_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_ensemble_resume_matches_uninterrupted(kitti_root, tmp_path):  # noqa: F811
    ds = KittiMasks(path=kitti_root, download=False, transform="default")

    full, _, _ = _ensemble(tmp_path, ds, "full", max_iter=10)
    assert full.train() is False

    part, outs, cks = _ensemble(tmp_path, ds, "part", max_iter=5)
    assert part.train() is False
    resumed, _, _ = _ensemble(tmp_path, ds, "part", max_iter=10, resume=True)
    assert resumed.global_iter == 5
    assert resumed.train() is False

    for tree_a, tree_b in [(full.states, resumed.states)]:
        for a, b in zip(jax_tree_leaves(tree_a), jax_tree_leaves(tree_b)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )


def test_ensemble_resume_lane_mismatch_is_loud(kitti_root, tmp_path):  # noqa: F811
    ds = KittiMasks(path=kitti_root, download=False, transform="default")
    part, outs, cks = _ensemble(tmp_path, ds, "mm", max_iter=5)
    assert part.train() is False
    # corrupt one lane's iter
    with open(os.path.join(cks[1], "last"), "rb") as fh:
        ckpt = pickle.load(fh)
    ckpt["iter"] = 3
    with open(os.path.join(cks[1], "last"), "wb") as fh:
        pickle.dump(ckpt, fh)
    with pytest.raises(SystemExit, match="disagree"):
        _ensemble(tmp_path, ds, "mm", max_iter=10, resume=True)


def test_cli_seeds_guards():
    from cl_ica_tpu.cli.main_kitti import main

    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["--seeds", "2", "--random-seeds", "--dset-dir", "/nonexistent"])
    with pytest.raises(SystemExit, match="leading device axis"):
        main(["--seeds", "2", "--mesh", "2", "--dset-dir", "/nonexistent"])
