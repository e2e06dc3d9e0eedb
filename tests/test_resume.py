"""Full-fidelity resume (--save-every / --resume) — VERDICT r3 #3.

The reference saves weights only at phase end (main_mlp.py:373-381,
main_3dident.py:561-566); SURVEY §5's plan is one full-state checkpoint
layer (params + opt state + step + RNG keys) shared by the CLIs. These
tests kill a run immediately after a checkpoint lands (simulated outage
via a save_pytree wrapper that raises) and assert the resumed run's
final scores are step-identical to an uninterrupted run.
"""

import os

import numpy as np
import pytest

from cl_ica_tpu.cli import main_mlp
from cl_ica_tpu.train import checkpoint as ckpt_mod

BASE = [
    "--space-type", "box", "--m-p", "0", "--c-p", "1", "--p", "1",
    "--n", "3", "--batch-size", "128", "--n-steps", "400",
    "--more-unsupervised", "1", "--n-log-steps", "100",
    "--num-eval-batches", "2", "--seed", "0",
]


def _run(argv):
    return main_mlp.main(argv)


def _crash_before_save(monkeypatch, n):
    """Simulated outage: the process dies at the point of its n-th
    checkpoint attempt, so the (n-1)-th checkpoint is the complete
    LATEST one and everything executed since it must be replayed."""
    orig = ckpt_mod.save_resume_state
    calls = {"n": 0}

    def crashing(base_dir, seq, tree):
        calls["n"] += 1
        if calls["n"] == n:
            raise KeyboardInterrupt("simulated outage")
        orig(base_dir, seq, tree)

    monkeypatch.setattr(ckpt_mod, "save_resume_state", crashing)
    return calls


def test_mlp_midphase_resume_matches_uninterrupted(tmp_path, monkeypatch):
    ref_dir = str(tmp_path / "ref")
    argv = BASE + ["--only-unsupervised", "--save-every", "200"]
    ref_scores = _run(argv + ["--save-dir", ref_dir])

    run_dir = str(tmp_path / "resumed")
    _crash_before_save(monkeypatch, 2)  # die at the phase-boundary save
    with pytest.raises(KeyboardInterrupt):
        _run(argv + ["--save-dir", run_dir])
    _, meta = ckpt_mod.load_resume_meta(os.path.join(run_dir, "resume"))
    assert int(meta["phase"]) == 0 and int(meta["step"]) == 201

    monkeypatch.undo()
    res_scores = _run(argv + ["--save-dir", run_dir, "--resume"])
    np.testing.assert_allclose(res_scores, ref_scores, atol=1e-6)


def test_mlp_phase_boundary_resume(tmp_path, monkeypatch):
    # two-phase run (sup then unsup); crash at the phase-0 boundary save
    ref_dir = str(tmp_path / "ref")
    argv = BASE + ["--save-every", "200"]
    ref_scores = _run(argv + ["--save-dir", ref_dir])

    run_dir = str(tmp_path / "resumed")
    # saves: p0 step 201, p0 boundary, p1 step 201, p1 boundary —
    # die at the third, so LATEST is the phase-0 boundary
    _crash_before_save(monkeypatch, 3)
    with pytest.raises(KeyboardInterrupt):
        _run(argv + ["--save-dir", run_dir])
    _, meta = ckpt_mod.load_resume_meta(os.path.join(run_dir, "resume"))
    assert int(meta["phase"]) == 1 and int(meta["step"]) == 0

    monkeypatch.undo()
    res_scores = _run(argv + ["--save-dir", run_dir, "--resume"])
    np.testing.assert_allclose(res_scores, ref_scores, atol=1e-6)


def test_mlp_resume_guards():
    with pytest.raises(SystemExit):
        main_mlp.parse_args(BASE + ["--resume"])  # no --save-dir
    # ensemble resume is single-phase only: multi-phase (default
    # sup->unsup) still refuses, single-phase parses
    with pytest.raises(SystemExit):
        main_mlp.parse_args(
            BASE + ["--seeds", "2", "--save-every", "100",
                    "--save-dir", "/tmp/x"]
        )
    main_mlp.parse_args(
        BASE + ["--only-unsupervised", "--seeds", "2",
                "--save-every", "100", "--save-dir", "/tmp/x"]
    )


def test_mlp_ensemble_midphase_resume_matches_uninterrupted(
        tmp_path, monkeypatch):
    """Ensemble (--seeds) full-state resume: kill after a mid-phase
    checkpoint, resume, final per-seed scores must be step-identical
    to the uninterrupted ensemble (r4: claim-matrix crash recovery)."""
    argv = BASE + ["--only-unsupervised", "--seeds", "2",
                   "--save-every", "100"]
    ref_dir = str(tmp_path / "ref")
    ref_scores = _run(argv + ["--save-dir", ref_dir])

    run_dir = str(tmp_path / "resumed")
    # chunk-boundary saves at 101, 201, 301, then the force-save at 400:
    # die at the second, so LATEST is step 101 and ~300 steps replay
    _crash_before_save(monkeypatch, 2)
    with pytest.raises(KeyboardInterrupt):
        _run(argv + ["--save-dir", run_dir])
    _, meta = ckpt_mod.load_resume_meta(os.path.join(run_dir, "resume_ens"))
    assert int(meta["step"]) == 101

    monkeypatch.undo()
    res_scores = _run(argv + ["--save-dir", run_dir, "--resume"])
    np.testing.assert_allclose(res_scores, ref_scores, atol=1e-6)


def test_mlp_resume_completed_run_refuses(tmp_path):
    run_dir = str(tmp_path / "done")
    argv = BASE + ["--only-unsupervised", "--save-every", "200",
                   "--save-dir", run_dir]
    _run(argv)
    with pytest.raises(SystemExit, match="complete"):
        _run(argv + ["--resume"])


# ---- main_3dident full-state resume (dummy-mixing latent path: exact
# per-step key discipline, so the resumed trajectory is bitwise) ----

import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_3dident(extra, tmp_path, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    args = [
        "cl_ica_tpu.cli.main_3dident", "--mode", "unsupervised",
        "--offline-dataset", str(tmp_path / "data"),
        "--non-periodic-rotation-and-color", "--dummy-mixing",
        "--batch-size", "16", "--n-log-steps", "4",
        "--n-eval-samples", "32", "--seed", "0", "--save-every", "4",
    ] + extra
    return subprocess.run(
        [sys.executable, "-u", "-m"] + args,
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_3dident_resume_matches_uninterrupted(tmp_path):
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    np.save(data / "raw_latents.npy",
            rng.uniform(-1, 1, (64, 10)).astype(np.float32))

    ref = tmp_path / "ref_model.pkl"
    r = _run_3dident(["--iterations", "8", "--save-model", str(ref)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]

    # stage 1: stop exactly at the step-4 checkpoint (loop state at step
    # 4 does not depend on the planned total, so this IS an interrupt)
    res = tmp_path / "res_model.pkl"
    r = _run_3dident(["--iterations", "4", "--save-model", str(res)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(str(res) + ".train_state")

    # stage 2: resume to the full schedule
    r = _run_3dident(
        ["--iterations", "8", "--save-model", str(res), "--resume"], tmp_path
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Resumed full train state at step 4" in r.stdout

    with open(ref, "rb") as fh:
        p_ref = pickle.load(fh)["params"]
    with open(res, "rb") as fh:
        p_res = pickle.load(fh)["params"]
    flat_ref = jax_flat(p_ref)
    flat_res = jax_flat(p_res)
    assert len(flat_ref) == len(flat_res)
    for a, b in zip(flat_ref, flat_res):
        np.testing.assert_allclose(a, b, atol=1e-6)


def jax_flat(tree):
    import jax

    return jax.tree.leaves(tree)


def test_3dident_resume_needs_save_model():
    from cl_ica_tpu.cli import main_3dident

    with pytest.raises(SystemExit, match="resume"):
        main_3dident.parse_args(
            ["--offline-dataset", "/tmp", "--resume"]
        )
