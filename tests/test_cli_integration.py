"""Subprocess-level CLI integration: the driver entry points must run
end-to-end in a fresh interpreter (catches import-time and argparse
regressions that in-process tests can't)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device is enough here
    return subprocess.run(
        [sys.executable, "-u", "-m"] + args,
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_main_mlp_cli_end_to_end():
    r = _run([
        "cl_ica_tpu.cli.main_mlp", "--space-type", "sphere", "--n", "3",
        "--batch-size", "64", "--n-steps", "12", "--n-log-steps", "6",
        "--only-unsupervised", "--more-unsupervised", "1",
        "--c-p", "0", "--c-param", "20", "--p", "2", "--seed", "0",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Perm. Disentanglement" in r.stdout
    assert "perm mean:" in r.stdout


def test_main_mlp_cli_bad_flag():
    r = _run(["cl_ica_tpu.cli.main_mlp", "--space-type", "nope"], timeout=120)
    assert r.returncode != 0
    assert "invalid choice" in r.stderr
