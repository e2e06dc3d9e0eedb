"""Orbax-backed checkpointing.

One manager for all three experiment CLIs, replacing the reference's
three ad-hoc schemes (main_mlp.py:245-248,373-381 weights-only;
kitti_masks/solver.py:98-132 {iter, model, optim} dicts;
main_3dident.py:561-566 path.iteration_N snapshots). Saves the full
TrainState (params + opt state + step + RNG key [+ batch_stats]), so
restarts resume the exact RNG stream.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, step: Optional[int] = None, force: bool = False):
        step = int(state.step) if step is None else step
        self._mgr.save(
            step, args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)),
            force=force,
        )
        self._mgr.wait_until_finished()

    def restore(self, target: TrainState, step: Optional[int] = None) -> TrainState:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def save_pytree(path: str, tree) -> None:
    """One-shot Orbax save of an arbitrary pytree to ``path`` (a
    directory). Used by the CLIs to emit an Orbax artifact next to the
    reference-shaped pickle (SURVEY.md §5: one shared checkpoint layer)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(lambda x: x, tree), force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_pytree(path: str, target=None):
    """Restore a pytree saved with save_pytree. ``target`` (optional)
    provides structure/shape/dtype for exact restoration."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)
    finally:
        ckptr.close()


def save_resume_state(base_dir: str, seq: int, tree) -> None:
    """Crash-consistent full-state resume checkpoint.

    The whole state (train state, RNG keys, loss/score history, phase/
    step markers) goes into ONE Orbax artifact at base_dir/state_<seq>
    (Orbax writes to a tmp dir and renames, so the artifact is atomic),
    then a tiny LATEST pointer is atomically replaced, then older
    artifacts are pruned. A crash at any point leaves LATEST referencing
    a complete artifact: mid-orbax-save -> previous pair intact;
    between save and pointer update -> pointer still names the previous
    artifact (not yet pruned); mid-prune -> pointer already names the
    new one.
    """
    import shutil

    os.makedirs(base_dir, exist_ok=True)
    name = f"state_{int(seq):012d}"
    save_pytree(os.path.join(base_dir, name), tree)
    tmp = os.path.join(base_dir, "LATEST.tmp")
    with open(tmp, "w") as fh:
        fh.write(name)
    os.replace(tmp, os.path.join(base_dir, "LATEST"))
    for entry in os.listdir(base_dir):
        if entry.startswith("state_") and entry != name:
            shutil.rmtree(os.path.join(base_dir, entry), ignore_errors=True)


def load_resume_meta(base_dir: str):
    """Return (artifact_dir, targetless-restored tree) for the LATEST
    complete resume checkpoint, or None if there is none. The
    targetless restore yields numpy arrays / plain nests — enough to
    read phase/step/history and array shapes; follow with
    restore_pytree(artifact_dir, target) to get typed structures
    (TrainState, optax states) back."""
    latest = os.path.join(base_dir, "LATEST")
    if not os.path.exists(latest):
        return None
    with open(latest) as fh:
        name = fh.read().strip()
    d = os.path.join(base_dir, name)
    if not os.path.isdir(d):
        return None
    return d, restore_pytree(d)
