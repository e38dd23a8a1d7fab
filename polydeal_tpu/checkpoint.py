"""Checkpoint / resume via orbax.

The reference has no restart capability — its monodomain loop only dumps
VTU snapshots (reference examples/monodomain_DG3D.cc:2306-2308; SURVEY §5
"Checkpoint/resume: absent").  This module is the promised improvement:
save/restore of arbitrary solver state pytrees (solution history, gating
variables, step index, config echo) with orbax, so long time-dependent
runs survive preemption — table stakes for production TPU jobs.
"""

from __future__ import annotations

import os

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state) -> str:
    """Save a state pytree under directory/step_<k>; returns the path."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(directory)
        if name.startswith("step_")
    ]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: int | None = None):
    """Restore (step, state); step=None restores the latest."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    return step, _checkpointer().restore(path)
