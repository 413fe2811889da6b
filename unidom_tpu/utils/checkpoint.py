"""Checkpoint save/restore with resume support.

The reference is pickle-save-only (apg.py:325-330 saves the first device
replica's params every eval; no trainer can resume). Here: orbax-backed
checkpointing of the full TrainingState (params + optimizer + normalizer +
iteration) with a pickle fallback, and ``latest``/``restore`` for resume.
"""

import os
import pickle
import re

import jax

try:
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    HAVE_ORBAX = False


def save_checkpoint(directory, step, tree):
    os.makedirs(directory, exist_ok=True)
    tree = jax.device_get(tree)
    if HAVE_ORBAX:
        path = os.path.join(os.path.abspath(directory), f"ckpt_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return path
    path = os.path.join(directory, f"ckpt_{step}.pkl")
    with open(path, "wb") as f:
        pickle.dump(tree, f)
    return path


def latest_checkpoint(directory):
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = re.match(r"ckpt_(\d+)(\.pkl)?$", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def restore_checkpoint(path, target=None):
    """``target``: a pytree of the same structure (required for orbax)."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    assert HAVE_ORBAX, "orbax checkpoint requires orbax installed"
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=jax.device_get(target))
    return ckptr.restore(os.path.abspath(path))
