"""Checkpoint save/restore (params + batch stats + optimizer state).

The reference checkpoints whole Keras models per epoch / on best loss
(`CycleGAN.py:203-204`, `UNet_Segmentation.py:262-264`) and resumes by
loading the lexicographically-latest directory entry
(`UNet_Segmentation.py:303`). Here: Orbax for the pytree payload with the
same latest-by-name resume convention, and unlike the reference the
optimizer state is included, so training resumes exactly.
"""
from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state) -> None:
    """Save a pytree state to `path` (a directory, created fresh)."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, target=None):
    """Restore a pytree state saved by :func:`save_checkpoint`.

    `target` (an abstract or concrete pytree of the same structure) restores
    with matching shapes/dtypes; None restores the raw saved tree.
    """
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckpt.restore(path, abstract)
    return ckpt.restore(path)


def restructure_opt_state(raw, template):
    """Rebuild an optimizer-state pytree from a raw Orbax restore.

    A structure-less restore returns nested lists/dicts; optax states are
    namedtuples. Leaf order is deterministic for a fixed tree, so
    reflattening the raw leaves into the template's treedef (from
    `tx.init(params)`) reconstructs the exact optimizer state.
    """
    leaves = jax.tree.leaves(raw)
    tmpl_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(tmpl_leaves):
        raise ValueError(
            f"optimizer state layout mismatch: checkpoint has {len(leaves)} "
            f"leaves, the rebuilt optimizer expects {len(tmpl_leaves)} — was "
            "the checkpoint written with a different optimizer/schedule?")
    return jax.tree.unflatten(treedef, leaves)


def latest_checkpoint(model_dir: str, pattern: str = r".*") -> str | None:
    """Latest checkpoint directory under `model_dir` by name order
    (the reference's resume-from-latest convention)."""
    if not os.path.isdir(model_dir):
        return None
    entries = sorted(e for e in os.listdir(model_dir)
                     if re.match(pattern, e)
                     and os.path.isdir(os.path.join(model_dir, e)))
    return os.path.join(model_dir, entries[-1]) if entries else None


def truncate_epoch_csv(csv_path: str, start_epoch: int) -> None:
    """Drop `training_log.csv` rows with epoch >= start_epoch — a resumed
    run re-trains those epochs, so their pre-interruption rows would
    duplicate (used by the trainers' `fit(start_epoch=...)`)."""
    if not (start_epoch and os.path.isfile(csv_path)):
        return
    rows = open(csv_path).read().splitlines()
    keep = [rows[0]] + [r for r in rows[1:]
                        if r and int(r.split(";")[0]) < start_epoch]
    with open(csv_path, "w") as fh:
        fh.write("\n".join(keep) + "\n")
