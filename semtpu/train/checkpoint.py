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
import threading

import jax
import numpy as np
import orbax.checkpoint as ocp

from semtpu.utils.transfer import fetch_packed, put_packed  # noqa: F401
# (re-exported: the trainers' save/load paths import them from here)


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


class AsyncSaver:
    """Overlap checkpoint writes with training.

    On a tunneled TPU the device->host pull dominates checkpoint time (a
    full-budget CycleGAN state is ~1.1 GB; run_t0 measured ~980 s of its
    8,328 s step-3 wall-clock inside six such saves). The trainers donate
    their state buffers to the next train step, so the caller must hand
    this saver an on-device *snapshot* (fresh buffers, e.g. a jitted
    `tree.map(jnp.copy, state)`); the fetch + Orbax write then run in a
    background thread while the main thread keeps dispatching epochs.

    One save in flight at a time: `save` joins the previous thread first
    (bounding extra HBM to one snapshot), and `wait` must be called after
    the final save before anything reads the checkpoints back. A failure
    in the background thread re-raises on the next `save`/`wait` so the
    pipeline's retry machinery still sees it.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._err: BaseException | None = None

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint save failed") from err

    def save(self, path: str, snapshot, post=None) -> None:
        """Fetch `snapshot` (an on-device pytree the caller guarantees is
        not donated elsewhere) and save it to `path` in the background.
        `post(host_tree) -> host_tree` runs in-thread after the fetch
        (dtype coercions that keep the written format bit-identical to
        the synchronous `save_checkpoint` path)."""
        self.wait()

        def _run():
            try:
                host = fetch_packed(snapshot)
                if post is not None:
                    host = post(host)
                save_checkpoint(path, host)
            except BaseException as e:  # surfaced by the next wait()
                self._err = e

        self._thread = threading.Thread(target=_run, name="ckpt-save",
                                        daemon=True)
        self._thread.start()


def is_committed_checkpoint(path: str) -> bool:
    """True if `path` is a fully-written Orbax checkpoint directory (an
    interrupted save leaves a `*.orbax-checkpoint-tmp-*` dir, or a dir
    without the commit-time `_CHECKPOINT_METADATA` file)."""
    return (".orbax-checkpoint-tmp" not in os.path.basename(path)
            and os.path.isfile(os.path.join(path, "_CHECKPOINT_METADATA")))


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
                     and ".orbax-checkpoint-tmp" not in e
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
