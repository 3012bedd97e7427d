"""AsyncSaver + interrupted-save filtering (semtpu/train/checkpoint.py).

The async path must write byte-identical checkpoints to the synchronous
`save_checkpoint`, surface background failures on the next `save`/`wait`,
and the discovery helpers must skip `*.orbax-checkpoint-tmp-*` leftovers
from a save that was killed mid-write (reference convention of resuming
from the newest whole-model save: `Releases/Version 1.2.0/CycleGAN.py:203-204`).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from semtpu.train.checkpoint import (AsyncSaver, save_checkpoint,
                                     load_checkpoint, latest_checkpoint,
                                     is_committed_checkpoint)


def _payload():
    return {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
            "step": jnp.int32(7)}


def test_async_save_matches_sync_bytes(tmp_path):
    sync_dir = os.path.join(tmp_path, "sync")
    async_dir = os.path.join(tmp_path, "async")
    save_checkpoint(sync_dir, _payload())

    saver = AsyncSaver()
    saver.save(async_dir, _payload(),
               post=lambda h: {**h, "step": np.int32(h["step"])})
    saver.wait()

    a, b = load_checkpoint(sync_dir), load_checkpoint(async_dir)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_async_saver_serializes_and_reraises(tmp_path):
    saver = AsyncSaver()

    def boom(host):
        raise ValueError("disk gone")

    saver.save(os.path.join(tmp_path, "bad"), _payload(), post=boom)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        saver.wait()
    # the error is consumed: the saver is reusable afterwards
    saver.save(os.path.join(tmp_path, "ok"), _payload())
    saver.wait()
    assert is_committed_checkpoint(os.path.join(tmp_path, "ok"))


def test_latest_checkpoint_skips_interrupted_tmp(tmp_path):
    run = os.path.join(tmp_path, "run")
    good = os.path.join(run, "checkpoints_010")
    save_checkpoint(good, _payload())
    # a killed Orbax save leaves an uncommitted tmp dir that sorts AFTER
    # the committed one — discovery must not pick it
    tmp_leftover = os.path.join(
        run, "checkpoints_020.orbax-checkpoint-tmp-1234")
    os.makedirs(tmp_leftover)
    assert latest_checkpoint(run, r"checkpoints_\d+") == good
    assert not is_committed_checkpoint(tmp_leftover)
    assert is_committed_checkpoint(good)
