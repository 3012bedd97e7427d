"""Exactness oracles for the packed host<->device transfer paths.

fetch_packed / put_packed (semtpu/utils/transfer.py) claim bit-identity
with leafwise jax.device_get / jax.device_put — they only relayout the
transfer. These tests pin that on mixed-dtype many-leaf pytrees, including
the trainer-state shapes that motivated them (checkpoint saves/loads
through the tunnel), plus the small-tree fallback and non-jax passthrough.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semtpu.parallel.mesh import get_mesh, replicate
from semtpu.utils.transfer import fetch_packed, put_packed


def _mixed_tree(rng, n_per_dtype=6):
    tree = {}
    for name, dt in [("f32", np.float32), ("bf16", jnp.bfloat16),
                     ("i32", np.int32), ("u8", np.uint8)]:
        tree[name] = {
            f"leaf{i}": jnp.asarray(
                (rng.random((i + 1, 3 + i)) * 100).astype(np.float32)
            ).astype(dt)
            for i in range(n_per_dtype)}
    tree["scalar_step"] = jnp.asarray(7, jnp.int32)
    tree["empty"] = jnp.zeros((0, 4), jnp.float32)
    tree["host_int"] = np.int32(3)          # non-jax leaf: passthrough
    return tree


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.dtype(x.dtype) == np.dtype(y.dtype)
        np.testing.assert_array_equal(
            np.asarray(x, dtype=np.float32 if x.dtype == jnp.bfloat16 else None),
            np.asarray(y, dtype=np.float32 if y.dtype == jnp.bfloat16 else None))


def test_fetch_packed_matches_device_get():
    tree = _mixed_tree(np.random.default_rng(0))
    _assert_trees_equal(fetch_packed(tree), jax.device_get(tree))


def test_fetch_packed_small_tree_fallback():
    tree = {"a": jnp.arange(4.0), "b": jnp.arange(3)}
    _assert_trees_equal(fetch_packed(tree), jax.device_get(tree))


def test_put_packed_roundtrip():
    host = jax.device_get(_mixed_tree(np.random.default_rng(1)))
    dev = put_packed(host)
    assert all(isinstance(l, jax.Array) for l in jax.tree.leaves(dev))
    _assert_trees_equal(jax.device_get(dev), host)


def test_put_packed_single_device():
    host = jax.device_get(_mixed_tree(np.random.default_rng(2)))
    d = jax.devices()[0]
    dev = put_packed(host, d)
    for leaf in jax.tree.leaves(dev):
        assert leaf.devices() == {d}
    _assert_trees_equal(jax.device_get(dev), host)


def test_replicate_multi_device_mesh_unchanged():
    """On the 8-device mesh, replicate must still produce the replicated
    NamedSharding (packed path is single-device-only)."""
    mesh = get_mesh()
    host = jax.device_get(_mixed_tree(np.random.default_rng(3)))
    dev = replicate(host, mesh)
    for leaf in jax.tree.leaves(dev):
        assert leaf.sharding.is_fully_replicated
    _assert_trees_equal(jax.device_get(dev), host)


def test_replicate_single_device_mesh_packed():
    mesh = get_mesh(jax.devices()[:1])
    host = jax.device_get(_mixed_tree(np.random.default_rng(4)))
    dev = replicate(host, mesh)
    for leaf in jax.tree.leaves(dev):
        assert leaf.devices() == {jax.devices()[0]}
    _assert_trees_equal(jax.device_get(dev), host)


def test_fetch_packed_trainer_state_shape():
    """Optimizer-bearing nested state (namedtuple-ish) with shared dtypes."""
    import optax
    params = {"dense": {"kernel": jnp.ones((32, 64)), "bias": jnp.zeros(64)},
              "conv": {"kernel": jnp.full((3, 3, 4, 8), 0.5)}}
    opt = optax.adam(1e-3).init(params)
    tree = {"params": params, "opt": opt, "step": jnp.asarray(5, jnp.int32)}
    got, want = fetch_packed(tree), jax.device_get(tree)
    assert jax.tree.structure(got) == jax.tree.structure(want)
    _assert_trees_equal(got, want)
