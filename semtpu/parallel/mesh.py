"""Device mesh + sharding helpers — the framework's parallelism story.

The reference's only parallelism dimension is data parallelism via
`keras.distribution.DataParallel` (`WassersteinGAN.py:318-326`,
`CycleGAN.py:49-57`, `UNet_Segmentation.py:190-198`, SURVEY.md §2.7). Here
that becomes the idiomatic JAX equivalent: a 1-D `jax.sharding.Mesh` over
all local devices with batches sharded on the 'data' axis and parameters
replicated. Train steps are plain `jax.jit`s with NamedSharding-annotated
inputs — XLA's sharding propagation inserts the gradient all-reduce over
ICI automatically; no hand-written collectives needed at these model sizes.

Multi-host (DCN) extension: build the mesh from `jax.devices()` across
processes and feed per-host shards via
`jax.make_array_from_process_local_data`; the train steps are unchanged.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding (first axis split across the mesh)."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch on the mesh, sharded along the leading axis.

    Pads the batch up to a multiple of the mesh size is NOT done here —
    callers keep batch sizes divisible by the device count (the trainers
    enforce this when building datasets).
    """
    sharding = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh.

    Single-device meshes upload via the packed path (one transfer per
    dtype instead of per-leaf round-trips — utils/transfer.py; pipeline
    step 4 loads six ~1.1 GB checkpoints through the tunnel); multi-device
    meshes use the plain leafwise put.
    """
    from semtpu.utils.transfer import put_packed
    return put_packed(tree, replicated_sharding(mesh))
