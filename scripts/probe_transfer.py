"""Measure leafwise vs packed host<->device transfer through the tunnel.

Builds a synthetic pytree shaped like the CycleGAN checkpoint state (many
small/medium leaves, mixed dtypes) and times `jax.device_get` /
`jax.device_put` against `fetch_packed` / `put_packed`
(semtpu/utils/transfer.py). Writes PROBE_TRANSFER.json.

Sized at ~1/4 of the real ~1.1 GB state so it is safe to run alongside
other device work; the per-leaf overhead model (time = a*leaves +
bytes/bw) extrapolates to the full state.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from semtpu.utils.transfer import fetch_packed, put_packed


def build_tree(rng, n_leaves, total_bytes):
    """n_leaves leaves, log-uniform sizes summing to ~total_bytes, 70/30
    f32/bf16 by count (Adam moments dominate real states)."""
    raw = rng.uniform(0.0, 1.0, n_leaves)
    w = np.exp(3 * raw)
    w = w / w.sum()
    tree = {}
    for i, frac in enumerate(w):
        dt = jnp.bfloat16 if i % 10 >= 7 else jnp.float32
        itemsize = 2 if dt == jnp.bfloat16 else 4
        n = max(int(frac * total_bytes) // itemsize, 1)
        tree[f"leaf{i:04d}"] = jnp.asarray(
            rng.standard_normal(n).astype(np.float32)).astype(dt)
    return tree


def timed(fn, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        leaves = jax.tree.leaves(out)
        if leaves and isinstance(leaves[0], jax.Array):
            jax.block_until_ready(leaves)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=640)
    ap.add_argument("--mbytes", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="PROBE_TRANSFER.json")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    tree = build_tree(rng, args.leaves, args.mbytes * (1 << 20))
    jax.block_until_ready(jax.tree.leaves(tree))
    nbytes = sum(l.nbytes for l in jax.tree.leaves(tree))

    # device -> host
    t_leaf, host = timed(lambda: jax.device_get(tree), args.iters)
    t_pack, host_p = timed(lambda: fetch_packed(tree), args.iters)
    for k in host:
        np.testing.assert_array_equal(
            np.asarray(host[k], np.float32), np.asarray(host_p[k], np.float32))

    # host -> device
    p_leaf, _ = timed(lambda: jax.device_put(host), args.iters)
    p_pack, dev_p = timed(lambda: put_packed(host), args.iters)
    for k in host:
        np.testing.assert_array_equal(
            np.asarray(host[k], np.float32),
            np.asarray(jax.device_get(dev_p[k]), np.float32))

    res = {
        "platform": jax.devices()[0].platform,
        "leaves": args.leaves,
        "mbytes": round(nbytes / (1 << 20), 1),
        "fetch_leafwise_s": round(t_leaf, 3),
        "fetch_packed_s": round(t_pack, 3),
        "fetch_speedup": round(t_leaf / t_pack, 2),
        "put_leafwise_s": round(p_leaf, 3),
        "put_packed_s": round(p_pack, 3),
        "put_speedup": round(p_leaf / p_pack, 2),
    }
    print(json.dumps(res))
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
