"""Benchmark: UNet tiled-inference throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: tiles/sec/chip through the flagship MultiRes-UNet (16 filters,
384x384 tiles, bfloat16 compute) — the pipeline's serving hot path
(BASELINE.json tracks "inference tiles/sec/chip").

vs_baseline: speedup over the *reference's execution pattern* measured on
the SAME chip — a per-tile batch-size-1 loop with a host round-trip per
tile, which is exactly how the reference serves tiles
(`Releases/Version 1.2.0/UNet_Segmentation.py:339`, `CycleGAN.py:273`).
Same model, same hardware; the ratio isolates the framework's contribution
(batched device-resident tiling vs per-tile dispatch).

Timing notes for this environment: the TPU is reached through a tunnel
where `block_until_ready` does not actually fence execution — only host
readbacks do — so every timed region ends in a scalar fetch. A persistent
compilation cache avoids re-paying the ~3 min remote compile each round.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from semtpu.models.multires_unet import MultiResUNet

    model = MultiResUNet(filters=16, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(partial(model.init, train=False))(
        rng, jnp.zeros((1, 384, 384, 1), jnp.float32))

    # scalar-output forwards so one host fetch fences the whole computation
    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, train=False)))

    BATCH = 72   # 9 tiles/image x 8 images
    xb = jnp.asarray(np.random.default_rng(0).random((BATCH, 384, 384, 1)),
                     jnp.float32)

    float(fwd(variables, xb))          # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fwd(variables, xb))
        times.append(time.perf_counter() - t0)
    batched_tiles_per_sec = BATCH / min(times)

    # reference pattern: per-tile bs=1 dispatch, host sync per tile
    float(fwd(variables, xb[:1]))      # compile bs=1
    t0 = time.perf_counter()
    N1 = 10
    for i in range(N1):
        float(fwd(variables, xb[i:i + 1]))
    ref_tiles_per_sec = N1 / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "unet_tiled_inference_tiles_per_sec_per_chip",
        "value": round(batched_tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(batched_tiles_per_sec / ref_tiles_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
