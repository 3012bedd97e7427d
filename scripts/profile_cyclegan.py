"""CycleGAN roofline experiment: measure the step, then try to cut traffic.

Round-2 claimed the train step is pinned to the HBM roofline from XLA cost
analysis alone (whose byte counts overcount fused reuse — the estimate
exceeded physical peak). This script measures instead of estimating:

1. times the K-step scanned train step at full shapes (384^2, bs 5, bf16)
   for remat = none / blocks / full (activation rematerialization trades
   recompute FLOPs for activation traffic — the right direction iff the
   step is really bandwidth-bound),
2. records XLA cost analysis (flops, bytes accessed) per variant,
3. optionally captures a jax.profiler trace (--trace DIR) for inspection.

Writes a JSON report to stdout and PROFILE_CYCLEGAN.json in the repo root.

Usage: python scripts/profile_cyclegan.py [--iters 3] [--modes none,blocks,full]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--scan-steps", type=int, default=8)
    p.add_argument("--modes", default="none,blocks,full")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace of the 'none' step")
    args = p.parse_args(argv)

    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from semtpu.train.cyclegan import CycleGANTrainer, CycleGANConfig
    from semtpu.data.dataset import as_device_images

    K, bs = args.scan_steps, 5
    rng = np.random.default_rng(0)
    a = (rng.random((40, 384, 384)) * 255).astype(np.uint8)
    b = ((rng.random((40, 384, 384)) > 0.7) * 255).astype(np.uint8)

    report = {"device": str(jax.devices()[0]), "scan_steps": K, "batch": bs}

    for mode in args.modes.split(","):
        tr = CycleGANTrainer(CycleGANConfig(scan_steps=K, remat=mode))
        tr.create_state(steps_per_epoch=32)
        dev_a = as_device_images(a, tr.mesh, dict(normalization_range=(-1, 1)))
        dev_b = as_device_images(b, tr.mesh,
                                 dict(normalization_range=(-1, 1), threshold=0.5))
        ia = jnp.asarray(rng.integers(0, 40, (K, bs)))
        ib = jnp.asarray(rng.integers(0, 40, (K, bs)))
        ks = jnp.asarray(rng.integers(0, 2**32, (K, 2), dtype=np.uint32))

        def chunk():
            s, m = tr.train_steps_scan(tr.state, dev_a, dev_b, ia, ib, ks)
            tr.state = s
            # synchronize via a host transfer: on the tunneled axon platform
            # block_until_ready() returns before execution finishes (measured
            # 0 ms/step for a 27-TFLOP step), while a device->host fetch of
            # the metrics cannot complete early.
            return np.asarray(m)

        t0 = time.time()
        chunk()                                   # compile + warm
        compile_s = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            chunk()
            times.append(time.time() - t0)
        dt = min(times) / K
        entry = {"s_per_step": round(dt, 4), "compile_s": round(compile_s, 1)}
        try:
            lowered = jax.jit(lambda s, a_, b_, k: tr.train_steps_scan(
                s, dev_a, dev_b, a_, b_, k)).lower(tr.state, ia, ib, ks)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            entry["flops_per_step"] = cost.get("flops", 0) / K
            entry["bytes_per_step"] = cost.get("bytes accessed", 0) / K
            entry["tflops_per_s"] = round(entry["flops_per_step"] / dt / 1e12, 1)
            entry["apparent_tb_per_s"] = round(
                entry["bytes_per_step"] / dt / 1e12, 3)
        except Exception as e:           # noqa: BLE001 - report, don't die
            entry["cost_analysis_error"] = str(e)
        report[f"remat_{mode}"] = entry
        print(f"remat={mode}: {dt*1000:.0f} ms/step "
              f"(compile {compile_s:.0f}s)", flush=True)

        if args.trace and mode == "none":
            try:
                with jax.profiler.trace(args.trace):
                    chunk()
                entry["trace_dir"] = args.trace
            except Exception as e:       # noqa: BLE001
                entry["trace_error"] = str(e)

    base = report.get("remat_none", {}).get("s_per_step")
    for mode in ("blocks", "full"):
        e = report.get(f"remat_{mode}")
        if e and base:
            e["speedup_vs_none"] = round(base / e["s_per_step"], 3)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_CYCLEGAN.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
