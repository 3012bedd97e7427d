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

Each mode runs in its OWN subprocess: a fresh process releases all device
buffers and jit executables between variants (a single-process sweep
accumulated enough live HBM to RESOURCE_EXHAUST the chip on mode 3).

Timing is a dependency chain: N chunks dispatched back-to-back (each
consumes the previous chunk's donated state), one fetch at the end.
Per-chunk fetches measured 0 ms on the tunneled axon platform — small
outputs appear to be streamed before execution completes — while a chain
bounded by one final fetch cannot finish early.

Writes a JSON report to stdout and PROFILE_CYCLEGAN.json in the repo root.

Usage: python scripts/profile_cyclegan.py [--iters 3] [--modes none,blocks,full,fused,bf16params,fused_bf16params]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def run_mode(mode: str, iters: int, K: int, trace: str | None) -> dict:
    """Time one step variant. Modes: remat levels ("none"/"blocks"/"full"),
    "fused" (fused_applications: gen 3B-batch + disc 2B-batch forwards),
    "bf16params" (all float32 state — params, Adam moments, pools — cast to
    bfloat16; halves parameter+optimizer HBM traffic at a numerics cost,
    measured for throughput only), and "fused_bf16params" (both)."""
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from semtpu.train.cyclegan import CycleGANTrainer, CycleGANConfig
    from semtpu.data.dataset import as_device_images

    bs = 5
    rng = np.random.default_rng(0)
    a = (rng.random((40, 384, 384)) * 255).astype(np.uint8)
    b = ((rng.random((40, 384, 384)) > 0.7) * 255).astype(np.uint8)

    remat = mode if mode in ("none", "blocks", "full") else "none"
    tr = CycleGANTrainer(CycleGANConfig(scan_steps=K, remat=remat,
                                        fused_applications="fused" in mode))
    tr.create_state(steps_per_epoch=32)
    if "bf16params" in mode:
        tr.state = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tr.state)
    dev_a = as_device_images(a, tr.mesh, dict(normalization_range=(-1, 1)))
    dev_b = as_device_images(b, tr.mesh,
                             dict(normalization_range=(-1, 1), threshold=0.5))
    ia = jnp.asarray(rng.integers(0, 40, (K, bs)))
    ib = jnp.asarray(rng.integers(0, 40, (K, bs)))
    ks = jnp.asarray(rng.integers(0, 2**32, (K, 2), dtype=np.uint32))

    def chunk():
        s, m = tr.train_steps_scan(tr.state, dev_a, dev_b, ia, ib, ks)
        tr.state = s
        return m

    t0 = time.time()
    m = chunk()
    np.asarray(m)                 # force completion of the warm-up chunk
    compile_s = time.time() - t0

    # timed chain: each chunk depends on the previous state; one fetch at
    # the end bounds the whole chain (device execution is serial anyway)
    t0 = time.time()
    for _ in range(iters):
        m = chunk()
    np.asarray(m)
    total = time.time() - t0
    dt = total / (iters * K)
    entry = {"s_per_step": round(dt, 4), "compile_s": round(compile_s, 1),
             "iters": iters, "scan_steps": K,
             "device": str(jax.devices()[0])}

    try:
        # reuse the SAME jit target (static self is arg 0) so cost analysis
        # hits the existing executable instead of compiling a second one
        lowered = type(tr).train_steps_scan.lower(
            tr, tr.state, dev_a, dev_b, ia, ib, ks)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        # XLA cost analysis counts a lax.scan body ONCE regardless of trip
        # count, so the whole-chunk cost already IS the per-step cost (plus
        # negligible prologue) — do NOT divide by K
        entry["flops_per_step"] = cost.get("flops", 0)
        entry["bytes_per_step"] = cost.get("bytes accessed", 0)
        entry["tflops_per_s"] = round(entry["flops_per_step"] / dt / 1e12, 1)
        entry["apparent_tb_per_s"] = round(
            entry["bytes_per_step"] / dt / 1e12, 3)
    except Exception as e:           # noqa: BLE001 - report, don't die
        entry["cost_analysis_error"] = str(e)

    if trace:
        try:
            with jax.profiler.trace(trace):
                np.asarray(chunk())
            entry["trace_dir"] = trace
        except Exception as e:       # noqa: BLE001
            entry["trace_error"] = str(e)
    return entry


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--scan-steps", type=int, default=8)
    p.add_argument("--modes", default="none,blocks,full")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace of that mode's step")
    p.add_argument("--single", default=None, help=argparse.SUPPRESS)
    p.add_argument("--out", default=None, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.single:                   # child: one mode, write partial JSON
        entry = run_mode(args.single, args.iters, args.scan_steps, args.trace)
        with open(args.out, "w") as fh:
            json.dump(entry, fh)
        print(f"mode={args.single}: {entry['s_per_step']*1000:.0f} ms/step "
              f"(compile {entry['compile_s']:.0f}s)", flush=True)
        return

    # merge into the existing report so measuring a new variant does not
    # drop previously-measured ones (the JSON is cited by RESULTS.md)
    report_path = os.path.join(REPO, "PROFILE_CYCLEGAN.json")
    report = {"scan_steps": args.scan_steps, "batch": 5}
    if os.path.exists(report_path):
        try:
            with open(report_path) as fh:
                report.update(json.load(fh))
        except Exception:
            pass

    def key_for(mode):
        return f"remat_{mode}" if mode in ("none", "blocks", "full") else mode

    for mode in args.modes.split(","):
        out = f"/tmp/profile_cyclegan_{mode}.json"
        cmd = [sys.executable, os.path.abspath(__file__), "--single", mode,
               "--iters", str(args.iters), "--scan-steps",
               str(args.scan_steps), "--out", out]
        if args.trace:
            cmd += ["--trace", os.path.join(args.trace, mode)]
        r = subprocess.run(cmd, timeout=3600)
        if r.returncode == 0 and os.path.exists(out):
            with open(out) as fh:
                report[key_for(mode)] = json.load(fh)
        else:
            report[key_for(mode)] = {"error": f"rc={r.returncode}"}

    base = report.get("remat_none", {}).get("s_per_step")
    for mode in ("blocks", "full", "fused", "bf16params", "fused_bf16params"):
        e = report.get(key_for(mode))
        if e and base and "s_per_step" in e:
            e["speedup_vs_none"] = round(base / e["s_per_step"], 3)

    with open(os.path.join(REPO, "PROFILE_CYCLEGAN.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    print("-> PROFILE_CYCLEGAN.json")


if __name__ == "__main__":
    main()
