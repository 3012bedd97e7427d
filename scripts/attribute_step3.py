"""Attribute a run's step-3 (CycleGAN) wall-clock: compute vs save overhead.

Step 3 is ~72% of end-to-end wall-clock, so silent drift there matters
(round-4 VERDICT: run_t0 took 8,328 s vs round 2's 7,130 s at identical
budgets and an identical measured 0.713 s/step roofline). This script makes
the attribution reproducible from committed artifacts alone:

- the per-epoch `seconds` column of `training_log.csv` times ONLY the
  jitted training scan (fenced inside the epoch loop, train/cyclegan.py),
  so `sum(seconds)` is the compute floor;
- everything else in `timings.txt`'s step-3 line is outside-loop overhead:
  cadence checkpoint saves, monitor renders, the final model save;
- checkpoint directory mtimes date each cadence save's completion, so the
  cumulative overhead at each cadence (wall at save-complete minus epoch
  seconds accrued by then) splits the overhead into per-cadence deltas,
  and the min/max file mtime inside a checkpoint dir bounds the host
  write window (the remainder of a delta is the device->host fetch plus
  any monitor render on the same cadence).

Usage: python scripts/attribute_step3.py RUN_DIR [RUN_DIR ...]
Prints one JSON line per run (and a human table to stderr).

The reference has no analogue (saves Keras models GPU-locally,
`Releases/Version 1.2.0/CycleGAN.py:203-204`); on a tunneled TPU the
transfers are first-class costs — see semtpu/utils/transfer.py.
"""
import csv
import datetime
import glob
import json
import os
import re
import sys


def walk_mtimes(d):
    return [os.path.getmtime(os.path.join(r, f))
            for r, _, fs in os.walk(d) for f in fs]


def attribute(run_dir):
    mdirs = sorted(glob.glob(os.path.join(run_dir, "2_CycleGAN/Models/*")))
    mdirs = [d for d in mdirs
             if os.path.isfile(os.path.join(d, "training_log.csv"))]
    if not mdirs:
        return {"run": run_dir, "error": "no CycleGAN model dir"}
    mdir = mdirs[-1]
    start = datetime.datetime.strptime(
        os.path.basename(mdir), "%Y-%m-%d_%H-%M-%S")
    with open(os.path.join(mdir, "training_log.csv")) as fh:
        secs = [float(r["seconds"]) for r in csv.DictReader(fh, delimiter=";")]

    cadences = []
    prev_overhead = 0.0
    for d in sorted(glob.glob(os.path.join(mdir, "checkpoints_*"))):
        k = int(re.search(r"checkpoints_(\d+)", d).group(1))
        mts = walk_mtimes(d)
        if not mts or k > len(secs):
            continue
        wall_done = (datetime.datetime.fromtimestamp(max(mts))
                     - start).total_seconds()
        overhead = wall_done - sum(secs[:k])
        cadences.append({"epoch": k,
                         "cum_overhead_s": round(overhead, 1),
                         "delta_s": round(overhead - prev_overhead, 1),
                         "write_window_s": round(max(mts) - min(mts), 1)})
        prev_overhead = overhead

    out = {"run": run_dir, "epochs": len(secs),
           "epoch_seconds_sum": round(sum(secs), 1),
           "epoch_seconds_median": round(
               sorted(secs[1:])[len(secs[1:]) // 2], 1) if len(secs) > 1
           else None,
           "epoch0_compile_s": round(secs[0], 1) if secs else None,
           "cadence_saves": cadences}

    model_dir = os.path.join(mdir, "model")
    if os.path.isdir(model_dir):
        mts = walk_mtimes(model_dir)
        if mts:
            out["final_save_cum_overhead_s"] = round(
                (datetime.datetime.fromtimestamp(max(mts))
                 - start).total_seconds() - sum(secs), 1)

    timings = os.path.join(run_dir, "timings.txt")
    if os.path.isfile(timings):
        for line in open(timings):
            m = re.search(r"step 3 ([0-9.]+) s", line)
            if m:
                step3 = float(m.group(1))
                out["step3_total_s"] = step3
                out["outside_loop_s"] = round(step3 - sum(secs), 1)
    return out


def main():
    runs = sys.argv[1:] or ["run_t0"]
    for run in runs:
        res = attribute(run)
        print(json.dumps(res))
        if "error" not in res:
            print(f"-- {run}: epochs sum {res['epoch_seconds_sum']}s"
                  f" (median {res['epoch_seconds_median']}s/epoch),"
                  f" step-3 total {res.get('step3_total_s', '?')}s,"
                  f" outside-loop {res.get('outside_loop_s', '?')}s over"
                  f" {len(res['cadence_saves'])} cadence saves",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
