"""Failure-detecting runner for long pipeline stages on a flaky TPU tunnel.

The tunneled-TPU failure mode is a WEDGE, not a crash: device calls hang
forever (observed outages: round 2 ~45 min; round 3 twice in one evening).
Combined with the pipeline's bit-identical mid-run auto-resume
(`--cyclegan-resume` / `--unet-resume`), recovery is mechanical — this
script automates it:

- launches the given pipeline command (unbuffered, logging to --log);
- watches progress = newest mtime across the run dir AND the log file;
- declares a wedge only when progress is stale past --stale-minutes AND a
  probe op on the device SUCCEEDS from a fresh process (tunnel healthy,
  process hung. A hanging probe is ambiguous — a big checkpoint upload
  queues probes behind it — so then it just keeps waiting);
- on wedge: kill the process, relaunch the same command — step 3/6a
  auto-resume from their newest mid-run checkpoint, other steps redo
  cheaply;
- exits 0 when the pipeline completes; a nonzero exit (e.g. device init
  failing DURING an outage) is retried after a 5-minute backoff, up to
  --max-retries total relaunches.

Usage:
  python scripts/run_with_retry.py --root-dir RUN_DIR --log RUN_DIR/pipeline.log \
      [--stale-minutes 15] [--grace-minutes 30] [--max-retries 10] \
      -- python -m semtpu.pipeline --root-dir RUN_DIR ...
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def newest_mtime(paths: list[str]) -> float:
    """Most recent mtime of any file under the given files/trees."""
    newest = 0.0
    for p in paths:
        if os.path.isfile(p):
            newest = max(newest, os.path.getmtime(p))
        for dirpath, _dirnames, filenames in os.walk(p):
            for f in filenames:
                try:
                    newest = max(newest,
                                 os.path.getmtime(os.path.join(dirpath, f)))
                except OSError:
                    pass
    return newest


def probe_device(timeout_s: int = 240) -> bool:
    """True iff a tiny op on the default device completes from a fresh
    process within the timeout."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.ones(()) * 2))"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root-dir", required=True)
    p.add_argument("--log", required=True)
    p.add_argument("--stale-minutes", type=float, default=15.0,
                   help="no file writes for this long = candidate wedge "
                        "(must exceed the longest legitimately quiet phase; "
                        "checkpoint restores are covered by --grace-minutes)")
    p.add_argument("--grace-minutes", type=float, default=30.0,
                   help="no wedge checks this long after each (re)launch "
                        "(covers the slow full-checkpoint restore)")
    p.add_argument("--poll-seconds", type=float, default=120.0)
    p.add_argument("--max-retries", type=int, default=10)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- followed by the pipeline command")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given after --")
    if os.path.basename(cmd[0]).startswith("python"):
        cmd = [cmd[0], "-u"] + cmd[1:]     # unbuffered: log mtime == progress

    def note(msg):
        print(f"[run_with_retry {time.strftime('%H:%M:%S')}] {msg}",
              flush=True)

    retries = 0
    while True:
        logf = open(args.log, "a")
        proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT)
        note(f"launched pid {proc.pid}: {' '.join(cmd)}")
        grace_until = time.time() + args.grace_minutes * 60
        wedged = False
        while True:
            rc = proc.poll()
            if rc is not None:
                note(f"pipeline exited rc={rc}")
                logf.close()
                if rc == 0:
                    return 0
                retries += 1
                if retries > args.max_retries:
                    note(f"giving up after {args.max_retries} retries")
                    return rc
                note(f"nonzero exit — relaunching after 5 min backoff "
                     f"(retry {retries}/{args.max_retries})")
                time.sleep(300)
                break
            time.sleep(args.poll_seconds)
            if time.time() < grace_until:
                continue
            stale_s = time.time() - newest_mtime([args.root_dir, args.log])
            if stale_s < args.stale_minutes * 60:
                continue
            note(f"no progress for {stale_s/60:.1f} min — probing device")
            if probe_device():
                note("probe OK but run is stale: process wedged, killing")
                wedged = True
            else:
                note("probe hangs too (tunnel down or upload in flight) — "
                     "waiting")
                continue
            proc.kill()
            proc.wait()
            logf.close()
            break
        if not wedged:
            continue
        retries += 1
        if retries > args.max_retries:
            note(f"giving up after {args.max_retries} retries")
            return 17
        note(f"relaunching (retry {retries}/{args.max_retries}); steps 3/6a "
             f"auto-resume from their newest checkpoint")


if __name__ == "__main__":
    sys.exit(main())
