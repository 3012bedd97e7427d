"""Ensemble-average raw UNet probability maps from several runs, then score.

Averages the `*_raw.tif` maps (float32 probabilities in [0, 1] — the
UNet's raw-output contract) of two or
more `Output_Masks_UNet*` directories — e.g. UNet variants trained on the
same renders, or models from independent seeds whose CycleGANs rendered
different synthetic domains — into one predictions directory, then runs
the standard reference-protocol sweep (`scripts/eval_run.py`) on it.

Cross-seed ensembling is extra capability beyond reference parity: each
seed's render domain induces different systematic segmentation errors, so
averaging attacks the render-domain gap that single-model selection
cannot (RESULTS.md "Ensembling" section).

Usage:
  python scripts/ensemble_eval.py RUN_DIR OUT_NAME PRED_DIR [PRED_DIR ...]
      [--gt GT] [--gt-suffix S]

Writes RUN_DIR/OUT_NAME/<stem>_raw.tif and scores with
`eval_run RUN_DIR --predictions RUN_DIR/OUT_NAME`.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("out_name")
    p.add_argument("pred_dirs", nargs="+")
    p.add_argument("--gt", default=None)
    p.add_argument("--gt-suffix", default=None)
    p.add_argument("--mode", choices=("mean", "median"), default="mean",
                   help="per-pixel combiner; median is more robust to one "
                        "outlier seed when ensembling 3+ runs")
    p.add_argument("--no-eval", action="store_true",
                   help="only write the combined maps, skip the score sweep")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend for the score sweep "
                        "(tunnel-outage fallback)")
    args = p.parse_args(argv)

    from PIL import Image

    out_dir = os.path.join(args.run_dir, args.out_name)
    os.makedirs(out_dir, exist_ok=True)
    stems = sorted(f[:-8] for f in os.listdir(args.pred_dirs[0])
                   if f.endswith("_raw.tif"))
    if not stems:
        raise FileNotFoundError(f"no *_raw.tif under {args.pred_dirs[0]}")
    for stem in stems:
        maps = []
        for d in args.pred_dirs:
            raw = np.array(Image.open(os.path.join(d, stem + "_raw.tif")),
                           np.float32)
            if raw.max() > 1.5:   # foreign uint8 0-255 map: bring to [0,1]
                raw = raw / 255.0
            maps.append(raw)
        # _raw.tif maps are float32 probabilities in [0,1] (the UNet's raw
        # output contract) — combine in float and keep the dtype
        stack = np.stack(maps)
        comb = (np.median(stack, axis=0) if args.mode == "median"
                else stack.mean(axis=0)).astype(np.float32)
        Image.fromarray(comb).save(os.path.join(out_dir, stem + "_raw.tif"))
    print(f"{args.mode}-combined {len(stems)} maps from "
          f"{len(args.pred_dirs)} dirs -> {out_dir}")

    if args.no_eval:
        return 0

    import eval_run
    ev = [args.run_dir, "--predictions", out_dir,
          "--summary-name", f"eval_summary_{args.out_name}.json"]
    if args.cpu:
        ev += ["--cpu"]
    if args.gt:
        ev += ["--gt", args.gt]
    if args.gt_suffix is not None:
        ev += ["--gt-suffix", args.gt_suffix]
    eval_run.main(ev)


if __name__ == "__main__":
    main()
