"""Aggregate eval summaries across seeds into a mean +- spread table.

VERDICT r2 item 2 asks for run-to-run variance of the full GAN pipeline
(reference README.md:47 reports one mostly unseeded run): the bar should be
met by the *mean* across seeds, not one lucky checkpoint. This script reads
the per-seed eval_summary JSONs (written by scripts/eval_run.py, reference
protocol from Archive/Other Scripts/Calculate_Scores.py:176-272), prints a
markdown table of mean +- half-range per headline metric vs BASELINE, and
writes SEED_VARIANCE.json at the repo root.

Usage:
    python scripts/seed_variance_report.py \
        run_r2/eval_summary_v2aug0.json run_s1/eval_summary.json \
        run_s2/eval_summary.json [--ensemble ens_seeds/eval_summary.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

METRICS = [
    ("iou_whole", "IoU (whole image)"),
    ("iou_instance_all", "IoU (instance, all)"),
    ("iou_instance_gt9px", "IoU (instance, >9 px)"),
    ("youden", "Youden J"),
]
BASELINE = {"iou_whole": 0.8762, "iou_instance_all": 0.5750, "youden": 0.9120}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("summaries", nargs="+", help="per-seed eval_summary JSON paths")
    p.add_argument("--ensemble", action="append", default=[],
                   help="cross-seed ensemble eval_summary JSON(s); repeatable, "
                        "missing paths are skipped with a note")
    p.add_argument("--out", default="SEED_VARIANCE.json")
    args = p.parse_args(argv)

    runs = []
    seen = set()
    for path in args.summaries:
        name = os.path.dirname(path) or path
        if name in seen:  # two summaries from one run dir: disambiguate
            tag = os.path.splitext(os.path.basename(path))[0]
            name = f"{name}/{tag.replace('eval_summary_', '')}"
        seen.add(name)
        with open(path) as f:
            runs.append((name, json.load(f)))
    ensembles = []
    for path in args.ensemble:
        if os.path.exists(path):
            with open(path) as f:
                ensembles.append((os.path.basename(path), json.load(f)))
        else:
            print(f"note: ensemble summary {path} not found — skipped")

    # the summaries embed the reference numbers they were scored against
    # (eval_run.py writes baseline_v120); fall back to the module constant
    emb = runs[0][1].get("baseline_v120", {})
    baseline = {"iou_whole": emb.get("iou_whole", BASELINE["iou_whole"]),
                "iou_instance_all": emb.get("iou_instance",
                                            BASELINE["iou_instance_all"]),
                "youden": emb.get("youden", BASELINE["youden"])}

    report = {"runs": {name: s for name, s in runs}, "n_seeds": len(runs),
              "baseline_v120": baseline, "mean": {}, "spread": {}, "min": {},
              "max": {}}
    lines = ["| Metric | " + " | ".join(name for name, _ in runs)
             + " | mean +- spread | reference |",
             "|---|" + "---|" * (len(runs) + 2)]
    for key, label in METRICS:
        vals = [s[key] for _, s in runs if key in s]
        if not vals:
            continue
        mean = sum(vals) / len(vals)
        half = (max(vals) - min(vals)) / 2.0
        report["mean"][key] = round(mean, 4)
        report["spread"][key] = round(half, 4)
        report["min"][key] = min(vals)
        report["max"][key] = max(vals)
        ref = baseline.get(key)
        mark = ""
        if ref is not None:
            mark = " **(beats)**" if mean >= ref else f" ({mean - ref:+.4f})"
        lines.append(
            f"| {label} | " + " | ".join(f"{v:.4f}" for v in vals)
            + f" | {mean:.4f} +- {half:.4f} | "
            + (f"{ref:.4f}{mark}" if ref is not None else "--") + " |")
    if ensembles:
        report["ensembles"] = {name: s for name, s in ensembles}
        for name, ens in ensembles:
            lines.append(f"| ensemble {name} | "
                         + " | ".join("" for _ in runs)
                         + f" | IoU {ens.get('iou_whole', float('nan')):.4f} / "
                           f"inst {ens.get('iou_instance_all', float('nan')):.4f} / "
                           f"Youden {ens.get('youden', float('nan')):.4f} | |")

    table = "\n".join(lines)
    print(table)
    report["markdown"] = table
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
