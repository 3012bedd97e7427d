"""Score-sweep CLI — `python -m semtpu.eval` (Calculate_Scores.py parity).

For every model subdirectory under --input-dir (each holding predicted
masks), sweeps thresholds 0.0..1.0 against --ground-truth-dir and writes
the reference's CSV outputs (`Archive/Other Scripts/Calculate_Scores.py:275-352`):

- IoUScores_Variable_Threshold[_Watershed][_Filtered].csv
- ROCValues_Variable_Threshold[...].csv  (+ best-Youden block)

The reference parallelizes with mp.Pool over model dirs and runs per-pixel
Python loops; here each segmentation + metric evaluation is a jitted device
computation, so one process suffices.
"""
from __future__ import annotations

import argparse
import os

from semtpu.eval.sweep import evaluate_predictions


def main(argv=None):
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="semtpu.eval", description=__doc__)
    p.add_argument("--input-dir", required=True,
                   help="directory of model subdirectories with predicted masks")
    p.add_argument("--ground-truth-dir", required=True)
    p.add_argument("--output-dir", default=None,
                   help="where to write the CSVs (default: --input-dir parent)")
    p.add_argument("--watershed", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=True)
    p.add_argument("--single-model", action="store_true",
                   help="treat --input-dir itself as one model directory")
    p.add_argument("--topo-metrics", action="store_true",
                   help="also score pixel error / warping error / "
                        "foreground-restricted Rand (ImageJ plugin parity, "
                        "calculate_Metrics.java — slow: warping iterates)")
    p.add_argument("--crop-height", type=int, default=712,
                   help="topo-metric crop (plugin ROI 1024x712)")
    p.add_argument("--crop-width", type=int, default=1024)
    args = p.parse_args(argv)

    out_root = args.output_dir or os.path.dirname(os.path.abspath(args.input_dir))
    suffix = "_Watershed" if args.watershed else "_No_Watershed"
    iou_csv = os.path.join(out_root, f"IoUScores_Variable_Threshold{suffix}.csv")
    roc_csv = os.path.join(out_root, f"ROCValues_Variable_Threshold{suffix}.csv")

    if args.single_model:
        model_dirs = [args.input_dir]
    else:
        model_dirs = [os.path.join(args.input_dir, d)
                      for d in sorted(os.listdir(args.input_dir))
                      if os.path.isdir(os.path.join(args.input_dir, d))]

    iou_rows = ["Model;Average IoU score (Whole Image);At Threshold;"
                "Average IoU score (All Instances);At Threshold;"
                "Average IoU score (Instances > 9 sq.pixel);At Threshold"]
    roc_rows = ["Model;Threshold;True Positves;True Negatives;False Positives;"
                "False Negatives;Youdens Index"]
    youden_rows = ["Model;Best Youdens Index;At Threshold"]

    for d in model_dirs:
        name = os.path.basename(d.rstrip("/"))
        print(f"Evaluating {name}...")
        res = evaluate_predictions(d, args.ground_truth_dir,
                                   do_watershed=args.watershed)
        bw, tw = res.best_iou_whole
        bi, ti = res.best_iou_instance
        bf, tf = res.best_iou_instance_filtered
        by, ty = res.best_youden
        iou_rows.append(f"{name};{bw};{tw};{bi};{ti};{bf};{tf}")
        for i, t in enumerate(res.thresholds):
            roc_rows.append(f"{name};{t};{res.tpr[i]};{res.tnr[i]};"
                            f"{res.fpr[i]};{res.fnr[i]};{res.youden[i]}")
        youden_rows.append(f"{name};{by};{ty}")
        print(f"  IoU(img)={bw:.4f}@{tw} IoU(inst)={bi:.4f}@{ti} "
              f"Youden={by:.4f}@{ty}")

    with open(iou_csv, "a") as fh:
        fh.write("\n".join(iou_rows) + "\n")
    with open(roc_csv, "a") as fh:
        fh.write("\n".join(roc_rows) + "\n\n\n" + "\n".join(youden_rows) + "\n")
    print(f"Wrote {iou_csv} and {roc_csv}")

    if args.topo_metrics:
        topo_csv = os.path.join(out_root, f"TopologyMetrics{suffix}.csv")
        rows = ["Model Name;Minimum Pixel Error;Minimum Warping Error;"
                "Minimum foreground-restricted Rand error;"
                "Minimum foreground-restricted Rand error after thinning"]
        for d in model_dirs:
            name = os.path.basename(d.rstrip("/"))
            print(f"Topology metrics for {name}...")
            vals = topo_scores(d, args.ground_truth_dir,
                               args.crop_height, args.crop_width)
            rows.append(f"{name};" + ";".join(f"{v}" for v in vals))
            print(f"  pixelE={vals[0]:.4f} warpE={vals[1]:.6f} "
                  f"randE={vals[2]:.4f} randE(thin)={vals[3]:.4f}")
        with open(topo_csv, "a") as fh:
            fh.write("\n".join(rows) + "\n")
        print(f"Wrote {topo_csv}")


def topo_scores(pred_dir: str, gt_dir: str, crop_h: int = 712,
                crop_w: int = 1024):
    """Average the ImageJ-plugin topology metrics over the GT set
    (`calculate_Metrics.java:92-150`, ROI-cropped to crop_w x crop_h)."""
    import numpy as np
    from PIL import Image
    from semtpu.eval.topo import (pixel_error_maximal_fscore, warping_error,
                                  foreground_restricted_rand_error)
    gts = sorted(f for f in os.listdir(gt_dir) if f.endswith(".tif"))
    sums = np.zeros(4)
    n = 0
    for g in gts:
        pred_f = os.path.join(pred_dir, g.replace("_m", ""))
        if not os.path.isfile(pred_f):
            continue
        gt = np.array(Image.open(os.path.join(gt_dir, g)))[:crop_h, :crop_w]
        pred = np.array(Image.open(pred_f)).astype(np.float32)[:crop_h, :crop_w]
        sums += [pixel_error_maximal_fscore(pred, gt),
                 warping_error(pred, gt),
                 foreground_restricted_rand_error(pred, gt),
                 foreground_restricted_rand_error(pred, gt, thinning=True)]
        n += 1
    if n == 0:
        raise FileNotFoundError(f"no predictions matching {gt_dir} in {pred_dir}")
    return sums / n


if __name__ == "__main__":
    main()
