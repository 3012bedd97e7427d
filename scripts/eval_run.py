"""Score a finished pipeline run against the 40-image manual ground truth.

Reference protocol (`Archive/Other Scripts/Calculate_Scores.py:176-272`):
threshold sweep 0.0..1.0 with EDT-watershed + 4-connectivity per threshold;
best-threshold whole-image IoU, instance IoU (all / >9 px^2), pixel ROC ->
Youden. Prints a JSON summary and appends the reference-format CSVs.

Optionally (--classifier CKPT_DIR) also reports the classifier
auto-filtered instance IoU at the sweep's best instance threshold
(`Predict_Classes_And_Measure.py:286-288` mask-level analog).

Usage: python scripts/eval_run.py RUN_DIR [--classifier DIR] [--gt GT_DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GT_DEFAULT = ("/root/reference/Datasets/Electron Microscopy Image Masks/"
              "TiO2_Masks_Manual_4connected")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--gt", default=GT_DEFAULT)
    p.add_argument("--classifier", default=None)
    p.add_argument("--classifier-threshold", type=float, default=0.5)
    p.add_argument("--classifier-sweep", default=None,
                   help="comma-separated score thresholds to sweep (one "
                        "classifier forward per image; writes "
                        "classifier_threshold_sweep.csv), e.g. "
                        "'0.05,0.1,0.15,0.2,0.3,0.4,0.5'")
    p.add_argument("--classifier-calibrate", action="store_true",
                   help="leak-free calibration: split the GT images into two "
                        "interleaved halves, pick the best sweep threshold on "
                        "one half, report the filtered-vs-unfiltered gain on "
                        "the OTHER half (both directions; writes "
                        "classifier_calibration.json). Requires "
                        "--classifier-sweep")
    p.add_argument("--predictions", default=None,
                   help="default: RUN_DIR/Output_Masks_UNet")
    p.add_argument("--gt-suffix", default="_m",
                   help="between GT stem and .tif ('' for the TSEM set)")
    p.add_argument("--summary-name", default="eval_summary.json",
                   help="summary file name under RUN_DIR (so variant/"
                        "ensemble scores don't clobber the run's own)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tunnel-outage fallback; the "
                        "JAX_PLATFORMS env var does not stick on this host)")
    p.add_argument("--fine", action="store_true",
                   help="beyond-parity: after the protocol's 0.1-step sweep, "
                        "refine each best threshold on a 0.01-step grid "
                        "(+-0.05 around each coarse optimum; ~3x the sweep "
                        "cost — intended for the TPU backend) and report "
                        "'fine_*' keys alongside the protocol numbers")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from PIL import Image
    from semtpu.eval.sweep import threshold_sweep
    from semtpu.eval.metrics import instance_iou
    from semtpu.ops import segment, eight_to_four_connected

    pred_dir = args.predictions or os.path.join(args.run_dir,
                                                "Output_Masks_UNet")
    end = args.gt_suffix + ".tif"
    gt_files = sorted(f for f in os.listdir(args.gt) if f.endswith(end))
    preds, gts = [], []
    for g in gt_files:
        stem = g[:-len(end)]
        raw_f = os.path.join(pred_dir, stem + "_raw.tif")
        if not os.path.isfile(raw_f):
            raise FileNotFoundError(raw_f)
        gt = np.array(Image.open(os.path.join(args.gt, g)))
        raw = np.array(Image.open(raw_f), np.float32)
        # the TSEM GT set is pre-cropped to 712 rows (metadata bar removed)
        preds.append(raw[:gt.shape[0], :gt.shape[1]])
        gts.append(gt)
    print(f"scoring {len(preds)} predictions from {pred_dir}")

    sweep = threshold_sweep(preds, gts, do_watershed=True)
    iou_w, t_w = sweep.best_iou_whole
    iou_i, t_i = sweep.best_iou_instance
    iou_f, t_f = sweep.best_iou_instance_filtered
    youd, t_y = sweep.best_youden
    summary = {
        "iou_whole": round(iou_w, 4), "iou_whole_t": t_w,
        "iou_instance_all": round(iou_i, 4), "iou_instance_all_t": t_i,
        "iou_instance_gt9px": round(iou_f, 4), "iou_instance_gt9px_t": t_f,
        "youden": round(youd, 4), "youden_t": t_y,
        "baseline_v120": {"iou_whole": 0.8762, "iou_instance": 0.5750,
                          "youden": 0.9120},
    }

    if args.fine:
        cand = set()
        for t0 in (t_w, t_i, t_f, t_y):
            for k in range(-5, 6):
                t = round(t0 + 0.01 * k, 2)
                if 0.0 <= t <= 1.0:
                    cand.add(t)
        fine = threshold_sweep(preds, gts, do_watershed=True,
                               thresholds=sorted(cand))
        # fine grids include each coarse optimum, so fine best >= coarse best
        fw, fwt = fine.best_iou_whole
        fi, fit = fine.best_iou_instance
        ff, fft = fine.best_iou_instance_filtered
        fy, fyt = fine.best_youden
        summary.update({
            "fine_iou_whole": round(fw, 4), "fine_iou_whole_t": fwt,
            "fine_iou_instance_all": round(fi, 4),
            "fine_iou_instance_all_t": fit,
            "fine_iou_instance_gt9px": round(ff, 4),
            "fine_iou_instance_gt9px_t": fft,
            "fine_youden": round(fy, 4), "fine_youden_t": fyt,
        })

    if args.classifier:
        from semtpu.classify import _load_classifier, particle_class_scores
        clf = _load_classifier(args.classifier, 16, 384, 384)
        sem_dir = os.path.join(args.run_dir, "Input_Images")
        thresholds = [args.classifier_threshold]
        if args.classifier_sweep:
            thresholds = sorted({float(x) for x in
                                 args.classifier_sweep.split(",")}
                                | {args.classifier_threshold})
        tot_all = {t: 0.0 for t in thresholds}
        tot_f = {t: 0.0 for t in thresholds}
        per_img_all = {t: [] for t in thresholds}   # for --classifier-calibrate
        per_img_unfiltered = []
        for g, raw, gt in zip(gt_files, preds, gts):
            stem = g[:-len(end)]
            img = np.array(Image.open(os.path.join(sem_dir, stem + ".tif")),
                           np.float32)[:gt.shape[0], :gt.shape[1]]
            img01 = (img - img.min()) / max(float(img.max() - img.min()), 1e-9)
            # quantize EXACTLY like threshold_sweep does, so the re-segmented
            # mask reproduces the sweep's operating point at t_i
            pred = raw / 255.0 if raw.max() > 1 else raw
            u8 = np.round(np.clip(pred, 0, 1) * 255).astype(np.uint8)
            seg = segment(u8, threshold=float(t_i) * 255.0,
                          apply_watershed=True, min_distance=9,
                          dark_background=True)
            from semtpu.ops.morphology import binary_fill_holes
            filled = binary_fill_holes(seg > 0, connectivity=2)
            binary = np.asarray(eight_to_four_connected(
                np.asarray(filled).astype(np.uint8)))
            gt_bin = (gt > 0).astype(np.uint8)
            # ONE classifier forward + labeling per image; thresholds free
            labels, scores = particle_class_scores(clf, img01, binary)
            per_img_unfiltered.append(instance_iou(binary, gt_bin, 0.0))
            for t in thresholds:
                if scores is None:
                    filt = np.zeros_like(binary, np.uint8)
                else:
                    keep = scores >= t
                    keep[0] = False
                    filt = keep[labels].astype(np.uint8)
                v = instance_iou(filt, gt_bin, 0.0)
                per_img_all[t].append(v)
                tot_all[t] += v
                tot_f[t] += instance_iou(filt, gt_bin, 9.0)
        n_img = len(preds)
        if args.classifier_calibrate and args.classifier_sweep:
            # leak-free: interleaved halves (both sample the whole set);
            # threshold chosen on one half, gain measured on the other —
            # the reference plugin ships a FIXED 0.5
            # (Predict_Classes_And_Measure.py:286-288); this shows what a
            # calibrated threshold buys without fitting on the scored set
            halves = ([i for i in range(n_img) if i % 2 == 0],
                      [i for i in range(n_img) if i % 2 == 1])
            calib = {"thresholds": thresholds, "folds": []}
            gains = []
            for fit_idx, rep_idx in (halves, halves[::-1]):
                mean_fit = {t: float(np.mean([per_img_all[t][i]
                                              for i in fit_idx]))
                            for t in thresholds}
                t_star = max(thresholds, key=lambda t: mean_fit[t])
                rep_filt = float(np.mean([per_img_all[t_star][i]
                                          for i in rep_idx]))
                rep_unf = float(np.mean([per_img_unfiltered[i]
                                         for i in rep_idx]))
                calib["folds"].append({
                    "chosen_threshold": t_star,
                    "heldout_iou_instance_filtered": round(rep_filt, 4),
                    "heldout_iou_instance_unfiltered": round(rep_unf, 4),
                    "heldout_gain": round(rep_filt - rep_unf, 4)})
                gains.append(rep_filt - rep_unf)
            calib["mean_heldout_gain"] = round(float(np.mean(gains)), 4)
            calib_out = os.path.join(args.run_dir,
                                     "classifier_calibration.json")
            with open(calib_out, "w") as fh:
                json.dump(calib, fh, indent=1)
            summary["classifier_calibration"] = calib
            print(f"-> {calib_out}")
        if args.classifier_sweep:
            sweep_csv = os.path.join(args.run_dir,
                                     "classifier_threshold_sweep.csv")
            with open(sweep_csv, "w") as fh:
                fh.write("score_threshold;iou_instance_all;iou_instance_gt9px\n")
                for t in thresholds:
                    fh.write(f"{t};{tot_all[t] / n_img:.4f};"
                             f"{tot_f[t] / n_img:.4f}\n")
            print(f"-> {sweep_csv}")
            best_t = max(thresholds, key=lambda t: tot_all[t])
            summary["classifier_best_threshold"] = best_t
            summary["iou_instance_classifier_best"] = round(
                tot_all[best_t] / n_img, 4)
        t0 = args.classifier_threshold
        summary["iou_instance_classifier_filtered"] = round(
            tot_all[t0] / n_img, 4)
        summary["iou_instance_gt9px_classifier_filtered"] = round(
            tot_f[t0] / n_img, 4)

    print(json.dumps(summary))
    out = os.path.join(args.run_dir, args.summary_name)
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
