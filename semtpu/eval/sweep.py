"""Threshold-sweep evaluation driver (reference `Calculate_Scores.py:176-352`).

For each raw prediction image and each threshold in 0.0..1.0 (step 0.1):
run the watershed segmentation stack + 4-connectivity fix, then compute
whole-image IoU, instance IoU (all / area > 9 px^2), and pixel ROC rates
against the manual ground truth; report per-threshold averages and the
best-threshold operating points (incl. Youden's index).

The reference runs this as mp.Pool'd Python loops re-running watershed per
threshold; here the per-threshold segmentations are jitted device
computations and the pixel metrics single reductions.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
from PIL import Image

from semtpu.ops import segment, eight_to_four_connected
from semtpu.eval.metrics import whole_image_iou, roc_rates, instance_iou

THRESHOLDS = [t / 10.0 for t in range(11)]


@dataclass
class SweepResult:
    thresholds: list = field(default_factory=lambda: list(THRESHOLDS))
    iou_whole: np.ndarray = None          # (11,)
    iou_instance_all: np.ndarray = None   # (11,)
    iou_instance_filtered: np.ndarray = None
    tpr: np.ndarray = None
    tnr: np.ndarray = None
    fpr: np.ndarray = None
    fnr: np.ndarray = None
    youden: np.ndarray = None

    @property
    def best_iou_whole(self):
        i = int(np.argmax(self.iou_whole))
        return float(self.iou_whole[i]), self.thresholds[i]

    @property
    def best_iou_instance(self):
        i = int(np.argmax(self.iou_instance_all))
        return float(self.iou_instance_all[i]), self.thresholds[i]

    @property
    def best_iou_instance_filtered(self):
        i = int(np.argmax(self.iou_instance_filtered))
        return float(self.iou_instance_filtered[i]), self.thresholds[i]

    @property
    def best_youden(self):
        i = int(np.argmax(self.youden))
        return float(self.youden[i]), self.thresholds[i]


def threshold_sweep(
    predictions: list[np.ndarray],
    ground_truths: list[np.ndarray],
    do_watershed: bool = True,
    min_distance: int = 9,
    instance_min_area: float = 9.0,
) -> SweepResult:
    """Sweep thresholds over (prediction, ground truth) image pairs.

    predictions: raw float maps in [0, 1] (or uint8 /255'd automatically).
    ground_truths: binary masks.
    """
    n_img = len(predictions)
    assert n_img == len(ground_truths) and n_img > 0
    acc = {k: np.zeros(len(THRESHOLDS)) for k in
           ("iou_whole", "iou_all", "iou_filt", "tpr", "tnr", "fpr", "fnr", "youden")}

    import jax.numpy as jnp
    for pred, gt in zip(predictions, ground_truths):
        pred = np.asarray(pred, dtype=np.float32)
        if pred.max() > 1.0:
            pred = pred / 255.0
        # one uint8 upload per image; thresholds scale on device (1/255
        # quantization is below the sweep's 0.1 threshold step)
        pred_dev = jnp.asarray(np.round(pred * 255).astype(np.uint8))
        gt_bin = (np.asarray(gt) > 0).astype(np.uint8)
        for ti, t in enumerate(THRESHOLDS):
            seg = segment(pred_dev, threshold=float(t) * 255.0,
                          apply_watershed=do_watershed,
                          min_distance=min_distance, dark_background=True)
            seg = np.asarray(eight_to_four_connected(seg))
            seg_bin = (seg > 0).astype(np.uint8)

            acc["iou_whole"][ti] += float(whole_image_iou(seg_bin, gt_bin)) / n_img
            acc["iou_all"][ti] += instance_iou(seg_bin, gt_bin, 0.0) / n_img
            acc["iou_filt"][ti] += instance_iou(seg_bin, gt_bin, instance_min_area) / n_img
            tpr, tnr, fpr, fnr = (float(x) for x in roc_rates(seg_bin, gt_bin))
            acc["tpr"][ti] += tpr / n_img
            acc["tnr"][ti] += tnr / n_img
            acc["fpr"][ti] += fpr / n_img
            acc["fnr"][ti] += fnr / n_img
            acc["youden"][ti] += (tpr + tnr - 1.0) / n_img

    return SweepResult(
        iou_whole=acc["iou_whole"], iou_instance_all=acc["iou_all"],
        iou_instance_filtered=acc["iou_filt"], tpr=acc["tpr"], tnr=acc["tnr"],
        fpr=acc["fpr"], fnr=acc["fnr"], youden=acc["youden"],
    )


def evaluate_predictions(
    prediction_dir: str,
    ground_truth_dir: str,
    output_csv: str | None = None,
    model_name: str | None = None,
    do_watershed: bool = True,
) -> SweepResult:
    """Directory-level evaluation against a ground-truth directory.

    Prediction files are matched to GT files by stem with the reference's
    `_m` convention (GT `1908248_m.tif` <-> prediction `1908248.tif`); raw
    UNet outputs saved as `*_raw.tif` are preferred when present.
    """
    gt_files = sorted(f for f in os.listdir(ground_truth_dir) if f.endswith((".tif", ".png")))
    preds, gts = [], []
    for f in gt_files:
        stem = f.replace("_m.tif", "").replace(".tif", "").replace(".png", "")
        cands = [stem + "_raw.tif", stem + ".tif", stem + ".png", f.replace("_m", "")]
        pred_file = next((c for c in cands
                          if os.path.isfile(os.path.join(prediction_dir, c))), None)
        if pred_file is None:
            continue
        gts.append(np.array(Image.open(os.path.join(ground_truth_dir, f))))
        preds.append(np.array(Image.open(os.path.join(prediction_dir, pred_file))))

    result = threshold_sweep(preds, gts, do_watershed=do_watershed)

    if output_csv:
        name = model_name or os.path.basename(prediction_dir.rstrip("/"))
        header = not os.path.isfile(output_csv)
        with open(output_csv, "a") as fh:
            if header:
                fh.write("Model;Threshold;IoU (Whole Image);IoU (All Instances);"
                         "IoU (Instances > 9 sq.pixel);True Positives;True Negatives;"
                         "False Positives;False Negatives;Youdens Index\n")
            for i, t in enumerate(result.thresholds):
                fh.write(f"{name};{t};{result.iou_whole[i]};{result.iou_instance_all[i]};"
                         f"{result.iou_instance_filtered[i]};{result.tpr[i]};{result.tnr[i]};"
                         f"{result.fpr[i]};{result.fnr[i]};{result.youden[i]}\n")
    return result
