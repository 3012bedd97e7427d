"""Threshold-sweep evaluation driver (reference `Calculate_Scores.py:176-352`).

For each raw prediction image and each threshold in 0.0..1.0 (step 0.1):
run the watershed segmentation stack + the protocol's hole filling
(`Calculate_Scores.py:64`) + 4-connectivity fix, then compute
whole-image IoU, instance IoU (all / area > 9 px^2), and pixel ROC rates
against the manual ground truth; report per-threshold averages and the
best-threshold operating points (incl. Youden's index).

The reference runs this as mp.Pool'd Python loops re-running watershed per
threshold; here the WHOLE per-image sweep — 11x (segment + 4-connectivity
+ CC labeling + joint-histogram instance IoU + pixel metrics) — is ONE
device program (`lax.map` over thresholds), so a 40-image evaluation costs
40 dispatches + one (11, 7) scalar fetch each instead of hundreds of
mask-sized round trips over the host link.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from semtpu.ops import segment, eight_to_four_connected
from semtpu.ops.morphology import binary_fill_holes
from semtpu.ops.connected import label as cc_label
from semtpu.eval.metrics import whole_image_iou, roc_rates, instance_iou

THRESHOLDS = [t / 10.0 for t in range(11)]

# static instance caps for the device joint histogram; predicted instances
# are bounded by the min_distance=9 peak grid (~(H/9)*(W/9)), GT by the
# manual annotations (~hundreds). Overflowing labels are clipped into the
# last bin (pathological inputs only; the host path has no cap).
NP_CAP = 12288
NG_CAP = 2048


@partial(jax.jit, static_argnames=("do_watershed", "min_distance",
                                   "instance_min_area", "fill_holes"))
def _sweep_one_image_device(pred_u8, gt_bin, thresholds,
                            do_watershed: bool = True,
                            min_distance: int = 9,
                            instance_min_area: float = 9.0,
                            fill_holes: bool = True):
    """All thresholds of one image on device.

    pred_u8: (H, W) uint8 raw map (threshold t scales to t*255 — 1/255
    quantization is below the sweep's 0.1 step). gt_bin: (H, W) {0,1}.
    thresholds: (T,) float32 in [0, 1] — traced, so any grid reuses ONE
    compiled executable per grid LENGTH. Returns (T, 7) float32:
    [iou_whole, iou_inst_all, iou_inst_filtered, tpr, tnr, fpr, fnr]
    per threshold.
    """
    gl, n_g = cc_label(gt_bin > 0, connectivity=1)
    gl = jnp.minimum(gl, NG_CAP)
    g_areas = jnp.bincount(gl.ravel(), length=NG_CAP + 1).astype(jnp.float32)
    g = (gt_bin > 0)

    def one_threshold(t):
        seg = segment(pred_u8, threshold=t * 255.0,
                      apply_watershed=do_watershed,
                      min_distance=min_distance, dark_background=True)
        p = seg > 0
        if fill_holes and do_watershed:
            # reference scoring protocol fills holes (3x3 structure) after
            # watershed-line removal and BEFORE the 8->4 pass
            # (`Archive/Other Scripts/Calculate_Scores.py:64`); a no-op for
            # the degenerate constant-mask branch
            p = binary_fill_holes(p, connectivity=2)
        p = eight_to_four_connected(p.astype(jnp.uint8)) > 0

        inter_px = jnp.sum(p & g)
        iou_w = inter_px / jnp.maximum(jnp.sum(p | g), 1)
        tp = jnp.sum(p & g).astype(jnp.float32)
        tn = jnp.sum(~p & ~g).astype(jnp.float32)
        fp = jnp.sum(p & ~g).astype(jnp.float32)
        fn = jnp.sum(~p & g).astype(jnp.float32)
        pos = jnp.maximum(tp + fn, 1.0)
        neg = jnp.maximum(tn + fp, 1.0)

        pl, n_p = cc_label(p, connectivity=1)
        pl = jnp.minimum(pl, NP_CAP)
        p_areas = jnp.bincount(pl.ravel(), length=NP_CAP + 1
                               ).astype(jnp.float32)
        joint = jnp.bincount((pl * (NG_CAP + 1) + gl).ravel(),
                             length=(NP_CAP + 1) * (NG_CAP + 1)
                             ).reshape(NP_CAP + 1, NG_CAP + 1)
        inter = joint[1:, 1:].astype(jnp.float32)
        union = p_areas[1:, None] + g_areas[None, 1:] - inter
        iou = jnp.where(inter > 0, inter / jnp.maximum(union, 1.0), 0.0)
        best = jnp.max(iou, axis=1)

        def mean_best(min_area):
            keep = p_areas[1:] > min_area
            s = jnp.sum(jnp.where(keep, best, 0.0))
            c = jnp.sum(keep)
            return jnp.where(c > 0, s / jnp.maximum(c, 1), 0.0)

        return jnp.stack([
            iou_w.astype(jnp.float32), mean_best(0.0),
            mean_best(instance_min_area),
            tp / pos, tn / neg, fp / neg, fn / pos,
        ])

    return jax.lax.map(one_threshold, jnp.asarray(thresholds, jnp.float32))


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
    device: bool = True,
    fill_holes: bool = True,
    thresholds: list[float] | None = None,
) -> SweepResult:
    """Sweep thresholds over (prediction, ground truth) image pairs.

    predictions: raw float maps in [0, 1] (or uint8 /255'd automatically).
    ground_truths: binary masks. `device=False` selects the per-threshold
    host-metric path (uncapped instance counts; kept as the parity oracle
    for the fused device sweep). fill_holes=True is the reference scoring
    protocol (`Calculate_Scores.py:64`: binary_fill_holes with a 3x3
    structure between watershed and the 8->4 pass). thresholds defaults to
    the protocol's 0.0..1.0 step-0.1 grid; a custom grid (e.g. a fine
    refinement around a coarse optimum) is a beyond-parity extension —
    grids finer than 1/255 are quantized by the uint8 upload.
    """
    n_img = len(predictions)
    assert n_img == len(ground_truths) and n_img > 0
    thresholds = list(THRESHOLDS) if thresholds is None else \
        [float(t) for t in thresholds]
    acc = {k: np.zeros(len(thresholds)) for k in
           ("iou_whole", "iou_all", "iou_filt", "tpr", "tnr", "fpr", "fnr", "youden")}

    for pred, gt in zip(predictions, ground_truths):
        pred = np.asarray(pred, dtype=np.float32)
        if pred.max() > 1.0:
            pred = pred / 255.0
        # one uint8 upload per image; thresholds scale on device (1/255
        # quantization is below the sweep's 0.1 threshold step)
        pred_dev = jnp.asarray(np.round(pred * 255).astype(np.uint8))
        gt_bin = (np.asarray(gt) > 0).astype(np.uint8)

        if device:
            m = np.asarray(_sweep_one_image_device(
                pred_dev, jnp.asarray(gt_bin),
                jnp.asarray(thresholds, jnp.float32),
                do_watershed=do_watershed,
                min_distance=min_distance,
                instance_min_area=float(instance_min_area),
                fill_holes=fill_holes))
            acc["iou_whole"] += m[:, 0] / n_img
            acc["iou_all"] += m[:, 1] / n_img
            acc["iou_filt"] += m[:, 2] / n_img
            acc["tpr"] += m[:, 3] / n_img
            acc["tnr"] += m[:, 4] / n_img
            acc["fpr"] += m[:, 5] / n_img
            acc["fnr"] += m[:, 6] / n_img
            acc["youden"] += (m[:, 3] + m[:, 4] - 1.0) / n_img
            continue

        for ti, t in enumerate(thresholds):
            seg = segment(pred_dev, threshold=float(t) * 255.0,
                          apply_watershed=do_watershed,
                          min_distance=min_distance, dark_background=True)
            seg_b = seg > 0
            if fill_holes and do_watershed:
                seg_b = binary_fill_holes(seg_b, connectivity=2)
            seg = np.asarray(eight_to_four_connected(
                seg_b.astype(jnp.uint8)))
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
        thresholds=thresholds,
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
