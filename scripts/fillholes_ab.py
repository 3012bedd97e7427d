"""A/B the reference protocol's binary_fill_holes step on saved raw maps.

The reference's scoring stack (`Archive/Other Scripts/Calculate_Scores.py:64`)
fills holes (3x3 structure) after watershed-line removal and BEFORE the
sequential 8-to-4 connectivity pass; semtpu's fused device sweep
(`semtpu/eval/sweep.py`) historically omitted that step, understating
whole-image IoU. This script replays the host protocol on one predictions
directory with fill_holes off/on and prints both 11-threshold sweeps.

Usage: python scripts/fillholes_ab.py PRED_DIR [--gt GT] [--gt-suffix _m]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image
from scipy import ndimage

GT_DEFAULT = ("/root/reference/Datasets/Electron Microscopy Image Masks/"
              "TiO2_Masks_Manual_4connected")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pred_dir")
    p.add_argument("--gt", default=GT_DEFAULT)
    p.add_argument("--gt-suffix", default="_m")
    args = p.parse_args(argv)

    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from semtpu.ops import segment, eight_to_four_connected

    end = args.gt_suffix + ".tif"
    gt_files = sorted(f for f in os.listdir(args.gt) if f.endswith(end))
    res = {False: [0.0] * 11, True: [0.0] * 11}
    for n, g in enumerate(gt_files):
        stem = g[:-len(end)]
        gt = np.array(Image.open(os.path.join(args.gt, g)))
        gt = (gt // gt.max()).astype(np.uint8) > 0
        raw = np.array(Image.open(
            os.path.join(args.pred_dir, stem + "_raw.tif")), np.float32)
        raw = raw[:gt.shape[0], :gt.shape[1]]
        pred = raw / 255.0 if raw.max() > 1 else raw
        u8 = np.round(np.clip(pred, 0, 1) * 255).astype(np.uint8)
        for i in range(11):
            seg = np.asarray(segment(u8, threshold=i / 10.0 * 255.0,
                                     apply_watershed=True, min_distance=9,
                                     dark_background=True)) > 0
            for fill in (False, True):
                s = (ndimage.binary_fill_holes(seg, structure=np.ones((3, 3)))
                     if fill else seg)
                s4 = np.asarray(eight_to_four_connected(
                    s.astype(np.uint8))) > 0
                inter = np.sum(s4 & gt)
                union = np.sum(s4 | gt)
                res[fill][i] += (inter / union if union else 0.0) \
                    / len(gt_files)
        print(f"img {n + 1}/{len(gt_files)}", flush=True)

    for fill in (False, True):
        b = max(res[fill])
        bt = res[fill].index(b) / 10.0
        print(f"fill_holes={fill}: best whole-image IoU {b:.4f} @ t={bt}")
        print("  per-t:", [round(x, 4) for x in res[fill]])


if __name__ == "__main__":
    main()
