"""Stage a full-workflow run directory from the BAM TiO2 dataset.

Recreates the reference's user-supplied inputs (`StartProcess.py:14-18`):

- ``Input_Images/``: the 40 raw SEM images.
- ``Input_Masks/``: single-particle example outlines. The reference expects
  the user to hand-draw a handful of these (README "example masks"); here
  they are extracted from a few ground-truth masks — one crop per isolated
  particle, size-stratified for shape diversity — which is the same
  annotation effort the workflow assumes.

Usage:  python scripts/prepare_run.py WORKDIR [--n-source-masks 3]
                                      [--per-mask 12] [--margin 4]
                                      [--images-dir D] [--gt-dir D]
                                      [--gt-suffix _m]

TSEM variant (dark particles, bright background; GT masks are 712x1024,
named like the image with no suffix):
  python scripts/prepare_run.py run_tsem \
    --images-dir ".../Electron Microscopy Images/TSEM" \
    --gt-dir ".../Electron Microscopy Image Masks/TiO2_Masks_TSEM" \
    --gt-suffix ""
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
from PIL import Image
from scipy import ndimage

SEM_DIR = "/root/reference/Datasets/Electron Microscopy Images/SEM"
GT_DIR = ("/root/reference/Datasets/Electron Microscopy Image Masks/"
          "TiO2_Masks_Manual_4connected")
FOUR = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])


def extract_outlines(mask_path: str, per_mask: int, margin: int,
                     min_area: int = 120, rng: np.random.Generator | None = None):
    """Crop up to `per_mask` single-particle outline images from one GT mask.

    Picks non-edge particles above `min_area`, stratified across the area
    distribution so the WGAN sees small and large shapes alike.
    """
    rng = rng or np.random.default_rng(0)
    m = np.array(Image.open(mask_path)) > 127
    lab, n = ndimage.label(m, structure=FOUR)
    objs = ndimage.find_objects(lab)
    cands = []
    for k, sl in enumerate(objs):
        part = lab[sl] == k + 1
        a = int(part.sum())
        if a < min_area:
            continue
        if (sl[0].start == 0 or sl[1].start == 0
                or sl[0].stop == m.shape[0] or sl[1].stop == m.shape[1]):
            continue
        cands.append((a, sl, k + 1))
    cands.sort()
    if not cands:
        return []
    # stratified pick: one per area quantile bucket
    take = min(per_mask, len(cands))
    idx = np.unique(np.linspace(0, len(cands) - 1, take).round().astype(int))
    outs = []
    for i in idx:
        a, sl, label_id = cands[i]
        y0 = max(0, sl[0].start - margin)
        y1 = min(m.shape[0], sl[0].stop + margin)
        x0 = max(0, sl[1].start - margin)
        x1 = min(m.shape[1], sl[1].stop + margin)
        crop = (lab[y0:y1, x0:x1] == label_id).astype(np.uint8) * 255
        outs.append(crop)
    return outs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("workdir")
    p.add_argument("--n-source-masks", type=int, default=3)
    p.add_argument("--per-mask", type=int, default=12)
    p.add_argument("--margin", type=int, default=4)
    p.add_argument("--images-dir", default=SEM_DIR)
    p.add_argument("--gt-dir", default=GT_DIR)
    p.add_argument("--gt-suffix", default="_m",
                   help="between GT stem and .tif ('' for the TSEM set)")
    args = p.parse_args(argv)

    img_dir = os.path.join(args.workdir, "Input_Images")
    msk_dir = os.path.join(args.workdir, "Input_Masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(msk_dir, exist_ok=True)

    sem = sorted(f for f in os.listdir(args.images_dir) if f.endswith(".tif"))
    for f in sem:
        shutil.copy(os.path.join(args.images_dir, f), img_dir)
    print(f"copied {len(sem)} images -> {img_dir}")

    # spread source masks across the (sorted) GT set for content diversity
    end = args.gt_suffix + ".tif"
    gts = sorted(f for f in os.listdir(args.gt_dir) if f.endswith(end))
    picks = [gts[int(i)] for i in
             np.linspace(0, len(gts) - 1, args.n_source_masks).round()]
    total = 0
    for g in picks:
        outs = extract_outlines(os.path.join(args.gt_dir, g),
                                args.per_mask, args.margin)
        stem = g[:-len(end)]
        for j, crop in enumerate(outs):
            Image.fromarray(crop).save(
                os.path.join(msk_dir, f"{stem}_p{j:02d}.tif"))
        total += len(outs)
        print(f"{g}: {len(outs)} outlines")
    print(f"total {total} outlines -> {msk_dir}")


if __name__ == "__main__":
    main()
