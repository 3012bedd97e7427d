"""GAN-output artifact filtering.

Capability parity with `HelperFunctions.filter_gan_masks`
(`Releases/Version 1.2.0/HelperFunctions.py:163-185`): for each (fake image,
mask) pair, measure per-particle mean intensity under the mask and drop
particles darker (dark background) / brighter (bright background) than a
Li/Otsu threshold of the image, then redraw the kept contours filled.
"""
from __future__ import annotations

import os

import numpy as np
import cv2
from PIL import Image, ImageFilter

from semtpu.ops import threshold_li, threshold_otsu, segment, eight_to_four_connected
from semtpu.measure.measure import Measure


def apply_mean_intensity_filter(
    image: np.ndarray,
    mask: np.ndarray,
    threshold_method: str = "li",
    dark_background: bool = True,
    do_watershed_and_four_connectivity: bool = True,
    method: str = "labelmap",
) -> np.ndarray:
    """Filter one mask by per-particle mean intensity; returns uint8 {0,255}.

    method="labelmap" (default): native union-find labeling + fused
    per-component stats (`semtpu.native`) — one pass over the image instead
    of the reference's per-particle contour rasterization; identical results
    for hole-free masks (which the simulator and watershed produce).
    method="contour": the reference's cv2-contour formulation.
    """
    image = np.asarray(image, dtype=np.uint8)
    mask = np.asarray(mask, dtype=np.uint8)
    if do_watershed_and_four_connectivity:
        seg = segment(mask, threshold=-1.0, apply_watershed=True, dark_background=True)
        mask = np.asarray(eight_to_four_connected(seg))

    thr_fn = {"li": threshold_li, "otsu": threshold_otsu}[threshold_method]
    thr = float(thr_fn(image))

    if method == "labelmap":
        from semtpu import native
        labels, n = native.cc_label(mask, connectivity=1)
        if n == 0:
            return np.zeros(image.shape, dtype=np.uint8)
        _, means, _ = native.cc_stats(labels, n, image)
        keep = means >= thr if dark_background else means <= thr
        return native.cc_filter(labels, n, keep)

    m = Measure(mask, dark_background=dark_background, apply_watershed=False,
                exclude_edges=False, grayscale_image=image)
    m.calculate_mean_intensities()
    if dark_background:
        m.filter_results("meanIntensity", min_value=thr)
    else:
        m.filter_results("meanIntensity", max_value=thr)

    out = np.zeros(image.shape, dtype=np.uint8)
    cv2.drawContours(out, m.contours, -1, (255, 255, 255), thickness=-1)
    return out


def filter_gan_masks(
    img_path: str,
    msk_path: str,
    out_path: str,
    threshold_method: str = "li",
    do_watershed_and_four_connectivity: bool = True,
    gaussian_blur_amount: float = 0.0,
    dark_background: bool = True,
    method: str = "labelmap",
) -> None:
    """Directory-level driver matching the reference signature and contract.

    Writes filtered masks to `out_path` with the same filenames; optionally
    re-saves the paired fake images with a Gaussian blur (checkerboard-
    artifact mitigation, `HelperFunctions.py:182-185`).
    """
    for f in sorted(os.listdir(img_path)):
        img_file = os.path.join(img_path, f)
        msk_file = os.path.join(msk_path, f)
        if not os.path.isfile(msk_file):
            continue
        img = np.array(Image.open(img_file), dtype=np.uint8)
        mask = np.array(Image.open(msk_file), dtype=np.uint8)
        out = apply_mean_intensity_filter(
            img, mask, threshold_method=threshold_method,
            dark_background=dark_background,
            do_watershed_and_four_connectivity=do_watershed_and_four_connectivity,
            method=method)
        Image.fromarray(out).save(os.path.join(out_path, f))

        if gaussian_blur_amount > 0:
            blurred = Image.fromarray(img).filter(
                ImageFilter.GaussianBlur(gaussian_blur_amount))
            blurred.save(img_file)
