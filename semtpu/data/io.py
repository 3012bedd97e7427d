"""Host-side image file IO with the reference's preprocessing contract.

Parity with `HelperFunctions.get_image_file_paths_from_directory` /
`load_and_preprocess_images` (`HelperFunctions.py:290-329`): same extension
set, RGB->gray by channel average, percentile contrast clipping, min-max
normalization to an arbitrary range, optional binarization.

Decoding happens on host (PIL); the numeric preprocessing runs as one jitted
device computation per image (`semtpu.core.imageproc.preprocess_image`).
"""
from __future__ import annotations

import contextlib
import os

import numpy as np
from PIL import Image

from semtpu.core.imageproc import preprocess_image

IMAGE_EXTENSIONS = (".tif", ".tiff", ".png", ".bmp", ".jpg", ".jpeg", ".gif")


def get_image_file_paths_from_directory(directory: str) -> list[str]:
    return [os.path.join(directory, f) for f in sorted(os.listdir(directory))
            if f.lower().endswith(IMAGE_EXTENSIONS)]


def decode_image(path: str) -> np.ndarray:
    """Decode one image file to float32 HxW(xC)."""
    return np.asarray(Image.open(path), dtype=np.float32)


def load_and_preprocess_images(
    input_dir_or_filelist,
    threshold_value: float | None = None,
    normalization_range: tuple[float, float] | None = (-1, 1),
    output_channels: int = 1,
    contrast_optimization_range: tuple[float, float] | None = None,
) -> np.ndarray:
    """Load a directory / file list / single file into an (N, H, W, C) array."""
    if isinstance(input_dir_or_filelist, (str, os.PathLike)):
        if os.path.isdir(input_dir_or_filelist):
            files = get_image_file_paths_from_directory(input_dir_or_filelist)
        else:
            files = [input_dir_or_filelist]
    else:
        files = list(input_dir_or_filelist)

    # host loader: run the (per-shape jitted) preprocessing on the CPU
    # backend — ragged user inputs would otherwise trigger one accelerator
    # compilation per image shape; bulk data reaches the accelerator later
    # via DeviceImages
    import jax
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    out = []
    with ctx:
        for f in files:
            img = decode_image(f)
            assert 2 <= img.ndim <= 3 and output_channels in (1, 3), "Invalid Image format"
            arr = preprocess_image(
                img,
                normalization_range=normalization_range,
                threshold_value=threshold_value,
                contrast_optimization_range=contrast_optimization_range,
            )
            out.append(np.asarray(arr))
    if len({a.shape for a in out}) > 1:
        # mixed sizes (e.g. user-drawn particle outlines): return a list —
        # callers like prepare_mask_dataset pad to a common frame themselves
        return [np.asarray(a, np.float32) for a in out]
    return np.asarray(out, dtype=np.float32)


def load_uint8_stack(input_dir_or_filelist) -> np.ndarray:
    """Load a directory/file list of same-shape uint8 images as (N,H,W,1).

    The raw-byte form feeds `DeviceImages.from_uint8` (device-resident
    datasets with on-device preprocessing): 4x less host-link traffic than
    float32 with bit-identical results.
    """
    if isinstance(input_dir_or_filelist, (str, os.PathLike)):
        files = get_image_file_paths_from_directory(input_dir_or_filelist)
    else:
        files = list(input_dir_or_filelist)
    out = []
    for f in files:
        a = np.asarray(Image.open(f))
        if a.ndim == 3:
            a = np.mean(a, axis=-1)
        out.append(np.asarray(a, np.uint8)[:, :, None])
    return np.stack(out)


def save_image(array: np.ndarray, path: str) -> None:
    """Save a 2D array (uint8 passthrough; float min-max -> uint8)."""
    a = np.asarray(array)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[:, :, 0]
    Image.fromarray(a).save(path)
