"""Pure-jnp image preprocessing primitives.

Capability parity with the reference loader/normalizer
(`Releases/Version 1.2.0/HelperFunctions.py:294-329`): grayscale conversion
by channel average, percentile contrast clipping ("hot/cold pixel" removal),
min-max normalization to an arbitrary range, optional binarization.

Everything here is shape-static, jittable, and vmappable so whole batches of
tiles are normalized in one fused XLA computation instead of a host loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def to_grayscale(image: jax.Array) -> jax.Array:
    """RGB(A)->gray by plain channel average; ensures trailing channel dim.

    Mirrors reference semantics (`HelperFunctions.py:309-312`): channel
    average, not luma weighting.
    """
    if image.ndim == 2:
        return image[:, :, None]
    if image.ndim == 3 and image.shape[-1] > 1:
        return jnp.mean(image, axis=-1, keepdims=True)
    return image


def contrast_clip(image: jax.Array, lower_pct: float, upper_pct: float) -> jax.Array:
    """Clip intensities to [P_lower, P_upper] percentiles.

    Reference: `HelperFunctions.py:314-318`. Only applied when
    0 < lower and upper < 100 (caller decides, as in the reference).
    """
    lb = jnp.percentile(image, lower_pct)
    ub = jnp.percentile(image, upper_pct)
    return jnp.clip(image, lb, ub)


def normalize_minmax(
    image: jax.Array,
    normalization_range: tuple[float, float] = (-1.0, 1.0),
    threshold_value: float | None = None,
) -> jax.Array:
    """Min-max normalize to [0,1], optionally binarize, then affine-map to range.

    Reference: `HelperFunctions.py:320-325`.
    """
    lo, hi = normalization_range
    image = image - jnp.min(image)
    # guard degenerate constant images (the reference divides by zero here,
    # `HelperFunctions.py:322`; a constant image maps to `lo`)
    image = image / jnp.maximum(jnp.max(image), 1e-12)
    if threshold_value is not None:
        image = (image > threshold_value).astype(image.dtype)
    return lo + (hi - lo) * image


@partial(jax.jit, static_argnames=("normalization_range", "threshold_value", "contrast_optimization_range"))
def preprocess_image(
    image: jax.Array,
    normalization_range: tuple[float, float] | None = (-1.0, 1.0),
    threshold_value: float | None = None,
    contrast_optimization_range: tuple[float, float] | None = None,
) -> jax.Array:
    """Full preprocessing chain of the reference loader on one HxWxC image."""
    image = image.astype(jnp.float32)
    image = to_grayscale(image)
    if contrast_optimization_range is not None:
        lo, hi = contrast_optimization_range
        if lo > 0 and hi < 100:
            image = contrast_clip(image, lo, hi)
    if normalization_range is not None:
        image = normalize_minmax(image, normalization_range, threshold_value)
    return image


def to_uint8(image: jax.Array) -> jax.Array:
    """Min-max rescale to [0,255] uint8 (reference save path)."""
    image = image - jnp.min(image)
    image = image / jnp.max(image)
    return (image * 255).astype(jnp.uint8)
