"""Separable image filters as XLA reduce-windows / convs.

Replaces `scipy.ndimage.gaussian_filter` (used on the EDT in
`Measurements.py:288`) and the maximum filter implied by
`skimage.feature.peak_local_max` (`Measurements.py:291`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy-compatible discretized Gaussian (no error-function correction)."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return (phi / phi.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter(image: jax.Array, sigma: float = 1.0, truncate: float = 4.0) -> jax.Array:
    """Separable 2D Gaussian blur with scipy 'reflect' boundary (symmetric pad).

    Matches scipy.ndimage.gaussian_filter(img, sigma) defaults: radius =
    round(truncate * sigma), boundary mode 'reflect' == jnp.pad 'symmetric'.
    """
    radius = int(truncate * float(sigma) + 0.5)
    k = _gaussian_kernel1d(float(sigma), radius)
    x = image.astype(jnp.float32)
    h, w = x.shape

    # Small-tap separable filter as shifted-scaled adds: numerically exact
    # float32 (XLA's conv lowering can use approximate fast-conv algorithms)
    # and fuses into a single VPU loop.
    def conv_along(a: jax.Array, axis: int) -> jax.Array:
        pad = [(0, 0), (0, 0)]
        pad[axis] = (radius, radius)
        a = jnp.pad(a, pad, mode="symmetric")
        out = None
        for d in range(2 * radius + 1):
            sl = (
                a[d:d + h, :] if axis == 0 else a[:, d:d + w]
            )
            term = float(k[d]) * sl
            out = term if out is None else out + term
        return out

    return conv_along(conv_along(x, 0), 1)


@partial(jax.jit, static_argnames=("size",))
def maximum_filter(image: jax.Array, size: int) -> jax.Array:
    """Square max filter (size x size window) with -inf edge semantics."""
    pad = size // 2
    neg = jnp.finfo(jnp.float32).min if jnp.issubdtype(image.dtype, jnp.floating) else jnp.iinfo(image.dtype).min
    x = jnp.pad(image, ((pad, pad), (pad, pad)), constant_values=neg)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (size, size), (1, 1), padding="VALID"
    )


@partial(jax.jit, static_argnames=("size",))
def minimum_filter(image: jax.Array, size: int) -> jax.Array:
    """Square min filter (size x size window) with +inf edge semantics."""
    pad = size // 2
    pos = jnp.finfo(jnp.float32).max if jnp.issubdtype(image.dtype, jnp.floating) else jnp.iinfo(image.dtype).max
    x = jnp.pad(image, ((pad, pad), (pad, pad)), constant_values=pos)
    return jax.lax.reduce_window(
        x, pos, jax.lax.min, (size, size), (1, 1), padding="VALID"
    )
