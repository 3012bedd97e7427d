"""Histogram thresholds (Otsu, Li) as jittable device reductions.

The reference delegates to skimage (`threshold_otsu`, `threshold_li` — used in
`Measurements.py:277` and `HelperFunctions.py:163-175`). These are on the
per-image postprocessing hot path, so here they are single fused XLA
computations (one histogram + cumsum scan) instead of host round-trips.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nbins",))
def threshold_otsu(image: jax.Array, nbins: int = 256) -> jax.Array:
    """Otsu's threshold (maximum between-class variance).

    Matches skimage semantics: for 8-bit-style data use 256 unit-width bins;
    for floats, `nbins` uniform bins over [min, max]. Returns the bin center
    maximizing ``w1 * w2 * (mu1 - mu2)**2``.
    """
    x = image.astype(jnp.float32).ravel()
    lo = jnp.min(x)
    hi = jnp.max(x)
    is_int = jnp.issubdtype(image.dtype, jnp.integer)
    if is_int:
        # unit-width integer bins (exact for uint8 inputs)
        edges_lo = lo - 0.5
        edges_hi = hi + 0.5
        centers = lo + (hi - lo) * jnp.arange(nbins) / (nbins - 1)
        centers = jnp.round(centers)
    else:
        edges_lo, edges_hi = lo, hi
        width = (hi - lo) / nbins
        centers = lo + width * (jnp.arange(nbins) + 0.5)
    span = jnp.maximum(edges_hi - edges_lo, 1e-12)
    idx = jnp.clip(((x - edges_lo) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    counts = jnp.zeros(nbins, jnp.float32).at[idx].add(1.0)

    w1 = jnp.cumsum(counts)
    w2 = jnp.cumsum(counts[::-1])[::-1]
    m = counts * centers
    mean1 = jnp.cumsum(m) / jnp.maximum(w1, 1e-12)
    mean2 = (jnp.cumsum(m[::-1]) / jnp.maximum(jnp.cumsum(counts[::-1]), 1e-12))[::-1]
    variance12 = w1[:-1] * w2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    best = jnp.argmax(variance12)
    return centers[best]


@partial(jax.jit, static_argnames=("max_iter",))
def threshold_li(image: jax.Array, max_iter: int = 64) -> jax.Array:
    """Li's minimum-cross-entropy threshold (iterative).

    Semantics follow skimage's iterative formulation: shift by the image
    minimum, start from the mean, iterate
    ``t <- (mu_fore - mu_back) / (ln mu_fore - ln mu_back)`` until the update
    falls below half a gray level.
    """
    x = image.astype(jnp.float32).ravel()
    x_min = jnp.min(x)
    x = x - x_min
    tol = jnp.where(jnp.issubdtype(image.dtype, jnp.integer), 0.5,
                    jnp.maximum((jnp.max(x)) / 512.0, 1e-6))
    # ignore exact zeros (li cannot place them; matches skimage behavior)
    valid = x > 0
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    t0 = jnp.sum(jnp.where(valid, x, 0.0)) / n_valid

    def cond(state):
        t_curr, t_next, it = state
        return jnp.logical_and(jnp.abs(t_next - t_curr) > tol, it < max_iter)

    def body(state):
        _, t, it = state
        fore = jnp.logical_and(valid, x > t)
        back = jnp.logical_and(valid, x <= t)
        n_fore = jnp.maximum(jnp.sum(fore), 1)
        n_back = jnp.maximum(jnp.sum(back), 1)
        mean_fore = jnp.sum(jnp.where(fore, x, 0.0)) / n_fore
        mean_back = jnp.maximum(jnp.sum(jnp.where(back, x, 0.0)) / n_back, 1e-12)
        t_new = (mean_fore - mean_back) / (jnp.log(mean_fore) - jnp.log(mean_back))
        return t, t_new, it + 1

    _, t_final, _ = jax.lax.while_loop(cond, body, (t0 - 2 * tol, t0, 0))
    return t_final + x_min
