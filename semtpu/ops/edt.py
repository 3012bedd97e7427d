"""Exact Euclidean distance transform on device.

Replaces `scipy.ndimage.distance_transform_edt` (`Measurements.py:287`), the
first stage of the watershed instance-separation stack.

Formulation: the classic two-pass separable decomposition.

  pass 1 (columns): g[i,j] = vertical distance to the nearest background
      pixel in column j, computed with two lax.scan sweeps (down, up) —
      O(H) with the whole row vectorized across columns.

  pass 2 (rows): dt^2[i,j] = min_k ( g[i,k]^2 + (j-k)^2 ) — an exact
      min-plus reduction. Rather than the sequential parabolic-envelope
      algorithm (data-dependent control flow, hostile to XLA), we evaluate
      the reduction directly in (j, k) blocks: regular, fully vectorized,
      MXU/VPU-friendly, O(H*W^2) total — a few ms at 1024x768 on TPU and
      exact to the last ulp.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BLOCK = 128


@partial(jax.jit, static_argnames=())
def _column_pass(mask: jax.Array) -> jax.Array:
    """Per-column distance (in rows) to nearest background pixel."""
    h, w = mask.shape
    big = jnp.float32(h + w)
    init = jnp.where(mask, big, 0.0).astype(jnp.float32)

    def down(carry, row):
        d = jnp.minimum(row, carry + 1.0)
        return d, d

    _, top = jax.lax.scan(down, jnp.full((w,), big), init)

    def up(carry, row):
        d = jnp.minimum(row, carry + 1.0)
        return d, d

    _, bot = jax.lax.scan(up, jnp.full((w,), big), top, reverse=True)
    return bot


def _row_pass(g: jax.Array) -> jax.Array:
    """dt^2[i, j] = min_k g[i,k]^2 + (j-k)^2, blocked over j and k."""
    h, w = g.shape
    pad_w = (-w) % _BLOCK
    big = jnp.float32((h + w) ** 2)
    g2 = jnp.pad(g.astype(jnp.float32) ** 2, ((0, 0), (0, pad_w)), constant_values=big)
    wp = w + pad_w
    nb = wp // _BLOCK
    ks = jnp.arange(wp, dtype=jnp.float32)
    g2b = g2.reshape(h, nb, _BLOCK)            # (H, nb, B) k-blocks
    ksb = ks.reshape(nb, _BLOCK)               # (nb, B)

    def j_block(jstart):
        j = jstart + jnp.arange(_BLOCK, dtype=jnp.float32)  # (B,)

        def k_block(carry, xs):
            g2k, kk = xs                                     # (H,B), (B,)
            d2 = (j[None, :] - kk[:, None]) ** 2             # (B_k, B_j)
            cand = jnp.min(g2k[:, :, None] + d2[None, :, :], axis=1)  # (H, B_j)
            return jnp.minimum(carry, cand), None

        out, _ = jax.lax.scan(k_block, jnp.full((h, _BLOCK), big), (jnp.swapaxes(g2b, 0, 1), ksb))
        return out

    jstarts = jnp.arange(nb, dtype=jnp.float32) * _BLOCK
    blocks = jax.lax.map(j_block, jstarts)     # (nb, H, B)
    dt2 = jnp.moveaxis(blocks, 0, 1).reshape(h, wp)
    return dt2[:, :w]


@jax.jit
def distance_transform_edt(mask: jax.Array) -> jax.Array:
    """Exact EDT of a boolean foreground mask (distance to nearest background).

    Equivalent to scipy.ndimage.distance_transform_edt(mask) for 2D inputs.
    """
    mask = mask.astype(bool)
    g = _column_pass(mask)
    dt2 = _row_pass(g)
    return jnp.sqrt(dt2)
