"""Binary morphology as reduce-windows + bounded-iteration floods.

Replaces the scipy.ndimage morphology used by the mask simulator
(`WassersteinGAN.py:518-521`: binary_fill_holes, binary_opening(9x9),
binary_erosion x2) and the sequential 8->4-connectivity fixer
(`HelperFunctions.py:144-152`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from semtpu.ops.filters import maximum_filter, minimum_filter

# scipy's default structuring element: 4-connected cross (connectivity 1)
_CROSS = True


def _erode_once(mask: jax.Array, cross: bool = True) -> jax.Array:
    """One binary erosion; cross (4-conn, scipy default) or 3x3 square."""
    m = mask.astype(bool)
    if cross:
        p = jnp.pad(m, 1, constant_values=False)
        return (
            m
            & p[:-2, 1:-1]
            & p[2:, 1:-1]
            & p[1:-1, :-2]
            & p[1:-1, 2:]
        )
    return minimum_filter(m.astype(jnp.int32), 3) > 0


def _dilate_once(mask: jax.Array, cross: bool = True) -> jax.Array:
    m = mask.astype(bool)
    if cross:
        p = jnp.pad(m, 1, constant_values=False)
        return (
            m
            | p[:-2, 1:-1]
            | p[2:, 1:-1]
            | p[1:-1, :-2]
            | p[1:-1, 2:]
        )
    return maximum_filter(m.astype(jnp.int32), 3) > 0


@partial(jax.jit, static_argnames=("iterations", "cross"))
def binary_erosion(mask: jax.Array, iterations: int = 1, cross: bool = True) -> jax.Array:
    m = mask.astype(bool)
    for _ in range(iterations):
        m = _erode_once(m, cross)
    return m


@partial(jax.jit, static_argnames=("iterations", "cross"))
def binary_dilation(mask: jax.Array, iterations: int = 1, cross: bool = True) -> jax.Array:
    m = mask.astype(bool)
    for _ in range(iterations):
        m = _dilate_once(m, cross)
    return m


def _erode_square(m: jax.Array, size: int) -> jax.Array:
    """Erosion by a size x size all-ones structure, outside = background."""
    pad = size // 2
    p = jnp.pad(m.astype(jnp.int32), pad, constant_values=0)
    return jax.lax.reduce_window(p, jnp.int32(1), jax.lax.min, (size, size), (1, 1), "VALID") > 0


def _dilate_square(m: jax.Array, size: int) -> jax.Array:
    pad = size // 2
    p = jnp.pad(m.astype(jnp.int32), pad, constant_values=0)
    return jax.lax.reduce_window(p, jnp.int32(0), jax.lax.max, (size, size), (1, 1), "VALID") > 0


@partial(jax.jit, static_argnames=("size",))
def binary_opening(mask: jax.Array, size: int = 9) -> jax.Array:
    """Opening with a size x size all-ones structure (min then max filter).

    Equivalent to scipy binary_opening(structure=np.ones((size, size)))
    with the default border handling (outside treated as background).
    """
    return _dilate_square(_erode_square(mask.astype(bool), size), size)


@partial(jax.jit, static_argnames=("max_iter", "connectivity"))
def binary_fill_holes(mask: jax.Array, max_iter: int = 4096,
                      connectivity: int = 1) -> jax.Array:
    """Fill holes = background not reachable from the border.

    Flood the complement from the image border with a bounded while-loop of
    dilations masked to the background. connectivity=1 is scipy's default
    cross structure; connectivity=2 is `structure=np.ones((3, 3))` — the
    8-connected background used by the reference scoring protocol
    (`Archive/Other Scripts/Calculate_Scores.py:64`).
    """
    m = mask.astype(bool)
    h, w = m.shape
    bg = ~m
    border = jnp.zeros_like(m).at[0, :].set(True).at[-1, :].set(True).at[:, 0].set(True).at[:, -1].set(True)
    seed = border & bg

    def cond(state):
        reach, changed, it = state
        return jnp.logical_and(changed, it < max_iter)

    def body(state):
        reach, _, it = state
        new = _dilate_once(reach, cross=(connectivity == 1)) & bg
        return new, jnp.any(new != reach), it + 1

    reach, _, _ = jax.lax.while_loop(cond, body, (seed, jnp.bool_(True), 0))
    return m | (bg & ~reach)


@jax.jit
def eight_to_four_connected(img: jax.Array) -> jax.Array:
    """Break diagonal-only background connections (exact reference semantics).

    The reference (`HelperFunctions.py:144-152`) is a sequential double loop;
    its only loop-carried dependence is row-to-row (modifications at row x
    touch rows x and x+1 and are never read again within the same row), so it
    lowers exactly to a lax.scan over rows with each row fully vectorized.
    Works on any integer/bool image; returns the same dtype.
    """
    dtype = img.dtype
    a = img != 0  # nonzero mask; the rule only distinguishes zero vs nonzero
    vals = img

    n_nonzero = jnp.sum(a)
    apply_rule = jnp.logical_or(n_nonzero > 2, n_nonzero < a.size - 2)

    def row_step(carry, next_row_vals):
        row_vals = carry  # values of row x (already fixed up by row x-1)
        r = row_vals != 0
        n = next_row_vals != 0
        # checks at columns y = 0..W-2, all on the pre-update row state
        c1 = (~r[:-1]) & (~n[1:]) & n[:-1] & r[1:]   # clear img[x+1, y]
        c2 = (~n[:-1]) & (~r[1:]) & r[:-1] & n[1:]   # clear img[x,   y]
        c1 = jnp.where(apply_rule, c1, False)
        c2 = jnp.where(apply_rule, c2, False)
        new_next = jnp.where(jnp.pad(c1, (0, 1)), 0, next_row_vals)
        new_row = jnp.where(jnp.pad(c2, (0, 1)), 0, row_vals)
        return new_next, new_row

    first = vals[0]
    rest = vals[1:]
    last_carry, out_rows = jax.lax.scan(row_step, first, rest)
    out = jnp.concatenate([out_rows, last_carry[None, :]], axis=0)
    return out.astype(dtype)
