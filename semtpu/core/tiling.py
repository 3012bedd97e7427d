"""Overlapping tiling / stitching engine — the image-size-scaling mechanism.

Grid semantics are the exact contract of the reference
(`Releases/Version 1.2.0/HelperFunctions.py:17-141`):

- tile counts: ``ceil(S / T)``, bumped by one when the remainder overlap
  would be ``<= min_overlap`` pixels (so seams always overlap),
- offsets: ``ceil(i * (T - (T*n - S)/(n-1)))`` which guarantees the last
  tile ends exactly at the image border (all tiles are full-size -> static
  shapes, one gather, no ragged slices),
- tile order: outer loop over x, inner over y (``k = i*n_y + j``),
- stitching overlap policies: 0 = max, 1 = average (per-pixel overlap
  counts), 2 = crop (half-overlap trim; edge tiles keep their borders).

Unlike the reference (host numpy loops, one tile at a time), tiling here is
a single device gather and stitching a single device scatter, both jittable,
so a whole image's tiles move through the model as one batched call.
"""
from __future__ import annotations

import math
from enum import IntEnum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class OverlapMode(IntEnum):
    MAX = 0
    AVERAGE = 1
    CROP = 2


def _axis_tiles(image_size: int, tile_size: int, min_overlap: int) -> int:
    """Number of tiles along one axis (reference bump rule)."""
    n = math.ceil(image_size / tile_size)
    if n > 1 and (tile_size - (image_size % tile_size)) % tile_size <= min_overlap:
        n += 1
    return n


def _axis_offsets(image_size: int, tile_size: int, n: int) -> np.ndarray:
    """Tile start offsets along one axis (reference formula)."""
    if n <= 1:
        return np.zeros(1, dtype=np.int64)
    step = tile_size - ((tile_size * n - image_size) / (n - 1))
    return np.asarray([math.ceil(i * step) for i in range(n)], dtype=np.int64)


def tile_grid(
    image_size_h: int,
    image_size_w: int,
    tile_size_h: int,
    tile_size_w: int,
    min_overlap: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (offsets_y, offsets_x) of every tile, in reference order.

    Tiles are ordered with the outer loop over x and inner loop over y,
    matching `HelperFunctions.py:34-49`.
    """
    n_x = _axis_tiles(image_size_w, tile_size_w, min_overlap)
    n_y = _axis_tiles(image_size_h, tile_size_h, min_overlap)
    off_x = _axis_offsets(image_size_w, tile_size_w, n_x)
    off_y = _axis_offsets(image_size_h, tile_size_h, n_y)
    ys = np.repeat(off_y[None, :], n_x, axis=0).reshape(-1)   # inner loop over y
    xs = np.repeat(off_x[:, None], n_y, axis=1).reshape(-1)   # outer loop over x
    return ys, xs


@partial(jax.jit, static_argnames=("tile_size_h", "tile_size_w", "min_overlap",
                                   "normalization_range", "normalize_tiles_individually"))
def tile_image(
    img: jax.Array,
    tile_size_h: int,
    tile_size_w: int,
    min_overlap: int = 2,
    normalization_range: tuple[float, float] | None = None,
    normalize_tiles_individually: bool = True,
) -> jax.Array:
    """Split an (H, W, C) image into an (N, th, tw, C) stack of tiles.

    One fused gather instead of the reference's per-tile copy loop
    (`HelperFunctions.py:34-49`).
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w = img.shape[0], img.shape[1]
    if h < tile_size_h or w < tile_size_w:
        raise ValueError(
            f"image ({h}x{w}) is smaller than the tile ({tile_size_h}x{tile_size_w}); "
            "pad the image or reduce the tile size"
        )
    ys, xs = tile_grid(h, w, tile_size_h, tile_size_w, min_overlap)
    ys = jnp.asarray(ys)
    xs = jnp.asarray(xs)
    row_idx = ys[:, None] + jnp.arange(tile_size_h)[None, :]          # (N, th)
    col_idx = xs[:, None] + jnp.arange(tile_size_w)[None, :]          # (N, tw)
    tiles = img[row_idx[:, :, None], col_idx[:, None, :], :]          # (N, th, tw, C)
    tiles = tiles.astype(jnp.float32)

    if normalization_range is not None:
        lo, hi = normalization_range
        if normalize_tiles_individually:
            mn = jnp.min(tiles, axis=(1, 2, 3), keepdims=True)
            tiles = tiles - mn
            mx = jnp.max(tiles, axis=(1, 2, 3), keepdims=True)
            tiles = tiles / jnp.maximum(mx, 1e-12)   # constant-tile guard
        else:
            tiles = tiles - jnp.min(img)
            tiles = tiles / jnp.maximum(jnp.max(img), 1e-12)
        tiles = lo + (hi - lo) * tiles
    return tiles


@partial(jax.jit, static_argnames=("image_size_w", "image_size_h", "min_overlap",
                                   "manage_overlap_mode", "return_8_bit_image"))
def stitch_image(
    tiles: jax.Array,
    image_size_w: int,
    image_size_h: int,
    min_overlap: int = 2,
    manage_overlap_mode: int = OverlapMode.CROP,
    return_8_bit_image: bool = False,
) -> jax.Array:
    """Reassemble an (N, th, tw, C) tile stack into an (H, W, C) image.

    Exact inverse of :func:`tile_image` with the reference's three overlap
    policies (`HelperFunctions.py:65-141`), as jittable device scatters.
    """
    n_tiles, th, tw, c = tiles.shape
    n_x = _axis_tiles(image_size_w, tw, min_overlap)
    n_y = _axis_tiles(image_size_h, th, min_overlap)
    assert n_x * n_y == n_tiles, (
        f"tile stack of {n_tiles} does not match {n_x}x{n_y} grid for "
        f"{image_size_w}x{image_size_h} image"
    )
    ys, xs = tile_grid(image_size_h, image_size_w, th, tw, min_overlap)
    tiles = tiles.astype(jnp.float32)

    mode = OverlapMode(manage_overlap_mode)
    out = jnp.zeros((image_size_h, image_size_w, c), dtype=jnp.float32)

    # All modes run as ONE lax.scan over the tile stack: the body compiles
    # once, so a 100+-tile image costs the same compile as a 9-tile one
    # (the per-tile unrolled updates scaled compile time linearly).
    ys_d = jnp.asarray(ys)
    xs_d = jnp.asarray(xs)

    if mode == OverlapMode.MAX:
        def body(acc, xs_):
            tile, y, x = xs_
            cur = jax.lax.dynamic_slice(acc, (y, x, 0), (th, tw, c))
            return jax.lax.dynamic_update_slice(
                acc, jnp.maximum(cur, tile), (y, x, 0)), None
        out, _ = jax.lax.scan(body, out, (tiles, ys_d, xs_d))
    elif mode == OverlapMode.AVERAGE:
        def body(carry, xs_):
            acc, counts = carry
            tile, y, x = xs_
            cur = jax.lax.dynamic_slice(acc, (y, x, 0), (th, tw, c))
            acc = jax.lax.dynamic_update_slice(acc, cur + tile, (y, x, 0))
            ccur = jax.lax.dynamic_slice(counts, (y, x, 0), (th, tw, c))
            counts = jax.lax.dynamic_update_slice(counts, ccur + 1.0, (y, x, 0))
            return (acc, counts), None
        (out, counts), _ = jax.lax.scan(body, (out, jnp.zeros_like(out)),
                                        (tiles, ys_d, xs_d))
        out = out / counts
    elif mode == OverlapMode.CROP:
        # Half-overlap trim per interior edge (reference integer formula).
        # Ragged patch shapes become per-tile keep-masks over the full tile
        # window, so the scan body stays static-shaped.
        ov_x = (tw * n_x - image_size_w) // (2 * (n_x - 1)) if n_x > 1 else 0
        ov_y = (th * n_y - image_size_h) // (2 * (n_y - 1)) if n_y > 1 else 0
        gi = np.repeat(np.arange(n_x), n_y)     # outer loop over x
        gj = np.tile(np.arange(n_y), n_x)
        cxl = np.where(gi == 0, 0, ov_x).astype(np.int32)
        cxr = np.where(gi == n_x - 1, 0, ov_x).astype(np.int32)
        cyt = np.where(gj == 0, 0, ov_y).astype(np.int32)
        cyb = np.where(gj == n_y - 1, 0, ov_y).astype(np.int32)
        rows = jnp.arange(th)[:, None, None]
        cols = jnp.arange(tw)[None, :, None]

        def body(acc, xs_):
            tile, y, x, t, b, l, r = xs_
            keep = ((rows >= t) & (rows < th - b)
                    & (cols >= l) & (cols < tw - r))
            cur = jax.lax.dynamic_slice(acc, (y, x, 0), (th, tw, c))
            return jax.lax.dynamic_update_slice(
                acc, jnp.where(keep, tile, cur), (y, x, 0)), None
        out, _ = jax.lax.scan(body, out,
                              (tiles, ys_d, xs_d, jnp.asarray(cyt),
                               jnp.asarray(cyb), jnp.asarray(cxl),
                               jnp.asarray(cxr)))
    else:
        raise ValueError(f"unknown overlap mode {manage_overlap_mode}")

    if return_8_bit_image:
        out = (out * 255).astype(jnp.uint8)
    return out
