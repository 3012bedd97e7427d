"""Tiler/stitcher contract tests.

Property: stitch(tile(img)) == img for all three overlap modes, across the
shapes the pipeline actually uses (1024x768 SEM images w/ 384x384 tiles,
plus edge cases: exact multiples, single-tile, remainder <= min_overlap).
Also checks offsets/order against an independently-derived oracle of the
reference grid formulas.
"""
import math

import numpy as np
import pytest

from semtpu.core.tiling import tile_image, stitch_image, tile_grid, _axis_tiles, _axis_offsets

SHAPES = [
    (768, 1024, 384, 384),   # the pipeline's standard SEM shape
    (712, 1024, 384, 384),   # cropped metadata-bar variant
    (768, 768, 384, 384),    # exact multiple (remainder 0 -> bump rule fires)
    (384, 384, 384, 384),    # single tile
    (385, 386, 384, 384),    # tiny remainder
    (500, 300, 128, 256),    # asymmetric tiles
]


def oracle_offsets(S, T, min_overlap):
    n = math.ceil(S / T)
    if n > 1 and (T - (S % T)) % T <= min_overlap:
        n += 1
    if n == 1:
        return [0]
    return [math.ceil(i * (T - ((T * n - S) / (n - 1)))) for i in range(n)]


@pytest.mark.parametrize("H,W,th,tw", SHAPES)
def test_grid_matches_oracle(H, W, th, tw):
    ys, xs = tile_grid(H, W, th, tw, min_overlap=2)
    oy = oracle_offsets(H, th, 2)
    ox = oracle_offsets(W, tw, 2)
    k = 0
    for i in range(len(ox)):
        for j in range(len(oy)):
            assert ys[k] == oy[j] and xs[k] == ox[i], (k, i, j)
            # full tiles always fit inside the image
            assert 0 <= ys[k] <= H - th and 0 <= xs[k] <= W - tw
            k += 1
    assert k == len(ys)


@pytest.mark.parametrize("H,W,th,tw", SHAPES)
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_stitch_tile_roundtrip(H, W, th, tw, mode, rng):
    img = rng.random((H, W, 1), dtype=np.float32)
    tiles = tile_image(img, th, tw, min_overlap=2)
    out = np.asarray(stitch_image(tiles, W, H, min_overlap=2, manage_overlap_mode=mode))
    np.testing.assert_allclose(out, img, rtol=0, atol=1e-6)


def test_tile_normalization_individual(rng):
    img = rng.random((500, 700, 1), dtype=np.float32) * 100 + 5
    tiles = np.asarray(tile_image(img, 384, 384, normalization_range=(0, 255)))
    for t in tiles:
        assert abs(t.min() - 0) < 1e-3
        assert abs(t.max() - 255) < 1e-2


def test_tile_normalization_global(rng):
    img = rng.random((500, 700, 1), dtype=np.float32)
    tiles = np.asarray(
        tile_image(img, 384, 384, normalization_range=(-1, 1),
                   normalize_tiles_individually=False)
    )
    assert tiles.min() >= -1 - 1e-6 and tiles.max() <= 1 + 1e-6


def test_bump_rule_exact_multiple():
    # 768/384: remainder 0 <= min_overlap=2 -> bumped to 3 tiles per axis
    assert _axis_tiles(768, 384, 2) == 3
    assert _axis_tiles(768, 384, -1) == 2  # no bump when min_overlap < 0
    offs = _axis_offsets(768, 384, 3)
    assert offs[0] == 0 and offs[-1] == 768 - 384


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_stitch_tile_roundtrip_large_grid(mode, rng):
    """5x7 grid (35 tiles): the scan-based stitcher must stay exact at
    grids where per-tile unrolling would blow up compile time."""
    img = rng.random((150, 220, 1)).astype(np.float32)
    tiles = tile_image(img, 32, 32, min_overlap=2)
    assert tiles.shape[0] >= 35
    out = np.asarray(stitch_image(tiles, 220, 150, min_overlap=2,
                                  manage_overlap_mode=mode))
    np.testing.assert_allclose(out, img, atol=1e-5)
