"""Measurement engine tests: known geometry + reference-formula oracles."""
import numpy as np
import cv2
import pytest

from semtpu.measure import Measure, apply_mean_intensity_filter


def disc_image(shape=(128, 128), center=(64, 64), r=20):
    ys, xs = np.mgrid[:shape[0], :shape[1]]
    m = ((ys - center[0]) ** 2 + (xs - center[1]) ** 2 <= r ** 2)
    return (m * 255).astype(np.uint8)


def square_image(shape=(128, 128), y0=30, x0=40, s=40):
    img = np.zeros(shape, np.uint8)
    img[y0:y0 + s, x0:x0 + s] = 255
    return img


def test_disc_measurements():
    r = 20
    m = Measure(disc_image(r=r), apply_watershed=False, exclude_edges=True)
    assert m.number == 1
    area = m.calculate_areas()[0]
    # contour-polygon area of a rasterized disc is a bit under pi*r^2
    assert 0.85 * np.pi * r ** 2 < area < 1.1 * np.pi * r ** 2
    per = m.calculate_perimeters()[0]
    assert 0.9 * 2 * np.pi * r < per < 1.2 * 2 * np.pi * r
    mx, _ = m.calculate_max_feret_diameters()
    mn, _ = m.calculate_min_feret_diameters()
    assert 2 * r - 2 <= mx[0] <= 2 * r + 2
    assert 2 * r - 2 <= mn[0] <= 2 * r + 2
    conv = m.calculate_convexness_scores()[0]
    assert 0.9 < conv <= 1.02
    comp = m.calculate_completeness_scores()[0]
    assert 0.85 < comp < 1.15


def test_square_measurements():
    s = 40
    m = Measure(square_image(s=s), apply_watershed=False)
    assert m.number == 1
    area = m.calculate_areas()[0]
    assert abs(area - (s - 1) ** 2) < 2  # contour polygon spans s-1 pixels
    mx, _ = m.calculate_max_feret_diameters()
    assert abs(mx[0] - (s - 1) * np.sqrt(2)) < 1.5  # diagonal
    mn, _ = m.calculate_min_feret_diameters()
    assert abs(mn[0] - (s - 1)) < 1.5  # side


def test_calibration_scaling():
    m1 = Measure(disc_image(), apply_watershed=False)
    m2 = Measure(disc_image(), apply_watershed=False,
                 pixel_distance=2.0, known_distance=10.0)  # cal = 5
    a1 = m1.calculate_areas()[0]
    a2 = m2.calculate_areas()[0]
    assert abs(a2 - 25 * a1) < 1e-6
    p1 = m1.calculate_perimeters()[0]
    p2 = m2.calculate_perimeters()[0]
    assert abs(p2 - 5 * p1) < 1e-6


def test_mean_intensity_vs_pointpolygontest():
    """Vectorized mean intensity == reference pointPolygonTest definition."""
    rng = np.random.default_rng(7)
    img = disc_image(r=15)
    gray = (rng.random(img.shape) * 255).astype(np.uint8)
    m = Measure(img, apply_watershed=False, grayscale_image=gray)
    got = m.calculate_mean_intensities()[0]

    c = m.contours[0]
    xs = c[:, 0, 0]; ys = c[:, 0, 1]
    integral, a = 0.0, 0
    for x in range(xs.min(), xs.max() + 1):
        for y in range(ys.min(), ys.max() + 1):
            if cv2.pointPolygonTest(c, (float(x), float(y)), False) >= 0:
                integral += gray[y, x]
                a += 1
    want = integral / a
    assert abs(got - want) < 0.5  # raster-fill vs point test: tiny boundary diff


def test_edge_exclusion():
    img = np.zeros((64, 64), np.uint8)
    img[0:20, 0:20] = 255   # touches edge
    img[30:50, 30:50] = 255 # interior
    assert Measure(img, apply_watershed=False, exclude_edges=True).number == 1
    assert Measure(img, apply_watershed=False, exclude_edges=False).number == 2


def test_filter_results_area():
    img = np.zeros((128, 128), np.uint8)
    img[10:20, 10:20] = 255    # small
    img[40:90, 40:90] = 255    # large
    m = Measure(img, apply_watershed=False)
    assert m.number == 2
    m.filter_results("area", min_value=500)
    assert m.number == 1
    a = m.calculate_areas()
    assert a[0] > 500


def test_filter_mean_intensity_drops_dark_particles():
    # li threshold lands between the two modes; otsu would pick the first
    # bin (the dark value itself) on a two-valued image and drop nothing
    gray = np.full((128, 128), 20, np.uint8)
    gray[10:30, 10:30] = 200     # bright particle region
    mask = np.zeros_like(gray)
    mask[10:30, 10:30] = 255     # bright particle
    mask[60:80, 60:80] = 255     # artifact over dark background
    out = apply_mean_intensity_filter(gray, mask, threshold_method="li",
                                      dark_background=True,
                                      do_watershed_and_four_connectivity=False)
    assert out[15, 15] == 255    # kept
    assert out[70, 70] == 0      # dropped


def test_min_area_rects_and_feret_rects():
    img = square_image(s=30)
    m = Measure(img, apply_watershed=False)
    rects = m.calculate_min_area_rects()
    (c, (w, h), ang) = rects[0]
    assert abs(w - 29) < 1.5 and abs(h - 29) < 1.5
    frects = m.calculate_min_feret_rects()
    (_, (fw, fh), _) = frects[0]
    assert min(fw, fh) > 25 and max(fw, fh) < 45


def test_reference_name_aliases():
    m = Measure(disc_image(), applyWatershed=False, excludeEdges=True,
                darkBackground=True, pixelDistance=1.0, knownDistance=1.0)
    m.calculateAreas()
    m.calculateMaxFeretDiameters()
    m.filterResults("area", minValue=1.0)
    assert m.number == 1
