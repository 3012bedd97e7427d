"""Particle size/shape measurement engine.

Capability parity with the reference `Measurements.Measure`
(`Releases/Version 1.2.0/Measurements.py:10-655`): contour extraction,
areas (shoelace), perimeters, mean intensities under the mask, convex hulls,
min/max Feret diameters (rotating calipers), convexness & completeness
scores, min-area / min-Feret bounding rects, and value-range filtering of
all parallel result lists.

Contours are irregular host-side structures (cv2), but every per-particle
inner loop of the reference is replaced by vectorized numpy:

- mean intensities: the reference runs ``cv2.pointPolygonTest`` per pixel
  (O(area) Python per particle, `Measurements.py:321-342`); here each
  particle is a filled bbox-local raster + one masked reduction.
- min Feret: the reference enumerates antipodal-pair pairs (O(h^2) with
  Python loops, `Measurements.py:392-441`); here the standard min-width
  over hull edges, vectorized over all (edge, vertex) pairs at once.

Calibration semantics (knownDistance / pixelDistance scaling, including the
reference's quirk of calibrating the *denominator* of mean intensities) are
preserved so CSV outputs are drop-in comparable.

Method names are snake_case; the reference's camelCase names are provided
as aliases so existing driver scripts can port with no edits.
"""
from __future__ import annotations

import numpy as np
import cv2

from semtpu.ops import segment as _device_segment


def _polygon_area(x: np.ndarray, y: np.ndarray) -> float:
    """Shoelace formula (reference `Measurements.py:90-103`)."""
    x_ = x.astype(np.float64) - x.mean()
    y_ = y.astype(np.float64) - y.mean()
    correction = x_[-1] * y_[0] - y_[-1] * x_[0]
    main_area = np.dot(x_[:-1], y_[1:]) - np.dot(y_[:-1], x_[1:])
    return 0.5 * abs(main_area + correction)


def _perimeter(pts: np.ndarray) -> float:
    """Closed-polygon perimeter from an (N, 2) point array."""
    d = pts - np.roll(pts, -1, axis=0)
    return float(np.sqrt((d.astype(np.float64) ** 2).sum(axis=1)).sum())


def _convex_hull(pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotone-chain (Graham scan by x) upper and lower hulls.

    Same construction as the reference (`Measurements.py:360-390`): points
    sorted by x only (stable), strict left/right turns popped.
    """
    order = np.argsort(pts[:, 0], kind="stable")
    P = pts[order].astype(np.float64)
    U: list[np.ndarray] = []
    L: list[np.ndarray] = []
    for p in P:
        while len(U) > 1 and _orient(U[-2], U[-1], p) <= 0:
            U.pop()
        while len(L) > 1 and _orient(L[-2], L[-1], p) >= 0:
            L.pop()
        U.append(p)
        L.append(p)
    return np.asarray(U), np.asarray(L)


def _orient(p, q, r) -> float:
    return (q[1] - p[1]) * (r[0] - p[0]) - (q[0] - p[0]) * (r[1] - p[1])


def _rotating_calipers(U: np.ndarray, L: np.ndarray):
    """Yield antipodal point pairs (reference `Measurements.py:230-261`)."""
    i, j = 0, len(L) - 1
    if len(U) == 1 and len(L) == 1:
        # degenerate single-point hull: the loop below would yield nothing
        # (diameter 0, mirroring _min_width's n == 1 branch)
        yield U[0], L[0]
        return
    while i < len(U) - 1 or j > 0:
        yield U[i], L[j]
        if i == len(U) - 1:
            j -= 1
        elif j == 0:
            i += 1
        elif (U[i + 1][1] - U[i][1]) * (L[j][0] - L[j - 1][0]) > \
                (L[j][1] - L[j - 1][1]) * (U[i + 1][0] - U[i][0]):
            i += 1
        else:
            j -= 1


def _min_width(hull: np.ndarray) -> tuple[float, np.ndarray]:
    """Minimum width of a convex polygon (min Feret diameter).

    For every hull edge, the farthest vertex distance to the edge line;
    minimum over edges. Vectorized over all (edge, vertex) pairs.
    Returns (width, points) where points = [foot-of-perpendicular, vertex],
    the same geometry the reference stores in minFeretPoints.
    """
    h = hull.astype(np.float64)
    n = len(h)
    if n == 1:
        return 0.0, np.stack([h[0], h[0]])
    a = h                       # edge starts (n, 2)
    b = np.roll(h, -1, axis=0)  # edge ends
    e = b - a
    elen = np.sqrt((e ** 2).sum(axis=1))
    keep = elen > 1e-12
    if not keep.any():
        return 0.0, np.stack([h[0], h[0]])
    a, b, e, elen = a[keep], b[keep], e[keep], elen[keep]
    # distance of each vertex to each edge line: |cross(e, v - a)| / |e|
    v = h[None, :, :] - a[:, None, :]                      # (E, V, 2)
    cross = np.abs(e[:, None, 0] * v[:, :, 1] - e[:, None, 1] * v[:, :, 0])
    dist = cross / elen[:, None]                           # (E, V)
    far = dist.argmax(axis=1)
    widths = dist[np.arange(len(a)), far]
    k = widths.argmin()
    width = float(widths[k])
    vtx = h[far[k]]
    # foot of perpendicular from vtx onto edge k's line
    t = np.dot(vtx - a[k], e[k]) / (elen[k] ** 2)
    foot = a[k] + t * e[k]
    return width, np.stack([foot, vtx]).astype(np.float32)


class Measure:
    """Measure objects (particles) in a binary or gray image.

    Drop-in analog of the reference class; see module docstring.
    """

    FILTER_TYPES = {
        "area", "completenessScore", "convexnessScore", "meanIntensity",
        "maxFeretDiameter", "minFeretDiameter", "perimeter",
        "minAreaRects", "minFeretRects",
    }

    def __init__(self, img, pixel_distance=1.0, known_distance=1.0, unit="pixels",
                 threshold=-1.0, dark_background=False, apply_watershed=True,
                 exclude_edges=True, grayscale_image=None, min_distance=9,
                 # reference-compatible aliases
                 pixelDistance=None, knownDistance=None, darkBackground=None,
                 applyWatershed=None, excludeEdges=None, grayscaleImage=None):
        if pixelDistance is not None:
            pixel_distance = pixelDistance
        if knownDistance is not None:
            known_distance = knownDistance
        if darkBackground is not None:
            dark_background = darkBackground
        if applyWatershed is not None:
            apply_watershed = applyWatershed
        if excludeEdges is not None:
            exclude_edges = excludeEdges
        if grayscaleImage is not None:
            grayscale_image = grayscaleImage

        img = np.asarray(img)
        if img.ndim != 2:
            img = cv2.cvtColor(img.copy(), cv2.COLOR_BGR2GRAY)
        # not already a clean {0, 255} binary image -> threshold (+watershed)
        if np.any((img > 1) & (img < 255)) or np.all((img >= 0) & (img <= 1)):
            self.image = np.asarray(
                Measure.segment(img, threshold=threshold, dark_background=dark_background,
                                apply_watershed=apply_watershed, min_distance=min_distance))
        else:
            self.image = np.asarray(img.copy(), dtype=np.uint8)

        self.gs_image = None
        if grayscale_image is not None:
            g = np.asarray(grayscale_image)
            if g.ndim != 2:
                g = cv2.cvtColor(g.copy(), cv2.COLOR_BGR2GRAY)
            self.gs_image = g

        self.pixel_distance = float(pixel_distance)
        self.known_distance = float(known_distance)
        self.unit = unit
        self.exclude_edges = exclude_edges

        self.contours: list[np.ndarray] = []
        self.contour_hierarchy = None
        self.number = 0
        self.areas = None
        self.perimeters = None
        self.mean_intensities = None
        self.convex_hulls = None
        self._hull_upper = None
        self._hull_lower = None
        self.max_feret_diameters = None
        self.max_feret_points = None
        self.min_feret_diameters = None
        self.min_feret_points = None
        self.convexness_scores = None
        self.completeness_scores = None
        self.min_area_rects = None
        self.min_feret_rects = None

        self._calculate_contours()

    # -- calibration helper -------------------------------------------------
    @property
    def _cal(self) -> float:
        return self.known_distance / self.pixel_distance

    # -- segmentation (delegates to the device stack) -----------------------
    @staticmethod
    def segment(image, threshold=-1.0, apply_watershed=True, min_distance=9,
                dark_background=False, applyWatershed=None, darkBackground=None):
        if applyWatershed is not None:
            apply_watershed = applyWatershed
        if darkBackground is not None:
            dark_background = darkBackground
        return np.asarray(_device_segment(
            np.asarray(image), threshold=float(threshold),
            apply_watershed=bool(apply_watershed),
            min_distance=int(min_distance), dark_background=bool(dark_background)))

    # -- contours ------------------------------------------------------------
    def _calculate_contours(self):
        found, hierarchy = cv2.findContours(self.image, mode=cv2.RETR_TREE,
                                            method=cv2.CHAIN_APPROX_SIMPLE)
        contours = list(found)
        h, w = self.image.shape
        kept = []
        for c in contours:
            pts = c[:, 0, :]  # (N, 2) as (x, y)
            touches_edge = (pts[:, 0] >= w - 1).any() or (pts[:, 1] >= h - 1).any() or (c == 0).any()
            if touches_edge:
                if self.exclude_edges:
                    continue
            elif len(c) < 5 and _perimeter(pts) < 8:
                continue
            kept.append(c)
        self.contours = kept
        self.contour_hierarchy = hierarchy
        self.number = len(self.contours)

    # -- measurements ----------------------------------------------------------
    def calculate_areas(self):
        cal2 = self._cal ** 2
        self.areas = [
            _polygon_area(c[:, 0, 0], c[:, 0, 1]) * cal2 for c in self.contours
        ]
        return self.areas

    def calculate_perimeters(self):
        self.perimeters = [_perimeter(c[:, 0, :]) * self._cal for c in self.contours]
        return self.perimeters

    def calculate_mean_intensities(self):
        """Mean gray value under each contour.

        Same quantity as the reference (`Measurements.py:321-342`): sum of
        gray values over pixels with pointPolygonTest >= 0, divided by
        (pixel count * cal^2)  [sic - the reference calibrates the count].
        Implemented as a bbox-local filled raster + masked reduction instead
        of a per-pixel Python loop.
        """
        assert self.gs_image is not None, "grayscale_image required for mean intensities"
        cal2 = self._cal ** 2
        out = []
        for c in self.contours:
            xs = c[:, 0, 0]
            ys = c[:, 0, 1]
            x0, x1 = int(xs.min()), int(xs.max())
            y0, y1 = int(ys.min()), int(ys.max())
            local = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=np.uint8)
            shifted = (c - np.asarray([x0, y0])).astype(np.int32)
            cv2.drawContours(local, [shifted], -1, 1, thickness=cv2.FILLED)
            region = self.gs_image[y0:y1 + 1, x0:x1 + 1]
            a = int(local.sum())
            integral = float((region.astype(np.float64) * local).sum())
            out.append(integral / (a * cal2) if integral > 0 else 0.0)
        self.mean_intensities = out
        return out

    def calculate_convex_hulls(self):
        self._hull_upper = []
        self._hull_lower = []
        self.convex_hulls = []
        for c in self.contours:
            U, L = _convex_hull(c[:, 0, :])
            self._hull_upper.append(U)
            self._hull_lower.append(L)
            hull = np.concatenate([U, L[::-1][1:-1]]) if len(L) > 2 else U
            self.convex_hulls.append([hull[:, None, :].astype(np.int64)])
        return self.convex_hulls

    def calculate_max_feret_diameters(self):
        if self.convex_hulls is None:
            self.calculate_convex_hulls()
        self.max_feret_diameters = []
        self.max_feret_points = []
        for U, L in zip(self._hull_upper, self._hull_lower):
            pairs = list(_rotating_calipers(U, L))
            d = np.asarray([
                np.hypot(q[0] - p[0], q[1] - p[1]) for p, q in pairs
            ])
            k = int(d.argmax())
            self.max_feret_diameters.append(float(d[k]) * self._cal)
            self.max_feret_points.append(np.asarray(pairs[k]))
        return self.max_feret_diameters, self.max_feret_points

    def calculate_min_feret_diameters(self):
        if self.convex_hulls is None:
            self.calculate_convex_hulls()
        self.min_feret_diameters = []
        self.min_feret_points = []
        for hull in self.convex_hulls:
            pts = hull[0][:, 0, :]
            width, p = _min_width(pts)
            self.min_feret_diameters.append(width * self._cal)
            self.min_feret_points.append(p)
        return self.min_feret_diameters, self.min_feret_points

    def calculate_convexness_scores(self, dim=2):
        assert dim in (1, 2)
        if self.convex_hulls is None:
            self.calculate_convex_hulls()
        self.convexness_scores = []
        for i, hull in enumerate(self.convex_hulls):
            pts = hull[0][:, 0, :]
            if dim == 1:
                if self.perimeters is None:
                    self.calculate_perimeters()
                hull_perim = _perimeter(pts) * self._cal
                self.convexness_scores.append(hull_perim / self.perimeters[i])
            else:
                if self.areas is None:
                    self.calculate_areas()
                hull_area = _polygon_area(pts[:, 0].astype(np.float64),
                                          pts[:, 1].astype(np.float64))
                if not hull_area or np.isnan(hull_area):
                    self.convexness_scores.append(1.0)
                else:
                    self.convexness_scores.append(
                        self.areas[i] / (hull_area * self._cal ** 2))
        return self.convexness_scores

    def calculate_completeness_scores(self):
        if self.areas is None:
            self.calculate_areas()
        self.completeness_scores = []
        for i, c in enumerate(self.contours):
            if len(c) < 5:
                self.completeness_scores.append(self.areas[i] / len(c))
                continue
            (_, (MA, ma), _) = cv2.fitEllipse(c)
            if not MA or not ma or np.isnan(MA) or np.isnan(ma):
                self.completeness_scores.append(2)
            else:
                self.completeness_scores.append(
                    self.areas[i] / (np.pi * MA / 2.0 * ma / 2.0 * self._cal ** 2))
        return self.completeness_scores

    def calculate_min_area_rects(self):
        self.min_area_rects = []
        for c in self.contours:
            (ctr, (rw, rh), ang) = cv2.minAreaRect(c)
            self.min_area_rects.append((ctr, (rw * self._cal, rh * self._cal), ang))
        return self.min_area_rects

    def calculate_min_feret_rects(self):
        if self.min_feret_diameters is None:
            self.calculate_min_feret_diameters()
        self.min_feret_rects = []
        for i, hull in enumerate(self.convex_hulls):
            pts = hull[0][:, 0, :].astype(np.float64)
            p0, p1 = self.min_feret_points[i]
            d = np.hypot(p1[0] - p0[0], p1[1] - p0[1])
            if d < 1e-12:
                angle = 0.0
            else:
                angle = float(np.rad2deg(np.arccos(np.clip((p1[0] - p0[0]) / d, -1, 1))))
                if p1[1] < p0[1]:
                    angle = -angle
            M = cv2.moments(pts[:, None, :].astype(np.int32))
            if M["m00"] != 0:
                cx, cy = int(M["m10"] / M["m00"]), int(M["m01"] / M["m00"])
            else:
                cx, cy = int(pts[:, 0].mean()), int(pts[:, 1].mean())
            theta = np.deg2rad(-angle)
            R = np.asarray([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]])
            rot = (pts - [cx, cy]) @ R.T
            width = (rot[:, 0].max() - rot[:, 0].min()) * self._cal
            height = (rot[:, 1].max() - rot[:, 1].min()) * self._cal
            self.min_feret_rects.append(((cx, cy), (width, height), angle))
        return self.min_feret_rects

    # -- filtering -------------------------------------------------------------
    _FILTER_CALCS = {
        "area": ("areas", "calculate_areas"),
        "completenessScore": ("completeness_scores", "calculate_completeness_scores"),
        "convexnessScore": ("convexness_scores", "calculate_convexness_scores"),
        "meanIntensity": ("mean_intensities", "calculate_mean_intensities"),
        "maxFeretDiameter": ("max_feret_diameters", "calculate_max_feret_diameters"),
        "minFeretDiameter": ("min_feret_diameters", "calculate_min_feret_diameters"),
        "perimeter": ("perimeters", "calculate_perimeters"),
        "minAreaRects": ("min_area_rects", "calculate_min_area_rects"),
        "minFeretRects": ("min_feret_rects", "calculate_min_feret_rects"),
    }

    def filter_results(self, filter_type, min_value=0.0, max_value=-1.0,
                       minValue=None, maxValue=None):
        """Drop particles whose `filter_type` value lies outside [min, max].

        Reference semantics (`Measurements.py:569-655`): max_value < min_value
        disables the upper bound; all computed parallel lists are pruned.
        """
        if minValue is not None:
            min_value = minValue
        if maxValue is not None:
            max_value = maxValue
        assert filter_type in self.FILTER_TYPES
        if min_value == 0 and max_value < min_value:
            return

        attr, calc = self._FILTER_CALCS[filter_type]
        if getattr(self, attr) is None:
            getattr(self, calc)()
        values = getattr(self, attr)

        for i in range(self.number - 1, -1, -1):
            if filter_type in ("minAreaRects", "minFeretRects"):
                big = max(values[i][1][0], values[i][1][1])
                small = min(values[i][1][0], values[i][1][1])
                drop = big < min_value or (small > max_value >= min_value)
            else:
                v = values[i]
                drop = v < min_value or (v > max_value >= min_value)
            if drop:
                self._remove_shape(i)
        self.number = len(self.contours)

    def _remove_shape(self, i):
        for attr in ("areas", "completeness_scores", "convexness_scores",
                     "contours", "_hull_lower", "_hull_upper", "convex_hulls",
                     "max_feret_diameters", "max_feret_points",
                     "min_feret_diameters", "min_feret_points", "perimeters",
                     "mean_intensities", "min_area_rects", "min_feret_rects"):
            lst = getattr(self, attr)
            if lst is not None:
                del lst[i]

    # -- reference-name aliases --------------------------------------------
    calculateAreas = calculate_areas
    calculatePerimeters = calculate_perimeters
    calculateMeanIntensities = calculate_mean_intensities
    calculateConvexHulls = calculate_convex_hulls
    calculateMaxFeretDiameters = calculate_max_feret_diameters
    calculateMinFeretDiameters = calculate_min_feret_diameters
    calculateConvexnessScores = calculate_convexness_scores
    calculateCompletenessScores = calculate_completeness_scores
    calculateMinAreaRects = calculate_min_area_rects
    calculateMinFeretRects = calculate_min_feret_rects
    filterResults = filter_results

    @property
    def meanIntensities(self):
        return self.mean_intensities

    @property
    def minFeretDiameters(self):
        return self.min_feret_diameters

    @property
    def maxFeretDiameters(self):
        return self.max_feret_diameters

    @property
    def knownDistance(self):
        return self.known_distance

    @property
    def pixelDistance(self):
        return self.pixel_distance
