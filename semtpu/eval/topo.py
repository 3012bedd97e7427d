"""ISBI-style topology-aware segmentation metrics.

Capability parity with the reference's ImageJ metrics plugin
(`Archive/Other Scripts/calculate_Metrics.java:98-150`), which scores
predictions with the Fiji `trainableSegmentation.metrics` classes from the
ISBI-2012 challenge (Arganda-Carreras et al., Front. Neuroanat. 2015):

- `pixel_error_maximal_fscore` — 1 - max_t F1(pred > t, gt)
  (plugin `:101-104`, PixelError.getPixelErrorMaximalFScore(0, 1, 0.1)).
- `foreground_restricted_rand_error` — 1 - max_t V^Rand F-score where the
  contingency table is restricted to ground-truth FOREGROUND pixels and
  prediction-background pixels under GT foreground count as singleton
  segments (plugin `:119-127`,
  RandError.getForegroundRestrictedRandIndexMaximalFScore /
  getMaximalVRandAfterThinning). `thinning=True` first expands both
  partitions to nearest-component full partitions so only 1-px ridge lines
  separate segments — the border-thinned variant that scores segment
  topology rather than boundary thickness.
- `warping_error` — the Jain et al. (2010) digital-topology metric
  (plugin `:106-116`, WarpingError.getMinimumSplitsAndMergersErrorValue):
  the ground truth is warped onto the proposal by flipping only SIMPLE
  pixels (flips that preserve topology); remaining disagreements that
  would split a foreground component or merge two components are counted,
  minimized over the threshold sweep.

These are offline whole-image scores over label tables and 3x3
neighborhood lookups — host numpy by design (they run once per evaluation,
not in the training path).
"""
from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi

_S4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
_S8 = np.ones((3, 3), int)

# 8-neighborhood bit order (dy, dx): N, NE, E, SE, S, SW, W, NW
_NEIGH = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def _build_topo_luts():
    """For each of the 256 neighbor configurations: T4 = number of
    4-components of foreground neighbors that touch the center 4-adjacently,
    T8 = number of 8-components of background neighbors. A pixel is
    (4, 8)-simple iff T4 == 1 and T8 == 1 (Bertrand's connectivity
    numbers for the foreground-4 / background-8 adjacency pair used by
    4-connected particle masks)."""
    t4 = np.zeros(256, np.uint8)
    t8 = np.zeros(256, np.uint8)
    for cfg in range(256):
        fg = np.zeros((3, 3), bool)
        for b, (dy, dx) in enumerate(_NEIGH):
            if cfg >> b & 1:
                fg[1 + dy, 1 + dx] = True
        lab4, n4 = ndi.label(fg, structure=_S4)
        # count 4-components 4-adjacent to the center
        touch = {lab4[0, 1], lab4[1, 0], lab4[1, 2], lab4[2, 1]} - {0}
        t4[cfg] = len(touch)
        bg = ~fg
        bg[1, 1] = False
        _, n8 = ndi.label(bg, structure=_S8)
        t8[cfg] = n8
    return t4, t8


_T4_LUT, _T8_LUT = _build_topo_luts()


def _neighbor_codes(img: np.ndarray) -> np.ndarray:
    """Pack each pixel's 8-neighborhood into a byte (zero-padded borders)."""
    p = np.pad(img.astype(bool), 1)
    code = np.zeros(img.shape, np.uint16)
    for b, (dy, dx) in enumerate(_NEIGH):
        code |= (p[1 + dy:1 + dy + img.shape[0],
                   1 + dx:1 + dx + img.shape[1]].astype(np.uint16) << b)
    return code


def _binarize(pred, t):
    p = np.asarray(pred, np.float32)
    if p.max() > 1.0:
        p = p / 255.0
    return p > t


def _default_thresholds():
    return np.round(np.arange(0.0, 1.0 + 1e-9, 0.1), 10)


# ------------------------------------------------------------- pixel error

def pixel_error_maximal_fscore(pred, gt, thresholds=None) -> float:
    """1 - max_t F1 of the thresholded map vs the binary ground truth."""
    g = np.asarray(gt) > 0
    best = 0.0
    for t in (thresholds if thresholds is not None else _default_thresholds()):
        p = _binarize(pred, t)
        tp = float(np.count_nonzero(p & g))
        fp = float(np.count_nonzero(p & ~g))
        fn = float(np.count_nonzero(~p & g))
        f = 2 * tp / max(2 * tp + fp + fn, 1e-12)
        best = max(best, f)
    return float(1.0 - best)


# ----------------------------------------------- foreground-restricted Rand

def _thin_partition(binary: np.ndarray) -> np.ndarray:
    """Expand foreground components to a full nearest-component partition;
    only the equidistant ridge keeps label 0. Scores become insensitive to
    boundary thickness (the 'after thinning' variant)."""
    lab, n = ndi.label(binary, structure=_S4)
    if n == 0:
        return lab
    _, (iy, ix) = ndi.distance_transform_edt(lab == 0, return_indices=True)
    grown = lab[iy, ix]
    # reinstate a 1-px ridge where 4-neighbors disagree
    ridge = np.zeros_like(binary, bool)
    ridge[:-1] |= grown[:-1] != grown[1:]
    ridge[:, :-1] |= grown[:, :-1] != grown[:, 1:]
    out = grown.copy()
    out[ridge] = 0
    return out


def _vrand_fscore(pred_bin: np.ndarray, gt_bin: np.ndarray,
                  thinning: bool) -> float:
    if thinning:
        gl = _thin_partition(gt_bin)
        pl = _thin_partition(pred_bin)
    else:
        gl, _ = ndi.label(gt_bin, structure=_S4)
        pl, _ = ndi.label(pred_bin, structure=_S4)
    fg = gl > 0
    if not fg.any():
        return 1.0
    g = gl[fg].ravel()
    p = pl[fg].ravel()
    ng = int(g.max()) + 1
    npr = int(p.max()) + 1
    joint = np.bincount(p.astype(np.int64) * ng + g,
                        minlength=npr * ng).reshape(npr, ng).astype(np.float64)
    n0 = joint[0].sum()             # pred-background pixels: singletons
    body = joint[1:]
    sum_ab = (body ** 2).sum() + n0
    sum_b = (body.sum(axis=1) ** 2).sum() + n0
    sum_a = (joint.sum(axis=0) ** 2).sum()
    if sum_a == 0 or sum_b == 0:
        return 0.0
    precision = sum_ab / sum_b
    recall = sum_ab / sum_a
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def foreground_restricted_rand_error(pred, gt, thresholds=None,
                                     thinning: bool = False) -> float:
    """1 - max_t foreground-restricted V^Rand F-score."""
    g = np.asarray(gt) > 0
    best = 0.0
    for t in (thresholds if thresholds is not None else _default_thresholds()):
        best = max(best, _vrand_fscore(_binarize(pred, t), g, thinning))
    return float(1.0 - best)


# ------------------------------------------------------------ warping error

def _warp_once(warped: np.ndarray, target: np.ndarray) -> int:
    """One warping sweep: flip simple, disagreeing pixels of `warped`
    toward `target`. Pixels are processed in 9 color classes (y%3, x%3);
    same-class pixels are >= 3 apart, so their 3x3 neighborhoods are
    disjoint and the batched flips are EXACTLY a sequential simple-point
    sequence (no stale-simpleness hazard). Returns flip count."""
    flips = 0
    for cy in range(3):
        for cx in range(3):
            codes = _neighbor_codes(warped)
            simple = (_T4_LUT[codes] == 1) & (_T8_LUT[codes] == 1)
            cand = simple & (warped != target)
            cand[np.arange(warped.shape[0]) % 3 != cy, :] = False
            cand[:, np.arange(warped.shape[1]) % 3 != cx] = False
            n = int(np.count_nonzero(cand))
            if n:
                warped[cand] = target[cand]
                flips += n
    return flips


def warp_ground_truth(gt_bin: np.ndarray, target_bin: np.ndarray,
                      max_passes: int = 100) -> np.ndarray:
    """Warp `gt_bin` toward `target_bin` through simple-point flips only
    (topology of the ground truth is preserved exactly)."""
    warped = np.asarray(gt_bin, bool).copy()
    target = np.asarray(target_bin, bool)
    for _ in range(max_passes):
        if _warp_once(warped, target) == 0:
            break
    return warped


def _splits_and_mergers(warped: np.ndarray, target: np.ndarray) -> int:
    """Count residual disagreements that are topological: removing a
    foreground pixel whose T4 > 1 splits a component; adding one whose
    T4 > 1 merges components."""
    codes = _neighbor_codes(warped)
    t4 = _T4_LUT[codes]
    mism = warped != target
    splits = mism & warped & (t4 > 1)     # proposal wants it background
    mergers = mism & ~warped & (t4 > 1)   # proposal wants it foreground
    return int(np.count_nonzero(splits | mergers))


def warping_error(pred, gt, thresholds=None, max_passes: int = 100) -> float:
    """min_t (splits+mergers pixels)/(total pixels) after warping the GT
    onto the thresholded proposal (plugin `:106-116`; threshold sweep from
    floor(10*min)/10 to floor(10*(max-0.1))/10 like the plugin when none
    given)."""
    g = np.asarray(gt) > 0
    p = np.asarray(pred, np.float32)
    if p.max() > 1.0:
        p = p / 255.0
    if thresholds is None:
        lo = np.floor(10.0 * float(p.min())) / 10.0
        hi = np.floor(10.0 * (float(p.max()) - 0.1)) / 10.0
        thresholds = np.round(np.arange(lo, hi + 1e-9, 0.1), 10)
        if len(thresholds) == 0:
            thresholds = [0.5]
    best = np.inf
    for t in thresholds:
        tgt = p > t
        warped = warp_ground_truth(g, tgt, max_passes=max_passes)
        err = _splits_and_mergers(warped, tgt) / g.size
        best = min(best, err)
    return float(best)
