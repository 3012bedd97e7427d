"""Independent host oracles for the device classical-vision ops.

skimage does not exist in this environment, so each test carries a small
trusted numpy implementation of the textbook definition (Otsu 1979, Li &
Tam 1998, Meyer priority-flood watershed) and compares the device op
against it on realistic mask-like data. Line-placement differences between
watershed formulations are tolerated (bounded pixel disagreement), while
thresholds and component structure must match exactly.
"""
import heapq

import numpy as np
import pytest
import scipy.ndimage as ndi

from semtpu.ops import (threshold_otsu, threshold_li, watershed, segment,
                        peak_local_max)


# ------------------------------------------------------------------ oracles

def otsu_oracle_u8(img):
    """Otsu over 256 unit bins: argmax of between-class variance, first bin
    of a flat valley."""
    counts = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = counts.sum()
    best_t, best_v = 0, -1.0
    csum = np.cumsum(counts)
    cmean = np.cumsum(counts * np.arange(256))
    mean_all = cmean[-1] / total
    for t in range(256):
        w0 = csum[t] / total
        w1 = 1.0 - w0
        if w0 == 0 or w1 == 0:
            continue
        mu0 = cmean[t] / csum[t]
        mu1 = (cmean[-1] - cmean[t]) / (total - csum[t])
        v = w0 * w1 * (mu0 - mu1) ** 2
        if v > best_v + 1e-12:
            best_v, best_t = v, t
    return best_t


def li_oracle(img):
    """Li & Tam (1998) iterative minimum cross-entropy threshold."""
    x = img.astype(np.float64).ravel()
    x = x - x.min()
    x = x[x > 0]
    tol = 0.5 if np.issubdtype(img.dtype, np.integer) else x.max() / 512.0
    t = x.mean()
    while True:
        fore = x[x > t]
        back = x[x <= t]
        if len(fore) == 0 or len(back) == 0:
            break
        mf, mb = fore.mean(), back.mean()
        t_new = ((mf - mb) / (np.log(mf) - np.log(mb))
                 if mb > 0 else mf / np.log(mf))
        if abs(t_new - t) <= tol:
            t = t_new
            break
        t = t_new
    return t + img.astype(np.float64).min()


def watershed_oracle(neg_distance, markers, mask, line=True):
    """Meyer's priority-flood watershed with watershed lines: grow labels
    from markers in increasing `neg_distance` order (4-connectivity). A
    pixel whose labeled neighbors disagree at claim time becomes a 1-px
    watershed line (stays 0)."""
    h, w = neg_distance.shape
    WSLINE = -2
    labels = np.where(mask, 0, -1)
    labels[markers > 0] = markers[markers > 0]
    heap = []
    counter = 0
    ys, xs = np.nonzero(markers > 0)
    for y, x in zip(ys, xs):
        heapq.heappush(heap, (neg_distance[y, x], counter, y, x))
        counter += 1
    nbrs = ((-1, 0), (1, 0), (0, -1), (0, 1))
    while heap:
        _, _, y, x = heapq.heappop(heap)
        for dy, dx in nbrs:
            ny, nx = y + dy, x + dx
            if not (0 <= ny < h and 0 <= nx < w) or labels[ny, nx] != 0:
                continue
            seen = {labels[ny + ddy, nx + ddx]
                    for ddy, ddx in nbrs
                    if 0 <= ny + ddy < h and 0 <= nx + ddx < w
                    and labels[ny + ddy, nx + ddx] > 0}
            if line and len(seen) > 1:
                labels[ny, nx] = WSLINE
                continue
            labels[ny, nx] = max(seen) if seen else labels[y, x]
            heapq.heappush(heap, (neg_distance[ny, nx], counter, ny, nx))
            counter += 1
    labels[labels < 0] = 0
    return labels


def _blob_image(rng, size=96, n=6, r=(8, 14)):
    """Touching-discs mask, the watershed regime the pipeline actually runs."""
    m = np.zeros((size, size), bool)
    ys, xs = np.mgrid[:size, :size]
    centers = []
    for _ in range(n):
        cy, cx = rng.integers(16, size - 16, 2)
        rr = rng.integers(*r)
        m |= (ys - cy) ** 2 + (xs - cx) ** 2 <= rr ** 2
        centers.append((cy, cx))
    return m


# ------------------------------------------------------------------- tests

@pytest.mark.parametrize("kind", ["bimodal", "sem_like", "uniform"])
def test_otsu_matches_oracle_exactly(kind, rng):
    if kind == "bimodal":
        img = np.concatenate([rng.normal(50, 10, 3000),
                              rng.normal(180, 15, 1500)])
    elif kind == "sem_like":
        img = np.concatenate([rng.normal(40, 6, 5000),
                              rng.normal(150, 30, 800),
                              rng.normal(220, 10, 700)])
    else:
        img = rng.random(4000) * 255
    img = np.clip(img, 0, 255).astype(np.uint8).reshape(-1, 100)
    got = float(np.asarray(threshold_otsu(img)))
    want = otsu_oracle_u8(img)
    assert got == pytest.approx(want, abs=1e-3)


def test_li_matches_oracle(rng):
    img = np.concatenate([rng.normal(45, 8, 4000),
                          rng.normal(190, 20, 1200)])
    img = np.clip(img, 0, 255).astype(np.uint8).reshape(-1, 80)
    got = float(np.asarray(threshold_li(img)))
    want = li_oracle(img)
    assert got == pytest.approx(want, abs=1.0)   # within one gray level


def test_watershed_matches_priority_flood_oracle(rng):
    mask = _blob_image(rng)
    dist = ndi.distance_transform_edt(mask)
    dist = ndi.gaussian_filter(dist, sigma=1.0)
    peaks = np.asarray(peak_local_max(dist, min_distance=9))
    markers, n_markers = ndi.label(peaks)
    assert n_markers >= 2

    got = np.asarray(watershed(-dist, markers, mask, watershed_line=True))
    want = watershed_oracle(-dist, markers, mask, line=True)

    # same marker set -> same regions up to line placement; each marker's
    # label must dominate the same basin
    got_bin = got > 0
    want_bin = want > 0
    disagreement = np.count_nonzero(got_bin != want_bin) / max(mask.sum(), 1)
    assert disagreement < 0.06, f"line placement drift {disagreement:.3f}"
    # exact label agreement away from the (ambiguous) ridge lines
    core = got_bin & want_bin
    frac_same = (got[core] == want[core]).mean()
    assert frac_same > 0.97
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    _, n_got = ndi.label(got_bin, structure=s4)
    _, n_want = ndi.label(want_bin, structure=s4)
    assert n_got == n_want


def test_segment_splits_like_oracle_across_thresholds(rng):
    """The IoU-protocol path: per-threshold segment() instance counts track
    the oracle's within +-1 on SEM-like maps."""
    mask = _blob_image(rng, n=5)
    raw = ndi.gaussian_filter(mask.astype(np.float32), 3)
    raw = (raw / raw.max() * 255).astype(np.uint8)
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for t in (64, 128, 192):
        seg = np.asarray(segment(raw, threshold=float(t), apply_watershed=True,
                                 min_distance=9, dark_background=True))
        m = raw > t
        if m.min() == m.max():
            continue
        # the oracle pipeline end-to-end with scipy EDT/gaussian: marker
        # counts may drift by a peak or two from the device pipeline (the
        # smoothed distance maps differ at float tolerance), so each side
        # is held to ITS OWN marker count — watershed must produce exactly
        # one 4-connected region per marker
        dist = ndi.gaussian_filter(ndi.distance_transform_edt(m), 1.0)
        peaks = np.asarray(peak_local_max(dist, min_distance=9))
        markers, n_markers = ndi.label(peaks)
        want = watershed_oracle(-dist, markers, m, line=True)
        _, n_want = ndi.label(want > 0, structure=s4)
        assert n_want == n_markers
        _, n_got = ndi.label(seg > 0, structure=s4)
        assert abs(n_got - n_markers) <= 2
        # binary foreground (away from lines) agrees
        disagreement = np.count_nonzero((seg > 0) != (want > 0)) / max(m.sum(), 1)
        assert disagreement < 0.12
