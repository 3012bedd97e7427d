"""ISBI-style topology metrics: simple-point LUTs, warping, FR-Rand, pixel F."""
import numpy as np
import pytest
import scipy.ndimage as ndi

from semtpu.eval.topo import (_T4_LUT, _T8_LUT, _neighbor_codes,
                              pixel_error_maximal_fscore,
                              foreground_restricted_rand_error,
                              warping_error, warp_ground_truth,
                              _thin_partition)


def _code_of(neigh):
    """neigh: 3x3 bool array -> packed config byte (center ignored)."""
    from semtpu.eval.topo import _NEIGH
    c = 0
    for b, (dy, dx) in enumerate(_NEIGH):
        if neigh[1 + dy, 1 + dx]:
            c |= 1 << b
    return c


def test_topo_luts_known_configs():
    # isolated pixel: no fg neighbors -> T4=0 (flip deletes an object)
    none = np.zeros((3, 3), bool)
    assert _T4_LUT[_code_of(none)] == 0
    # one 4-neighbor -> simple (T4=1, T8=1)
    one = np.zeros((3, 3), bool)
    one[0, 1] = True
    assert _T4_LUT[_code_of(one)] == 1 and _T8_LUT[_code_of(one)] == 1
    # two opposite 4-neighbors: bridge pixel -> T4=2 (flip splits)
    bridge = np.zeros((3, 3), bool)
    bridge[0, 1] = bridge[2, 1] = True
    assert _T4_LUT[_code_of(bridge)] == 2
    # full ring: interior of a blob -> T8 (background comps) == 0
    full = np.ones((3, 3), bool)
    assert _T8_LUT[_code_of(full)] == 0


def test_neighbor_codes_border_padding():
    img = np.ones((2, 2), bool)
    codes = _neighbor_codes(img)
    # corner pixel sees exactly its 3 in-bounds neighbors
    assert bin(int(codes[0, 0])).count("1") == 3


def test_pixel_error_maximal_fscore():
    gt = np.zeros((32, 32), np.uint8)
    gt[8:24, 8:24] = 255
    assert pixel_error_maximal_fscore(gt.astype(np.float32) / 255, gt) == 0.0
    assert pixel_error_maximal_fscore(1.0 - gt / 255.0, gt) > 0.5


def _two_discs(size=64, r=9, gap=6):
    ys, xs = np.mgrid[:size, :size]
    c1 = (size // 2, size // 2 - r - gap // 2)
    c2 = (size // 2, size // 2 + r + gap // 2)
    m = ((ys - c1[0]) ** 2 + (xs - c1[1]) ** 2 <= r ** 2) | \
        ((ys - c2[0]) ** 2 + (xs - c2[1]) ** 2 <= r ** 2)
    return m


def test_fr_rand_identity_and_merge():
    gt = _two_discs()
    assert foreground_restricted_rand_error(gt.astype(np.float32), gt * 255) \
        == pytest.approx(0.0, abs=1e-9)
    # merged prediction: one blob covering both discs -> nonzero error
    merged = ndi.binary_dilation(gt, iterations=5)
    e = foreground_restricted_rand_error(merged.astype(np.float32), gt * 255)
    assert e > 0.2


def test_fr_rand_thinning_ignores_boundary_thickness():
    gt = _two_discs(gap=8)
    thick = gt.copy()                      # 8-px separation
    thin = ndi.binary_dilation(gt, iterations=3)   # ~2-px separation
    assert thin.sum() > thick.sum()
    _, n_thin = ndi.label(thin)
    assert n_thin == 2                     # still two segments
    e = foreground_restricted_rand_error(thin.astype(np.float32), gt * 255,
                                         thinning=True)
    assert e == pytest.approx(0.0, abs=0.02)


def test_thin_partition_keeps_single_pixel_ridge():
    gt = _two_discs()
    part = _thin_partition(gt)
    assert part.max() == 2
    ridge = part == 0
    assert 0 < ridge.sum() < gt.size * 0.1


def test_warping_absorbs_boundary_shifts():
    gt = _two_discs()
    grown = ndi.binary_dilation(gt, iterations=2)
    _, n = ndi.label(grown, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    assert n == 2   # still separate
    # same topology, different geometry: warping error must be 0
    assert warping_error(grown.astype(np.float32), gt * 255,
                         thresholds=[0.5]) == 0.0


def test_warping_detects_merger():
    gt = _two_discs()
    merged = ndi.binary_dilation(gt, iterations=5)
    _, n = ndi.label(merged)
    assert n == 1
    e = warping_error(merged.astype(np.float32), gt * 255, thresholds=[0.5])
    assert e > 0.0


def test_topo_scores_cli_helper(tmp_path):
    from PIL import Image
    from semtpu.eval.__main__ import topo_scores
    gt_d = tmp_path / "gt"
    pr_d = tmp_path / "pred"
    gt_d.mkdir()
    pr_d.mkdir()
    gt = (_two_discs() * 255).astype(np.uint8)
    Image.fromarray(gt).save(gt_d / "a_m.tif")
    Image.fromarray(gt).save(pr_d / "a.tif")
    vals = topo_scores(str(pr_d), str(gt_d), crop_h=64, crop_w=64)
    assert len(vals) == 4
    assert vals[0] == pytest.approx(0.0, abs=1e-9)   # perfect prediction
    assert vals[1] == pytest.approx(0.0, abs=1e-9)
    assert vals[2] == pytest.approx(0.0, abs=1e-9)


def test_warp_preserves_topology():
    gt = _two_discs()
    target = ndi.binary_dilation(gt, iterations=3)
    warped = warp_ground_truth(gt, target)
    s4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    _, n_before = ndi.label(gt, structure=s4)
    _, n_after = ndi.label(warped, structure=s4)
    assert n_before == n_after == 2
