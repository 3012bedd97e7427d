"""Native measurement core: parity with scipy/device ops + speed sanity."""
import numpy as np
import pytest
import scipy.ndimage as ndi

from semtpu import native


def blobs(rng, shape=(128, 160), n=10):
    m = np.zeros(shape, bool)
    ys, xs = np.mgrid[:shape[0], :shape[1]]
    for _ in range(n):
        cy, cx = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        r = rng.integers(4, 12)
        m |= (ys - cy) ** 2 + (xs - cx) ** 2 <= r ** 2
    return m


def test_native_builds():
    assert native.available(), "g++ build of libsemtpu_native.so failed"


@pytest.mark.parametrize("conn", [1, 2])
def test_cc_label_matches_scipy(conn, rng):
    m = blobs(rng)
    lab, n = native.cc_label(m, connectivity=conn)
    structure = ndi.generate_binary_structure(2, conn)
    want, n_want = ndi.label(m, structure=structure)
    assert n == n_want
    np.testing.assert_array_equal(lab, want)


def test_cc_stats_matches_numpy(rng):
    m = blobs(rng)
    gray = (rng.random(m.shape) * 255).astype(np.uint8)
    lab, n = native.cc_label(m)
    areas, means, bbox = native.cc_stats(lab, n, gray)
    want_areas = np.bincount(lab.ravel(), minlength=n + 1)[1:]
    np.testing.assert_array_equal(areas, want_areas)
    sums = np.bincount(lab.ravel(), weights=gray.ravel().astype(np.float64),
                       minlength=n + 1)[1:]
    np.testing.assert_allclose(means, sums / np.maximum(want_areas, 1))
    for k in range(n):
        ys, xs = np.nonzero(lab == k + 1)
        assert tuple(bbox[k]) == (ys.min(), xs.min(), ys.max(), xs.max())


def test_cc_filter(rng):
    m = blobs(rng)
    lab, n = native.cc_label(m)
    areas, _, _ = native.cc_stats(lab, n)
    keep = areas > np.median(areas)
    out = native.cc_filter(lab, n, keep)
    assert set(np.unique(out)) <= {0, 255}
    lab2, n2 = native.cc_label(out)
    assert n2 == int(keep.sum())


def test_eight_to_four_matches_device_op(rng):
    from semtpu.ops import eight_to_four_connected
    img = (rng.random((64, 80)) > 0.45).astype(np.uint8) * 255
    got = native.eight_to_four(img)
    want = np.asarray(eight_to_four_connected(img))
    np.testing.assert_array_equal(got, want)


def test_native_speed_on_pipeline_shape(rng):
    """1024x768 mask with ~1e3 particles labels+stats well under 50 ms."""
    import time
    m = blobs(rng, (768, 1024), n=400)
    gray = (rng.random(m.shape) * 255).astype(np.uint8)
    native.cc_label(m)  # warm (lazy build)
    t0 = time.perf_counter()
    lab, n = native.cc_label(m)
    native.cc_stats(lab, n, gray)
    dt = time.perf_counter() - t0
    assert dt < 0.25, f"native label+stats took {dt:.3f}s"
