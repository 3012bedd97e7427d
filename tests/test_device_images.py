"""DeviceImages: on-device decode must match the host loader exactly."""
import numpy as np
import pytest

from semtpu.data.dataset import DeviceImages
from semtpu.core.imageproc import preprocess_image


@pytest.mark.parametrize("kwargs", [
    dict(normalization_range=(0, 1)),
    dict(normalization_range=(-1, 1)),
    dict(normalization_range=(0, 1), contrast_optimization_range=(0.5, 99.5)),
    dict(normalization_range=(0, 1), threshold=0.5),
    dict(normalization_range=(-1, 1), invert=True),
])
def test_matches_host_loader(kwargs, rng):
    imgs = (rng.random((3, 40, 52)) * 255).astype(np.uint8)
    di = DeviceImages.from_uint8(imgs, **kwargs)
    got = np.asarray(di.gather(np.arange(3)))

    host_kwargs = dict(kwargs)
    thr = host_kwargs.pop("threshold", None)
    inv = host_kwargs.pop("invert", False)
    for i in range(3):
        want = np.asarray(preprocess_image(
            imgs[i][:, :, None].astype(np.float32),
            normalization_range=host_kwargs["normalization_range"],
            threshold_value=thr,
            contrast_optimization_range=host_kwargs.get(
                "contrast_optimization_range")))
        if inv:
            want = -want
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_float32_passthrough(rng):
    arr = rng.random((2, 16, 16, 1)).astype(np.float32)
    di = DeviceImages.from_float32(arr)
    np.testing.assert_array_equal(np.asarray(di.gather(np.array([1]))), arr[1:2])


# ---- brightness/contrast augmentation (UNet_Segmentation.py:83-87) --------

def _host_reference_aug(img_u8, c, lo, hi):
    """The reference's augmented load path: percentile clip at (c, c+98),
    min-max, random affine range (lo, hi), then re-min-max to [0, 1]."""
    image = img_u8.astype(np.float32)
    if c > 0:
        lb = np.percentile(image, c)
        ub = np.percentile(image, c + 98)
        image = np.where(image <= lb, lb, image)
        image = np.where(image >= ub, ub, image)
    image = image - np.min(image)
    image = image / np.max(image)
    image = lo + (hi - lo) * image
    image = image - np.min(image)
    image = image / np.max(image)
    return image


def test_contrast_window_matches_host_percentiles(rng):
    imgs = (rng.random((4, 37, 41)) * 255).astype(np.uint8)
    di = DeviceImages.from_uint8(imgs, normalization_range=(0, 1),
                                 aug_contrast=True)
    c = rng.random(4).astype(np.float32) * 2
    got = np.asarray(di.gather_contrast(np.arange(4), c))[:, :, :, 0]
    for i in range(4):
        # the random affine range is algebraically undone by the re-min-max;
        # any (lo, hi) must give the same result as the device path
        lo, hi = -rng.random(), 1 + rng.random()
        want = _host_reference_aug(imgs[i], float(c[i]), lo, hi)
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_gather_train_varies_and_val_is_deterministic(rng):
    import jax
    imgs = (rng.random((3, 24, 24)) * 255).astype(np.uint8)
    di = DeviceImages.from_uint8(imgs, normalization_range=(0, 1),
                                 aug_contrast=True)
    idx = np.arange(3)
    a = np.asarray(di.gather_train(idx, jax.random.PRNGKey(0)))
    b = np.asarray(di.gather_train(idx, jax.random.PRNGKey(1)))
    assert not np.allclose(a, b), "different keys must give different windows"
    # no key -> the deterministic val-mode decode
    np.testing.assert_array_equal(np.asarray(di.gather_train(idx, None)),
                                  np.asarray(di.gather(idx)))
    np.testing.assert_array_equal(np.asarray(di.gather(idx)),
                                  np.asarray(di.gather(idx)))


def test_aug_disabled_gather_train_is_gather(rng):
    imgs = (rng.random((2, 16, 16)) * 255).astype(np.uint8)
    import jax
    di = DeviceImages.from_uint8(imgs, normalization_range=(0, 1))
    np.testing.assert_array_equal(
        np.asarray(di.gather_train(np.arange(2), jax.random.PRNGKey(0))),
        np.asarray(di.gather(np.arange(2))))
