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
