"""Exactness oracle for the space-to-depth repacked UNet inference path.

The s2d path (semtpu/models/s2d.py) claims to compute the SAME function as
MultiResUNet.apply(train=False) from the SAME variables, via a change of
basis. These tests pin that claim in f32 (tolerance only for summation
order) — first per-remap against raw lax convs, then the whole network
against the flax module, including the reflect-pad path for shapes that are
not multiples of 16.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from semtpu.models.multires_unet import MultiResUNet
from semtpu.models.s2d import (space_to_depth, depth_to_space,
                               remap_conv3x3, remap_conv1x1,
                               remap_convtranspose2, unet_apply_s2d)

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, strides=(1, 1)):
    return lax.conv_general_dilated(x, w, strides, "SAME",
                                    dimension_numbers=_DN)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 6, 5)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_s2d_channel_major_concat_commutes():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((1, 4, 4, 3)), jnp.float32)
    b = jnp.asarray(rng.random((1, 4, 4, 2)), jnp.float32)
    lhs = jnp.concatenate([space_to_depth(a), space_to_depth(b)], axis=-1)
    rhs = space_to_depth(jnp.concatenate([a, b], axis=-1))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


@pytest.mark.parametrize("ci,co", [(1, 7), (5, 3)])
def test_remap_conv3x3_equivalent(ci, co):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 12, 10, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    ref = _conv(x, w)
    out = depth_to_space(_conv(space_to_depth(x), remap_conv3x3(w)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_remap_conv1x1_equivalent():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 4, 6)), jnp.float32)
    ref = _conv(x, w)
    out = depth_to_space(_conv(space_to_depth(x), remap_conv1x1(w)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_remap_convtranspose2_equivalent():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 2, 4, 3)), jnp.float32)
    ref = lax.conv_transpose(x, w, (2, 2), "SAME", dimension_numbers=_DN)
    out = depth_to_space(_conv(x, remap_convtranspose2(w)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_remap_maxpool_equivalent():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    ref = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                            (1, 2, 2, 1), "VALID")
    xr = space_to_depth(x)
    n, h, w, c4 = xr.shape
    out = xr.reshape(n, h, w, c4 // 4, 4).max(axis=-1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _full_model_check(shape, filters=4):
    rng = np.random.default_rng(6)
    model = MultiResUNet(filters=filters, dtype=jnp.float32)
    x = jnp.asarray(rng.random((1,) + shape + (1,)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # give batch_stats non-trivial values so BN actually transforms
    variables = jax.tree.map(
        lambda a: a + 0.1 if a.ndim == 1 else a, variables)
    ref = model.apply(variables, x, train=False)
    out = unet_apply_s2d(variables, x, filters=filters, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_model_f32_equivalence():
    _full_model_check((32, 32))


@pytest.mark.slow
def test_full_model_f32_equivalence_reflect_pad():
    # 26x39 is not a multiple of 16 -> exercises reflect-pad + crop
    _full_model_check((26, 39))


@pytest.mark.slow
def test_full_model_bf16_close():
    rng = np.random.default_rng(7)
    model = MultiResUNet(filters=4, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False))
    out = np.asarray(unet_apply_s2d(variables, x, filters=4,
                                    dtype=jnp.bfloat16))
    # bf16 forwards differ only by summation order/rounding; sigmoid output
    assert np.abs(out - ref).max() < 0.05
    assert np.abs(out - ref).mean() < 0.005
