"""Shared layer primitives for the semtpu model zoo (flax.linen, NHWC)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def reflect_pad(x: jax.Array, pad_w: int, pad_h: int) -> jax.Array:
    """Reflection padding with the reference's asymmetric split.

    Total padding (pad_w, pad_h) split as (p//2, p//2 + p%2) per side
    (`CycleGAN.py:482-506`). x is NHWC.
    """
    if pad_w == 0 and pad_h == 0:
        return x
    return jnp.pad(x, (
        (0, 0),
        (pad_h // 2, pad_h // 2 + pad_h % 2),
        (pad_w // 2, pad_w // 2 + pad_w % 2),
        (0, 0),
    ), mode="reflect")


def crop_to(x: jax.Array, pad_w: int, pad_h: int) -> jax.Array:
    """Inverse of :func:`reflect_pad` (keras Cropping2D split)."""
    if pad_w == 0 and pad_h == 0:
        return x
    h0, h1 = pad_h // 2, pad_h // 2 + pad_h % 2
    w0, w1 = pad_w // 2, pad_w // 2 + pad_w % 2
    return x[:, h0:x.shape[1] - h1, w0:x.shape[2] - w1, :]


def pad_to_multiple(hw: tuple[int, int], multiple: int) -> tuple[int, int]:
    """Total (pad_h, pad_w) needed to reach the next multiple."""
    h, w = hw
    return ((multiple - h % multiple) % multiple,
            (multiple - w % multiple) % multiple)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization (keras GroupNormalization
    groups=-1, epsilon=1e-5 — `CycleGAN.py:329`)."""
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        # statistics in float32 regardless of compute dtype (bf16-safe)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        y = ((x32 - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        c = x.shape[-1]
        if self.use_scale:
            gamma = self.param("scale", nn.initializers.ones, (c,))
            y = y * gamma
        if self.use_bias:
            beta = self.param("bias", nn.initializers.zeros, (c,))
            y = y + beta
        return y


def leaky_relu(x, negative_slope=0.2):
    return nn.leaky_relu(x, negative_slope=negative_slope)
