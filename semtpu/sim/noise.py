"""Spatially-correlated gradient noise on device.

The reference drives particle clustering and correlated rotations with an
OpenSimplex noise field (`WassersteinGAN.py:419-425`), min-max normalized to
[-1, 1]. Here: classic 2-D Perlin gradient noise, fully vectorized in JAX
(one lattice-gather + smoothstep blend), same normalization and the same
statistical role (threshold -> clustered placement probability; value * 180
-> correlated rotation angles).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


@partial(jax.jit, static_argnames=("height", "width", "frequency"))
def perlin_field(key: jax.Array, height: int, width: int, frequency: int = 4) -> jax.Array:
    """(height, width) Perlin noise field, min-max normalized to [-1, 1].

    `frequency` = number of lattice cells along each axis (higher -> more,
    smaller patches — the reference's `perlin_noise_frequency`).
    """
    f = int(frequency)
    angles = jax.random.uniform(key, (f + 1, f + 1), minval=0.0,
                                maxval=2.0 * jnp.pi)
    gx = jnp.cos(angles)
    gy = jnp.sin(angles)

    ys = jnp.linspace(0.0, f, height, endpoint=False)
    xs = jnp.linspace(0.0, f, width, endpoint=False)
    Y, X = jnp.meshgrid(ys, xs, indexing="ij")
    y0 = jnp.floor(Y).astype(jnp.int32)
    x0 = jnp.floor(X).astype(jnp.int32)
    fy = Y - y0
    fx = X - x0

    def dot_corner(dy, dx):
        gyy = gy[y0 + dy, x0 + dx]
        gxx = gx[y0 + dy, x0 + dx]
        return gxx * (fx - dx) + gyy * (fy - dy)

    n00 = dot_corner(0, 0)
    n01 = dot_corner(0, 1)
    n10 = dot_corner(1, 0)
    n11 = dot_corner(1, 1)

    u = _fade(fx)
    v = _fade(fy)
    nx0 = n00 * (1 - u) + n01 * u
    nx1 = n10 * (1 - u) + n11 * u
    out = nx0 * (1 - v) + nx1 * v

    # reference normalization (`WassersteinGAN.py:423-425`): to [0, max],
    # halve, shift -> [-1, 1]
    out = out - jnp.min(out)
    out = out / (jnp.max(out) / 2.0)
    return out - 1.0
