"""WGAN-GP particle-shape generator/critic nets (flax.linen, NHWC).

Architecture parity with the reference
(`Releases/Version 1.2.0/WassersteinGAN.py:546-683`):

- generator: z(latent) -> Dense(h/8 * w/8 * 256, no bias) -> BN -> LeakyReLU
  -> reshape -> 3 x [Upsample2x -> Conv3x3 -> BN -> LeakyReLU(0.2)] with
  filters 128 -> 64 -> 1 (tanh)
- critic: 4 x [Conv5x5 s2 'same' + LeakyReLU(0.2), dropout 0.3 on the middle
  two] -> flatten -> dropout 0.2 -> Dense(1)

Output shape (img_h, img_w) must be a multiple of 8 for the generator and 16
for the critic stack (the reference pads its training masks to a multiple of
16, `WassersteinGAN.py:344-353`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class WGANGenerator(nn.Module):
    img_h: int
    img_w: int
    latent_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        h8, w8 = self.img_h // 8, self.img_w // 8
        x = nn.Dense(h8 * w8 * 256, use_bias=False, dtype=self.dtype)(z)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, 0.2)
        x = x.reshape((-1, h8, w8, 256))

        for filters, act in ((128, "lrelu"), (64, "lrelu"), (1, "tanh")):
            b, hh, ww, c = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, c), method="nearest")
            x = nn.Conv(filters, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32)(x)
            x = nn.leaky_relu(x, 0.2) if act == "lrelu" else nn.tanh(x)
        return x.astype(jnp.float32)


class WGANDiscriminator(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for filters, drop in ((64, 0.0), (128, 0.3), (256, 0.3), (512, 0.0)):
            x = nn.Conv(filters, (5, 5), strides=(2, 2), padding="SAME",
                        use_bias=True, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            if drop > 0:
                x = nn.Dropout(drop, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Dense(1, dtype=self.dtype)(x)
        return x.astype(jnp.float32)
