"""MultiRes-UNet segmentation network (flax.linen, NHWC).

Architecture parity with the reference
(`Releases/Version 1.2.0/UNet_Segmentation.py:401-562`):

- conv2d_bn: Conv (no bias) -> BatchNorm(eps 1e-3, momentum 0.99, no scale)
  -> activation
- MultiResBlock(u, alpha=1.67): three chained 3x3 convs with filter split
  int(w*.167)/int(w*.333)/int(w*.5) concatenated, 1x1 BN shortcut, BN-add-
  relu-BN tail
- ResPath(filters, length): chain of 3x3-conv residual units with 1x1
  shortcuts
- 4 encoder stages + bottleneck (filters * 2^k, k=0..4), decoder stages
  with ConvTranspose(2x2, s2) + skip concat; decoder MultiResBlocks use the
  reference's literal widths 32*8 / 32*4 / 32*2 / filters
  (`UNet_Segmentation.py:542-552`)
- reflection-pad input to a multiple of 16, crop back, 1x1 sigmoid (1ch) or
  softmax (Nch) head

The network is shape-polymorphic: any HxW input works (padding computed from
the traced shape), so whole-image inference is the same module — no
rebuild-and-copy-weights step as in the reference (`UNet_Segmentation.py:315-320`).
Compute dtype is configurable (bfloat16 on TPU by default for conv/matmul
MXU throughput) with float32 parameters and normalization statistics.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from semtpu.models.layers import reflect_pad, crop_to, pad_to_multiple


class ConvBN(nn.Module):
    filters: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    activation: str | None = "relu"
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=1e-3, use_scale=False, dtype=jnp.float32)(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "sigmoid":
            x = nn.sigmoid(x)
        return x


class MultiResBlock(nn.Module):
    u: int
    alpha: float = 1.67
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.alpha * self.u
        f1, f2, f3 = int(w * 0.167), int(w * 0.333), int(w * 0.5)
        if f1 < 1:
            raise ValueError(
                f"MultiResBlock width u={self.u} too small: the narrowest "
                f"branch would get {f1} filters; use filters >= 4")
        shortcut = ConvBN(f1 + f2 + f3, (1, 1), activation=None,
                          bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
        c3 = ConvBN(f1, (3, 3), bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
        c5 = ConvBN(f2, (3, 3), bn_momentum=self.bn_momentum, dtype=self.dtype)(c3, train)
        c7 = ConvBN(f3, (3, 3), bn_momentum=self.bn_momentum, dtype=self.dtype)(c5, train)
        out = jnp.concatenate([c3, c5, c7], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                           epsilon=1e-3, dtype=jnp.float32)(out)
        out = shortcut + out
        out = nn.relu(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                           epsilon=1e-3, dtype=jnp.float32)(out)
        return out


class ResPath(nn.Module):
    filters: int
    length: int
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.length):
            shortcut = ConvBN(self.filters, (1, 1), activation=None,
                              bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
            out = ConvBN(self.filters, (3, 3), bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
            out = shortcut + out
            out = nn.relu(out)
            x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                             epsilon=1e-3, dtype=jnp.float32)(out)
        return x


class MultiResUNet(nn.Module):
    filters: int = 16
    output_channels: int = 1
    # keras-default momentum (reference parity); lower it for short runs so
    # eval-mode statistics track training
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        pad_h, pad_w = pad_to_multiple((x.shape[1], x.shape[2]), 16)
        x = reflect_pad(x.astype(self.dtype), pad_w, pad_h)

        skips = []
        widths = [f, f * 2, f * 4, f * 8]
        for i, u in enumerate(widths):
            m = MultiResBlock(u, bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
            skips.append(ResPath(u, 4 - i, bn_momentum=self.bn_momentum, dtype=self.dtype)(m, train))
            x = nn.max_pool(m, (2, 2), strides=(2, 2))

        x = MultiResBlock(f * 16, bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)

        # reference decoder widths are literal 32*{8,4,2} then `filters`
        # (`UNet_Segmentation.py:542-552`)
        dec_widths = [32 * 8, 32 * 4, 32 * 2, f]
        up_filters = [f * 8, f * 4, f * 2, f]
        for w_dec, uf, skip in zip(dec_widths, up_filters, reversed(skips)):
            up = nn.ConvTranspose(uf, (2, 2), strides=(2, 2), padding="SAME",
                                  dtype=self.dtype)(x)
            x = jnp.concatenate([up, skip], axis=-1)
            x = MultiResBlock(w_dec, bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)

        x = crop_to(x, pad_w, pad_h)

        if self.output_channels == 1:
            x = ConvBN(1, (1, 1), activation="sigmoid", bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
        else:
            x = nn.Conv(self.output_channels, (1, 1), dtype=self.dtype)(x)
            x = nn.softmax(x, axis=-1)
        return x.astype(jnp.float32)
