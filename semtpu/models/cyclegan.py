"""CycleGAN generator/discriminator nets (flax.linen, NHWC).

Architecture parity with the reference
(`Releases/Version 1.2.0/CycleGAN.py:323-451`):

- ResNet generator: reflect-pad to a multiple of 2^num_downsampling + (6,6)
  -> Conv7x7 valid -> InstanceNorm -> relu -> N x downsample (Conv3x3 s2) ->
  9 residual blocks (reflect-pad + valid Conv3x3 + IN + relu, x2, add) ->
  N x upsample (ConvTranspose3x3 s2, or resize-conv variant) -> reflect-pad
  (6,6) + Conv7x7 valid -> optional input-skip branch (1x1-conv shortcut +
  3x3-conv, add, concat, 1x1 conv) -> tanh (or sigmoid BCE head)
- PatchGAN discriminator: optional GaussianNoise(sigma) before every conv;
  Conv4x4 s2 *valid* padding (torch/tf parity note `CycleGAN.py:148`) +
  LeakyReLU(0.2); downsample blocks (s2, then s1 from block 3) with IN;
  final Conv4x4 s1 -> 1-channel patch logits.

Unlike the reference, the generator crops its pad-to-multiple padding back
off, so outputs always match input spatial dims for any shape (the reference
only handles shapes already divisible by 2^N and rebuilds the whole model
per image shape, `CycleGAN.py:243-251`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from semtpu.models.layers import reflect_pad, crop_to, pad_to_multiple, InstanceNorm


class _ResidualBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = reflect_pad(x, 2, 2)
        x = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        x = nn.relu(x)
        x = reflect_pad(x, 2, 2)
        x = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        return inp + x


class ResNetGenerator(nn.Module):
    filters: int = 64
    num_downsampling: int = 3
    num_residual_blocks: int = 9
    num_upsampling: int = 3
    out_channels: int = 1
    use_skip_connection: bool = False
    use_resize_convolution: bool = False
    sigmoid_head: bool = False       # BCE mask head (`CycleGAN.py:417-420`)
    # rematerialize each residual block in the backward pass: stores only
    # block inputs instead of every IN-separated conv activation, trading
    # ~2x residual-trunk FLOPs for less HBM activation traffic (the train
    # step is HBM-bound at ~19% MFU, so recompute is nearly free if the
    # traffic cut is real — the round-3 roofline experiment)
    remat_blocks: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        img_input = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]
        mult = 2 ** self.num_downsampling
        pad_h, pad_w = pad_to_multiple((in_h, in_w), mult)

        x = reflect_pad(img_input, pad_w, pad_h)
        x = reflect_pad(x, 6, 6)
        x = nn.Conv(self.filters, (7, 7), padding="VALID", use_bias=False, dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        x = nn.relu(x)

        f = self.filters
        for _ in range(self.num_downsampling):
            f *= 2
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = InstanceNorm()(x)
            x = nn.relu(x)

        Block = (nn.remat(_ResidualBlock) if self.remat_blocks
                 else _ResidualBlock)
        for i in range(self.num_residual_blocks):
            # explicit name: nn.remat's auto-name is Checkpoint_ResidualBlock,
            # which would shift the param tree (and RNG folding) away from
            # the non-remat layout — remat must be a pure execution knob
            x = Block(f, dtype=self.dtype, name=f"_ResidualBlock_{i}")(x)

        for _ in range(self.num_upsampling):
            f //= 2
            if self.use_resize_convolution:
                b, hh, ww, c = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, c), method="nearest")
                x = reflect_pad(x, 2, 2)
                x = nn.Conv(f, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype)(x)
            else:
                x = nn.ConvTranspose(f, (3, 3), strides=(2, 2), padding="SAME",
                                     use_bias=False, dtype=self.dtype)(x)
            x = InstanceNorm()(x)
            x = nn.relu(x)

        x = reflect_pad(x, 6, 6)
        x = nn.Conv(self.out_channels, (7, 7), padding="VALID", dtype=self.dtype)(x)
        x = crop_to(x, pad_w, pad_h)

        if self.use_skip_connection:
            shortcut = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype)(img_input)
            shortcut = InstanceNorm()(shortcut)
            shortcut = nn.relu(shortcut)

            out = reflect_pad(img_input, 2, 2)
            out = nn.Conv(f, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype)(out)
            out = InstanceNorm()(out)
            out = nn.relu(out)

            out = shortcut + out
            out = InstanceNorm()(out)
            out = nn.relu(out)

            x = jnp.concatenate([out, x], axis=-1)
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(x)

        x = nn.sigmoid(x) if self.sigmoid_head else nn.tanh(x)
        return x.astype(jnp.float32)


class PatchGANDiscriminator(nn.Module):
    filters: int = 128               # reference passes 2 * generator filters
    num_downsampling: int = 2
    gaussian_noise: float = 0.0
    dtype: Any = jnp.float32

    def _noise(self, x, train):
        if self.gaussian_noise > 0 and train:
            rng = self.make_rng("noise")
            x = x + self.gaussian_noise * jax.random.normal(rng, x.shape, x.dtype)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = self._noise(x, train)
        x = nn.Conv(self.filters, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)

        f = self.filters
        for block in range(self.num_downsampling):
            f *= 2
            strides = (2, 2) if block < 3 else (1, 1)
            x = self._noise(x, train)
            x = nn.Conv(f, (4, 4), strides=strides, padding="VALID",
                        use_bias=False, dtype=self.dtype)(x)
            x = InstanceNorm()(x)
            x = nn.leaky_relu(x, 0.2)

        x = self._noise(x, train)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID", dtype=self.dtype)(x)
        if x.shape[1] < 1 or x.shape[2] < 1:
            raise ValueError(
                f"input too small for the valid-padding PatchGAN stack: patch "
                f"logits would be {x.shape[1]}x{x.shape[2]}; use inputs >= 48px")
        return x.astype(jnp.float32)
