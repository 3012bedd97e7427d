"""Space-to-depth repacked MultiRes-UNet inference (exact equivalence).

Round-4 profiling (PROFILE_UNET.json) pinned UNet throughput to HBM traffic,
with ~1/3 of the bytes being pure 128-lane channel padding: the full-
resolution stages carry 16-33 channels at 384^2, and the TPU vector layout
pads the channel (lane) dimension to 128, so ~75-87% of the HBM traffic on
those stages moves zeros. This module removes that waste WITHOUT changing
the network function: it evaluates the SAME parameters via a space-to-depth
change of basis, trading 2x2 spatial blocks for 4x channels on every
full-resolution tensor (384^2 x C -> 192^2 x 4C), which packs the lane
dimension ~4x denser. This is the standard TPU recipe for low-channel conv
stacks (cf. the public TPU ResNet "conv0 space-to-depth" optimization); here
it is applied as an exact weight remap so outputs are bit-identical up to
float summation order:

- channel-MAJOR repacking c' = c*4 + (di*2+dj) makes channel concatenation
  commute with repacking (concat of repacked == repacked concat), which the
  MultiResBlock three-branch concat and the decoder skip concat rely on;
- a stride-1 3x3 conv at 384^2 becomes a stride-1 3x3 conv at 192^2 over
  4C channels whose kernel is a sparse scatter of the original 3x3 taps
  (each output sub-position reads the 9 original taps from the correct
  neighbor block / sub-position);
- a 1x1 conv becomes a block-diagonal 1x1 conv (same weights per sub-pos);
- 2x2 stride-2 max-pool becomes a max over the 4 sub-position channels,
  returning the NORMAL layout at the pooled resolution — so only the
  full-resolution stages (encoder stage 1, ResPath 1, decoder stage 4, the
  sigmoid head) run repacked and the rest of the network is untouched;
- the decoder's ConvTranspose(2x2, stride 2) into full resolution is
  EXACTLY a 1x1 conv producing the repacked layout (kernel==stride, so
  each output sub-position is one tap);
- inference BatchNorm is a per-channel affine -> parameters repeat 4x.

Only inference (train=False) is implemented: training BatchNorm would need
cross-sub-position moment aggregation to stay exact, and the quality-
bearing training loop keeps the straightforward layout. The measured
operating point for inference is bench.py, which times this path against
the plain forward and reports the faster (both recorded in
BENCH_DETAILS.json).

Architecture parity notes are in models/multires_unet.py (reference:
`Releases/Version 1.2.0/UNet_Segmentation.py:401-562`); this module mirrors
that wiring exactly — see test_s2d.py for the f32 bit-equivalence oracle.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import lax

from semtpu.models.layers import reflect_pad, crop_to, pad_to_multiple

_DN = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x):
    """[N,H,W,C] -> [N,H/2,W/2,4C], channel-major: c' = c*4 + (di*2+dj)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)            # (n, h/2, w/2, c, di, dj)
    return x.reshape(n, h // 2, w // 2, c * 4)


def depth_to_space(x):
    """Inverse of :func:`space_to_depth`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)            # (n, h, di, w, dj, c)
    return x.reshape(n, h * 2, w * 2, c)


def remap_conv3x3(w):
    """[3,3,Ci,Co] -> [3,3,4Ci,4Co] block kernel on the repacked layout.

    Output sub-position (di,dj) tap (u,v) in {-1,0,1}^2 reads original row
    di+u = 2*block_offset + sub_row, so the original tap lands at block
    kernel position (block_offset+1) and input sub-position (sub_row,
    sub_col). The map (u,v) -> (block, sub) is injective per (di,dj), so
    plain scatter-set builds the kernel; 3/4 of it stays zero (the FLOP
    overhead is irrelevant — these stages sit on the HBM roof at ~2% MFU).
    """
    ci, co = w.shape[2], w.shape[3]
    w4 = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for di in range(2):
        for dj in range(2):
            so = di * 2 + dj
            for u in (-1, 0, 1):
                for v in (-1, 0, 1):
                    bi, si = (di + u) // 2, (di + u) % 2
                    bj, sj = (dj + v) // 2, (dj + v) % 2
                    w4 = w4.at[bi + 1, bj + 1, si * 2 + sj::4, so::4].set(
                        w[u + 1, v + 1])
    return w4


def remap_conv1x1(w):
    """[1,1,Ci,Co] -> block-diagonal [1,1,4Ci,4Co] (same weights per sub-pos)."""
    ci, co = w.shape[2], w.shape[3]
    w4 = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for s in range(4):
        w4 = w4.at[0, 0, s::4, s::4].set(w[0, 0])
    return w4


def remap_convtranspose2(w):
    """ConvTranspose(2x2, stride 2) kernel [2,2,Ci,Co] -> 1x1 conv [1,1,Ci,4Co].

    Kernel size == stride means each full-resolution output sub-position is
    exactly one tap of the low-resolution input: out(2i+di, 2j+dj) =
    x(i,j) @ K[1-di,1-dj] (lax.conv_transpose applies the kernel spatially
    flipped) — a 1x1 conv whose outputs land directly in the repacked
    layout.
    """
    ci, co = w.shape[2], w.shape[3]
    w4 = jnp.zeros((1, 1, ci, 4 * co), w.dtype)
    for di in range(2):
        for dj in range(2):
            w4 = w4.at[0, 0, :, (di * 2 + dj)::4].set(w[1 - di, 1 - dj])
    return w4


def _rep4(p):
    """Tile per-channel BN/bias parameters to the repacked layout (c-major)."""
    return jnp.repeat(p, 4)


def _conv(x, w, dtype):
    return lax.conv_general_dilated(x.astype(dtype), w.astype(dtype),
                                    (1, 1), "SAME", dimension_numbers=_DN)


def _bn_inf(x, params, stats, *, rep=False, eps=1e-3):
    """Inference BatchNorm: per-channel affine in f32 (flax parity)."""
    mean, var = stats["mean"], stats["var"]
    bias = params["bias"]
    scale = params.get("scale")
    inv = lax.rsqrt(var + eps) if scale is None else scale * lax.rsqrt(var + eps)
    shift = bias - mean * inv
    if rep:
        inv, shift = _rep4(inv), _rep4(shift)
    return x.astype(jnp.float32) * inv + shift


def unet_apply_s2d(variables, x, *, filters=16, output_channels=1,
                   dtype: Any = jnp.bfloat16):
    """Inference forward of MultiResUNet with repacked full-res stages.

    Takes the UNALTERED variables of models.multires_unet.MultiResUNet
    (params + batch_stats) and computes the same function as
    ``model.apply(variables, x, train=False)`` — full-resolution stages in
    the space-to-depth basis, everything else verbatim. f32-exact up to
    summation order (oracle: tests/test_s2d.py).
    """
    if output_channels != 1:
        raise NotImplementedError("s2d path covers the 1-channel sigmoid head")
    params, stats = variables["params"], variables["batch_stats"]

    def convbn(x, pp, ss, act, rep, remap):
        w = pp["Conv_0"]["kernel"]
        if remap is not None:
            w = remap(w)
        y = _conv(x, w, dtype)
        y = _bn_inf(y, pp["BatchNorm_0"], ss["BatchNorm_0"], rep=rep)
        if act == "relu":
            y = jnp.maximum(y, 0)
        elif act == "sigmoid":
            y = jnp.reciprocal(1 + jnp.exp(-y))
        return y

    def mrb(x, name, *, rep=False):
        pp, ss = params[name], stats[name]
        rm3 = remap_conv3x3 if rep else None
        rm1 = remap_conv1x1 if rep else None

        def sub(x, i, act="relu", remap=None):
            return convbn(x, pp[f"ConvBN_{i}"], ss[f"ConvBN_{i}"],
                          act, rep, remap)

        shortcut = sub(x, 0, act=None, remap=rm1)
        c3 = sub(x, 1, remap=rm3)
        c5 = sub(c3, 2, remap=rm3)
        c7 = sub(c5, 3, remap=rm3)
        out = jnp.concatenate([c3, c5, c7], axis=-1)
        out = _bn_inf(out, pp["BatchNorm_0"], ss["BatchNorm_0"], rep=rep)
        out = jnp.maximum(shortcut + out, 0)
        return _bn_inf(out, pp["BatchNorm_1"], ss["BatchNorm_1"], rep=rep)

    def respath(x, name, length, *, rep=False):
        pp, ss = params[name], stats[name]
        rm3 = remap_conv3x3 if rep else None
        rm1 = remap_conv1x1 if rep else None
        for k in range(length):
            shortcut = convbn(x, pp[f"ConvBN_{2 * k}"],
                              ss[f"ConvBN_{2 * k}"], None, rep, rm1)
            out = convbn(x, pp[f"ConvBN_{2 * k + 1}"],
                         ss[f"ConvBN_{2 * k + 1}"], "relu", rep, rm3)
            out = jnp.maximum(shortcut + out, 0)
            x = _bn_inf(out, pp[f"BatchNorm_{k}"], ss[f"BatchNorm_{k}"],
                        rep=rep)
        return x

    f = filters
    pad_h, pad_w = pad_to_multiple((x.shape[1], x.shape[2]), 16)
    x = reflect_pad(x.astype(dtype), pad_w, pad_h)

    # ---- encoder stage 1: repacked ----------------------------------------
    xr = space_to_depth(x)
    m0 = mrb(xr, "MultiResBlock_0", rep=True)
    skip0 = respath(m0, "ResPath_0", 4, rep=True)      # stays repacked
    # 2x2 s2 max-pool == max over the 4 sub-position channels (c-major)
    n, hh, ww, c4 = m0.shape
    x = m0.reshape(n, hh, ww, c4 // 4, 4).max(axis=-1)

    # ---- encoder stages 2-4 + bottleneck: normal layout --------------------
    skips = []
    for i, u in enumerate([f * 2, f * 4, f * 8], start=1):
        m = mrb(x, f"MultiResBlock_{i}")
        skips.append(respath(m, f"ResPath_{i}", 4 - i))
        x = lax.reduce_window(m, -jnp.inf, lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    x = mrb(x, "MultiResBlock_4")

    # ---- decoder stages 1-3: normal layout ---------------------------------
    for j, skip in enumerate(reversed(skips)):          # j = 0,1,2
        ct = params[f"ConvTranspose_{j}"]
        up = lax.conv_transpose(x.astype(dtype), ct["kernel"].astype(dtype),
                                (2, 2), "SAME", dimension_numbers=_DN)
        up = up + ct["bias"].astype(dtype)
        x = jnp.concatenate([up, skip.astype(dtype)], axis=-1)
        x = mrb(x, f"MultiResBlock_{5 + j}")

    # ---- decoder stage 4 + head: repacked ----------------------------------
    ct = params["ConvTranspose_3"]
    up = _conv(x, remap_convtranspose2(ct["kernel"]), dtype)
    up = up + _rep4(ct["bias"]).astype(dtype)
    xr = jnp.concatenate([up, skip0.astype(dtype)], axis=-1)
    xr = mrb(xr, "MultiResBlock_8", rep=True)
    y = convbn(xr, params["ConvBN_0"], stats["ConvBN_0"],
               "sigmoid", True, remap_conv1x1)
    y = depth_to_space(y)

    y = crop_to(y, pad_w, pad_h)
    return y.astype(jnp.float32)
