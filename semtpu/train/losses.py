"""Loss functions of the three training stages.

References:
- weighted BCE (class-balanced), `UNet_Segmentation.py:379-384`
- LSGAN adversarial (MSE vs label-smoothed targets), `CycleGAN.py:301-308`
- Wasserstein critic/generator losses, `WassersteinGAN.py:689-698`
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def masked_mean(x, valid=None):
    """Mean over the batch restricted to `valid` samples.

    x: (B, ...); valid: (B,) bool/float or None. With valid=None (or all
    ones over equal-sized samples) this equals jnp.mean(x). Used to keep
    the EFFECTIVE global batch equal to the configured one when a batch is
    padded up to a multiple of the device-mesh size: padded samples carry
    valid=0 and contribute nothing to any loss, gradient, or metric.
    """
    if valid is None:
        return jnp.mean(x)
    m = jnp.mean(x.reshape(x.shape[0], -1), axis=1)
    v = valid.astype(m.dtype)
    return jnp.sum(m * v) / jnp.maximum(jnp.sum(v), 1.0)


def binary_crossentropy(y_true, y_pred):
    """Per-pixel BCE with keras-style probability clipping."""
    p = jnp.clip(y_pred, _EPS, 1.0 - _EPS)
    return -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))


def weighted_bce(y_true, y_pred, weighting: float, valid=None):
    """Class-balanced BCE: weights = y_true * (w - 1) + 1, mean(bce * w)."""
    weights = y_true * (weighting - 1.0) + 1.0
    return masked_mean(binary_crossentropy(y_true, y_pred) * weights, valid)


def mae_loss(y_true, y_pred, valid=None):
    return masked_mean(jnp.abs(y_true - y_pred), valid)


def mse_loss(y_true, y_pred, valid=None):
    return masked_mean((y_true - y_pred) ** 2, valid)


def lsgan_real_loss(logits, label_smoothing: float = 0.0, valid=None):
    """MSE against ones (optionally label-smoothed: 1 -> 1-s/2)."""
    target = jnp.ones_like(logits) * (1.0 - label_smoothing) + label_smoothing / 2
    return masked_mean((logits - target) ** 2, valid)


def lsgan_fake_loss(logits, label_smoothing: float = 0.0, valid=None):
    """MSE against zeros (reference smooths toward s/2, `CycleGAN.py:307`)."""
    target = jnp.zeros_like(logits) * (1.0 - label_smoothing) + label_smoothing / 2
    return masked_mean((logits - target) ** 2, valid)


def wasserstein_d_loss(real_logits, fake_logits, valid=None):
    return masked_mean(fake_logits, valid) - masked_mean(real_logits, valid)


def wasserstein_g_loss(fake_logits, valid=None):
    return -masked_mean(fake_logits, valid)
