"""Loss functions of the three training stages.

References:
- weighted BCE (class-balanced), `UNet_Segmentation.py:379-384`
- LSGAN adversarial (MSE vs label-smoothed targets), `CycleGAN.py:301-308`
- Wasserstein critic/generator losses, `WassersteinGAN.py:689-698`
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def binary_crossentropy(y_true, y_pred):
    """Per-pixel BCE with keras-style probability clipping."""
    p = jnp.clip(y_pred, _EPS, 1.0 - _EPS)
    return -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))


def weighted_bce(y_true, y_pred, weighting: float):
    """Class-balanced BCE: weights = y_true * (w - 1) + 1, mean(bce * w)."""
    weights = y_true * (weighting - 1.0) + 1.0
    return jnp.mean(binary_crossentropy(y_true, y_pred) * weights)


def mae_loss(y_true, y_pred):
    return jnp.mean(jnp.abs(y_true - y_pred))


def mse_loss(y_true, y_pred):
    return jnp.mean((y_true - y_pred) ** 2)


def lsgan_real_loss(logits, label_smoothing: float = 0.0):
    """MSE against ones (optionally label-smoothed: 1 -> 1-s/2)."""
    target = jnp.ones_like(logits) * (1.0 - label_smoothing) + label_smoothing / 2
    return jnp.mean((logits - target) ** 2)


def lsgan_fake_loss(logits, label_smoothing: float = 0.0):
    """MSE against zeros (reference smooths toward s/2, `CycleGAN.py:307`)."""
    target = jnp.zeros_like(logits) * (1.0 - label_smoothing) + label_smoothing / 2
    return jnp.mean((logits - target) ** 2)


def wasserstein_d_loss(real_logits, fake_logits):
    return jnp.mean(fake_logits) - jnp.mean(real_logits)


def wasserstein_g_loss(fake_logits):
    return -jnp.mean(fake_logits)
