"""Particle classification network.

Capability parity with the reference's second-stage classifier
(`Other Scripts/Predict_Classes_And_Measure.py:220-357`): a CNN taking
concat(grayscale image tile, binary segmentation tile) (2 channels) and
emitting per-pixel class probabilities, used to auto-filter partially-
occluded / bad particles via per-particle mean class score. The reference
repo ships only the trained .h5 and inference driver (training code absent,
architecture unspecified beyond its I/O contract), so the network here is a
MultiRes-UNet trunk with a 2-channel input and N-class softmax head — the
same family as the reference's segmentation net, matching the documented
I/O and loss (`weighted_cce`, `Other Scripts/HelperFunctions.py:199-214`).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from semtpu.models.multires_unet import MultiResUNet


class ParticleClassifier(nn.Module):
    num_classes: int = 2
    filters: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, segmentation=None, train: bool = False):
        """image: (B,H,W,1) gray; segmentation: (B,H,W,1) binary.

        If `segmentation` is None, `image` is assumed to already be the
        2-channel concat.
        """
        if segmentation is not None:
            x = jnp.concatenate([image, segmentation], axis=-1)
        else:
            x = image
        return MultiResUNet(filters=self.filters,
                            output_channels=self.num_classes,
                            dtype=self.dtype)(x, train=train)
