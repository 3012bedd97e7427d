"""Dataset indexes + device-resident batching.

Replaces the reference's keras Sequence loaders (`UNet_Segmentation.py:21-145`,
`CycleGAN.py:454-479`) with HBM-resident arrays and index shuffling:

- `SegmentationDataset`: (image, mask, flip-augmentation) index with the
  reference's fixed-seed 80/20 split and x4 flip augmentation
  (`UNet_Segmentation.py:35-101`). Base images are stored once; flips are
  applied on device inside the jitted batch prep instead of materializing
  4x copies.
- `PairedDomainDataset`: CycleGAN (A, B) pairing with independent per-epoch
  domain shuffles (`CycleGAN.py:454-479`).
- `ArrayDataset`: plain array batching (WGAN masks).

Batch sizes are rounded to a multiple of the device count by the trainers so
batches shard cleanly over the mesh.
"""
from __future__ import annotations

import random as _random

import jax
import jax.numpy as jnp
import numpy as np


def apply_flip(imgs: jax.Array, aug_codes: jax.Array) -> jax.Array:
    """Apply per-sample flip augmentation on device.

    aug 0: identity, 1: fliplr, 2: flipud, 3: both
    (`UNet_Segmentation.py:93-98`).
    """
    flip_lr = (aug_codes % 2 == 1)[:, None, None, None]
    flip_ud = (aug_codes >= 2)[:, None, None, None]
    lr = jnp.flip(imgs, axis=2)
    out = jnp.where(flip_lr, lr, imgs)
    ud = jnp.flip(out, axis=1)
    return jnp.where(flip_ud, ud, out)


class SegmentationDataset:
    """(image, mask) pairs with flip augmentation and fixed-seed split."""

    def __init__(self, images: np.ndarray, masks: np.ndarray, subset: str = "train",
                 train_val_split: float = 0.8, seed: int = 1234, augment: bool = True):
        assert subset in ("train", "val")
        n = images.shape[0]
        order = list(range(n))
        _random.Random(seed).shuffle(order)
        cut = int(train_val_split * n)
        keep = order[:cut] if subset == "train" else order[cut:]
        self.images = np.asarray(images[keep], dtype=np.float32)
        self.masks = np.asarray(masks[keep], dtype=np.float32)
        n_aug = 4 if augment else 1
        base = np.arange(len(keep))
        self.index = np.stack([np.repeat(base, n_aug),
                               np.tile(np.arange(n_aug), len(keep))], axis=1)

    def __len__(self):
        return len(self.index)

    def class_weighting(self) -> float:
        """#background / #foreground over the mask set
        (`UNet_Segmentation.py:363-376`)."""
        ones = float(np.count_nonzero(self.masks))
        zeros = float(self.masks.size - ones)
        return zeros / max(ones, 1.0)

    def batches(self, rng: np.random.Generator, batch_size: int, shuffle: bool = True,
                drop_remainder: bool = True):
        """Yield (images, masks, aug_codes) host batches."""
        idx = self.index.copy()
        if shuffle:
            rng.shuffle(idx)
        n_batches = len(idx) // batch_size if drop_remainder else -(-len(idx) // batch_size)
        for b in range(n_batches):
            sel = idx[b * batch_size:(b + 1) * batch_size]
            yield (self.images[sel[:, 0]], self.masks[sel[:, 0]],
                   sel[:, 1].astype(np.int32))


class PairedDomainDataset:
    """CycleGAN (A, B) batches; domains shuffled independently per epoch."""

    def __init__(self, domain_a: np.ndarray, domain_b: np.ndarray):
        self.a = np.asarray(domain_a, dtype=np.float32)
        self.b = np.asarray(domain_b, dtype=np.float32)

    def __len__(self):
        return min(len(self.a), len(self.b))

    def batches(self, rng: np.random.Generator, batch_size: int):
        ia = rng.permutation(len(self.a))
        ib = rng.permutation(len(self.b))
        n = min(len(ia), len(ib)) // batch_size
        for k in range(n):
            sa = ia[k * batch_size:(k + 1) * batch_size]
            sb = ib[k * batch_size:(k + 1) * batch_size]
            yield self.a[sa], self.b[sb]


class ArrayDataset:
    """Plain shuffled batching over one array (WGAN training masks)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, dtype=np.float32)

    def __len__(self):
        return len(self.data)

    def batches(self, rng: np.random.Generator, batch_size: int):
        idx = rng.permutation(len(self.data))
        for k in range(len(idx) // batch_size):
            yield self.data[idx[k * batch_size:(k + 1) * batch_size]]
