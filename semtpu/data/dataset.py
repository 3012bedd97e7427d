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
                 train_val_split: float = 0.8, seed: int = 1234, augment: bool = True,
                 image_preproc: dict | None = None, mask_preproc: dict | None = None):
        """images/masks: float32 (already preprocessed) or raw uint8 stacks
        with `image_preproc`/`mask_preproc` loader-parameter dicts — the
        uint8 form uploads 4x less and decodes on device (DeviceImages)."""
        assert subset in ("train", "val")
        n = images.shape[0]
        order = list(range(n))
        _random.Random(seed).shuffle(order)
        cut = int(train_val_split * n)
        keep = order[:cut] if subset == "train" else order[cut:]
        dt = np.uint8 if images.dtype == np.uint8 else np.float32
        self.images = np.asarray(images[keep], dtype=dt)
        dtm = np.uint8 if masks.dtype == np.uint8 else np.float32
        self.masks = np.asarray(masks[keep], dtype=dtm)
        self.image_preproc = image_preproc
        self.mask_preproc = mask_preproc
        n_aug = 4 if augment else 1
        base = np.arange(len(keep))
        self.index = np.stack([np.repeat(base, n_aug),
                               np.tile(np.arange(n_aug), len(keep))], axis=1)

    def __len__(self):
        return len(self.index)

    def class_weighting(self) -> float:
        """#background / #foreground over the mask set
        (`UNet_Segmentation.py:363-376`)."""
        if self.masks.dtype == np.uint8:
            thr = (self.mask_preproc or {}).get("threshold", 0.5)
            ones = float(np.count_nonzero(self.masks > thr * 255))
        else:
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

    def __init__(self, domain_a: np.ndarray, domain_b: np.ndarray,
                 a_preproc: dict | None = None, b_preproc: dict | None = None):
        da = np.uint8 if np.asarray(domain_a).dtype == np.uint8 else np.float32
        db = np.uint8 if np.asarray(domain_b).dtype == np.uint8 else np.float32
        self.a = np.asarray(domain_a, dtype=da)
        self.b = np.asarray(domain_b, dtype=db)
        self.a_preproc = a_preproc
        self.b_preproc = b_preproc

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

    def __init__(self, data: np.ndarray, preproc: dict | None = None):
        dt = np.uint8 if np.asarray(data).dtype == np.uint8 else np.float32
        self.data = np.asarray(data, dtype=dt)
        self.preproc = preproc

    def __len__(self):
        return len(self.data)

    def batches(self, rng: np.random.Generator, batch_size: int):
        idx = rng.permutation(len(self.data))
        for k in range(len(idx) // batch_size):
            yield self.data[idx[k * batch_size:(k + 1) * batch_size]]


import jax as _jax
from flax import struct as _struct


@_struct.dataclass
class DeviceImages:
    """Device-resident image stack with exact on-device preprocessing.

    For uint8 sources the host loader's whole chain — percentile contrast
    clip, min-max normalization, optional binarization, optional inversion
    (`semtpu.data.io.load_and_preprocess_images`) — is a per-image pointwise
    map: y01 = (clip(x, lb, ub) - mn) / (mx - mn); y = lo + (hi-lo) * f(y01).
    Storing the raw uint8 plus the per-image (lb, ub, scale, offset) scalars
    makes the device copy 4x smaller and bit-identical to the host pipeline,
    with decoding fused into the training step's batch gather.
    """
    data: any                 # (N, H, W, C) uint8 or float32
    scale01: any = None       # (N,) float32: y01 = clip(x)*scale01 + offset01
    offset01: any = None
    lb: any = None            # (N,) clip bounds in raw units
    ub: any = None
    cdf: any = None           # (N, 256) float32 cumulative pixel counts (aug path)
    out_range: tuple = _struct.field(pytree_node=False, default=(0.0, 1.0))
    threshold: float | None = _struct.field(pytree_node=False, default=None)
    invert: bool = _struct.field(pytree_node=False, default=False)
    quantized: bool = _struct.field(pytree_node=False, default=False)
    aug_contrast: bool = _struct.field(pytree_node=False, default=False)

    @classmethod
    def from_float32(cls, arr):
        return cls(data=jnp.asarray(arr, jnp.float32))

    @classmethod
    def from_uint8(cls, arr, normalization_range=(0.0, 1.0),
                   contrast_optimization_range=None, threshold=None,
                   invert=False, aug_contrast=False, host=False):
        """Build from a raw (N, H, W[, C]) uint8 stack on host.

        aug_contrast=True additionally stores per-image 256-bin cumulative
        histograms so `gather_train` can draw EXACT randomized percentile
        clip windows on device (brightness/contrast augmentation,
        `UNet_Segmentation.py:83-87`).

        host=True keeps every leaf as numpy (no upload): the streaming
        path slices such an instance per chunk with `slice_device_images`.
        """
        a = np.asarray(arr)
        assert a.dtype == np.uint8
        if a.ndim == 3:
            a = a[:, :, :, None]
        n = a.shape[0]
        lb = np.zeros(n, np.float32)
        ub = np.full(n, 255.0, np.float32)
        if contrast_optimization_range is not None:
            clo, chi = contrast_optimization_range
            if clo > 0 and chi < 100:
                flat = a.reshape(n, -1)
                lb = np.percentile(flat, clo, axis=1).astype(np.float32)
                ub = np.percentile(flat, chi, axis=1).astype(np.float32)
        flat = a.reshape(n, -1).astype(np.float32)
        mn = np.maximum(flat.min(axis=1), lb)
        mx = np.minimum(flat.max(axis=1), ub)
        span = np.maximum(mx - mn, 1e-12)
        cdf = None
        if aug_contrast:
            counts = np.stack([np.bincount(a[i].reshape(-1), minlength=256)
                               for i in range(n)])
            cdf = np.cumsum(counts, axis=1).astype(np.float32)
        wrap = (lambda x: x) if host else jnp.asarray
        return cls(data=wrap(a),
                   scale01=wrap((1.0 / span).astype(np.float32)),
                   offset01=wrap((-mn / span).astype(np.float32)),
                   lb=wrap(lb), ub=wrap(ub),
                   cdf=None if cdf is None else wrap(cdf),
                   out_range=tuple(normalization_range),
                   threshold=threshold, invert=bool(invert), quantized=True,
                   aug_contrast=bool(aug_contrast))

    def __len__(self):
        return self.data.shape[0]

    def gather(self, idx):
        """Decode a batch on device; idx: (B,) int array."""
        x = self.data[idx]
        if not self.quantized:
            return x
        x = x.astype(jnp.float32)
        s = self.scale01[idx][:, None, None, None]
        o = self.offset01[idx][:, None, None, None]
        lb = self.lb[idx][:, None, None, None]
        ub = self.ub[idx][:, None, None, None]
        y01 = jnp.clip(x, lb, ub) * s + o
        if self.threshold is not None:
            y01 = (y01 > self.threshold).astype(jnp.float32)
        lo, hi = self.out_range
        y = lo + (hi - lo) * y01
        if self.invert:
            y = -y
        return y

    def gather_train(self, idx, key=None):
        """Training-mode gather: brightness/contrast augmentation.

        Reproduces `UNet_Segmentation.py:83-87`: per sample a random
        percentile window `(c, c+98)` with `c ~ U[0, 2)` is clipped, a random
        affine range `(-U[0,1], 1+U[0,1])` is applied, then the image is
        re-min-max normalized to [0, 1]. The affine step is algebraically
        undone by the final min-max (the clipped image spans its window
        exactly), so the observable transform is the random contrast window
        followed by min-max to [0, 1] — implemented exactly on device via
        per-image cumulative histograms (np.percentile 'linear' semantics:
        pos = q/100*(npix-1), order statistics interpolated).
        """
        if not (self.quantized and self.aug_contrast and self.cdf is not None
                and key is not None):
            return self.gather(idx)
        c = jax.random.uniform(key, (idx.shape[0],), minval=0.0, maxval=2.0)
        return self.gather_contrast(idx, c)

    def gather_contrast(self, idx, c):
        """Decode a batch with explicit per-sample contrast windows
        `(c, c+98)` (percentiles); the deterministic core of
        `gather_train`."""
        x = self.data[idx].astype(jnp.float32)

        def pct(cdf_row, q):
            # value of the q-th percentile from a (256,) cumulative histogram
            npix = cdf_row[-1]
            pos = q * 0.01 * (npix - 1.0)
            k0 = jnp.floor(pos)
            frac = pos - k0
            v0 = jnp.searchsorted(cdf_row, k0, side="right")
            v1 = jnp.searchsorted(cdf_row, k0 + 1.0, side="right")
            v1 = jnp.where(frac > 0, v1, v0)
            return v0.astype(jnp.float32) * (1.0 - frac) \
                + v1.astype(jnp.float32) * frac

        cdf = self.cdf[idx]
        lb = jax.vmap(pct)(cdf, c)[:, None, None, None]
        ub = jax.vmap(pct)(cdf, c + 98.0)[:, None, None, None]
        span = jnp.maximum(ub - lb, 1e-12)
        y01 = (jnp.clip(x, lb, ub) - lb) / span
        lo, hi = self.out_range
        y = lo + (hi - lo) * y01
        if self.invert:
            y = -y
        return y


def slice_device_images(di: "DeviceImages", sel: np.ndarray) -> "DeviceImages":
    """A DeviceImages view of a host-selected subset (streaming path):
    slices every per-image leaf by `sel`; works on host-resident numpy
    leaves (no device upload happens until the result's leaves are used)."""
    take = lambda a: None if a is None else np.asarray(a)[sel]
    return DeviceImages(data=jnp.asarray(take(di.data)),
                        scale01=None if di.scale01 is None else jnp.asarray(take(di.scale01)),
                        offset01=None if di.offset01 is None else jnp.asarray(take(di.offset01)),
                        lb=None if di.lb is None else jnp.asarray(take(di.lb)),
                        ub=None if di.ub is None else jnp.asarray(take(di.ub)),
                        cdf=None if di.cdf is None else jnp.asarray(take(di.cdf)),
                        out_range=di.out_range, threshold=di.threshold,
                        invert=di.invert, quantized=di.quantized,
                        aug_contrast=di.aug_contrast)


# device-resident datasets beyond this size are almost certainly a mistake
# on single-chip HBM (the decode keeps a float32 copy of each gathered
# batch, and model state needs headroom); see `use_dataloader`/streaming
HBM_WARN_BYTES = 4 << 30


def estimate_device_bytes(arr, preproc: dict | None = None) -> int:
    a = np.asarray(arr) if not isinstance(arr, DeviceImages) else arr.data
    per_image = 256 * 4 if preproc else 0   # CDF for the aug path (worst case)
    n = a.shape[0] if hasattr(a, "shape") and a.ndim else 0
    return int(np.asarray(a).nbytes if not hasattr(a, "nbytes") else a.nbytes) \
        + n * per_image


def as_device_images(arr, mesh, preproc: dict | None = None,
                     aug_contrast: bool = False) -> "DeviceImages":
    """Upload an array to the mesh (replicated); uint8 arrays with a
    `preproc` loader-spec dict become quantized DeviceImages. Warns when
    the replicated dataset would occupy more than HBM_WARN_BYTES — switch
    to the streaming path (`use_dataloader` / `UNetConfig.stream_from_host`)
    for datasets that size."""
    import warnings
    from semtpu.parallel import replicate
    nbytes = estimate_device_bytes(arr, preproc if aug_contrast else None)
    if nbytes > HBM_WARN_BYTES:
        warnings.warn(
            f"as_device_images: dataset is ~{nbytes / (1 << 30):.1f} GiB "
            "replicated into HBM; prefer the host-streaming path "
            "(use_dataloader=True / UNetConfig.stream_from_host) or shard "
            "the dataset", ResourceWarning, stacklevel=2)
    if isinstance(arr, DeviceImages):
        di = arr
    elif np.asarray(arr).dtype == np.uint8:
        di = DeviceImages.from_uint8(np.asarray(arr), aug_contrast=aug_contrast,
                                     **(preproc or {}))
    else:
        di = DeviceImages.from_float32(np.asarray(arr, np.float32))
        if aug_contrast:
            raise ValueError("brightness/contrast augmentation requires a "
                             "raw uint8 source (preproc-quantized stack)")
    return replicate(di, mesh)
