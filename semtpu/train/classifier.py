"""Particle classification network training + the classify-and-measure flow.

Capability parity with the reference's second-stage classifier pipeline
(`Other Scripts/Predict_Classes_And_Measure.py:220-357`): a CNN scores
concat(gray image, binary segmentation) per-pixel; particles whose mean
class score under their contour falls below a threshold are auto-filtered
(partial occlusion / bad-particle rejection), and size measurements of the
survivors go to a Results CSV (File;MinFeret;Area;MaxFeret — the
reference's column set, `Predict_Classes_And_Measure.py:290-296`).

The reference ships only the trained .h5 + inference driver; the training
loop here (per-class weighted BCE, the reference's declared `weighted_cce`
loss shape — `Other Scripts/HelperFunctions.py:205-214`) completes the
capability.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from semtpu.models.classifier import ParticleClassifier
from semtpu.core.tiling import tile_image, stitch_image
from semtpu.parallel import get_mesh, shard_batch, replicate
from semtpu.train.losses import binary_crossentropy
from semtpu.train.checkpoint import save_checkpoint, load_checkpoint


class ClassifierTrainState(train_state.TrainState):
    batch_stats: Any = None


def weighted_cce(y_true, y_pred, class_weights):
    """Per-class weighted BCE sum (`Other Scripts/HelperFunctions.py:205-214`)."""
    total = 0.0
    for i, w in enumerate(class_weights):
        weighted = y_true[:, :, :, i] * (w - 1.0) + 1.0
        bce = binary_crossentropy(y_true[:, :, :, i], y_pred[:, :, :, i])
        total = total + jnp.mean(bce * weighted)
    return total


@dataclass
class ClassifierConfig:
    num_classes: int = 2
    filters: int = 16
    class_weights: tuple = None
    batch_size: int = 5
    epochs: int = 50
    learning_rate: float = 1e-3
    tile_h: int = 384
    tile_w: int = 384
    compute_dtype: Any = jnp.bfloat16
    seed: int = 0

    def __post_init__(self):
        if self.class_weights is None:
            self.class_weights = tuple(1.0 for _ in range(self.num_classes))


class ClassifierTrainer:
    def __init__(self, config: ClassifierConfig | None = None, mesh=None):
        self.config = config or ClassifierConfig()
        self.mesh = mesh if mesh is not None else get_mesh()
        self.model = ParticleClassifier(num_classes=self.config.num_classes,
                                        filters=self.config.filters,
                                        dtype=self.config.compute_dtype)
        self.state: ClassifierTrainState | None = None

    def create_state(self, sample_shape=None):
        cfg = self.config
        if sample_shape is None:
            sample_shape = (1, cfg.tile_h, cfg.tile_w, 2)
        variables = jax.jit(partial(self.model.init, train=False))(
            jax.random.PRNGKey(cfg.seed), jnp.zeros(sample_shape, jnp.float32))
        state = ClassifierTrainState.create(
            apply_fn=self.model.apply, params=variables["params"],
            tx=optax.adam(cfg.learning_rate),
            batch_stats=variables["batch_stats"])
        self.state = replicate(state, self.mesh)
        return self.state

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, inputs, labels):
        cw = self.config.class_weights

        def loss_fn(params):
            preds, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, train=True, mutable=["batch_stats"])
            return weighted_cce(labels, preds, cw), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
        return state, {"loss": loss}

    def fit(self, inputs: np.ndarray, labels: np.ndarray,
            model_dir: str | None = None) -> dict:
        """inputs: (N, H, W, 2) concat(image, segmentation); labels one-hot."""
        cfg = self.config
        n_dev = len(self.mesh.devices.reshape(-1))
        bs = max(cfg.batch_size // n_dev, 1) * n_dev
        if self.state is None:
            self.create_state((1,) + inputs.shape[1:])
        rng = np.random.default_rng(cfg.seed)
        history = {"loss": []}
        for _ in range(cfg.epochs):
            idx = rng.permutation(len(inputs))
            losses = []
            for k in range(len(idx) // bs):
                sel = idx[k * bs:(k + 1) * bs]
                batch = shard_batch((inputs[sel], labels[sel]), self.mesh)
                self.state, m = self.train_step(self.state, *batch)
                losses.append(float(m["loss"]))
            if not losses:
                raise ValueError(f"dataset ({len(inputs)}) yields no batch at {bs}")
            history["loss"].append(float(np.mean(losses)))
        if model_dir:
            self.save(os.path.join(model_dir, "model"))
        return history

    @partial(jax.jit, static_argnums=0)
    def _forward(self, state, x):
        return state.apply_fn({"params": state.params,
                               "batch_stats": state.batch_stats}, x, train=False)

    def predict_classes(self, image: np.ndarray, segmentation: np.ndarray,
                        tile_images: bool = True, min_overlap: int = 2) -> np.ndarray:
        """Per-pixel class probabilities for one (H, W) image+segmentation."""
        cfg = self.config
        img = np.asarray(image, np.float32)
        seg = np.asarray(segmentation, np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        if seg.ndim == 2:
            seg = seg[:, :, None]
        x = np.concatenate([img, seg], axis=-1)
        if tile_images and (x.shape[0] > cfg.tile_h or x.shape[1] > cfg.tile_w):
            tiles = tile_image(x, cfg.tile_h, cfg.tile_w, min_overlap=min_overlap)
            preds = self._forward(self.state, tiles)
            out = stitch_image(preds, x.shape[1], x.shape[0],
                               min_overlap=min_overlap, manage_overlap_mode=2)
        else:
            out = self._forward(self.state, jnp.asarray(x[None]))[0]
        return np.asarray(out)

    def save(self, path: str):
        save_checkpoint(path, {"params": jax.device_get(self.state.params),
                               "batch_stats": jax.device_get(self.state.batch_stats)})

    def load(self, path: str):
        payload = load_checkpoint(path)
        if self.state is None:
            self.create_state()
        self.state = self.state.replace(
            params=replicate(payload["params"], self.mesh),
            batch_stats=replicate(payload["batch_stats"], self.mesh))
        return self.state


def classify_and_measure(classifier: ClassifierTrainer, image: np.ndarray,
                         segmentation: np.ndarray, good_class: int = 1,
                         score_threshold: float = 0.5,
                         pixel_distance: float = 1.0, known_distance: float = 1.0,
                         unit: str = "pixels"):
    """Auto-filter particles by mean class score and measure the survivors.

    Mirrors the reference flow (`Predict_Classes_And_Measure.py:270-296`):
    Measure(segmentation, grayscaleImage=class_map) -> mean intensities ->
    filterResults('meanIntensity', min = threshold / cal^2) -> min/max
    Feret + areas of the kept particles.

    Returns (Measure, rows) where rows = [(min_feret, area, max_feret), ...].
    """
    from semtpu.measure import Measure

    class_map = classifier.predict_classes(image, segmentation)[:, :, good_class]
    class_u8 = (np.clip(class_map, 0, 1) * 255).astype(np.uint8)
    m = Measure(np.asarray(segmentation, np.uint8),
                pixel_distance=pixel_distance, known_distance=known_distance,
                unit=unit, dark_background=True, apply_watershed=False,
                exclude_edges=False, grayscale_image=class_u8)
    m.calculate_min_feret_diameters()
    m.calculate_max_feret_diameters()
    m.calculate_mean_intensities()
    m.calculate_areas()
    cal2 = (known_distance / pixel_distance) ** 2
    m.filter_results("meanIntensity", min_value=score_threshold * 255.0 / cal2)
    rows = list(zip(m.min_feret_diameters, m.areas, m.max_feret_diameters))
    return m, rows
