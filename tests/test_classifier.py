"""Classifier network + classify-and-measure flow tests."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite

from semtpu.train.classifier import (ClassifierTrainer, ClassifierConfig,
                                     classify_and_measure, weighted_cce)


def test_weighted_cce_shape_and_weighting():
    y = np.zeros((2, 8, 8, 2), np.float32)
    y[:, :, :, 0] = 1.0
    p = np.full((2, 8, 8, 2), 0.5, np.float32)
    base = float(weighted_cce(jnp.asarray(y), jnp.asarray(p), (1.0, 1.0)))
    up = float(weighted_cce(jnp.asarray(y), jnp.asarray(p), (3.0, 1.0)))
    assert up > base            # upweighting class 0 raises the loss


@pytest.fixture(scope="module")
def trained_classifier():
    rng = np.random.default_rng(0)
    n, size = 16, 48
    inputs = np.zeros((n, size, size, 2), np.float32)
    labels = np.zeros((n, size, size, 2), np.float32)
    ys, xs = np.mgrid[:size, :size]
    for i in range(n):
        cy, cx = rng.integers(12, 36, 2)
        disc = (ys - cy) ** 2 + (xs - cx) ** 2 <= 64
        good = i % 2 == 0
        inputs[i, :, :, 0] = np.where(disc, 0.9 if good else 0.3, 0.1)
        inputs[i, :, :, 1] = disc
        labels[i, :, :, 1 if good else 0] = disc
        labels[i, :, :, 0 if good else 1] = ~disc
    cfg = ClassifierConfig(num_classes=2, filters=4, batch_size=8, epochs=4,
                           tile_h=size, tile_w=size, compute_dtype=jnp.float32)
    tr = ClassifierTrainer(cfg)
    hist = tr.fit(inputs, labels)
    return tr, hist


def test_training_loss_decreases(trained_classifier):
    _, hist = trained_classifier
    assert hist["loss"][-1] < hist["loss"][0]


def test_predict_classes_shape(trained_classifier):
    tr, _ = trained_classifier
    img = np.random.default_rng(1).random((48, 48)).astype(np.float32)
    seg = (img > 0.5).astype(np.float32)
    out = tr.predict_classes(img, seg, tile_images=False)
    assert out.shape == (48, 48, 2)
    s = out.sum(axis=-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)  # softmax head


def test_classify_and_measure_filters(trained_classifier):
    tr, _ = trained_classifier
    img = np.full((48, 48), 0.1, np.float32)
    seg = np.zeros((48, 48), np.uint8)
    seg[10:20, 10:20] = 255
    m, rows = classify_and_measure(tr, img, seg, good_class=1,
                                   score_threshold=0.0)
    assert m.number == len(rows)
    for min_f, area, max_f in rows:
        assert 0 < min_f <= max_f
        assert area > 0
