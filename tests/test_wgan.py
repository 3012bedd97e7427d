"""WGAN-GP trainer tests: gradient penalty math + one real training run."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite

from semtpu.train.wgan import WGANTrainer, WGANConfig, prepare_mask_dataset
from semtpu.data.dataset import ArrayDataset


def ellipse_masks(rng, n=16, size=32):
    ys, xs = np.mgrid[:size, :size]
    out = np.full((n, size, size, 1), -1.0, np.float32)
    for i in range(n):
        a = rng.integers(5, 10)
        b = rng.integers(5, 10)
        m = ((ys - size / 2) / a) ** 2 + ((xs - size / 2) / b) ** 2 <= 1
        out[i, :, :, 0] = np.where(m, 1.0, -1.0)
    return out


def test_prepare_mask_dataset_pads_and_augments(rng):
    imgs = [np.ones((30, 20, 1), np.float32), np.ones((10, 40, 1), np.float32)]
    data, (h, w) = prepare_mask_dataset(imgs)
    assert data.shape == (8, 32, 48, 1)   # 4x augment, padded to mult of 16
    assert h == 32 and w == 48
    assert data.min() == -1.0             # padding is background


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(3)
    masks = ellipse_masks(rng)
    ds = ArrayDataset(masks)
    cfg = WGANConfig(img_h=32, img_w=32, latent_dim=16, batch_size=8,
                     epochs=3, d_steps=2)
    tr = WGANTrainer(cfg)
    hist = tr.fit(ds)
    return tr, hist


def test_training_runs_and_metrics_finite(trained):
    tr, hist = trained
    for k, v in hist.items():
        assert np.all(np.isfinite(v)), k
    # gradient penalty should be pulling the norm toward 1
    assert hist["grad_norm"][-1] > 0


def test_generator_output_range(trained):
    tr, _ = trained
    s = tr.sample(4)
    assert s.shape == (4, 32, 32, 1)
    assert s.min() >= -1.0 and s.max() <= 1.0


def test_gradient_penalty_norm_for_linear_critic():
    """For D(x) = sum(c * x), grad wrt x is c everywhere: gp = (|c|*sqrt(HW)-1)^2."""
    cfg = WGANConfig(img_h=16, img_w=16, latent_dim=8, batch_size=4)
    tr = WGANTrainer(cfg)
    tr.create_state()

    real = jnp.zeros((4, 16, 16, 1))
    fake = jnp.ones((4, 16, 16, 1))

    c = 0.25

    def disc_sum(x):
        return jnp.sum(c * x)

    grads = jax.grad(disc_sum)(real + 0.5 * (fake - real))
    norm = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2, 3)))
    expect = c * np.sqrt(16 * 16)
    np.testing.assert_allclose(np.asarray(norm), expect, rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path, trained):
    tr, _ = trained
    p = str(tmp_path / "wgan")
    tr.save(p)
    cfg = WGANConfig(img_h=32, img_w=32, latent_dim=16, batch_size=8)
    fresh = WGANTrainer(cfg)
    fresh.load(p)
    np.testing.assert_allclose(tr.sample(2, seed=7), fresh.sample(2, seed=7),
                               atol=1e-6)
