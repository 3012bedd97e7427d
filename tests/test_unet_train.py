"""UNet end-to-end slice: data -> sharded train step -> ckpt -> tiled inference.

Runs on the virtual 8-device CPU mesh with a tiny model (filters=4, 48x48)
so the whole train/predict/checkpoint cycle stays fast on 1 CPU core.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite

from semtpu.train.unet import UNetTrainer, UNetConfig
from semtpu.data.dataset import SegmentationDataset, apply_flip
from semtpu.parallel import get_mesh


def synth_data(rng, n=12, size=48):
    """Bright discs on noisy dark background + their masks."""
    imgs = np.zeros((n, size, size, 1), np.float32)
    masks = np.zeros((n, size, size, 1), np.float32)
    ys, xs = np.mgrid[:size, :size]
    for i in range(n):
        img = rng.normal(0.15, 0.05, (size, size))
        for _ in range(3):
            cy, cx, r = rng.integers(8, size - 8), rng.integers(8, size - 8), rng.integers(4, 8)
            d = (ys - cy) ** 2 + (xs - cx) ** 2 <= r ** 2
            img = np.where(d, rng.normal(0.8, 0.05), img)
            masks[i, :, :, 0] = np.maximum(masks[i, :, :, 0], d)
        imgs[i, :, :, 0] = np.clip(img, 0, 1)
    return imgs, masks


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    imgs, masks = synth_data(rng)
    train_ds = SegmentationDataset(imgs, masks, "train")
    val_ds = SegmentationDataset(imgs, masks, "val")
    cfg = UNetConfig(filters=4, batch_size=8, epochs=10, learning_rate=3e-3,
                     tile_h=48, tile_w=48, bn_momentum=0.6,
                     compute_dtype=jnp.float32)
    trainer = UNetTrainer(cfg, mesh=get_mesh())
    history = trainer.fit(train_ds, val_ds)
    return trainer, history, (imgs, masks)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_apply_flip_codes():
    x = np.arange(2 * 4 * 4).reshape(2, 4, 4, 1).astype(np.float32)
    out = np.asarray(apply_flip(jnp.asarray(x), jnp.asarray([1, 2])))
    np.testing.assert_array_equal(out[0], x[0, :, ::-1])
    np.testing.assert_array_equal(out[1], x[1, ::-1, :])


def test_loss_decreases(trained):
    _, history, _ = trained
    assert history["loss"][-1] < history["loss"][0]
    assert np.isfinite(history["val_loss"][-1])


def test_class_weighting(trained):
    trainer, _, (imgs, masks) = trained
    ds = SegmentationDataset(imgs, masks, "train")
    w = ds.class_weighting()
    fg = ds.masks.mean()
    assert abs(w - (1 - fg) / fg) < 1e-3


def test_predict_learns_discs(trained):
    trainer, _, (imgs, masks) = trained
    pred = trainer.predict_image(imgs[0], tile_images=False)[:, :, 0]
    m = masks[0, :, :, 0] > 0.5
    assert pred[m].mean() > pred[~m].mean() + 0.05  # separates fg from bg


def test_tiled_inference_matches_whole(trained):
    trainer, _, (imgs, _) = trained
    # image larger than the tile: stitch from overlapping tiles
    big = np.tile(imgs[0], (2, 2, 1))  # 96x96
    tiled = trainer.predict_image(big, tile_images=True)
    assert tiled.shape == (96, 96, 1)
    whole = trainer.predict_image(big, tile_images=False)
    # same network, different receptive-field context at seams: close overall
    assert np.abs(np.asarray(tiled) - np.asarray(whole)).mean() < 0.12


def test_tta_flips_is_flip_equivariant(trained):
    """Averaging over the full 4-flip group makes the prediction exactly
    equivariant to input flips: predict(flip(x), tta) == flip(predict(x, tta)).
    A plain single prediction of this (asymmetric-weight) net is NOT, so the
    assertion fails if any view is unflipped incorrectly."""
    trainer, _, (imgs, _) = trained
    x = imgs[0]
    base = trainer.predict_image(x, tile_images=False, tta_flips=True)
    flipped = trainer.predict_image(np.ascontiguousarray(x[:, ::-1]),
                                    tile_images=False, tta_flips=True)
    np.testing.assert_allclose(np.asarray(flipped[:, ::-1]), np.asarray(base),
                               atol=1e-5)
    # and it is a genuine average: bounded by the per-view min/max
    single = trainer.predict_image(x, tile_images=False)
    assert not np.allclose(single, base)  # TTA actually changed the map
    assert base.min() >= 0.0 and base.max() <= 1.0


def test_tta_dihedral_is_rot90_equivariant(trained):
    """Averaging over the full 8-element dihedral group makes the
    prediction exactly equivariant to 90-degree input rotations (which the
    4-flip group is NOT): predict(rot90(x)) == rot90(predict(x))."""
    trainer, _, (imgs, _) = trained
    x = imgs[0]
    base = trainer.predict_image(x, tile_images=False, tta_dihedral=True)
    rot = trainer.predict_image(np.ascontiguousarray(np.rot90(x, axes=(0, 1))),
                                tile_images=False, tta_dihedral=True)
    np.testing.assert_allclose(np.asarray(np.rot90(rot, -1, axes=(0, 1))),
                               np.asarray(base), atol=1e-5)
    # flip-TTA of this asymmetric net is not rot90-equivariant — the
    # dihedral average is a strictly larger symmetrization
    flips = trainer.predict_image(x, tile_images=False, tta_flips=True)
    assert not np.allclose(flips, base)


def test_checkpoint_roundtrip(tmp_path, trained):
    trainer, _, (imgs, _) = trained
    p = str(tmp_path / "ckpt")
    trainer.save(p)
    cfg = UNetConfig(filters=4, tile_h=48, tile_w=48, bn_momentum=0.6,
                     compute_dtype=jnp.float32)
    fresh = UNetTrainer(cfg, mesh=get_mesh())
    fresh.load(p)
    a = trainer.predict_image(imgs[0], tile_images=False)
    b = fresh.predict_image(imgs[0], tile_images=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fit_with_brightness_contrast_augmentation():
    """Training works end-to-end with the randomized contrast windows:
    requires a uint8-quantized dataset (the pipeline's step-6a form)."""
    rng = np.random.default_rng(3)
    imgs, masks = synth_data(rng, n=10)
    imgs_u8 = (imgs[:, :, :, 0] * 255).astype(np.uint8)
    masks_u8 = (masks[:, :, :, 0] * 255).astype(np.uint8)
    i_pre = dict(normalization_range=(0, 1))
    m_pre = dict(normalization_range=(0, 1), threshold=0.5)
    train_ds = SegmentationDataset(imgs_u8, masks_u8, "train",
                                   image_preproc=i_pre, mask_preproc=m_pre)
    cfg = UNetConfig(filters=4, batch_size=8, epochs=2, tile_h=48, tile_w=48,
                     bn_momentum=0.6, compute_dtype=jnp.float32,
                     use_brightness_contrast_augmentation=True)
    trainer = UNetTrainer(cfg, mesh=get_mesh())
    history = trainer.fit(train_ds)
    assert np.isfinite(history["loss"][-1])


def test_streaming_matches_device_resident():
    """stream_from_host uploads per-chunk slices instead of the whole
    dataset; with identical seeds the training trajectory is identical."""
    rng = np.random.default_rng(5)
    imgs, masks = synth_data(rng, n=10)
    imgs_u8 = (imgs[:, :, :, 0] * 255).astype(np.uint8)
    masks_u8 = (masks[:, :, :, 0] * 255).astype(np.uint8)
    i_pre = dict(normalization_range=(0, 1))
    m_pre = dict(normalization_range=(0, 1), threshold=0.5)

    def run(stream):
        ds = SegmentationDataset(imgs_u8, masks_u8, "train",
                                 image_preproc=i_pre, mask_preproc=m_pre)
        cfg = UNetConfig(filters=4, batch_size=8, epochs=2, tile_h=48,
                         tile_w=48, bn_momentum=0.6,
                         compute_dtype=jnp.float32, stream_from_host=stream)
        tr = UNetTrainer(cfg, mesh=get_mesh())
        tr.fit(ds)
        return tr.state

    s_res = run(False)
    s_str = run(True)
    for a, b in zip(jax.tree.leaves(s_res.params), jax.tree.leaves(s_str.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_streaming_rejects_float_datasets():
    rng = np.random.default_rng(6)
    imgs, masks = synth_data(rng, n=10)
    ds = SegmentationDataset(imgs, masks, "train")
    cfg = UNetConfig(filters=4, batch_size=8, epochs=1, tile_h=48, tile_w=48,
                     compute_dtype=jnp.float32, stream_from_host=True)
    tr = UNetTrainer(cfg, mesh=get_mesh())
    with pytest.raises(ValueError, match="stream_from_host"):
        tr.fit(ds)


def test_as_device_images_warns_on_huge_dataset(monkeypatch):
    import warnings
    import semtpu.data.dataset as dsmod
    monkeypatch.setattr(dsmod, "HBM_WARN_BYTES", 1024)
    arr = np.zeros((4, 32, 32), np.uint8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dsmod.as_device_images(arr, get_mesh(), dict(normalization_range=(0, 1)))
    assert any("HBM" in str(x.message) or "streaming" in str(x.message)
               for x in w)


def test_val_loss_monitor_and_early_stop(tmp_path):
    """checkpoint_monitor='val_loss' restores the best-val weights at the
    end of fit (so the saved `model` IS the selected model) and
    early_stopping_patience halts training once val loss stops improving."""
    rng = np.random.default_rng(7)
    imgs, masks = synth_data(rng, n=12)
    train_ds = SegmentationDataset(imgs, masks, "train")
    val_ds = SegmentationDataset(imgs, masks, "val")
    cfg = UNetConfig(filters=4, batch_size=8, epochs=30, learning_rate=3e-3,
                     tile_h=48, tile_w=48, bn_momentum=0.6,
                     compute_dtype=jnp.float32,
                     checkpoint_monitor="val_loss",
                     early_stopping_patience=3)
    trainer = UNetTrainer(cfg, mesh=get_mesh())
    mdir = str(tmp_path / "m")
    history = trainer.fit(train_ds, val_ds, model_dir=mdir)
    n_epochs = len(history["val_loss"])
    best_ep = int(np.argmin(history["val_loss"]))
    # early stopping fired no later than patience epochs past the minimum
    assert n_epochs <= best_ep + 1 + 3
    # final in-memory weights == the best-val checkpoint on disk
    fresh = UNetTrainer(UNetConfig(filters=4, tile_h=48, tile_w=48,
                                   bn_momentum=0.6,
                                   compute_dtype=jnp.float32), mesh=get_mesh())
    fresh.load(os.path.join(mdir, "checkpoint_lowest_loss"))
    a = trainer.predict_image(imgs[0], tile_images=False)
    b = fresh.predict_image(imgs[0], tile_images=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and the saved final `model` matches too (restore-best-weights)
    fresh.load(os.path.join(mdir, "model"))
    c = fresh.predict_image(imgs[0], tile_images=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_run_inference_outputs(tmp_path, trained):
    trainer, _, (imgs, _) = trained
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)
    res = trainer.run_inference(imgs[:2], ["a.tif", "b.tif"], outdir,
                                tile_images=False, threshold=0.5)
    assert len(res) == 2
    assert set(np.unique(res[0])) <= {0, 255}
    assert os.path.isfile(os.path.join(outdir, "a_raw.tif"))
    assert os.path.isfile(os.path.join(outdir, "a.tif"))


def test_run_inference_zeroes_metadata_bar(tmp_path, trained):
    from PIL import Image
    trainer, _, (imgs, _) = trained
    outdir = str(tmp_path / "bar")
    os.makedirs(outdir)
    res = trainer.run_inference(imgs[:1], ["a.tif"], outdir,
                                tile_images=False, threshold=0.5,
                                zero_bottom_rows=8)
    assert (res[0][-8:] == 0).all()
    raw = np.array(Image.open(os.path.join(outdir, "a_raw.tif")))
    assert (raw[-8:] == 0).all()
    assert raw[:-8].max() > 0


# -- gradient microbatching (cfg.grad_microbatches > 1) ----------------------
# exactness properties of the accumulation/scaling logic; the operating-
# point motivation (bs>=10 layout-padding compile wall) is PROFILE_UNET.json

def _micro_trainer(M, rng_data, batch=8):
    imgs, masks = synth_data(rng_data, n=8)
    cfg = UNetConfig(filters=4, batch_size=batch, epochs=1, tile_h=48,
                     tile_w=48, bn_momentum=0.6, grad_microbatches=M,
                     compute_dtype=jnp.float32)
    tr = UNetTrainer(cfg, mesh=get_mesh())
    tr.create_state(2.0, steps_per_epoch=1, sample_shape=(1, 48, 48, 1))
    from semtpu.data.dataset import as_device_images
    return tr, as_device_images(imgs, tr.mesh), as_device_images(masks, tr.mesh)


def _params_close(p1, p2):
    for x, y in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=1e-6)


def test_grad_microbatch_duplicate_halves_match_plain_step():
    # both microbatches hold the SAME 4 samples: the accumulated gradient
    # (0.5*g + 0.5*g) must equal g, so params match a plain batch-4 step
    tr2, di, dm = _micro_trainer(2, np.random.default_rng(3))
    tr1, _, _ = _micro_trainer(1, np.random.default_rng(3), batch=4)
    half = np.array([0, 1, 2, 3], np.int32)
    idx2 = jnp.asarray(np.concatenate([half, half])[None])      # (1, 8)
    idx1 = jnp.asarray(half[None])                              # (1, 4)
    aug2, aug1 = jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 4), jnp.int32)
    s2, m2 = tr2.train_steps_scan(tr2.state, di, dm, idx2, aug2)
    s1, m1 = tr1.train_steps_scan(tr1.state, di, dm, idx1, aug1)
    _params_close(s2.params, s1.params)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                               rtol=2e-5, atol=1e-6)


def test_grad_microbatch_invalid_tail_matches_valid_head_only():
    # second microbatch all padding (valid=0): zero gradient/metric weight,
    # so params match a plain step on just the first microbatch
    tr2, di, dm = _micro_trainer(2, np.random.default_rng(4))
    tr1, _, _ = _micro_trainer(1, np.random.default_rng(4), batch=4)
    idx2 = jnp.asarray(np.array([[0, 1, 2, 3, 4, 5, 6, 7]], np.int32))
    idx1 = jnp.asarray(np.array([[0, 1, 2, 3]], np.int32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32))
    aug2, aug1 = jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 4), jnp.int32)
    s2, m2 = tr2.train_steps_scan(tr2.state, di, dm, idx2, aug2, valid=valid)
    s1, m1 = tr1.train_steps_scan(tr1.state, di, dm, idx1, aug1)
    _params_close(s2.params, s1.params)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                               rtol=2e-5, atol=1e-6)


def test_grad_microbatch_fit_end_to_end():
    # fit() runs with microbatching on and still learns the discs
    rng = np.random.default_rng(5)
    imgs, masks = synth_data(rng)
    ds = SegmentationDataset(imgs, masks, "train")
    cfg = UNetConfig(filters=4, batch_size=8, epochs=4, learning_rate=3e-3,
                     tile_h=48, tile_w=48, bn_momentum=0.6,
                     grad_microbatches=2, compute_dtype=jnp.float32)
    tr = UNetTrainer(cfg, mesh=get_mesh())
    hist = tr.fit(ds)
    assert hist["loss"][-1] < hist["loss"][0]


def test_grad_microbatch_indivisible_batch_raises():
    tr, di, dm = _micro_trainer(3, np.random.default_rng(6))
    idx = jnp.asarray(np.zeros((1, 8), np.int32))
    aug = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="not divisible"):
        tr.train_steps_scan(tr.state, di, dm, idx, aug)
