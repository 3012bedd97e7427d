"""Exact mid-run resume: optimizer state round-trips through checkpoints.

For each trainer: N scripted steps == (N/2 steps -> save -> fresh trainer
-> load -> N/2 steps) with identical inputs/keys. float32 on CPU is
deterministic, so the comparison is tight — Adam moments and the
LR-schedule position must survive the round-trip (SURVEY §5 target;
reference convention: whole optimizer-bearing models, `CycleGAN.py:203-204`).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite

from semtpu.parallel import get_mesh
from semtpu.data.dataset import as_device_images


def _close(t1, t2, rtol=1e-6, atol=1e-7):
    l1, l2 = jax.tree.leaves(t1), jax.tree.leaves(t2)
    assert len(l1) == len(l2)
    for x, y in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=rtol, atol=atol)


def test_unet_resume_is_exact(tmp_path):
    from semtpu.train.unet import UNetTrainer, UNetConfig

    rng = np.random.default_rng(0)
    imgs = rng.random((8, 48, 48, 1)).astype(np.float32)
    masks = (rng.random((8, 48, 48, 1)) > 0.7).astype(np.float32)
    idx = rng.integers(0, 8, (4, 4))
    aug = rng.integers(0, 4, (4, 4))

    def make():
        cfg = UNetConfig(filters=4, tile_h=48, tile_w=48,
                         compute_dtype=jnp.float32, epochs=4)
        tr = UNetTrainer(cfg, mesh=get_mesh())
        tr.create_state(weighting=2.0, steps_per_epoch=2,
                        sample_shape=(1, 48, 48, 1))
        return tr

    tr_full = make()
    di = as_device_images(imgs, tr_full.mesh)
    dm = as_device_images(masks, tr_full.mesh)
    s = tr_full.state
    for i in range(4):
        s, _ = tr_full.train_step(s, di, dm, jnp.asarray(idx[i]),
                                  jnp.asarray(aug[i]))
    tr_full.state = s

    tr_half = make()
    s = tr_half.state
    for i in range(2):
        s, _ = tr_half.train_step(s, di, dm, jnp.asarray(idx[i]),
                                  jnp.asarray(aug[i]))
    tr_half.state = s
    tr_half.save(str(tmp_path / "unet"))

    tr_res = make()
    tr_res.load(str(tmp_path / "unet"))
    assert int(tr_res.state.step) == 2          # schedule position restored
    s = tr_res.state
    for i in range(2, 4):
        s, _ = tr_res.train_step(s, di, dm, jnp.asarray(idx[i]),
                                 jnp.asarray(aug[i]))

    _close(s.params, tr_full.state.params)
    _close(s.opt_state, tr_full.state.opt_state)
    _close(s.batch_stats, tr_full.state.batch_stats)


def test_unet_weights_only_checkpoint_still_loads(tmp_path):
    from semtpu.train.unet import UNetTrainer, UNetConfig
    cfg = UNetConfig(filters=4, tile_h=48, tile_w=48, compute_dtype=jnp.float32)
    tr = UNetTrainer(cfg, mesh=get_mesh())
    tr.create_state(weighting=1.0, steps_per_epoch=2)
    tr.save(str(tmp_path / "w"), include_opt=False)
    tr2 = UNetTrainer(cfg, mesh=get_mesh())
    tr2.load(str(tmp_path / "w"))
    _close(tr2.state.params, tr.state.params)


def test_wgan_resume_is_exact(tmp_path):
    from semtpu.train.wgan import WGANTrainer, WGANConfig

    rng = np.random.default_rng(1)
    data = (rng.random((16, 32, 32, 1)) > 0.5).astype(np.float32) * 2 - 1
    idx = rng.integers(0, 16, (4, 8))
    keys = rng.integers(0, 2**32, (4, 2), dtype=np.uint32)

    def make():
        cfg = WGANConfig(img_h=32, img_w=32, latent_dim=16, batch_size=8)
        tr = WGANTrainer(cfg, mesh=get_mesh())
        tr.create_state()
        return tr

    tr_full = make()
    di = as_device_images(data, tr_full.mesh)
    s = tr_full.state
    for i in range(4):
        s, _ = tr_full.train_step(s, di, jnp.asarray(idx[i]),
                                  jnp.asarray(keys[i]))
    tr_full.state = s

    tr_half = make()
    s = tr_half.state
    for i in range(2):
        s, _ = tr_half.train_step(s, di, jnp.asarray(idx[i]),
                                  jnp.asarray(keys[i]))
    tr_half.state = s
    tr_half.save(str(tmp_path / "wgan"))

    tr_res = make()
    tr_res.load(str(tmp_path / "wgan"))
    assert int(tr_res.state.step) == 2
    s = tr_res.state
    for i in range(2, 4):
        s, _ = tr_res.train_step(s, di, jnp.asarray(idx[i]),
                                 jnp.asarray(keys[i]))

    _close(s.g_params, tr_full.state.g_params)
    _close(s.d_params, tr_full.state.d_params)
    _close(s.g_opt, tr_full.state.g_opt)
    _close(s.d_opt, tr_full.state.d_opt)


def test_cyclegan_resume_is_exact(tmp_path):
    from semtpu.train.cyclegan import CycleGANTrainer, CycleGANConfig

    rng = np.random.default_rng(2)
    a = (rng.random((8, 48, 48, 1)) * 2 - 1).astype(np.float32)
    b = np.where(rng.random((8, 48, 48, 1)) > 0.8, 1.0, -1.0).astype(np.float32)
    idx_a = rng.integers(0, 8, (4, 4))
    idx_b = rng.integers(0, 8, (4, 4))
    keys = rng.integers(0, 2**32, (4, 2), dtype=np.uint32)

    def make():
        cfg = CycleGANConfig(tile_h=48, tile_w=48, filters=4,
                             num_residual_blocks=2, batch_size=4, epochs=4,
                             image_pool_size=6, compute_dtype=jnp.float32)
        tr = CycleGANTrainer(cfg)
        tr.create_state(steps_per_epoch=2)
        return tr

    tr_full = make()
    dev_a = as_device_images(a, tr_full.mesh)
    dev_b = as_device_images(b, tr_full.mesh)
    s_full, _ = tr_full.train_steps_scan(tr_full.state, dev_a, dev_b,
                                         jnp.asarray(idx_a), jnp.asarray(idx_b),
                                         jnp.asarray(keys))

    tr_half = make()
    s, _ = tr_half.train_steps_scan(tr_half.state, dev_a, dev_b,
                                    jnp.asarray(idx_a[:2]),
                                    jnp.asarray(idx_b[:2]),
                                    jnp.asarray(keys[:2]))
    tr_half.state = s
    tr_half.save(str(tmp_path / "cgan"))

    tr_res = make()
    tr_res.load(str(tmp_path / "cgan"))
    assert int(tr_res.state.step) == 2
    assert int(tr_res.state.pool_a.num) == int(s.pool_a.num)
    s_res, _ = tr_res.train_steps_scan(tr_res.state, dev_a, dev_b,
                                       jnp.asarray(idx_a[2:]),
                                       jnp.asarray(idx_b[2:]),
                                       jnp.asarray(keys[2:]))

    for k in ("gen_a", "gen_b", "disc_a", "disc_b",
              "opt_ga", "opt_gb", "opt_da", "opt_db"):
        _close(getattr(s_res, k), getattr(s_full, k))
    _close(s_res.pool_a.images, s_full.pool_a.images)


def test_cyclegan_fit_start_epoch_resume_bit_identical(tmp_path):
    """Pipeline-level interruption recovery: fit() to completion vs
    load(checkpoints_002) + fit(start_epoch=2) must produce IDENTICAL
    final state — skipped epochs replay their host-RNG draws, so data
    order and step keys match the uninterrupted run exactly."""
    from semtpu.train.cyclegan import CycleGANTrainer, CycleGANConfig
    from semtpu.data.dataset import PairedDomainDataset

    rng = np.random.default_rng(5)
    a = (rng.random((8, 48, 48, 1)) * 2 - 1).astype(np.float32)
    b = np.where(rng.random((8, 48, 48, 1)) > 0.8, 1.0, -1.0).astype(np.float32)
    ds = PairedDomainDataset(a, b)

    def make():
        return CycleGANTrainer(CycleGANConfig(
            tile_h=48, tile_w=48, filters=4, num_residual_blocks=2,
            batch_size=4, epochs=4, image_pool_size=6, scan_steps=2,
            compute_dtype=jnp.float32))

    d1 = str(tmp_path / "full")
    tr_full = make()
    tr_full.fit(ds, model_dir=d1, checkpoint_every=1)

    tr_res = make()
    tr_res.load(os.path.join(d1, "checkpoints_002"))
    hist = tr_res.fit(ds, model_dir=d1,     # same run dir, like step 3 does
                      checkpoint_every=0, start_epoch=2)
    assert len(hist["g_a"]) == 2            # only epochs 2 and 3 trained
    # csv stays coherent: re-trained epochs replace the lost rows
    rows = open(os.path.join(d1, "training_log.csv")).read().splitlines()
    assert [r.split(";")[0] for r in rows] == ["epoch", "0", "1", "2", "3"]
    assert int(tr_res.state.step) == int(tr_full.state.step)
    for k in ("gen_a", "gen_b", "disc_a", "disc_b",
              "opt_ga", "opt_gb", "opt_da", "opt_db"):
        _close(getattr(tr_res.state, k), getattr(tr_full.state, k))
    _close(tr_res.state.pool_a.images, tr_full.state.pool_a.images)
    _close(tr_res.state.pool_b.images, tr_full.state.pool_b.images)


def test_unet_fit_start_epoch_resume_bit_identical(tmp_path):
    """Step-6a interruption recovery: fit() to completion vs
    load(checkpoints_002) + fit(start_epoch=2) — identical final state and
    continued best-loss/patience monitor (host-RNG replay as in the
    CycleGAN analog)."""
    from semtpu.train.unet import UNetTrainer, UNetConfig
    from semtpu.data.dataset import SegmentationDataset

    rng = np.random.default_rng(6)
    n, size = 12, 48
    imgs = rng.random((n, size, size, 1)).astype(np.float32)
    masks = (rng.random((n, size, size, 1)) > 0.7).astype(np.float32)
    train_ds = SegmentationDataset(imgs, masks, "train")
    val_ds = SegmentationDataset(imgs, masks, "val")

    def make():
        return UNetTrainer(UNetConfig(
            filters=4, batch_size=8, epochs=4, tile_h=48, tile_w=48,
            checkpoint_monitor="val_loss", compute_dtype=jnp.float32))

    d1 = str(tmp_path / "full")
    tr_full = make()
    tr_full.fit(train_ds, val_ds, model_dir=d1, checkpoint_every=2)
    assert os.path.isdir(os.path.join(d1, "checkpoints_002"))

    tr_res = make()
    tr_res.load(os.path.join(d1, "checkpoints_002"))
    assert "best_loss" in tr_res._restored_monitor
    hist = tr_res.fit(train_ds, val_ds, model_dir=d1,
                      checkpoint_every=0, start_epoch=2)
    assert len(hist["loss"]) == 2           # only epochs 2 and 3 trained
    assert int(tr_res.state.step) == int(tr_full.state.step)
    _close(tr_res.state.params, tr_full.state.params)
    _close(tr_res.state.batch_stats, tr_full.state.batch_stats)
    _close(tr_res.state.opt_state, tr_full.state.opt_state)
    rows = open(os.path.join(d1, "training_log.csv")).read().splitlines()
    assert [r.split(";")[0] for r in rows] == ["epoch", "0", "1", "2", "3"]
