"""CycleGAN trainer tests: pool semantics, fused step, inference round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite

from semtpu.train.cyclegan import (CycleGANTrainer, CycleGANConfig, PoolState)
from semtpu.data.dataset import PairedDomainDataset

SIZE = 48


def tiny_config(**kw):
    base = dict(tile_h=SIZE, tile_w=SIZE, filters=4, num_residual_blocks=2,
                batch_size=4, epochs=2, image_pool_size=6)
    base.update(kw)
    return CycleGANConfig(**base)


def domains(rng, n=8):
    a = rng.random((n, SIZE, SIZE, 1), np.float32) * 2 - 1          # "SEM"
    b = np.where(rng.random((n, SIZE, SIZE, 1)) > 0.8, 1.0, -1.0)   # "masks"
    return a.astype(np.float32), b.astype(np.float32)


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    a, b = domains(rng)
    tr = CycleGANTrainer(tiny_config())
    hist = tr.fit(PairedDomainDataset(a, b))
    return tr, hist, (a, b)


def test_pool_fills_then_swaps():
    tr = CycleGANTrainer(tiny_config())
    size = tr.config.image_pool_size
    pool = PoolState(images=jnp.zeros((size, SIZE, SIZE, 1)), num=jnp.int32(0))
    batch = jnp.ones((4, SIZE, SIZE, 1)) * jnp.arange(1, 5)[:, None, None, None]
    out, pool = tr._pool_query(pool, batch, jax.random.PRNGKey(0))
    # filling phase: returns the inputs unchanged and stores them
    np.testing.assert_allclose(np.asarray(out), np.asarray(batch))
    assert int(pool.num) == 4
    np.testing.assert_allclose(np.asarray(pool.images[:4]), np.asarray(batch))
    # fill the remaining 2 slots, then queries swap or pass through
    batch2 = jnp.ones((4, SIZE, SIZE, 1)) * jnp.arange(5, 9)[:, None, None, None]
    out2, pool = tr._pool_query(pool, batch2, jax.random.PRNGKey(1))
    assert int(pool.num) == size
    vals = set(np.unique(np.asarray(out2)))
    stored = set(np.unique(np.asarray(pool.images)))
    assert vals <= set(np.arange(1.0, 9.0))       # outputs come from history
    assert stored <= set(np.arange(1.0, 9.0))


@pytest.mark.parametrize("mode", ["blocks", "full"])
def test_remat_matches_baseline(mode):
    """Activation remat trades FLOPs for HBM traffic; it must not change
    the numerics: one train step with remat == one without (float32)."""
    rng = np.random.default_rng(11)
    a, b = domains(rng, n=4)
    from semtpu.data.dataset import as_device_images

    def one_step(remat):
        cfg = tiny_config(epochs=1, compute_dtype=jnp.float32, remat=remat,
                          scan_steps=1)
        tr = CycleGANTrainer(cfg)
        tr.create_state(steps_per_epoch=1)
        da = as_device_images(a, tr.mesh, None)
        db = as_device_images(b, tr.mesh, None)
        idx = jnp.arange(4)
        state, m = tr.train_step(tr.state, da, db, idx, idx,
                                 jax.random.PRNGKey(0))
        return state, m

    s0, m0 = one_step("none")
    s1, m1 = one_step(mode)
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]),
                                   rtol=1e-4, atol=1e-5)
    for x, y in zip(jax.tree.leaves(s0.gen_a), jax.tree.leaves(s1.gen_a)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("variant", ["identity", "bce_no_identity"])
def test_fused_applications_match_baseline(variant):
    """fused_applications concatenates same-parameter forwards into one
    larger-batch application (gen: adv+cycle+identity as batch 3B; disc:
    real+pooled as batch 2B). InstanceNorm is per-sample, so with noise
    off one fused train step must match the unfused step to float
    summation order."""
    rng = np.random.default_rng(12)
    a, b = domains(rng, n=4)
    from semtpu.data.dataset import as_device_images
    extra = ({} if variant == "identity"
             else dict(use_binary_crossentropy=True,
                       lambda_identity_a=0.0, lambda_identity_b=0.0))

    def one_step(fused):
        cfg = tiny_config(epochs=1, compute_dtype=jnp.float32, scan_steps=1,
                          fused_applications=fused, **extra)
        tr = CycleGANTrainer(cfg)
        tr.create_state(steps_per_epoch=1)
        da = as_device_images(a, tr.mesh, None)
        db = as_device_images(b, tr.mesh, None)
        idx = jnp.arange(4)
        state, m = tr.train_step(tr.state, da, db, idx, idx,
                                 jax.random.PRNGKey(0))
        return state, m

    s0, m0 = one_step(False)
    s1, m1 = one_step(True)
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]),
                                   rtol=1e-4, atol=1e-5)
    for net in ("gen_a", "gen_b", "disc_a", "disc_b"):
        for x, y in zip(jax.tree.leaves(getattr(s0, net)),
                        jax.tree.leaves(getattr(s1, net))):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5)


def test_streaming_matches_device_resident():
    """stream_from_host (the reference's use_dataloader for the CycleGAN
    Sequence, `CycleGAN.py:454-479`) uploads per-chunk uint8 slices instead
    of both domains; identical seeds -> identical trajectory."""
    rng = np.random.default_rng(9)
    a_u8 = (rng.random((8, SIZE, SIZE)) * 255).astype(np.uint8)
    b_u8 = np.where(rng.random((8, SIZE, SIZE)) > 0.8, 255, 0).astype(np.uint8)
    a_pre = dict(normalization_range=(-1, 1))
    b_pre = dict(normalization_range=(-1, 1))

    def run(stream):
        cfg = tiny_config(epochs=1, compute_dtype=jnp.float32,
                          stream_from_host=stream)
        tr = CycleGANTrainer(cfg)
        tr.fit(PairedDomainDataset(a_u8, b_u8, a_pre, b_pre))
        return tr.state

    s_dev = run(False)
    s_str = run(True)
    for x, y in zip(jax.tree.leaves(s_dev.gen_a), jax.tree.leaves(s_str.gen_a)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_streaming_rejects_float_domains():
    rng = np.random.default_rng(10)
    a, b = domains(rng)
    cfg = tiny_config(stream_from_host=True)
    tr = CycleGANTrainer(cfg)
    with pytest.raises(ValueError, match="stream_from_host"):
        tr.fit(PairedDomainDataset(a, b))


def test_scan_steps_match_legacy_steps():
    """A scanned step == the 4-stage dispatch step, given the same per-step
    key (the scan only amortizes dispatches, never semantics). float32 so
    the comparison isn't washed out by bf16 fusion-order noise."""
    rng = np.random.default_rng(7)
    a, b = domains(rng)
    from semtpu.data.dataset import as_device_images
    keys = rng.integers(0, 2**32, size=(3, 2), dtype=np.uint32)
    idx_a = rng.integers(0, len(a), size=(3, 4))
    idx_b = rng.integers(0, len(b), size=(3, 4))

    tr1 = CycleGANTrainer(tiny_config(seed=5, compute_dtype=jnp.float32))
    tr1.create_state(steps_per_epoch=2)
    dev_a = as_device_images(a, tr1.mesh)
    dev_b = as_device_images(b, tr1.mesh)
    s1, _ = tr1.train_step(tr1.state, dev_a, dev_b, jnp.asarray(idx_a[0]),
                           jnp.asarray(idx_b[0]), jnp.asarray(keys[0]))

    tr2 = CycleGANTrainer(tiny_config(seed=5, compute_dtype=jnp.float32))
    tr2.create_state(steps_per_epoch=2)
    s2, _ = tr2.train_steps_scan(tr2.state, dev_a, dev_b,
                                 jnp.asarray(idx_a[:1]),
                                 jnp.asarray(idx_b[:1]),
                                 jnp.asarray(keys[:1]))
    flat1 = (jax.tree.leaves(s1.gen_a) + jax.tree.leaves(s1.gen_b)
             + jax.tree.leaves(s1.disc_a) + jax.tree.leaves(s1.disc_b)
             + [s1.pool_a.images, s1.pool_a.num])
    flat2 = (jax.tree.leaves(s2.gen_a) + jax.tree.leaves(s2.gen_b)
             + jax.tree.leaves(s2.disc_a) + jax.tree.leaves(s2.disc_b)
             + [s2.pool_a.images, s2.pool_a.num])
    for x, y in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=1e-6)

    # multi-step scan advances the step counter once per inner step
    s3, ms = tr2.train_steps_scan(s2, dev_a, dev_b, jnp.asarray(idx_a[1:]),
                                  jnp.asarray(idx_b[1:]),
                                  jnp.asarray(keys[1:]))
    assert int(s3.step) == 3
    assert np.isfinite(np.asarray(ms)).all()


def test_training_metrics_finite(trained):
    _, hist, _ = trained
    assert set(hist) == {"g_a", "g_b", "g_adv_a", "g_adv_b", "g_cyc_a",
                         "g_cyc_b", "g_id_a", "g_id_b", "d_a", "d_b",
                         "d_real_a", "d_fake_a", "d_real_b", "d_fake_b"}
    for k, v in hist.items():
        assert np.all(np.isfinite(v)), k


def test_inference_shapes_and_range(trained):
    tr, _, (a, b) = trained
    outs = tr.run_inference(a[:2], source_domain="A", tile_images=False)
    assert len(outs) == 2 and outs[0].shape == (SIZE, SIZE)
    assert outs[0].dtype == np.uint8
    # tiled path on a larger image
    big = np.tile(a[0], (3, 3, 1))
    outs = tr.run_inference([big], source_domain="B", tile_images=True)
    assert outs[0].shape == (3 * SIZE, 3 * SIZE)


def test_bce_head_config():
    cfg = tiny_config(use_binary_crossentropy=True, lambda_identity_a=0.0,
                      lambda_identity_b=0.0)
    tr = CycleGANTrainer(cfg)
    rng = np.random.default_rng(1)
    a, b = domains(rng, n=8)
    b01 = (b + 1) / 2  # BCE scaling: masks in [0, 1]
    hist = tr.fit(PairedDomainDataset(a, b01.astype(np.float32)))
    assert np.all(np.isfinite(hist["g_cyc_a"]))
    # sigmoid head: gen_a outputs in [0, 1]
    out = tr._gen_forward(tr.state.gen_a, "a", jnp.asarray(a[:1]))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_identity_bce_conflict_raises():
    with pytest.raises(AssertionError):
        tiny_config(use_binary_crossentropy=True)


def test_checkpoint_roundtrip(tmp_path, trained):
    tr, _, (a, _) = trained
    p = str(tmp_path / "cg")
    tr.save(p)
    fresh = CycleGANTrainer(tiny_config())
    fresh.create_state()
    fresh.load(p)
    x = jnp.asarray(a[:1])
    np.testing.assert_allclose(
        np.asarray(tr._gen_forward(tr.state.gen_a, "a", x)),
        np.asarray(fresh._gen_forward(fresh.state.gen_a, "a", x)), atol=1e-6)


def test_monitor_panels(tmp_path, trained):
    tr, _, (a, b) = trained
    tr.save_monitor_panels(a[:2], b[:2], str(tmp_path), epoch=1)
    import os
    files = sorted(os.listdir(tmp_path))
    assert files == ["A-B-A_Epoch_00001.tif", "B-A-B_Epoch_00001.tif"]

def test_invert_images_inference_equivalence():
    """TEM/bright-background invert path (reference `CycleGAN.py:84,268-281`;
    run end-to-end by the TSEM variant, RESULTS.md): with invert_images=True
    the A->B translation must equal the standard path applied to the negated
    input, and the B->A output must be the intensity complement (255 - x)
    of the standard output, since negation commutes with the min-max
    normalization of the uint8 contract."""
    rng = np.random.default_rng(3)
    a, b = domains(rng, n=2)
    tr = CycleGANTrainer(tiny_config())
    tr.create_state()
    tri = CycleGANTrainer(tiny_config(invert_images=True))
    tri.create_state()   # same seed -> identical initial generators

    out_std = tr.run_inference(list(-a), source_domain="A", tile_images=False)
    out_inv = tri.run_inference(list(a), source_domain="A", tile_images=False)
    for s, i in zip(out_std, out_inv):
        np.testing.assert_array_equal(s, i)

    out_std_b = tr.run_inference(list(b), source_domain="B", tile_images=False)
    out_inv_b = tri.run_inference(list(b), source_domain="B", tile_images=False)
    for s, i in zip(out_std_b, out_inv_b):
        diff = np.abs(i.astype(np.int32) + s.astype(np.int32) - 255)
        assert diff.max() <= 1, diff.max()   # complement up to u8 rounding
