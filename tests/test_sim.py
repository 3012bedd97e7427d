"""Mask simulator tests: planning semantics + device rendering."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from semtpu.sim import MaskSimulator, SimulatorConfig, perlin_field


def disc_sampler(n, seed=0):
    """Fake WGAN sampler: (n, 24, 24, 1) discs in [-1, 1]."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[:24, :24]
    out = np.full((n, 24, 24, 1), -1.0, np.float32)
    for i in range(n):
        r = rng.integers(6, 9)
        m = (ys - 12) ** 2 + (xs - 12) ** 2 <= r ** 2
        out[i, :, :, 0] = np.where(m, 1.0, -1.0)
    return out


def test_perlin_field_range_and_scale():
    f = np.asarray(perlin_field(jax.random.PRNGKey(0), 64, 96, frequency=4))
    assert f.shape == (64, 96)
    assert abs(f.min() + 1) < 1e-5 and abs(f.max() - 1) < 1e-5
    # spatial correlation: neighboring pixels are close
    assert np.abs(np.diff(f, axis=0)).mean() < 0.1


def test_plan_random_mode_counts():
    cfg = SimulatorConfig(img_width=96, img_height=96, min_no_of_particles=10,
                          max_no_of_particles=20, use_perlin_noise=False,
                          max_overlap=None, grid_type="DISABLE")
    sim = MaskSimulator(cfg, (24, 24))
    assert sim.grid_type == "DISABLE"   # no overlap constraint -> no forced grid
    plan = sim.plan(np.random.default_rng(0), jax.random.PRNGKey(0))
    assert 10 <= plan["n"] <= 20
    assert plan["valid"].sum() == plan["n"]


def test_max_overlap_forces_hexagonal_grid():
    cfg = SimulatorConfig(img_width=96, img_height=96, max_overlap=0.5,
                          grid_type="DISABLE", use_perlin_noise=False)
    sim = MaskSimulator(cfg, (24, 24))
    assert sim.grid_type == "HEXAGONAL"  # reference WassersteinGAN.py:409-410
    plan = sim.plan(np.random.default_rng(0), jax.random.PRNGKey(0))
    assert plan["n"] > 50                # dense grid positions


def test_perlin_clustering_restricts_positions():
    cfg = SimulatorConfig(img_width=96, img_height=96, use_perlin_noise=True,
                          perlin_noise_threshold=0.6, max_overlap=None,
                          grid_type="DISABLE", min_no_of_particles=30,
                          max_no_of_particles=30)
    sim = MaskSimulator(cfg, (24, 24))
    key = jax.random.PRNGKey(1)
    plan = sim.plan(np.random.default_rng(0), key)
    noise = np.asarray(perlin_field(key, sim.canvas_h, sim.canvas_w, 4))
    n = plan["n"]
    vals = noise[plan["pos_y"][:n], plan["pos_x"][:n]]
    assert (vals > 2 * 0.6 - 1).all()


def test_render_composites_separated_instances():
    cfg = SimulatorConfig(img_width=128, img_height=128, max_overlap=0.05,
                          use_perlin_noise=False, grid_type="HEXAGONAL",
                          grid_spacing_factor=1.2, grid_noise_factor=0.05,
                          use_normal_distribution=True)
    sim = MaskSimulator(cfg, (24, 24))
    rng = np.random.default_rng(0)
    plan = sim.plan(rng, jax.random.PRNGKey(0))
    samples = disc_sampler(len(plan["valid"]))
    img, placed = sim.render(jnp.asarray(samples), plan)
    assert img.shape == (128, 128)
    assert set(np.unique(img)) <= {0, 255}
    assert placed > 0
    # particles kept apart: labeled instances are reasonably many and the
    # ring-clearing rule keeps them 8-separated (no merged mega-blob)
    lab, ncc = ndi.label(img > 0, structure=np.ones((3, 3)))
    assert ncc > 0
    sizes = np.bincount(lab.ravel())[1:]
    assert sizes.max() < 2.5 * np.pi * 9 ** 2   # no merged blob


def test_bank_path_matches_legacy_statistics():
    """The prepared-particle bank + candidate budget must reproduce the
    legacy per-canvas path's saturation: similar placed counts and the
    same separation property."""
    cfg = SimulatorConfig(img_width=128, img_height=128, max_overlap=0.05,
                          use_perlin_noise=False, grid_type="HEXAGONAL",
                          grid_spacing_factor=1.2, grid_noise_factor=0.05)
    sim = MaskSimulator(cfg, (24, 24))
    rng = np.random.default_rng(0)
    plan = sim.plan(rng, jax.random.PRNGKey(0))
    samples = disc_sampler(len(plan["valid"]))
    legacy_img, _ = sim.render(jnp.asarray(samples), plan)
    # in-crop instance count (placements land on the full padded canvas;
    # only the crop is observable)
    _, ncc_legacy = ndi.label(np.asarray(legacy_img) > 0,
                              structure=np.ones((3, 3)))

    out = sim.simulate(disc_sampler, 6, canvases_per_dispatch=3)
    assert len(out) == 6
    import scipy.ndimage as ndi2
    counts = []
    for img in out:
        assert img.shape == (128, 128)
        assert set(np.unique(img)) <= {0, 255}
        lab, ncc = ndi2.label(img > 0, structure=np.ones((3, 3)))
        counts.append(ncc)
        if ncc:
            sizes = np.bincount(lab.ravel())[1:]
            assert sizes.max() < 2.5 * np.pi * 9 ** 2   # no merged blob
    # saturated placements in the same regime as the legacy path
    assert 0.5 * ncc_legacy < np.mean(counts) < 2.0 * max(ncc_legacy, 1)


def test_budget_subsample_keeps_sequence_order():
    cfg = SimulatorConfig(img_width=96, img_height=96, max_overlap=0.5,
                          use_perlin_noise=False)
    sim = MaskSimulator(cfg, (24, 24))
    plan = sim.plan(np.random.default_rng(0), jax.random.PRNGKey(0), budget=64)
    assert plan["n"] <= 64
    # subsampled hex-grid candidates stay in row-major sequence order
    ys = plan["pos_y"][:plan["n"]]
    assert (np.diff(ys.astype(np.int64)) >= -sim.particle_h).all()


def test_simulate_writes_files(tmp_path):
    cfg = SimulatorConfig(img_width=64, img_height=64, max_overlap=0.3,
                          use_perlin_noise=True, grid_spacing_factor=1.0)
    sim = MaskSimulator(cfg, (24, 24))
    out = sim.simulate(disc_sampler, 2, output_dir=str(tmp_path))
    assert len(out) == 2
    import os
    assert sorted(os.listdir(tmp_path)) == ["00000.tif", "00001.tif"]


def test_simulate_with_classes_properties(tmp_path):
    # grid_spacing_factor 0.35: moderate crowding -> both classes present
    cfg = SimulatorConfig(img_width=96, img_height=96, max_overlap=0.5,
                          use_perlin_noise=False, seed=3,
                          grid_spacing_factor=0.35)
    sim = MaskSimulator(cfg, (24, 24))
    outs = sim.simulate_with_classes(disc_sampler, 2,
                                     output_dir=str(tmp_path),
                                     class_dir=str(tmp_path),
                                     canvases_per_dispatch=2,
                                     keep_frac=0.8)
    assert len(outs) == 2
    for union, good, bad in outs:
        assert union.dtype == np.uint8 and union.shape == (96, 96)
        # good/bad partition the union exactly
        assert not np.any((good > 0) & (bad > 0))
        assert np.array_equal((good > 0) | (bad > 0), union > 0)
    # a crowded overlap-constrained canvas has both intact and clipped particles
    assert any(g.any() for _, g, _ in outs)
    assert any(b.any() for _, _, b in outs)
    # union masks are identical to the plain simulate() stream (same rng path)
    plain = MaskSimulator(cfg, (24, 24)).simulate(disc_sampler, 2,
                                                  canvases_per_dispatch=2)
    assert len(plain) == 2
    for (union, _, _), ref in zip(outs, plain):
        assert np.array_equal(union, ref)
    # files: union tif + RGB class tif with R=bad, G=good
    from PIL import Image
    rgb = np.array(Image.open(tmp_path / "00000_cm.tif"))
    assert rgb.shape == (96, 96, 3)
    assert np.array_equal(rgb[:, :, 1] > 0, outs[0][1] > 0)
    assert np.array_equal(rgb[:, :, 0] > 0, outs[0][2] > 0)


def test_classes_good_particles_are_intact_discs():
    # sparse placement with no overlap pressure: every placed disc is intact
    cfg = SimulatorConfig(img_width=96, img_height=96, max_overlap=None,
                          use_perlin_noise=False, grid_type="DISABLE",
                          min_no_of_particles=3, max_no_of_particles=3, seed=5)
    sim = MaskSimulator(cfg, (24, 24))
    outs = sim.simulate_with_classes(disc_sampler, 1, canvases_per_dispatch=1)
    union, good, bad = outs[0]
    # with only 3 particles on 96x96(+margin), most/all survive intact;
    # any bad pixels must come from genuine clipping, never from good ones
    lab, n = ndi.label(good > 0)
    for k in range(1, n + 1):
        m = lab == k
        # each good component is a filled disc-like blob (no bites taken out)
        filled = ndi.binary_fill_holes(m)
        assert (filled == m).all()


def test_perlin_rotation_bank_mapping_accuracy():
    rng = np.random.default_rng(0)
    bank_rot = np.sort(rng.uniform(-180, 180, 1024)).astype(np.float32)
    desired = rng.uniform(-175, 175, 500).astype(np.float32)
    idx = MaskSimulator.map_rotations_to_bank(bank_rot, desired, rng)
    err = np.abs(bank_rot[idx] - desired)
    assert err.max() < 15.0           # window edge worst case
    assert np.median(err) < 3.0       # typical quantization error
    # diversity: repeated identical rotations hit multiple bank entries
    same = MaskSimulator.map_rotations_to_bank(
        bank_rot, np.zeros(64, np.float32), rng)
    assert len(np.unique(same)) > 4


def test_perlin_rotation_bank_path_renders():
    cfg = SimulatorConfig(img_width=96, img_height=96, max_overlap=0.5,
                          use_perlin_noise=True, use_random_rotation="PERLIN",
                          seed=11, grid_spacing_factor=0.35)
    sim = MaskSimulator(cfg, (24, 24))
    out = sim.simulate(disc_sampler, 2, canvases_per_dispatch=2,
                       perlin_rotation_bank=True)
    assert len(out) == 2
    assert all(o.shape == (96, 96) and o.dtype == np.uint8 for o in out)
    assert any((o > 0).any() for o in out)
