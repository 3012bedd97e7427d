"""Classify-and-measure driver: training data prep, CLI flows, CSV contract.

Mirrors `Other Scripts/Predict_Classes_And_Measure.py:223-357` on tiny
synthetic data (48x48 tiles, filters=4) so the whole train -> classify ->
measure -> Results CSV cycle runs on the CPU mesh.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite
from PIL import Image

from semtpu.classify import build_training_data, main, _segment_binary


SIZE = 48


def _make_scene(rng, n_good=2, n_bad=2):
    """SEM-like image + GT segmentation + 2-class mask: bright discs are
    particles; 'good' discs get the class label."""
    img = rng.normal(40, 5, (SIZE, SIZE)).astype(np.float32)
    seg = np.zeros((SIZE, SIZE), np.uint8)
    good = np.zeros((SIZE, SIZE), np.uint8)
    ys, xs = np.mgrid[:SIZE, :SIZE]
    centers = [(10, 10), (10, 34), (34, 10), (34, 34)]
    for k, (cy, cx) in enumerate(centers[:n_good + n_bad]):
        d = (ys - cy) ** 2 + (xs - cx) ** 2 <= 6 ** 2
        img = np.where(d, rng.normal(200, 5), img)
        seg[d] = 255
        if k < n_good:
            good[d] = 255
    return np.clip(img, 0, 255).astype(np.uint8), seg, good


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("clsdata")
    img_d = root / "Images"
    msk_d = root / "Masks"
    cm_d = root / "ClassMasks"
    for d in (img_d, msk_d, cm_d):
        d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        img, seg, good = _make_scene(rng)
        Image.fromarray(img).save(img_d / f"im{i}.tif")
        Image.fromarray(seg).save(msk_d / f"im{i}_m.tif")
        Image.fromarray(good).save(cm_d / f"im{i}_cm.tif")
    return str(img_d), str(msk_d), str(cm_d)


def test_build_training_data(data_dirs):
    img_d, msk_d, cm_d = data_dirs
    x, y = build_training_data(img_d, msk_d, cm_d, tile_h=SIZE, tile_w=SIZE)
    assert x.shape == (8, SIZE, SIZE, 2)
    assert y.shape == (8, SIZE, SIZE, 2)
    np.testing.assert_allclose(y.sum(-1), 1.0)       # one-hot
    assert 0 < y[..., 1].mean() < y[..., 0].mean()   # good is the rarer class


@pytest.fixture(scope="module")
def trained_classifier(data_dirs, tmp_path_factory):
    img_d, msk_d, cm_d = data_dirs
    model_dir = str(tmp_path_factory.mktemp("clsmodel"))
    main(["train", "--images", img_d, "--masks", msk_d, "--class-masks", cm_d,
          "--model-dir", model_dir, "--classifier-filters", "4",
          "--tile-h", str(SIZE), "--tile-w", str(SIZE),
          "--batch-size", "4", "--epochs", "2"])
    assert os.path.isdir(os.path.join(model_dir, "model"))
    return model_dir


def test_classification_only_writes_results_csv(data_dirs, trained_classifier,
                                                tmp_path):
    img_d, msk_d, _ = data_dirs
    masks_root = tmp_path / "Masks_Predicted"
    (masks_root / "modelA").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(8):
        _, seg, _ = _make_scene(rng)
        Image.fromarray(seg).save(masks_root / "modelA" / f"im{i}.tif")
    out = str(tmp_path / "out")
    # threshold 0 keeps every particle: this asserts the CSV plumbing, not
    # the 2-epoch toy model's scores
    main(["classification-only", "--classifier", trained_classifier,
          "--classifier-filters", "4", "--images", img_d, "--output", out,
          "--masks-root", str(masks_root), "--image-height", str(SIZE),
          "--image-width", str(SIZE), "--tile-h", str(SIZE),
          "--tile-w", str(SIZE), "--threshold", "0"])
    csv = os.path.join(out, "Results_modelA.csv")
    assert os.path.isfile(csv)
    rows = open(csv).read().strip().splitlines()
    assert rows and all(len(r.split(";")) == 4 for r in rows)  # File;MinF;Area;MaxF
    assert rows[0].split(";")[0].startswith("im")


def test_segment_and_predict_flow(data_dirs, trained_classifier, tmp_path):
    import jax.numpy as jnp
    from semtpu.train.unet import UNetTrainer, UNetConfig
    from semtpu.parallel import get_mesh

    img_d, _, _ = data_dirs
    cfg = UNetConfig(filters=4, tile_h=SIZE, tile_w=SIZE,
                     compute_dtype=jnp.float32)
    tr = UNetTrainer(cfg, mesh=get_mesh())
    tr.create_state(weighting=1.0, steps_per_epoch=1)
    models = tmp_path / "Models"
    (models / "unetA").mkdir(parents=True)
    tr.save(str(models / "unetA"), include_opt=False)

    out = str(tmp_path / "sp_out")
    main(["segment-and-predict", "--classifier", trained_classifier,
          "--classifier-filters", "4", "--images", img_d, "--output", out,
          "--models", str(models), "--filters", "4",
          "--image-height", str(SIZE), "--image-width", str(SIZE),
          "--tile-h", str(SIZE), "--tile-w", str(SIZE)])
    assert os.path.isfile(os.path.join(out, "im0_segmented_unetA.tif"))
    assert os.path.isfile(os.path.join(out, "im0_segmented_binary_unetA.tif"))
    assert os.path.isfile(os.path.join(out, "Results_unetA.csv"))
    binary = np.array(Image.open(
        os.path.join(out, "im0_segmented_binary_unetA.tif")))
    assert set(np.unique(binary)) <= {0, 255}


def test_filter_mask_by_class(data_dirs, trained_classifier):
    from semtpu.classify import filter_mask_by_class, _load_classifier
    classifier = _load_classifier(trained_classifier, 4, SIZE, SIZE)
    rng = np.random.default_rng(2)
    img, seg, _ = _make_scene(rng)
    img01 = img.astype(np.float32) / 255.0
    # threshold 0 keeps every particle; threshold > 1 erases all
    kept = filter_mask_by_class(classifier, img01, seg, score_threshold=0.0)
    np.testing.assert_array_equal(kept > 0, seg > 0)
    none = filter_mask_by_class(classifier, img01, seg, score_threshold=1.01)
    assert none.sum() == 0


def test_rgb_class_mask_channel_semantics(tmp_path):
    """RGB *_cm.tif follow the reference 4Classes convention: R = bad,
    G = good — exactly what `simulate_with_classes` emits. A classifier
    trained on such masks must score an intact (bright) particle HIGHER on
    the good class than an occluded (dim) one; this is the semantic check
    that labels are not inverted (round-2 advisor finding)."""
    from semtpu.classify import main as cls_main, _load_classifier
    from semtpu.classify import filter_mask_by_class

    img_d = tmp_path / "Images"; img_d.mkdir()
    msk_d = tmp_path / "Masks"; msk_d.mkdir()
    cm_d = tmp_path / "ClassMasks"; cm_d.mkdir()
    rng = np.random.default_rng(4)
    for i in range(8):
        img, seg, good = _make_scene(rng, n_good=2, n_bad=2)
        bad = ((seg > 0) & ~(good > 0)).astype(np.uint8) * 255
        # make bad discs visually distinct (dim) so the toy net can learn
        img = np.where(bad > 0, (img * 0.35).astype(np.uint8), img)
        rgb = np.stack([bad, good, np.zeros_like(good)], axis=-1)
        Image.fromarray(img).save(img_d / f"im{i}.tif")
        Image.fromarray(seg).save(msk_d / f"im{i}_m.tif")
        Image.fromarray(rgb).save(cm_d / f"im{i}_cm.tif")

    x, y = build_training_data(str(img_d), str(msk_d), str(cm_d),
                               tile_h=SIZE, tile_w=SIZE)
    # label channel 1 (good) must coincide with the G channel of the cm
    img0, seg0, good0 = None, None, None
    rng = np.random.default_rng(4)
    img0, seg0, good0 = _make_scene(rng, n_good=2, n_bad=2)
    np.testing.assert_array_equal(y[0, :, :, 1] > 0.5, good0 > 127)

    model_dir = str(tmp_path / "model")
    # 300 epochs: the toy net needs ~150 to escape the predict-background
    # minimum AND for the BatchNorm running stats (momentum 0.99) to
    # converge so eval-mode predictions match train-mode learning
    cls_main(["train", "--images", str(img_d), "--masks", str(msk_d),
              "--class-masks", str(cm_d), "--model-dir", model_dir,
              "--classifier-filters", "4", "--tile-h", str(SIZE),
              "--tile-w", str(SIZE), "--batch-size", "4", "--epochs", "300"])
    clf = _load_classifier(model_dir, 4, SIZE, SIZE)
    # eval scene must match the training distribution: bad discs are dim
    bad0 = (seg0 > 0) & ~(good0 > 0)
    img0 = np.where(bad0, (img0 * 0.35).astype(np.uint8), img0)
    probs = np.asarray(clf.predict_classes(
        img0.astype(np.float32) / 255.0, (seg0 > 0).astype(np.float32),
        tile_images=False))
    good_score = probs[:, :, 1][good0 > 0].mean()
    bad_score = probs[:, :, 1][bad0].mean()
    assert good_score > bad_score + 0.1, (good_score, bad_score)


def test_segment_binary_handles_flat_maps():
    flat = np.zeros((SIZE, SIZE), np.float32)
    out = _segment_binary(flat, 0.5)
    assert out.shape == (SIZE, SIZE)
