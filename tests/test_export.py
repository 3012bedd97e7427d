"""Export artifact + batch-inference CLI tests."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite
from PIL import Image

from semtpu.train.unet import UNetTrainer, UNetConfig
from semtpu.data.dataset import SegmentationDataset
from semtpu.export import export_unet, load_artifact


@pytest.fixture(scope="module")
def tiny_unet():
    rng = np.random.default_rng(0)
    imgs = rng.random((10, 48, 48, 1)).astype(np.float32)
    masks = (rng.random((10, 48, 48, 1)) > 0.8).astype(np.float32)
    cfg = UNetConfig(filters=4, batch_size=8, epochs=1, tile_h=48, tile_w=48,
                     compute_dtype=jnp.float32)
    tr = UNetTrainer(cfg)
    tr.fit(SegmentationDataset(imgs, masks, "train"))
    return tr


def test_export_and_reload_matches(tmp_path, tiny_unet):
    tr = tiny_unet
    path = str(tmp_path / "artifact")
    export_unet(tr, path)
    assert os.path.isfile(os.path.join(path, "model.stablehlo"))
    art = load_artifact(path)
    x = np.random.default_rng(1).random((3, 48, 48, 1)).astype(np.float32)
    got = art(x)
    want = np.asarray(tr._forward(tr.state, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # symbolic batch: a different batch size works without re-export
    assert art(x[:1]).shape == (1, 48, 48, 1)


def test_infer_cli_end_to_end(tmp_path, tiny_unet):
    from semtpu.infer import main
    tr = tiny_unet
    art_path = str(tmp_path / "artifact")
    export_unet(tr, art_path)

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(2):
        img = (rng.random((96, 96)) * 255).astype(np.uint8)
        Image.fromarray(img).save(in_dir / f"im{i}.tif")

    csv = str(tmp_path / "measure.csv")
    main(["--model", art_path, "--input-dir", str(in_dir),
          "--output-dir", str(out_dir), "--measure-csv", csv,
          "--min-area", "1"])
    outs = sorted(os.listdir(out_dir))
    assert "im0.tif" in outs and "im0_raw.tif" in outs
    inst = np.array(Image.open(out_dir / "im0.tif"))
    assert inst.shape == (96, 96)
    assert os.path.isfile(csv)


def test_infer_cli_classifier_auto_filter(tmp_path, tiny_unet):
    """--classifier wires the plugin's auto-filter
    (`SEM_Particle_Segmentation.java:486-542`) into the deployment CLI:
    score threshold 0 keeps everything, threshold >1 drops every particle,
    and the CSV notes the dropped counts."""
    from semtpu.infer import main
    from semtpu.train.classifier import ClassifierTrainer, ClassifierConfig

    tr = tiny_unet
    art_path = str(tmp_path / "artifact")
    export_unet(tr, art_path)

    ccfg = ClassifierConfig(num_classes=2, filters=4, tile_h=48, tile_w=48,
                            compute_dtype=jnp.float32)
    ctr = ClassifierTrainer(ccfg)
    ctr.create_state()
    cdir = str(tmp_path / "clf")
    ctr.save(cdir)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.default_rng(3)
    img = (rng.random((96, 96)) * 255).astype(np.uint8)
    Image.fromarray(img).save(in_dir / "im0.tif")

    def run(out_name, thr):
        out_dir = tmp_path / out_name
        csv = str(tmp_path / (out_name + ".csv"))
        main(["--model", art_path, "--input-dir", str(in_dir),
              "--output-dir", str(out_dir), "--measure-csv", csv,
              "--classifier", cdir, "--classifier-filters", "4",
              "--classifier-threshold", str(thr)])
        return (np.array(Image.open(out_dir / "im0.tif")),
                open(csv).read())

    all_kept, csv_text = run("keep", 0.0)
    assert "classifier auto-filter dropped" in csv_text
    none_kept, _ = run("drop", 1.01)
    assert none_kept.sum() == 0
    assert all_kept.sum() >= none_kept.sum()
