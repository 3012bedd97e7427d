"""Full-pipeline integration test at micro scale (steps 0-6b).

Synthetic "SEM" images + particle outline masks run through the complete
workflow: prepare -> WGAN -> simulate -> CycleGAN -> inference -> filter ->
UNet -> instance masks, verifying the directory contract and output
formats end-to-end on the virtual CPU mesh.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy trainer/e2e suite
from PIL import Image

from semtpu.pipeline import Pipeline, PipelineConfig


def make_inputs(root, rng):
    os.makedirs(os.path.join(root, "Input_Images"))
    os.makedirs(os.path.join(root, "Input_Masks"))
    ys, xs = np.mgrid[:160, :160]
    for i in range(3):
        img = rng.normal(30, 8, (160, 160))
        for _ in range(25):
            cy, cx = rng.integers(10, 150, 2)
            r = rng.integers(5, 9)
            img = np.where((ys - cy) ** 2 + (xs - cx) ** 2 <= r ** 2,
                           rng.normal(200, 10), img)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(root, "Input_Images", f"img_{i}.tif"))
    mys, mxs = np.mgrid[:24, :24]
    for i in range(4):
        r = rng.integers(7, 11)
        m = ((mys - 12) ** 2 + (mxs - 12) ** 2 <= r ** 2)
        Image.fromarray((m * 255).astype(np.uint8)).save(
            os.path.join(root, "Input_Masks", f"mask_{i}.tif"))


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe"))
    rng = np.random.default_rng(0)
    make_inputs(root, rng)
    cfg = PipelineConfig(
        root_dir=root,
        tile_size_w=64, tile_size_h=64,
        num_simulated_masks=8,
        run_inference_on_whole_image=True,
        wgan_batch_size=8, wgan_epochs=2,
        max_particle_overlap=None,
        sim_min_no_of_particles=6, sim_max_no_of_particles=10,
        sim_use_perlin_noise=True,
        cyclegan_batch_size=8, cyclegan_epochs=1,
        cyclegan_filters=4, cyclegan_num_residual_blocks=2,
        unet_batch_size=8, unet_epochs=2, unet_filters=4,
    )
    pipe = Pipeline(cfg)
    pipe.run()
    return pipe, cfg


def test_step0_tiles_and_testA(pipeline_run):
    _, cfg = pipeline_run
    train_a = os.listdir(cfg.train_a_dir)
    assert len(train_a) >= 8         # tiles + augmentation up to 8
    assert len(os.listdir(cfg.test_a_dir)) == 5
    tile = np.array(Image.open(os.path.join(cfg.train_a_dir, train_a[0])))
    assert tile.shape == (64, 64)


def test_step1_wgan_artifacts(pipeline_run):
    _, cfg = pipeline_run
    runs = os.listdir(cfg.wgan_model_dir)
    assert len(runs) == 1
    run = os.path.join(cfg.wgan_model_dir, runs[0])
    assert os.path.isfile(os.path.join(run, "training_log.csv"))
    assert os.path.isdir(os.path.join(run, "model"))
    outs = os.listdir(os.path.join(cfg.wgan_output_dir, runs[0]))
    assert "Epoch_00000.png" in outs


def test_step2_simulated_masks(pipeline_run):
    _, cfg = pipeline_run
    masks = sorted(os.listdir(cfg.train_b_dir))
    assert len(masks) >= 8
    assert masks[0] == "00000.tif"
    assert len(os.listdir(cfg.test_b_dir)) == 5
    m = np.array(Image.open(os.path.join(cfg.train_b_dir, masks[0])))
    assert m.shape == (64, 64)
    assert set(np.unique(m)) <= {0, 255}


def test_step3_cyclegan_artifacts(pipeline_run):
    _, cfg = pipeline_run
    runs = os.listdir(cfg.cyclegan_model_dir)
    assert len(runs) == 1
    run = os.path.join(cfg.cyclegan_model_dir, runs[0])
    assert os.path.isfile(os.path.join(run, "training_log.csv"))
    assert os.path.isdir(os.path.join(run, "checkpoints_001"))
    panels = os.listdir(os.path.join(cfg.cyclegan_dir, "images", runs[0]))
    assert any(p.startswith("A-B-A") for p in panels)


def test_step4_generated_images(pipeline_run):
    _, cfg = pipeline_run
    gen_a = os.listdir(cfg.generated_a_dir)
    assert len(gen_a) == len(os.listdir(cfg.train_b_dir))
    gen_b = os.listdir(cfg.generated_b_dir)
    assert len(gen_b) == 3            # one per input image
    img = np.array(Image.open(os.path.join(cfg.generated_b_dir, gen_b[0])))
    assert img.shape == (160, 160)    # whole-image inference
    assert img.dtype == np.uint8


def test_step5_filtered_masks(pipeline_run):
    _, cfg = pipeline_run
    filt = os.listdir(cfg.filtered_masks_dir)
    assert len(filt) == len(os.listdir(cfg.generated_a_dir))
    out_cg = os.listdir(cfg.output_dir_cyclegan)
    assert len(out_cg) == 3


def test_step6_unet_outputs(pipeline_run):
    _, cfg = pipeline_run
    outs = sorted(os.listdir(cfg.output_dir_unet))
    # per input image: <stem>.tif (instance mask) + <stem>_raw.tif
    stems = {f.replace("_raw.tif", "").replace(".tif", "") for f in outs}
    assert len(stems) == 3
    assert sum(f.endswith("_raw.tif") for f in outs) == 3
    inst = np.array(Image.open(os.path.join(cfg.output_dir_unet,
                                            [f for f in outs if not f.endswith("_raw.tif")][0])))
    assert set(np.unique(inst)) <= {0, 255}
    assert inst.shape == (160, 160)


def test_classifier_self_supervised_flow(pipeline_run, tmp_path):
    """scripts/train_classifier.py: simulator class labels -> CycleGAN
    render -> classifier fit -> mask-level auto-filter, zero annotation."""
    import json
    import sys
    pipe, cfg = pipeline_run
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import train_classifier as tc

    cfg_json = tmp_path / "run_cfg.json"
    cfg_json.write_text(json.dumps({
        "tile_size_w": 64, "tile_size_h": 64,
        "wgan_batch_size": 8, "wgan_epochs": 2,
        "max_particle_overlap": None,
        "sim_min_no_of_particles": 6, "sim_max_no_of_particles": 10,
        "cyclegan_batch_size": 8, "cyclegan_epochs": 1,
        "cyclegan_filters": 4, "cyclegan_num_residual_blocks": 2,
    }))
    out = str(tmp_path / "clf")
    tc.main([cfg.root_dir, "--scenes", "8", "--epochs", "1",
             "--batch-size", "2", "--out", out, "--config", str(cfg_json)])
    assert os.path.isdir(os.path.join(out, "model"))
    # staged data respects the classify-train layout
    assert len(os.listdir(os.path.join(out, "data", "images"))) == 8
    assert len(os.listdir(os.path.join(out, "data", "class"))) == 8

    # the checkpoint drives the mask-level auto-filter
    from semtpu.classify import _load_classifier, filter_mask_by_class
    clf = _load_classifier(out, 16, 64, 64)
    rng = np.random.default_rng(1)
    img01 = rng.random((64, 64), np.float32)
    binary = np.zeros((64, 64), np.uint8)
    binary[10:20, 10:20] = 255
    filt = filter_mask_by_class(clf, img01, binary)
    assert filt.shape == (64, 64) and filt.dtype == np.uint8


def test_cyclegan_checkpoint_auto_selection(pipeline_run):
    """`--cyclegan-checkpoint auto`: renders the mask sample with every
    saved checkpoint, persists the per-checkpoint Li keep-rates, and
    returns a loadable checkpoint path (PipelineConfig docstring)."""
    pipe, cfg = pipeline_run
    pipe.cfg.cyclegan_checkpoint = "auto"
    try:
        path = pipe._resolve_cyclegan_checkpoint()
    finally:
        pipe.cfg.cyclegan_checkpoint = None
    assert os.path.isfile(os.path.join(path, "_CHECKPOINT_METADATA")), path
    from semtpu.train.checkpoint import latest_checkpoint
    run = latest_checkpoint(cfg.cyclegan_model_dir)
    sel_csv = os.path.join(run, "checkpoint_selection.csv")
    assert os.path.isfile(sel_csv)
    lines = open(sel_csv).read().strip().splitlines()
    assert lines[0] == "checkpoint;li_keep_rate" and len(lines) >= 3


def test_cyclegan_resume_point_detection(tmp_path):
    """Interrupted-run detection for step-3 auto-resume: latest run with
    checkpoints but no final model/ -> (run, last_epoch); completed run or
    cyclegan_resume=False -> (None, 0)."""
    from semtpu.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(root_dir=str(tmp_path))
    pipe = Pipeline(cfg)
    models = cfg.cyclegan_model_dir
    run = os.path.join(models, "2026-01-01_00-00-00")
    for name in ("checkpoints_010", "checkpoints_020"):
        os.makedirs(os.path.join(run, name), exist_ok=True)
        open(os.path.join(run, name, "_CHECKPOINT_METADATA"), "w").close()

    got_run, got_epoch = pipe._cyclegan_resume_point()
    assert got_run == run and got_epoch == 20

    pipe.cfg.cyclegan_resume = False
    assert pipe._cyclegan_resume_point() == (None, 0)
    pipe.cfg.cyclegan_resume = True

    # a completed run (final model/ present) must NOT be resumed
    os.makedirs(os.path.join(run, "model"), exist_ok=True)
    open(os.path.join(run, "model", "_CHECKPOINT_METADATA"), "w").close()
    assert pipe._cyclegan_resume_point() == (None, 0)


def test_skip_completed_steps(tmp_path, monkeypatch):
    """cfg.skip_completed_steps: finished steps are recorded in
    .completed_steps and skipped on re-runs of the same command (the
    run_with_retry relaunch flow — without this a completed step 3 would
    retrain from scratch after a step-6a wedge)."""
    from semtpu.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(root_dir=str(tmp_path), skip_completed_steps=True)
    pipe = Pipeline(cfg)
    calls = []
    monkeypatch.setattr(Pipeline, "step_0_prepare",
                        lambda self: calls.append("0"))
    monkeypatch.setattr(Pipeline, "step_1_train_wgan",
                        lambda self: calls.append("1"))
    pipe.run(["0", "1"])
    assert calls == ["0", "1"]
    marker = os.path.join(str(tmp_path), ".completed_steps")
    assert open(marker).read().split() == ["0", "1"]
    pipe2 = Pipeline(cfg)
    pipe2.run(["0", "1"])
    assert calls == ["0", "1"]          # nothing re-ran
    # default-off keeps reference rerun semantics
    cfg3 = PipelineConfig(root_dir=str(tmp_path))
    Pipeline(cfg3).run(["0"])
    assert calls == ["0", "1", "0"]
