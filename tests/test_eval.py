"""Evaluation metric tests: exact values on constructed cases."""
import os

import numpy as np

from semtpu.eval import whole_image_iou, instance_iou, roc_rates, youden_index, threshold_sweep


def test_whole_image_iou_exact():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[0:4, 0:4] = 1   # 16 px
    b[2:6, 0:4] = 1   # 16 px, 8 px overlap
    got = float(whole_image_iou(a, b))
    assert abs(got - 8 / 24) < 1e-6


def test_roc_exact():
    pred = np.array([[1, 1], [0, 0]], np.uint8)
    gt = np.array([[1, 0], [0, 1]], np.uint8)
    tpr, tnr, fpr, fnr = (float(x) for x in roc_rates(pred, gt))
    # TP=1, FN=1, TN=1, FP=1
    assert tpr == 0.5 and tnr == 0.5 and fpr == 0.5 and fnr == 0.5
    assert abs(youden_index(pred, gt) - 0.0) < 1e-6


def test_instance_iou_perfect_match():
    img = np.zeros((64, 64), np.uint8)
    img[5:15, 5:15] = 1
    img[30:45, 30:45] = 1
    assert abs(instance_iou(img, img) - 1.0) < 1e-6


def test_instance_iou_partial():
    pred = np.zeros((64, 64), np.uint8)
    gt = np.zeros((64, 64), np.uint8)
    pred[0:10, 0:10] = 1          # instance A: perfect match
    gt[0:10, 0:10] = 1
    pred[30:40, 30:40] = 1        # instance B: no GT overlap
    got = instance_iou(pred, gt)
    assert abs(got - 0.5) < 1e-6  # (1.0 + 0.0) / 2


def test_instance_iou_min_area_filter():
    pred = np.zeros((64, 64), np.uint8)
    gt = np.zeros((64, 64), np.uint8)
    pred[0:10, 0:10] = 1
    gt[0:10, 0:10] = 1
    pred[30:32, 30:32] = 1        # 4 px false positive, filtered at min_area=9
    assert abs(instance_iou(pred, gt, min_area=9) - 1.0) < 1e-6
    assert instance_iou(pred, gt, min_area=0) < 1.0


def test_threshold_sweep_recovers_gt():
    """A prediction equal to the GT must give IoU=1 at some threshold."""
    rng = np.random.default_rng(0)
    ys, xs = np.mgrid[:96, :96]
    gt = np.zeros((96, 96), np.uint8)
    for cy, cx in [(20, 20), (60, 70), (75, 25)]:
        gt |= (((ys - cy) ** 2 + (xs - cx) ** 2) <= 100).astype(np.uint8)
    pred = gt.astype(np.float32) * 0.7 + 0.1  # soft prediction: bg 0.1, fg 0.8
    res = threshold_sweep([pred], [gt], do_watershed=False)
    best_iou, t = res.best_iou_whole
    assert best_iou > 0.999
    by, _ = res.best_youden
    assert by > 0.999
    # degenerate thresholds are poor
    assert res.iou_whole[0] < 0.2  # t=0: everything foreground


def test_sweep_fill_holes_protocol():
    """The sweep must fill interior holes like the reference scoring stack
    (`Calculate_Scores.py:64`): a disk prediction with a small interior
    hole, scored against the full-disk GT, recovers the hole's pixels with
    fill_holes=True and not without. (A hole cut by watershed lines leaks
    to the outer background and correctly stays unfilled — in the
    reference protocol too — so the construction keeps one basin.)"""
    ys, xs = np.mgrid[:96, :96]
    d2 = (ys - 48) ** 2 + (xs - 48) ** 2
    gt = (d2 <= 30 ** 2).astype(np.uint8)
    hole = ((ys - 48) ** 2 + (xs - 58) ** 2) <= 3 ** 2
    pred = ((d2 <= 30 ** 2) & ~hole).astype(np.float32) * 0.7 + 0.1

    filled = threshold_sweep([pred], [gt], do_watershed=True)
    unfilled = threshold_sweep([pred], [gt], do_watershed=True,
                               fill_holes=False)
    # the hole is ~29 px of the ~2830 px disk: fill recovers ~0.01 IoU
    assert filled.best_iou_whole[0] > unfilled.best_iou_whole[0] + 0.005
    assert filled.best_iou_whole[0] > 0.95


def test_sweep_custom_threshold_grid():
    """A custom (fine) grid must evaluate exactly those thresholds and
    agree with the default grid where they overlap — the basis of the
    --fine refinement in eval_run."""
    ys, xs = np.mgrid[:64, :64]
    gt = (((ys - 32) ** 2 + (xs - 32) ** 2) <= 20 ** 2).astype(np.uint8)
    pred = gt.astype(np.float32) * 0.8 + 0.1

    coarse = threshold_sweep([pred], [gt], do_watershed=True)
    fine = threshold_sweep([pred], [gt], do_watershed=True,
                           thresholds=[0.35, 0.5, 0.62, 0.7])
    assert fine.thresholds == [0.35, 0.5, 0.62, 0.7]
    assert fine.iou_whole.shape == (4,)
    i_c = coarse.thresholds.index(0.5)
    i_f = fine.thresholds.index(0.5)
    np.testing.assert_allclose(fine.iou_whole[i_f], coarse.iou_whole[i_c],
                               atol=1e-6)
    np.testing.assert_allclose(fine.youden[i_f], coarse.youden[i_c],
                               atol=1e-6)


def test_rand_error_and_voi_identity():
    from semtpu.eval.metrics import rand_error, variation_of_information, pixel_error
    img = np.zeros((48, 48), np.uint8)
    img[5:15, 5:15] = 1
    img[30:40, 30:40] = 1
    assert rand_error(img, img) == 0.0
    assert variation_of_information(img, img) < 1e-12
    assert pixel_error(img, img) == 0.0


def test_rand_error_detects_merge():
    from semtpu.eval.metrics import rand_error, variation_of_information
    gt = np.zeros((48, 48), np.uint8)
    gt[10:20, 10:22] = 1
    gt[10:20, 24:36] = 1          # two instances
    merged = np.zeros_like(gt)
    merged[10:20, 10:36] = 1      # merged into one
    re = rand_error(merged, gt)
    voi = variation_of_information(merged, gt)
    assert re > 0.0
    assert voi > 0.0


def test_device_sweep_matches_host_path():
    """The fused one-dispatch-per-image device sweep must reproduce the
    per-threshold host-metric path (same segment stack, uncapped host
    instance IoU) on a nontrivial watershed case."""
    rng = np.random.default_rng(7)
    ys, xs = np.mgrid[:96, :128]
    pred = np.zeros((96, 128), np.float32)
    for cy, cx, r in [(30, 30, 14), (30, 52, 12), (70, 90, 15), (55, 30, 9)]:
        d2 = (ys - cy) ** 2 + (xs - cx) ** 2
        pred = np.maximum(pred, np.clip(1.2 - d2 / r**2, 0, 1))
    pred = np.clip(pred + rng.normal(0, 0.02, pred.shape), 0, 1)
    gt = (pred > 0.4).astype(np.uint8)

    dev = threshold_sweep([pred], [gt], do_watershed=True, device=True)
    host = threshold_sweep([pred], [gt], do_watershed=True, device=False)
    for name in ("iou_whole", "iou_instance_all", "iou_instance_filtered",
                 "tpr", "tnr", "fpr", "fnr", "youden"):
        a, b = getattr(dev, name), getattr(host, name)
        assert np.allclose(a, b, atol=1e-5), (name, a, b)


def test_ensemble_eval_averages_float_maps(tmp_path):
    """scripts/ensemble_eval.py: `_raw.tif` maps are float32 probabilities;
    averaging must stay in float (a uint8 cast of [0,1] data collapses to
    {0,1} — regression) and the scored summary must land under the given
    --summary-name."""
    import importlib.util
    import json
    from PIL import Image

    run = tmp_path / "run"
    d1 = run / "p1"; d2 = run / "p2"; gt_d = tmp_path / "gt"
    for d in (d1, d2, gt_d):
        d.mkdir(parents=True)
    ys, xs = np.mgrid[:64, :64]
    disc = ((ys - 32) ** 2 + (xs - 32) ** 2 <= 14 ** 2)
    for stem in ("im0", "im1"):
        Image.fromarray(np.where(disc, 0.2, 0.0).astype(np.float32)).save(
            d1 / f"{stem}_raw.tif")
        Image.fromarray(np.where(disc, 0.8, 0.1).astype(np.float32)).save(
            d2 / f"{stem}_raw.tif")
        Image.fromarray((disc * 255).astype(np.uint8)).save(
            gt_d / f"{stem}_m.tif")
    # in-process (NOT a subprocess): conftest's forced-CPU jax config must
    # apply — sitecustomize overrides JAX_PLATFORMS in fresh interpreters
    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    spec = importlib.util.spec_from_file_location(
        "ensemble_eval", os.path.join(scripts, "ensemble_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main([str(run), "ens", str(d1), str(d2), "--gt", str(gt_d)])
    mean = np.array(Image.open(run / "ens" / "im0_raw.tif"))
    assert mean.dtype == np.float32
    np.testing.assert_allclose(mean[32, 32], 0.5, atol=1e-6)   # (0.2+0.8)/2
    np.testing.assert_allclose(mean[0, 0], 0.05, atol=1e-6)    # (0.0+0.1)/2
    summary = json.loads((run / "eval_summary_ens.json").read_text())
    assert summary["iou_whole"] > 0.95    # mean map segments to the disc

    # median mode (3 inputs, --no-eval): per-pixel median, not mean
    d3 = run / "p3"; d3.mkdir()
    for stem in ("im0", "im1"):
        Image.fromarray(np.where(disc, 0.9, 0.9).astype(np.float32)).save(
            d3 / f"{stem}_raw.tif")
    mod.main([str(run), "ens_med", str(d1), str(d2), str(d3),
              "--gt", str(gt_d), "--mode", "median", "--no-eval"])
    med = np.array(Image.open(run / "ens_med" / "im0_raw.tif"))
    assert med.dtype == np.float32
    np.testing.assert_allclose(med[32, 32], 0.8, atol=1e-6)  # med(0.2,0.8,0.9)
    np.testing.assert_allclose(med[0, 0], 0.1, atol=1e-6)    # med(0.0,0.1,0.9)
    assert not (run / "eval_summary_ens_med.json").exists()  # --no-eval


def test_seed_variance_report_aggregates_and_marks_beats(tmp_path, capsys):
    """scripts/seed_variance_report.py: mean/spread across per-seed summaries
    (the SEED_VARIANCE.json artifact the unattended chain publishes), the
    embedded reference baseline, the (beats)/(gap) markers, ensemble rows,
    and silent skipping of a missing --ensemble path."""
    import importlib.util
    import json

    def summary(iou_w, iou_i, iou_f, youd):
        return {"iou_whole": iou_w, "iou_instance_all": iou_i,
                "iou_instance_gt9px": iou_f, "youden": youd,
                "baseline_v120": {"iou_whole": 0.8762,
                                  "iou_instance": 0.5750, "youden": 0.9120}}

    paths = []
    for i, vals in enumerate([(0.88, 0.62, 0.74, 0.93),
                              (0.87, 0.60, 0.72, 0.92),
                              (0.89, 0.64, 0.76, 0.94)]):
        d = tmp_path / f"run_s{i}"
        d.mkdir()
        p = d / "eval_summary.json"
        p.write_text(json.dumps(summary(*vals)))
        paths.append(str(p))
    ens = tmp_path / "eval_summary_ens.json"
    ens.write_text(json.dumps(summary(0.895, 0.65, 0.77, 0.945)))

    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    spec = importlib.util.spec_from_file_location(
        "seed_variance_report", os.path.join(scripts, "seed_variance_report.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "SEED_VARIANCE.json"
    rc = mod.main(paths + ["--ensemble", str(ens),
                           "--ensemble", str(tmp_path / "missing.json"),
                           "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["n_seeds"] == 3
    np.testing.assert_allclose(rep["mean"]["iou_whole"], 0.88, atol=5e-4)
    np.testing.assert_allclose(rep["spread"]["iou_whole"], 0.01, atol=5e-4)
    np.testing.assert_allclose(rep["mean"]["youden"], 0.93, atol=5e-4)
    assert rep["min"]["iou_instance_all"] == 0.60
    assert rep["max"]["iou_instance_all"] == 0.64
    # mean 0.88 >= ref 0.8762 and 0.93 >= 0.9120 -> "(beats)" markers
    assert rep["markdown"].count("**(beats)**") == 3
    assert "ensemble" in rep["markdown"]
    assert list(rep["ensembles"]) == ["eval_summary_ens.json"]
    captured = capsys.readouterr().out
    assert "missing.json not found" in captured
