"""Train the second-stage particle classifier with ZERO manual annotation.

The reference ships its classification network only as a pre-trained .h5
(`Archive/Trained Neural Network Models/ClassificationModel.h5`) consumed by
`Other Scripts/Predict_Classes_And_Measure.py`; the training data is not in
the repo. This driver completes the flow self-supervised, from a finished
pipeline run directory:

1. `simulate_with_classes` composites WGAN particles at several crowding
   levels, tracking per-particle clipping -> per-pixel good/bad class masks
   (no human labels: a particle is "bad" when later placements or the crop
   cut it).
2. The run's CycleGAN generator B->A renders each union mask as a fake SEM
   image (exactly the pipeline's step-4 machinery).
3. `python -m semtpu.classify train` fits the network on
   (fake SEM, segmentation) -> (bad, good) tiles.

Usage: python scripts/train_classifier.py RUN_DIR [--scenes 120]
       [--epochs 40] [--out RUN_DIR/4_Classifier]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--scenes", type=int, default=120)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=5)
    p.add_argument("--out", default=None)
    p.add_argument("--spacings", default="0.25,0.35,0.5",
                   help="grid_spacing_factor per density group")
    p.add_argument("--keep-frac", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--config", default=None,
                   help="JSON PipelineConfig overrides matching the run")
    args = p.parse_args(argv)

    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from semtpu.pipeline.config import PipelineConfig
    from semtpu.pipeline.run import Pipeline
    from semtpu.sim import MaskSimulator, SimulatorConfig
    from semtpu.data.io import (get_image_file_paths_from_directory,
                                load_uint8_stack)

    overrides = {}
    if args.config:
        import json
        with open(args.config) as fh:
            overrides = json.load(fh)
    overrides["root_dir"] = os.path.abspath(args.run_dir)
    cfg = PipelineConfig(**overrides)
    out = args.out or os.path.join(cfg.root_dir, "4_Classifier")
    data = os.path.join(out, "data")
    img_dir = os.path.join(data, "images")
    msk_dir = os.path.join(data, "masks")
    cls_dir = os.path.join(data, "class")
    sim_dir = os.path.join(data, "sim")
    for d in (img_dir, msk_dir, cls_dir, sim_dir):
        os.makedirs(d, exist_ok=True)

    # --- 1. class-labeled scenes at mixed crowding ------------------------
    pipe = Pipeline(cfg)
    _, hw = pipe._load_input_masks()
    wgan = pipe._wgan_trainer(hw)
    wgan.load(cfg.wgan_model_dir)

    spacings = [float(s) for s in args.spacings.split(",")]
    per = args.scenes // len(spacings)
    idx0 = 0
    for gi, sp in enumerate(spacings):
        scfg = SimulatorConfig(
            img_width=cfg.tile_size_w, img_height=cfg.tile_size_h,
            use_perlin_noise=cfg.sim_use_perlin_noise,
            perlin_noise_threshold=cfg.sim_perlin_noise_threshold,
            perlin_noise_frequency=cfg.sim_perlin_noise_frequency,
            max_overlap=cfg.max_particle_overlap,
            grid_spacing_factor=sp, seed=args.seed + gi)
        sim = MaskSimulator(scfg, hw)
        n = per if gi < len(spacings) - 1 else args.scenes - idx0
        sim.simulate_with_classes(wgan.sample_device, n,
                                  output_dir=sim_dir, class_dir=cls_dir,
                                  start_index=idx0, keep_frac=args.keep_frac)
        print(f"group {gi}: spacing {sp}, {n} scenes")
        idx0 += n

    # --- 2. render fake SEM via the run's CycleGAN B->A -------------------
    cyc = pipe._cyclegan_trainer()
    cyc.create_state()
    # same checkpoint-resolution rule as pipeline step 4 (honors
    # cfg.cyclegan_checkpoint); params-only: inference load, ~5x less upload
    cyc.load(pipe._resolve_cyclegan_checkpoint(), params_only=True)
    files_b = get_image_file_paths_from_directory(sim_dir)
    masks = load_uint8_stack(files_b)
    cyc.run_inference_batched(masks, img_dir, files_b, source_domain="B")

    # masks into the classify-train layout (<stem>_m.tif)
    for f in files_b:
        stem = os.path.splitext(os.path.basename(f))[0]
        shutil.copy(f, os.path.join(msk_dir, f"{stem}_m.tif"))

    # --- 3. train via the CLI ---------------------------------------------
    from semtpu.classify import main as classify_main
    classify_main([
        "train",
        "--images", img_dir, "--masks", msk_dir, "--class-masks", cls_dir,
        "--model-dir", out,
        "--tile-h", str(cfg.tile_size_h), "--tile-w", str(cfg.tile_size_w),
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.epochs), "--seed", str(args.seed),
    ])
    print(f"classifier checkpoint -> {out}")


if __name__ == "__main__":
    main()
