"""Run UNet step-6b inference from a SPECIFIC model run dir, with options.

The pipeline's step 6b always loads the newest run under
`<root>/3_UNet/Models/` — fine for a fresh pipeline, wrong when a run dir
holds several trained variants (round-3 has v1/v2/v3 side by side). This
script loads an explicit model run (preferring its best-val
`checkpoint_lowest_loss`), reproduces step 6b's exact preprocessing
(`UNet_Segmentation.py:322-351` contract: (0,1) normalization, contrast
percentiles, whole-image forward — the pipeline default, `--tiled` opts
into 384x384 tiling — metadata-bar zeroing), writes
`<root>/<out-name>/` prediction maps, and scores them with eval_run.

Extra capability: `--tta` averages each map over the 4-flip group
(test-time augmentation; see UNetTrainer.predict_image).

Usage:
  python scripts/infer_variant.py RUN_DIR MODEL_RUN_DIR OUT_NAME
      [--tta] [--no-eval] [--metadata-bar-rows 56]
      [--contrast 0.5,99.5] [--gt GT] [--gt-suffix S]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("model_run_dir",
                   help="a 3_UNet/Models/<stamp> dir (or a direct checkpoint dir)")
    p.add_argument("out_name", help="output dir name under RUN_DIR")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--tta-dihedral", action="store_true",
                   help="average over the full 8-element dihedral group "
                        "(4 flips x 90-degree rotation) instead of 4 flips")
    p.add_argument("--tiled", action="store_true",
                   help="tile 384x384 instead of whole-image forward; the "
                        "pipeline default is WHOLE-image "
                        "(run_inference_on_whole_image=True), so variant "
                        "scores stay comparable to step-6b baselines unless "
                        "this is set")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--metadata-bar-rows", type=int, default=56)
    p.add_argument("--contrast", default="0.5,99.5")
    p.add_argument("--filters", type=int, default=16)
    p.add_argument("--gt", default=None)
    p.add_argument("--gt-suffix", default=None)
    p.add_argument("--limit", type=int, default=0,
                   help="only process the first N images (smoke tests)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tunnel-outage fallback; the "
                        "JAX_PLATFORMS env var does not stick on this host)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import numpy as np
    from semtpu.data.io import (get_image_file_paths_from_directory,
                                load_and_preprocess_images)
    from semtpu.train.unet import UNetTrainer, UNetConfig

    model_path = args.model_run_dir
    for cand in ("checkpoint_lowest_loss", "model"):
        if os.path.isdir(os.path.join(model_path, cand)):
            model_path = os.path.join(model_path, cand)
            break
    print(f"loading UNet from {model_path}")
    trainer = UNetTrainer(UNetConfig(filters=args.filters))
    trainer.load(model_path)

    files = get_image_file_paths_from_directory(
        os.path.join(args.run_dir, "Input_Images"))
    if args.limit:
        files = files[:args.limit]
    contrast = tuple(float(x) for x in args.contrast.split(","))
    images = load_and_preprocess_images(files, normalization_range=(0, 1),
                                        contrast_optimization_range=contrast)
    out_dir = os.path.join(args.run_dir, args.out_name)
    os.makedirs(out_dir, exist_ok=True)
    trainer.run_inference(images, files, out_dir,
                          tile_images=args.tiled,
                          zero_bottom_rows=args.metadata_bar_rows,
                          tta_flips=args.tta,
                          tta_dihedral=args.tta_dihedral)
    print(f"wrote {len(files)} predictions -> {out_dir} "
          f"(tta={args.tta}, dihedral={args.tta_dihedral}, "
          f"tiled={args.tiled})")

    if args.no_eval or args.limit:
        if args.limit and not args.no_eval:
            print("--limit set: skipping eval (the sweep needs every GT stem)")
        return 0
    import eval_run
    tag = args.out_name.replace("Output_Masks_UNet_", "")
    ev = [args.run_dir, "--predictions", out_dir,
          "--summary-name", f"eval_summary_{tag}.json"]
    if args.gt:
        ev += ["--gt", args.gt]
    if args.gt_suffix is not None:
        ev += ["--gt-suffix", args.gt_suffix]
    return eval_run.main(ev)


if __name__ == "__main__":
    sys.exit(main())
