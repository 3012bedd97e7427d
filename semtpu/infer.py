"""Batch inference + particle analysis CLI — the ImageJ plugin analog.

`python -m semtpu.infer --model <artifact|checkpoint-dir> --input-dir ...`

Reproduces the full capability of the reference's deployment path
(`ImageJ Plugin/SEM_Particle_Segmentation.java:70-1466`, SURVEY.md §2.6)
as a headless CLI: load a portable model artifact, tile -> batched forward
-> stitch, EDT-watershed instance separation, particle measurement, and
the plugin's interactive range filters as flags (area, perimeter,
circularity, max/min Feret diameter, solidity) with calibrated CSV output.
GUI is out of scope; flag parity is in scope.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="semtpu.infer", description=__doc__)
    p.add_argument("--model", required=True,
                   help="StableHLO artifact dir (from semtpu.export) or UNet checkpoint dir")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--tile", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=True, help="tiled inference (artifacts are tile-shaped)")
    p.add_argument("--filters", type=int, default=16,
                   help="UNet width (checkpoint loading only; artifacts embed it)")
    p.add_argument("--tile-h", type=int, default=384)
    p.add_argument("--tile-w", type=int, default=384)
    p.add_argument("--threshold", type=float, default=-1.0,
                   help="segmentation threshold in [0,1]; <0 = Otsu")
    p.add_argument("--watershed", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=True)
    p.add_argument("--min-distance", type=int, default=9)
    p.add_argument("--min-overlap", type=int, default=2)
    p.add_argument("--manage-overlap-mode", type=int, default=2)
    p.add_argument("--contrast-range", default="0.5,99.5")
    # calibration (plugin's pixel size settings)
    p.add_argument("--pixel-distance", type=float, default=1.0)
    p.add_argument("--known-distance", type=float, default=1.0)
    p.add_argument("--unit", default="pixels")
    # particle filters (plugin RangeSlider parity)
    for name in ("area", "perimeter", "circularity", "max-feret", "min-feret",
                 "solidity"):
        p.add_argument(f"--min-{name}", type=float, default=None)
        p.add_argument(f"--max-{name}", type=float, default=None)
    p.add_argument("--measure-csv", default=None,
                   help="write per-particle measurements to this CSV")
    # classifier-based auto-filter (plugin parity:
    # `SEM_Particle_Segmentation.java:486-542` — drops particles whose mean
    # good-class score under the mask is below the threshold, before the
    # range filters are applied)
    p.add_argument("--classifier", default=None,
                   help="classification-network checkpoint dir (enables the "
                        "auto-filter)")
    p.add_argument("--classifier-filters", type=int, default=16)
    p.add_argument("--classifier-threshold", type=float, default=0.5)
    return p


def _load_model(path: str, filters: int = 16, tile_h: int = 384,
                tile_w: int = 384):
    if os.path.isfile(os.path.join(path, "model.stablehlo")):
        from semtpu.export import load_artifact
        art = load_artifact(path)
        return art, art.tile_h, art.tile_w
    # UNet checkpoint directory
    from semtpu.train.unet import UNetTrainer, UNetConfig
    trainer = UNetTrainer(UNetConfig(filters=filters, tile_h=tile_h,
                                     tile_w=tile_w))
    trainer.load(path)

    def call(x):
        return np.asarray(trainer._forward(trainer.state, x))

    return call, tile_h, tile_w


def run(args):
    import jax.numpy as jnp
    from semtpu.core.tiling import tile_image, stitch_image
    from semtpu.data.io import (get_image_file_paths_from_directory,
                                load_and_preprocess_images)
    from semtpu.ops import segment, eight_to_four_connected
    from semtpu.measure import Measure
    from PIL import Image
    import cv2

    model, tile_h, tile_w = _load_model(args.model, args.filters,
                                        args.tile_h, args.tile_w)
    contrast = tuple(float(x) for x in args.contrast_range.split(","))
    os.makedirs(args.output_dir, exist_ok=True)

    classifier = None
    if args.classifier:
        from semtpu.classify import _load_classifier
        classifier = _load_classifier(args.classifier, args.classifier_filters,
                                      tile_h, tile_w)

    files = get_image_file_paths_from_directory(args.input_dir)
    images = load_and_preprocess_images(files, normalization_range=(0, 1),
                                        contrast_optimization_range=contrast)
    csv_rows = []
    for i, f in enumerate(files):
        img = images[i]
        if args.tile:
            tiles = tile_image(img, tile_h, tile_w, min_overlap=args.min_overlap)
            preds = model(np.asarray(tiles))
            raw = np.asarray(stitch_image(jnp.asarray(preds), img.shape[1],
                                          img.shape[0],
                                          min_overlap=args.min_overlap,
                                          manage_overlap_mode=args.manage_overlap_mode))[:, :, 0]
        else:
            raw = model(img[None])[0, :, :, 0]

        stem = os.path.splitext(os.path.basename(f))[0]
        Image.fromarray(raw).save(os.path.join(args.output_dir, stem + "_raw.tif"))

        u8 = raw - raw.min()
        u8 = (u8 / max(u8.max(), 1e-12) * 255).astype(np.uint8)
        inst = segment(u8, threshold=args.threshold,
                       apply_watershed=args.watershed,
                       min_distance=args.min_distance, dark_background=True)
        inst = np.asarray(eight_to_four_connected(inst))

        n_auto_dropped = 0
        if classifier is not None:
            from semtpu.classify import filter_mask_by_class
            from semtpu import native
            _, n_before = native.cc_label(inst > 0, connectivity=1)
            inst = filter_mask_by_class(
                classifier, img[:, :, 0], inst,
                score_threshold=args.classifier_threshold)
            _, n_after = native.cc_label(inst > 0, connectivity=1)
            n_auto_dropped = int(n_before) - int(n_after)

        # measurement + range filters (plugin parity)
        m = Measure(inst, pixel_distance=args.pixel_distance,
                    known_distance=args.known_distance, unit=args.unit,
                    apply_watershed=False, exclude_edges=False)
        areas = m.calculate_areas()
        perims = m.calculate_perimeters()
        maxf, _ = m.calculate_max_feret_diameters()
        minf, _ = m.calculate_min_feret_diameters()
        sol = m.calculate_convexness_scores(dim=2)
        circ = [4 * np.pi * a / (p * p) if p > 0 else 0.0
                for a, p in zip(areas, perims)]

        def in_range(v, lo, hi):
            return (lo is None or v >= lo) and (hi is None or v <= hi)

        keep = [j for j in range(m.number)
                if in_range(areas[j], args.min_area, args.max_area)
                and in_range(perims[j], args.min_perimeter, args.max_perimeter)
                and in_range(circ[j], args.min_circularity, args.max_circularity)
                and in_range(maxf[j], args.min_max_feret, args.max_max_feret)
                and in_range(minf[j], args.min_min_feret, args.max_min_feret)
                and in_range(sol[j], args.min_solidity, args.max_solidity)]

        out = np.zeros(inst.shape, np.uint8)
        cv2.drawContours(out, [m.contours[j] for j in keep], -1,
                         (255, 255, 255), thickness=-1)
        Image.fromarray(out).save(os.path.join(args.output_dir, stem + ".tif"))

        for j in keep:
            csv_rows.append(f"{os.path.basename(f)};{areas[j]};{perims[j]};"
                            f"{circ[j]};{maxf[j]};{minf[j]};{sol[j]}")
        note = (f" ({n_auto_dropped} dropped by classifier)"
                if classifier is not None else "")
        print(f"{os.path.basename(f)}: {m.number} particles, "
              f"{len(keep)} kept{note}")
        if classifier is not None:
            csv_rows.append(f"# {os.path.basename(f)}: classifier auto-filter "
                            f"dropped {n_auto_dropped} particles at score "
                            f"threshold {args.classifier_threshold}")

    if args.measure_csv:
        header = ("File;Area;Perimeter;Circularity;MaxFeret;MinFeret;Solidity"
                  f"  [unit={args.unit}]")
        with open(args.measure_csv, "a") as fh:
            fh.write(header + "\n" + "\n".join(csv_rows) + "\n")


def main(argv=None):
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
