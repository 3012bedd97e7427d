"""Classify-and-measure CLI — the second-stage classifier driver.

`python -m semtpu.classify <train|segment-and-predict|classification-only> ...`

Reproduces `Other Scripts/Predict_Classes_And_Measure.py:223-357` headlessly:

- `segment-and-predict`: for every UNet checkpoint under --models, segment
  each image under --images (cropped to --image-height x --image-width —
  the reference's metadata-bar crop convention, `:27-28`), save
  `<stem>_segmented_<model>.tif` (raw map) + `<stem>_segmented_binary_<model>.tif`
  (instances), score particles with the classification network, auto-filter
  by mean class score, and append survivors to `Results_<model>.csv`
  (`File;MinFeret;Area;MaxFeret` rows, `:290-296`).
- `classification-only`: same measurement flow over pre-segmented maps in
  `--masks-root/<dir>/` -> `Results_<dir>.csv` (`:300-357`).
- `train`: fits the classification network on per-pixel class-labeled
  ground truth (the dataset's *_cm.tif 2-class masks) paired with SEM
  images + segmentations — the capability the reference ships only as a
  pre-trained .h5.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


# reference calibration defaults (`Predict_Classes_And_Measure.py:280`)
PIXEL_DISTANCE = 1024.0
KNOWN_DISTANCE = 7520.0
UNIT = "nm"


def _norm01(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    img = img - img.min()
    return img / max(float(img.max()), 1e-12)


def _list_images(d: str) -> list[str]:
    from semtpu.data.io import get_image_file_paths_from_directory
    return get_image_file_paths_from_directory(d)


def _segment_binary(raw: np.ndarray, threshold: float) -> np.ndarray:
    """Raw map -> watershed instances -> 4-connected binary uint8
    (the driver's `segment` + `EightToFourConnected`,
    `Predict_Classes_And_Measure.py:44-72,196-205`)."""
    from semtpu.ops import segment, eight_to_four_connected
    u8 = (_norm01(raw) * 255).astype(np.uint8)
    inst = segment(u8, threshold=float(threshold) * 255 if threshold >= 0 else -1.0,
                   apply_watershed=True, min_distance=9, dark_background=True)
    return np.asarray(eight_to_four_connected(inst))


def _load_classifier(path: str, filters: int, tile_h: int, tile_w: int,
                     num_classes: int = 2):
    from semtpu.train.classifier import ClassifierTrainer, ClassifierConfig
    cfg = ClassifierConfig(num_classes=num_classes, filters=filters,
                           tile_h=tile_h, tile_w=tile_w)
    tr = ClassifierTrainer(cfg)
    if os.path.isdir(os.path.join(path, "model")):
        path = os.path.join(path, "model")
    tr.load(path)
    return tr


def _measure_rows(classifier, image01, binary, threshold, out_csv, src_name):
    from semtpu.train.classifier import classify_and_measure
    _, rows = classify_and_measure(
        classifier, image01, binary, good_class=1, score_threshold=threshold,
        pixel_distance=PIXEL_DISTANCE, known_distance=KNOWN_DISTANCE, unit=UNIT)
    with open(out_csv, "a") as fh:
        for mn_f, area, mx_f in rows:
            fh.write(f"{src_name};{mn_f};{area};{mx_f}\n")
    return len(rows)


# ---------------------------------------------------------------- commands

def cmd_segment_and_predict(args):
    from semtpu.train.unet import UNetTrainer, UNetConfig
    from PIL import Image

    files = _list_images(args.images)
    model_dirs = sorted(
        os.path.join(args.models, e) for e in os.listdir(args.models)
        if os.path.isdir(os.path.join(args.models, e))) or [args.models]
    classifier = _load_classifier(args.classifier, args.classifier_filters,
                                  args.tile_h, args.tile_w)
    os.makedirs(args.output, exist_ok=True)

    for mdir in model_dirs:
        tag = os.path.basename(mdir.rstrip("/"))
        ucfg = UNetConfig(filters=args.filters, tile_h=args.tile_h,
                          tile_w=args.tile_w)
        seg_tr = UNetTrainer(ucfg)
        seg_tr.load(mdir)
        csv_path = os.path.join(args.output, f"Results_{tag}.csv")
        for f in files:
            img = np.array(Image.open(f))
            img = img[:args.image_height, :args.image_width]  # bar crop (:27-28)
            img01 = _norm01(img)
            raw = seg_tr.predict_image(img01[:, :, None],
                                       tile_images=True)[:, :, 0]
            binary = _segment_binary(raw, args.threshold)
            stem = os.path.splitext(os.path.basename(f))[0]
            Image.fromarray(raw).save(os.path.join(
                args.output, f"{stem}_segmented_{tag}.tif"))
            Image.fromarray(binary).save(os.path.join(
                args.output, f"{stem}_segmented_binary_{tag}.tif"))
            n = _measure_rows(classifier, img01, binary, args.threshold,
                              csv_path, os.path.basename(f))
            print(f"[{tag}] {os.path.basename(f)}: {n} particles kept")


def cmd_classification_only(args):
    from PIL import Image

    files = _list_images(args.images)
    classifier = _load_classifier(args.classifier, args.classifier_filters,
                                  args.tile_h, args.tile_w)
    os.makedirs(args.output, exist_ok=True)
    subdirs = sorted(e for e in os.listdir(args.masks_root)
                     if os.path.isdir(os.path.join(args.masks_root, e)))
    for sub in subdirs or ["."]:
        tag = sub if sub != "." else os.path.basename(args.masks_root.rstrip("/"))
        csv_path = os.path.join(args.output, f"Results_{tag}.csv")
        for f in files:
            mask_f = os.path.join(args.masks_root, sub, os.path.basename(f))
            if args.mask_suffix:
                root, ext = os.path.splitext(mask_f)
                mask_f = root + args.mask_suffix + ext
            if not os.path.isfile(mask_f):
                continue
            img = np.array(Image.open(f))[:args.image_height, :args.image_width]
            img01 = _norm01(img)
            raw = np.array(Image.open(mask_f)).astype(np.float32)
            raw = raw[:args.image_height, :args.image_width]
            binary = _segment_binary(raw, 0.5)
            n = _measure_rows(classifier, img01, binary, args.threshold,
                              csv_path, os.path.basename(f))
            print(f"[{tag}] {os.path.basename(f)}: {n} particles kept")


def filter_mask_by_class(classifier, image01: np.ndarray, binary: np.ndarray,
                         good_class: int = 1,
                         score_threshold: float = 0.5) -> np.ndarray:
    """Remove particles whose mean class score falls below the threshold.

    The mask-level counterpart of the driver's measurement filter
    (`Predict_Classes_And_Measure.py:286-288`): connected components of the
    binary segmentation are scored by the mean of the classifier's
    good-class map under each component; failing components are erased.
    Returns a uint8 {0,255} mask (for filtered-IoU evaluation).
    """
    labels, mean_score = particle_class_scores(classifier, image01, binary,
                                               good_class)
    if mean_score is None:
        return np.zeros_like(binary, np.uint8)
    keep = mean_score >= score_threshold
    keep[0] = False
    return (keep[labels] * 255).astype(np.uint8)


def particle_class_scores(classifier, image01: np.ndarray, binary: np.ndarray,
                          good_class: int = 1):
    """(labels, per-component mean good-class score) for one segmentation.

    One classifier forward + one labeling; sweeping score thresholds
    afterwards is free (used by the threshold-calibration sweep). Returns
    (labels, None) for an empty mask.
    """
    from semtpu import native
    class_map = classifier.predict_classes(image01, (binary > 0).astype(
        np.float32))[:, :, good_class]
    labels, n = native.cc_label(binary > 0, connectivity=1)
    labels = np.asarray(labels)
    if n == 0:
        return labels, None
    flat = labels.ravel()
    sums = np.bincount(flat, weights=np.clip(class_map, 0, 1).ravel(),
                       minlength=n + 1)
    counts = np.bincount(flat, minlength=n + 1)
    return labels, sums / np.maximum(counts, 1)


def build_training_data(image_dir: str, mask_dir: str, class_dir: str,
                        tile_h: int = 384, tile_w: int = 384):
    """Tile (image, segmentation) inputs + one-hot (bad, good) labels from
    the per-pixel class-labeled ground truth (`*_cm.tif` 2-class masks
    paired with `*_m.tif` segmentations and the raw SEM images)."""
    from PIL import Image
    from semtpu.core.tiling import tile_image

    xs, ys = [], []
    for f in sorted(os.listdir(class_dir)):
        if not f.endswith("_cm.tif"):
            continue
        stem = f[:-len("_cm.tif")]
        img_f = os.path.join(image_dir, stem + ".tif")
        msk_f = os.path.join(mask_dir, stem + "_m.tif")
        if not (os.path.isfile(img_f) and os.path.isfile(msk_f)):
            continue
        cm = np.array(Image.open(os.path.join(class_dir, f)))
        h, w = cm.shape[:2]
        img = _norm01(np.array(Image.open(img_f))[:h, :w])
        msk = (np.array(Image.open(msk_f))[:h, :w] > 127).astype(np.float32)
        good = (cm > 127).astype(np.float32)
        if good.ndim == 3:
            # RGB class masks follow the reference 4Classes convention
            # (R = occluded/clipped i.e. bad, G = intact i.e. good — see
            # `Datasets/.../TiO2_Masks_Manual_4Classes`, and the simulator's
            # `simulate_with_classes` emission): the GOOD class is channel 1
            good = good[:, :, 1]
        x = np.stack([img, msk], axis=-1)
        y = np.stack([1.0 - good, good], axis=-1)
        xs.append(np.asarray(tile_image(x, tile_h, tile_w, min_overlap=2)))
        ys.append(np.asarray(tile_image(y, tile_h, tile_w, min_overlap=2)))
    if not xs:
        raise FileNotFoundError(
            f"no *_cm.tif class masks with matching images under {class_dir}")
    return np.concatenate(xs), np.concatenate(ys)


def cmd_train(args):
    from semtpu.train.classifier import ClassifierTrainer, ClassifierConfig

    inputs, labels = build_training_data(args.images, args.masks,
                                         args.class_masks,
                                         args.tile_h, args.tile_w)
    # inverse-frequency class weighting over the label set
    freq = labels.mean(axis=(0, 1, 2))
    weights = tuple(float(1.0 / max(fq, 1e-6)) / len(freq) for fq in freq)
    cfg = ClassifierConfig(num_classes=labels.shape[-1],
                           filters=args.classifier_filters,
                           class_weights=weights, batch_size=args.batch_size,
                           epochs=args.epochs, tile_h=args.tile_h,
                           tile_w=args.tile_w, seed=args.seed)
    tr = ClassifierTrainer(cfg)
    hist = tr.fit(inputs, labels, model_dir=args.model_dir)
    print(f"trained on {len(inputs)} tiles, final loss {hist['loss'][-1]:.4f}")


# ---------------------------------------------------------------- parser

def build_parser():
    p = argparse.ArgumentParser(prog="semtpu.classify", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--classifier", required=True,
                        help="classifier checkpoint dir")
        sp.add_argument("--classifier-filters", type=int, default=16)
        sp.add_argument("--images", required=True)
        sp.add_argument("--output", required=True)
        sp.add_argument("--image-height", type=int, default=712,
                        help="metadata-bar crop height (reference: 712)")
        sp.add_argument("--image-width", type=int, default=1024)
        sp.add_argument("--tile-h", type=int, default=384)
        sp.add_argument("--tile-w", type=int, default=384)
        sp.add_argument("--threshold", type=float, default=0.5)

    sp = sub.add_parser("segment-and-predict",
                        help="segment with each UNet model, classify, measure")
    common(sp)
    sp.add_argument("--models", required=True,
                    help="dir of UNet checkpoint dirs (or one checkpoint)")
    sp.add_argument("--filters", type=int, default=16, help="UNet width")
    sp.set_defaults(fn=cmd_segment_and_predict)

    sp = sub.add_parser("classification-only",
                        help="classify + measure pre-segmented maps")
    common(sp)
    sp.add_argument("--masks-root", required=True,
                    help="dir of per-model mask dirs (raw maps, image stems)")
    sp.add_argument("--mask-suffix", default="",
                    help="suffix between stem and extension (e.g. _raw)")
    sp.set_defaults(fn=cmd_classification_only)

    sp = sub.add_parser("train", help="train the classification network")
    sp.add_argument("--images", required=True)
    sp.add_argument("--masks", required=True, help="binary GT segmentations")
    sp.add_argument("--class-masks", required=True, help="*_cm.tif class masks")
    sp.add_argument("--model-dir", required=True)
    sp.add_argument("--classifier-filters", type=int, default=16)
    sp.add_argument("--tile-h", type=int, default=384)
    sp.add_argument("--tile-w", type=int, default=384)
    sp.add_argument("--batch-size", type=int, default=5)
    sp.add_argument("--epochs", type=int, default=50)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_train)
    return p


def main(argv=None):
    from semtpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
