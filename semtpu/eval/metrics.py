"""Segmentation quality metrics, vectorized / device-capable.

Replaces `Archive/Other Scripts/Calculate_Scores.py:69-136`:

- whole-image IoU: AND/OR reduction (`:69-70`)
- instance IoU: the reference loops over contour pairs with bbox prescreen
  and redraws full-image masks per pair (`:73-104`). Here both images are
  CC-labeled once and all pairwise intersections come from one joint
  histogram — identical best-match IoU per predicted instance, O(HW).
- pixel ROC: the reference's per-pixel Python double loop (`:107-136`)
  becomes four reductions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from semtpu import native


@jax.jit
def whole_image_iou(pred: jax.Array, gt: jax.Array) -> jax.Array:
    p = pred > 0
    g = gt > 0
    inter = jnp.sum(p & g)
    union = jnp.sum(p | g)
    return inter / jnp.maximum(union, 1)


@jax.jit
def roc_rates(pred: jax.Array, gt: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(TPR, TNR, FPR, FNR) over binary {0,1} maps (reference `ROC`)."""
    p = (pred > 0).astype(jnp.float32)
    g = (gt > 0).astype(jnp.float32)
    tp = jnp.sum(p * g)
    tn = jnp.sum((1 - p) * (1 - g))
    fp = jnp.sum(p * (1 - g))
    fn = jnp.sum((1 - p) * g)
    pos = jnp.maximum(tp + fn, 1)
    neg = jnp.maximum(tn + fp, 1)
    return tp / pos, tn / neg, fp / neg, fn / pos


def youden_index(pred, gt) -> float:
    tpr, tnr, _, _ = roc_rates(pred, gt)
    return float(tpr + tnr - 1.0)


def instance_iou(pred: np.ndarray, gt: np.ndarray, min_area: float = 0.0) -> float:
    """Average best-match IoU per predicted instance.

    Instances are 4-connected components (the pipeline emits 4-connected
    masks). For each predicted instance with area > min_area, the best IoU
    against any overlapping GT instance; averaged over predicted instances.
    """
    pl, n_p = native.cc_label(np.asarray(pred) > 0, connectivity=1)
    gl, n_g = native.cc_label(np.asarray(gt) > 0, connectivity=1)
    if n_p == 0:
        return 0.0
    pl = pl.ravel()
    gl = gl.ravel()

    p_areas = np.bincount(pl, minlength=n_p + 1).astype(np.float64)
    g_areas = np.bincount(gl, minlength=n_g + 1).astype(np.float64)

    # joint histogram of (pred label, gt label) pairs
    joint = np.bincount(pl * (n_g + 1) + gl,
                        minlength=(n_p + 1) * (n_g + 1)).reshape(n_p + 1, n_g + 1)
    inter = joint[1:, 1:].astype(np.float64)                      # (n_p, n_g)
    union = p_areas[1:, None] + g_areas[None, 1:] - inter
    iou = np.where(inter > 0, inter / np.maximum(union, 1), 0.0)
    best = iou.max(axis=1) if n_g > 0 else np.zeros(n_p)

    keep = p_areas[1:] > min_area
    if not keep.any():
        return 0.0
    return float(best[keep].mean())


def _contingency(pred_labels, gt_labels):
    pl = np.asarray(pred_labels).ravel().astype(np.int64)
    gl = np.asarray(gt_labels).ravel().astype(np.int64)
    n_p = int(pl.max()) + 1
    n_g = int(gl.max()) + 1
    joint = np.bincount(pl * n_g + gl, minlength=n_p * n_g).reshape(n_p, n_g)
    return joint.astype(np.float64)


def rand_error(pred, gt, connectivity: int = 1) -> float:
    """Rand error (1 - Rand index) between instance segmentations.

    Capability parity with the reference's ImageJ metrics plugin
    (`Archive/Other Scripts/calculate_Metrics.java:16-162`, which scores
    Rand / warping / pixel errors via trainableSegmentation). Instances are
    connected components of the binary masks; background counts as one
    segment (the plugin's full-image convention).
    """
    pl, _ = native.cc_label(np.asarray(pred) > 0, connectivity=connectivity)
    gl, _ = native.cc_label(np.asarray(gt) > 0, connectivity=connectivity)
    joint = _contingency(pl, gl)
    n = joint.sum()
    if n < 2:
        return 0.0

    def c2(x):
        return x * (x - 1) / 2.0

    a = c2(joint).sum()
    row = c2(joint.sum(axis=1)).sum()
    col = c2(joint.sum(axis=0)).sum()
    total = c2(n)
    rand_index = (total + 2 * a - row - col) / total
    return float(1.0 - rand_index)


def variation_of_information(pred, gt, connectivity: int = 1) -> float:
    """VOI = H(S|T) + H(T|S) between instance segmentations (nats)."""
    pl, _ = native.cc_label(np.asarray(pred) > 0, connectivity=connectivity)
    gl, _ = native.cc_label(np.asarray(gt) > 0, connectivity=connectivity)
    joint = _contingency(pl, gl)
    n = joint.sum()
    p = joint / n
    pi = p.sum(axis=1, keepdims=True)
    pj = p.sum(axis=0, keepdims=True)
    nz = p > 0
    h_cond_t = -np.sum(p[nz] * np.log(p[nz] / np.broadcast_to(pj, p.shape)[nz]))
    h_cond_s = -np.sum(p[nz] * np.log(p[nz] / np.broadcast_to(pi, p.shape)[nz]))
    return float(h_cond_t + h_cond_s)


def pixel_error(pred, gt) -> float:
    """Fraction of disagreeing pixels between binary maps."""
    p = np.asarray(pred) > 0
    g = np.asarray(gt) > 0
    return float((p != g).mean())
