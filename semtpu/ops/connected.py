"""Connected-component labeling via iterative min-label propagation.

Replaces `scipy.ndimage.label` (used for watershed markers,
`Measurements.py:300`). Bounded-iteration, jittable: initialize every
foreground pixel with a unique id, then repeatedly take the minimum over the
connected neighborhood until fixpoint. Converges in O(component diameter)
sweeps.

Measured note (v5e, 768x1024 particle mask): the pure stencil runs ~800
cheap VPU sweeps in ~31 ms, while a pointer-jumping variant (gather to the
current label's label, halving path lengths) needs only ~15 sweeps but
costs ~743 ms — random gathers serialize on the TPU scalar path, 24x
slower end-to-end. Dense stencil iteration is the TPU-native choice even
at O(diameter) iteration counts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _neighbor_min(lab: jax.Array, connectivity: int) -> jax.Array:
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    p = jnp.pad(lab, 1, constant_values=big)
    cands = [
        lab,
        p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:],
    ]
    if connectivity == 2:
        cands += [p[:-2, :-2], p[:-2, 2:], p[2:, :-2], p[2:, 2:]]
    out = cands[0]
    for c in cands[1:]:
        out = jnp.minimum(out, c)
    return out


@partial(jax.jit, static_argnames=("connectivity", "max_iter"))
def label(mask: jax.Array, connectivity: int = 1, max_iter: int = 4096) -> tuple[jax.Array, jax.Array]:
    """Label connected components of a boolean mask.

    connectivity=1 -> 4-connected (scipy.ndimage.label default),
    connectivity=2 -> 8-connected.

    Returns (labels, num_labels). Labels are consecutive 1..num in
    first-pixel raster order (same ordering scipy produces).
    """
    m = mask.astype(bool)
    h, w = m.shape
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(m, idx, big)

    def cond(state):
        lab, changed, it = state
        return jnp.logical_and(changed, it < max_iter)

    def body(state):
        lab, _, it = state
        new = jnp.where(m, _neighbor_min(lab, connectivity), big)
        return new, jnp.any(new != lab), it + 1

    lab, changed, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True), 0))

    def _pointer_jump_phase(lab):
        """Rare fallback: a component whose diameter exceeds max_iter has
        not reached fixpoint under pure stencil sweeps (pointer jumping was
        dropped from the main loop because the gather costs 24x more than
        the stencil on TPU — commit 3855ec4). Alternating stencil +
        lab <- min(lab, lab[lab]) converges in O(log diameter) extra
        iterations, so truncation can never silently split a label."""
        def cond2(s):
            _, ch = s
            return ch

        def body2(s):
            cur, _ = s
            new = jnp.where(m, _neighbor_min(cur, connectivity), big)
            flat = new.ravel()
            jumped = jnp.where(flat < big,
                               flat[jnp.clip(flat, 0, h * w - 1)], big)
            new = jnp.minimum(flat, jumped).reshape(h, w)
            return new, jnp.any(new != cur)

        lab, _ = jax.lax.while_loop(cond2, body2, (lab, jnp.bool_(True)))
        return lab

    lab = jax.lax.cond(changed, _pointer_jump_phase, lambda l: l, lab)

    # compact to consecutive labels in raster order of component roots
    flat = jnp.where(m, lab, big).ravel()
    is_root = jnp.where(m.ravel(), flat == idx.ravel(), False)
    order = jnp.cumsum(is_root.astype(jnp.int32))
    num = order[-1]
    # root id -> compact label: scatter order at root positions
    lut = jnp.zeros(h * w, dtype=jnp.int32).at[jnp.where(is_root, idx.ravel(), 0)].max(
        jnp.where(is_root, order, 0)
    )
    out = jnp.where(m.ravel(), lut[jnp.clip(flat, 0, h * w - 1)], 0).reshape(h, w)
    return out, num
