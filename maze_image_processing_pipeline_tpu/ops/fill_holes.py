"""Per-region filled area from ONE frame-level pass (no per-crop work).

The reference computes each region's filled area with
``scipy.ndimage.binary_fill_holes`` on the region's crop
(``skimage.regionprops.area_filled`` semantics, consumed by the ZooProcess
features at ``/root/reference/maze_ipp/loki/pipeline.py:625``). Doing that
per crop is host work proportional to the number of objects. Here the
whole batch of label frames is processed in one device pass:

* label the **background** 4-connected (``binary_fill_holes``'s default
  structure) with the existing segmented-scan CCL;
* a background component is a *hole* iff it does not touch the frame
  border;
* each hole belongs to the region that encloses it — every 4-neighbour of
  the hole that is foreground carries that region's label, so the hole's
  min/max foreground-neighbour labels agree. ``area_filled[r] = area[r] +
  Σ holes owned by r`` via a scatter-free one-hot reduction.

The only case the frame-level pass cannot attribute is a hole whose
foreground neighbours belong to **different** regions (e.g. another region
sitting inside a region's hole, or two interlocking regions). Those holes
are flagged and the affected regions report ``ambiguous``; callers fall
back to the reference's per-crop fill for exactly those regions, keeping
bit parity. The same applies when the background-component cap overflows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .label import label

__all__ = ["region_filled_extra"]

# Python int, NOT jnp.int32: a module-level jnp scalar is a device array
# that every capturing trace re-fetches at lowering (BASELINE.md trap).
_BIG = 1 << 30


@functools.partial(jax.jit, static_argnames=("num_segments", "bg_segments"))
def region_filled_extra(
    labels: jnp.ndarray,
    *,
    num_segments: int,
    bg_segments: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-region enclosed-hole area and attribution-ambiguity flags.

    Args:
        labels: (..., H, W) int32 label images, 0 = background.
        num_segments: static region-axis size R (ids < R are measured).
        bg_segments: one-hot bound for background components. On overflow
            every region of the affected frame is flagged ambiguous.

    Returns:
        (extra, ambiguous): ``extra`` (..., R) f32 hole area per region
        (``area_filled = area + extra``); ``ambiguous`` (..., R) bool —
        True where the frame-level attribution is unsound and the caller
        must fall back to per-crop hole filling.
    """
    batch_shape = labels.shape[:-2]
    H, W = labels.shape[-2:]
    lab = labels.reshape((-1, H, W)).astype(jnp.int32)
    B = lab.shape[0]
    R = num_segments
    C = bg_segments

    bg = lab == 0
    bg_lab, n_bg = label(bg, connectivity=1, pallas=False)

    c_ids = jnp.arange(C, dtype=jnp.int32)
    oh_c = bg_lab[..., None] == c_ids  # virtual; fused into each reduce

    comp_area = jnp.sum(oh_c, axis=(1, 2), dtype=jnp.float32)  # (B, C)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    on_border = (rows == 0) | (rows == H - 1) | (cols == 0) | (cols == W - 1)
    touches_border = jnp.any(oh_c & on_border[None, ..., None], axis=(1, 2))

    # Foreground labels of the 4-neighbourhood of every pixel (0 where the
    # neighbour is background or outside).
    def shift(x, dy, dx):
        return jnp.roll(x, (dy, dx), axis=(1, 2))

    nb_max = jnp.zeros_like(lab)
    nb_min = jnp.full_like(lab, _BIG)
    for dy, dx, edge in (
        (1, 0, rows == 0),
        (-1, 0, rows == H - 1),
        (0, 1, cols == 0),
        (0, -1, cols == W - 1),
    ):
        nb = jnp.where(edge[None], 0, shift(lab, dy, dx))
        nb_max = jnp.maximum(nb_max, nb)
        nb_min = jnp.minimum(nb_min, jnp.where(nb > 0, nb, _BIG))

    # Per background component: min/max foreground-neighbour label.
    comp_nb_max = jnp.max(
        jnp.where(oh_c, nb_max[..., None], 0), axis=(1, 2)
    )  # (B, C)
    comp_nb_min = jnp.min(
        jnp.where(oh_c, nb_min[..., None], _BIG), axis=(1, 2)
    )  # (B, C)

    is_hole = (~touches_border) & (c_ids[None, :] > 0) & (c_ids[None, :] <= n_bg[:, None])
    unanimous = comp_nb_max == comp_nb_min  # single enclosing region
    has_nb = comp_nb_max > 0
    owner = jnp.where(is_hole & unanimous & has_nb, comp_nb_max, 0)

    r_ids = jnp.arange(R, dtype=jnp.int32)
    extra = jnp.sum(
        jnp.where(owner[..., None] == r_ids, comp_area[..., None], 0.0),
        axis=1,
    )  # (B, R)
    extra = extra.at[:, 0].set(0.0)

    # Ambiguous holes: not attributable to a single region. Flag every
    # region in [min, max] of the hole's neighbour labels (conservative).
    amb_comp = is_hole & has_nb & (~unanimous)
    lo = jnp.where(amb_comp, comp_nb_min, _BIG)[..., None]  # (B, C, 1)
    hi = jnp.where(amb_comp, comp_nb_max, -1)[..., None]
    ambiguous = jnp.any((r_ids >= lo) & (r_ids <= hi), axis=1)  # (B, R)
    # Component-cap overflow: attribution unsound for the whole frame.
    overflow = (n_bg >= C)[:, None]
    ambiguous = (ambiguous | overflow) & (r_ids > 0)

    return (
        extra.reshape(batch_shape + (R,)),
        ambiguous.reshape(batch_shape + (R,)),
    )
