"""Device measurement for semantic-segmentation channels (predict workload).

The reference measures each crop's per-channel masks on the host, one
object at a time (``/root/reference/maze_ipp/predict/pipeline.py:59-180``:
threshold → per-object hole filling → keep largest 8-connected component →
area / major axis / convex area). Here one jitted program measures a
padded BATCH of crops for one channel:

* raw area of the thresholded mask;
* optional hole filling, exactly (no iterative flood fill): a hole is a
  4-connected background component that does not touch the border (the
  same CCL trick as :mod:`.threshold_props`; right/bottom zero padding is
  itself border-connected background, so padded crops measure like their
  true extents);
* 8-connected CCL → per-component areas → the largest component's
  area / axis_major_length / centroid / orientation, plus its per-row x
  extremes, from which the host computes the EXACT filled convex hull
  (hull vertices are a subset of row extremes — ~2H points instead of the
  full mask).

Note: the reference fills holes per object bounding box
(``ndi.find_objects`` slices); this implementation fills holes globally —
identical unless two objects' boxes overlap a shared background pocket.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .label import label
from .regionprops_fused import regionprops_fused

__all__ = ["measure_largest_component", "convex_area_from_extremes"]


@functools.partial(
    jax.jit, static_argnames=("fill_holes", "num_segments", "n_bg_segments")
)
def measure_largest_component(
    masks: jnp.ndarray,
    *,
    fill_holes: bool,
    num_segments: int = 16,
    n_bg_segments: int = 32,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Measure the largest 8-connected component of each mask in a batch.

    Args:
        masks: (N, H, W) bool thresholded channel predictions (zero padded).
        fill_holes: fill enclosed background before labeling.
        num_segments / n_bg_segments: one-hot bounds for the foreground /
            background component counts.

    Returns:
        (props, raw_area, extremes, overflow): ``props`` maps
        area / axis_major_length / centroid_row / centroid_col /
        orientation to (N,) arrays (all zero when the mask is empty);
        ``raw_area`` is the pre-fill pixel count (N,); ``extremes`` is
        (N, H, 3) float32 ``[rowminx, rowmaxx, row_present]`` of the
        largest component for host-side convex-hull work; ``overflow`` is
        a (N,) bool — True when the mask had more components than the
        one-hot bounds can measure (the true largest component may then
        be invisible to the argmax, or holes may stay unfilled), so the
        caller must fall back to host measurement for that mask.
    """
    masks = masks.astype(bool)
    raw_area = jnp.sum(masks, axis=(1, 2)).astype(jnp.int32)

    n_bg = None
    if fill_holes:
        bg_lab, n_bg = label(~masks, connectivity=1, pallas=False)
        N, H, W = masks.shape
        border = np.zeros((H, W), bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        r_ids = jnp.arange(n_bg_segments, dtype=jnp.int32)
        oh = bg_lab[..., None] == r_ids
        touches = jnp.any(oh & jnp.asarray(border)[None, :, :, None], axis=(1, 2))
        # Hole pixel: background whose component does not touch the border.
        # Components beyond the one-hot bound stay unfilled (safe default).
        outer = jnp.any(touches[:, None, None, :] & oh, axis=-1) | (
            bg_lab >= n_bg_segments
        )
        masks = masks | (~masks & ~outer)

    labels, n = label(masks, connectivity=2, pallas=False)
    props = regionprops_fused(
        labels,
        None,
        num_segments=num_segments,
        n_feret_angles=0,
        return_row_extremes=True,
    )
    areas = props["area"].at[..., 0].set(0.0)  # exclude background column
    best = jnp.argmax(areas, axis=-1)  # (N,) — first max, raster id order

    def take(v):  # (N, R) → (N,)
        return jnp.take_along_axis(v, best[:, None], axis=-1)[..., 0]

    def take_rows(v):  # (N, H, R) → (N, H)
        return jnp.take_along_axis(v, best[:, None, None], axis=-1)[..., 0]

    has = take(areas) > 0
    out = {
        k: jnp.where(has, take(props[k]), 0.0)
        for k in (
            "area",
            "axis_major_length",
            "centroid_row",
            "centroid_col",
            "orientation",
        )
    }
    extremes = jnp.stack(
        [
            take_rows(props["rowminx"]),
            take_rows(props["rowmaxx"]),
            take_rows(props["row_present"]),
        ],
        axis=-1,
    )
    # Overflow: label ids beyond the one-hot bounds are unmeasured, so the
    # argmax can silently pick a smaller component (fg), or holes can stay
    # unfilled (bg). Signal per mask for a host fallback.
    overflow = n > num_segments - 1
    if n_bg is not None:
        overflow = overflow | (n_bg > n_bg_segments - 1)
    return out, raw_area, extremes, overflow


def convex_area_from_extremes(extremes: np.ndarray, shape) -> float:
    """Pixel count of the filled convex hull from (H, 3) row extremes.

    Matches the reference's ``_convex_area`` (cv2 fillPoly pixel count,
    ``predict/pipeline.py:66``): the hull of the ≤2H per-row extreme
    points equals the hull of all mask pixels.
    """
    import cv2

    rows = np.nonzero(extremes[:, 2] > 0)[0]
    if rows.size == 0:
        return 0.0
    pts = np.concatenate(
        [
            np.stack([extremes[rows, 0], rows], axis=-1),
            np.stack([extremes[rows, 1], rows], axis=-1),
        ]
    ).astype(np.int32)
    if len(pts) < 3:
        return float(len(np.unique(pts, axis=0)))
    hull = cv2.convexHull(pts.reshape(-1, 1, 2))
    canvas = np.zeros(shape, np.uint8)
    cv2.fillPoly(canvas, [hull], 1)
    return float(canvas.sum())
