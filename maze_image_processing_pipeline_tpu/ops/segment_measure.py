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

__all__ = [
    "measure_largest_component",
    "measure_channels_packed",
    "unpack_channel_stats",
    "convex_area_from_extremes",
]


def _measure_masks(
    masks: jnp.ndarray,
    fill_holes: bool,
    num_segments: int,
    n_bg_segments: int,
):
    """Traceable body shared by :func:`measure_largest_component` and the
    packed multi-channel program (:func:`measure_channels_packed`)."""
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
    N, H, W = masks.shape
    # Only the LARGEST component is reported, so the full fused-props
    # machinery (one (N, H, W, R) masked reduce per statistic) is waste:
    # one one-hot pass finds per-id areas, the argmax picks the winner,
    # and every remaining statistic reduces over the winner's plain
    # (N, H, W) mask (measured 105 → ~35 ms per (32, 512², 2) chunk).
    r_ids = jnp.arange(num_segments, dtype=jnp.int32)
    areas_r = jnp.sum(
        (labels[..., None] == r_ids).astype(jnp.float32), axis=(1, 2)
    )
    areas_r = areas_r.at[..., 0].set(0.0)  # exclude background
    best = jnp.argmax(areas_r, axis=-1)  # (N,) — first max, raster id order
    area = jnp.take_along_axis(areas_r, best[:, None], axis=-1)[..., 0]
    has = area > 0

    bm = (labels == best[:, None, None]) & masks  # best=0 ⇒ empty via &masks
    bmf = bm.astype(jnp.float32)
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    safe = jnp.maximum(area, 1.0)
    cy = jnp.sum(bmf * yy, axis=(1, 2)) / safe
    cx = jnp.sum(bmf * xx, axis=(1, 2)) / safe
    dy = yy - cy[:, None, None]
    dx = xx - cx[:, None, None]
    m20 = jnp.sum(bmf * dy * dy, axis=(1, 2)) / safe
    m02 = jnp.sum(bmf * dx * dx, axis=(1, 2)) / safe
    m11 = jnp.sum(bmf * dy * dx, axis=(1, 2)) / safe
    common = jnp.sqrt(jnp.maximum((m20 - m02) ** 2 + 4 * m11 * m11, 0.0))
    lam1 = (m20 + m02 + common) / 2
    axis_major = 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))
    orientation = 0.5 * jnp.arctan2(2 * m11, m20 - m02)

    out = {
        "area": jnp.where(has, area, 0.0),
        "axis_major_length": jnp.where(has, axis_major, 0.0),
        "centroid_row": jnp.where(has, cy, 0.0),
        "centroid_col": jnp.where(has, cx, 0.0),
        "orientation": jnp.where(has, orientation, 0.0),
    }
    row_present = jnp.any(bm, axis=2)
    rowminx = jnp.min(jnp.where(bm, xx, jnp.float32(W)), axis=2)
    rowmaxx = jnp.max(jnp.where(bm, xx, jnp.float32(-1)), axis=2)
    extremes = jnp.stack(
        [
            jnp.where(row_present, rowminx, 0.0),
            jnp.where(row_present, rowmaxx, 0.0),
            row_present.astype(jnp.float32),
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


@functools.partial(
    jax.jit, static_argnames=("fill_holes", "num_segments", "n_bg_segments")
)
def measure_largest_component(
    masks: jnp.ndarray,
    *,
    fill_holes: bool,
    num_segments: int = 32,
    n_bg_segments: int = 64,
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
    return _measure_masks(masks, fill_holes, num_segments, n_bg_segments)


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape",
        "fill_channels",
        "num_segments",
        "n_bg_segments",
    ),
)
def measure_channels_packed(
    flat: jnp.ndarray,
    hs: jnp.ndarray,
    ws: jnp.ndarray,
    *,
    shape: Tuple[int, int, int, int],
    fill_channels: Tuple[bool, ...],
    num_segments: int = 32,
    n_bg_segments: int = 64,
) -> jnp.ndarray:
    """Measure every channel of a chunk of blended predictions IN PLACE on
    the device (the ``DeviceTiledInference`` fused-measurement tap).

    The host path fetches each object's prediction and measures it with
    scipy one at a time (``predict.pipeline.measure_segments``); the
    device-batched node re-uploads thresholded masks. Here the canvases
    are already in HBM as the blend program's output, so measurement costs
    one extra dispatch per chunk bucket and a small packed fetch.

    Args:
        flat: the blend program's flat output, logically (Bo, Hb, Wb, C).
        hs / ws: (Bo,) int32 true per-object extents — canvas content
            beyond them comes from padded tiles and must not be measured
            (the host path crops to ``[:h, :w]`` before measuring).
        shape: static (Bo, Hb, Wb, C).
        fill_channels: per-channel hole filling.

    Returns:
        flat float32 of ``(4 + 3*Hb) * C * Bo`` values: raw_area, area,
        axis_major_length, overflow — each (C, Bo) — then row extremes
        (C, Bo, Hb, 3). Decode with :func:`unpack_channel_stats`.
    """
    Bo, Hb, Wb, C = shape
    canvas = flat.reshape(Bo, Hb, Wb, C)
    extent = (jnp.arange(Hb, dtype=jnp.int32)[None, :, None] < hs[:, None, None]) & (
        jnp.arange(Wb, dtype=jnp.int32)[None, None, :] < ws[:, None, None]
    )
    small = []
    extremes_all = []
    for c in range(C):
        masks = (canvas[..., c] > 0.5) & extent
        props, raw, extremes, overflow = _measure_masks(
            masks, bool(fill_channels[c]), num_segments, n_bg_segments
        )
        small.append(
            jnp.stack(
                [
                    raw.astype(jnp.float32),
                    props["area"].astype(jnp.float32),
                    props["axis_major_length"].astype(jnp.float32),
                    overflow.astype(jnp.float32),
                ]
            )
        )  # (4, Bo)
        extremes_all.append(extremes.astype(jnp.float32))  # (Bo, Hb, 3)
    return jnp.concatenate(
        [
            jnp.stack(small).reshape(-1),  # (C, 4, Bo)
            jnp.stack(extremes_all).reshape(-1),  # (C, Bo, Hb, 3)
        ]
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape",
        "fill_channels",
        "num_segments",
        "n_bg_segments",
        "out_dtype",
    ),
)
def measure_channels_with_canvas(
    flat: jnp.ndarray,
    hs: jnp.ndarray,
    ws: jnp.ndarray,
    *,
    shape: Tuple[int, int, int, int],
    fill_channels: Tuple[bool, ...],
    num_segments: int = 32,
    n_bg_segments: int = 64,
    out_dtype=None,
) -> jnp.ndarray:
    """:func:`measure_channels_packed`, with the canvas CARRIED in the
    output: returns ``concat([flat, stats])`` so the caller fetches ONE
    buffer per chunk bucket instead of two (each extra fetch costs fixed
    dispatch latency through tunneled hosts — the separate stats fetch
    measured ~0.7 s per 332-object haul).

    ``out_dtype``: transfer dtype for the RETURNED buffer. Measurement
    always runs on ``flat`` as given (pass the f32 blend output so the
    0.5 threshold sees full precision — casting to f16 before measuring
    flips borderline pixels); the canvas is cast for transfer afterwards.
    When the canvas rides at float16, the float32 stats are BITCAST into
    pairs of f16 lanes (exact; :func:`split_canvas_stats` reverses it)."""
    stats = measure_channels_packed(
        flat,
        hs,
        ws,
        shape=shape,
        fill_channels=fill_channels,
        num_segments=num_segments,
        n_bg_segments=n_bg_segments,
    )
    if out_dtype is not None:
        flat = cast_for_transfer(flat, out_dtype)
    if flat.dtype != jnp.float32:
        stats = jax.lax.bitcast_convert_type(stats, flat.dtype).reshape(-1)
    return jnp.concatenate([flat, stats])


def cast_for_transfer(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Cast a probability canvas for the device→host transfer.

    ``uint8`` quantizes to 1/255 resolution (the opt-in ``raw_h5_dtype:
    uint8`` storage rung), rounding half DOWN so the stored-value
    threshold ``>= 128`` keeps the reference's STRICT ``p > 0.5``
    semantics at the exact boundary (zero logits — e.g. tile padding —
    produce exact 0.5 probabilities, which must stay background); any
    other dtype is a plain cast."""
    if jnp.dtype(dtype) == jnp.uint8:
        return jnp.clip(jnp.ceil(x * 255.0 - 0.5), 0.0, 255.0).astype(
            jnp.uint8
        )
    return x.astype(dtype)


def split_canvas_stats(
    buf: np.ndarray, Bo: int, Hb: int, Wb: int, C: int, elems=None
):
    """Decode :func:`measure_channels_with_canvas`'s buffer →
    (canvas (Bo, Hb, Wb, C), small (C, 4, Bo), extremes (C, Bo, Hb, 3)).

    ``elems``: the canvas part is BYTE-PACKED — a flat (``elems``,)
    buffer of per-object (true-height × width-rung) regions
    (DeviceTiledInference's packed fetch) returned as-is for the caller
    to slice, instead of Bo dense windows."""
    buf = np.asarray(buf)
    if elems is not None:
        n_canvas = elems
        canvas = buf[:n_canvas]
    else:
        n_canvas = Bo * Hb * Wb * C
        canvas = buf[:n_canvas].reshape(Bo, Hb, Wb, C)
    stats = buf[n_canvas:]
    if stats.dtype != np.float32:
        stats = np.ascontiguousarray(stats).view(np.float32)
    small, extremes = unpack_channel_stats(stats, Bo, Hb, C)
    return canvas, small, extremes


def unpack_channel_stats(flat: np.ndarray, Bo: int, Hb: int, C: int):
    """Decode :func:`measure_channels_packed`'s buffer →
    (small (C, 4, Bo) float32, extremes (C, Bo, Hb, 3) float32)."""
    flat = np.asarray(flat)
    n_small = C * 4 * Bo
    small = flat[:n_small].reshape(C, 4, Bo)
    extremes = flat[n_small:].reshape(C, Bo, Hb, 3)
    return small, extremes


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
