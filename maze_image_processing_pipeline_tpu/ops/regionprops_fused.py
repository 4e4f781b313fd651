"""Scatter-free fused region measurement (the hot-path regionprops).

The general :mod:`.regionprops` uses segment reductions (scatter-adds),
which are slow on TPU (~500 ms/frame measured). This module recasts every
statistic as a **one-hot compare fused into a reduction** — XLA fuses
``(labels == r)`` into each reduce without materializing the ``(…, R)``
tensor, hitting VPU speeds — plus one bf16 MXU contraction for the
per-region intensity histograms:

* ``area``/``perimeter``/intensity sums: masked reduces over (H, W);
* row/column presence counts: masked reduces over one spatial axis, giving
  bounding boxes *and* exact separable second moments ``mu20``/``mu02``;
* cancellation-sensitive terms (``mu11``, intensity central moments) use a
  second pass with per-pixel gathered centroids/means (gathers are cheap;
  scatters are not);
* histograms: chunked ``einsum('bpr,bpc->brc')`` of the label one-hot
  against an intensity-bin one-hot in bf16 (exact for 0/1 values).

Perimeter uses the calibrated marching-squares lengths of
:mod:`.regionprops`, attributed per pixel (each 2×2 block's length is
assigned to its raster-last foreground corner — blocks never span two
8-connected regions).

Output keys match :func:`.regionprops.regionprops` (the slow version is the
test oracle), including ``feret_diameter_max``: for every direction the
projection extreme of a region is attained at one of its per-row x-extremes,
so the K-angle caliper sweep is reproduced exactly from (…, H, R) row data
(see :func:`feret_from_row_extremes`).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .regionprops import _marching_squares_length

__all__ = ["regionprops_fused", "feret_from_row_extremes"]


def feret_from_row_extremes(
    rowminx: jnp.ndarray,
    rowmaxx: jnp.ndarray,
    row_present: jnp.ndarray,
    n_angles: int = 16,
) -> jnp.ndarray:
    """Max-caliper (feret) diameter from per-row x extremes.

    For any direction (cos a, sin a), the extreme of ``y·cos a + x·sin a``
    over a region's pixels is attained at a per-row x-min or x-max (x enters
    linearly within a row), so sweeping the boundary points reproduces the
    full-pixel sweep of ``regionprops`` (ops/regionprops.py:207-229)
    exactly, at O(H·R·K) instead of O(H·W·R·K). Matches the reference's
    skimage ``feret_diameter_max`` usage (/root/reference/maze_ipp/loki/
    pipeline.py:625) via the shared K-angle contract.

    Args:
        rowminx / rowmaxx: (..., H, R) per-row min/max x per region
            (sentinels of +1e9 / -1e9 on empty rows are fine).
        row_present: (..., H, R) bool, region occupies this row.
        n_angles: projection count (contract: same default as regionprops).

    Returns:
        (..., R) feret_diameter_max (max extent over angles + 1).
    """
    H = rowminx.shape[-2]
    hh = jnp.arange(H, dtype=jnp.float32)[:, None]
    extents = []
    for k in range(n_angles):
        a = k * math.pi / n_angles
        c, s = math.cos(a), math.sin(a)
        p1 = hh * c + rowminx * s
        p2 = hh * c + rowmaxx * s
        hi = jnp.max(
            jnp.where(row_present, jnp.maximum(p1, p2), jnp.float32(-1e9)), axis=-2
        )
        lo = jnp.min(
            jnp.where(row_present, jnp.minimum(p1, p2), jnp.float32(1e9)), axis=-2
        )
        extents.append(hi - lo)
    return jnp.max(jnp.stack(extents, axis=-1), axis=-1) + 1.0


def _per_pixel_perimeter(labels: jnp.ndarray) -> jnp.ndarray:
    """Assign each 2×2 block's contour length to its raster-last fg corner."""
    fg = labels > 0
    block_len = _marching_squares_length(fg)  # (..., H+1, W+1)
    pad = [(0, 0)] * (fg.ndim - 2) + [(1, 1), (1, 1)]
    m = jnp.pad(fg, pad)
    a = m[..., :-1, :-1]
    b = m[..., :-1, 1:]
    c = m[..., 1:, :-1]
    d = m[..., 1:, 1:]
    # raster-last fg corner: d wins, then c, then b, then a.
    to_d = d
    to_c = c & ~d
    to_b = b & ~c & ~d
    to_a = a & ~b & ~c & ~d
    out = jnp.zeros(fg.shape, jnp.float32)
    # Block (i,j) corner pixels: a=(i-1,j-1) b=(i-1,j) c=(i,j-1) d=(i,j).
    out = out + jnp.where(to_d, block_len, 0.0)[..., :-1, :-1]
    out = out + jnp.where(to_c, block_len, 0.0)[..., :-1, 1:]
    out = out + jnp.where(to_b, block_len, 0.0)[..., 1:, :-1]
    out = out + jnp.where(to_a, block_len, 0.0)[..., 1:, 1:]
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_segments",
        "compute_histogram",
        "hist_row_chunk",
        "n_feret_angles",
        "return_row_extremes",
    ),
)
def regionprops_fused(
    labels: jnp.ndarray,
    intensity: Optional[jnp.ndarray] = None,
    *,
    num_segments: int,
    compute_histogram: bool = True,
    hist_row_chunk: int = 512,
    n_feret_angles: int = 16,
    return_row_extremes: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Measure all regions of a batch of label images without scatters.

    Args:
        labels: int32 (..., H, W), ids in [0, R], 0 = background.
        intensity: optional (..., H, W) uint8-range intensity image.
        num_segments: static region axis size R+1.
        compute_histogram: per-region 256-bin histograms (uint8 intensity).
        hist_row_chunk: rows per histogram-contraction chunk.

    Returns:
        dict of (..., num_segments) arrays; keys as in ``regionprops``.
    """
    batch_shape = labels.shape[:-2]
    H, W = labels.shape[-2:]
    R = num_segments
    lab = labels.reshape((-1, H, W))
    B = lab.shape[0]
    inten = None
    if intensity is not None:
        inten = intensity.reshape((-1, H, W)).astype(jnp.float32)

    r_ids = jnp.arange(R, dtype=jnp.int32)
    oh = lab[..., None] == r_ids  # virtual; fused into each reduce

    def reduce_hw(values):  # Σ over pixels of values where label==r
        return jnp.sum(jnp.where(oh, values[..., None], 0.0), axis=(1, 2))

    area = jnp.sum(oh, axis=(1, 2), dtype=jnp.float32)
    safe_area = jnp.maximum(area, 1.0)

    rowcnt = jnp.sum(oh, axis=2, dtype=jnp.float32)  # (B, H, R)
    colcnt = jnp.sum(oh, axis=1, dtype=jnp.float32)  # (B, W, R)

    perim = reduce_hw(_per_pixel_perimeter(lab))

    hh = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    ww = jnp.arange(W, dtype=jnp.float32)[None, :, None]

    sum_y = jnp.sum(rowcnt * hh, axis=1)
    sum_x = jnp.sum(colcnt * ww, axis=1)
    cy = sum_y / safe_area
    cx = sum_x / safe_area

    # Exact separable central moments from the presence counts.
    mu20 = jnp.sum(rowcnt * (hh - cy[:, None, :]) ** 2, axis=1)
    mu02 = jnp.sum(colcnt * (ww - cx[:, None, :]) ** 2, axis=1)

    # Product moment, separable + cancellation-safe: center x PER PIXEL
    # against the region's cx (broadcast over the R axis — no per-pixel
    # centroid gather), row-reduce, then weight rows by (y − cy).
    # Σ (y−cy)(x−cx) = Σ_y (y−cy) · Σ_{x∈row} (x−cx).
    xc = ww.reshape(1, 1, W, 1) - cx[:, None, None, :]  # (B, 1, W, R)
    rowxc = jnp.sum(jnp.where(oh, xc, 0.0), axis=2)  # (B, H, R)
    mu11 = jnp.sum((hh - cy[:, None, :]) * rowxc, axis=1)

    # Bounding boxes from presence.
    row_present = rowcnt > 0
    col_present = colcnt > 0
    min_row = jnp.min(jnp.where(row_present, hh, jnp.float32(H + 1)), axis=1)
    max_row = jnp.max(jnp.where(row_present, hh, -1.0), axis=1) + 1
    min_col = jnp.min(jnp.where(col_present, ww, jnp.float32(W + 1)), axis=1)
    max_col = jnp.max(jnp.where(col_present, ww, -1.0), axis=1) + 1

    feret = None
    rowminx = rowmaxx = None
    if n_feret_angles or return_row_extremes:
        ww_hw = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
        rowminx = jnp.min(jnp.where(oh, ww_hw, jnp.float32(1e9)), axis=2)
        rowmaxx = jnp.max(jnp.where(oh, ww_hw, jnp.float32(-1e9)), axis=2)
    if n_feret_angles:
        feret = feret_from_row_extremes(
            rowminx, rowmaxx, row_present, n_angles=n_feret_angles
        )

    # Ellipse fit (skimage formulas: 4·sqrt of inertia eigenvalues).
    m20 = mu20 / safe_area
    m02 = mu02 / safe_area
    m11 = mu11 / safe_area
    common = jnp.sqrt(jnp.maximum((m20 - m02) ** 2 + 4 * m11 * m11, 0.0))
    lam1 = (m20 + m02 + common) / 2
    lam2 = (m20 + m02 - common) / 2

    props: Dict[str, jnp.ndarray] = {
        "area": area,
        "min_row": min_row,
        "min_col": min_col,
        "max_row": max_row,
        "max_col": max_col,
        "centroid_row": cy,
        "centroid_col": cx,
        "mu20": mu20,
        "mu02": mu02,
        "mu11": mu11,
        "axis_major_length": 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)),
        "axis_minor_length": 4.0 * jnp.sqrt(jnp.maximum(lam2, 0.0)),
        "orientation": 0.5 * jnp.arctan2(2.0 * m11, m20 - m02),
        "eccentricity": jnp.sqrt(
            jnp.maximum(1.0 - lam2 / jnp.maximum(lam1, 1e-12), 0.0)
        ),
        "perimeter": perim,
    }
    if feret is not None:
        props["feret_diameter_max"] = feret
    if return_row_extremes:
        # (..., H, R): exact convex-hull support points (hull vertices are a
        # subset of per-row x extremes) for host-side hull computations.
        props["rowminx"] = rowminx
        props["rowmaxx"] = rowmaxx
        props["row_present"] = row_present.astype(jnp.float32)

    if inten is not None:
        s1 = reduce_hw(inten)
        safe_s1 = jnp.where(s1 != 0, s1, 1.0)
        mean = s1 / safe_area

        hist = None
        if compute_histogram:
            bins_i = jnp.clip(inten, 0, 255).astype(jnp.int32)
            # Clamp the chunk to H so small crops don't pad up to a full
            # chunk; 512 beat 128 by ~30% at (8, 1024, 1024) on v5e
            # (tools/perf_props.py chunk sweep, BASELINE.md round 3).
            chunk = min(hist_row_chunk, H)
            n_chunks = -(-H // chunk)
            H_pad = n_chunks * chunk
            lab_p = jnp.pad(lab, ((0, 0), (0, H_pad - H), (0, 0))) if H_pad != H else lab
            bin_p = (
                jnp.pad(bins_i, ((0, 0), (0, H_pad - H), (0, 0)))
                if H_pad != H
                else bins_i
            )
            lab_c = lab_p.reshape(B, n_chunks, chunk * W)
            bin_c = bin_p.reshape(B, n_chunks, chunk * W)
            bin_range = jnp.arange(256, dtype=jnp.int32)

            def body(acc, xs):
                lc, bc = xs
                l_oh = (lc[..., None] == r_ids).astype(jnp.bfloat16)
                b_oh = (bc[..., None] == bin_range).astype(jnp.bfloat16)
                return (
                    acc
                    + jnp.einsum(
                        "bpr,bpc->brc",
                        l_oh,
                        b_oh,
                        preferred_element_type=jnp.float32,
                    ),
                    None,
                )

            hist0 = jnp.zeros((B, R, 256), jnp.float32)
            hist, _ = jax.lax.scan(
                body,
                hist0,
                (jnp.moveaxis(lab_c, 1, 0), jnp.moveaxis(bin_c, 1, 0)),
            )
            if H_pad != H:
                # Padding rows are label 0 / bin 0: make the background
                # row exact instead of documenting the leak away (the
                # hist-derived moments below depend on it).
                hist = hist.at[:, 0, 0].add(-float((H_pad - H) * W))
            props["histogram"] = hist

        if hist is not None and jnp.issubdtype(intensity.dtype, jnp.integer):
            # Exact central moments from the integer-bin counts the
            # histogram already paid for: replaces three O(H·W·R) masked
            # reduces (di², di³, di⁴), two masked min/max reduces, and the
            # per-pixel mean gather with O(R·256) post-processing.
            c_bins = jnp.arange(256, dtype=jnp.float32)
            d = c_bins[None, None, :] - mean[..., None]  # (B, R, 256)
            var = jnp.maximum(jnp.sum(hist * d * d, -1) / safe_area, 0.0)
            m3 = jnp.sum(hist * d**3, -1) / safe_area
            m4 = jnp.sum(hist * d**4, -1) / safe_area
            present = hist > 0
            imin = jnp.min(jnp.where(present, c_bins, jnp.float32(1e9)), -1)
            imax = jnp.max(jnp.where(present, c_bins, jnp.float32(-1e9)), -1)
        else:
            # Float intensities (or no histogram): per-pixel mean-shifted
            # passes (cancellation-safe; gathers are cheap, scatters not).
            flat = lab.reshape(B, H * W)
            mean_px = jnp.take_along_axis(mean, flat, axis=-1).reshape(B, H, W)
            di = inten - mean_px
            var = jnp.maximum(reduce_hw(di * di) / safe_area, 0.0)
            m3 = reduce_hw(di * di * di) / safe_area
            m4 = reduce_hw(di * di * di * di) / safe_area
            imin = jnp.min(
                jnp.where(oh, inten[..., None], jnp.float32(1e9)), axis=(1, 2)
            )
            imax = jnp.max(
                jnp.where(oh, inten[..., None], jnp.float32(-1e9)), axis=(1, 2)
            )

        std = jnp.sqrt(var)
        # Guard: std**3/std**4 underflow f32 for (near-)constant regions.
        ok = std > 1e-3
        std_safe = jnp.where(ok, std, 1.0)

        yy_full = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xx_full = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        props.update(
            intensity_sum=s1,
            intensity_mean=mean,
            intensity_std=std,
            intensity_skew=jnp.where(ok, m3 / std_safe**3, 0.0),
            intensity_kurtosis=jnp.where(ok, m4 / std_safe**4 - 3.0, 0.0),
            weighted_centroid_row=reduce_hw(inten * yy_full) / safe_s1,
            weighted_centroid_col=reduce_hw(inten * xx_full) / safe_s1,
            intensity_min=imin,
            intensity_max=imax,
        )

    return {k: v.reshape(batch_shape + v.shape[1:]) for k, v in props.items()}
