"""Pallas TPU kernel: single-pass fused region measurement.

STATUS (round 3): **measured negative result — no longer dispatched.**
When written, XLA lowered the one-hot reductions of
:mod:`.regionprops_fused` as separate passes over the label image
(~70 ms per masked reduce at R=256 on v5e) and this kernel won. After
the round-2/3 lowering fixes, the XLA formulation composes in the
segmentation chain at 22.3 ms/batch vs 43.6 with this kernel
(tools/perf_lab.py `chainxla` vs `chain`): Mosaic pads narrow lane dims
and the strip grid re-materializes the (TH, W, R) one-hot per strip,
while XLA now fuses the contractions into full-width MXU passes. Kept,
like ``models/pallas_norm.py`` and ``ops/pallas_relabel.py``, as a
tested record of the approach. Original design:

This kernel makes the whole measurement **one pass over HBM** (round 1
used two; the second pass is eliminated analytically):

* One grid sweep over row-strips builds the label one-hot once per
  ``(TH, W)`` strip in VMEM and feeds it to

  - an MXU contraction against the feature planes
    ``[1, perimeter, I, I·y, I·x]`` accumulated into a VMEM ``(R, F)``
    block,
  - per-row presence counts *and per-row x-sums* (bounding boxes, exact
    separable second moments μ20/μ02 **and μ11**),
  - per-column presence counts,
  - a bf16 MXU contraction against the intensity-bin one-hot for the
    per-region 256-bin histograms.

* The former pass 2 (cancellation-safe central moments) is replaced by
  exact closed forms computed from the strip outputs:

  - ``mu11 = Σ_h (h - cy)·(rowsumx[h] - cx·rowcnt[h])`` — separable and
    cancellation-safe (each term is an exact ≤2^20 f32 integer sum),
  - intensity central moments m2/m3/m4 from the 256-bin histogram, which
    is **exact** because intensities are integer bins:
    ``m_k = Σ_b hist[b]·(b - mean)^k / area``.

Accumulator blocks are revisited across the row-strip grid dimension (the
standard Pallas reduction pattern: zero at ``h == 0``, accumulate after),
so nothing but the inputs ever leaves VMEM during the sweep. Strips without
foreground skip all heavy work (plankton frames are sparse).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maze_image_processing_pipeline_tpu.ops.regionprops_fused import (
    _per_pixel_perimeter,
    feret_from_row_extremes,
)

__all__ = ["regionprops_fused_pallas"]


def _pass1_kernel(
    lab_ref,
    img_ref,
    perim_ref,
    moments_ref,
    rowcnt_ref,
    rowsumx_ref,
    rowminx_ref,
    rowmaxx_ref,
    colcnt_ref,
    hist_ref,
):
    h = pl.program_id(1)
    TH, W = lab_ref.shape[1:]
    R = moments_ref.shape[1]

    lab = lab_ref[0]  # (TH, W) int32

    @pl.when(h == 0)
    def _():
        moments_ref[:] = jnp.zeros_like(moments_ref)
        colcnt_ref[:] = jnp.zeros_like(colcnt_ref)
        hist_ref[:] = jnp.zeros_like(hist_ref)

    # Plankton frames are sparse: strips without foreground skip all the
    # heavy work (their rowcnt/hist/moment contributions are zero; the
    # background column r=0 is never consumed downstream).
    has_fg = jnp.any(lab > 0)

    @pl.when(jnp.logical_not(has_fg))
    def _():
        rowcnt_ref[:] = jnp.zeros_like(rowcnt_ref)
        rowsumx_ref[:] = jnp.zeros_like(rowsumx_ref)
        rowminx_ref[:] = jnp.full_like(rowminx_ref, 1e9)
        rowmaxx_ref[:] = jnp.full_like(rowmaxx_ref, -1e9)

    @pl.when(has_fg)
    def _():
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (TH, W, R), 2)
        ohb = lab[..., None] == r_ids  # (TH, W, R) bool
        onehot = ohb.astype(jnp.float32)

        img = img_ref[0].astype(jnp.float32)
        perim = perim_ref[0]
        yy = (
            jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0).astype(jnp.float32)
            + (h * TH).astype(jnp.float32)
        )
        xx = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1).astype(jnp.float32)

        ones = jnp.ones((TH, W), jnp.float32)
        feats = jnp.stack([ones, perim, img, img * yy, img * xx], axis=-1)

        oh2 = onehot.reshape(TH * W, R)
        f2 = feats.reshape(TH * W, feats.shape[-1])
        # Orient the contraction so the tiny feature count lands on the M
        # (not the 128-lane N) dimension of the MXU. HIGHEST precision keeps
        # the |values| <= 2^18 feature products exact (Mosaic supports only
        # DEFAULT/HIGHEST).
        m = jax.lax.dot_general(
            f2,
            oh2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (F, R)

        moments_ref[0] += m.T
        rowcnt_ref[0] = jnp.sum(onehot, axis=1)  # (TH, R)
        rowsumx_ref[0] = jnp.sum(onehot * xx[..., None], axis=1)  # (TH, R)
        xr = xx[..., None]
        rowminx_ref[0] = jnp.min(jnp.where(ohb, xr, jnp.float32(1e9)), axis=1)
        rowmaxx_ref[0] = jnp.max(jnp.where(ohb, xr, jnp.float32(-1e9)), axis=1)
        colcnt_ref[0] += jnp.sum(onehot, axis=0)  # (W, R)

        # Histogram: bf16 MXU contraction of label-onehot vs intensity-bin
        # onehot, chunked over bins to bound the VMEM working set.
        bins = img.astype(jnp.int32)
        oh2_bf16 = oh2.astype(jnp.bfloat16)
        BIN_CHUNK = 128
        for c0 in range(0, 256, BIN_CHUNK):
            bin_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (TH, W, BIN_CHUNK), 2) + c0
            )
            bin_oh = (bins[..., None] == bin_ids).astype(jnp.bfloat16)
            hh = jax.lax.dot_general(
                oh2_bf16,
                bin_oh.reshape(TH * W, BIN_CHUNK),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hist_ref[0, :, c0 : c0 + BIN_CHUNK] += hh


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_segments",
        "compute_histogram",
        "interpret",
        "tile_rows",
        "n_feret_angles",
    ),
)
def regionprops_fused_pallas(
    labels: jnp.ndarray,
    intensity: jnp.ndarray,
    *,
    num_segments: int,
    compute_histogram: bool = True,
    interpret: bool = False,
    tile_rows: int = 8,
    n_feret_angles: int = 16,
) -> Dict[str, jnp.ndarray]:
    """Pallas single-pass fused region measurement (TPU hot path).

    Same contract as :func:`.regionprops_fused.regionprops_fused` with
    intensity required (integer-valued in [0, 256)). ``interpret=True`` runs
    the kernel in interpreter mode (CPU testing).
    """
    batch_shape = labels.shape[:-2]
    H, W = labels.shape[-2:]
    R = num_segments
    lab = labels.reshape((-1, H, W)).astype(jnp.int32)
    B = lab.shape[0]
    img = intensity.reshape((-1, H, W)).astype(jnp.float32)

    _TH = tile_rows
    n_h = -(-H // _TH)
    H_pad = n_h * _TH
    if H_pad != H:
        lab = jnp.pad(lab, ((0, 0), (0, H_pad - H), (0, 0)))
        img = jnp.pad(img, ((0, 0), (0, H_pad - H), (0, 0)))

    perim_px = _per_pixel_perimeter(lab)

    F = 5
    grid = (B, n_h)
    row_block = pl.BlockSpec((1, _TH, W), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM)
    strip_out = pl.BlockSpec((1, _TH, R), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM)
    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda b, h: (b,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )

    moments, rowcnt, rowsumx, rowminx, rowmaxx, colcnt, hist = pl.pallas_call(
        _pass1_kernel,
        grid=grid,
        in_specs=[row_block, row_block, row_block],
        out_specs=(
            acc_spec((R, F)),
            strip_out,
            strip_out,
            strip_out,
            strip_out,
            acc_spec((W, R)),
            acc_spec((R, 256)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, F), jnp.float32),
            jax.ShapeDtypeStruct((B, H_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, H_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, H_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, H_pad, R), jnp.float32),
            jax.ShapeDtypeStruct((B, W, R), jnp.float32),
            jax.ShapeDtypeStruct((B, R, 256), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(lab, img, perim_px)

    rowcnt = rowcnt[:, :H]
    rowsumx = rowsumx[:, :H]
    rowminx = rowminx[:, :H]
    rowmaxx = rowmaxx[:, :H]

    area = moments[..., 0]
    safe_area = jnp.maximum(area, 1.0)
    perim = moments[..., 1]
    s1 = moments[..., 2]
    safe_s1 = jnp.where(s1 != 0, s1, 1.0)
    mean = s1 / safe_area

    hh = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    ww = jnp.arange(W, dtype=jnp.float32)[None, :, None]

    sum_y = jnp.sum(rowcnt * hh, axis=1)
    sum_x = jnp.sum(colcnt * ww, axis=1)
    cy = sum_y / safe_area
    cx = sum_x / safe_area
    mu20 = jnp.sum(rowcnt * (hh - cy[:, None, :]) ** 2, axis=1)
    mu02 = jnp.sum(colcnt * (ww - cx[:, None, :]) ** 2, axis=1)
    # μ11 separably: Σ_h (h - cy)·(Σ_{x∈row h} x  -  cx·rowcnt[h]).
    mu11 = jnp.sum(
        (hh - cy[:, None, :]) * (rowsumx - cx[:, None, :] * rowcnt), axis=1
    )

    row_present = rowcnt > 0
    col_present = colcnt > 0
    min_row = jnp.min(jnp.where(row_present, hh, jnp.float32(H + 1)), axis=1)
    max_row = jnp.max(jnp.where(row_present, hh, -1.0), axis=1) + 1
    min_col = jnp.min(jnp.where(col_present, ww, jnp.float32(W + 1)), axis=1)
    max_col = jnp.max(jnp.where(col_present, ww, -1.0), axis=1) + 1

    # Intensity central moments from the histogram — exact because the
    # intensities are integer bins.
    bin_range = jnp.arange(256, dtype=jnp.float32)
    d = bin_range[None, None, :] - mean[..., None]  # (B, R, 256)
    hd2 = hist * d * d
    var = jnp.maximum(jnp.sum(hd2, axis=-1) / safe_area, 0.0)
    std = jnp.sqrt(var)
    m3 = jnp.sum(hd2 * d, axis=-1) / safe_area
    m4 = jnp.sum(hd2 * d * d, axis=-1) / safe_area
    # Guard: std**3/std**4 underflow f32 for (near-)constant regions.
    ok = std > 1e-3
    std_safe = jnp.where(ok, std, 1.0)

    m20 = mu20 / safe_area
    m02 = mu02 / safe_area
    m11 = mu11 / safe_area
    common = jnp.sqrt(jnp.maximum((m20 - m02) ** 2 + 4 * m11 * m11, 0.0))
    lam1 = (m20 + m02 + common) / 2
    lam2 = (m20 + m02 - common) / 2

    present = hist > 0
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
        "feret_diameter_max": feret_from_row_extremes(
            rowminx, rowmaxx, row_present, n_angles=n_feret_angles
        ),
        "intensity_sum": s1,
        "intensity_mean": mean,
        "intensity_std": std,
        "intensity_skew": jnp.where(ok, m3 / std_safe**3, 0.0),
        "intensity_kurtosis": jnp.where(ok, m4 / std_safe**4 - 3.0, 0.0),
        "weighted_centroid_row": (moments[..., 3]) / safe_s1,
        "weighted_centroid_col": (moments[..., 4]) / safe_s1,
        "intensity_min": jnp.min(
            jnp.where(present, bin_range[None, None, :], 256.0), axis=-1
        ),
        "intensity_max": jnp.max(
            jnp.where(present, bin_range[None, None, :], -1.0), axis=-1
        ),
    }
    if compute_histogram:
        props["histogram"] = hist

    return {k: v.reshape(batch_shape + v.shape[1:]) for k, v in props.items()}
