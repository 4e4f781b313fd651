"""Pallas TPU kernels for lane-direction scans used by the CCL.

``jax.lax.associative_scan`` along the minor (lane) axis is fast in
isolation but suffers a layout-assignment pathology when composed with the
morphology producers: XLA picks a hostile physical layout for the scan
intermediates and each of the log-depth steps pays a relayout (measured
~26-33 ms per horizontal pass on v5e composed vs ~1 ms isolated; see
BASELINE.md). These kernels pin the layout by construction: one row-strip
block in VMEM, Hillis-Steele doubling along lanes with concat-shifts.

* :func:`hpass_pallas` — the CCL horizontal pass: forward + reverse
  *segmented min* scan over foreground runs (resets at background), i.e.
  every pixel receives the min label of its full horizontal run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hpass_pallas", "cumsum_lanes_pallas"]

_INF = 2**30  # python int: pallas kernels cannot capture array constants


def _shift_lanes(v: jnp.ndarray, d: int, fill, reverse: bool) -> jnp.ndarray:
    """Shift along the lane (last) axis by d, filling vacated lanes."""
    fill_blk = jnp.full(v.shape[:-1] + (d,), fill, dtype=v.dtype)
    if reverse:
        return jnp.concatenate([v[..., d:], fill_blk], axis=-1)
    return jnp.concatenate([fill_blk, v[..., :-d]], axis=-1)


def _segmented_min_doubling(v, r, W: int, reverse: bool):
    """Hillis-Steele inclusive segmented min scan along lanes.

    ``r`` marks segment starts (scan restarts there). Out-of-range
    neighbors behave as resets.
    """
    d = 1
    while d < W:
        v_sh = _shift_lanes(v, d, jnp.int32(_INF), reverse)
        r_sh = _shift_lanes(r, d, jnp.int32(1), reverse)
        v = jnp.where(r > 0, v, jnp.minimum(v, v_sh))
        r = r | r_sh
        d *= 2
    return v


def _hpass_kernel(lab_ref, fg_ref, out_ref):
    W = lab_ref.shape[-1]
    fg = fg_ref[0] > 0
    v = jnp.where(fg, lab_ref[0], jnp.int32(_INF))
    resets = jnp.where(fg, jnp.int32(0), jnp.int32(1))
    # Forward pass: every pixel gets the run-min of pixels to its left;
    # the reverse pass then spreads the full-run min to every pixel.
    v = _segmented_min_doubling(v, resets, W, reverse=False)
    v = _segmented_min_doubling(v, resets, W, reverse=True)
    out_ref[0] = jnp.where(fg, v, jnp.int32(_INF))


def _cumsum_kernel(x_ref, out_ref):
    W = x_ref.shape[-1]
    v = x_ref[0]
    d = 1
    while d < W:
        v = v + _shift_lanes(v, d, jnp.int32(0), reverse=False)
        d *= 2
    out_ref[0] = v


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def cumsum_lanes_pallas(
    x: jnp.ndarray, tile_rows: int = 256, interpret: bool = False
) -> jnp.ndarray:
    """Inclusive per-row cumsum along the lane (last) axis, int32.

    Same layout rationale as :func:`hpass_pallas` — the CCL compaction's
    raster rank prefix sum hits the identical associative-scan layout
    pathology when composed.
    """
    B_shape = x.shape[:-2]
    H, W = x.shape[-2:]
    x3 = x.reshape((-1, H, W)).astype(jnp.int32)
    B = x3.shape[0]

    TH = min(tile_rows, H)
    n_h = -(-H // TH)
    H_pad = n_h * TH
    if H_pad != H:
        x3 = jnp.pad(x3, ((0, 0), (0, H_pad - H), (0, 0)))

    blk = pl.BlockSpec((1, TH, W), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(B, n_h),
        in_specs=[blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, H_pad, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x3)
    return out[:, :H].reshape(B_shape + (H, W))


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def hpass_pallas(
    lab: jnp.ndarray,
    fg: jnp.ndarray,
    tile_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """CCL horizontal pass: per-pixel min label over its foreground run.

    Equivalent to ``_horizontal_pass`` in :mod:`.label` (forward+reverse
    segmented min scans) with a layout pinned via Pallas. Requires
    ``W % 128 == 0`` (callers pad; the workload buckets are multiples of
    256).
    """
    B_shape = lab.shape[:-2]
    H, W = lab.shape[-2:]
    lab3 = lab.reshape((-1, H, W))
    fg3 = fg.reshape((-1, H, W)).astype(jnp.int32)
    B = lab3.shape[0]

    TH = min(tile_rows, H)
    n_h = -(-H // TH)
    H_pad = n_h * TH
    if H_pad != H:
        lab3 = jnp.pad(lab3, ((0, 0), (0, H_pad - H), (0, 0)))
        fg3 = jnp.pad(fg3, ((0, 0), (0, H_pad - H), (0, 0)))

    blk = pl.BlockSpec((1, TH, W), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _hpass_kernel,
        grid=(B, n_h),
        in_specs=[blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, H_pad, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(lab3, fg3)
    return out[:, :H].reshape(B_shape + (H, W))
