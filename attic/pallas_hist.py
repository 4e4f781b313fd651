"""Pallas TPU kernel: per-region 256-bin intensity histograms.

The XLA formulation (``regionprops_fused``) computes
``hist[b, r, c] = Σ_p (lab==r)·(bin==c)`` as an einsum of two one-hot
tensors. XLA materializes the dot operands, so the (B, P, 256) bin
one-hot alone moves ~4 GB of HBM per 8×1024² batch at bf16. This kernel
builds both one-hots INSIDE VMEM per row strip and contracts them on the
MXU, so HBM traffic is just the labels + intensities read once
(~40 MB/batch) plus the (B, R, 256) output.

Parity target: ``regionprops_fused(...)["histogram"]``
(per-region counts of the uint8 intensity values, exact — 0/1 one-hots
in bf16 are exact and f32 accumulation stays integral far beyond any
strip size used here). Reference contract: the per-region ``histogram``
statistic feeding ``ops/zooprocess.py`` (reference
``maze_ipp/loki/pipeline.py:614-640`` measures regions with skimage and
histograms the masked intensities).

Like every Pallas kernel in this repo it is OPT-IN on dispatch paths:
each ``pallas_call`` instance costs a ~50 s Mosaic compile through the
remote tunnel (BASELINE.md), and round 3 showed hand kernels must
re-earn their place after lowering fixes (two inverted to losses). Use
``tools/perf_props.py histpallas`` before wiring it anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["region_histogram_pallas"]


def _hist_kernel(lab_ref, bins_ref, out_ref, *, num_segments: int):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # (TH, W) strip → (P,) pixels; one-hots live only in VMEM/registers.
    lab = lab_ref[0].reshape(-1)
    bins = bins_ref[0].reshape(-1)
    P = lab.shape[0]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (num_segments, P), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (P, 256), 1)
    l_oh = (lab[None, :] == r_ids).astype(jnp.bfloat16)  # (R, P)
    b_oh = (bins[:, None] == c_ids).astype(jnp.bfloat16)  # (P, 256)
    out_ref[0] += jax.lax.dot(
        l_oh, b_oh, preferred_element_type=jnp.float32
    )


def _hist_kernel_skip(lab_ref, bins_ref, out_ref, gbins_ref, *, num_segments: int):
    """Background-skip variant: the (R, P)×(P, 256) dot runs only on strips
    containing foreground; every strip accumulates the cheap global bin
    histogram (a column reduce), from which the caller reconstructs the
    background row exactly (hist[0] = global − Σ_{r≥1} hist[r])."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        gbins_ref[:] = jnp.zeros_like(gbins_ref)

    lab = lab_ref[0].reshape(-1)
    bins = bins_ref[0].reshape(-1)
    P = lab.shape[0]
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (P, 256), 1)
    b_oh = (bins[:, None] == c_ids).astype(jnp.float32)  # (P, 256)
    # Pixels with label >= R are dropped by the contraction (their one-hot
    # row does not exist); exclude them from the global count too, or they
    # would inflate the reconstructed background row.
    in_range = (lab < num_segments).astype(jnp.float32)
    gbins_ref[0] += jnp.sum(b_oh * in_range[:, None], axis=0)

    @pl.when(jnp.max(lab) > 0)
    def _fg():
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (num_segments, P), 0)
        l_oh = (lab[None, :] == r_ids).astype(jnp.bfloat16)
        out_ref[0] += jax.lax.dot(
            l_oh, b_oh.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )


@functools.partial(
    jax.jit,
    static_argnames=("num_segments", "tile_rows", "skip_empty", "interpret"),
)
def region_histogram_pallas(
    labels: jnp.ndarray,
    intensity: jnp.ndarray,
    *,
    num_segments: int,
    tile_rows: int = 8,
    skip_empty: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) int labels + uint8-range intensity → (B, R, 256) counts.

    ``tile_rows`` rows per MXU contraction strip (VMEM: the two one-hots
    are ``tile_rows·W·(R+256)·2`` bytes — 5 MB at the 8×1024 default).
    ``skip_empty`` runs the full contraction only on strips containing
    foreground (LOKI frames are mostly background) and reconstructs the
    background row exactly from a per-strip global bin histogram.
    """
    B, H, W = labels.shape
    R = num_segments
    TH = tile_rows
    n_strips = -(-H // TH)
    H_pad = n_strips * TH
    if H_pad != H:
        # Padding rows are label 0 / bin 0: they inflate only hist[0, 0],
        # which we correct after the call.
        labels = jnp.pad(labels, ((0, 0), (0, H_pad - H), (0, 0)))
        intensity = jnp.pad(intensity, ((0, 0), (0, H_pad - H), (0, 0)))
    bins = jnp.clip(intensity.astype(jnp.float32), 0, 255).astype(jnp.int32)

    strip = lambda b, s: (b, s, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, TH, W), strip, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TH, W), strip, memory_space=pltpu.VMEM),
    ]
    hist_spec = pl.BlockSpec(
        (1, R, 256), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )
    if skip_empty:
        hist, gbins = pl.pallas_call(
            functools.partial(_hist_kernel_skip, num_segments=R),
            grid=(B, n_strips),
            in_specs=in_specs,
            out_specs=[
                hist_spec,
                pl.BlockSpec(
                    (1, 256), lambda b, s: (b, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, R, 256), jnp.float32),
                jax.ShapeDtypeStruct((B, 256), jnp.float32),
            ],
            interpret=interpret,
        )(labels, bins)
        hist = hist.at[:, 0].set(gbins - jnp.sum(hist[:, 1:], axis=1))
    else:
        hist = pl.pallas_call(
            functools.partial(_hist_kernel, num_segments=R),
            grid=(B, n_strips),
            in_specs=in_specs,
            out_specs=hist_spec,
            out_shape=jax.ShapeDtypeStruct((B, R, 256), jnp.float32),
            interpret=interpret,
        )(labels, bins)
    if H_pad != H:
        pad_px = (H_pad - H) * W
        hist = hist.at[:, 0, 0].add(-float(pad_px))
    return hist
