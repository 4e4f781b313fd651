"""Connected-component labeling (CCL) and label utilities on TPU.

Replaces host-side ``skimage.measure.label`` / ``scipy.ndimage.label``
(reference hot path ``loki/pipeline.py:430-433``) with a batched device
kernel:

1. **Init** — every foreground pixel takes its linear index + 1 as label.
2. **Propagate** — iterate to a fixpoint: horizontal runs collapse in
   log-depth via *segmented min associative scans*; vertical/diagonal
   propagation uses a row-sequential ``lax.scan`` carrying the previous row
   (8- or 4-connected neighbor minimum). Labels decrease monotonically, so
   the ``while_loop`` terminates; blob-like masks converge in 1–2 sweeps.
3. **Compact** — because each component's final label is the linear index of
   its raster-first pixel, compact consecutive ids are obtained *without
   sort/unique*: the rank of each root pixel (cumsum of root indicators in
   raster order) is gathered at ``label - 1``. The resulting id order matches
   scipy/skimage raster-scan numbering.

All ops are batched over leading dims and jit-compiled with static shape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["label", "remove_small_objects", "clear_border", "region_areas"]

_INF = jnp.int32(2**30)


def _segmented_min_scan(values: jnp.ndarray, resets: jnp.ndarray, axis: int, reverse: bool):
    """Running minimum along ``axis`` that restarts wherever ``resets`` is True."""

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    out, _ = jax.lax.associative_scan(
        combine, (values, resets), axis=axis, reverse=reverse
    )
    return out


def _horizontal_pass(lab: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    resets = ~fg
    axis = lab.ndim - 1
    lab = _segmented_min_scan(lab, resets, axis, reverse=False)
    lab = _segmented_min_scan(lab, resets, axis, reverse=True)
    return jnp.where(fg, lab, _INF)


def _vertical_pass(
    lab: jnp.ndarray,
    fg: jnp.ndarray,
    connectivity: int,
    reverse: bool,
    strip: int = 0,
):
    """Row-sequential propagation through foreground, with diagonal links.

    Strip-mined: the scan steps over strips of ``strip`` rows with the
    per-row propagation unrolled inside each step — same sequential depth,
    ~strip× fewer scan iterations (scan-step overhead dominates the naive
    per-row version on TPU; 64-row strips measured fastest on v5e).
    """
    if not strip:
        # Long strips amortize scan-step overhead on TPU; short strips keep
        # XLA:CPU compile times sane for the test suite.
        strip = 64 if jax.default_backend() == "tpu" else 8
    # Move row axis to the front for lax.scan.
    perm = (lab.ndim - 2,) + tuple(i for i in range(lab.ndim) if i != lab.ndim - 2)
    lab_r = jnp.transpose(lab, perm)
    fg_r = jnp.transpose(fg, perm)
    if reverse:
        lab_r = lab_r[::-1]
        fg_r = fg_r[::-1]

    big = _INF
    H = lab_r.shape[0]
    n_strips = -(-H // strip)
    H_pad = n_strips * strip
    if H_pad != H:
        pad = [(0, H_pad - H)] + [(0, 0)] * (lab_r.ndim - 1)
        lab_r = jnp.pad(lab_r, pad, constant_values=big)
        fg_r = jnp.pad(fg_r, pad, constant_values=False)

    lab_s = lab_r.reshape((n_strips, strip) + lab_r.shape[1:])
    fg_s = fg_r.reshape((n_strips, strip) + fg_r.shape[1:])

    def row_update(prev_row, cur, cur_fg):
        neigh = prev_row
        if connectivity == 2:
            left = jnp.concatenate(
                [jnp.full_like(prev_row[..., :1], big), prev_row[..., :-1]], axis=-1
            )
            right = jnp.concatenate(
                [prev_row[..., 1:], jnp.full_like(prev_row[..., :1], big)], axis=-1
            )
            neigh = jnp.minimum(neigh, jnp.minimum(left, right))
        return jnp.where(cur_fg, jnp.minimum(cur, neigh), big)

    def step(prev_row, xs):
        strip_lab, strip_fg = xs
        rows = []
        for r in range(strip):
            prev_row = row_update(prev_row, strip_lab[r], strip_fg[r])
            rows.append(prev_row)
        return prev_row, jnp.stack(rows)

    init = jnp.full(lab_r.shape[1:], big, dtype=lab.dtype)
    _, out = jax.lax.scan(step, init, (lab_s, fg_s))
    out = out.reshape((H_pad,) + lab_r.shape[1:])[:H]
    if reverse:
        out = out[::-1]

    inv_perm = tuple(sorted(range(lab.ndim), key=lambda i: perm[i]))
    return jnp.transpose(out, inv_perm)


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label(
    mask: jnp.ndarray, connectivity: int = 2, max_iters: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label connected components of a boolean mask.

    Args:
        mask: (..., H, W) boolean foreground mask.
        connectivity: 2 = 8-connected (skimage.measure.label default used by
            the reference), 1 = 4-connected.
        max_iters: fixpoint iteration cap (each iteration is a full
            horizontal+down+up sweep).

    Returns:
        (labels, n_regions): int32 labels in [0, R] with 0 = background and
        raster-order numbering; n_regions (...,) int32 component counts.
    """
    if connectivity not in (1, 2):
        raise ValueError("connectivity must be 1 or 2")
    fg = mask.astype(bool)
    H, W = fg.shape[-2:]
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 2) * W
        + jax.lax.broadcasted_iota(jnp.int32, fg.shape, fg.ndim - 1)
    )
    lab0 = jnp.where(fg, lin + 1, _INF)

    def sweep(lab):
        lab = _horizontal_pass(lab, fg)
        lab = _vertical_pass(lab, fg, connectivity, reverse=False)
        lab = _vertical_pass(lab, fg, connectivity, reverse=True)
        return _horizontal_pass(lab, fg)

    def cond(state):
        lab, prev, i = state
        return (i < max_iters) & jnp.any(lab != prev)

    def body(state):
        lab, _, i = state
        return sweep(lab), lab, i + 1

    first = sweep(lab0)
    lab, _, _ = jax.lax.while_loop(cond, body, (first, lab0, jnp.int32(1)))

    # Compaction: rank roots (label == own linear index + 1) in raster order.
    flat_shape = fg.shape[:-2] + (H * W,)
    lab_flat = lab.reshape(flat_shape)
    lin_flat = lin.reshape(flat_shape) + 1
    fg_flat = fg.reshape(flat_shape)
    is_root = fg_flat & (lab_flat == lin_flat)
    ranks = jnp.cumsum(is_root.astype(jnp.int32), axis=-1)
    idx = jnp.clip(lab_flat - 1, 0, H * W - 1)
    compact = jnp.where(fg_flat, jnp.take_along_axis(ranks, idx, axis=-1), 0)
    n_regions = ranks[..., -1]
    return compact.reshape(fg.shape), n_regions


@functools.partial(jax.jit, static_argnames=("num_segments",))
def region_areas(labels: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Pixel counts per label id (index 0 = background), batched.

    Scatter-free: a one-hot comparison fused directly into the reduction
    (XLA fuses the compare into the reduce without materializing the
    (…, R) tensor; TPU scatters cost ~100× more).
    """
    r_ids = jnp.arange(num_segments, dtype=jnp.int32)
    onehot = labels[..., None] == r_ids
    return jnp.sum(onehot, axis=(-3, -2), dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_segments", "min_area"))
def remove_small_objects(
    labels: jnp.ndarray, min_area: int, num_segments: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop regions below ``min_area`` pixels; re-compact ids.

    Parity: ``skimage.morphology.remove_small_objects`` at
    ``loki/pipeline.py:443-448``.
    """
    areas = region_areas(labels, num_segments)
    keep = areas >= min_area
    keep = keep.at[..., 0].set(False)
    return _relabel_keep(labels, keep), jnp.sum(keep, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def clear_border(
    labels: jnp.ndarray, num_segments: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop regions touching the image border; re-compact ids.

    Parity: ``skimage.segmentation.clear_border`` at
    ``loki/pipeline.py:435-439``. Scatter-free: only the border pixels
    (≈ 2H+2W values) are compared against the id range.
    """
    border_vals = jnp.concatenate(
        [
            labels[..., 0, :],
            labels[..., -1, :],
            labels[..., :, 0],
            labels[..., :, -1],
        ],
        axis=-1,
    )
    r_ids = jnp.arange(num_segments, dtype=jnp.int32)
    touches = jnp.any(border_vals[..., None] == r_ids, axis=-2)
    keep = ~touches
    keep = keep.at[..., 0].set(False)
    return _relabel_keep(labels, keep), jnp.sum(keep, axis=-1).astype(jnp.int32)


def _relabel_keep(labels: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Relabel so kept ids become consecutive (raster order preserved)."""
    new_ids = jnp.cumsum(keep.astype(jnp.int32), axis=-1) * keep
    flat = labels.reshape(labels.shape[:-2] + (-1,))
    remapped = jnp.take_along_axis(new_ids, flat, axis=-1)
    return remapped.reshape(labels.shape)
