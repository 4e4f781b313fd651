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
import numpy as np

__all__ = ["label", "remove_small_objects", "clear_border", "region_areas"]

# Host (numpy) scalar, NOT jnp: an eagerly-created jnp constant lives on
# the device, and MLIR lowering fetches every device-resident closure
# constant back to host (mlir.ir_constant -> array._value) — measured
# ~seconds per constant through this host's TPU tunnel (BASELINE.md).
_INF = np.int32(2**30)


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


def _horizontal_pass(
    lab: jnp.ndarray, fg: jnp.ndarray, pallas: bool = True
) -> jnp.ndarray:
    if pallas and jax.default_backend() == "tpu" and lab.shape[-1] % 128 == 0:
        # Lane-scan via Pallas: associative_scan composed with the morphology
        # producers hits an XLA layout pathology (~26-33 ms/pass on v5e vs
        # ~1 ms isolated); the Pallas kernel pins the layout (BASELINE.md).
        from .pallas_scan import hpass_pallas

        return hpass_pallas(lab, fg)
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
    h_axis: int = -2,
):
    """Row-sequential propagation through foreground, with diagonal links.

    Strip-mined and *layout-preserving*: a ``fori_loop`` walks strips of
    rows via dynamic slices on the native (..., H, W) layout — transposing
    the frame for ``lax.scan`` measured ~30 ms/batch on v5e when the input
    came out of the associative scans (layout-assignment pathology), vs
    sub-ms for the slice-based walk. Per-row propagation is unrolled inside
    each strip step.
    """
    if not strip:
        # Long strips amortize loop-step overhead on TPU; short strips keep
        # XLA:CPU compile times sane for the test suite.
        strip = 64 if jax.default_backend() == "tpu" else 8

    big = _INF
    h_axis = h_axis % lab.ndim
    H = lab.shape[h_axis]
    n_strips = -(-H // strip)
    H_pad = n_strips * strip
    if H_pad != H:
        pad = [(0, 0)] * lab.ndim
        pad[h_axis] = (0, H_pad - H)
        lab = jnp.pad(lab, pad, constant_values=big)
        fg = jnp.pad(fg, pad, constant_values=False)

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

    row_shape = lab.shape[:h_axis] + lab.shape[h_axis + 1 :]

    def body(s, state):
        out, carry = state
        start = (n_strips - 1 - s) * strip if reverse else s * strip
        blk = jax.lax.dynamic_slice_in_dim(lab, start, strip, axis=h_axis)
        fgb = jax.lax.dynamic_slice_in_dim(fg, start, strip, axis=h_axis)
        rows = [None] * strip
        order = range(strip - 1, -1, -1) if reverse else range(strip)
        for r in order:
            carry = row_update(
                carry,
                jax.lax.index_in_dim(blk, r, axis=h_axis, keepdims=False),
                jax.lax.index_in_dim(fgb, r, axis=h_axis, keepdims=False),
            )
            rows[r] = carry
        blk_out = jnp.stack(rows, axis=h_axis)
        out = jax.lax.dynamic_update_slice_in_dim(out, blk_out, start, axis=h_axis)
        return out, carry

    init_carry = jnp.full(row_shape, big, dtype=lab.dtype)
    out0 = jnp.full(lab.shape, big, dtype=lab.dtype)
    out, _ = jax.lax.fori_loop(0, n_strips, body, (out0, init_carry))

    if H_pad != H:
        out = jax.lax.slice_in_dim(out, 0, H, axis=h_axis)
    return out


@functools.partial(
    jax.jit, static_argnames=("connectivity", "max_iters", "pallas")
)
def label(
    mask: jnp.ndarray,
    connectivity: int = 2,
    max_iters: int = 256,
    pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label connected components of a boolean mask.

    Args:
        mask: (..., H, W) boolean foreground mask.
        connectivity: 2 = 8-connected (skimage.measure.label default used by
            the reference), 1 = 4-connected.
        max_iters: fixpoint iteration cap (each iteration is a full
            horizontal+down+up sweep). The loop exits as soon as labels
            stop changing, so the cap only bounds pathological serpentine
            masks (S switchbacks need ~S/2 sweeps); blob-like masks
            converge in 1-2.
        pallas: allow the Pallas lane-scan kernels (fastest steady-state on
            TPU, but every pallas_call instance costs a Mosaic kernel
            compilation at TRACE time — ~45 s each through this host's
            remote tunnel, uncacheable — so streaming pipelines that
            compile per run pass False; see BASELINE.md).

    Returns:
        (labels, n_regions): int32 labels in [0, R] with 0 = background and
        raster-order numbering; n_regions (...,) int32 component counts.
    """
    if connectivity not in (1, 2):
        raise ValueError("connectivity must be 1 or 2")
    fg_in = mask.astype(bool)
    H, W = fg_in.shape[-2:]
    batch_shape = fg_in.shape[:-2]
    fg = fg_in.reshape((-1, H, W))

    # Vertical propagation: the XLA strip walk. (A Pallas variant was
    # measured slower — the row-dependency chain is latency-bound and
    # Mosaic's per-row op overhead exceeds XLA's; attic/pallas_label.py.)
    def vpass(lab_, reverse):
        return _vertical_pass(lab_, fg, connectivity, reverse=reverse)

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, fg.shape, 1) * W
        + jax.lax.broadcasted_iota(jnp.int32, fg.shape, 2)
    )
    lab0 = jnp.where(fg, lin + 1, _INF)

    def sweep(lab):
        lab = _horizontal_pass(lab, fg, pallas)
        lab = vpass(lab, False)
        lab = vpass(lab, True)
        return _horizontal_pass(lab, fg, pallas)

    # The first sweep runs INSIDE the while_loop (i == 0 forces one
    # iteration) so ``sweep`` is traced once per loop, not twice: every
    # Pallas instance in the trace costs a Mosaic kernel compilation
    # (~50 s through a remote tunnel; BASELINE.md).
    def cond(state):
        lab, prev, i = state
        return (i == 0) | ((i < max_iters) & jnp.any(lab != prev))

    def body(state):
        lab, _, i = state
        return sweep(lab), lab, i + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, lab0, jnp.int32(0)))

    # Compaction: rank roots (label == own linear index + 1) in raster order,
    # then min-propagate the rank through each component with the same sweep
    # machinery. (A take_along_axis gather of the ranks — 1 element/pixel —
    # measured ~100 ms/batch on v5e; jnp.cumsum over a flat (B, H·W) axis
    # ~250 ms. The raster prefix sum is done hierarchically instead: a
    # log-depth scan within rows plus a scan of per-row totals.)
    is_root = fg & (lab == lin + 1)
    root_i = is_root.astype(jnp.int32)
    if pallas and jax.default_backend() == "tpu" and W % 128 == 0:
        from .pallas_scan import cumsum_lanes_pallas

        within_row = cumsum_lanes_pallas(root_i)
    else:
        within_row = jax.lax.associative_scan(jnp.add, root_i, axis=2)
    row_counts = within_row[..., -1]  # (B, H)
    row_prefix_incl = jax.lax.associative_scan(jnp.add, row_counts, axis=1)
    row_offset = row_prefix_incl - row_counts
    ranks = within_row + row_offset[..., None]
    n_regions = row_prefix_incl[..., -1]  # (B,)

    rank_seed = jnp.where(is_root, ranks, _INF)
    rank_img, _, _ = jax.lax.while_loop(
        cond, body, (rank_seed, rank_seed, jnp.int32(0))
    )
    compact = jnp.where(fg, rank_img, 0)
    return compact.reshape(batch_shape + (H, W)), n_regions.reshape(batch_shape)


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
    # A fused two-phase Pallas variant exists (attic/pallas_relabel.py) but measured
    # no faster than this XLA formulation on v5e (21.3 vs 20.2 ms for the
    # morph+label+remove chain): plankton blobs scatter across most row
    # strips, so the background-skip rarely fires and the O(H·W·R) one-hot
    # work is identical. Kept as a documented negative result.
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
    """Relabel so kept ids become consecutive (raster order preserved).

    Gather-free: the (R,)-bounded id remap rides one-hot compares fused
    into reductions instead of a per-pixel table gather (a 256-entry
    ``take`` measured 49 ms vs 4.9 ms on (8, 1024²)).

    For 32 ≤ R ≤ 256 the table is factored by label nibbles — the low
    nibble's 16-wide one-hot contracts against the (R/16, 16) table on
    the MXU, and the high nibble selects among R/16 planes — replacing
    the (..., H, W, R) materialization with (..., H, W, 16+R/16) bf16
    planes (measured 4.9 → 0.83 ms/batch at R=256). Exact: every value
    is an integer ≤ 256 (bf16-exact) and each sum has a single nonzero
    term. Labels ≥ R map to 0 on both paths (no nibble/one-hot match).
    """
    R = keep.shape[-1]
    new_ids = jnp.cumsum(keep.astype(jnp.int32), axis=-1) * keep
    if 32 <= R <= 256 and R % 16 == 0:
        HI = R // 16
        T = new_ids.reshape(new_ids.shape[:-1] + (HI, 16)).astype(jnp.bfloat16)
        lo = labels & 15
        hi = labels >> 4
        u = (lo[..., None] == jnp.arange(16, dtype=jnp.int32)).astype(
            jnp.bfloat16
        )
        w = jnp.einsum(
            "...hwj,...ij->...hwi", u, T, precision=jax.lax.Precision.HIGHEST
        )
        out = jnp.sum(
            jnp.where(hi[..., None] == jnp.arange(HI, dtype=jnp.int32), w, 0),
            axis=-1,
        )
        return out.astype(jnp.int32)
    r_ids = jnp.arange(R, dtype=jnp.int32)
    onehot = labels[..., None] == r_ids  # (..., H, W, R)
    table = new_ids[..., None, None, :]  # (..., 1, 1, R)
    return jnp.sum(jnp.where(onehot, table, 0), axis=-1, dtype=jnp.int32)
