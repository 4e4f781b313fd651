"""Bounded squared Euclidean distance transform (EDT) on TPU.

The cornerstone kernel of the device library: disk morphology
(:mod:`.morphology`), isotropic operations and label bridge-merging
(:mod:`.merge_labels`) all reduce to "squared distance to the nearest
foreground pixel, exact up to a radius bound".

Algorithm (all steps batched over leading dims, VPU-only):

1. **Column pass** — per column, the row distance to the nearest site is
   obtained from two ``cummax`` sweeps (log-depth, no sequential scan):
   ``down[y] = y - max{y' ≤ y : site[y']}`` and the mirrored ``up``.
2. **Row pass** — ``F[x] = min over |dx| ≤ r of G[x+dx]² + dx²`` evaluated as
   an unrolled shift+min loop (2r+1 VPU passes).

Within the bound ``r`` the result equals the exact squared EDT (the nearest
site is within ±r rows *and* ±r columns); beyond it, values are clamped to
``(r+1)²``. This replaces ``scipy.ndimage.distance_transform_edt`` in the
reference's hot paths (``maze_ipp/isotropic.py:35``,
``maze_ipp/merge_labels.py:17-22``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["squared_edt", "edt"]


def _row_distance_to_site(sites: jnp.ndarray) -> jnp.ndarray:
    """Per-column distance (in rows) to the nearest site, along axis -2.

    Returns int32; positions with no site in their column get a large value.
    """
    H = sites.shape[-2]
    big = jnp.int32(2 * H + 2)
    iota = jax.lax.broadcasted_iota(jnp.int32, sites.shape, sites.ndim - 2)

    # Nearest site at or above: max of iota where site, cumulative down.
    marked = jnp.where(sites, iota, jnp.int32(-1) - big)
    nearest_above = jax.lax.cummax(marked, axis=sites.ndim - 2)
    dist_above = iota - nearest_above

    # Nearest site at or below: min of iota where site, cumulative up
    # (implemented as reversed cummax of negated iota).
    marked_dn = jnp.where(sites, -iota, jnp.int32(-1) - big)
    nearest_below = jax.lax.cummax(
        marked_dn[..., ::-1, :], axis=sites.ndim - 2
    )[..., ::-1, :]
    dist_below = iota + nearest_below  # = iota - (-nearest_below)
    dist_below = -dist_below
    # dist_below = (site_row - iota); computed as -(iota + cummax(-iota*site))
    return jnp.minimum(dist_above, dist_below).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_distance",))
def squared_edt(sites: jnp.ndarray, max_distance: int) -> jnp.ndarray:
    """Squared Euclidean distance to the nearest True pixel of ``sites``.

    Args:
        sites: boolean array (..., H, W); True marks distance-zero pixels.
        max_distance: static bound ``r``; distances are exact for values
            ``≤ r`` and clamped to ``(r+1)²`` beyond.

    Returns:
        int32 array (..., H, W) of squared distances.
    """
    r = int(max_distance)
    if r < 0:
        raise ValueError("max_distance must be >= 0")
    cap = jnp.int32((r + 1) * (r + 1))

    rowdist = _row_distance_to_site(sites)
    rowdist = jnp.minimum(rowdist, jnp.int32(r + 1))
    g2 = (rowdist * rowdist).astype(jnp.int32)

    # Row pass: min over dx of g2 shifted by dx, plus dx².
    W = sites.shape[-1]
    pad_width = [(0, 0)] * (sites.ndim - 1) + [(r, r)]
    g2_padded = jnp.pad(g2, pad_width, constant_values=(r + 1) * (r + 1))

    result = jnp.minimum(g2, cap)
    for dx in range(1, r + 1):
        left = jax.lax.slice_in_dim(g2_padded, r - dx, r - dx + W, axis=sites.ndim - 1)
        right = jax.lax.slice_in_dim(g2_padded, r + dx, r + dx + W, axis=sites.ndim - 1)
        shifted_min = jnp.minimum(left, right) + jnp.int32(dx * dx)
        result = jnp.minimum(result, shifted_min)

    return jnp.minimum(result, cap)


def edt(sites: jnp.ndarray, max_distance: int) -> jnp.ndarray:
    """Euclidean distance to the nearest True pixel (float32), bounded."""
    return jnp.sqrt(squared_edt(sites, max_distance).astype(jnp.float32))
