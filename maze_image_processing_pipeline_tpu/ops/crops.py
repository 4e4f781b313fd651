"""Device-side per-region crop extraction (intensity + masks).

The reference extracts every object's crop on the host: slice the label
frame, compare against the region id, slice the intensity frame
(``morphocut FindRegions/ExtractROI``, exercised at
``/root/reference/maze_ipp/loki/pipeline.py:589-602``). Per-object host
slicing is the single-core bottleneck of the loki haul; here the crops are
cut on the accelerator straight from the label/intensity frames that the
fused segmentation chain already holds in HBM, and ride back to the host
in ONE packed fetch.

Formulation: a ``lax.scan`` of ``dynamic_slice`` steps — one per crop
window — which lowers to plain dynamic-slice copies (TPU-friendly), NOT a
batched gather (TPU scatters/gathers cost ~100× the equivalent slice;
BASELINE.md platform findings). Crop windows are fixed-size per call
(static shapes for XLA); callers bucket regions by padded-bbox size and
compile one program per (window, count-bucket) pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["extract_region_crops"]


@functools.partial(
    jax.jit,
    static_argnames=("size_h", "size_w", "include_intensity", "pack_bits"),
)
def extract_region_crops(
    frames: jnp.ndarray,
    labels: jnp.ndarray,
    ids: jnp.ndarray,
    bidx: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    size_h: int,
    size_w: int,
    include_intensity: bool = True,
    pack_bits: bool = False,
) -> jnp.ndarray:
    """Cut N fixed-size windows out of a batch of frames.

    Args:
        frames: (B, H, W) uint8 intensity frames.
        labels: (B, H, W) int32 label frames (0 = background).
        ids: (N,) int32 region id per window.
        bidx / y0 / x0: (N,) int32 frame index and window start per window
            (starts must satisfy 0 <= y0 <= H - size_h etc.; out-of-range
            starts are clamped by ``dynamic_slice`` semantics).
        size_h / size_w: static window extent.
        include_intensity: also return the intensity windows. Callers that
            still hold the stitched frames on the host slice intensity
            there and fetch HALF the bytes (the crop fetch is the steady
            loki stage's largest cost through tunneled hosts).
        pack_bits: pack the 2-bit mask bytes 4-per-byte along x (requires
            ``size_w % 4 == 0``) — another 4x off the fetch; the host
            unpacks windows through a 256x4 lookup table
            (:data:`UNPACK_LUT`).

    Returns:
        flat uint8 — with ``include_intensity`` the N intensity windows
        followed by the N mask windows (2 · N · size_h · size_w values),
        otherwise the mask windows only. A mask byte packs bit 0 = pixel
        belongs to this region, bit 1 = pixel belongs to a *different*
        region (ExtractROI's "other objects" mask). One flat buffer so the
        whole batch of crops is a single device→host transfer.
    """

    if pack_bits and size_w % 4:
        raise ValueError(f"pack_bits requires size_w % 4 == 0, got {size_w}")

    def step(_, xs):
        rid, b, y, x = xs
        lab = jax.lax.dynamic_slice(labels, (b, y, x), (1, size_h, size_w))[0]
        this = lab == rid
        other = (lab > 0) & (~this)
        bits = this.astype(jnp.uint8) | (other.astype(jnp.uint8) << 1)
        if pack_bits:
            # 4 pixels/byte: px k of each group rides at bit 2k (the
            # host's UNPACK_LUT inverts). A reshape+shift+sum, no gathers.
            g = bits.reshape(size_h, size_w // 4, 4).astype(jnp.uint8)
            shifts = np.asarray([1, 4, 16, 64], np.uint8)
            bits = jnp.sum(g * shifts, axis=-1, dtype=jnp.uint8)
        if not include_intensity:
            return None, bits
        img = jax.lax.dynamic_slice(frames, (b, y, x), (1, size_h, size_w))[0]
        return None, (img, bits)

    if include_intensity:
        _, (img_c, bit_c) = jax.lax.scan(step, None, (ids, bidx, y0, x0))
        return jnp.concatenate([img_c.reshape(-1), bit_c.reshape(-1)])
    _, bit_c = jax.lax.scan(step, None, (ids, bidx, y0, x0))
    return bit_c.reshape(-1)


# Host-side inverse of pack_bits: UNPACK_LUT[byte] -> the 4 two-bit fields.
UNPACK_LUT = np.asarray(
    [[(b >> (2 * k)) & 3 for k in range(4)] for b in range(256)], np.uint8
)
