"""Elementwise image ops and shape utilities (device-side).

Covers the reference's pre/post transforms and intensity utilities:
gray→RGB + HWC layout + dtype scaling (``loki/pipeline.py:502-511``,
``predict/pipeline.py:621-638``), center crop/pad
(``predict/pipeline.py:634-637``), contrast stretch
(``loki/pipeline.py:382-383``) and threshold segmentation
(``loki/pipeline.py:648-656``). TPU-first: NHWC layout, bf16-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "convert_img_dtype",
    "gray2rgb",
    "center_crop_or_pad",
    "rescale_max_intensity",
    "threshold_mask",
]


def convert_img_dtype(image: jnp.ndarray, dtype) -> jnp.ndarray:
    """Device-side dtype conversion: unsigned ints scale to [0, 1] floats."""
    dtype = jnp.dtype(dtype)
    if dtype.kind != "f":
        raise ValueError(f"Target dtype must be floating, got {dtype}")
    if image.dtype.kind == "u":
        factor = 1.0 / float(jnp.iinfo(image.dtype).max)
        return image.astype(dtype) * jnp.asarray(factor, dtype)
    if image.dtype.kind == "f":
        return image.astype(dtype)
    raise ValueError(
        f"Unsupported image dtype {image.dtype} (target {dtype}): expected "
        "unsigned-integer or floating input"
    )


def gray2rgb(image: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) → (..., H, W, 3) by channel replication."""
    return jnp.broadcast_to(image[..., None], image.shape + (3,))


@functools.partial(jax.jit, static_argnames=("size", "channels_last"))
def center_crop_or_pad(
    image: jnp.ndarray, size: int, *, channels_last: bool = True
) -> jnp.ndarray:
    """Extract the center ``size``×``size`` window, zero-padding as needed.

    Matches the torchvision ``center_crop`` contract used at
    ``predict/pipeline.py:634-637``. The channel layout is EXPLICIT, not
    guessed: ``channels_last=True`` treats a ≥3-D input as (..., H, W, C);
    ``False`` as (..., H, W) — a ``(N, H, W)`` grayscale batch with the
    old ndim-based heuristic would have had its batch axis cropped.
    2-D inputs are always (H, W).
    """
    if image.ndim >= 3 and channels_last:
        h_ax, w_ax = image.ndim - 3, image.ndim - 2
    else:
        h_ax, w_ax = image.ndim - 2, image.ndim - 1
    H, W = image.shape[h_ax], image.shape[w_ax]

    pad = [(0, 0)] * image.ndim
    if H < size:
        before = (size - H) // 2
        pad[h_ax] = (before, size - H - before)
    if W < size:
        before = (size - W) // 2
        pad[w_ax] = (before, size - W - before)
    image = jnp.pad(image, pad)
    H2, W2 = image.shape[h_ax], image.shape[w_ax]

    y0 = (H2 - size) // 2
    x0 = (W2 - size) // 2
    idx = [slice(None)] * image.ndim
    idx[h_ax] = slice(y0, y0 + size)
    idx[w_ax] = slice(x0, x0 + size)
    return image[tuple(idx)]


def rescale_max_intensity(image) -> np.ndarray:
    """Stretch intensities so the max maps to the dtype maximum (host/NumPy).

    Parity: ``rescale_max_intensity`` at ``loki/pipeline.py:382-383`` (which
    stretches ``(0, image.max())`` to the full dtype range).
    """
    image = np.asarray(image)
    maxval = image.max()
    if image.dtype.kind == "u":
        out_max = np.iinfo(image.dtype).max
        if maxval == 0:
            return image.copy()
        scaled = image.astype(np.float32) * (out_max / float(maxval))
        return np.clip(scaled, 0, out_max).astype(image.dtype)
    if maxval == 0:
        return image.copy()
    return (image / maxval).astype(image.dtype)


@jax.jit
def rescale_max_intensity_batch(images: jnp.ndarray) -> jnp.ndarray:
    """Device-side batched contrast stretch for uint8 images (..., H, W)."""
    maxval = jnp.max(images, axis=(-2, -1), keepdims=True).astype(jnp.float32)
    scale = jnp.where(maxval > 0, 255.0 / maxval, 1.0)
    return jnp.clip(images.astype(jnp.float32) * scale, 0, 255).astype(jnp.uint8)


def threshold_mask(image: jnp.ndarray, threshold_brighter: float) -> jnp.ndarray:
    """Foreground mask of pixels strictly brighter than the threshold."""
    return image > threshold_brighter
