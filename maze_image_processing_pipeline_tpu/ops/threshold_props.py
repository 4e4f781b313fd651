"""Device measurement for threshold segmentation of object crops.

The reference's threshold path measures each crop on the host, one object
at a time (``/root/reference/maze_ipp/loki/pipeline.py:648-656``:
``mask = image > t`` → ``ImageProperties`` → ZooProcess features, with
``skimage.measure.regionprops``'s filled area via hole filling). Here the
whole stage runs as ONE jitted program over a padded batch of crops:

* the mask's foreground is measured as a single region via the fused
  scatter-free props (:func:`..ops.regionprops_fused.regionprops_fused`
  with ``num_segments=2`` — label 1 = all pixels above threshold);
* the *filled* area (``binary_fill_holes`` on the host path) is computed
  exactly without any iterative flood fill: 4-connected CCL of the
  background (matching ``scipy.ndimage.binary_fill_holes``'s default
  cross structure), then ``filled = H·W − Σ size(background components
  that touch the border)``. Right/bottom zero padding is itself
  border-connected background, so padded crops measure identically to
  their true extents, in crop-local coordinates.

``n_bg`` is returned so callers can detect the (pathological) case of more
background components than ``n_bg_segments`` and fall back to the host.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .label import label
from .regionprops_fused import regionprops_fused

__all__ = ["threshold_measure"]


@functools.partial(jax.jit, static_argnames=("n_bg_segments", "n_feret_angles"))
def threshold_measure(
    imgs: jnp.ndarray,
    threshold: float,
    *,
    n_bg_segments: int = 64,
    n_feret_angles: int = 16,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Measure ``imgs > threshold`` of each crop as one region, on device.

    Args:
        imgs: (N, H, W) uint8-range intensity crops (zero padded).
        threshold: brightness threshold (strict ``>``, reference parity).
        n_bg_segments: one-hot bound for background components (filled area).
        n_feret_angles: caliper sweep resolution (regionprops contract).

    Returns:
        (props, area_filled, n_bg): ``props`` maps regionprops keys to (N,)
        arrays (histogram: (N, 256)); ``area_filled`` is (N,) float32;
        ``n_bg`` is (N,) int32 background-component counts (callers must
        treat crops with ``n_bg >= n_bg_segments`` as overflowed).
    """
    imgs_f = imgs.astype(jnp.float32)
    mask = imgs_f > threshold
    labels1 = mask.astype(jnp.int32)

    props = regionprops_fused(
        labels1,
        imgs,
        num_segments=2,
        compute_histogram=True,
        n_feret_angles=n_feret_angles,
    )
    props = {k: v[:, 1] for k, v in props.items()}

    # Filled area: total minus border-connected background (4-conn).
    # pallas=False: the crops are small and this stage traces per shape
    # bucket — Mosaic kernel compiles (~45 s each through a tunnel) would
    # dwarf the XLA formulation's runtime (see ops/label.py docstring).
    bg_lab, n_bg = label(~mask, connectivity=1, pallas=False)
    N, H, W = mask.shape
    border = jnp.zeros((H, W), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    r_ids = jnp.arange(n_bg_segments, dtype=jnp.int32)
    oh = bg_lab[..., None] == r_ids  # fused into the reduces below
    bg_size = jnp.sum(oh, axis=(1, 2), dtype=jnp.float32)  # (N, R)
    touches = jnp.any(oh & border[None, :, :, None], axis=(1, 2))  # (N, R)
    outer = jnp.sum(jnp.where(touches, bg_size, 0.0)[:, 1:], axis=-1)
    area_filled = jnp.float32(H * W) - outer

    return props, area_filled, n_bg
