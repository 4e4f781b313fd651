"""Batched binary morphology on TPU, derived from the bounded EDT.

Replaces the reference's per-frame host morphology
(``skimage.morphology.binary_opening/closing`` with
``disk(r, decomposition="crosses")`` at ``loki/pipeline.py:405-427`` and the
EDT-based ``maze_ipp/isotropic.py`` ops) with whole-batch device kernels.

Semantics:

* ``binary_erosion(mask, r)`` uses the *exact* Euclidean disk footprint
  ``{(dy,dx): dy²+dx² ≤ r²}`` (the shape skimage's crosses decomposition
  approximates). Out-of-image pixels are treated as foreground for erosion
  and background for dilation — the extensive/anti-extensive border
  convention of skimage, which the reference relies on.
* ``isotropic_*`` match the strict-inequality contract of
  ``maze_ipp/isotropic.py:8-129`` (erosion keeps ``dist > r``; dilation adds
  ``dist < r``), enabling fractional radii.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .edt import squared_edt

__all__ = [
    "binary_erosion",
    "binary_dilation",
    "binary_opening",
    "binary_closing",
    "isotropic_erosion",
    "isotropic_dilation",
    "isotropic_opening",
    "isotropic_closing",
]


def _ceil_radius(radius: float) -> int:
    return int(math.ceil(radius))


@functools.partial(jax.jit, static_argnames=("radius",))
def binary_erosion(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Erosion by the Euclidean disk of integer radius ``radius``."""
    if radius <= 0:
        return mask.astype(bool)
    sq = squared_edt(~mask.astype(bool), _ceil_radius(radius))
    return sq > radius * radius


@functools.partial(jax.jit, static_argnames=("radius",))
def binary_dilation(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Dilation by the Euclidean disk of integer radius ``radius``."""
    if radius <= 0:
        return mask.astype(bool)
    sq = squared_edt(mask.astype(bool), _ceil_radius(radius))
    return sq <= radius * radius


def binary_opening(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Opening (erosion then dilation): removes details smaller than the disk."""
    return binary_dilation(binary_erosion(mask, radius), radius)


def binary_closing(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Closing (dilation then erosion): closes gaps smaller than the disk."""
    return binary_erosion(binary_dilation(mask, radius), radius)


@functools.partial(jax.jit, static_argnames=("radius",))
def isotropic_erosion(mask: jnp.ndarray, radius: float) -> jnp.ndarray:
    """EDT-based erosion with strict threshold (``dist > radius``)."""
    sq = squared_edt(~mask.astype(bool), _ceil_radius(radius))
    return sq.astype(jnp.float32) > radius * radius


@functools.partial(jax.jit, static_argnames=("radius",))
def isotropic_dilation(mask: jnp.ndarray, radius: float) -> jnp.ndarray:
    """EDT-based dilation with strict threshold (``dist < radius``)."""
    sq = squared_edt(mask.astype(bool), _ceil_radius(radius))
    return sq.astype(jnp.float32) < radius * radius


def isotropic_opening(mask: jnp.ndarray, radius: float) -> jnp.ndarray:
    return isotropic_dilation(isotropic_erosion(mask, radius), radius)


def isotropic_closing(mask: jnp.ndarray, radius: float) -> jnp.ndarray:
    return isotropic_erosion(isotropic_dilation(mask, radius), radius)
