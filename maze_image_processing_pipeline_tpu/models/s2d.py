"""Phase-major (space-to-depth) convolution blocks for high-res U-Net levels.

Round-3 probe data (tools/perf_conv.py, BASELINE.md): a 3x3 conv at
1024^2 with 32 channels runs at ~10% MXU utilization (XLA's small-channel
conv path is im2col/HBM-bound), while the SAME math expressed over
2x2-phase-packed tiles — (B, 512, 512, 128), kernel transformed to
(3, 3, 128, 128) — runs compute-bound at >90% utilization and finishes
2.2x faster despite paying 4x the MACs. The layout round trip
(space-to-depth / depth-to-space) is one cheap reshape-transpose pass.

So the U-Net's level-0 stage computes in the phase-major domain end to
end: s2d once on the input, both encoder convs + GroupNorms, the max
pool (a per-channel max over the 4 phases), the decoder upsample (a
channel repeat), the 2x2 up-convolution, the decoder ConvBlock, and the
1x1 head, with exactly ONE depth-to-space at the output.

Everything here is mathematically EXACT (not an approximation): the
phase-packed kernels are linear rearrangements of the canonical
``(kh, kw, Cin, Cout)`` parameters, which stay in their canonical shape —
checkpoints, the torch importer, and the non-phase-major path all share
the same parameter tree.

Channel packing: phase-packed channel ``c4 = c * 4 + qy * 2 + qx`` where
``(qy, qx)`` is the pixel's position inside its 2x2 tile. This keeps each
original channel's four phases contiguous, so GroupNorm statistics over
consecutive channel blocks are IDENTICAL to the full-resolution ones.

Derivation of the kernel transform (rows; columns are symmetric): a
stride-1 conv with kernel size ``k`` and lax-SAME padding computes
``y[o] = sum_u W[u] x[o - pad_lo + u]``. Writing output rows as
``o = 2a + p`` and input rows as ``2(a + dt) + q`` gives the tap
condition ``u = 2 dt + q - p + pad_lo``; collecting the valid ``(dt, q,
p, u)`` combinations yields a small 0/1 tensor ``A`` and the packed
kernel ``W'[(dt), (q..), (p..)] = A A W`` (an einsum). For k=3 the tile
kernel is 3 wide (pad 1,1); for k=2 it is 2 wide (pad 0,1); k=1 stays 1.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import _group_norm_ref

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "phase_max",
    "phase_repeat",
    "S2DConv",
    "S2DGroupNorm",
]


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C), packing ``c*4 + qy*2 + qx``."""
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, h, w, C, qy, qx
    return x.reshape(B, H // 2, W // 2, C * 4)


def depth_to_space(x4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, h, w, C4 = x4.shape
    C = C4 // 4
    x = x4.reshape(B, h, w, C, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, 2 * h, 2 * w, C)


def phase_max(x4: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool of the full-res tensor = max over the 4
    phases of each channel: (B, h, w, 4C) → (B, h, w, C)."""
    B, h, w, C4 = x4.shape
    return x4.reshape(B, h, w, C4 // 4, 4).max(axis=-1)


def phase_repeat(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample of the full-res tensor = every phase equal:
    (B, h, w, C) → (B, h, w, 4C)."""
    return jnp.repeat(x, 4, axis=-1)


@functools.lru_cache(maxsize=None)
def _phase_map(k: int) -> np.ndarray:
    """0/1 tensor A[(tile tap), qy, py, u] for kernel size ``k``."""
    if k == 3:
        dts, pad_lo = (-1, 0, 1), 1
    elif k == 2:
        dts, pad_lo = (0, 1), 0
    elif k == 1:
        dts, pad_lo = (0,), 0
    else:
        raise NotImplementedError(f"kernel size {k}")
    A = np.zeros((len(dts), 2, 2, k), np.float32)
    for ti, dt in enumerate(dts):
        for q in (0, 1):
            for p in (0, 1):
                u = 2 * dt + q - p + pad_lo
                if 0 <= u < k:
                    A[ti, q, p, u] = 1.0
    return A


_TILE_PAD = {3: ((1, 1), (1, 1)), 2: ((0, 1), (0, 1)), 1: ((0, 0), (0, 0))}


def transform_kernel(W: jnp.ndarray) -> jnp.ndarray:
    """Canonical (kh, kw, Cin, Cout) → phase-packed (kt, kt, 4Cin, 4Cout)."""
    kh, kw, Ci, Co = W.shape
    A = jnp.asarray(_phase_map(kh))
    B = jnp.asarray(_phase_map(kw))
    Wp = jnp.einsum("aqpu,brsv,uvio->abiqrops", A, B, W)
    kt_h, kt_w = A.shape[0], B.shape[0]
    return Wp.reshape(kt_h, kt_w, Ci * 4, Co * 4)


class S2DConv(nn.Module):
    """A stride-1 SAME conv evaluated in the phase-major domain.

    Parameters are the CANONICAL ``kernel (kh, kw, Cin, Cout)`` /
    ``bias (Cout,)`` (identical names, shapes, and initializers to
    ``nn.Conv``), so checkpoints are interchangeable with the
    full-resolution path; the phase-packed kernel is derived per forward
    (a tiny einsum XLA folds away next to the conv).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x4: jnp.ndarray) -> jnp.ndarray:
        Cin = x4.shape[-1] // 4
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, Cin, self.features),
            jnp.float32,
        )
        Wp = transform_kernel(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x4.astype(self.dtype),
            Wp,
            window_strides=(1, 1),
            padding=(_TILE_PAD[kh][0], _TILE_PAD[kw][0]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + jnp.repeat(bias, 4).astype(y.dtype)
        return y


class S2DGroupNorm(nn.Module):
    """GroupNorm over phase-packed activations with canonical parameters.

    With the ``c*4 + phase`` packing, group ``g``'s phase-packed slice
    covers exactly the same pixels as the full-resolution group, so the
    statistics are identical; the per-channel affine repeats each of the
    canonical ``scale``/``bias (C,)`` entries over its 4 phases.
    """

    features: int  # ORIGINAL channel count C
    num_groups: int = 8
    epsilon: float = 1e-6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x4: jnp.ndarray) -> jnp.ndarray:
        C = self.features
        if C % self.num_groups:
            raise ValueError(f"channels {C} not divisible by {self.num_groups}")
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        y = _group_norm_ref(
            x4,
            jnp.repeat(scale, 4),
            jnp.repeat(bias, 4),
            self.num_groups,
            self.epsilon,
        )
        return y.astype(self.dtype or x4.dtype)
