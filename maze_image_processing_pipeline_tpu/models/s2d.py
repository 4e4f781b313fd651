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

Channel packing is PHASE-MAJOR: packed channel ``c4 = (qy * 2 + qx) * C
+ c`` where ``(qy, qx)`` is the pixel's position inside its 2x2 tile.
Phase-major (not channel-major ``c * 4 + qy * 2 + qx``) keeps the
canonical channel axis as the innermost (lane) dimension, so every
boundary op is lane-preserving on TPU: the width pack/unpack are FREE
reshapes, pools reduce over a sublane axis, and upsampling is a
``jnp.tile``. The channel-major variant measured a 3.5 ms/batch LOSS on
the level-1 width packing from its lane-shuffling boundary ops
(BASELINE.md round-4). GroupNorm statistics stay exact via a phase-aware
group matrix (``layers._group_norm_ref(phases=...)``).

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
    "space_to_width",
    "width_to_space",
    "wphase_max",
    "phase_max_to_width",
    "wrepeat_up",
    "S2DConv",
    "S2DGroupNorm",
]


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C), packing ``(qy*2 + qx)*C + c``."""
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, h, w, qy, qx, C — lanes intact
    return x.reshape(B, H // 2, W // 2, C * 4)


def depth_to_space(x4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, h, w, C4 = x4.shape
    C = C4 // 4
    x = x4.reshape(B, h, w, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * h, 2 * w, C)


def phase_max(x4: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool of the full-res tensor = max over the 4
    phases of each channel: (B, h, w, 4C) → (B, h, w, C)."""
    B, h, w, C4 = x4.shape
    return x4.reshape(B, h, w, 4, C4 // 4).max(axis=3)


def phase_repeat(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample of the full-res tensor = every phase equal:
    (B, h, w, C) → (B, h, w, 4C)."""
    return jnp.tile(x, (1, 1, 1, 4))


# --- Width-only (1D) packing -------------------------------------------
#
# Round-4 probe data (tools/perf_level.py, BASELINE.md): at the U-Net's
# level 1 (64 channels @512², b8) the 2D packing's 4x MACs no longer pay,
# but WIDTH-ONLY packing — (B, H, W, C) → (B, H, W/2, 2C), exactly 2x the
# MACs for a 3x3 conv — lifts MXU utilization 9.6→59.4% (enc1) and wins
# 1.34x on the level's full conv set. Packed channel ``c2 = qx * C + c``
# (phase-major), which makes the pack/unpack FREE reshapes: the flattened
# (W, C) memory order IS (w_pair, qx, C).


def space_to_width(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H, W/2, 2C), packing ``qx*C + c`` (a free
    reshape: no data movement)."""
    B, H, W, C = x.shape
    assert W % 2 == 0, (H, W)
    return x.reshape(B, H, W // 2, C * 2)


def width_to_space(x2: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_width` (free reshape)."""
    B, H, w, C2 = x2.shape
    return x2.reshape(B, H, 2 * w, C2 // 2)


def wphase_max(x2: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool of the width-packed tensor: max over the
    column phase + adjacent rows. (B, H, w, 2C) → (B, H/2, w, C)."""
    B, H, w, C2 = x2.shape
    C = C2 // 2
    return x2.reshape(B, H // 2, 2, w, 2, C).max(axis=(2, 4))


def phase_max_to_width(x4: jnp.ndarray) -> jnp.ndarray:
    """:func:`phase_max` composed with :func:`space_to_width` in one
    pass: 2D phase-major level output → the next level's width-packed
    input. (B, h, w, 4C) → (B, h, w/2, 2C)."""
    B, h, w, C4 = x4.shape
    C = C4 // 4
    x = x4.reshape(B, h, w, 4, C).max(axis=3)  # = phase_max
    return x.reshape(B, h, w // 2, C * 2)  # free width pack


def wrepeat_up(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample expressed width-packed: (B, h, w, C) →
    (B, 2h, w, 2C) where both column phases equal the source pixel."""
    B, h, w, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, :], (B, h, 2, w, C))
    x = x.reshape(B, 2 * h, w, C)
    return jnp.tile(x, (1, 1, 1, 2))


@functools.lru_cache(maxsize=None)
def _phase_map(k: int, pack: int = 2) -> np.ndarray:
    """0/1 tensor A[(tile tap), q, p, u] for kernel size ``k`` along an
    axis packed by ``pack`` (1 = unpacked: the identity tap map)."""
    if pack == 1:
        A = np.zeros((k, 1, 1, k), np.float32)
        for u in range(k):
            A[u, 0, 0, u] = 1.0
        return A
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


# lax SAME padding per tile-kernel size — identical for the packed and
# unpacked axes (the tap derivation for pack=2 lands on the same table).
_TILE_PAD = {3: ((1, 1), (1, 1)), 2: ((0, 1), (0, 1)), 1: ((0, 0), (0, 0))}


def transform_kernel(
    W: jnp.ndarray, pack: Tuple[int, int] = (2, 2)
) -> jnp.ndarray:
    """Canonical (kh, kw, Cin, Cout) → phase-packed
    (kt_h, kt_w, ph*pw*Cin, ph*pw*Cout) for per-axis packing ``pack``."""
    kh, kw, Ci, Co = W.shape
    ph, pw = pack
    A = jnp.asarray(_phase_map(kh, ph))
    B = jnp.asarray(_phase_map(kw, pw))
    # Phase-MAJOR channel order: packed input channel (q*pw + r)*Ci + i,
    # packed output channel (p*pw + s)*Co + o (see module docstring).
    Wp = jnp.einsum("aqpu,brsv,uvio->abqripso", A, B, W)
    kt_h, kt_w = A.shape[0], B.shape[0]
    return Wp.reshape(kt_h, kt_w, Ci * ph * pw, Co * ph * pw)


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
    pack: Tuple[int, int] = (2, 2)  # phases per (row, column) axis
    # Canonical widths of concatenated phase-major blocks in the input:
    # ``jnp.concatenate([a, b], -1)`` of phase-major tensors is NOT
    # phase-major over the union — instead of re-interleaving the data (a
    # lane shuffle), the transformed kernel's input-channel axis is
    # permuted to match the block layout (free: folded into the kernel
    # constant). () = input is a single proper phase-major tensor.
    in_blocks: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x4: jnp.ndarray) -> jnp.ndarray:
        phases = self.pack[0] * self.pack[1]
        Cin = x4.shape[-1] // phases
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, Cin, self.features),
            jnp.float32,
        )
        Wp = transform_kernel(kernel, self.pack).astype(self.dtype)
        if self.in_blocks:
            assert sum(self.in_blocks) == Cin, (self.in_blocks, Cin)
            perm = np.concatenate([
                np.arange(phases)[:, None] * Cin + off + np.arange(Cb)[None, :]
                for off, Cb in zip(
                    np.cumsum((0,) + self.in_blocks[:-1]), self.in_blocks
                )
            ], axis=None)
            Wp = Wp[:, :, perm, :]
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
            y = y + jnp.tile(bias, phases).astype(y.dtype)
        return y


class S2DGroupNorm(nn.Module):
    """GroupNorm over phase-packed activations with canonical parameters.

    With the phase-major packing, canonical channel ``c``'s phases live at
    packed channels ``{q*C + c}``; the phase-aware group matrix in
    :func:`layers._group_norm_ref` reduces exactly the same pixels as the
    full-resolution group, so the statistics are identical. The
    per-channel affine tiles the canonical ``scale``/``bias (C,)`` over
    the phases.
    """

    features: int  # ORIGINAL channel count C
    num_groups: int = 8
    epsilon: float = 1e-6
    dtype: Optional[Any] = None
    phases: int = 4  # packed phases per canonical channel

    @nn.compact
    def __call__(self, x4: jnp.ndarray) -> jnp.ndarray:
        C = self.features
        if C % self.num_groups:
            raise ValueError(f"channels {C} not divisible by {self.num_groups}")
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        y = _group_norm_ref(
            x4,
            jnp.tile(scale, self.phases),
            jnp.tile(bias, self.phases),
            self.num_groups,
            self.epsilon,
            phases=self.phases,
        )
        return y.astype(self.dtype or x4.dtype)
