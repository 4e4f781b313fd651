"""U-Net semantic segmentation model (flax.linen, NHWC, bf16-friendly).

The semseg capability of the reference (copepod prosoma / oil-sac masks,
``predict/pipeline.py:583-681``; BASELINE.json config #3) re-designed for
TPU: NHWC layout feeds the MXU's native conv tiling; GroupNorm keeps the
model batch-size independent (inference batches vary); compute dtype is
configurable (bf16 for inference/training, f32 reference).

Level 0 computes in the PHASE-MAJOR domain by default (``s2d=True``,
:mod:`.s2d`): its 32-channel convs at full resolution run at ~10% MXU
utilization (XLA's small-channel conv path), while the mathematically
identical phase-packed form — 128 channels at half resolution — runs
compute-bound (tools/perf_conv.py, BASELINE.md round-3). Parameters are
canonical either way; ``s2d`` only changes the evaluation order, so any
checkpoint runs with either setting.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNorm
from .s2d import (
    S2DConv,
    S2DGroupNorm,
    depth_to_space,
    phase_max,
    phase_repeat,
    space_to_depth,
)

__all__ = ["UNet"]


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    norm: bool = True
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        # Explicit module names keep the parameter tree identical between
        # the full-resolution and phase-major evaluations (auto-naming
        # counts per class, and the two paths use different classes).
        for k in range(2):
            if self.s2d:
                x = S2DConv(self.features, (3, 3), dtype=self.dtype,
                            name=f"Conv_{k}")(x)
            else:
                x = nn.Conv(self.features, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"Conv_{k}")(x)
            if self.norm:
                groups = min(8, self.features)
                if self.s2d:
                    x = S2DGroupNorm(self.features, num_groups=groups,
                                     dtype=self.dtype,
                                     name=f"GroupNorm_{k}")(x)
                else:
                    x = GroupNorm(num_groups=groups, dtype=self.dtype,
                                  name=f"GroupNorm_{k}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Encoder-decoder with skip connections.

    Attributes:
        out_channels: number of output mask channels (e.g. 2 for
            Prosoma/Oilsack).
        base_features: channel width of the first stage; doubles per stage.
        depth: number of down/up-sampling stages.
        dtype: compute dtype (params stay f32; activations cast).
        norm: GroupNorm after every conv.
        s2d: evaluate level 0 phase-major (exact same math, ~2x faster on
            TPU at 32-channel widths; see module docstring). Requires even
            input extents (any tiled/pow2 pipeline input qualifies).
        s2d_min_pixels: spatial size from which the phase-major path is
            used (measured crossover; below it the layout transposes cost
            more than the conv win).
    """

    out_channels: int = 2
    base_features: int = 32
    depth: int = 4
    dtype: Any = jnp.bfloat16
    norm: bool = True
    s2d: bool = True
    s2d_min_pixels: int = 512 * 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → (B, H, W, out_channels) logits (f32)."""
        x = x.astype(self.dtype)
        # Crossover measured on v5e (BASELINE.md round-3): phase-major wins
        # from 512^2 up (1024^2 b8: 90 -> 68 ms; 512^2 b8: 21 -> 17) and
        # loses below (256^2 b256: 77 -> 111 — the transposes dominate once
        # the convs stop being im2col-bound). Traced per shape, so each
        # bucket gets the right path automatically.
        s2d = (
            self.s2d
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and x.shape[1] * x.shape[2] >= self.s2d_min_pixels
        )

        skips = []
        for i in range(self.depth):
            blk = ConvBlock(
                self.base_features * 2**i, self.dtype, self.norm,
                s2d=s2d and i == 0, name=f"ConvBlock_{i}",
            )
            if s2d and i == 0:
                x = blk(space_to_depth(x))
                skips.append(x)  # phase-major skip
                x = phase_max(x)  # == 2x2/stride-2 max pool, full res
            else:
                x = blk(x)
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = ConvBlock(
            self.base_features * 2**self.depth, self.dtype, self.norm,
            name=f"ConvBlock_{self.depth}",
        )(x)

        for i in reversed(range(self.depth)):
            up_name = f"Conv_{self.depth - 1 - i}"
            blk_name = f"ConvBlock_{2 * self.depth - i}"
            if s2d and i == 0:
                x = phase_repeat(x)  # == 2x nearest upsample, full res
                x = S2DConv(self.base_features, (2, 2), dtype=self.dtype,
                            name=up_name)(x)
                x = jnp.concatenate([skips[0], x], axis=-1)
                x = ConvBlock(self.base_features, self.dtype, self.norm,
                              s2d=True, name=blk_name)(x)
            else:
                B, H, W, C = x.shape
                # 2x nearest upsample as broadcast+reshape:
                # jax.image.resize lowers to gathers on TPU (~100x the
                # cost of a reshape copy).
                x = jnp.broadcast_to(
                    x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
                ).reshape(B, H * 2, W * 2, C)
                x = nn.Conv(self.base_features * 2**i, (2, 2),
                            padding="SAME", dtype=self.dtype,
                            name=up_name)(x)
                x = jnp.concatenate([skips[i], x], axis=-1)
                x = ConvBlock(self.base_features * 2**i, self.dtype,
                              self.norm, name=blk_name)(x)

        head_name = f"Conv_{self.depth}"
        if s2d:
            logits4 = S2DConv(self.out_channels, (1, 1), dtype=jnp.float32,
                              name=head_name)(x)
            logits = depth_to_space(logits4)
        else:
            logits = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32,
                             name=head_name)(x)
        return logits.astype(jnp.float32)
