"""U-Net semantic segmentation model (flax.linen, NHWC, bf16-friendly).

The semseg capability of the reference (copepod prosoma / oil-sac masks,
``predict/pipeline.py:583-681``; BASELINE.json config #3) re-designed for
TPU: NHWC layout feeds the MXU's native conv tiling; GroupNorm keeps the
model batch-size independent (inference batches vary); compute dtype is
configurable (bf16 for inference/training, f32 reference).

The high-resolution levels compute in PHASE-PACKED domains (:mod:`.s2d`):

* Level 0 (32ch) packs 2x2 spatial phases into channels (``s2d=True``):
  its full-resolution convs run at ~10% MXU utilization (XLA's
  small-channel conv path), while the identical math over 128 channels at
  half resolution runs compute-bound (tools/perf_conv.py, BASELINE.md
  round-3).
* Level 1 (64ch) packs WIDTH-ONLY phases (``w2d=True``): the 2D packing's
  4x MACs no longer pay at 64 channels, but the 1D form's exact 2x MACs
  lift utilization 9.6→59% on the encoder convs and win 1.34x on the
  level's conv set (tools/perf_level.py, BASELINE.md round-4).

Parameters are canonical either way; packing only changes the evaluation
order, so any checkpoint runs with any setting.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNorm
from .s2d import (
    S2DConv,
    S2DGroupNorm,
    depth_to_space,
    phase_max,
    phase_max_to_width,
    phase_repeat,
    space_to_depth,
    width_to_space,
    wphase_max,
    wrepeat_up,
)

__all__ = ["UNet"]

FULL = (1, 1)  # unpacked level


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    norm: bool = True
    pack: Tuple[int, int] = FULL
    in_blocks: Tuple[int, ...] = ()  # phase-major concat layout (conv 0 only)

    @nn.compact
    def __call__(self, x):
        phases = self.pack[0] * self.pack[1]
        # Explicit module names keep the parameter tree identical between
        # the full-resolution and phase-packed evaluations (auto-naming
        # counts per class, and the paths use different classes).
        for k in range(2):
            if phases > 1:
                x = S2DConv(self.features, (3, 3), dtype=self.dtype,
                            pack=self.pack, name=f"Conv_{k}",
                            in_blocks=self.in_blocks if k == 0 else ())(x)
            else:
                x = nn.Conv(self.features, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"Conv_{k}")(x)
            if self.norm:
                groups = min(8, self.features)
                if phases > 1:
                    x = S2DGroupNorm(self.features, num_groups=groups,
                                     dtype=self.dtype, phases=phases,
                                     name=f"GroupNorm_{k}")(x)
                else:
                    x = GroupNorm(num_groups=groups, dtype=self.dtype,
                                  name=f"GroupNorm_{k}")(x)
            x = nn.relu(x)
        return x


def _pool(x, src: Tuple[int, int], dst: Tuple[int, int]):
    """2x2/stride-2 max pool from level packing ``src`` to ``dst``."""
    if src == (2, 2):
        return phase_max_to_width(x) if dst == (1, 2) else phase_max(x)
    if src == (1, 2):
        assert dst == FULL, dst
        return wphase_max(x)
    assert src == FULL and dst == FULL, (src, dst)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample(x, src: Tuple[int, int], dst: Tuple[int, int]):
    """2x nearest upsample from level ``i+1``'s packing ``src`` into level
    ``i``'s packing ``dst``."""
    if src == (1, 2):
        x = width_to_space(x)
        src = FULL
    assert src == FULL, src
    if dst == (2, 2):
        return phase_repeat(x)
    if dst == (1, 2):
        return wrepeat_up(x)
    B, H, W, C = x.shape
    # 2x nearest upsample as broadcast+reshape: jax.image.resize lowers
    # to gathers on TPU (~100x the cost of a reshape copy).
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
    ).reshape(B, H * 2, W * 2, C)


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
        w2d: additionally evaluate level 1 width-packed (requires ``s2d``
            active and input width % 4 == 0).
        w2d_min_pixels: minimum LEVEL-1 spatial size (pixels at half
            resolution) for the width-packed path; the measured win is at
            512² level-1 extent (1024² inputs).
    """

    out_channels: int = 2
    base_features: int = 32
    depth: int = 4
    dtype: Any = jnp.bfloat16
    norm: bool = True
    s2d: bool = True
    s2d_min_pixels: int = 512 * 512
    w2d: bool = True
    w2d_min_pixels: int = 512 * 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → (B, H, W, out_channels) logits (f32)."""
        x = x.astype(self.dtype)
        # Crossovers measured on v5e (BASELINE.md rounds 3-4): phase-major
        # level 0 wins from 512^2 inputs up (1024^2 b8: 90 -> 68 ms) and
        # loses below (256^2 b256: 77 -> 111 — the transposes dominate once
        # the convs stop being im2col-bound); width-packed level 1 is
        # measured at 512^2 level-1 extent. Traced per shape, so each
        # bucket gets the right path automatically.
        s2d = (
            self.s2d
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and x.shape[1] * x.shape[2] >= self.s2d_min_pixels
        )
        w2d = (
            s2d
            and self.w2d
            and self.depth >= 2
            and x.shape[2] % 4 == 0
            and (x.shape[1] // 2) * (x.shape[2] // 2) >= self.w2d_min_pixels
        )
        packs = [FULL] * (self.depth + 1)
        if s2d:
            packs[0] = (2, 2)
        if w2d:
            packs[1] = (1, 2)

        skips = []
        for i in range(self.depth):
            if i == 0 and packs[0] == (2, 2):
                x = space_to_depth(x)
            x = ConvBlock(
                self.base_features * 2**i, self.dtype, self.norm,
                pack=packs[i], name=f"ConvBlock_{i}",
            )(x)
            skips.append(x)  # in level i's packing
            x = _pool(x, packs[i], packs[i + 1])

        x = ConvBlock(
            self.base_features * 2**self.depth, self.dtype, self.norm,
            name=f"ConvBlock_{self.depth}",
        )(x)

        for i in reversed(range(self.depth)):
            up_name = f"Conv_{self.depth - 1 - i}"
            blk_name = f"ConvBlock_{2 * self.depth - i}"
            feats = self.base_features * 2**i
            x = _upsample(x, packs[i + 1], packs[i])
            if packs[i] == FULL:
                x = nn.Conv(feats, (2, 2), padding="SAME",
                            dtype=self.dtype, name=up_name)(x)
            else:
                x = S2DConv(feats, (2, 2), dtype=self.dtype,
                            pack=packs[i], name=up_name)(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = ConvBlock(
                feats, self.dtype, self.norm, pack=packs[i],
                in_blocks=(feats, feats) if packs[i] != FULL else (),
                name=blk_name,
            )(x)

        head_name = f"Conv_{self.depth}"
        if packs[0] == (2, 2):
            logits4 = S2DConv(self.out_channels, (1, 1), dtype=jnp.float32,
                              name=head_name)(x)
            logits = depth_to_space(logits4)
        else:
            logits = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32,
                             name=head_name)(x)
        return logits.astype(jnp.float32)
