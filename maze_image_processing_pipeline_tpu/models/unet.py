"""U-Net semantic segmentation model (flax.linen, NHWC, bf16-friendly).

The semseg capability of the reference (copepod prosoma / oil-sac masks,
``predict/pipeline.py:583-681``; BASELINE.json config #3) re-designed for
TPU: NHWC layout feeds the MXU's native conv tiling; GroupNorm keeps the
model batch-size independent (inference batches vary); compute dtype is
configurable (bf16 for inference/training, f32 reference).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNorm

__all__ = ["UNet"]


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            if self.norm:
                x = GroupNorm(
                    num_groups=min(8, self.features), dtype=self.dtype
                )(x)
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
    """

    out_channels: int = 2
    base_features: int = 32
    depth: int = 4
    dtype: Any = jnp.bfloat16
    norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → (B, H, W, out_channels) logits (f32)."""
        x = x.astype(self.dtype)

        skips = []
        for i in range(self.depth):
            x = ConvBlock(self.base_features * 2**i, self.dtype, self.norm)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = ConvBlock(self.base_features * 2**self.depth, self.dtype, self.norm)(x)

        for i in reversed(range(self.depth)):
            B, H, W, C = x.shape
            # 2x nearest upsample as broadcast+reshape: jax.image.resize
            # lowers to gathers on TPU (~100x the cost of a reshape copy).
            x = jnp.broadcast_to(
                x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
            ).reshape(B, H * 2, W * 2, C)
            x = nn.Conv(
                self.base_features * 2**i, (2, 2), padding="SAME", dtype=self.dtype
            )(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = ConvBlock(self.base_features * 2**i, self.dtype, self.norm)(x)

        logits = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32)(x)
        return logits.astype(jnp.float32)
