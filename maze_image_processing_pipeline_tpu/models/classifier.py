"""Multi-label CNN classifier (flax.linen, NHWC) for polytaxo predictions.

The polytaxo capability of the reference scores a probability vector over
taxonomy nodes per crop (``predict/pipeline.py:344-350``; BASELINE.json
config #4). This is a compact conv backbone with global average pooling and
a sigmoid-multi-label head — each output channel corresponds to one
taxonomy node index (see :mod:`..polytaxo`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import GroupNorm

__all__ = ["ConvClassifier"]


class ConvClassifier(nn.Module):
    """Strided conv backbone + GAP + dense multi-label head.

    Attributes:
        n_outputs: number of taxonomy-node probabilities.
        features: channel widths per stage (each stage downsamples 2×).
        dtype: compute dtype.
    """

    n_outputs: int = 32
    features: Sequence[int] = (32, 64, 128, 256)
    dtype: Any = jnp.bfloat16
    norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, H, W, C) → (B, n_outputs) logits (f32)."""
        x = x.astype(self.dtype)
        for f in self.features:
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
            if self.norm:
                x = GroupNorm(num_groups=min(8, f), dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            if self.norm:
                x = GroupNorm(num_groups=min(8, f), dtype=self.dtype)(x)
            x = nn.relu(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.features[-1], dtype=self.dtype)(x)
        x = nn.relu(x)
        logits = nn.Dense(self.n_outputs, dtype=jnp.float32)(x)
        return logits.astype(jnp.float32)
