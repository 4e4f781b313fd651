"""TPU-shaped layers shared by the model zoo.

``GroupNorm``: a drop-in replacement for ``flax.linen.GroupNorm``.
flax's implementation reshapes ``(..., C)`` to ``(..., G, C//G)`` to reduce
per group — on TPU that splits the 128-lane channel dimension into a
minor-most axis of size ``C//G``, and XLA retiles every operand around it.
Measured on v5e: 37 ms of a 56 ms U-Net 1024²-tile forward was GroupNorm
(tools/ probe, BASELINE.md). This version never disturbs the lane axis:

* per-channel Σx and Σx² ride two channel-preserving spatial reduces;
* group aggregation is a tiny ``(B, C) @ (C, G)`` one-hot contraction,
  broadcast back with its transpose;
* normalization is one fused elementwise pass.

Parameter names and shapes (``scale``/``bias`` of ``(C,)``) match
``nn.GroupNorm``, so checkpoints are interchangeable.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["GroupNorm"]


def _group_norm_ref(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    epsilon: float,
) -> jnp.ndarray:
    """Lane-preserving XLA GroupNorm (reference path + training backward)."""
    C = x.shape[-1]
    G = num_groups
    red_axes = tuple(range(1, x.ndim - 1))
    n = C // G
    for a in red_axes:
        n *= x.shape[a]

    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=red_axes)  # (B, C)
    s2 = jnp.sum(xf * xf, axis=red_axes)  # (B, C)

    gmat = (
        jnp.arange(C, dtype=jnp.int32)[:, None] // (C // G)
        == jnp.arange(G, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)  # (C, G)
    gs1 = s1 @ gmat
    gs2 = s2 @ gmat
    mean_g = gs1 / n
    var_g = jnp.maximum(gs2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + epsilon)

    mean_c = mean_g @ gmat.T  # (B, C)
    rstd_c = rstd_g @ gmat.T

    shape = (x.shape[0],) + (1,) * len(red_axes) + (C,)
    y = (xf - mean_c.reshape(shape)) * (rstd_c.reshape(shape) * scale) + bias
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _group_norm_tpu(x, scale, bias, num_groups, epsilon):
    from .pallas_norm import group_norm_pallas

    return group_norm_pallas(
        x, scale, bias, num_groups=num_groups, epsilon=epsilon
    )


def _gn_fwd(x, scale, bias, num_groups, epsilon):
    return _group_norm_tpu(x, scale, bias, num_groups, epsilon), (
        x,
        scale,
        bias,
    )


def _gn_bwd(num_groups, epsilon, res, ct):
    x, scale, bias = res
    if jax.default_backend() == "tpu" and x.ndim in (3, 4) and x.shape[0] <= 32:
        # Fused strip kernel (same layout pinning as the forward) — the
        # XLA-recompute VJP paid the forward's pre-fix composed cost in
        # the train step (round-2 VERDICT item 9).
        from .pallas_norm import group_norm_bwd_pallas

        dx, dscale, dbias = group_norm_bwd_pallas(
            x, ct, scale, num_groups=num_groups, epsilon=epsilon
        )
        return dx, dscale, dbias
    # Backward through the XLA reference (identical math).
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _group_norm_ref(x_, s_, b_, num_groups, epsilon),
        x,
        scale,
        bias,
    )
    return vjp(ct)


_group_norm_tpu.defvjp(_gn_fwd, _gn_bwd)


class GroupNorm(nn.Module):
    """Lane-preserving group normalization (see module docstring).

    Matches ``nn.GroupNorm(num_groups, epsilon=1e-6)`` semantics: channels
    are split into ``num_groups`` consecutive blocks; statistics reduce
    over all non-batch axes within each block. On TPU the forward is the
    fused Pallas kernel (:mod:`.pallas_norm`); elsewhere (and for the
    training backward) the XLA formulation above.
    """

    num_groups: int = 8
    epsilon: float = 1e-6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        G = self.num_groups
        if C % G:
            raise ValueError(f"channels {C} not divisible by groups {G}")
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        # The Pallas kernel wins on few large images (the tile path: its
        # grid is strips × 2 phases per image — measured 17.6 → 28.6
        # 1024²-tiles/s). On many small images the per-step grid overhead
        # dominates (256×256² crops: 3200 → 450 crops/s), and XLA composes
        # the lane-preserving formulation fine there — dispatch on batch
        # count (BASELINE.md).
        if (
            jax.default_backend() == "tpu"
            and x.ndim in (3, 4)
            and x.shape[0] <= 32
        ):
            y = _group_norm_tpu(x, scale, bias, G, self.epsilon)
        else:
            y = _group_norm_ref(x, scale, bias, G, self.epsilon)
        return y.astype(self.dtype or x.dtype)
