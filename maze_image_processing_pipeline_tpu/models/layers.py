"""TPU-shaped layers shared by the model zoo.

``GroupNorm``: a drop-in replacement for ``flax.linen.GroupNorm``.
flax's implementation reshapes ``(..., C)`` to ``(..., G, C//G)`` to reduce
per group — on TPU that splits the 128-lane channel dimension into a
minor-most axis of size ``C//G``, and XLA retiles every operand around it.
This version never disturbs the lane axis:

* per-channel Σx and Σx² ride two channel-preserving spatial reduces;
* group aggregation is a tiny ``(B, C) @ (C, G)`` one-hot contraction,
  broadcast back with its transpose;
* normalization is one fused elementwise pass.

Round-3 measurement note (tools/perf_gn.py, BASELINE.md): this XLA
formulation runs AT the 3-HBM-pass roofline both in isolation
(1.55 ms per (8, 1024², 32) bf16 batch) and composed between convs
(+0.19 ms/instance at L0) — the earlier composed slowness that motivated
the Pallas kernel (``attic/pallas_norm.py``) disappeared once device-constant
lowering fetches and param closures were fixed, while the Pallas kernel
itself pays a 4× lane-padding tax at C=32 (23.8 ms isolated, +3 ms/tile
composed). The Pallas kernel is therefore no longer dispatched; it is kept
as a measured negative result (like ``attic/pallas_relabel.py``).

Parameter names and shapes (``scale``/``bias`` of ``(C,)``) match
``nn.GroupNorm``, so checkpoints are interchangeable.
"""

from __future__ import annotations

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
    phases: int = 1,
) -> jnp.ndarray:
    """Lane-preserving XLA GroupNorm (forward + autodiff backward).

    ``phases > 1``: the channel axis is a phase-major packing of
    ``C // phases`` canonical channels (:mod:`.s2d`) — packed channel
    ``idx`` is canonical channel ``idx % (C // phases)``, and groups are
    contiguous blocks of CANONICAL channels. Statistics are then identical
    to the unpacked evaluation.
    """
    C = x.shape[-1]
    G = num_groups
    red_axes = tuple(range(1, x.ndim - 1))
    n = C // G
    for a in red_axes:
        n *= x.shape[a]

    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=red_axes)  # (B, C)
    s2 = jnp.sum(xf * xf, axis=red_axes)  # (B, C)

    cidx = jnp.arange(C, dtype=jnp.int32)
    if phases > 1:
        cidx = cidx % (C // phases)
    gmat = (
        cidx[:, None] // (C // phases // G)
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


class GroupNorm(nn.Module):
    """Lane-preserving group normalization (see module docstring).

    Matches ``nn.GroupNorm(num_groups, epsilon=1e-6)`` semantics: channels
    are split into ``num_groups`` consecutive blocks; statistics reduce
    over all non-batch axes within each block.
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
        y = _group_norm_ref(x, scale, bias, G, self.epsilon)
        return y.astype(self.dtype or x.dtype)
