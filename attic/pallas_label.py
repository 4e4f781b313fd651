"""Pallas vertical-propagation kernel for the CCL sweep (EXPERIMENT, unused).

Motivation: the XLA strip-walk vertical pass is layout-sensitive — when the
mask is produced by upstream ops (morphology) XLA pins the canonical
(B, H, W) layout and the composed chain measures ~10× slower than `label`
compiled in isolation.

Measured result on v5e: this kernel is *correct* (validated against the XLA
pass and scipy) but SLOWER (≈210 ms vs ≈118 ms per batch composed): the
row-dependency chain is latency-bound and Mosaic's per-row op overhead
exceeds XLA's fused loop. Kept as a documented negative result; `label()`
uses the XLA strip walk. Round-2 candidates: diagonal wavefront formulation,
or processing multiple independent column-bands per row step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vertical_pass_pallas"]

_INF = 2**30  # python literal: jnp scalars would be captured consts


def _kernel(lab_ref, fg_ref, out_ref, carry_ref, *, connectivity, reverse, strip):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, _INF)

    carry = carry_ref[:]  # (B, W)

    order = range(strip - 1, -1, -1) if reverse else range(strip)
    for r in order:
        cur = lab_ref[:, r, :]
        fgr = fg_ref[:, r, :]
        neigh = carry
        if connectivity == 2:
            pad = jnp.full((carry.shape[0], 1), _INF, carry.dtype)
            left = jnp.concatenate([pad, carry[:, :-1]], axis=1)
            right = jnp.concatenate([carry[:, 1:], pad], axis=1)
            neigh = jnp.minimum(neigh, jnp.minimum(left, right))
        carry = jnp.where(fgr, jnp.minimum(cur, neigh), _INF)
        out_ref[:, r, :] = carry

    carry_ref[:] = carry


@functools.partial(
    jax.jit, static_argnames=("connectivity", "reverse", "strip", "interpret")
)
def vertical_pass_pallas(
    lab: jnp.ndarray,
    fg: jnp.ndarray,
    connectivity: int = 2,
    reverse: bool = False,
    strip: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row-sequential min propagation through foreground ((B, H, W) int32)."""
    B, H, W = lab.shape
    n_strips = -(-H // strip)
    H_pad = n_strips * strip
    if H_pad != H:
        lab = jnp.pad(lab, ((0, 0), (0, H_pad - H), (0, 0)), constant_values=_INF)
        fg = jnp.pad(fg, ((0, 0), (0, H_pad - H), (0, 0)))

    if reverse:
        index_map = lambda s: (0, n_strips - 1 - s, 0)  # noqa: E731
    else:
        index_map = lambda s: (0, s, 0)  # noqa: E731

    block = pl.BlockSpec((B, strip, W), index_map, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _kernel, connectivity=connectivity, reverse=reverse, strip=strip
        ),
        grid=(n_strips,),
        in_specs=[block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, H_pad, W), lab.dtype),
        scratch_shapes=[pltpu.VMEM((B, W), lab.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(lab, fg)

    if H_pad != H:
        out = out[:, :H]
    return out
