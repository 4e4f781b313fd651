"""Pallas TPU kernel: fused GroupNorm over NHWC activations.

GroupNorm math is memory-bound and fast in isolation (~0.7 ms on a
(4,1024²,32) bf16 activation, ≈3 HBM passes). Composed between convs in
the U-Net, however, XLA's layout/fusion choices around the spatial reduce
cost ~15 ms *per norm layer* (measured: norm=True 56.4 ms/tile vs
norm=False 19.4 ms/tile with 10 norm layers on the high-res levels —
BASELINE.md). Like the CCL lane scans (`ops/pallas_scan.py`), the fix is
an opaque Pallas program that pins the boundary layout by construction:

* two-phase grid over row strips: phase 0 accumulates per-channel Σx and
  Σx² (f32) in VMEM; the first phase-1 step folds them through the
  (C → G) group one-hot into per-channel affine constants
  ``a = rstd·scale``, ``b = bias − mean·rstd·scale``;
* phase 1 rewrites each strip as ``x·a + b`` — one fused elementwise pass.

Semantics match ``flax.linen.GroupNorm(num_groups, epsilon)`` (consecutive
channel groups, stats over all non-batch axes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_pallas"]


def _kernel(x_ref, scale_ref, bias_ref, out_ref, stats_ref, ab_ref, *, num_groups, eps, n):
    phase = pl.program_id(1)
    h = pl.program_id(2)
    C = x_ref.shape[-1]
    G = num_groups

    @pl.when((phase == 0) & (h == 0))
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    @pl.when(phase == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)  # (TH, W, C)
        stats_ref[0, 0] += jnp.sum(xf, axis=(0, 1))
        stats_ref[0, 1] += jnp.sum(xf * xf, axis=(0, 1))

    @pl.when((phase == 1) & (h == 0))
    def _():
        s1 = stats_ref[0, 0][None, :]  # (1, C)
        s2 = stats_ref[0, 1][None, :]
        g_of_c = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // (C // G)
        onehot = (
            g_of_c == jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
        ).astype(jnp.float32)  # (C, G)
        gs1 = jax.lax.dot_general(
            s1, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, G)
        gs2 = jax.lax.dot_general(
            s2, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean_g = gs1 / n
        var_g = jnp.maximum(gs2 / n - mean_g * mean_g, 0.0)
        rstd_g = jax.lax.rsqrt(var_g + eps)
        # broadcast back to channels: (1, G) @ (G, C)
        mean_c = jax.lax.dot_general(
            mean_g, onehot.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        rstd_c = jax.lax.dot_general(
            rstd_g, onehot.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]
        a = rstd_c * scale_ref[0]
        ab_ref[0, 0] = a
        ab_ref[0, 1] = bias_ref[0] - mean_c * a

    @pl.when(phase == 1)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        y = xf * ab_ref[0, 0][None, None, :] + ab_ref[0, 1][None, None, :]
        out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "epsilon", "tile_rows", "interpret")
)
def group_norm_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int,
    epsilon: float = 1e-6,
    tile_rows: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm of (B, H, W, C) (or (B, L, C)) activations on TPU."""
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    if x.ndim == 3:
        x = x[:, :, None, :]
    elif x.ndim != 4:
        raise ValueError(f"expected 3D/4D activations, got {x.shape}")
    _, H, W, _ = x.shape

    TH = tile_rows
    if not TH:
        # Budget ~8 MiB effective block: Mosaic pads the lane (channel)
        # dimension to 128, so narrow channels occupy 128/C× their nominal
        # bytes — ignoring that OOMed the 64 MiB scoped VMEM in the train
        # step at (4, 256, 256, 16) (caught by the TPU train smoke).
        c_eff = max(C, 128)
        TH = max(8, min(H, (8 * 1024 * 1024) // max(1, W * c_eff * 2)))
        TH = 1 << (TH.bit_length() - 1)
    n_h = -(-H // TH)
    H_pad = n_h * TH
    if H_pad != H:
        x = jnp.pad(x, ((0, 0), (0, H_pad - H), (0, 0), (0, 0)))

    # True element count per group: padded rows are zeros and contribute
    # nothing to Σx / Σx², so only the divisor must use the true H.
    n = H * W * (C // num_groups)

    out, _, _ = pl.pallas_call(
        functools.partial(
            _kernel, num_groups=num_groups, eps=epsilon, n=float(n)
        ),
        grid=(B, 2, n_h),
        in_specs=[
            pl.BlockSpec(
                (1, TH, W, C),
                lambda b, p, h: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, C), lambda b, p, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, TH, W, C),
                lambda b, p, h: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, C), lambda b, p, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, p, h: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H_pad, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, scale[None, :], bias[None, :])

    out = out[:, :H]
    return out.reshape(orig_shape)
