"""Pallas TPU kernel: fused GroupNorm over NHWC activations.

STATUS (round 3): **measured negative result — not dispatched.** The
kernel was written when flax GroupNorm composed with convs cost ~15 ms
per norm layer (round-2 BASELINE.md) and won at the time (17.6 → 28.6
tiles/s). After the device-constant/lowering fixes, the lane-preserving
XLA formulation (``models/layers.py``) runs AT the 3-HBM-pass roofline
both isolated and composed (+0.19 ms/instance at L0), while this kernel
pays Mosaic's lane padding (C=32 → 128 lanes = 4× HBM traffic; 23.8 ms
isolated per (8, 1024², 32) batch, tools/perf_gn.py). Kept, like
``ops/pallas_relabel.py``, as a tested record of the approach.

Design (two-phase strip grid):

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

__all__ = ["group_norm_pallas", "group_norm_bwd_pallas"]


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


def _bwd_kernel(
    x_ref, ct_ref, scale_ref, dx_ref, sums_ref, const_ref, dg_ref, db_ref,
    *, num_groups, eps, n
):
    """Two-phase GroupNorm backward (see ``group_norm_bwd_pallas``).

    Phase 0 accumulates per-channel Σx, Σx², Σct, Σ(ct·x) in f32; the
    first phase-1 step folds them through the (C → G) one-hot into the
    affine constants of ``dx = a·ct + b·x + d`` (the standard GN backward
    rewritten as an elementwise affine in (ct, x)), plus per-batch dγ/dβ
    rows; remaining phase-1 steps rewrite each strip in one fused pass.
    """
    phase = pl.program_id(1)
    h = pl.program_id(2)
    C = x_ref.shape[-1]
    G = num_groups

    @pl.when((phase == 0) & (h == 0))
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    @pl.when(phase == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)  # (TH, W, C)
        cf = ct_ref[0].astype(jnp.float32)
        sums_ref[0, 0] += jnp.sum(xf, axis=(0, 1))
        sums_ref[0, 1] += jnp.sum(xf * xf, axis=(0, 1))
        sums_ref[0, 2] += jnp.sum(cf, axis=(0, 1))
        sums_ref[0, 3] += jnp.sum(cf * xf, axis=(0, 1))

    @pl.when((phase == 1) & (h == 0))
    def _():
        s1 = sums_ref[0, 0][None, :]  # (1, C)
        s2 = sums_ref[0, 1][None, :]
        sc = sums_ref[0, 2][None, :]
        scx = sums_ref[0, 3][None, :]
        g_of_c = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // (C // G)
        onehot = (
            g_of_c == jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
        ).astype(jnp.float32)  # (C, G)

        def to_g(v):  # (1, C) → (1, G)
            return jax.lax.dot_general(
                v, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def to_c(v):  # (1, G) → (1, C)
            return jax.lax.dot_general(
                v, onehot.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        mean_g = to_g(s1) / n
        var_g = jnp.maximum(to_g(s2) / n - mean_g * mean_g, 0.0)
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_c = to_c(mean_g)[0]  # (C,)
        rstd_c = to_c(rstd_g)[0]

        gamma = scale_ref[0]
        # Per-channel Σ dx̂ = γ·Σct and Σ dx̂·x̂ = γ·rstd·(Σct·x − μ·Σct),
        # then grouped: S1g, S2g.
        sum_dxh_c = gamma * sc[0]
        sum_dxh_xh_c = gamma * rstd_c * (scx[0] - mean_c * sc[0])
        S1 = to_c(to_g(sum_dxh_c[None, :]))[0]  # (C,) group-broadcast
        S2 = to_c(to_g(sum_dxh_xh_c[None, :]))[0]
        # dx = rstd(dx̂ − (S1 + x̂·S2)/N) with x̂ = (x − μ)·rstd
        #    = (rstd·γ)·ct + (−rstd²·S2/N)·x + rstd(μ·rstd·S2 − S1)/N
        const_ref[0, 0] = rstd_c * gamma
        const_ref[0, 1] = -rstd_c * rstd_c * S2 / n
        const_ref[0, 2] = rstd_c * (mean_c * rstd_c * S2 - S1) / n
        # Per-batch parameter gradients (summed over batch outside).
        db_ref[0, 0] = sc[0]
        dg_ref[0, 0] = rstd_c * (scx[0] - mean_c * sc[0])

    @pl.when(phase == 1)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        cf = ct_ref[0].astype(jnp.float32)
        a = const_ref[0, 0][None, None, :]
        b = const_ref[0, 1][None, None, :]
        d = const_ref[0, 2][None, None, :]
        dx_ref[0] = (a * cf + b * xf + d).astype(dx_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "epsilon", "tile_rows", "interpret")
)
def group_norm_bwd_pallas(
    x: jnp.ndarray,
    ct: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    num_groups: int,
    epsilon: float = 1e-6,
    tile_rows: int = 0,
    interpret: bool = False,
):
    """GroupNorm VJP on TPU: returns ``(dx, dscale, dbias)``.

    Same strip layout as the forward kernel. NOT dispatched by
    ``models.layers.GroupNorm`` — the round-3 re-measurement showed the
    XLA formulation composes at its isolated ~roofline cost in both
    directions (BASELINE.md round-3 model-path findings), so the layers
    use plain autodiff and this kernel is kept as a measured alternative
    for locally-attached-TPU services (parity vs ``jax.vjp`` of the XLA
    reference is tested in interpret mode).
    """
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    if x.ndim == 3:
        x = x[:, :, None, :]
        ct = ct[:, :, None, :]
    elif x.ndim != 4:
        raise ValueError(f"expected 3D/4D activations, got {x.shape}")
    _, H, W, _ = x.shape

    TH = tile_rows
    if not TH:
        c_eff = max(C, 128)
        # Two VMEM-resident strips (x and ct) per step: half the forward's
        # row budget.
        TH = max(8, min(H, (4 * 1024 * 1024) // max(1, W * c_eff * 2)))
        TH = 1 << (TH.bit_length() - 1)
    n_h = -(-H // TH)
    H_pad = n_h * TH
    if H_pad != H:
        pad = ((0, 0), (0, H_pad - H), (0, 0), (0, 0))
        x = jnp.pad(x, pad)
        ct = jnp.pad(ct, pad)

    n = H * W * (C // num_groups)

    dx, _, _, dg_b, db_b = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_groups=num_groups, eps=epsilon, n=float(n)
        ),
        grid=(B, 2, n_h),
        in_specs=[
            pl.BlockSpec(
                (1, TH, W, C), lambda b, p, h: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TH, W, C), lambda b, p, h: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, C), lambda b, p, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, TH, W, C), lambda b, p, h: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 4, C), lambda b, p, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C), lambda b, p, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, p, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, p, h: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H_pad, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 4, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, ct, scale[None, :])

    dx = dx[:, :H].reshape(orig_shape)
    dscale = jnp.sum(dg_b[:, 0], axis=0)
    dbias = jnp.sum(db_b[:, 0], axis=0)
    return dx, dscale, dbias
