#!/usr/bin/env python
"""GroupNorm composition probes on the real TPU (round-3 roofline push).

Round-3 per-level profile (tools/perf_unet.py, BASELINE.md): the full
1024²-tile U-Net forward is 31.6 ms/tile with norm vs 10.4 norm-free —
GroupNorm composed with convs costs ~3 ms/tile per instance at L0 while
its HBM roofline is ~0.25 ms/tile. Both the Pallas kernel and the XLA
lane-preserving formulation keep C=32 on the 128-lane axis (4× lane
padding). This probe measures a LANE-PACKED formulation: reshape
(B, H, W, C) → (B, H, W/k, k·C) with k = 128/C (a contiguity-preserving
reshape), reduce to (B, 128) lane sums, and recover group statistics via
a (128 → G) one-hot contraction keyed by lane%C.

Usage: python tools/perf_gn.py [iso|block|full ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maze_image_processing_pipeline_tpu.models.layers import (  # noqa: E402
    _group_norm_ref,
)
from tools.perf_unet import B, TS, report, time_loop_p  # noqa: E402


def group_norm_packed(x, scale, bias, num_groups, epsilon):
    """Lane-packed GroupNorm: full 128-lane utilization for C < 128."""
    Bq, H, W, C = x.shape
    G = num_groups
    k = 128 // C if (C < 128 and 128 % C == 0 and W % (128 // C) == 0) else 1
    L = k * C
    xp = x.reshape(Bq, H, W // k, L)
    xf = xp.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))  # (B, L)
    s2 = jnp.sum(xf * xf, axis=(1, 2))
    lane_group = (np.arange(L) % C) // (C // G)
    M = (lane_group[:, None] == np.arange(G)[None, :]).astype(np.float32)
    n = H * W * (C // G)
    gs1 = s1 @ M  # (B, G)
    gs2 = s2 @ M
    mean_g = gs1 / n
    var_g = jnp.maximum(gs2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + epsilon)
    mean_l = mean_g @ M.T  # (B, L)
    rstd_l = rstd_g @ M.T
    scale_l = jnp.tile(scale, k)
    bias_l = jnp.tile(bias, k)
    a = rstd_l * scale_l[None, :]
    b = bias_l[None, :] - mean_l * a
    y = xf * a[:, None, None, :] + b[:, None, None, :]
    return y.reshape(Bq, H, W, C).astype(x.dtype)


class BlockVar(nn.Module):
    """ConvBlock with a selectable GN implementation."""

    features: int
    gn: str  # none | ref | packed | pallas

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding="SAME", dtype=jnp.bfloat16
            )(x)
            C = x.shape[-1]
            if self.gn != "none":
                scale = self.param(
                    f"s{_}", nn.initializers.ones, (C,), jnp.float32
                )
                bias = self.param(
                    f"b{_}", nn.initializers.zeros, (C,), jnp.float32
                )
                if self.gn == "ref":
                    x = _group_norm_ref(x, scale, bias, 8, 1e-6)
                elif self.gn == "packed":
                    x = group_norm_packed(x, scale, bias, 8, 1e-6)
                elif self.gn == "pallas":
                    from attic.pallas_norm import (
                        group_norm_pallas,
                    )

                    x = group_norm_pallas(
                        x, scale, bias, num_groups=8, epsilon=1e-6
                    )
            x = nn.relu(x)
        return x


def main():
    want = set(sys.argv[1:])

    def on(name):
        return not want or any(w in name for w in want)

    rng = jax.random.key(0)

    if on("iso"):
        xi = jax.device_put(
            np.random.default_rng(0)
            .random((B, TS, TS, 32), np.float32)
            .astype(jnp.bfloat16)
        )
        scale = jnp.ones((32,), jnp.float32)
        bias = jnp.zeros((32,), jnp.float32)

        def ref_fn(p, x):
            return jnp.sum(
                _group_norm_ref(x, p[0], p[1], 8, 1e-6).astype(jnp.float32)
            )

        def packed_fn(p, x):
            return jnp.sum(
                group_norm_packed(x, p[0], p[1], 8, 1e-6).astype(jnp.float32)
            )

        def pallas_fn(p, x):
            from attic.pallas_norm import (
                group_norm_pallas,
            )

            return jnp.sum(
                group_norm_pallas(
                    x, p[0], p[1], num_groups=8, epsilon=1e-6
                ).astype(jnp.float32)
            )

        for name, fn in (("ref", ref_fn), ("packed", packed_fn), ("pallas", pallas_fn)):
            t = time_loop_p(fn, (scale, bias), xi)
            report(f"gn-iso {name} c=32 @{TS}", t)

    if on("block"):
        xi = jax.device_put(
            np.random.default_rng(1).random((B, TS, TS, 3), np.float32)
        )
        for gn in ("none", "ref", "packed", "pallas"):
            blk = BlockVar(32, gn)
            p = blk.init(rng, jnp.zeros((1, 64, 64, 3)))

            def fwd(pp, im):
                return jnp.sum(blk.apply(pp, im).astype(jnp.float32))

            t = time_loop_p(fwd, p, xi)
            report(f"convblock L0 gn={gn}", t)


if __name__ == "__main__":
    main()
