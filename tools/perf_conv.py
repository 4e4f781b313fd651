#!/usr/bin/env python
"""Conv formulation probes for the U-Net roofline push (round 3).

Questions this answers on the real TPU (in-jit differencing; params as
jit arguments — BASELINE.md device-closure trap):

1. How does a 3x3 conv's cost scale with channel width at 1024^2? If
   C=32 costs like C=128, the MXU is padding the channel dims and a
   space-to-depth reformulation (4x channels at 1/4 spatial) wins.
2. What does the equivalent space-to-depth conv cost (3x3 kernel,
   4C channels, half resolution — 4x the MACs of the original at full
   MXU utilization)?
3. Input dtype: does feeding f32 (cast inside) vs bf16 matter at L0?

Usage: python tools/perf_conv.py [scale s2d dtype]
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

B = int(os.environ.get("PERF_B", "8"))
TS = int(os.environ.get("PERF_TS", "1024"))


def time_loop_p(fn, params, x, k=8):
    def make_loop(K):
        @jax.jit
        def loop(params, images):
            def body(i, acc):
                pert = images + (i % 2).astype(images.dtype)
                return acc + fn(params, pert)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        return loop

    loop_k, loop_1 = make_loop(k), make_loop(1)
    np.asarray(loop_k(params, x)), np.asarray(loop_1(params, x))
    t0 = time.perf_counter()
    np.asarray(loop_k(params, x))
    t_k = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(loop_1(params, x))
    t_1 = time.perf_counter() - t0
    return (t_k - t_1) / (k - 1)


def report(name, secs, extra=""):
    print(f"{name:44s} {secs * 1e3 / B:8.3f} ms/tile  {secs * 1e3:8.2f} ms/batch {extra}")
    sys.stdout.flush()


def main():
    want = set(sys.argv[1:])

    def on(name):
        return not want or any(w in name for w in want)

    rng = jax.random.key(0)

    if on("scale"):
        # Channel-width scaling of a single 3x3 conv at fixed spatial size.
        for C in (16, 32, 64, 128):
            conv = nn.Conv(C, (3, 3), padding="SAME", dtype=jnp.bfloat16)
            xi = jax.device_put(
                np.random.default_rng(1)
                .random((B, TS, TS, C), np.float32)
                .astype(jnp.bfloat16)
            )
            p = conv.init(rng, jnp.zeros((1, 32, 32, C), jnp.bfloat16))

            def fwd(pp, im):
                return jnp.sum(conv.apply(pp, im).astype(jnp.float32))

            t = time_loop_p(fwd, p, xi)
            macs = 9 * C * C * TS * TS * B
            eff = macs / t / 98.5e12 * 100  # % of v5e bf16 peak
            report(f"conv3x3 {C}->{C} @{TS} bf16-in", t, f"({eff:4.1f}% MXU)")

    if on("s2d"):
        # The space-to-depth equivalent of conv3x3 32->32 @1024: a 3x3 conv
        # with 128 channels at 512^2 (4x the MACs, full lane width).
        C4, TS2 = 128, TS // 2
        conv = nn.Conv(C4, (3, 3), padding="SAME", dtype=jnp.bfloat16)
        xi = jax.device_put(
            np.random.default_rng(2)
            .random((B, TS2, TS2, C4), np.float32)
            .astype(jnp.bfloat16)
        )
        p = conv.init(rng, jnp.zeros((1, 32, 32, C4), jnp.bfloat16))

        def fwd(pp, im):
            return jnp.sum(conv.apply(pp, im).astype(jnp.float32))

        t = time_loop_p(fwd, p, xi)
        report(f"s2d-equiv conv3x3 128->128 @{TS2}", t)

        # And the full round trip incl. the S2D/D2S reshapes at bf16.
        def fwd_rt(pp, im):
            Bq, H, W, C = im.shape
            y = conv.apply(pp, im)
            # D2S then S2D back — the layout-change cost bound.
            y = y.reshape(Bq, H, W, 2, 2, C // 4).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(Bq, H * 2, W * 2, C // 4)
            y = y.reshape(Bq, H, 2, W, 2, C // 4).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(Bq, H, W, C)
            return jnp.sum(y.astype(jnp.float32))

        t = time_loop_p(fwd_rt, p, xi)
        report(f"s2d-equiv + d2s/s2d round trip @{TS2}", t)

    if on("dtype"):
        for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            conv = nn.Conv(32, (3, 3), padding="SAME", dtype=jnp.bfloat16)
            xi = jax.device_put(
                np.random.default_rng(3).random((B, TS, TS, 32), np.float32).astype(dt)
            )
            p = conv.init(rng, jnp.zeros((1, 32, 32, 32), jnp.bfloat16))

            def fwd(pp, im):
                return jnp.sum(conv.apply(pp, im).astype(jnp.float32))

            t = time_loop_p(fwd, p, xi)
            report(f"conv3x3 32->32 @{TS} {name}-in", t)


if __name__ == "__main__":
    main()
