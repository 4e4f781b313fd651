#!/usr/bin/env python
"""Conv formulation probes for U-Net levels 1-2 + the classifier stem
(round-4 verdict item 3: chase the MXU ladder beyond level 0).

Cost model from the round-3 ladder (tools/perf_conv.py: 3x3 conv MXU
utilization 5/10/35/92% at C=16/32/64/128, 1024^2): a 2D phase-packing
pays 4x MACs, so it only wins when utilization < ~25%; a 1D (width-only)
packing pays 2x MACs (3x3 kernel, 2C channels, half width) and wins when
utilization < ~50%. Level 1 runs C=64 at 35% -> 2D predicted to LOSE,
1D predicted ~1.3x WIN. This probe measures both proxies exactly
(phase-packed kernels have the same shapes as plain convs, so a plain
conv at the packed geometry is a cost-exact stand-in).

Usage: python tools/perf_level.py [unet|clf|all]
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

import jax.numpy as jnp  # noqa: E402


def time_loop(fn, params, x, k=8, reps=4):
    """K-vs-1 in-jit differencing, best-of-``reps`` on each side: a single
    fetch through this tunnel carries ±100 ms of latency noise in degraded
    windows, which the (t_k - t_1)/(k-1) difference amplifies far past the
    ~1 ms conv signals (two consecutive runs of the same probe measured
    0.43 vs 6.86 ms). The per-side min strips the latency tail."""

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

    def best(loop):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(params, x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(loop_k) - best(loop_1)) / (k - 1)


def conv_probe(name, B, H, W, Cin, Cout, kh=3, kw=3, stride=1, k=8):
    """One 3x3(ish) SAME conv, bf16, kernel as a jit argument."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, Cin)), jnp.bfloat16)
    Wk = jnp.asarray(rng.random((kh, kw, Cin, Cout)) * 0.1, jnp.bfloat16)

    def fwd(Wk, im):
        y = jax.lax.conv_general_dilated(
            im,
            Wk,
            window_strides=(stride, stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y.astype(jnp.float32))

    dt = time_loop(fwd, Wk, x, k=k)
    macs = (H // stride) * (W // stride) * kh * kw * Cin * Cout * B
    # v5e bf16 peak ~394 TFLOP/s -> ~197e12 MAC/s
    util = macs / dt / 197e12
    print(f"{name:42s} {dt * 1e3:8.2f} ms  {macs / 1e9:7.1f} GMAC  "
          f"util~{util * 100:5.1f}%")
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")

    if which in ("unet", "all"):
        print("== U-Net level 1 (1024^2 input, b8): C=64 convs at 512^2 ==")
        base = conv_probe("L1 baseline 64->64 @512^2", 8, 512, 512, 64, 64)
        p2d = conv_probe("L1 2D-packed proxy 256->256 @256^2", 8, 256, 256, 256, 256)
        p1d = conv_probe("L1 1D-packed proxy 128->128 @512x256", 8, 512, 256, 128, 128)
        print(f"   -> 2D {base / p2d:.2f}x, 1D {base / p1d:.2f}x vs baseline")

        print("== U-Net level 2: C=128 convs at 256^2 ==")
        base = conv_probe("L2 baseline 128->128 @256^2", 8, 256, 256, 128, 128)
        p1d = conv_probe("L2 1D-packed proxy 256->256 @256x128", 8, 256, 128, 256, 256)
        print(f"   -> 1D {base / p1d:.2f}x vs baseline")

        print("== U-Net level 0 reference points (sanity vs round-3) ==")
        base = conv_probe("L0 baseline 32->32 @1024^2", 8, 1024, 1024, 32, 32)
        p2d = conv_probe("L0 2D-packed proxy 128->128 @512^2", 8, 512, 512, 128, 128)
        print(f"   -> 2D {base / p2d:.2f}x vs baseline")

        print("== L1 up-conv (2x2) and skip-concat block widths ==")
        conv_probe("L1 2x2 up-conv 128->64 @512^2", 8, 512, 512, 128, 64, kh=2, kw=2)
        conv_probe("L1 decoder 128->64 @512^2", 8, 512, 512, 128, 64)

    if which in ("l1x",):
        # The full L1 conv set (encoder first/second, decoder concat,
        # decoder second, 2x2 up-conv) and their exact 1D-packed proxies:
        # decides whether the 1.28x on the 64->64 conv survives across the
        # level's real mix before implementing the packing.
        print("== L1 full conv set: baseline vs 1D-packed proxies (b8) ==")
        pairs = [
            ("enc1 32->64", (8, 512, 512, 32, 64), (8, 512, 256, 64, 128)),
            ("enc2/dec2 64->64", (8, 512, 512, 64, 64), (8, 512, 256, 128, 128)),
            ("dec concat 128->64", (8, 512, 512, 128, 64), (8, 512, 256, 256, 128)),
        ]
        tot_b = tot_p = 0.0
        for name, b, p in pairs:
            tb = conv_probe(f"L1 {name} base", *b)
            tp = conv_probe(f"L1 {name} 1D proxy", *p)
            print(f"   -> {tb / tp:.2f}x")
            tot_b, tot_p = tot_b + tb, tot_p + tp
        tb = conv_probe("L1 up-conv 2x2 128->64 base", 8, 512, 512, 128, 64, kh=2, kw=2)
        # 1D-packed 2x2 up-conv: kw 2 -> packed tile width 2.
        tp = conv_probe("L1 up-conv 1D proxy 256->128", 8, 512, 256, 256, 128, kh=2, kw=2)
        print(f"   -> {tb / tp:.2f}x")
        tot_b, tot_p = tot_b + tb, tot_p + tp
        print(f"L1 conv set total: base {tot_b * 1e3:.2f} ms vs 1D-packed "
              f"{tot_p * 1e3:.2f} ms -> {tot_b / tot_p:.2f}x "
              f"(excl. pack/unpack transposes)")

    if which in ("clf", "all"):
        print("== Classifier stem (256^2 input, b256) ==")
        conv_probe("stem stride-2 3->32 @256^2", 256, 256, 256, 3, 32, stride=2, k=4)
        base = conv_probe("stem 32->32 @128^2 b256", 256, 128, 128, 32, 32, k=4)
        p2d = conv_probe("stem 2D-packed proxy 128->128 @64^2 b256",
                         256, 64, 64, 128, 128, k=4)
        p1d = conv_probe("stem 1D-packed proxy 64->64 @128x64 b256",
                         256, 128, 64, 64, 64, k=4)
        print(f"   -> 2D {base / p2d:.2f}x, 1D {base / p1d:.2f}x vs baseline")
        print("== Classifier stage 2 (64ch @64^2 b256) ==")
        base = conv_probe("clf 64->64 @64^2 b256", 256, 64, 64, 64, 64, k=4)
        p1d = conv_probe("clf 1D-packed proxy 128->128 @64x32 b256",
                         256, 64, 32, 128, 128, k=4)
        print(f"   -> 1D {base / p1d:.2f}x vs baseline")


if __name__ == "__main__":
    main()
