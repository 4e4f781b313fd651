#!/usr/bin/env python
"""Per-stage U-Net forward profiling on the real TPU (in-jit differencing).

Times the flagship 1024² segmentation forward (batch 8, bf16) and its
components — per-level ConvBlocks, GroupNorm, upsampling — to localize the
gap to the ~7 ms/tile roofline (ROADMAP round-2 finding: 31.4 ms/tile with
norm). All timings use the K-vs-1 fori_loop differencing harness
(block_until_ready lies on this host; BASELINE.md) and pass params as jit
ARGUMENTS (closed-over device arrays are fetched at every lowering through
the tunnel).

Usage: python tools/perf_unet.py [component ...]
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

from maze_image_processing_pipeline_tpu.models.unet import ConvBlock, UNet  # noqa: E402

B = int(os.environ.get("PERF_B", "8"))
TS = int(os.environ.get("PERF_TS", "1024"))


def time_loop_p(fn, params, x, k=8, aux=None):
    """Per-iteration seconds of fn(params, x[, aux]) inside one jitted
    fori_loop. ``aux`` (e.g. a skip tensor) rides as a jit ARGUMENT —
    closing over a device array embeds it as an HLO constant fetched back
    at every lowering (BASELINE.md device-closure trap)."""

    def make_loop(K):
        @jax.jit
        def loop(params, images, aux):
            def body(i, acc):
                pert = images + (i % 2).astype(images.dtype)
                return acc + (
                    fn(params, pert) if aux is None else fn(params, pert, aux)
                )

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        return loop

    loop_k, loop_1 = make_loop(k), make_loop(1)
    np.asarray(loop_k(params, x, aux)), np.asarray(loop_1(params, x, aux))
    # Best-of-4 per side: strips the ±100 ms tunnel fetch-latency tail
    # that single-sample differencing amplifies (perf_level.py finding).
    def best(loop):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(loop(params, x, aux))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(loop_k) - best(loop_1)) / (k - 1)


def report(name, secs, extra=""):
    print(f"{name:44s} {secs * 1e3 / B:8.3f} ms/tile  {secs * 1e3:8.2f} ms/batch {extra}")
    sys.stdout.flush()


def main():
    want = set(sys.argv[1:])

    def on(name):
        return not want or any(w in name for w in want)

    rng = jax.random.key(0)
    x = jax.device_put(
        np.random.default_rng(0).random((B, TS, TS, 3), np.float32)
    )

    if on("full"):
        for norm in (True, False):
            net = UNet(out_channels=1, base_features=32, depth=4,
                       dtype=jnp.bfloat16, norm=norm)
            params = net.init(rng, jnp.zeros((1, 64, 64, 3)))

            def fwd(p, im):
                return jnp.sum(net.apply(p, im))

            t = time_loop_p(fwd, params, x)
            report(f"unet full norm={norm}", t)

    if on("block"):
        # Each encoder level's ConvBlock at its true resolution/width.
        for i in range(5):
            f = 32 * 2**i
            r = TS // 2**i
            cin = 3 if i == 0 else f // 2
            for norm in (True, False):
                blk = ConvBlock(f, jnp.bfloat16, norm)
                xi = jax.device_put(
                    np.random.default_rng(1).random((B, r, r, cin), np.float32)
                )
                p = blk.init(rng, jnp.zeros((1, 32, 32, cin)))

                def fwd(pp, im):
                    return jnp.sum(blk.apply(pp, im).astype(jnp.float32))

                t = time_loop_p(fwd, p, xi)
                report(f"convblock L{i} {cin}->{f} @{r} norm={norm}", t)

    if on("dec"):
        # Decoder level: upsample + 2x2 conv + concat + ConvBlock, with
        # norm on/off and a transposed-conv upsample variant (kernel 2
        # stride 2 = non-overlapping taps, 4x fewer up-conv FLOPs than
        # broadcast-upsample + 2x2 SAME conv).
        for i in range(2):  # L0/L1 dominate; deeper levels are <0.2 ms/tile
            f = 32 * 2**i
            r = TS // 2**i

            for norm in (True, False):
                for up_kind in ("bcast", "tconv"):

                    class Dec(nn.Module):
                        nrm: bool = norm
                        upk: str = up_kind
                        feat: int = f

                        @nn.compact
                        def __call__(self, lo, skip):
                            if self.upk == "tconv":
                                up = nn.ConvTranspose(
                                    self.feat, (2, 2), strides=(2, 2),
                                    dtype=jnp.bfloat16,
                                )(lo)
                            else:
                                Bq, H, W, C = lo.shape
                                up = jnp.broadcast_to(
                                    lo[:, :, None, :, None, :],
                                    (Bq, H, 2, W, 2, C),
                                ).reshape(Bq, H * 2, W * 2, C)
                                up = nn.Conv(
                                    self.feat, (2, 2), padding="SAME",
                                    dtype=jnp.bfloat16,
                                )(up)
                            cat = jnp.concatenate([skip, up], axis=-1)
                            return ConvBlock(self.feat, jnp.bfloat16, self.nrm)(cat)

                    dec = Dec()
                    lo = jax.device_put(
                        np.random.default_rng(2).random(
                            (B, r // 2, r // 2, 2 * f), np.float32
                        )
                    )
                    skip = jax.device_put(
                        np.random.default_rng(3).random((B, r, r, f), np.float32)
                    )
                    p = dec.init(
                        rng, jnp.zeros((1, 16, 16, 2 * f)), jnp.zeros((1, 32, 32, f))
                    )

                    def fwd(pp, im, sk):
                        return jnp.sum(dec.apply(pp, im, sk).astype(jnp.float32))

                    t = time_loop_p(fwd, p, lo, aux=skip)
                    report(f"decoder L{i} f={f} @{r} norm={norm} up={up_kind}", t)

    if on("conv1"):
        # Isolated single 3x3 convs at L0 width.
        for cin, cout in ((3, 32), (32, 32), (64, 32)):
            conv = nn.Conv(cout, (3, 3), padding="SAME", dtype=jnp.bfloat16)
            xi = jax.device_put(
                np.random.default_rng(4).random((B, TS, TS, cin), np.float32)
            )
            p = conv.init(rng, jnp.zeros((1, 32, 32, cin)))

            def fwd(pp, im):
                return jnp.sum(conv.apply(pp, im).astype(jnp.float32))

            t = time_loop_p(fwd, p, xi)
            report(f"conv3x3 {cin}->{cout} @{TS}", t)

    if on("gn"):
        from maze_image_processing_pipeline_tpu.models.layers import GroupNorm

        for c in (32, 64):
            gn = GroupNorm(num_groups=8, dtype=jnp.bfloat16)
            xi = jax.device_put(
                np.random.default_rng(5).random((B, TS, TS, c), np.float32).astype(
                    jnp.bfloat16
                )
            )
            p = gn.init(rng, jnp.zeros((1, 32, 32, c), jnp.bfloat16))

            def fwd(pp, im):
                return jnp.sum(gn.apply(pp, im).astype(jnp.float32))

            t = time_loop_p(fwd, p, xi)
            report(f"groupnorm c={c} @{TS}", t)


if __name__ == "__main__":
    main()
