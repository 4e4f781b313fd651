#!/usr/bin/env python
"""Localize the fused DeviceTiledInference program's device cost.

The round-4 row-packed upload moved tile extraction on-device; the first
e2e run after it measured semseg steady 4.9 s vs 3.3-3.7 pre-fusion with
fetch=360 ms/chunk. This probe times the fused program's components on
the production semseg shapes (32 vignettes ~90 px, 256-tiles, batch 64)
with the in-jit K-vs-1 differencing harness (BASELINE.md: wall timing
through the tunnel is unusable; best-of-4 per side strips the
fetch-latency tail):

  extract   row-packed buffer -> (Ncap, ts, ts) tiles (the NEW stage)
  forward   U-Net over the Ncap tiles (lax.map over bs slabs)
  blend     canvas accumulation fori_loop
  measure   fused per-channel segment measurement

Usage: python tools/perf_rowpack.py [--ts 256] [--n 32]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, args, K=8, best_of=4):
    """In-jit K-vs-1 differencing; returns seconds per call."""

    def loop(k, args):
        def body(i, carry):
            out = fn(*args)
            # fold a data dependence so XLA can't hoist the iteration
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    jl = jax.jit(loop, static_argnames=("k",))

    def run(k):
        best = float("inf")
        for _ in range(best_of):
            t0 = time.perf_counter()
            np.asarray(jl(k, args))
            best = min(best, time.perf_counter() - t0)
        return best

    run(1)
    run(K)  # warm both executables
    t1, tk = run(1), run(K)
    return (tk - t1) / (K - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ts", type=int, default=256)
    ap.add_argument("--stride", type=int, default=192)
    ap.add_argument("--n", type=int, default=32, help="objects per chunk")
    ap.add_argument("--size", type=int, default=90, help="vignette px")
    ap.add_argument("--bs", type=int, default=64)
    args = ap.parse_args()

    ts, n, sz, bs = args.ts, args.n, args.size, args.bs
    rng = np.random.default_rng(0)

    # --- chunk geometry exactly like _run_chunk's fused path ----------
    from maze_image_processing_pipeline_tpu.common import round_ladder

    offs = [i * sz for i in range(n)]
    jobs = [(bi, 0, 0, offs[bi], sz) for bi in range(n)]  # single-tile
    N = len(jobs)
    Ncap = bs * round_ladder(-(-N // bs))
    jobs = jobs + [(0, 0, 0, 0, 0)] * (Ncap - N)
    rows_needed = offs[-1] + max(sz, ts)
    S_cap = round_ladder(rows_needed)
    Wp = 128
    rows = np.asarray(rng.integers(0, 255, (S_cap, Wp)), np.uint8)
    tb = np.asarray([j[0] for j in jobs], np.int32)
    ty = np.asarray([j[1] for j in jobs], np.int32)
    tx = np.asarray([j[2] for j in jobs], np.int32)
    toff = np.asarray([j[3] for j in jobs], np.int32)
    hlim = np.asarray([j[4] for j in jobs], np.int32)
    print(f"chunk: N={N} Ncap={Ncap} S_cap={S_cap} Wp={Wp} ts={ts}")

    # --- extract (the new stage) ---------------------------------------
    def extract(rows, tx, toff, hlim):
        Ws = min(ts, rows.shape[1])
        sizes = (ts, Ws)
        tiles0 = jnp.zeros((Ncap, ts, ts), rows.dtype)
        ridx = jnp.arange(ts, dtype=jnp.int32)

        def body(j, tiles):
            src = jax.lax.dynamic_slice(rows, (toff[j], tx[j]), sizes)
            valid = (ridx < hlim[j]).reshape((ts, 1))
            src = jnp.where(valid, src, jnp.zeros((), rows.dtype))
            return jax.lax.dynamic_update_slice(tiles, src[None], (j, 0, 0))

        return jax.lax.fori_loop(0, Ncap, body, tiles0)

    dt = timed(extract, (rows, tx, toff, hlim))
    print(f"extract u8:          {dt * 1e3:8.2f} ms/chunk")

    # f32 variant (cast rows once, extract in f32 tiling)
    def extract_f32(rows, tx, toff, hlim):
        return extract_generic(rows.astype(jnp.float32), tx, toff, hlim)

    def extract_generic(rows_c, tx, toff, hlim):
        Ws = min(ts, rows_c.shape[1])
        sizes = (ts, Ws)
        tiles0 = jnp.zeros((Ncap, ts, ts), rows_c.dtype)
        ridx = jnp.arange(ts, dtype=jnp.int32)

        def body(j, tiles):
            src = jax.lax.dynamic_slice(rows_c, (toff[j], tx[j]), sizes)
            valid = (ridx < hlim[j]).reshape((ts, 1))
            src = jnp.where(valid, src, jnp.zeros((), rows_c.dtype))
            return jax.lax.dynamic_update_slice(tiles, src[None], (j, 0, 0))

        return jax.lax.fori_loop(0, Ncap, body, tiles0)

    dt = timed(extract_f32, (rows, tx, toff, hlim))
    print(f"extract f32-cast:    {dt * 1e3:8.2f} ms/chunk")

    # --- forward over Ncap tiles ---------------------------------------
    from maze_image_processing_pipeline_tpu.models import UNet

    module = UNet(out_channels=2, base_features=32, depth=4, dtype=jnp.bfloat16)
    params = jax.device_put(
        module.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    )
    tiles_np = np.asarray(
        rng.integers(0, 255, (Ncap, ts, ts)), np.uint8
    )

    def fwd(params, tiles):
        def pre(x):
            x = x[..., None]
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
            return x.astype(jnp.float32) / 255.0

        def one(x):
            return jax.nn.sigmoid(module.apply(params, pre(x))).astype(
                jnp.float32
            )

        xs = tiles.reshape((Ncap // bs, bs) + tiles.shape[1:])
        return jax.lax.map(one, xs)

    dt = timed(fwd, (params, tiles_np), K=4)
    print(f"forward {Ncap}x{ts}^2:  {dt * 1e3:8.2f} ms/chunk")

    # --- blend + measure (existing, for scale) --------------------------
    from maze_image_processing_pipeline_tpu.models.inference import (
        _build_tiled_blend,
    )

    # two-program blend variant (pred chunks in) times blend+measure only
    Hq = Wq = 128
    preds = np.asarray(rng.random((Ncap, ts, ts, 2)), np.float32)
    hs = np.full((n,), sz, np.int32)
    ws = np.full((n,), sz, np.int32)
    blend = _build_tiled_blend(
        256, 256, Hq, Wq, ts, np.float16, measure=((True, True), 32, 64)
    )

    def blend_fn(pred, tb, ty, tx, hs, ws):
        return blend(
            (pred,), tb, ty, tx, np.asarray(N, np.int32), hs, ws, Bo=n
        )

    dt = timed(blend_fn, (preds, tb, ty, tx, hs, ws), K=4)
    print(f"blend+measure:       {dt * 1e3:8.2f} ms/chunk")


if __name__ == "__main__":
    main()
