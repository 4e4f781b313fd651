"""Props-kernel perf probes: isolate + attack the histogram contraction.

The fused props stage (ops/regionprops_fused.py) is the second-largest
device stage in the segmentation chain. Its per-region 256-bin histogram
is an einsum of two one-hots — (B,P,R) labels vs (B,P,256) bins — whose
MATERIALIZED operands dominate HBM traffic if XLA lowers them to memory.
Experiments here quantify that and try cheaper formulations:

* ``nohist``   — props with compute_histogram=False (isolates hist cost)
* ``hist``     — current bf16 formulation, hist_row_chunk sweep
* ``hist_i8``  — int8 one-hots (halves operand bytes; v5e MXU runs
  s8×s8→s32 at 2× bf16 rate)
* ``hist_fg``  — foreground-compacted: histogram only the top-K occupied
  ROWS (exactness guard: K chosen ≥ max occupied rows, asserted on data)

Usage: python tools/perf_props.py [exp ...]
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, MIN_AREA, NUM_SEGMENTS, RADIUS, THRESHOLD, make_frames  # noqa: E402
from tools.perf_lab import time_loop  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from maze_image_processing_pipeline_tpu.ops import label as lm
    from maze_image_processing_pipeline_tpu.ops import morphology as morph
    from maze_image_processing_pipeline_tpu.ops.regionprops_fused import (
        regionprops_fused,
    )

    which = set(sys.argv[1:])

    def want(name):
        return not which or name in which

    frames = make_frames(BATCH)
    x = jax.device_put(frames)
    print(f"backend={jax.default_backend()} batch={frames.shape}", flush=True)

    @jax.jit
    def to_labels(images):
        mask = images > THRESHOLD
        mask = morph.binary_opening(mask, RADIUS)
        mask = morph.binary_closing(mask, RADIUS)
        labels, _ = lm.label(mask, connectivity=2)
        labels, _ = lm.remove_small_objects(labels, MIN_AREA, num_segments=256)
        return labels

    labels_fixed = jax.device_put(np.asarray(to_labels(x)))
    occ_rows = int((np.asarray(labels_fixed) > 0).any(axis=2).sum(axis=1).max())
    print(f"max occupied rows/frame: {occ_rows}", flush=True)

    def report(name, t):
        print(f"{name:24s} {t * 1e3:10.2f} ms/batch", flush=True)

    if want("nohist"):

        def f(im, labels):
            p = regionprops_fused(
                labels, im, num_segments=NUM_SEGMENTS, compute_histogram=False
            )
            return jnp.sum(p["area"]) + jnp.sum(p["intensity_mean"])

        report("nohist", time_loop(f, x, aux=labels_fixed))

    for chunk in (64, 128, 256, 512):
        if want(f"hist{chunk}"):

            def f(im, labels, chunk=chunk):
                p = regionprops_fused(
                    labels,
                    im,
                    num_segments=NUM_SEGMENTS,
                    hist_row_chunk=chunk,
                )
                return jnp.sum(p["area"]) + jnp.sum(p["histogram"])

            report(f"hist{chunk}", time_loop(f, x, aux=labels_fixed))

    # --- histogram-only formulations (labels fixed, intensity perturbed) ---
    H, W = frames.shape[-2:]
    R = NUM_SEGMENTS
    r_ids = jnp.arange(R, dtype=jnp.int32)
    bin_range = jnp.arange(256, dtype=jnp.int32)

    def hist_only(im, lab, dtype, chunk):
        bins_i = jnp.clip(im.astype(jnp.float32), 0, 255).astype(jnp.int32)
        n_chunks = -(-H // chunk)
        B = lab.shape[0]
        lab_c = lab.reshape(B, n_chunks, chunk * W)
        bin_c = bins_i.reshape(B, n_chunks, chunk * W)

        def body(acc, xs):
            lc, bc = xs
            l_oh = (lc[..., None] == r_ids).astype(dtype)
            b_oh = (bc[..., None] == bin_range).astype(dtype)
            out = jnp.einsum(
                "bpr,bpc->brc",
                l_oh,
                b_oh,
                preferred_element_type=jnp.float32
                if dtype == jnp.bfloat16
                else jnp.int32,
            )
            return acc + out.astype(jnp.float32), None

        hist0 = jnp.zeros((B, R, 256), jnp.float32)
        hist, _ = jax.lax.scan(
            body, hist0, (jnp.moveaxis(lab_c, 1, 0), jnp.moveaxis(bin_c, 1, 0))
        )
        return jnp.sum(hist)

    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "i8")):
        for chunk in (128, 256):
            name = f"histonly_{tag}_{chunk}"
            if want(name):
                report(
                    name,
                    time_loop(
                        lambda im, lab, d=dtype, c=chunk: hist_only(im, lab, d, c),
                        x,
                        aux=labels_fixed,
                    ),
                )

    # Pallas MXU histogram: one-hots built in VMEM, never in HBM.
    for th in (8, 16):
        name = f"histpallas{th}"
        if want(name):
            from attic.pallas_hist import (
                region_histogram_pallas,
            )

            def f(im, lab, th=th):
                return jnp.sum(
                    region_histogram_pallas(
                        lab, im, num_segments=NUM_SEGMENTS, tile_rows=th
                    )
                )

            def f_skip(im, lab, th=th):
                return jnp.sum(
                    region_histogram_pallas(
                        lab, im, num_segments=NUM_SEGMENTS, tile_rows=th,
                        skip_empty=True,
                    )
                )

            try:
                report(name, time_loop(f, x, aux=labels_fixed))
                report(name + "skip", time_loop(f_skip, x, aux=labels_fixed))
            except Exception as e:
                print(f"{name} FAILED: {str(e)[:200]}", flush=True)

    # remove_small_objects: one-hot relabel (current) vs per-pixel table
    # gather. The one-hot costs R=256 compare+select per pixel; the gather
    # is one dynamic index into a 256-entry table (regionprops_fused already
    # gathers per-pixel centroids this way at acceptable cost).
    if want("rsmall_onehot") or want("rsmall_gather"):
        raw_labels = jax.device_put(
            np.asarray(
                jax.jit(
                    lambda im: lm.label(
                        morph.binary_closing(
                            morph.binary_opening(im > THRESHOLD, RADIUS), RADIUS
                        ),
                        connectivity=2,
                    )[0]
                )(x)
            )
        )

        if want("rsmall_onehot"):

            def f(im, raw):
                lab = raw + (im[0, 0, 0] % 2).astype(jnp.int32) * 0
                lab2, n = lm.remove_small_objects(lab, MIN_AREA, num_segments=256)
                return jnp.sum(n).astype(jnp.float32) + lab2[0, 0, 0].astype(
                    jnp.float32
                )

            report("rsmall_onehot", time_loop(f, x, aux=raw_labels))

        if want("rsmall_gather"):

            def f(im, raw):
                lab = raw + (im[0, 0, 0] % 2).astype(jnp.int32) * 0
                areas = lm.region_areas(lab, 256)
                keep = areas >= MIN_AREA
                keep = keep.at[..., 0].set(False)
                new_ids = jnp.cumsum(keep.astype(jnp.int32), axis=-1) * keep
                B, Hh, Ww = lab.shape
                lab2 = jnp.take_along_axis(
                    new_ids, lab.reshape(B, Hh * Ww), axis=-1
                ).reshape(B, Hh, Ww)
                n = jnp.sum(keep, axis=-1).astype(jnp.int32)
                return jnp.sum(n).astype(jnp.float32) + lab2[0, 0, 0].astype(
                    jnp.float32
                )

            report("rsmall_gather", time_loop(f, x, aux=raw_labels))

    # Foreground row compaction: contract only the K most-occupied rows.
    for K in (256, 512):
        name = f"histfg_{K}"
        if want(name):
            if occ_rows > K:
                print(f"{name}: SKIP (occ_rows {occ_rows} > K)", flush=True)
                continue

            def f(im, lab, K=K):
                bins_i = jnp.clip(im.astype(jnp.float32), 0, 255).astype(jnp.int32)
                occ = (lab > 0).any(axis=2)  # (B, H)
                # top-K occupied rows per frame (order irrelevant for a sum)
                _, idx = jax.lax.top_k(occ.astype(jnp.int32) * 2 - 1, K)
                lab_k = jnp.take_along_axis(lab, idx[..., None], axis=1)
                bin_k = jnp.take_along_axis(bins_i, idx[..., None], axis=1)
                # zero out rows that were actually unoccupied (label 0 rows
                # only pollute r=0, but keep it exact anyway)
                keep = jnp.take_along_axis(occ, idx, axis=1)
                lab_k = jnp.where(keep[..., None], lab_k, 0)
                B = lab.shape[0]
                l_oh = (lab_k.reshape(B, K * W)[..., None] == r_ids).astype(
                    jnp.bfloat16
                )
                b_oh = (bin_k.reshape(B, K * W)[..., None] == bin_range).astype(
                    jnp.bfloat16
                )
                hist = jnp.einsum(
                    "bpr,bpc->brc", l_oh, b_oh, preferred_element_type=jnp.float32
                )
                return jnp.sum(hist)

            report(name, time_loop(f, x))


if __name__ == "__main__":
    main()
