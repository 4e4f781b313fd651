"""TPU perf lab: stage-level timings for the segmentation device chain.

Runs a list of named experiments on the real TPU with the in-jit
``fori_loop`` K-vs-1 differencing harness (this host's tunnel adds ~25 ms
per dispatch and ``block_until_ready`` does not reliably block — see
BASELINE.md "Hard-won platform findings").

Usage:  python tools/perf_lab.py [exp ...]
        (no args = all experiments)
"""

from __future__ import annotations

import os
import sys
import time

# The env-var route (JAX_COMPILATION_CACHE_DIR) is ignored on this host's
# TPU plugin (like JAX_PLATFORMS — see CLAUDE.md); the config API works.
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, MIN_AREA, NUM_SEGMENTS, RADIUS, THRESHOLD, make_frames  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_loop(fn, x, k=12, aux=None):
    """Per-iteration seconds of fn inside one jitted fori_loop (K vs 1).

    ``aux`` (e.g. a fixed labels array) rides as a jit ARGUMENT —
    closing the jitted loop over a device array would fetch it back to
    host at every lowering and embed it as an HLO constant (BASELINE.md
    device-closure trap).
    """

    def make_loop(K):
        def loop(images, aux):
            def body(i, acc):
                pert = images + (i % 2).astype(images.dtype)
                return acc + (fn(pert) if aux is None else fn(pert, aux))

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        return jax.jit(loop)

    loop_k, loop_1 = make_loop(k), make_loop(1)
    np.asarray(loop_k(x, aux)), np.asarray(loop_1(x, aux))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(loop_k(x, aux))
    t_k = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(loop_1(x, aux))
    t_1 = time.perf_counter() - t0
    return (t_k - t_1) / (k - 1)


def main() -> None:
    from maze_image_processing_pipeline_tpu.ops import label as lm
    from maze_image_processing_pipeline_tpu.ops import morphology as morph
    from attic.pallas_props import (
        regionprops_fused_pallas,
    )

    which = set(sys.argv[1:])

    def want(name):
        return not which or name in which

    frames = make_frames(BATCH)
    # PERF_SHAPE=2048x2560 probes the dense-haul frame extent (the loki
    # stats_fetch wait scales with the device chain at this shape).
    shape_env = os.environ.get("PERF_SHAPE")
    if shape_env:
        H, W = map(int, shape_env.lower().split("x"))
        big = make_frames(BATCH, size=max(H, W))
        frames = np.ascontiguousarray(big[:, :H, :W])
    x = jax.device_put(frames)
    print(f"backend={jax.default_backend()} batch={frames.shape}", flush=True)

    def morph_chain(images):
        mask = images > THRESHOLD
        mask = morph.binary_opening(mask, RADIUS)
        return morph.binary_closing(mask, RADIUS)

    def anchor(mask):
        """Identity Pallas copy: forces a standard layout at this point."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _copy(in_ref, out_ref):
            out_ref[:] = in_ref[:]

        B, H, W = mask.shape
        blk = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _copy,
            grid=(B,),
            in_specs=[blk],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct(mask.shape, mask.dtype),
        )(mask)

    # Precompute labels once for the props-only experiment.
    @jax.jit
    def to_labels(images):
        labels, _ = lm.label(morph_chain(images), connectivity=2)
        labels, _ = lm.remove_small_objects(labels, MIN_AREA, num_segments=256)
        return labels

    class _Printing(dict):
        def __setitem__(self, name, v):
            super().__setitem__(name, v)
            if name.endswith("fps"):
                print(f"{name:24s} {v:10.1f} frames/s", flush=True)
            else:
                print(f"{name:24s} {v * 1e3:10.2f} ms/batch", flush=True)

    results = _Printing()

    if want("morph"):
        results["morph"] = time_loop(
            lambda im: jnp.sum(morph_chain(im)).astype(jnp.float32), x
        )
    if want("morph_label"):

        def f(im):
            labels, n = lm.label(morph_chain(im), connectivity=2)
            return jnp.sum(n).astype(jnp.float32) + labels[0, 0, 0].astype(jnp.float32)

        results["morph_label"] = time_loop(f, x)
    if want("morph_anchor_label"):

        def f(im):
            labels, n = lm.label(anchor(morph_chain(im)), connectivity=2)
            return jnp.sum(n).astype(jnp.float32) + labels[0, 0, 0].astype(jnp.float32)

        results["morph_anchor_label"] = time_loop(f, x)
    if want("label_alone"):
        mask_fixed = jax.jit(morph_chain)(x)
        mask_fixed = jax.device_put(np.asarray(mask_fixed))

        def f(m):
            labels, n = lm.label(m, connectivity=2)
            return jnp.sum(n).astype(jnp.float32) + labels[0, 0, 0].astype(jnp.float32)

        results["label_alone"] = time_loop(f, mask_fixed)
    # --- interior probes of label() composed with morphology ---------------
    from maze_image_processing_pipeline_tpu.ops.label import (
        _INF,
        _horizontal_pass,
        _vertical_pass,
    )

    def lab0_of(fg):
        W = fg.shape[-1]
        lin = (
            jax.lax.broadcasted_iota(jnp.int32, fg.shape, 1) * W
            + jax.lax.broadcasted_iota(jnp.int32, fg.shape, 2)
        )
        return jnp.where(fg, lin + 1, _INF), lin

    def sweep(lab, fg):
        lab = _horizontal_pass(lab, fg)
        lab = _vertical_pass(lab, fg, 2, reverse=False)
        lab = _vertical_pass(lab, fg, 2, reverse=True)
        return _horizontal_pass(lab, fg)

    if want("morph_hpass"):

        def f(im):
            fg = morph_chain(im)
            lab0, _ = lab0_of(fg)
            return jnp.sum(_horizontal_pass(lab0, fg) % 1000).astype(jnp.float32)

        results["morph_hpass"] = time_loop(f, x)
    if want("morph_vpass"):

        def f(im):
            fg = morph_chain(im)
            lab0, _ = lab0_of(fg)
            return jnp.sum(
                _vertical_pass(lab0, fg, 2, reverse=False) % 1000
            ).astype(jnp.float32)

        results["morph_vpass"] = time_loop(f, x)
    if want("morph_sweep1"):

        def f(im):
            fg = morph_chain(im)
            lab0, _ = lab0_of(fg)
            return jnp.sum(sweep(lab0, fg) % 1000).astype(jnp.float32)

        results["morph_sweep1"] = time_loop(f, x)
    if want("morph_fix"):

        def f(im):
            fg = morph_chain(im)
            lab0, _ = lab0_of(fg)

            def cond(state):
                lab, prev, i = state
                return (i < 64) & jnp.any(lab != prev)

            def body(state):
                lab, _, i = state
                return sweep(lab, fg), lab, i + 1

            first = sweep(lab0, fg)
            lab, _, _ = jax.lax.while_loop(cond, body, (first, lab0, jnp.int32(1)))
            return jnp.sum(lab % 1000).astype(jnp.float32)

        results["morph_fix"] = time_loop(f, x)
    if want("label_alone_roll"):
        mask_fixed = jax.device_put(np.asarray(jax.jit(morph_chain)(x)))

        def f_roll(m):
            labels, n = lm.label(m, connectivity=2)
            return jnp.sum(n).astype(jnp.float32) + labels[0, 0, 0].astype(jnp.float32)

        def make_loop(K):
            def loop(m):
                def body(i, acc):
                    pert = jnp.roll(m, i % 2, axis=-1)
                    return acc + f_roll(pert)

                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            return jax.jit(loop)

        k = 12
        loop_k, loop_1 = make_loop(k), make_loop(1)
        np.asarray(loop_k(mask_fixed)), np.asarray(loop_1(mask_fixed))
        t0 = time.perf_counter()
        np.asarray(loop_k(mask_fixed))
        t_k = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(loop_1(mask_fixed))
        t_1 = time.perf_counter() - t0
        results["label_alone_roll"] = (t_k - t_1) / (k - 1)

    if want("props"):
        labels_fixed = jax.device_put(np.asarray(to_labels(x)))

        def f(im, labels):
            props = regionprops_fused_pallas(
                labels, im, num_segments=NUM_SEGMENTS
            )
            return jnp.sum(props["area"]) + jnp.sum(props["intensity_mean"])

        results["props"] = time_loop(f, x, aux=labels_fixed)
    if want("propsxla"):
        from maze_image_processing_pipeline_tpu.ops.regionprops_fused import (
            regionprops_fused,
        )

        labels_fixed = jax.device_put(np.asarray(to_labels(x)))

        def f(im, labels):
            props = regionprops_fused(
                labels, im, num_segments=NUM_SEGMENTS
            )
            return jnp.sum(props["area"]) + jnp.sum(props["intensity_mean"])

        results["propsxla"] = time_loop(f, x, aux=labels_fixed)

    for th in (8, 16, 32, 64):
        if want(f"props{th}"):
            labels_fixed = jax.device_put(np.asarray(to_labels(x)))

            def f(im, labels, th=th):
                props = regionprops_fused_pallas(
                    labels, im, num_segments=NUM_SEGMENTS, tile_rows=th
                )
                return jnp.sum(props["area"]) + jnp.sum(props["intensity_mean"])

            try:
                results[f"props{th}"] = time_loop(f, x, aux=labels_fixed)
            except Exception as e:  # e.g. scoped-VMEM OOM at large strips
                print(f"props{th} FAILED: {str(e)[:200]}", flush=True)

    if want("rsmall"):
        labels_fixed = jax.device_put(np.asarray(to_labels(x)))

        def f(im, labels):
            lab = labels + (im[0, 0, 0] % 2).astype(jnp.int32) * 0
            lab2, n = lm.remove_small_objects(lab, MIN_AREA, num_segments=256)
            return jnp.sum(n).astype(jnp.float32) + lab2[0, 0, 0].astype(jnp.float32)

        results["rsmall"] = time_loop(f, x, aux=labels_fixed)

    if want("chain"):

        def f(im):
            mask = morph_chain(im)
            labels, n = lm.label(mask, connectivity=2)
            labels, n = lm.remove_small_objects(labels, MIN_AREA, num_segments=256)
            props = regionprops_fused_pallas(labels, im, num_segments=NUM_SEGMENTS)
            return (
                jnp.sum(n).astype(jnp.float32)
                + jnp.sum(props["area"])
            )

        t = time_loop(f, x)
        results["chain"] = t
        results["chain_fps"] = BATCH / t
    if want("chainxla"):
        from maze_image_processing_pipeline_tpu.ops.regionprops_fused import (
            regionprops_fused,
        )

        def f(im):
            mask = morph_chain(im)
            labels, n = lm.label(mask, connectivity=2)
            labels, n = lm.remove_small_objects(labels, MIN_AREA, num_segments=256)
            props = regionprops_fused(labels, im, num_segments=NUM_SEGMENTS)
            return (
                jnp.sum(n).astype(jnp.float32)
                + jnp.sum(props["area"])
            )

        t = time_loop(f, x)
        results["chainxla"] = t
        results["chainxla_fps"] = BATCH / t
    if want("chainprod"):
        # The production default config: pallas_kernels=False -> XLA CCL
        # lane scans AND XLA props.
        from maze_image_processing_pipeline_tpu.ops.regionprops_fused import (
            regionprops_fused,
        )

        def f(im):
            mask = morph_chain(im)
            labels, n = lm.label(mask, connectivity=2, pallas=False)
            labels, n = lm.remove_small_objects(labels, MIN_AREA, num_segments=256)
            props = regionprops_fused(labels, im, num_segments=NUM_SEGMENTS)
            return (
                jnp.sum(n).astype(jnp.float32)
                + jnp.sum(props["area"])
            )

        t = time_loop(f, x)
        results["chainprod"] = t
        results["chainprod_fps"] = BATCH / t
    if want("chain_anchor"):

        def f(im):
            mask = anchor(morph_chain(im))
            labels, n = lm.label(mask, connectivity=2)
            labels, n = lm.remove_small_objects(labels, MIN_AREA, num_segments=256)
            props = regionprops_fused_pallas(labels, im, num_segments=NUM_SEGMENTS)
            return (
                jnp.sum(n).astype(jnp.float32)
                + jnp.sum(props["area"])
            )

        t = time_loop(f, x)
        results["chain_anchor"] = t
        results["chain_anchor_fps"] = BATCH / t



if __name__ == "__main__":
    main()
