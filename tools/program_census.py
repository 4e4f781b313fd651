#!/usr/bin/env python
"""Count distinct compiled device programs per haul profile.

Executable LOADS — one per distinct compiled program per process — are the
dominant cold cost on this host's TPU tunnel (5-800 s each; BASELINE.md
round-3 finding, and the dense profile's 2 266 s first run in round 4).
This tool runs a shrunken-but-shape-faithful haul of the requested profile
on the virtual CPU backend and counts XLA backend-compile events
(`/jax/core/compile/backend_compile_duration` fires once per program built,
including persistent-cache hits), so the per-profile program count can be
pinned by CI (tests/test_program_census.py) against a declared ceiling.

The census fixtures keep what DRIVES program variants — the crop-size
distribution (pow2 (Hb, Wb) buckets x fetch-ladder rungs x batch rungs in
DeviceTiledInference), the tiling parameters, and the frame bucket shapes —
while shrinking the frame COUNT so the run fits CI on a 1-core CPU host.
Models are tiny for the same reason: program count depends on jit call
signatures, not module width.

Usage: python tools/program_census.py [--haul standard|dense|sparse]
Prints one JSON line: {"haul": ..., "programs": N, "objects": M}.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

EVENT = "/jax/core/compile/backend_compile_duration"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--haul", choices=("standard", "dense", "sparse"),
                    default="standard")
    ap.add_argument("--workdir", default="/tmp/program_census")
    args = ap.parse_args()

    # Virtual CPU backend (the env-var route alone is ignored on this
    # host's TPU plugin — conftest recipe).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from jax import monitoring

    from fixtures import make_loki_sample, make_threshold_model_dir
    from test_predict_pipeline import make_taxonomy_files

    from maze_image_processing_pipeline_tpu.dataio import Archive, read_tsv
    from maze_image_processing_pipeline_tpu.loki.pipeline import (
        Runner as LokiRunner,
    )
    from maze_image_processing_pipeline_tpu.models import (
        ConvClassifier,
        UNet,
        save_model,
    )
    from maze_image_processing_pipeline_tpu.predict.pipeline import (
        Runner as PredictRunner,
    )

    work = pathlib.Path(f"{args.workdir}_{args.haul}")
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)

    dense = args.haul == "dense"
    sparse = args.haul == "sparse"
    # Same crop-size distributions as the bench profiles
    # (tools/bench_e2e.py), fewer frames. The dense census keeps the
    # log-uniform crop spread (what multiplies the semseg blend-program
    # variants — the round-4 pathology) but uses standard-size frames:
    # XLA:CPU materializes a one-hot intermediate of the loki chain that
    # the TPU backend fuses (~43 GB at 2048x2560), so the 2048-frame loki
    # chain programs are not countable on the virtual CPU backend.
    make_loki_sample(
        str(work / "data"),
        n_frames=3 if dense else (12 if sparse else 6),
        objects_per_frame=40 if dense else ((0, 3) if sparse else 20),
        frame_shape=(1024, 1280),
        crop_size_range=(
            ((30, 40), (380, 480)) if dense
            else (((16, 20), (48, 64)) if sparse else None)
        ),
    )
    tax_fn, csv_fn = make_taxonomy_files(work)

    # Tiny models: threshold-net for loki, shallow U-Net + classifier for
    # predict (program COUNT is architecture-size-independent).
    loki_model = make_threshold_model_dir(str(work / "thrnet"))
    semseg_dir = str(work / "semseg")
    sm = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    sp = sm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(semseg_dir, sm, sp,
               outputs={"pred": {"channel_names": ["prosoma", "oilsack"]}})
    clf_dir = str(work / "clf")
    cm = ConvClassifier(n_outputs=4, features=(4, 8), dtype=jnp.float32)
    cp = cm.init(jax.random.key(1), jnp.zeros((1, 256, 256, 3)))
    save_model(clf_dir, cm, cp, outputs={"probs": {}})

    count = [0]

    def listener(name, dur, **kw):
        if name == EVENT:
            count[0] += 1

    monitoring.register_event_duration_secs_listener(listener)

    LokiRunner._configure_and_run(
        {
            "input": {"path": str(work / "data")},
            "segmentation": {
                "jax": {
                    "model_fn": loki_model,
                    "dtype": "float32",
                    "batch_size": 16,
                    "frame_batch": 8,
                    "tile_size": 1024,
                    "tile_stride": 896,
                    "postprocess": {"min_area": 30, "closing_radius": 2},
                }
            },
            "postprocess": {},
            "output": {"target_dir": str(work / "loki_out")},
        }
    )
    archive_fn = os.path.join(str(work / "loki_out"), "LOKI_PS122-1_7.zip")
    n_objects = len(read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv"))

    PredictRunner._configure_and_run(
        {
            "input": {"path": archive_fn},
            "model": {
                "model_fn": semseg_dir,
                "dtype": "float32",
                "batch_size": 64,
                "tiling": {"size": 256, "stride": 192, "chunk_size": 32},
            },
            "save_raw_h5": True,
            # Force the device paths 'auto' would disable on CPU: the
            # census must reflect the TPU program population.
            "segmentation": {"draw": False, "fill_holes": True,
                             "device": True},
            "target_dir": str(work / "semseg_out"),
        }
    )

    PredictRunner._configure_and_run(
        {
            "input": {"path": archive_fn},
            "model": {
                "model_fn": clf_dir,
                "batch_size": 256,
                "input_size": 256,
            },
            "polytaxo": {
                "poly_taxonomy_fn": tax_fn,
                "ecotaxa_taxonomy_fn": csv_fn,
                "threshold": 0.01,
                "skip_unchanged_objects": False,
            },
            "target_dir": str(work / "poly_out"),
        }
    )

    monitoring.unregister_event_duration_listener(listener)
    print(json.dumps(
        {"haul": args.haul, "programs": count[0], "objects": n_objects}
    ))


if __name__ == "__main__":
    main()
