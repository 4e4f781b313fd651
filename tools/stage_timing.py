"""Coarse wall-clock attribution for the predict/loki device stages.

`install()` monkeypatches narrow, GIL-releasing hot spots with
accumulating stopwatches; `report()` prints the totals. Used by
``tools/bench_e2e.py --timing`` to split a stage's steady wall into
host-CPU vs tunnel-transfer components WITHOUT cProfile (whose
cumtime double-counts GIL interleave across threads on this 1-core
host — see BASELINE.md round-4).

The buckets (all wall seconds, summed across calls):

- ``reader``      EcotaxaReader member read + PNG decode per object
- ``tile_cut``    DeviceTiledInference host tile cutting + pad + pack
- ``dispatch``    jit step + blend dispatch calls (upload rides here)
- ``fetch``       blocking np.asarray of the packed canvas buffers
- ``h5_pack``     native shuffle+DEFLATE chunk packing
- ``h5_write``    h5py dataset creation + direct chunk write
- ``fused_meta``  host meta assembly from fused stats
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

TIMES: "defaultdict[str, float]" = defaultdict(float)
COUNTS: "defaultdict[str, int]" = defaultdict(int)


def _wrap(obj, name, bucket):
    fn = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            TIMES[bucket] += time.perf_counter() - t0
            COUNTS[bucket] += 1

    timed.__name__ = getattr(fn, "__name__", name)
    setattr(obj, name, timed)
    return fn


def install():
    from maze_image_processing_pipeline_tpu.models import inference as inf
    from maze_image_processing_pipeline_tpu.dataio import hdf5 as h5mod
    from maze_image_processing_pipeline_tpu.ops import segment_measure as sm
    from maze_image_processing_pipeline_tpu.dataio import ecotaxa as eco

    # fetch: split_canvas_stats does the blocking np.asarray(buf)
    orig_scs = sm.split_canvas_stats

    def timed_scs(buf, *a, **k):
        import numpy as np

        t0 = time.perf_counter()
        buf = np.asarray(buf)
        TIMES["fetch"] += time.perf_counter() - t0
        COUNTS["fetch"] += 1
        TIMES["fetch_MB"] += buf.nbytes / 1e6
        return orig_scs(buf, *a, **k)

    sm.split_canvas_stats = timed_scs
    # inference.py imports it inside the method, patch there too
    def node_cls(x):
        # ReturnOutputs wraps node classes in a factory; patch the class.
        return getattr(x, "node_class", x)

    _wrap(node_cls(inf.DeviceTiledInference), "_run_chunk", "cut+dispatch")
    _wrap(node_cls(h5mod.HDF5Writer), "_write_direct", "h5_write_total")
    _wrap(eco, "decode_image", "decode")

    from maze_image_processing_pipeline_tpu import native

    _wrap(native, "hdf5_chunk_pack", "h5_pack")

    # loki stage attribution (the buckets above only cover predict)
    from maze_image_processing_pipeline_tpu.loki import device_seg as dseg
    from maze_image_processing_pipeline_tpu.dataio import imageio as iio

    _wrap(node_cls(dseg.DeviceTiledSegmentation), "_start_crops", "crop_start")
    _wrap(node_cls(dseg.DeviceTiledSegmentation), "_finish_crops", "crop_finish")
    _wrap(dseg, "_unpack_stats_batch", "stats_fetch")
    # ecotaxa.py binds these at import time — patch ITS references (the
    # writer's vignette PNG encode and the reader's decode); ImageReader
    # resolves decode_image via the imageio module at call time.
    _wrap(eco, "encode_image", "encode_img")
    _wrap(iio, "decode_image", "decode_img")

    # Remaining loki residual: dedup matching + zip member writes.
    from maze_image_processing_pipeline_tpu.dataio import archive as arc
    from maze_image_processing_pipeline_tpu.loki import zoomie

    _wrap(zoomie._SimpleMatcher, "match_and_update", "dedup_match")
    _wrap(zoomie._FeatureMatcher, "match_and_update", "dedup_match")
    _wrap(arc.ArchivePath, "write_bytes", "zip_write")


def report(stage: str):
    parts = "  ".join(
        f"{k}={TIMES[k]:.2f}s/{COUNTS[k]}" for k in sorted(TIMES)
    )
    sys.stderr.write(f"[timing:{stage}] {parts}\n")
    TIMES.clear()
    COUNTS.clear()
