"""Retired device kernels kept as measured negative results.

Nothing in the shipping package (`maze_image_processing_pipeline_tpu`)
imports this tree. Each module here is a Pallas kernel that LOST to the
XLA formulation on the shapes the pipelines actually run (measurements in
BASELINE.md, round-2/3 model-path findings):

* ``pallas_props``   — fused region measurement: 43.6 vs 22.3 ms/batch
  in-chain (XLA one-hot formulation wins).
* ``pallas_norm``    — two-phase GroupNorm: Mosaic pads C=32 lanes to 128
  (4x HBM traffic); 23.8 vs 1.6 ms/batch isolated at (8, 1024^2, 32).
* ``pallas_relabel`` — fused remove_small_objects: background-strip skip
  rarely fires at haul blob density; no win over the XLA one-hot.
* ``pallas_hist``    — MXU histogram: fails to compile on the remote
  tunnel helper (HTTP 500) and its background-skip variant is
  inapplicable at haul density.
* ``pallas_label``   — vertical CCL propagation: ≈210 vs ≈118 ms/batch
  composed — the row-dependency chain is latency-bound and Mosaic's
  per-row op overhead exceeds XLA's fused strip walk.

They stay here (a) as pinned parity tests so the knowledge remains
executable (`tests/test_attic_kernels.py`), and (b) so a future platform
change (Mosaic lane-packing for narrow channels, a local TPU without the
tunnel tax) can re-evaluate them with one import-path flip. The only
Pallas kernels that still win in-package are the CCL lane scans
(`maze_image_processing_pipeline_tpu/ops/pallas_scan.py`).
"""
