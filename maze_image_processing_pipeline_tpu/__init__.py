"""MAZE-IPP-TPU: a TPU-native batch image-processing framework for zooplankton imagery.

A ground-up re-design of the capabilities of
``MOSAiC-Zooplankton-Image-Analyses/maze_image_processing_pipeline`` for TPU
hardware (JAX / XLA / Pallas):

* the streaming dataflow engine (:mod:`.engine`) — declarative graphs whose
  device stages batch internally and dispatch asynchronously to the TPU,
* the device kernel library (:mod:`.ops`) — EDT, morphology, connected
  components, region measurement, tiling/blending as batched XLA/Pallas ops,
* the model zoo (:mod:`.models`) — flax U-Net segmentation and CNN
  multi-label classifier with bf16 inference and sharded training,
* host I/O (:mod:`.dataio`) — EcoTaxa archives, HDF5, LOKI telemetry,
* the polyhierarchical taxonomy engine (:mod:`.polytaxo`),
* the two workload pipelines (:mod:`.loki`, :mod:`.predict`) behind the
  ``maze-ipp`` CLI.

Reference capability map: see ``SURVEY.md`` at the repository root.
"""

from ._version import get_version

__version__ = get_version()
del get_version
