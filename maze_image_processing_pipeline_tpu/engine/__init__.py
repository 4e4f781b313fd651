"""Streaming dataflow engine (TPU-first re-design of the morphocut programming model).

The reference builds declarative streaming graphs with the external
``morphocut`` library (see ``SURVEY.md`` §1 L2). This package provides the
same *programming model* — nodes constructed inside ``with Pipeline():``
produce lazy :class:`Variable` handles and execute as a pull-based stream —
re-designed so that device stages batch internally and dispatch
asynchronously to the TPU while host stages (decode, metadata, archive I/O)
overlap through stream buffers.

Key differences from the reference's engine:

* Compute nodes that run on the TPU (:class:`~..models.inference.JaxInference`,
  the fused segmentation stage) collect fixed-shape batches and keep two
  batches in flight (JAX async dispatch), instead of relying on
  thread-replicated model instances.
* All pixel kernels are backed by :mod:`..ops` (jax.numpy / Pallas) with host
  numpy fallbacks for tiny crops where dispatch overhead would dominate.
"""

from .core import (
    Call,
    Node,
    Output,
    Pipeline,
    RawOrVariable,
    ReturnOutputs,
    Stream,
    StreamObject,
    Variable,
    closing_if_closable,
)
from .stream import (
    Filter,
    Progress,
    Slice,
    StreamBuffer,
    StreamEstimator,
    Unpack,
    stream_groupby,
)
from .pipelines import (
    AggregateErrorsPipeline,
    BatchedPipeline,
    DataParallelPipeline,
    MergeNodesPipeline,
)
from .batch import Batch
from .tiles import TiledPipeline
from .stitch import Stitch, StitchedImage

__all__ = [
    "Pipeline",
    "Node",
    "Variable",
    "StreamObject",
    "Stream",
    "Call",
    "Output",
    "ReturnOutputs",
    "RawOrVariable",
    "closing_if_closable",
    "Filter",
    "Slice",
    "StreamBuffer",
    "Unpack",
    "Progress",
    "stream_groupby",
    "StreamEstimator",
    "BatchedPipeline",
    "DataParallelPipeline",
    "MergeNodesPipeline",
    "AggregateErrorsPipeline",
    "Batch",
    "TiledPipeline",
    "Stitch",
    "StitchedImage",
]
