"""Batched asynchronous JAX inference stream node.

The TPU re-imagination of the reference's ``PyTorch`` node (contract at
SURVEY.md §3.5; call sites ``loki/pipeline.py:529-537``,
``predict/pipeline.py:671-681``):

* **One jitted step** fuses device-side pre-processing (gray→RGB, dtype
  scaling), the model forward, and post-processing (sigmoid, NHWC) — XLA
  fuses the elementwise stages into the convs.
* **Fixed-shape batches** — inputs are stacked to ``(B, H, W, C)``; the last
  partial batch is padded to the bucket size so exactly one executable is
  compiled per shape.
* **Async double-buffering** — JAX dispatch is asynchronous; the node keeps
  ``in_flight`` batches undispatched-to-host so host stages (decode, I/O)
  and the TPU overlap without threads. This replaces the reference's
  thread-replicated model instances (``DataParallelPipeline``) with one
  model and a saturated device.
* **Multi-chip** — pass a ``jax.sharding.Mesh``; batches are placed with a
  ``NamedSharding`` over the data axis and XLA partitions the step across
  chips (ICI collectives inserted automatically).
"""

from __future__ import annotations

import collections
import functools
import logging
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.batch import Batch
from ..engine.core import Node, Output, RawOrVariable, ReturnOutputs, Stream, closing_if_closable
from .model_io import LoadedModel

logger = logging.getLogger(__name__)

__all__ = ["JaxInference", "default_device_pre", "sigmoid_post"]


def default_device_pre(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B,H,W[,C]) → float (B,H,W,3) in [0,1] (device-side, fused)."""
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return x


def sigmoid_post(y: jnp.ndarray) -> jnp.ndarray:
    """Logits → probabilities (device-side, fused into the forward)."""
    return jax.nn.sigmoid(y)


@ReturnOutputs
@Output("predictions")
class JaxInference(Node):
    """Run a :class:`LoadedModel` over the stream in fixed-shape batches.

    Args:
        model: the loaded model (module + params + meta).
        image: image variable; values must share one shape per stream
            (guaranteed after TiledPipeline or center-crop).
        batch_size: internal batching when objects arrive one-by-one.
            Ignored when ``is_batch`` (a BatchedPipeline already groups).
        is_batch: incoming values are :class:`Batch` lists.
        output_key: select one output from tuple/dict model outputs.
        device_pre / device_post: jnp-traceable hooks fused into the jitted
            step (defaults: uint8→RGB float, sigmoid).
        pre_transform / post_transform: optional *host* numpy hooks applied
            per item before batching / after fetching (parity with the
            reference's pre/post transforms).
        mesh: optional Mesh for multi-chip batch sharding.
        in_flight: dispatched-but-unfetched batch count (pipelining depth).
    """

    def __init__(
        self,
        model: LoadedModel,
        image: RawOrVariable,
        *,
        batch_size: Optional[int] = None,
        is_batch: bool = False,
        output_key: Optional[Any] = None,
        device_pre: Optional[Callable] = default_device_pre,
        device_post: Optional[Callable] = sigmoid_post,
        pre_transform: Optional[Callable] = None,
        post_transform: Optional[Callable] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        data_axis: str = "data",
        in_flight: int = 2,
        transfer_dtype: Optional[Any] = None,
    ) -> None:
        self.model = model
        self.image = image
        self.batch_size = batch_size
        self.is_batch = is_batch
        self.output_key = output_key
        self.device_pre = device_pre
        self.device_post = device_post
        self.pre_transform = pre_transform
        self.post_transform = post_transform
        self.mesh = mesh
        self.data_axis = data_axis
        self.in_flight = max(1, in_flight)
        super().__init__()

        apply_fn = model.apply
        params = model.params
        if mesh is not None:
            # Pre-place params on the mesh: wide channel dims sharded over a
            # 'model' axis when present, everything else replicated. Avoids
            # re-placement on every dispatch.
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        output_key_ = output_key
        device_pre_ = device_pre
        device_post_ = device_post

        transfer_dtype_ = transfer_dtype

        # Params are an ARGUMENT, not a closure: closed-over arrays embed
        # as MLIR constants and device-resident ones are fetched back to
        # host during every lowering (seconds per leaf through this host's
        # tunnel — BASELINE.md round-2 findings).
        @jax.jit
        def step(params, x):
            if device_pre_ is not None:
                x = device_pre_(x)
            y = apply_fn(params, x)
            if output_key_ is not None:
                y = y[output_key_]
            if device_post_ is not None:
                y = device_post_(y)
            if transfer_dtype_ is not None:
                # Shrink the device→host fetch (tunneled hosts move ~16 MB/s;
                # f16 halves the dominant e2e cost — BASELINE.md).
                y = jax.tree_util.tree_map(
                    lambda a: a.astype(transfer_dtype_)
                    if jnp.issubdtype(a.dtype, jnp.floating)
                    else a,
                    y,
                )
            return y

        self._step = step
        self._params = params
        # In is_batch mode the bucket is learned from the first group so the
        # tail (partial) BatchedPipeline group pads instead of recompiling.
        self._seen_batch: Optional[int] = None
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._sharding = NamedSharding(mesh, PartitionSpec(data_axis))

    # -- dispatch helpers --------------------------------------------------

    def _dispatch(self, images: List[np.ndarray]) -> Tuple[Any, int]:
        """Stack, pad to a bucket size, and launch one device step."""
        n = len(images)
        if self.pre_transform is not None:
            images = [np.asarray(self.pre_transform(img)) for img in images]
        x = np.stack(images)
        pad = 0
        if self.is_batch:
            if self._seen_batch is None:
                self._seen_batch = n
            bucket = self._seen_batch if n < self._seen_batch else None
        else:
            bucket = self.batch_size or None
        if bucket and n < bucket:
            pad = bucket - n
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
        if self.mesh is not None and x.shape[0] % self.mesh.devices.size != 0:
            extra = (-x.shape[0]) % self.mesh.devices.size
            x = np.concatenate([x, np.repeat(x[-1:], extra, axis=0)])
            pad += extra
        if self._sharding is not None:
            x = jax.device_put(x, self._sharding)
        return self._step(self._params, x), n

    def _fetch(self, out_dev: Any, n: int) -> List[np.ndarray]:
        out = np.asarray(out_dev)[:n]
        if self.post_transform is not None:
            return [self.post_transform(o) for o in out]
        return list(out)

    # -- streaming ---------------------------------------------------------

    def transform_stream(self, stream: Stream) -> Stream:
        pending = collections.deque()  # (objs, out_dev, n)

        def flush_one():
            objs, out_dev, n = pending.popleft()
            results = self._fetch(out_dev, n)
            if len(objs) == 1 and self.is_batch:
                objs[0][self.output_vars[0]] = Batch(results)
                yield objs[0]
            else:
                for o, r in zip(objs, results):
                    o[self.output_vars[0]] = r
                    yield o

        with closing_if_closable(stream):
            if self.is_batch:
                for obj in stream:
                    images = list(self.prepare_input(obj, "image"))
                    out_dev, n = self._dispatch(images)
                    pending.append(([obj], out_dev, n))
                    while len(pending) > self.in_flight:
                        yield from flush_one()
            else:
                bucket: List = []
                bucket_objs: List = []
                bsize = self.batch_size or 1
                for obj in stream:
                    bucket.append(np.asarray(self.prepare_input(obj, "image")))
                    bucket_objs.append(obj)
                    if len(bucket) >= bsize:
                        out_dev, n = self._dispatch(bucket)
                        pending.append((bucket_objs, out_dev, n))
                        bucket, bucket_objs = [], []
                        while len(pending) > self.in_flight:
                            yield from flush_one()
                if bucket:
                    out_dev, n = self._dispatch(bucket)
                    pending.append((bucket_objs, out_dev, n))

            while pending:
                yield from flush_one()
