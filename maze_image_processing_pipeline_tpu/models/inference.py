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
import os
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import round_ladder as _round_ladder
from ..common import round_ladder_fine as _round_ladder_fine
from ..engine.batch import Batch
from ..engine.core import Node, Output, RawOrVariable, ReturnOutputs, Stream, closing_if_closable
from .model_io import LoadedModel

logger = logging.getLogger(__name__)

__all__ = [
    "JaxInference",
    "DeviceTiledInference",
    "default_device_pre",
    "sigmoid_post",
]


def default_device_pre(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W[,C]) → float (B,H,W,3) in [0,1] (device-side, fused).

    Unsigned-integer images scale by 1/iinfo.max (the convert_img_dtype
    contract); floats pass through."""
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        x = x.astype(jnp.float32) / float(jnp.iinfo(x.dtype).max)
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
        else:
            # One upload at construction: numpy pytrees passed as jit
            # arguments are re-TRANSFERRED host→device on every dispatch
            # (tens of MB of weights per batch through a tunneled host).
            params = jax.device_put(params)
        output_key_ = output_key
        device_pre_ = device_pre
        device_post_ = device_post

        transfer_dtype_ = transfer_dtype

        # Params are an ARGUMENT, not a closure: closed-over arrays embed
        # as MLIR constants and device-resident ones are fetched back to
        # host during every lowering (seconds per leaf through this host's
        # tunnel — BASELINE.md round-2 findings).
        def build_step():
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
                    # Shrink the device→host fetch (tunneled hosts move
                    # ~16 MB/s; f16 halves the dominant e2e cost —
                    # BASELINE.md).
                    y = jax.tree_util.tree_map(
                        lambda a: a.astype(transfer_dtype_)
                        if jnp.issubdtype(a.dtype, jnp.floating)
                        else a,
                        y,
                    )
                return y

            return step

        # Memoized process-wide on the trace-relevant config (flax modules
        # hash by architecture), so a service running many task files
        # reuses the loaded forward executable (jit_cache docstring).
        # Custom unhashable hooks fall back to an uncached build.
        from ..jit_cache import get_program

        self._step = get_program(
            (
                "jax_inference_step",
                model.module,
                output_key,
                device_pre,
                device_post,
                transfer_dtype,
            ),
            build_step,
        )
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


def _fetch_w_rungs(Wb: int, Wq: int):
    """Static width rungs for the byte-packed canvas fetch.

    Quarter-Wb steps (>=128 — the lane width) clipped to the bucket's
    fetch window Wq: each object's packed region uses the smallest rung
    covering its true width, so mixed-width buckets stop paying the
    bucket-max width for every member. Derived from STATIC bucket shape
    only — both the program builder and the dispatcher recompute it
    identically."""
    step = max(Wb // 8, 32)
    rungs = sorted(
        {min(Wq, step * k) for k in range(1, 9) if step * k < Wq + step}
    )
    return tuple(r for r in rungs if r <= Wq)


def _build_tiled_blend(
    Hb: int,
    Wb: int,
    Hq: int,
    Wq: int,
    ts: int,
    transfer_dtype,
    measure: Optional[tuple] = None,
    fused_step: Optional[tuple] = None,
):
    """Blend program for one shape bucket (auto-specialized on the
    job-count ladder via input shapes). The dominant per-process tunnel
    cost is LOADING each compiled executable onto the remote device
    (BASELINE.md round-3 finding), so DeviceTiledInference keeps a
    minimal program set — with ``fused_step`` the tile extraction from a
    row-packed image buffer + model forward + blend (+ measurement)
    compile into ONE program per bucket; without it (mesh path), tiles
    are cut on the host and the shared sharded forward feeds this blend.

    The canvas accumulates at the full tile-grid extent (Hb, Wb) but only
    the (Hq, Wq) window covering the objects' true extents is returned:
    the device→host fetch is BANDWIDTH-bound through tunneled hosts
    (~40-80 MB/s measured), and pow2 buckets fetch up to 2x the useful
    bytes (e.g. ~170² vignettes in 256² buckets).

    ``measure``: optional ``(fill_channels, num_segments, n_bg_segments)``
    — fuse the per-channel segment measurement INTO this program (stats
    ride inside the returned buffer, f32-thresholded before the transfer
    cast, exactly like :func:`ops.segment_measure
    .measure_channels_with_canvas`). A separate measurement dispatch used
    to cost one extra ~25 ms tunnel round trip per chunk bucket."""
    from ..engine.tiles import _linear_weight

    wt = _linear_weight(ts, ts)  # numpy host constant

    def _blend_canvas(pred_t, tb, ty, tx, n_jobs, Bo):
        # (N, ts, ts, Cout) predictions → (Bo, Hq, Wq, Cout)
        # f32: accumulate at dynamic offsets; pad jobs carry zero
        # weight.
        Cout = pred_t.shape[-1]
        canvas = jnp.zeros((Bo, Hb, Wb, Cout), jnp.float32)
        wsum = jnp.zeros((Bo, Hb, Wb, 1), jnp.float32)
        # numpy constant, NOT jnp: device constants are fetched
        # back at every lowering (BASELINE.md trap).
        wt_d = wt[..., None]

        def body(i, cw):
            canvas, wsum = cw
            b, y, x = tb[i], ty[i], tx[i]
            w = jnp.where(i < n_jobs, wt_d, np.float32(0.0))
            cs = jax.lax.dynamic_slice(
                canvas, (b, y, x, 0), (1, ts, ts, Cout)
            )[0]
            vs = jax.lax.dynamic_slice(wsum, (b, y, x, 0), (1, ts, ts, 1))[0]
            canvas = jax.lax.dynamic_update_slice(
                canvas, (cs + pred_t[i] * w)[None], (b, y, x, 0)
            )
            wsum = jax.lax.dynamic_update_slice(
                wsum, (vs + w)[None], (b, y, x, 0)
            )
            return canvas, wsum

        canvas, wsum = jax.lax.fori_loop(
            0, pred_t.shape[0], body, (canvas, wsum)
        )
        # Host TiledPipeline normalization: where(w > 0, w, 1).
        out = canvas / jnp.where(wsum > 0, wsum, 1.0)
        if (Hq, Wq) != (Hb, Wb):
            out = out[:, :Hq, :Wq]
        return out

    wrungs = _fetch_w_rungs(Wb, Wq)

    def _pack_bytes(out, coff, wsel, S_el):
        # (Bo, Hq, Wq, C) → flat (S_el,): object b's canvas window
        # (Hq, wrungs[wsel[b]], C) row-major at element offset coff[b].
        # Offsets are spaced by the TRUE region sizes (h_b * Wr_b * C), so
        # each write's spill past its object's true height lands in the
        # NEXT objects' regions and is overwritten by their later writes
        # (ascending offset order). The caller sizes S_el so EVERY write
        # end (coff[b] + Hq*Wr_b*C) is in bounds — dynamic_update_slice
        # CLAMPS out-of-range starts, which would silently shift a write
        # backwards over real data.
        Cc = out.shape[-1]

        def write_r(r, b, fo):
            sl = jax.lax.dynamic_slice(
                out, (b, 0, 0, 0), (1, Hq, wrungs[r], Cc)
            ).reshape(-1)
            return jax.lax.dynamic_update_slice(fo, sl, (coff[b],))

        def body(b, fo):
            return jax.lax.switch(
                wsel[b],
                [functools.partial(write_r, r) for r in range(len(wrungs))],
                b,
                fo,
            )

        flat = jnp.zeros((S_el,), out.dtype)
        return jax.lax.fori_loop(0, out.shape[0], body, flat)

    def _finish(out, hs, ws, Bo, pack=None, S_el=None):
        # Shared transfer tail: cast-for-transfer or fused measurement.
        # With ``pack=(coff, wsel, wrungs)`` the canvases leave
        # BYTE-PACKED — each object's (true height × width-rung) window
        # row-major in one flat (S_el,) buffer — the device→host fetch is
        # bandwidth-bound, and dense (Bo, Hq, Wq) windows pad every
        # object to the BUCKET's max extent (measured 233 MB vs ~32 MB of
        # true pixels on the dense haul's log-uniform crop spread).
        from ..ops.segment_measure import cast_for_transfer

        if measure is None:
            if pack is not None:
                out = _pack_bytes(out, pack[0], pack[1], S_el)
            if transfer_dtype is not None:
                out = cast_for_transfer(out, transfer_dtype)
            return out.reshape(-1)
        from ..ops.segment_measure import (
            measure_channels_packed,
            measure_channels_with_canvas,
        )

        fill_channels, num_segments, n_bg_segments = measure
        Cout = out.shape[-1]
        if pack is None:
            return measure_channels_with_canvas(
                out.reshape(-1),
                hs,
                ws,
                shape=(Bo, Hq, Wq, Cout),
                fill_channels=fill_channels,
                num_segments=num_segments,
                n_bg_segments=n_bg_segments,
                out_dtype=transfer_dtype,
            )
        # Measure the DENSE f32 canvas (stats must see full precision and
        # per-object windows), then pack + cast for the transfer.
        stats = measure_channels_packed(
            out.reshape(-1),
            hs,
            ws,
            shape=(Bo, Hq, Wq, Cout),
            fill_channels=fill_channels,
            num_segments=num_segments,
            n_bg_segments=n_bg_segments,
        )
        flat = _pack_bytes(out, pack[0], pack[1], S_el)
        if transfer_dtype is not None:
            flat = cast_for_transfer(flat, transfer_dtype)
        if flat.dtype != jnp.float32:
            stats = jax.lax.bitcast_convert_type(stats, flat.dtype).reshape(-1)
        return jnp.concatenate([flat, stats])

    if fused_step is None:
        # Two-program path (mesh / shared model forward): predictions
        # ride in as a chunk pytree so no extra concatenate program is
        # dispatched.
        if measure is None:

            @functools.partial(jax.jit, static_argnames=("Bo",))
            def blend(pred_chunks, tb, ty, tx, n_jobs, *, Bo):
                pred_t = jnp.concatenate(pred_chunks, axis=0)
                out = _blend_canvas(pred_t, tb, ty, tx, n_jobs, Bo)
                return _finish(out, None, None, Bo)

            return blend

        @functools.partial(jax.jit, static_argnames=("Bo",))
        def blend_measure(pred_chunks, tb, ty, tx, n_jobs, hs, ws, *, Bo):
            pred_t = jnp.concatenate(pred_chunks, axis=0)
            out = _blend_canvas(pred_t, tb, ty, tx, n_jobs, Bo)
            return _finish(out, hs, ws, Bo)

        return blend_measure

    # Fused single-dispatch path: tile extraction + model forward +
    # blend (+ measurement) in ONE program. Each chunk bucket pays ONE
    # ~25 ms tunnel dispatch instead of ceil(N/bs) forward dispatches +
    # one blend dispatch (BASELINE.md: dispatches do not pipeline
    # through this tunnel). The chunk's images ride up ROW-PACKED
    # (sum-of-heights x Wp, exact rows, zero-padded columns) instead of
    # as host-cut (N, ts, ts) tiles: the host→device link runs at
    # ~35-80 MB/s, and padded tiles upload 2-4x the true pixels
    # (pad-to-tile for vignettes, overlap duplication for large
    # objects, batch-ladder padding). lax.map over fixed-bs slabs keeps
    # the forward's shapes identical to the two-program path, so
    # predictions match bit-for-bit.
    step_fn, bs = fused_step

    def _extract_tiles(rows, tx, toff, hlim, Ncap):
        # rows: (S_cap, Wp[, C]) — job j's tile is rows[toff[j]:+ts,
        # tx[j]:+ts] with rows >= hlim[j] zeroed (a window may read into
        # the NEXT object's rows; the mask restores the host pad
        # exactly). Columns beyond an image's width are zero in the host
        # buffer; when the whole bucket is narrower than a tile
        # (Wp < ts) the un-sliced tile columns stay zero from the init.
        # Pad jobs carry hlim=0 → all-zero tiles.
        Ws = min(ts, rows.shape[1])
        sizes = (ts, Ws) + rows.shape[2:]
        tiles0 = jnp.zeros((Ncap, ts, ts) + rows.shape[2:], rows.dtype)
        ridx = jnp.arange(ts, dtype=jnp.int32)

        def body(j, tiles):
            src = jax.lax.dynamic_slice(
                rows,
                (toff[j], tx[j]) + (0,) * (rows.ndim - 2),
                sizes,
            )
            valid = (ridx < hlim[j]).reshape((ts,) + (1,) * (rows.ndim - 1))
            src = jnp.where(valid, src, jnp.zeros((), rows.dtype))
            return jax.lax.dynamic_update_slice(
                tiles, src[None], (j,) + (0,) * rows.ndim
            )

        return jax.lax.fori_loop(0, Ncap, body, tiles0)

    def _forward(params, rows, tx, toff, hlim, Ncap):
        tiles = _extract_tiles(rows, tx, toff, hlim, Ncap)
        k = Ncap // bs
        xs = tiles.reshape((k, bs) + tiles.shape[1:])
        preds = jax.lax.map(lambda x: step_fn(params, x), xs)
        return preds.reshape((k * bs,) + preds.shape[2:])

    if measure is None:

        @functools.partial(jax.jit, static_argnames=("Bo", "Ncap", "S_el"))
        def fused(params, rows, tb, ty, tx, toff, hlim, n_jobs, pack=None,
                  *, Bo, Ncap, S_el=None):
            pred_t = _forward(params, rows, tx, toff, hlim, Ncap)
            out = _blend_canvas(pred_t, tb, ty, tx, n_jobs, Bo)
            return _finish(out, None, None, Bo, pack, S_el)

        return fused

    @functools.partial(jax.jit, static_argnames=("Bo", "Ncap", "S_el"))
    def fused_measure(
        params, rows, tb, ty, tx, toff, hlim, n_jobs, hs, ws, pack=None,
        *, Bo, Ncap, S_el=None
    ):
        pred_t = _forward(params, rows, tx, toff, hlim, Ncap)
        out = _blend_canvas(pred_t, tb, ty, tx, n_jobs, Bo)
        return _finish(out, hs, ws, Bo, pack, S_el)

    return fused_measure


@ReturnOutputs
@Output("predictions")
@Output("seg_stats")
class DeviceTiledInference(Node):
    """Tiled inference with ON-DEVICE linear blending (predict workload).

    The composed path (``TiledPipeline{JaxInference}``) fetches every
    tile's prediction to the host and blends there — with overlapping
    tiles that transfers ~2-4× the blended output, and the fetch is the
    dominant cost on tunneled hosts (BASELINE.md). Here the tile grid of
    each object (the SAME grid the host ``TiledPipeline`` would use —
    :func:`..engine.tiles._tile_starts` on the true extent) is extracted,
    inferred, and blended on the accelerator; only the blended per-object
    prediction is fetched, packed across a whole chunk of objects into ONE
    transfer. Blend weights and normalization mirror
    ``engine.tiles._FrameAccumulator`` exactly (linear ramp,
    ``where(w > 0, w, 1)``), so outputs match the host path.

    Reference contract: ``/root/reference/maze_ipp/predict/pipeline.py:
    644-681`` (TiledPipeline(blend_strategy="linear") around the PyTorch
    node).
    """

    def __init__(
        self,
        model: LoadedModel,
        image: RawOrVariable,
        *,
        tile_size: int,
        tile_stride: int,
        batch_size: int = 8,
        chunk_size: int = 32,
        output_key: Optional[Any] = None,
        device_pre: Optional[Callable] = default_device_pre,
        device_post: Optional[Callable] = sigmoid_post,
        transfer_dtype: Optional[Any] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        in_flight: int = 2,
        measure_channels: Optional[Sequence[str]] = None,
        measure_fill_holes: Any = False,
    ) -> None:
        self.model = model
        self.image = image
        self.tile_size = tile_size
        self.tile_stride = tile_stride
        self.batch_size = max(1, batch_size)
        self.chunk_size = max(1, chunk_size)
        self.in_flight = max(1, in_flight)
        self.transfer_dtype = transfer_dtype
        # Fused segment measurement: the stats are computed INSIDE the
        # blend program (the canvases never leave HBM) and ride back
        # packed in the same fetch, replacing the host's per-object scipy
        # pass (predict.pipeline.measure_segments) that dominated the
        # steady semseg stage on 1-core hosts — zero extra dispatches.
        self.measure_channels = (
            list(measure_channels) if measure_channels is not None else None
        )
        self.measure_fill_holes = measure_fill_holes
        super().__init__()

        apply_fn = model.apply
        output_key_ = output_key
        device_pre_ = device_pre
        device_post_ = device_post

        def build_step():
            @jax.jit
            def step(params, tiles):  # (bs, ts, ts[, C]) uint8 → (bs, ts, ts, Cout)
                x = tiles
                if device_pre_ is not None:
                    x = device_pre_(x)
                y = apply_fn(params, x)
                if output_key_ is not None:
                    y = y[output_key_]
                if device_post_ is not None:
                    y = device_post_(y)
                return y.astype(jnp.float32)

            return step

        # Process-wide memo, same rationale as JaxInference above.
        from ..jit_cache import get_program

        self._step_key = (model.module, output_key, device_pre, device_post)
        self._step = get_program(
            ("dt_inference_step",) + self._step_key,
            build_step,
        )
        self._cout: Optional[int] = None
        if mesh is not None:
            # ONE sharded program: tile chunks shard over the data axis
            # (zero collectives in the forward), params pre-placed on the
            # mesh. Round-robining chunks over raw devices would instead
            # compile + LOAD a separate executable per device (5-800 s
            # each through tunneled hosts — BASELINE.md round-3).
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.mesh import shard_params

            self._params = shard_params(model.params, mesh)
            self._data_sharding = NamedSharding(mesh, PartitionSpec("data"))
            dsize = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
            self.batch_size = -(-self.batch_size // dsize) * dsize
        else:
            # One upload at construction: numpy pytrees passed as jit
            # arguments are re-transferred on every dispatch.
            self._params = jax.device_put(model.params)
            self._data_sharding = None
    def _programs(
        self, Hb: int, Wb: int, Hq: int, Wq: int, transfer_dtype,
        measure=None, fused=False,
    ):
        # Process-wide memo (jit_cache): the blend closes over shape
        # scalars + the host weight window only — no params, no self —
        # so re-built pipelines reuse the loaded executables. The fused
        # variant additionally embeds the model forward (step identity +
        # batch size in the key).
        from ..jit_cache import get_program

        if fused:
            key = (
                "dt_fused", self._step_key, self.batch_size,
                Hb, Wb, Hq, Wq, self.tile_size, transfer_dtype, measure,
            )
            step_fn, bs = self._step, self.batch_size
            return get_program(
                key,
                lambda: _build_tiled_blend(
                    Hb, Wb, Hq, Wq, self.tile_size, transfer_dtype,
                    measure, fused_step=(step_fn, bs),
                ),
            )
        key = (
            "dt_blend", Hb, Wb, Hq, Wq, self.tile_size, transfer_dtype, measure
        )
        return get_program(
            key,
            lambda: _build_tiled_blend(
                Hb, Wb, Hq, Wq, self.tile_size, transfer_dtype, measure
            ),
        )

    def _run_chunk(self, images):
        """Dispatch one chunk; returns (fetch_future, layout)."""
        from ..engine.tiles import _tile_starts

        ts, stride = self.tile_size, self.tile_stride
        buckets = {}
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            Hb = max(1 << (max(h, ts) - 1).bit_length(), ts)
            Wb = max(1 << (max(w, ts) - 1).bit_length(), ts, 128)
            # dtype/channels are part of the key: mixed inputs (e.g. a u16
            # haul next to u8) batch separately instead of failing.
            buckets.setdefault(
                (Hb, Wb, str(img.dtype), img.shape[2:]), []
            ).append(i)

        parts = []
        layout = []  # (bucket_key, idxs, Bo, Cout)
        for bkey in sorted(buckets, key=str):
            Hb, Wb = bkey[:2]
            idxs = buckets[bkey]
            # Fetch window: ONE per bucket, the members' max extent on a
            # quarter-bucket ladder (Hb/4, Hb/2, 3Hb/4, Hb). The blend
            # still accumulates on the full (Hb, Wb) tile grid, but only
            # (Hq, Wq) crosses the (bandwidth-bound) device→host link —
            # ~2x fewer bytes for vignette-sized objects in pow2 buckets.
            # Keying buckets on (Hb, Wb) only and deriving the window from
            # the whole bucket keeps batches together; quarter rungs bound
            # the blend-variant count at ≤16 per pow2 bucket (an x32
            # ladder populated ~dozens of variants on the dense haul's
            # log-uniform crop spread, and each distinct variant pays the
            # 5-800 s per-process executable load through tunneled hosts —
            # BASELINE.md round-4 dense finding).
            hmax = max(images[i].shape[0] for i in idxs)
            wmax = max(images[i].shape[1] for i in idxs)
            rung_h = Hb // 4
            rung_w = Wb // 4
            Hq = min(Hb, -(-hmax // rung_h) * rung_h)
            Wq = min(Wb, max(-(-wmax // rung_w) * rung_w, 128))
            # The [:h, :w] crop at unpack silently truncates if the ladder
            # ever undershoots the true extent.
            assert Hq >= hmax and Wq >= wmax, (Hq, Wq, hmax, wmax)
            key = (Hb, Wb, Hq, Wq) + bkey[2:]
            Bo = len(idxs)
            trailing = images[idxs[0]].shape[2:]
            dtype = np.dtype(bkey[2])
            # Single-device: ONE fused tile-extract+forward+blend dispatch
            # per chunk bucket (dispatches cost ~25 ms each and do not
            # pipeline through tunneled hosts — BASELINE.md). The mesh
            # path keeps the two-program structure: its forward shards
            # over the data axis while the blend runs unsharded.
            use_fused = self._data_sharding is None
            jobs = []
            if use_fused:
                # Row-packed upload: images stacked vertically at their
                # true heights, columns zero-padded to Wp. The device
                # extracts the tile grid from this buffer, so the
                # host→device link (~35-80 MB/s) carries ~the true pixels
                # instead of padded tiles (pad-to-tile for vignettes,
                # overlap duplication for large objects, batch-ladder pad
                # jobs: 2-13x the bytes on the measured hauls). S/Wp ride
                # coarse rungs so the executable-variant count stays
                # bounded (dense-haul finding: every distinct program
                # pays a 5-800 s per-process load through this tunnel).
                offs = []
                off = 0
                rows_needed = 0
                wneed = 128
                for bi, i in enumerate(idxs):
                    img = images[i]
                    h, w = img.shape[:2]
                    offs.append(off)
                    for y in _tile_starts(h, ts, stride):
                        hl = min(ts, h - y)
                        for x in _tile_starts(w, ts, stride):
                            jobs.append((bi, y, x, off + y, hl))
                    rows_needed = max(rows_needed, off + max(h, ts))
                    wneed = max(wneed, w)
                    off += h
                N = len(jobs)
                Ncap = self.batch_size * _round_ladder(
                    -(-N // self.batch_size)
                )
                jobs = jobs + [(0, 0, 0, 0, 0)] * (Ncap - N)
                # Wp: quarter-Wb rungs (≤4 variants/bucket); S: the
                # {1,1.5}·2^k ladder (≤33% pad rows, ~2 rungs/octave).
                rung_wp = max(Wb // 4, 128)
                Wp = min(Wb, -(-wneed // rung_wp) * rung_wp)
                S_cap = _round_ladder(rows_needed)
                rows = np.zeros((S_cap, Wp) + trailing, dtype)
                for o, i in zip(offs, idxs):
                    img = images[i]
                    rows[o : o + img.shape[0], : img.shape[1]] = img
                # dynamic_slice CLAMPS out-of-range starts (silently
                # shifting a tile) — the packing must keep every window
                # in range.
                assert all(
                    j[3] + ts <= S_cap and j[2] + min(ts, Wp) <= Wp
                    for j in jobs
                ), (S_cap, Wp, ts)
                toff = np.asarray([j[3] for j in jobs], np.int32)
                hlim = np.asarray([j[4] for j in jobs], np.int32)
                tiles = None
            else:
                tile_arrays = []
                for bi, i in enumerate(idxs):
                    img = images[i]
                    h, w = img.shape[:2]
                    for y in _tile_starts(h, ts, stride):
                        for x in _tile_starts(w, ts, stride):
                            tile = img[y : y + ts, x : x + ts]
                            if tile.shape[:2] != (ts, ts):
                                pad = [
                                    (0, ts - tile.shape[0]),
                                    (0, ts - tile.shape[1]),
                                ] + [(0, 0)] * (img.ndim - 2)
                                tile = np.pad(tile, pad)
                            jobs.append((bi, y, x))
                            tile_arrays.append(tile)
                N = len(jobs)
                Ncap = self.batch_size * _round_ladder(
                    -(-N // self.batch_size)
                )
                jobs = jobs + [(0, 0, 0)] * (Ncap - N)
                tiles = np.zeros((Ncap, ts, ts) + trailing, dtype)
                for j, t in enumerate(tile_arrays):
                    tiles[j] = t
            tb = np.asarray([j[0] for j in jobs], np.int32)
            ty = np.asarray([j[1] for j in jobs], np.int32)
            tx = np.asarray([j[2] for j in jobs], np.int32)

            # When measuring, the blend thresholds its f32 canvas in the
            # SAME program (a separate measurement dispatch used to pay
            # one more ~25 ms tunnel round trip per chunk bucket) and
            # casts for transfer afterwards: thresholding a canvas
            # already rounded to f16 flips borderline 0.5-pixels vs the
            # host oracle.
            with_stats = self.measure_channels is not None
            if use_fused:
                preds = None
                if self._cout is None:
                    self._cout = int(
                        jax.eval_shape(
                            self._step,
                            self._params,
                            jax.ShapeDtypeStruct(
                                (self.batch_size, ts, ts) + trailing,
                                dtype,
                            ),
                        ).shape[-1]
                    )
                Cout = self._cout
            else:
                preds = []
                for o in range(0, Ncap, self.batch_size):
                    chunk = jax.device_put(
                        tiles[o : o + self.batch_size], self._data_sharding
                    )
                    preds.append(self._step(self._params, chunk))
                Cout = int(preds[0].shape[-1])
            if with_stats and len(self.measure_channels) != Cout:
                # The host path asserted this with both names; keep the
                # clear error instead of an IndexError inside tracing.
                raise ValueError(
                    f"measure_channels has {len(self.measure_channels)} "
                    f"names {self.measure_channels} but the model outputs "
                    f"{Cout} channels"
                )
            # Quantize the canvas batch to the ladder too: every distinct
            # (Hb, Wb, Ncap, Bo) combination compiles a blend variant.
            Bo_cap = _round_ladder(Bo)
            # Byte-packed fetch: each object's canvas leaves the device as
            # its (true height × width-rung) window, row-major in ONE
            # flat buffer, instead of Bo dense windows of the bucket-max
            # extent (Hq, Wq). The fetch is bandwidth-bound, and pow2
            # buckets mix a whole octave (or more — everything below the
            # tile size shares one bucket) of crop sizes, so the dense
            # form pays mean-vs-max padding: measured 233 MB fetched for
            # ~32 MB of true pixels on the dense haul. Offsets are exact
            # region sizes (h*Wr*C); S_el covers every write's Hq-window
            # spill end and the pad objects' tail writes (_pack_bytes).
            # Engaged only when it saves ≥1/8 of the elements (uniform
            # hauls land on the same ladder rung — no new variants).
            pack = None
            S_el = None
            if (
                use_fused
                and os.environ.get("MAZE_ROWPACK_FETCH", "1") != "0"
            ):
                wrungs = _fetch_w_rungs(Wb, Wq)
                Ct = Cout
                wsel_l, coff_l, off_el = [], [], 0
                end_max = 0
                for i in idxs:
                    h, w = images[i].shape[:2]
                    r = next(
                        k for k, wr in enumerate(wrungs) if w <= wr
                    )
                    wsel_l.append(r)
                    coff_l.append(off_el)
                    end_max = max(end_max, off_el + Hq * wrungs[r] * Ct)
                    off_el += h * wrungs[r] * Ct
                # Pad objects write zero windows of the smallest rung at
                # the tail; keep them clear of real data. The buffer must
                # also fit the LARGEST rung's window: lax.switch traces
                # every branch, and an update wider than the operand is a
                # trace-time error even on a branch no object selects.
                end_max = max(end_max, off_el + Hq * wrungs[0] * Ct)
                end_max = max(end_max, Hq * wrungs[-1] * Ct)
                S_el_cap = _round_ladder_fine(end_max)
                if S_el_cap * 8 <= Bo_cap * Hq * Wq * Ct * 7:
                    S_el = S_el_cap
                    coff = np.full(
                        (Bo_cap,), S_el_cap - Hq * wrungs[0] * Ct, np.int32
                    )
                    coff[: len(coff_l)] = coff_l
                    wsel = np.zeros((Bo_cap,), np.int32)
                    wsel[: len(wsel_l)] = wsel_l
                    pack = (coff, wsel)
            if with_stats:
                fill = self.measure_fill_holes
                measure = (
                    tuple(
                        fill is True or (fill and name in fill)
                        for name in self.measure_channels
                    ),
                    32,  # num_segments / n_bg_segments: the measured
                    64,  # overflow bounds (BASELINE.md round-3 #9)
                )
                prog = self._programs(
                    Hb, Wb, Hq, Wq, self.transfer_dtype, measure,
                    fused=use_fused,
                )
                hs = np.zeros((Bo_cap,), np.int32)
                ws = np.zeros((Bo_cap,), np.int32)
                for bi, i in enumerate(idxs):
                    hs[bi], ws[bi] = images[i].shape[:2]
                if use_fused:
                    flat = prog(
                        self._params, rows, tb, ty, tx, toff, hlim,
                        np.asarray(N, np.int32), hs, ws, pack,
                        Bo=Bo_cap, Ncap=Ncap, S_el=S_el,
                    )
                else:
                    flat = prog(
                        tuple(preds), tb, ty, tx, np.asarray(N, np.int32),
                        hs, ws, Bo=Bo_cap,
                    )
            else:
                prog = self._programs(
                    Hb, Wb, Hq, Wq, self.transfer_dtype, fused=use_fused
                )
                if use_fused:
                    flat = prog(
                        self._params, rows, tb, ty, tx, toff, hlim,
                        np.asarray(N, np.int32), pack,
                        Bo=Bo_cap, Ncap=Ncap, S_el=S_el,
                    )
                else:
                    flat = prog(
                        tuple(preds), tb, ty, tx, np.asarray(N, np.int32),
                        Bo=Bo_cap,
                    )
            parts.append(flat)
            layout.append((key, idxs, Bo_cap, Cout, with_stats, S_el,
                           pack, _fetch_w_rungs(Wb, Wq) if pack else None))

        # One fetch per bucket: an eager concatenate would add a distinct
        # device program per bucket-shape combination, each paying the
        # executable-load cost through the tunnel (BASELINE.md round-3).
        for part in parts:
            copy_async = getattr(part, "copy_to_host_async", None)
            if copy_async is not None:
                copy_async()
        return parts, layout

    def _unpack_chunk(self, parts, layout, images):
        from ..ops.segment_measure import split_canvas_stats

        results = [None] * len(images)
        stats_out = [None] * len(images)
        for part, (
            key, idxs, Bo, Cout, with_stats, S_el, pack, wrungs
        ) in zip(parts, layout):
            Hq, Wq = key[2:4]
            if with_stats:
                block, small, extremes = split_canvas_stats(
                    part, Bo, Hq, Wq, Cout, elems=S_el
                )
                for bi, i in enumerate(idxs):
                    stats_out[i] = {
                        "raw_area": small[:, 0, bi],
                        "area": small[:, 1, bi],
                        "axis_major_length": small[:, 2, bi],
                        "overflow": small[:, 3, bi] > 0,
                        "extremes": extremes[:, bi],
                    }
            elif S_el is not None:
                block = np.asarray(part)[:S_el]
            else:
                block = np.asarray(part).reshape(Bo, Hq, Wq, Cout)
            for bi, i in enumerate(idxs):
                h, w = images[i].shape[:2]
                # Keep the transfer dtype: casting to f32 here and back to
                # f16 at the h5 writer cost two full canvas copies per
                # object (round-4 profile). Consumers threshold/compare,
                # which is dtype-agnostic; the one contiguous copy detaches
                # the object from the bucket block.
                if S_el is not None:
                    # Byte-packed: object bi's (h, Wr, Cout) region at
                    # element offset coff[bi], cropped to its true width.
                    coff, wsel = pack
                    Wr = wrungs[wsel[bi]]
                    o = coff[bi]
                    results[i] = np.ascontiguousarray(
                        block[o : o + h * Wr * Cout].reshape(h, Wr, Cout)[
                            :, :w
                        ]
                    )
                else:
                    results[i] = np.ascontiguousarray(block[bi, :h, :w])
        return results, stats_out

    # NOTE (round-4 negative result, measured twice on the 24-frame
    # haul): moving the blocking device→host materialization onto a
    # worker thread to overlap it with the main thread's decode/DEFLATE/
    # archive work made the steady semseg stage SLOWER, not faster —
    # 3.7 s with dispatch+fetch on the worker, 3.4 s with dispatch on the
    # main thread and only np.asarray on the worker, vs 3.0 s fully
    # synchronous. The PJRT client serializes transfers, so a dedicated
    # fetch thread only added hand-off latency. (Round-5 probe,
    # tools/probe_gil_fetch.py: the copy-out itself does NOT hold the
    # GIL — so the right overlap is downstream consumer threads working
    # through this producer's fetch wait, which the chunk-sized
    # StreamBuffer after this node provides.) Keep fetches synchronous at
    # emit() time; async pipelining is provided by `in_flight` chunks of
    # DISPATCHED (not yet fetched) work, which does let the device start
    # chunk k+1 while chunk k drains. Details: BASELINE.md round-4/5.
    def transform_stream(self, stream: Stream) -> Stream:
        pending = collections.deque()
        chunk_objs: List = []
        chunk_imgs: List = []

        def flush():
            nonlocal chunk_objs, chunk_imgs
            if not chunk_objs:
                return
            out, layout = self._run_chunk(chunk_imgs)
            pending.append((chunk_objs, chunk_imgs, out, layout))
            chunk_objs, chunk_imgs = [], []

        def emit():
            objs, imgs, out, layout = pending.popleft()
            results, stats = self._unpack_chunk(out, layout, imgs)
            for obj, pred, st in zip(objs, results, stats):
                obj[self.output_vars[0]] = pred
                obj[self.output_vars[1]] = st
                yield obj

        with closing_if_closable(stream):
            for obj in stream:
                img = np.asarray(self.prepare_input(obj, "image"))
                chunk_objs.append(obj)
                chunk_imgs.append(img)
                if len(chunk_objs) >= self.chunk_size:
                    flush()
                while len(pending) > self.in_flight:
                    yield from emit()
            flush()
            while pending:
                yield from emit()
