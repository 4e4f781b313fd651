"""Device segmentation strategies for the LOKI pipeline.

The three execution strategies for model-based re-segmentation, split out
of :mod:`.pipeline` (which keeps the stream builders, dedup, annotation
merge, and the Runner):

* :func:`build_jax_segmentation` — the stage builder: stitch -> tiles ->
  inference -> postprocess -> region extraction (reference call stack
  ``maze_ipp/loki/pipeline.py:1107-1248``, SURVEY.md §3.1).
* :class:`DeviceTiledSegmentation` — the fused device path: tile
  inference + linear blend + frame postprocess + crop extraction composed
  into few jitted programs; predictions never leave the chip.
* :class:`DeviceFramePostprocess` — the host-blend fallback: the blended
  prediction arrives from host, the postprocess chain (morphology -> CCL ->
  fused region measurement) runs as one device program per frame group.

Everything here is TPU-first engineering with no reference analog: the
reference runs per-frame scikit-image on host threads.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..common import round_ladder as _round_ladder
from ..dataio import EcotaxaWriter
from ..engine import (
    Call,
    Filter,
    Node,
    Output,
    RawOrVariable,
    ReturnOutputs,
    Stitch,
    Stream,
    StreamBuffer,
    StreamObject,
    TiledPipeline,
    Variable,
)
from ..engine.image import (
    CalculateZooProcessFeatures,
    ExtractROI,
    FindRegions,
    RegionInfo,
)
from ..ops.merge_labels import merge_labels
from .config_schema import (
    JaxSegmentationConfig,
    SegmentationPostprocessingConfig,
)
from .meta import format_object_id

logger = logging.getLogger(__name__)


def _make_frame_chain(
    cfg: SegmentationPostprocessingConfig,
    *,
    include_labels: bool = True,
    compute_filled: bool = False,
):
    """Build the jitted frame postprocess: mask → morphology → CCL →
    [clear_border] → [remove_small] → fused region measurement.

    Returns ``(chain, pack_keys)``. ``pack_keys`` is the packed-props key
    order (sorted, histogram excluded); it is filled at the chain's first
    trace and owned by this chain instance, so two chains with different
    prop configurations in one process unpack independently.

    The chain returns ONE flat f32 buffer — counts + the packed (K, R)
    statistics + histograms, prefixed by the label frames when
    ``include_labels`` — so a frame group costs a single device→host
    transfer: each fetch through this host's TPU tunnel costs ~4.8 s
    fixed latency regardless of size and transfers dominated the e2e
    profile (BASELINE.md round-2 findings). With ``include_labels=False``
    the chain returns ``(labels, flat)`` and the labels stay on device
    (for device-side crop extraction, :mod:`..ops.crops`).

    ``compute_filled`` adds per-region ``area_filled`` (+ an
    ``area_filled_ambiguous`` flag) from one frame-level background-CCL
    pass (:func:`..ops.fill_holes.region_filled_extra`), replacing the
    reference's per-crop ``binary_fill_holes``.

    The (chain, pack_keys) pair is memoized process-wide on the
    trace-relevant config (:mod:`..jit_cache`): a service that runs many
    task files would otherwise re-pay the remote executable LOAD for the
    heaviest program in the pipeline on every run.
    """
    import jax

    from ..jit_cache import get_program

    use_pallas = cfg.pallas_kernels and jax.default_backend() == "tpu"
    key = (
        "loki_frame_chain",
        cfg.opening_radius,
        cfg.closing_radius,
        cfg.clear_border,
        cfg.min_area,
        cfg.max_regions,
        use_pallas,
        include_labels,
        compute_filled,
    )
    return get_program(
        key,
        lambda: _build_frame_chain(
            cfg,
            use_pallas=use_pallas,
            include_labels=include_labels,
            compute_filled=compute_filled,
        ),
    )


def _build_frame_chain(
    cfg: SegmentationPostprocessingConfig,
    *,
    use_pallas: bool,
    include_labels: bool,
    compute_filled: bool,
):
    import jax
    import jax.numpy as jnp

    from ..ops import label as lm
    from ..ops import morphology as morph
    from ..ops.fill_holes import region_filled_extra
    from ..ops.regionprops_fused import regionprops_fused

    # use_pallas (resolved by the caller): the Pallas CCL lane scans are
    # the fastest steady-state chain (round-3 perf_lab: 22.3 vs 37.8
    # ms/batch with the XLA scans), but each pallas_call instance costs a
    # Mosaic kernel compilation at trace time (~45 s through this host's
    # remote tunnel, uncacheable) — streaming runs that trace once per
    # process default to the pure-XLA formulations. Opt in via
    # cfg.pallas_kernels. Region measurement always uses the XLA one-hot
    # formulation: the Pallas props kernel pays a 4×-lane-padding tax and
    # lost its round-2 advantage after the lowering fixes (43.6 vs 22.3
    # ms/batch composed; BASELINE.md round-3, kept as a negative result
    # like attic/pallas_norm.py).
    pack_keys: list = []

    @jax.jit
    def chain(pred, image):
        mask = pred > 0.5
        if cfg.opening_radius > 0:
            mask = morph.binary_opening(mask, cfg.opening_radius)
        if cfg.closing_radius > 0:
            mask = morph.binary_closing(mask, cfg.closing_radius)
        labels, n = lm.label(mask, connectivity=2, pallas=use_pallas)
        if cfg.clear_border:
            labels, n = lm.clear_border(labels, num_segments=4 * cfg.max_regions)
        if cfg.min_area > 0:
            labels, n = lm.remove_small_objects(
                labels, cfg.min_area, num_segments=4 * cfg.max_regions
            )
        props = regionprops_fused(
            labels,
            image,
            num_segments=cfg.max_regions,
            compute_histogram=True,
        )
        if compute_filled:
            extra, ambiguous = region_filled_extra(
                labels,
                num_segments=cfg.max_regions,
                bg_segments=4 * cfg.max_regions,
            )
            props["area_filled"] = props["area"] + extra
            props["area_filled_ambiguous"] = ambiguous.astype(jnp.float32)
        keys = sorted(k for k in props if k != "histogram")
        if not pack_keys:
            pack_keys.extend(keys)
        packed = jnp.stack([props[k] for k in keys])
        parts = [
            n.astype(jnp.float32).reshape(-1),
            packed.reshape(-1),
            props["histogram"].reshape(-1),
        ]
        if include_labels:
            # Label ids ≤ 4·max_regions are exact in f32.
            parts.insert(0, labels.astype(jnp.float32).reshape(-1))
            return jnp.concatenate(parts)
        return labels, jnp.concatenate(parts)

    return chain, pack_keys


def _unpack_frame_result(dev_out, Hp, Wp, H, W, pack_keys):
    """Fetch + unpack one frame's device results (ONE transfer)."""
    flat = np.asarray(dev_out)
    K = len(pack_keys)
    R = (flat.size - Hp * Wp - 1) // (K + 256)
    o = Hp * Wp
    labels = flat[:o].reshape(Hp, Wp)[:H, :W].astype(np.int32)
    n = int(flat[o])
    o += 1
    packed = flat[o : o + K * R].reshape(K, R)
    o += K * R
    props = {k: packed[i] for i, k in enumerate(pack_keys)}
    props["histogram"] = flat[o:].reshape(R, 256)
    return labels, n, props


def _unpack_frame_batch(dev_out, dims, Hb, Wb, B, pack_keys):
    """Fetch + unpack a frame GROUP's device results (ONE transfer)."""
    flat = np.asarray(dev_out)
    K = len(pack_keys)
    R = (flat.size - B * Hb * Wb - B) // (B * (K + 256))
    o = B * Hb * Wb
    labels_all = flat[:o].reshape(B, Hb, Wb)
    n_all = flat[o : o + B]
    o += B
    packed_all = flat[o : o + K * B * R].reshape(K, B, R)
    o += K * B * R
    hist_all = flat[o:].reshape(B, R, 256)
    out = []
    for b, (H, W) in enumerate(dims):
        labels = labels_all[b, :H, :W].astype(np.int32)
        props = {k: packed_all[i, b] for i, k in enumerate(pack_keys)}
        props["histogram"] = hist_all[b]
        out.append((labels, int(n_all[b]), props))
    return out


def _unpack_stats_batch(dev_out, B, pack_keys):
    """Unpack a frame GROUP's labels-free stats buffer (ONE transfer)."""
    flat = np.asarray(dev_out)
    K = len(pack_keys)
    R = (flat.size - B) // (B * (K + 256))
    n_all = flat[:B]
    o = B
    packed_all = flat[o : o + K * B * R].reshape(K, B, R)
    o += K * B * R
    hist_all = flat[o:].reshape(B, R, 256)
    out = []
    for b in range(B):
        props = {k: packed_all[i, b] for i, k in enumerate(pack_keys)}
        props["histogram"] = hist_all[b]
        out.append((int(n_all[b]), props))
    return out


def _finalize_frame(labels, n, props, post_cfg):
    """Shared host-side epilogue: overflow warning + optional bridge merge."""
    if n >= post_cfg.max_regions:
        # Not a data loss: regions beyond the device budget are recovered
        # by the host fallback (_host_overflow_regions / the label>=R
        # branch of FindRegions), which is slower per region.
        logger.warning(
            "Frame has %d regions, exceeding max_regions=%d; the excess "
            "is measured on the host (slow path) — raise max_regions if "
            "this happens often.",
            n,
            post_cfg.max_regions,
        )
    if post_cfg.merge_segments_distance > 0:
        labels = merge_labels(labels, max_distance=post_cfg.merge_segments_distance)
        props = None  # stale after merging; re-measure per crop
    return labels, props, n


def _build_compose(B: int, Hb: int, Wb: int, CH: int, CW: int):
    """Device frame composition from row-packed crops.

    Stitched LOKI frames are ~99% background (a handful of vignettes
    pasted on black), yet the dense (B, Hb, Wb) group buffer crossed the
    bandwidth-bound host→device link (~31 MB per 24-frame haul at
    20-80 MB/s). Crops ride up row-packed instead and the device pastes
    them — exact ``Stitch`` semantics: crop order, last-write-wins,
    zero background (``engine/stitch.py:77-78``). Composition happens
    into a (CH, CW)-padded canvas so ``dynamic_update_slice`` can never
    clamp (a clamped start would silently shift a paste)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def compose(rows, cb, cy, cx, coff, chs, cws):
        canvas = jnp.zeros((B, Hb + CH, Wb + CW), rows.dtype)
        ridx = jnp.arange(CH, dtype=jnp.int32)[:, None]
        cidx = jnp.arange(CW, dtype=jnp.int32)[None, :]

        def body(j, canvas):
            src = jax.lax.dynamic_slice(rows, (coff[j], 0), (CH, CW))
            mask = (ridx < chs[j]) & (cidx < cws[j])
            cur = jax.lax.dynamic_slice(
                canvas, (cb[j], cy[j], cx[j]), (1, CH, CW)
            )[0]
            return jax.lax.dynamic_update_slice(
                canvas, jnp.where(mask, src, cur)[None], (cb[j], cy[j], cx[j])
            )

        canvas = jax.lax.fori_loop(0, cb.shape[0], body, canvas)
        return canvas[:, :Hb, :Wb]

    return compose


def _build_loki_blend(Hp: int, Wp: int, ts: int, B: int, wt):
    """The jitted tile→frame blend for one (bucket, tile, frame-group)
    shape combination; see ``DeviceTiledSegmentation._build``."""
    import jax
    import jax.numpy as jnp

    def edge_zero(pred, hs, ws):
        # The model may score the zero padding above 0.5; frame b ends
        # at (hs[b], ws[b]).
        rows = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)[None]
        cols = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)[None]
        valid = (rows < hs[:, None, None]) & (cols < ws[:, None, None])
        return jnp.where(valid, pred, 0.0)

    @jax.jit
    def blend(pred_chunks, tb, ty, tx, n_occ, hs, ws):
        # Tuple of (bs, ts, ts) prediction chunks of the occupied
        # tiles, blended at dynamic offsets; pad jobs carry zero
        # weight. Pixels covered only by skipped (empty) tiles keep
        # wsum 0 → pred 0, matching the host path's skip-empty Filter
        # semantics (reference loki/pipeline.py:518). Taking the
        # chunks as a pytree argument (instead of an eager
        # concatenate) avoids an extra device program; the heavy
        # postprocess chain stays its own single program (one load)
        # while this small blend re-specializes per tile-count rung.
        pred_t = jnp.concatenate(pred_chunks, axis=0)
        canvas = jnp.zeros((B, Hp, Wp), jnp.float32)
        wsum = jnp.zeros((B, Hp, Wp), jnp.float32)

        def body(i, cw):
            canvas, wsum = cw
            b, y, x = tb[i], ty[i], tx[i]
            w = jnp.where(i < n_occ, wt, np.float32(0.0))
            cs = jax.lax.dynamic_slice(canvas, (b, y, x), (1, ts, ts))[0]
            vs = jax.lax.dynamic_slice(wsum, (b, y, x), (1, ts, ts))[0]
            canvas = jax.lax.dynamic_update_slice(
                canvas, (cs + pred_t[i] * w)[None], (b, y, x)
            )
            wsum = jax.lax.dynamic_update_slice(
                wsum, (vs + w)[None], (b, y, x)
            )
            return canvas, wsum

        canvas, wsum = jax.lax.fori_loop(
            0, pred_t.shape[0], body, (canvas, wsum)
        )
        pred = canvas / jnp.maximum(wsum, 1.0)
        return edge_zero(pred, hs, ws)

    return blend


@ReturnOutputs
class DeviceTiledSegmentation(Node):
    """Fused tile inference → on-device linear blend → frame postprocess.

    The composed path (``TiledPipeline{JaxInference}`` → host blend →
    :class:`DeviceFramePostprocess`) moves every tile's prediction to the
    host and the blended frame back to the device. Profiled on this host
    (BASELINE.md round-2): device→host fetches ran at ~16 MB/s through the
    TPU tunnel and took 56 of 91 s of the loki stage. Here the predictions
    never leave the chip: per frame the host uploads one uint8 frame and
    downloads uint16 labels + the packed per-region measurements.

    Frames are processed in groups of ``frame_batch`` (same shape bucket):
    the chain's CCL/scan stages are latency-bound, so a batch of 8 frames
    costs barely more device time than one, and the group shares one
    device→host fetch (~4 s fixed latency per fetch measured through this
    host's tunnel).

    Parity: tile starts (:func:`..engine.tiles._tile_starts`), separable
    ramp weights (:func:`..engine.tiles._linear_weight`), and the
    postprocess chain (:func:`_make_frame_chain`) are exactly the host
    path's; the reference's node chain is ``loki/pipeline.py:513-537`` +
    ``:396-459``.
    """

    outputs = ("labels", "props", "n_regions", "regions")

    def __init__(
        self,
        image: RawOrVariable[np.ndarray],
        model,
        config,
        postprocess_config: SegmentationPostprocessingConfig,
        mesh=None,
    ) -> None:
        self.image = image
        super().__init__()
        self._model = model
        self._cfg = config
        self._post_cfg = postprocess_config
        # Crop extraction on device requires stable labels (merging would
        # invalidate them); with merging enabled fall back to fetching the
        # label frames and slicing crops on host.
        self._crops_mode = bool(
            getattr(config, "device_crops", True)
            and postprocess_config.merge_segments_distance == 0
        )
        self._skip_empty = bool(getattr(config, "skip_empty_tiles", True))
        self._post, self._pack_keys = _make_frame_chain(
            postprocess_config,
            include_labels=not self._crops_mode,
            compute_filled=postprocess_config.merge_segments_distance == 0,
        )
        self._devices = list(mesh.devices.flat) if mesh is not None else [None]
        self._fns: Dict[Tuple[int, int], object] = {}
        self._frame_batch = max(1, getattr(config, "frame_batch", 4))
        if 0 < (config.batch_size or 8) < 8 and config.tile_size >= 512:
            logger.warning(
                "batch_size=%d with %d² tiles hits a GroupNorm small-batch "
                "cliff on TPU (measured 57.6 ms/tile at batch 4 vs 11.4 at "
                "batch 8, BASELINE.md); prefer batch_size >= 8.",
                config.batch_size,
                config.tile_size,
            )

    def _get_fn(self, H: int, W: int):
        fn = self._fns.get((H, W))
        if fn is None:
            fn = self._build(H, W)
            self._fns[(H, W)] = fn
        return fn

    def _infer_step(self):
        """One jitted model forward shared across all frames/chunks."""
        if getattr(self, "_infer", None) is None:
            import jax

            from ..jit_cache import get_program

            def build_infer():
                import jax.numpy as jnp

                from ..models.inference import default_device_pre

                apply_fn = self._model.apply

                @jax.jit
                def infer_p(params, tiles_u8):  # (bs, ts, ts) uint8
                    x = default_device_pre(tiles_u8)
                    y = jax.nn.sigmoid(apply_fn(params, x))
                    return y[..., 0].astype(jnp.float32)

                return infer_p

            # flax modules hash by architecture config, so re-running the
            # same task file reuses the loaded U-Net executable
            # (jit_cache docstring; params stay per-instance arguments).
            infer_p = get_program(
                ("loki_infer_sigmoid_f32", self._model.module), build_infer
            )

            # Params as jit ARGUMENT (closures embed device constants that
            # are fetched back at every lowering — BASELINE.md round-2),
            # but device_put ONCE PER DEVICE: numpy pytrees passed to jit
            # are re-transferred host→device on every dispatch, which
            # costs the full weight set per tile chunk on tunneled hosts.
            # Frame groups round-robin over mesh devices, so the committed
            # copy must match the chunk's device.
            params_np = self._model.params
            param_cache: Dict[object, object] = {}

            def _infer(tiles, device=None):
                p = param_cache.get(device)
                if p is None:
                    p = (
                        jax.device_put(params_np, device)
                        if device is not None
                        else jax.device_put(params_np)
                    )
                    param_cache[device] = p
                return infer_p(p, tiles)

            self._infer = _infer
        return self._infer

    def _build(self, Hb: int, Wb: int):
        """Per-BUCKET blend/postprocess programs.

        Stitched frame sizes vary slightly from frame to frame, so the
        programs specialize on a *bucketed* shape (multiples of 128 — one
        or two buckets per haul) and take the true (H, W) as traced
        scalars for edge zeroing: compiling per exact frame shape cost
        ~30 s × 24 frames through this host's tunnel (measured 738 s loki
        stage before bucketing). The model forward stays its OWN jit.

        Tiles are cut on the HOST (cheap numpy slices) and uploaded
        directly: the dominant per-process cost through this host's
        tunnel is LOADING each compiled executable onto the remote device
        (measured this round: 5-800 s per program, uncacheable, while
        execute+fetch of the same program run in ~1 s) — so the design
        minimizes the number of distinct device programs, not host copies.
        """
        import jax
        import jax.numpy as jnp

        from ..engine.tiles import _linear_weight, _tile_starts

        ts = self._cfg.tile_size
        stride = self._cfg.tile_stride
        assert Hb >= ts and Wb >= ts, (Hb, Wb, ts)
        ys = _tile_starts(Hb, ts, stride)
        xs = _tile_starts(Wb, ts, stride)
        offsets = [(y, x) for y in ys for x in xs]
        Hp, Wp = Hb, Wb
        # numpy (host) constant: a jnp array here would live on device and
        # be fetched back during every MLIR lowering (BASELINE.md round-2
        # trap; re-measured this round — warm runs stalled minutes in
        # _array_mlir_constant_handler).
        wt = _linear_weight(ts, ts)
        post = self._post
        bs = self._cfg.batch_size or 8
        infer = self._infer_step()

        B = self._frame_batch

        from ..jit_cache import get_program

        def build_blend():
            return _build_loki_blend(Hp, Wp, ts, B, wt)

        # Memoized process-wide: the blend closes over nothing but these
        # scalars + the host weight window, so re-running a task reuses
        # the loaded executables per tile-count rung (jit_cache).
        blend = get_program(("loki_blend", Hp, Wp, ts, B), build_blend)

        def build_cut():
            @jax.jit
            def cut_tiles(frames, tb, ty, tx):
                # (B, Hp, Wp) u8 frames → (len(tb), ts, ts) tile stack, a
                # lax.scan of dynamic_slice steps (TPU-friendly copies, no
                # gathers).
                def step(_, xs):
                    b, y, x = xs
                    return None, jax.lax.dynamic_slice(
                        frames, (b, y, x), (1, ts, ts)
                    )[0]

                _, tiles = jax.lax.scan(step, None, (tb, ty, tx))
                return tiles

            return cut_tiles

        # Tiles are cut ON DEVICE out of the frame stack the group already
        # uploaded: host-side cutting re-uploaded every tile (~1.3× the
        # frame bytes again — with stride overlap ~16 MB per 8-frame group
        # through a ~20 MB/s tunnel, the steady stage's dominant wait).
        # One extra small program per frame-shape bucket, shared
        # process-wide (jit_cache).
        cut_tiles = get_program(("loki_cut_tiles", Hp, Wp, ts, B), build_cut)

        def fn(frames_dev, occ, hs, ws, device=None):
            tb, ty, tx, n_occ = occ
            chunks = []
            for i in range(0, tb.shape[0], bs):
                tiles_chunk = cut_tiles(
                    frames_dev, tb[i : i + bs], ty[i : i + bs], tx[i : i + bs]
                )
                chunks.append(infer(tiles_chunk, device))
            pred = blend(tuple(chunks), tb, ty, tx, n_occ, hs, ws)
            return post(pred, frames_dev)

        return fn, offsets

    def _compose_group(self, group, Hb, Wb, dtype, device):
        """Upload a frame group as row-packed crops and compose on device
        (see :func:`_build_compose`); returns the (B, Hb, Wb) frames."""
        import jax

        from ..jit_cache import get_program

        entries = []  # (b, y, x, crop 2D)
        for b, g in enumerate(group):
            for crop, oy, ox in g[5]:
                crop = np.asarray(crop)
                if crop.ndim == 3:
                    # The stream intake slices channel 0 off 3D frames;
                    # paste-then-slice == slice-then-paste.
                    crop = crop[..., 0]
                entries.append((b, int(oy), int(ox), crop.astype(dtype, copy=False)))
        B = self._frame_batch
        CH = 1 << (max(c.shape[0] for *_, c in entries) - 1).bit_length()
        CW = max(
            128, 1 << (max(c.shape[1] for *_, c in entries) - 1).bit_length()
        )
        Ncap = _round_ladder(len(entries))
        total = sum(c.shape[0] for *_, c in entries) + CH
        S_cap = _round_ladder(total)
        rows = np.zeros((S_cap, CW), dtype)
        cb = np.zeros((Ncap,), np.int32)
        cy = np.zeros((Ncap,), np.int32)
        cx = np.zeros((Ncap,), np.int32)
        coff = np.zeros((Ncap,), np.int32)
        chs = np.zeros((Ncap,), np.int32)  # pad jobs: ch=cw=0 paste nothing
        cws = np.zeros((Ncap,), np.int32)
        off = 0
        for j, (b, y, x, crop) in enumerate(entries):
            h, w = crop.shape
            rows[off : off + h, :w] = crop
            cb[j], cy[j], cx[j], coff[j], chs[j], cws[j] = b, y, x, off, h, w
            off += h
        prog = get_program(
            ("loki_compose", B, Hb, Wb, CH, CW, str(dtype)),
            lambda: _build_compose(B, Hb, Wb, CH, CW),
        )
        rows_dev = jax.device_put(rows, device)
        return prog(rows_dev, cb, cy, cx, coff, chs, cws)

    def _plan_crops(self, stats, dims, Hp, Wp):
        """Per-region crop windows, bucketed by pow2 window size.

        Returns ``(jobs_by_bucket, region_plans)``: the device job arrays
        per (Sh, Sw) bucket, and per frame the ordered region plans
        referencing their bucket slot.
        """
        padding = int(getattr(self._cfg, "padding", 0))
        min_intensity = getattr(self._cfg, "min_intensity", None)
        R = self._post_cfg.max_regions
        buckets: Dict[Tuple[int, int], list] = {}
        region_plans = []  # per frame: list of dicts
        for b, (H, W) in enumerate(dims):
            n, props = stats[b]
            plans = []
            for r in range(1, min(n, R - 1) + 1):
                if props["area"][r] <= 0:
                    continue
                if (
                    min_intensity is not None
                    and props["intensity_max"][r] < min_intensity
                ):
                    continue
                y0b = int(props["min_row"][r])
                x0b = int(props["min_col"][r])
                y1b = int(props["max_row"][r])
                x1b = int(props["max_col"][r])
                py0 = max(0, y0b - padding)
                px0 = max(0, x0b - padding)
                py1 = min(H, y1b + padding)
                px1 = min(W, x1b + padding)
                h, w = py1 - py0, px1 - px0
                Sh = min(1 << max(6, (h - 1).bit_length()), Hp)
                Sw = min(1 << max(7, (w - 1).bit_length()), Wp)
                wy = min(py0, Hp - Sh)
                wx = min(px0, Wp - Sw)
                key = (Sh, Sw)
                slot = len(buckets.setdefault(key, []))
                buckets[key].append((r, b, wy, wx))
                plans.append(
                    dict(
                        label=r,
                        bbox=(y0b, x0b, y1b, x1b),
                        bbox_padded=(py0, px0, py1, px1),
                        bucket=key,
                        slot=slot,
                        win=(wy, wx),
                    )
                )
            region_plans.append(plans)
        return buckets, region_plans

    def _start_crops(self, labels_dev, frames_dev, stats, dims,
                     frames_host=None):
        """Phase A: plan windows, dispatch the extract programs, start the
        device→host copies. Returns the in-flight state consumed by
        :meth:`_finish_crops`, so the caller can overlap the copies with
        the previous group's host-side region assembly (the steady loki
        stage was ~60% device-fetch wait before this split).

        With ``frames_host`` (the same stitched frames the caller uploaded,
        still in host memory) only the mask bits are extracted on device —
        intensity windows are sliced from the host copy, HALVING the crop
        fetch (the largest remaining steady cost through tunneled hosts).
        """
        from ..ops.crops import extract_region_crops

        Hp, Wp = frames_dev.shape[-2:]
        buckets, region_plans = self._plan_crops(stats, dims, Hp, Wp)
        bs = 8
        parts = []
        layout = []  # (key, Ncap)
        for key in sorted(buckets):
            jobs = buckets[key]
            Sh, Sw = key
            N = len(jobs)
            Ncap = bs * _round_ladder(-(-N // bs))
            jobs = jobs + [jobs[-1]] * (Ncap - N)
            ids = np.asarray([j[0] for j in jobs], np.int32)
            bidx = np.asarray([j[1] for j in jobs], np.int32)
            wy = np.asarray([j[2] for j in jobs], np.int32)
            wx = np.asarray([j[3] for j in jobs], np.int32)
            parts.append(
                extract_region_crops(
                    frames_dev, labels_dev, ids, bidx, wy, wx,
                    size_h=Sh, size_w=Sw,
                    include_intensity=frames_host is None,
                    # Mask-bits-only fetches also ride 4 px/byte (2-bit
                    # fields): 8x fewer crop bytes than the original
                    # two-plane scheme through the tunnel.
                    pack_bits=frames_host is not None,
                )
            )
            layout.append((key, Ncap))
        # Fetch each bucket's buffer separately: an eager concatenate would
        # be one more device program per bucket-shape combination, and each
        # distinct program pays the 5-800 s executable load through the
        # tunnel (BASELINE.md round-3).
        if os.environ.get("MAZE_ASYNC_COPY", "1") != "0":
            for part in parts:
                copy_async = getattr(part, "copy_to_host_async", None)
                if copy_async is not None:
                    copy_async()
        return (labels_dev, frames_dev, frames_host, stats, dims,
                region_plans, layout, parts)

    def _finish_crops(self, crop_state):
        """Phase B: wait for the copies and assemble RegionInfo objects."""
        (labels_dev, frames_dev, frames_host, stats, dims, region_plans,
         layout, parts) = crop_state
        R = self._post_cfg.max_regions
        any_overflow = any(stats[b][0] > R - 1 for b in range(len(dims)))
        if not parts and not any_overflow:
            return [[] for _ in dims]
        views = {}
        for (key, Ncap), part in zip(layout, parts):
            Sh, Sw = key
            fp = np.asarray(part)
            sz = Ncap * Sh * Sw
            if frames_host is None:
                views[key] = (
                    fp[:sz].reshape(Ncap, Sh, Sw),
                    fp[sz : 2 * sz].reshape(Ncap, Sh, Sw),
                )
            else:
                # 2-bit-packed mask bytes, 4 px each (see
                # extract_region_crops pack_bits).
                views[key] = (None, fp[: sz // 4].reshape(Ncap, Sh, Sw // 4))

        import scipy.ndimage as ndi

        # Frames with more regions than the fused pass measures (label ids
        # >= max_regions) fall back to host extraction for the overflow,
        # matching FindRegions._iter_regions' host path so device-crops
        # mode never silently exports fewer objects (round-3 review).
        labels_host = None
        overflow_frames = frames_host
        if any_overflow:
            labels_host = np.asarray(labels_dev)
            if overflow_frames is None:
                overflow_frames = np.asarray(frames_dev)

        regions_per_frame = []
        for b, plans in enumerate(region_plans):
            _, props = stats[b]
            amb = props.get("area_filled_ambiguous")
            filled = props.get("area_filled")
            regions = []
            for p in plans:
                r = p["label"]
                imgs_v, bits_v = views[p["bucket"]]
                wy, wx = p["win"]
                py0, px0, py1, px1 = p["bbox_padded"]
                sy, sx = py0 - wy, px0 - wx
                hh, ww = py1 - py0, px1 - px0
                if imgs_v is None:
                    win_i = frames_host[b, py0:py1, px0:px1]
                    # Unpack the 2-bit fields of just this window through
                    # the LUT (byte columns cover [sx, sx+ww) rounded out).
                    from ..ops.crops import UNPACK_LUT

                    xb0, xb1 = sx // 4, -(-(sx + ww) // 4)
                    pb = bits_v[p["slot"], sy : sy + hh, xb0:xb1]
                    win_b = UNPACK_LUT[pb].reshape(hh, -1)[
                        :, sx - 4 * xb0 : sx - 4 * xb0 + ww
                    ]
                else:
                    win_i = imgs_v[p["slot"], sy : sy + hh, sx : sx + ww]
                    win_b = bits_v[p["slot"], sy : sy + hh, sx : sx + ww]
                mask = (win_b & 1) > 0
                other = (win_b & 2) > 0
                props_r = {
                    k: (v[..., r, :] if k == "histogram" else v[..., r])
                    for k, v in props.items()
                }
                if filled is not None and not (amb is not None and amb[r] > 0):
                    area_filled = float(filled[r])
                else:
                    area_filled = float(ndi.binary_fill_holes(mask).sum())
                regions.append(
                    RegionInfo(
                        r,
                        p["bbox"],
                        p["bbox_padded"],
                        mask,
                        win_i.copy(),
                        props_r,
                        area_filled,
                        other_mask=other,
                    )
                )
            n, _ = stats[b]
            if n > R - 1 and labels_host is not None:
                regions.extend(
                    self._host_overflow_regions(
                        labels_host[b], overflow_frames[b], dims[b], int(n)
                    )
                )
            regions_per_frame.append(regions)
        return regions_per_frame

    def _host_overflow_regions(self, labels_p, frame_p, dim, n):
        """Host extraction of regions the fused pass could not measure
        (label >= max_regions), mirroring FindRegions._iter_regions'
        host-props fallback (engine/image.py)."""
        import scipy.ndimage as ndi

        from ..ops.host_props import host_region_props

        H, W = dim
        labels = np.asarray(labels_p)[:H, :W]
        frame = np.asarray(frame_p)[:H, :W]
        padding = int(getattr(self._cfg, "padding", 0))
        min_intensity = getattr(self._cfg, "min_intensity", None)
        R = self._post_cfg.max_regions
        out = []
        slices = ndi.find_objects(labels)
        for idx in range(R - 1, min(n, len(slices))):
            sl = slices[idx]
            if sl is None:
                continue
            label = idx + 1
            bbox = (sl[0].start, sl[1].start, sl[0].stop, sl[1].stop)
            py0 = max(0, bbox[0] - padding)
            px0 = max(0, bbox[1] - padding)
            py1 = min(H, bbox[2] + padding)
            px1 = min(W, bbox[3] + padding)
            lab_crop = labels[py0:py1, px0:px1]
            mask = lab_crop == label
            inten = frame[py0:py1, px0:px1]
            if (
                min_intensity is not None
                and float(np.max(inten[mask], initial=0)) < min_intensity
            ):
                continue
            props = {k: v[1] for k, v in host_region_props(mask, inten).items()}
            for key, off in (
                ("min_row", py0),
                ("max_row", py0),
                ("centroid_row", py0),
                ("weighted_centroid_row", py0),
                ("min_col", px0),
                ("max_col", px0),
                ("centroid_col", px0),
                ("weighted_centroid_col", px0),
            ):
                if key in props:
                    props[key] = props[key] + off
            out.append(
                RegionInfo(
                    label,
                    bbox,
                    (py0, px0, py1, px1),
                    mask,
                    inten.copy(),
                    props,
                    float(ndi.binary_fill_holes(mask).sum()),
                    other_mask=(lab_crop > 0) & ~mask,
                )
            )
        return out

    class _Entry:
        """One dispatched frame group awaiting emission."""

        __slots__ = ("objs", "out", "frames_dev", "frames_host", "dims",
                     "key", "started", "results", "n_left")

        def __init__(self, objs, out, frames_dev, frames_host, dims, key):
            self.objs = objs
            self.out = out
            self.frames_dev = frames_dev
            # The stitched frames as uploaded, kept on host so crop
            # intensity windows are sliced here instead of fetched back.
            self.frames_host = frames_host
            self.dims = dims
            self.key = key
            self.started = None
            self.results = None
            self.n_left = len(objs)

    class _Holder:
        """An arrived frame's slot in the arrival-order reorder buffer."""

        __slots__ = ("key", "entry", "slot")

        def __init__(self, key):
            self.key = key
            self.entry = None
            self.slot = None

    def transform_stream(self, stream: Stream) -> Stream:
        import collections

        import jax

        from ..engine.core import closing_if_closable

        in_flight = 2 * len(self._devices)
        pending: "collections.deque" = collections.deque()  # dispatch order
        arrival: "collections.deque" = collections.deque()  # _Holder, arrival order
        # One OPEN group per shape bucket: stitched LOKI frame sizes vary
        # from frame to frame, and flushing on every key change (the
        # previous design) split a haul into many PARTIAL groups, each
        # paying the fixed per-dispatch costs (blend program, stats fetch,
        # ~25 ms tunnel dispatch latency) — measured 5 flushes instead of
        # 3 on the 24-frame bench haul. Objects still leave this node in
        # exact arrival order via the reorder buffer (dedup downstream
        # compares consecutive frames).
        open_groups: Dict[Tuple[int, int], list] = {}
        group_idx = 0
        B = self._frame_batch
        bs = self._cfg.batch_size or 8

        def start(entry):
            # Phase A of crop extraction for a pending group: dispatch the
            # extract programs and start their device→host copies, so the
            # copies ride the tunnel while the host assembles the previous
            # group's regions.
            if not self._crops_mode or entry.started is not None:
                return
            labels_dev, stats_fut = entry.out
            stats = _unpack_stats_batch(stats_fut, B, self._pack_keys)
            entry.started = (
                stats,
                self._start_crops(labels_dev, entry.frames_dev, stats,
                                  entry.dims,
                                  frames_host=entry.frames_host),
            )

        def finish(entry):
            if entry.results is not None:
                return entry.results
            start(entry)
            # Prefetch: phase A of the next un-started flushed group.
            for nxt in pending:
                if nxt is not entry and nxt.started is None:
                    start(nxt)
                    break
            results = []
            if self._crops_mode:
                stats, crop_state = entry.started
                regions_per_frame = self._finish_crops(crop_state)
                for b in range(len(entry.objs)):
                    n, props = stats[b]
                    _, props, n = _finalize_frame(None, n, props,
                                                  self._post_cfg)
                    results.append((None, props, n, regions_per_frame[b]))
            else:
                Hb, Wb = entry.key
                for labels, n, props in _unpack_frame_batch(
                    entry.out, entry.dims, Hb, Wb, B, self._pack_keys
                ):
                    labels, props, n = _finalize_frame(
                        labels, n, props, self._post_cfg
                    )
                    results.append((labels, props, n, None))
            entry.results = results
            return results

        def flush_group(key):
            nonlocal group_idx
            group = open_groups.pop(key, None)
            if not group:
                return
            Hb, Wb = key
            objs = [g[0] for g in group]
            dims = [(g[2], g[3]) for g in group]
            imgs = np.zeros((B, Hb, Wb), group[0][1].dtype)
            hs = np.zeros((B,), np.int32)
            ws = np.zeros((B,), np.int32)
            for b, (_, image, H, W, *_rest) in enumerate(group):
                imgs[b, :H, :W] = image
                hs[b], ws[b] = H, W
            fn, offsets = self._get_fn(Hb, Wb)
            device = self._devices[group_idx % len(self._devices)]
            group_idx += 1
            # Sparse upload: stitched frames are ~99% background, so when
            # every member carries its source crops (zero fill), upload
            # only those and compose on device. The dense host buffer
            # `imgs` stays for skip-empty + crop intensity slicing.
            if (
                os.environ.get("MAZE_DEVICE_COMPOSE", "1") != "0"
                and all(g[5] is not None and g[6] == 0 for g in group)
            ):
                imgs_dev = self._compose_group(
                    group, Hb, Wb, imgs.dtype, device
                )
            else:
                imgs_dev = jax.device_put(imgs, device)
            ts = self._cfg.tile_size
            # Tiles are cut on the host: skip-empty keeps only tiles with
            # any nonzero pixel (reference loki/pipeline.py:518); without
            # it every tile of every frame runs.
            jobs = [
                (b, oy, ox)
                for b in range(B)
                for oy, ox in offsets
                if not self._skip_empty
                or imgs[b, oy : oy + ts, ox : ox + ts].any()
            ]
            N = len(jobs)
            Ncap = bs * _round_ladder(-(-max(N, 1) // bs))
            jobs = jobs + [(0, 0, 0)] * (Ncap - N)
            occ = (
                np.asarray([j[0] for j in jobs], np.int32),
                np.asarray([j[1] for j in jobs], np.int32),
                np.asarray([j[2] for j in jobs], np.int32),
                np.asarray(N, np.int32),
            )
            out = fn(imgs_dev, occ, hs, ws, device=device)
            # Start the device→host copy of the small stats buffer early so
            # the transfer overlaps with later dispatches.
            if os.environ.get("MAZE_ASYNC_COPY", "1") != "0":
                stats_fut = out[1] if self._crops_mode else out
                copy_async = getattr(stats_fut, "copy_to_host_async", None)
                if copy_async is not None:
                    copy_async()
            entry = self._Entry(objs, out, imgs_dev, imgs, dims, key)
            for b, (_, _, _, _, h, *_rest) in enumerate(group):
                h.entry = entry
                h.slot = b
            pending.append(entry)

        def emit_one():
            h = arrival.popleft()
            if h.entry is None:
                # The arrival head's group is still open (rare size that
                # never filled): force a partial flush to honor ordering.
                flush_group(h.key)
            entry = h.entry
            labels, props, n, regions = finish(entry)[h.slot]
            obj = entry.objs[h.slot]
            self.prepare_output(obj, labels, props, n, regions)
            entry.n_left -= 1
            if entry.n_left == 0:
                pending.remove(entry)
                # Release the device buffers as soon as the group is done.
                entry.out = entry.frames_dev = entry.started = None
                entry.frames_host = None
            return obj

        def total_buffered():
            return sum(len(g) for g in open_groups.values()) + sum(
                e.n_left for e in pending
            )

        with closing_if_closable(stream):
            for obj in stream:
                raw = self.prepare_input(obj, "image")
                # Captured BEFORE np.asarray/[..., 0] (both drop subclass
                # attributes): the stitched frame's source crops, for the
                # sparse device-compose upload in flush_group.
                sources = getattr(raw, "sources", None)
                fill = getattr(raw, "fill_value", 0)
                image = np.asarray(raw)
                if image.ndim == 3:
                    image = image[..., 0]
                H, W = image.shape
                ts = self._cfg.tile_size
                # Coarse buckets: every distinct (Hb, Wb) compiles the
                # extract + blend/postprocess programs (~minutes through
                # this host's tunnel), so collapse a haul's slightly-varying
                # stitched sizes into as few shapes as possible.
                Hb = -(-max(H, ts) // 256) * 256
                Wb = -(-max(W, ts) // 256) * 256
                key = (Hb, Wb)
                h = self._Holder(key)
                arrival.append(h)
                open_groups.setdefault(key, []).append(
                    (obj, image, H, W, h, sources, fill)
                )
                if len(open_groups[key]) >= B:
                    flush_group(key)
                # Emit while enough groups are in flight AND the arrival
                # head is already flushed (don't force partial flushes
                # just to drain).
                while (
                    len(pending) > in_flight
                    and arrival
                    and arrival[0].entry is not None
                ):
                    yield emit_one()
                # Hard cap on buffered frames: bounds memory and the
                # latency of rare-size frames (may force a partial flush).
                while total_buffered() > (in_flight + 2) * B:
                    yield emit_one()
            # Stream ended: every open group is final — dispatch them all
            # NOW so their device work overlaps the drain's host-side
            # region assembly instead of starting (device idle) when their
            # first holder reaches the arrival head.
            for key in list(open_groups):
                flush_group(key)
            while arrival:
                yield emit_one()

    def _input_names(self):
        return ("image",)


@ReturnOutputs
class DeviceFramePostprocess(Node):
    """Fused device post-processing of one full frame per dispatch.

    binarize → opening → closing → label(8) → [clear_border] →
    [remove_small] → fused region measurement, all inside one jitted XLA
    program (compiled per frame-size bucket). Replaces the reference's
    host-side chain at ``loki/pipeline.py:396-459``.
    """

    outputs = ("labels", "props", "n_regions")

    def __init__(
        self,
        pred: RawOrVariable[np.ndarray],
        image: RawOrVariable[np.ndarray],
        config: SegmentationPostprocessingConfig,
        bucket: int = 256,
        mesh=None,
    ) -> None:
        self.pred = pred
        self.image = image
        self.config = config
        self.bucket = bucket
        super().__init__()

        import jax

        # Frames are independent: with a mesh, round-robin whole frames over
        # its devices (throughput parallelism without collectives; dispatch
        # is async so all chips run concurrently).
        self._devices = list(mesh.devices.flat) if mesh is not None else [None]

        self._chain, self._pack_keys = _make_frame_chain(
            config, compute_filled=config.merge_segments_distance == 0
        )

    def transform_stream(self, stream):
        import collections

        from ..engine.core import closing_if_closable

        import jax

        # Keep up to `in_flight` frames dispatched-but-unfetched: JAX async
        # dispatch overlaps device work with the host stages around us (and
        # keeps every mesh device busy when frames are round-robined).
        in_flight = 2 * len(self._devices)
        pending: "collections.deque" = collections.deque()
        frame_idx = 0

        def emit(entry):
            obj, dev_out, (H, W) = entry
            Hp = -(-H // self.bucket) * self.bucket
            Wp = -(-W // self.bucket) * self.bucket
            labels, n, props = _unpack_frame_result(
                dev_out, Hp, Wp, H, W, self._pack_keys
            )
            labels, props, n = _finalize_frame(labels, n, props, self.config)
            self.prepare_output(obj, labels, props, n)
            return obj

        with closing_if_closable(stream):
            for obj in stream:
                pred = np.asarray(self.prepare_input(obj, "pred"))
                image = np.asarray(self.prepare_input(obj, "image"))
                H, W = pred.shape[:2]
                Hp = -(-H // self.bucket) * self.bucket
                Wp = -(-W // self.bucket) * self.bucket
                pred_p = np.zeros((Hp, Wp), pred.dtype)
                pred_p[:H, :W] = pred[..., 0] if pred.ndim == 3 else pred
                img_p = np.zeros((Hp, Wp), image.dtype)
                img_p[:H, :W] = image

                device = self._devices[frame_idx % len(self._devices)]
                frame_idx += 1
                if device is not None:
                    pred_p = jax.device_put(pred_p, device)
                    img_p = jax.device_put(img_p, device)
                pending.append((obj, self._chain(pred_p, img_p), (H, W)))
                while len(pending) > in_flight:
                    yield emit(pending.popleft())

            while pending:
                yield emit(pending.popleft())


def build_jax_segmentation(
    config: JaxSegmentationConfig,
    target_dir: str,
    image: Variable,
    meta: Variable,
    process_meta: Dict,
    mesh=None,
):
    """Model segmentation: stitch → tile → batched device inference →
    fused device post-processing → region extraction (SURVEY §3.1)."""
    from ..models import JaxInference, load_model

    if config.stitch:
        StreamBuffer(16)
        image = Stitch(
            image,
            groupby=Call(lambda m: m["object_frame_id"], meta),
            offset=(
                Call(lambda m: m["object_posy"], meta),
                Call(lambda m: m["object_posx"], meta),
            ),
        )
        if config.stitch.skip_single:
            Filter(Call(lambda img: img.n_regions > 1, image))
    else:
        process_meta["process_segmentation_stitch"] = False

    if config.autocast and config.dtype == "float32":
        # A reference task file combining autocast: true with float32
        # would have run mixed-precision under torch.autocast; here dtype
        # alone governs precision, so say so instead of silently running
        # full f32 (round-3 verdict, weak #6).
        logger.info(
            "autocast: true is accepted for task-file compatibility but has "
            "no effect; set dtype: bfloat16 for mixed-precision inference "
            "(currently dtype: float32 -> full precision)."
        )
    model = load_model(config.model_fn, dtype=config.dtype)
    postprocess_config = config.postprocess or SegmentationPostprocessingConfig()

    regions = None
    if config.device_blend and config.full_frame_archive_fn is None:
        # Fused device path: tile inference + linear blend + postprocess in
        # one program — predictions never leave the chip (the dominant cost
        # on tunneled hosts; BASELINE.md). The host path below is kept for
        # debug output (needs the blended pred on host) and as a fallback.
        labels, props, n_regions, regions = DeviceTiledSegmentation(
            image, model, config, postprocess_config, mesh=mesh
        )
    else:
        with TiledPipeline(
            (config.tile_size, config.tile_size),
            image,
            tile_stride=(config.tile_stride, config.tile_stride),
            blend_strategy="linear",
        ):
            # Skip empty tiles (no pixels above zero).
            Filter(Call(lambda img: bool((np.asarray(img) > 0).any()), image))

            batch_size = config.batch_size or 8
            if mesh is not None:
                # Each device needs a full shard: round the batch up.
                n_dev = mesh.devices.size
                batch_size = -(-batch_size // n_dev) * n_dev
            foreground_pred = JaxInference(
                model,
                image,
                batch_size=batch_size,
                output_key=None,
                mesh=mesh,
                # Halve the dominant fetch cost on tunneled hosts; the
                # host-side blend upcasts to f32 immediately below.
                transfer_dtype=np.float16,
            )
            # Single foreground channel: channel 0 of the sigmoid output.
            foreground_pred = Call(
                lambda p: np.asarray(p)[..., 0].astype(np.float32),
                foreground_pred,
            )

        labels, props, n_regions = DeviceFramePostprocess(
            foreground_pred, image, postprocess_config, mesh=mesh
        )

        if config.full_frame_archive_fn is not None:
            _build_full_frame_debug_output(
                config, target_dir, image, foreground_pred, labels, meta
            )
            StreamBuffer(2)

    region = FindRegions(
        labels,
        image,
        padding=config.padding,
        min_intensity=config.min_intensity,
        props=props,
        regions=regions,
    )

    def recalc_metadata(region, m):
        m = dict(m)
        y0, x0, y1, x1 = region.bbox
        m["object_posx"] = x0
        m["object_posy"] = y0
        m["object_sequence"] = int(region.label)
        m["object_width"] = x1 - x0
        m["object_height"] = y1 - y0
        m["object_id"] = format_object_id(m)
        m["object_frac_invalid"] = float(
            (np.asarray(region.image_intensity)[region.image] == 0).mean()
        )
        return m

    # Per-object host work (crop masking, metadata, ZooProcess assembly)
    # thread-parallelizes on multi-core hosts; the order-preserving
    # DataParallelPipeline keeps dedup/writers downstream correct.
    # (Reference knob: loki/config_schema.py:66-68.)
    with contextlib.ExitStack() as region_stack:
        if config.n_threads > 1:
            from ..engine import DataParallelPipeline

            region_stack.enter_context(
                DataParallelPipeline(executor=config.n_threads)
            )

        roi = ExtractROI(
            image,
            region,
            alpha=1 if config.apply_mask else 0,
            bg_color=config.background_color,
            keep_background=config.keep_background,
            labels=labels,
        )
        meta = Call(recalc_metadata, region, meta)
        meta = CalculateZooProcessFeatures(region, meta, prefix="object_")
        mask = Call(lambda r: r.image, region)

    return roi, meta, mask


def _build_full_frame_debug_output(
    config, target_dir, image, foreground_pred, labels, meta
):
    """Debug archive with input / label-overlay / score images per frame."""

    def label_overlay(lab, img):
        import cv2

        lab = np.asarray(lab)
        img = np.asarray(img)
        # Shape guard, parity with the reference's assert_compatible_shape
        # (/root/reference/maze_ipp/loki/pipeline.py:386-393).
        if lab.shape[:2] != img.shape[:2]:
            raise ValueError(
                f"labels {lab.shape} and image {img.shape} are incompatible"
            )
        norm = (lab * 37 % 255).astype(np.uint8)
        color = cv2.applyColorMap(norm, cv2.COLORMAP_JET)
        color[lab == 0] = 0
        base = np.stack([img] * 3, axis=-1) if img.ndim == 2 else img
        out = (0.5 * base + 0.5 * color).astype(np.uint8)
        out[lab == 0] = base[lab == 0]
        return out

    segment_image = Call(label_overlay, labels, image)
    score_image = Call(
        lambda p: np.clip(np.asarray(p) * 255, 0, 255).astype(np.uint8),
        foreground_pred,
    )
    archive_fn = Call(
        lambda m: os.path.join(target_dir, config.full_frame_archive_fn.format_map(m)),
        meta,
    )
    frame_id = Call(lambda m: m["object_frame_id"], meta)
    EcotaxaWriter(
        archive_fn,
        [
            ("img/" + frame_id + ".png", image),
            ("overlay/" + frame_id + ".png", segment_image),
            ("score/" + frame_id + ".png", score_image),
        ],
    )
