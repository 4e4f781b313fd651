"""HDF5 export stream node.

Capability parity with ``morphocut.hdf5.HDF5Writer`` as used at
``predict/pipeline.py:683-694``: per-object datasets (``dataset_mode=
"create"``, e.g. one dataset per object_id for tiled predictions) or
columns appended along axis 0 (``"append"``, for fixed-size feature
vectors), with gzip compression.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..engine.core import Node, RawOrVariable, Stream, closing_if_closable

logger = logging.getLogger(__name__)

__all__ = ["HDF5Writer"]


def _shuffle_bytes(arr: np.ndarray) -> bytes:
    """Apply HDF5's byte-shuffle filter (H5Z_FILTER_SHUFFLE) in numpy:
    all first bytes of the chunk's elements, then all second bytes, ..."""
    itemsize = arr.dtype.itemsize
    flat = np.ascontiguousarray(arr).view(np.uint8).reshape(-1, itemsize)
    return flat.T.tobytes()


class HDF5Writer(Node):
    """Stream objects into HDF5 files.

    Args:
        file_fn: target file path (Raw or Variable; may vary per object).
        items: ``[(name, value), ...]`` pairs. In ``create`` mode, ``name``
            is typically a Variable (e.g. object_id) naming one dataset per
            object; in ``append`` mode, names are fixed column names whose
            values are appended along the first axis.
        dataset_mode: ``"create"`` or ``"append"``.
        compression: h5py compression (e.g. ``"gzip"``).
        compression_opts: filter options (gzip: DEFLATE level 0-9;
            ``None`` = h5py's default, level 4). The level is an encoder
            knob, not a format change — any level is readable by every
            HDF5 tool.
        shuffle: byte-shuffle filter before compression (HDF5 standard
            filter, readable everywhere). On float prediction maps it
            measured both faster AND smaller than plain DEFLATE
            (1.97 → 1.54 s / 51 → 49 MB on a real 81 MB haul's maps).
        adaptive_store: when the stream's chunks measure near-incompressible
            (DEFLATE ratio EMA > 0.92), write DEFLATE *stored* blocks
            (~memcpy) instead of burning host CPU for <8% size — noisy
            float payloads ran at 11-47 MB/s through DEFLATE on this
            1-core host. Still standard gzip-filtered HDF5 (every reader
            inflates stored blocks); compressible streams are unaffected,
            and the configured level is re-probed every 32 chunks.
        file_attrs: optional ``{name: value}`` attributes written to the
            root group of every file this node creates (provenance, e.g.
            the storage dtype of raw prediction maps).
    """

    def __init__(
        self,
        file_fn: RawOrVariable[str],
        items: Sequence[Tuple[RawOrVariable[str], RawOrVariable]],
        dataset_mode: str = "create",
        compression: Optional[str] = "gzip",
        compression_opts: Optional[int] = None,
        shuffle: bool = True,
        adaptive_store: bool = True,
        file_attrs: Optional[Dict[str, object]] = None,
    ) -> None:
        if dataset_mode not in ("create", "append"):
            raise ValueError(f"Unknown dataset_mode: {dataset_mode!r}")
        self.file_fn = file_fn
        self.items = list(items)
        self.dataset_mode = dataset_mode
        self.compression = compression
        self.compression_opts = compression_opts
        self.shuffle = shuffle
        self.adaptive_store = adaptive_store
        self.file_attrs = dict(file_attrs or {})
        self._ratio_ema: Optional[float] = None
        self._stored_since_probe = 0
        super().__init__()

    def _write_direct(self, h5, name: str, value: np.ndarray, opts) -> bool:
        """Create ``name`` as one gzip(+shuffle) chunk pre-compressed with
        libdeflate; False when unavailable/unsupported (caller falls back
        to the plain h5py write path)."""
        from ..native import hdf5_chunk_pack, zlib_compress

        if value.dtype.hasobject:
            return False
        level = 4 if self.compression_opts is None else self.compression_opts
        # Adaptive stored blocks: near-incompressible streams (ratio EMA
        # > 0.92 over the probed chunks) skip the DEFLATE match search —
        # see the class docstring. Tiny chunks always compress (cost is
        # negligible and they keep the EMA fresh).
        use_level = level
        if (
            self.adaptive_store
            and level > 0
            and value.nbytes >= 4096
            and self._ratio_ema is not None
            and self._ratio_ema > 0.92
            and self._stored_since_probe < 32
        ):
            use_level = 0
        try:
            # One native call does shuffle + DEFLATE (the numpy
            # byte-transpose alone cost ~0.4 s per haul of raw maps).
            comp = hdf5_chunk_pack(value, use_level, self.shuffle)
            if comp is None:
                raw = (
                    _shuffle_bytes(value)
                    if self.shuffle
                    else np.ascontiguousarray(value).tobytes()
                )
                comp = zlib_compress(raw, use_level)
        except (TypeError, ValueError):
            return False
        if comp is None:
            return False
        if use_level == 0:
            self._stored_since_probe += 1
        elif value.nbytes >= 4096:
            ratio = len(comp) / value.nbytes
            self._ratio_ema = (
                ratio
                if self._ratio_ema is None
                else 0.7 * self._ratio_ema + 0.3 * ratio
            )
            self._stored_since_probe = 0
        import h5py
        from h5py import h5d, h5p, h5s, h5t

        if "/" in name:
            # Intermediate groups: the low-level create below doesn't make
            # them; take the (rare) high-level path.
            dset = h5.create_dataset(
                name,
                shape=value.shape,
                dtype=value.dtype,
                compression="gzip",
                compression_opts=self.compression_opts,
                shuffle=self.shuffle,
                **opts,
            )
            dset.id.write_direct_chunk((0,) * value.ndim, comp)
            return True
        # Low-level create: the high-level ``create_dataset`` costs ~1 ms
        # of Python per dataset (guess_chunk, filter-plumbing, validation)
        # — measurable at one-dataset-per-object rates (round-4 profile:
        # ~0.4 s of a 3.5 s semseg stage). The produced file is identical:
        # one whole-shape chunk, shuffle+DEFLATE(level) filters, no
        # modification-time tracking.
        dcpl = h5p.create(h5p.DATASET_CREATE)
        dcpl.set_chunk(value.shape)
        if self.shuffle:
            dcpl.set_shuffle()
        dcpl.set_deflate(level)
        if not opts.get("track_times", True):
            dcpl.set_obj_track_times(False)
        space = h5s.create_simple(value.shape)
        tid = h5t.py_create(value.dtype, logical=1)
        dsid = h5d.create(h5.id, name.encode("utf-8"), tid, space, dcpl=dcpl)
        dsid.write_direct_chunk((0,) * value.ndim, comp)
        dsid.close()
        return True

    def transform_stream(self, stream: Stream) -> Stream:
        import h5py

        files: Dict[str, "h5py.File"] = {}

        def get_file(fn: str) -> "h5py.File":
            if fn not in files:
                os.makedirs(os.path.dirname(os.path.abspath(fn)), exist_ok=True)
                files[fn] = h5py.File(fn, "w")
                for name, value in self.file_attrs.items():
                    files[fn].attrs[name] = value
            return files[fn]

        def to_array(value):
            arr = np.asarray(value)
            if arr.dtype == object or arr.dtype.kind == "U":
                arr = arr.astype("S")
            return arr

        def chunk_opts(arr):
            # One whole-shape chunk per small dataset + no modification-time
            # tracking: ~27% less per-dataset overhead at identical file
            # format (the create-mode h5 output writes one dataset per
            # object). Auto-chunking stays for large arrays (partial-read
            # friendliness) and whenever compression is off.
            if (
                self.compression is not None
                and arr.ndim >= 1
                and arr.size > 0
                and arr.nbytes <= 16 * 1024 * 1024
            ):
                return {"chunks": arr.shape, "track_times": False}
            return {}

        try:
            with closing_if_closable(stream):
                for obj in stream:
                    fn = str(self.prepare_input(obj, "file_fn"))
                    h5 = get_file(fn)

                    if self.dataset_mode == "create":
                        for name_var, value_var in self.items:
                            name = str(self._resolve(obj, name_var))
                            value = to_array(self._resolve(obj, value_var))
                            opts = chunk_opts(value)
                            if self.compression == "gzip" and "chunks" in opts:
                                # The whole dataset is ONE chunk: compress
                                # it with libdeflate (same DEFLATE stream,
                                # ~1.7x faster than libz on a 1-core host;
                                # DEFLATE dominated the semseg stage's h5
                                # cost) and write the chunk directly. The
                                # file is byte-level standard gzip+shuffle
                                # HDF5, readable everywhere.
                                if self._write_direct(h5, name, value, opts):
                                    continue
                            h5.create_dataset(
                                name,
                                data=value,
                                compression=self.compression,
                                compression_opts=self.compression_opts,
                                shuffle=self.shuffle
                                and self.compression is not None,
                                **opts,
                            )
                    else:  # append
                        for name_var, value_var in self.items:
                            name = str(self._resolve(obj, name_var))
                            value = to_array(self._resolve(obj, value_var))
                            row = value[None, ...]
                            if name not in h5:
                                h5.create_dataset(
                                    name,
                                    data=row,
                                    maxshape=(None,) + value.shape,
                                    compression=self.compression,
                                    compression_opts=self.compression_opts,
                                    shuffle=self.shuffle
                                    and self.compression is not None,
                                )
                            else:
                                ds = h5[name]
                                ds.resize(ds.shape[0] + 1, axis=0)
                                ds[-1] = value
                    yield obj
        finally:
            for h5 in files.values():
                h5.close()
