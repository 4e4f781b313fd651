"""Small host-side utilities shared across the framework.

Capability parity: ``maze_ipp/common.py`` (convert_img_dtype,
recursive_update; the reference's ``add_note`` py<3.11 shim is unnecessary —
this package requires py>=3.11 and calls ``BaseException.add_note`` directly)
plus in-repo replacements for the external ``natsort`` and ``parse``
dependencies used by the reference (``maze_ipp/loki/pipeline.py:17,20``).
"""

from __future__ import annotations

import fnmatch
import glob
import logging
import re
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "find_files_glob",
    "round_ladder",
    "convert_img_dtype",
    "recursive_update",
    "natsorted",
    "natsort_key",
    "FormatParser",
]


def find_files_glob(pattern: str, ignore_patterns=None):
    """Glob files, skipping (and logging) any matching an ignore pattern.

    Shared by the loki and predict input builders (the two copies had
    drifted into duplicates)."""
    for fn in glob.iglob(pattern):
        if ignore_patterns and any(fnmatch.fnmatch(fn, p) for p in ignore_patterns):
            logger.info("Ignoring %s.", fn)
            continue
        yield fn


def round_ladder(m: int) -> int:
    """Smallest value >= m from the {1, 1.5}*2^k ladder (1,2,3,4,6,8,12,...).

    Shared by the device tiling/crop paths to quantize dynamic batch and
    job counts to a small set of rungs: every distinct padded size is a
    separate compiled program, and each program pays an executable load
    through tunneled TPU hosts (BASELINE.md round-3)."""
    c = 1
    while True:
        if m <= c:
            return c
        c15 = c * 3 // 2
        if c15 > c and m <= c15:
            return c15
        c *= 2


def round_ladder_fine(m: int) -> int:
    """Smallest value >= m from the {1, 1.25, 1.5, 1.75}*2^k ladder.

    Quarter-octave rungs (<=25% pad) for sizes where the coarse ladder's
    up-to-50% pad would eat a packing win — the byte-packed canvas fetch
    sizes its flat transfer buffer with this (models/inference.py)."""
    c = 4
    if m <= c:
        return max(1, m)
    while True:
        for num in (4, 5, 6, 7):
            r = c * num // 4
            if m <= r:
                return r
        c *= 2


def convert_img_dtype(image, dtype) -> np.ndarray:
    """Convert an image to a floating dtype, scaling unsigned ints to [0, 1].

    Conversion contract shared with the reference (``maze_ipp/common.py:6-17``):
    only floating targets are supported; an unsigned-integer image maps its
    full scale to ``1.0``, a float image is cast, and any other combination
    is an error.
    """
    image = np.asarray(image)
    target = np.dtype(dtype)

    match (image.dtype.kind, target.kind):
        case ("u", "f"):
            # One fused pass: cast + scale inside a single ufunc call.
            return np.multiply(
                image, 1.0 / np.iinfo(image.dtype).max, dtype=target
            )
        case ("f", "f"):
            return image.astype(target, copy=False)

    raise ValueError(f"unsupported image conversion: {image.dtype} -> {target}")


def recursive_update(left: Mapping, right: Mapping) -> Dict:
    """Nested-dict deep merge where ``right`` wins; sub-mappings merge recursively.

    Serves the model-metadata merge contract of the reference
    (``maze_ipp/common.py:27-40``, used at ``predict/pipeline.py:593-597``),
    with the deliberate improvement that keys only present in ``left`` are
    retained (the reference drops them).
    """
    if not isinstance(left, Mapping) or not isinstance(right, Mapping):
        raise ValueError(
            "recursive_update expects two Mappings, got "
            f"{type(left).__name__} / {type(right).__name__}"
        )

    merged: Dict = dict(left)
    for k, v in right.items():
        if isinstance(v, Mapping) and isinstance(merged.get(k), Mapping):
            merged[k] = recursive_update(merged[k], v)
        else:
            merged[k] = v
    return merged


_NAT_SPLIT = re.compile(r"(\d+)")


def natsort_key(value: Any):
    """Natural sort key: digit runs compare numerically, rest case-insensitively.

    Replaces ``natsort.natsorted(..., alg=ns.PATH | ns.IGNORECASE)`` as used
    at ``maze_ipp/loki/pipeline.py:808`` / ``predict/pipeline.py:527`` for
    path ordering.
    """
    s = str(value)
    parts = _NAT_SPLIT.split(s)
    key: List = []
    for i, part in enumerate(parts):
        if i % 2:  # digit run
            key.append((1, int(part), ""))
        elif part:
            key.append((0, 0, part.casefold()))
    return tuple(key)


def natsorted(seq: Sequence, key=None) -> List:
    if key is None:
        return sorted(seq, key=natsort_key)
    return sorted(seq, key=lambda v: natsort_key(key(v)))


class FormatParser:
    """Parse strings against a ``str.format``-style pattern.

    In-repo replacement for the external ``parse`` library used for object-ID
    and telemetry-filename parsing (``maze_ipp/loki/pipeline.py:342-359``).
    Supports the subset of format specs the workloads need:

    * ``{name}`` — non-greedy text
    * ``{name:d}`` — integer
    * ``{name:04d}`` / ``{name:06d}`` — zero-padded fixed-width integer
    * ``{:04d}`` — positional integer (returned via :attr:`Result.fixed`)
    """

    _FIELD = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)?(?::(0?)(\d*)d)?\}")

    def __init__(self, pattern: str) -> None:
        self.format = pattern
        regex_parts: List[str] = []
        self._fields: List[tuple] = []  # (name_or_None, is_int)
        pos = 0
        n_anon = 0
        for m in self._FIELD.finditer(pattern):
            regex_parts.append(re.escape(pattern[pos : m.start()]))
            name, _zero, width = m.group(1), m.group(2), m.group(3)
            is_int = "d}" in m.group(0) or bool(width)
            group_name = name if name else f"_anon{n_anon}"
            if not name:
                n_anon += 1
            if is_int:
                if width:
                    body = rf"\d{{{int(width)}}}"
                else:
                    body = r"[-+]?\d+"
            else:
                body = r".+?"
            regex_parts.append(f"(?P<{group_name}>{body})")
            self._fields.append((name, group_name, bool(is_int)))
            pos = m.end()
        regex_parts.append(re.escape(pattern[pos:]))
        self._regex = re.compile("".join(regex_parts))

    class Result:
        def __init__(self, named: Dict[str, Any], fixed: List[Any]):
            self.named = named
            self.fixed = fixed

        def __iter__(self):
            return iter(self.fixed + list(self.named.values()))

    def _to_result(self, m: "re.Match") -> "FormatParser.Result":
        named: Dict[str, Any] = {}
        fixed: List[Any] = []
        for name, group_name, is_int in self._fields:
            raw = m.group(group_name)
            value: Any = int(raw) if is_int else raw
            if name:
                named[name] = value
            else:
                fixed.append(value)
        return FormatParser.Result(named, fixed)

    def parse(self, text: str) -> Optional["FormatParser.Result"]:
        """Match the *entire* string; return a Result or None."""
        m = self._regex.fullmatch(text)
        return self._to_result(m) if m else None

    def search(self, text: str) -> Optional["FormatParser.Result"]:
        """Find the pattern anywhere in the string; return a Result or None."""
        m = self._regex.search(text)
        return self._to_result(m) if m else None
