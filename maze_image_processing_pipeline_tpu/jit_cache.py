"""Process-level memo for jitted device programs.

Through this host's TPU tunnel the dominant per-process cost is LOADING a
compiled executable onto the remote device (5-800 s per DISTINCT program;
BASELINE.md round-3 finding). jax keys its executable reuse on the jit
*wrapper object*, so a pipeline that is built per task run (the reference's
execution model — one ``Runner`` per YAML task, possibly many per service
process, ``/root/reference/maze_ipp/loki/pipeline.py:103-130``) re-pays
every load even though the persistent compilation cache already has the
HLO: profiling the SECOND in-process run of the loki stage showed ~14 s of
its 15.2 s steady time in ``backend_compile_and_load`` for 7 programs.

The fix: construction-time jit wrappers are memoized here, keyed by the
configuration that determines the trace (shapes stay dynamic — the cached
wrapper retraces per input structure exactly like a module-level jit).

Keys must capture EVERYTHING the closure bakes into the trace. flax
modules hash by architecture config (frozen dataclasses), so two loads of
the same checkpoint directory share forward programs; params are always
jit *arguments*, never closures (BASELINE.md round-2 trap), so no model
weights are pinned by this cache — only the small wrapper closures.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

__all__ = ["get_program", "clear"]

_CACHE: Dict[Tuple, Any] = {}


def get_program(key: Tuple, build: Callable[[], Any]) -> Any:
    """Return the memoized program for ``key``, building it on first use.

    Unhashable key components (e.g. a user-supplied lambda hook that
    happens to be unhashable) fall back to building uncached — identical
    behavior to the pre-cache code path.
    """
    try:
        cached = _CACHE.get(key)
    except TypeError:  # unhashable component
        return build()
    if cached is None:
        cached = build()
        _CACHE[key] = cached
    return cached


def clear() -> None:
    """Drop all memoized programs (tests; frees the wrapper closures)."""
    _CACHE.clear()
