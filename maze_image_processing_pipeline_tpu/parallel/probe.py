"""Dispatch-latency probe: is the accelerator locally attached?

The device-batched measurement paths (``BatchedImageProperties``,
``BatchedSegmentMeasure``) are faster than the host path on a
locally-attached TPU but *slower* through a remote tunnel, where every
dispatch costs ~25 ms and every fetch seconds of fixed latency
(BASELINE.md round-2 findings). ``device: auto`` (the shipped default)
resolves the choice with a one-time round-trip measurement instead of
hard-coding either.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

logger = logging.getLogger(__name__)

_PROBE_MS: Optional[float] = None


def dispatch_roundtrip_ms() -> float:
    """Median host→device→host round-trip of a trivial jitted op (ms)."""
    global _PROBE_MS
    if _PROBE_MS is None:
        import jax
        import jax.numpy as jnp
        import numpy as np

        @jax.jit
        def f(x):
            return x + 1

        x = jnp.zeros((8, 128), jnp.float32)
        np.asarray(f(x))  # compile + warm
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x))
            samples.append((time.perf_counter() - t0) * 1e3)
        samples.sort()
        _PROBE_MS = samples[len(samples) // 2]
        logger.info("Device dispatch round-trip: %.2f ms", _PROBE_MS)
    return _PROBE_MS


def resolve_device_flag(value, threshold_ms: float = 5.0) -> bool:
    """Resolve a ``bool | "auto"`` config flag for device-batched paths.

    ``auto`` → True iff an accelerator backend is active AND the dispatch
    round-trip is LAN-class (< ``threshold_ms``). Remote-tunnel hosts and
    plain-CPU runs keep the reference's host path.
    """
    if value != "auto":
        return bool(value)
    import jax

    if jax.default_backend() == "cpu":
        return False
    fast = dispatch_roundtrip_ms() < threshold_ms
    logger.info(
        "device: auto -> %s (round-trip %.2f ms, threshold %.1f ms)",
        fast,
        _PROBE_MS,
        threshold_ms,
    )
    return fast
