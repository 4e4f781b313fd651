#!/usr/bin/env python
"""Probe: does a blocking device→host fetch hold the GIL on this host?

The round-4 negative result claims the PJRT client "holds the GIL for the
copy-out", which would make the fetch wait un-overlappable with the h5
DEFLATE pack in the StreamBuffer consumer thread — the semseg stage's two
largest steady components are additive today. This probe measures it
directly on the live backend:

1. A jitted program produces a ~16 MB f16 buffer (a typical chunk fetch).
2. A background thread increments a pure-Python counter (needs the GIL)
   and a second one loops zlib.compress on 1 MB (releases the GIL).
3. The main thread dispatches, optionally sleeps, then times
   ``np.asarray(out)`` — and reports each thread's progress rate inside
   that window vs. a quiet baseline window.

Interpretation:
* python-counter rate ~0 during the fetch → the wait holds the GIL.
* zlib rate ~baseline during the fetch → C work (libdeflate, i.e. the h5
  pack payload) CAN overlap the fetch even if the GIL is held only
  between C calls.
* asarray after a long sleep returns instantly → the async copy
  progresses in the background, so a sleep-until-estimated-done wait
  converts GIL-held wait into overlap time.
"""

from __future__ import annotations

import threading
import time
import zlib

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


class Meter:
    def __init__(self, fn, name):
        self.n = 0
        self.fn = fn
        self.name = name
        self.stop = False
        self.t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self.stop:
            self.fn()
            self.n += 1

    def rate_during(self, dur_fn):
        n0 = self.n
        t0 = time.perf_counter()
        out = dur_fn()
        dt = time.perf_counter() - t0
        return (self.n - n0) / max(dt, 1e-9), dt, out


def main():
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev)

    # ~16 MB f16 output with a bit of compute.
    N = 2896  # 2896^2 * 2 bytes ≈ 16.8 MB
    x = jnp.asarray(np.random.default_rng(0).random((N, N)), jnp.float32)

    @jax.jit
    def prog(x):
        for _ in range(4):
            x = jnp.tanh(x * 0.1 + x)
        return (x * 3.0).astype(jnp.float16)

    out = prog(x)
    np.asarray(out)  # warm compile + load

    buf = bytes(np.random.default_rng(1).bytes(1 << 20))
    m_py = Meter(lambda: sum(range(2000)), "python")
    m_c = Meter(lambda: zlib.compress(buf, 1), "zlib1MB")
    m_py.t.start()
    m_c.t.start()
    time.sleep(0.5)

    # Baseline rates (no fetch in flight).
    r_py0, _, _ = m_py.rate_during(lambda: time.sleep(1.0))
    r_c0, _, _ = m_c.rate_during(lambda: time.sleep(1.0))
    print(f"baseline: python {r_py0:.0f}/s  zlib {r_c0:.1f}/s")

    def fetch(sleep_s):
        out = prog(x + 0.001)
        ca = getattr(out, "copy_to_host_async", None)
        if ca:
            ca()
        if sleep_s:
            time.sleep(sleep_s)
        t0 = time.perf_counter()
        np.asarray(out)
        return time.perf_counter() - t0

    for sleep_s in (0.0, 0.0, 1.0, 2.0):
        r_py, dt, t_as = m_py.rate_during(lambda: fetch(sleep_s))
        r_c, _, t_as2 = m_c.rate_during(lambda: fetch(sleep_s))
        print(
            f"sleep={sleep_s:.1f}s: asarray {t_as*1e3:.0f} ms / "
            f"{t_as2*1e3:.0f} ms; during-window rates: "
            f"python {r_py:.0f}/s ({r_py / max(r_py0, 1e-9):.2f}x base)  "
            f"zlib {r_c:.1f}/s ({r_c / max(r_c0, 1e-9):.2f}x base)"
        )

    m_py.stop = m_c.stop = True


if __name__ == "__main__":
    main()
