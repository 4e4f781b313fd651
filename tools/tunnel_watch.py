"""Tunnel health watchdog: log fresh-program load + warm dispatch latency.

One process, one backend init; every --interval seconds it times a FRESH
tiny program (unique constant → distinct executable, so each sample pays
the remote executable-load cost that dominates this host's tunnel — see
BASELINE.md round-3 finding) plus 10 warm dispatches of the previous one.
Appends one line per sample to --log. Healthy window ≈ load < LOAD_S
(20 s) and warm dispatch < WARM_MS (35 ms) — these thresholds are the
single source of truth; tools/healthy_run.sh consumes them via --once.

With ``--once`` it probes a single time and prints ``<load_s> <warm_ms>``
to stdout (machine-parseable; all logging goes to stderr), exiting 0.

WARNING: this is a TPU process. Stop it before running bench.py /
bench_e2e / perf probes — parallel TPU processes wedge the tunnel for
~30 min (CLAUDE.md). ``healthy_run.sh`` therefore probes via ``--once``
between suite stages instead of keeping a watcher alive.

Usage: python -u tools/tunnel_watch.py [--interval 300] [--log /tmp/tunnel_watch.log]
       python -u tools/tunnel_watch.py --once
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

LOAD_S = 20.0
WARM_MS = 35.0


def sample(x, k: int) -> tuple[float, float]:
    f = jax.jit(lambda v: jnp.sin(v * (k + 1)).sum() + k)
    t0 = time.time()
    f(x).block_until_ready()
    load_s = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        f(x).block_until_ready()
    warm_ms = (time.time() - t0) / 10 * 1e3
    return load_s, warm_ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=300.0)
    ap.add_argument("--log", default="/tmp/tunnel_watch.log")
    ap.add_argument(
        "--once",
        action="store_true",
        help="probe once, print '<load_s> <warm_ms>' to stdout, exit",
    )
    args = ap.parse_args()

    t0 = time.time()
    dev = jax.devices()[0]
    init_s = time.time() - t0
    if dev.platform == "cpu":
        # Silent CPU fallback would mimic a perfectly healthy tunnel
        # (sub-second load, ~0 ms warm). Report as unhealthy instead.
        print("jax fell back to CPU — no TPU behind the tunnel", file=sys.stderr)
        if args.once:
            print("9999.0 9999.0", flush=True)
            return
        return 1
    x = jnp.ones((256, 256))
    k = int(time.time()) % 100000

    if args.once:
        load_s, warm_ms = sample(x, k)
        print(f"{load_s:.1f} {warm_ms:.1f}", flush=True)
        return

    with open(args.log, "a") as fh:
        fh.write(f"{time.strftime('%H:%M:%S')} init={init_s:.1f}s dev={dev}\n")
        fh.flush()
        while True:
            load_s, warm_ms = sample(x, k)
            healthy = load_s < LOAD_S and warm_ms < WARM_MS
            fh.write(
                f"{time.strftime('%H:%M:%S')} load={load_s:.1f}s "
                f"warm={warm_ms:.1f}ms {'HEALTHY' if healthy else 'degraded'}\n"
            )
            fh.flush()
            k += 1
            time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
