#!/bin/bash
# Wait for a healthy TPU tunnel window, then run the round-3 measurement
# suite serially (never two TPU processes at once — parallel/interrupted
# processes wedge the tunnel for ~30 min, see CLAUDE.md).
#
# Usage: nohup bash tools/healthy_run.sh > /tmp/healthy_run/driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/healthy_run
mkdir -p "$OUT"

probe() {
  # One fresh tiny program + 10 warm dispatches; prints "load_s warm_ms".
  # Single source of probe logic + thresholds: tools/tunnel_watch.py.
  # tail -1 guards against stray stdout lines from libraries.
  # 35 min cap: the observed outage mode blocks backend init ~30 min
  # before resolving (UNAVAILABLE or success) — a shorter timeout kills
  # inits that would have connected.
  timeout 2100 python -u tools/tunnel_watch.py --once 2>/dev/null | tail -1
}

echo "$(date +%H:%M:%S) orchestrator start"
while true; do
  r=$(probe)
  if [ -n "$r" ]; then
    load=$(echo "$r" | awk '{print $1}')
    warm=$(echo "$r" | awk '{print $2}')
    echo "$(date +%H:%M:%S) probe load=${load}s warm=${warm}ms"
    ok=$(python -c "
from tools.tunnel_watch import LOAD_S, WARM_MS
print(1 if float('$load') < LOAD_S and float('$warm') < WARM_MS else 0)" 2>/dev/null || echo 0)
    if [ "$ok" = "1" ]; then
      echo "$(date +%H:%M:%S) HEALTHY — running measurement suite"
      echo "$(date +%H:%M:%S) [1/4] bench_e2e --repeat 2"
      timeout 3600 python tools/bench_e2e.py --repeat 2 \
        > "$OUT/bench_e2e.json" 2> "$OUT/bench_e2e.err"
      echo "$(date +%H:%M:%S) bench_e2e exit=$?"
      echo "$(date +%H:%M:%S) [2/4] perf_props"
      timeout 2400 python tools/perf_props.py \
        > "$OUT/perf_props.txt" 2>&1
      echo "$(date +%H:%M:%S) perf_props exit=$?"
      echo "$(date +%H:%M:%S) [3/4] perf_lab chain stages"
      timeout 2400 python tools/perf_lab.py morph rsmall chainxla \
        > "$OUT/perf_lab.txt" 2>&1
      echo "$(date +%H:%M:%S) perf_lab exit=$?"
      echo "$(date +%H:%M:%S) [4/4] bench.py"
      timeout 3000 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
      echo "$(date +%H:%M:%S) bench exit=$?"
      echo "$(date +%H:%M:%S) suite DONE"
      break
    fi
  else
    echo "$(date +%H:%M:%S) probe failed/timed out (tunnel down)"
  fi
  # A timed-out probe is itself an interrupted TPU process, and those
  # wedge the tunnel for ~30 min (CLAUDE.md) — probing too often can
  # PERPETUATE an outage. Space attempts ~30 min apart.
  sleep 900
done
