"""Per-profile device-program census against declared ceilings.

Every DISTINCT compiled device program pays a 5-800 s executable load per
process through this host's TPU tunnel (BASELINE.md round-3 finding); the
dense profile's first run hit 2 266 s in round 4 because the crop-size
spread multiplied blend-program variants. These tests pin the program
population per haul profile so it can never silently grow: a failure here
means a code change added device-program variants — either bound them
(bucket/rung the shapes) or consciously raise the ceiling and record the
new census in BASELINE.md.

The census is counted by tools/program_census.py in a fresh subprocess
(deterministic: in-process jit caches are empty, and the XLA
backend-compile event fires once per program even on persistent-cache
hits). Reference touchpoint: the workload graphs these programs implement,
/root/reference/maze_ipp/loki/pipeline.py:1107-1248 and
/root/reference/maze_ipp/predict/pipeline.py:489-724.
"""

import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

# Measured census (programs actually built for the shrunken-but-
# shape-faithful profile haul: loki + semseg + polytaxo stages) plus
# ~40% headroom. Measured round 5 (2026-08-20): standard 11, dense 19,
# sparse 20 — the per-process executable-load engineering (shape
# buckets, ladders, one fused program per bucket) is what keeps these
# O(10), and this test is what keeps them there. Values are recorded in
# BASELINE.md round 5.
CEILINGS = {
    "standard": 16,
    "dense": 28,
    "sparse": 28,
}


@pytest.mark.slow
@pytest.mark.parametrize("haul", sorted(CEILINGS))
def test_program_census_within_ceiling(haul, tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "program_census.py"),
            "--haul",
            haul,
            "--workdir",
            str(tmp_path / "census"),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-4000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["haul"] == haul
    assert result["objects"] > 0
    assert result["programs"] <= CEILINGS[haul], (
        f"{haul} haul now builds {result['programs']} distinct device "
        f"programs (ceiling {CEILINGS[haul]}): a code change added "
        "program variants — bound the shapes or consciously raise the "
        "ceiling and re-record the census in BASELINE.md."
    )
