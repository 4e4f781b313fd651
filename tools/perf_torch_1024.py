#!/usr/bin/env python
"""Measure the eager-torch 1-core U-Net on a REAL 1024² tile.

Pins the extrapolation behind bench.py's ``unet_tile_fps.vs_cpu_torch_1core``
(which scales a 256² measurement ×16 in pixels) with one direct — slow —
measurement on this host's single CPU core (round-4 verdict item 10).

Usage: python tools/perf_torch_1024.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import torch

    from bench import _torch_models

    TorchUNet, _ = _torch_models()  # sets torch.set_num_threads(1)
    assert torch.get_num_threads() == 1

    with torch.no_grad():
        unet = TorchUNet(cin=1).eval()

        x256 = torch.rand(1, 1, 256, 256)
        unet(x256)  # warm (allocator + weight layout)
        best256 = min(
            _timed(unet, x256) for _ in range(max(2, iters))
        )
        print(f"256^2 tile:  {best256:8.3f} s  -> x16 pixel-linear "
              f"extrapolation predicts {best256 * 16.0:.3f} s at 1024^2")

        x1024 = torch.rand(1, 1, 1024, 1024)
        unet(x1024)  # warm
        best1024 = min(_timed(unet, x1024) for _ in range(iters))
        print(f"1024^2 tile: {best1024:8.3f} s measured "
              f"({1.0 / best1024:.4f} tiles/s 1-core eager torch)")
        print(f"extrapolation error: measured/extrapolated = "
              f"{best1024 / (best256 * 16.0):.3f}x")


def _timed(fn, x) -> float:
    t0 = time.perf_counter()
    fn(x)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
