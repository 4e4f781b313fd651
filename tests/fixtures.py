"""Synthetic LOKI sample-tree fixtures for end-to-end tests.

Builds the directory layout the loki workload consumes (cf. the reference's
expectations at ``loki/pipeline.py:111-127,227-274,878-895``):

    LOKI_00001.01/
        Log/LOKI_00001.log
        meta.yaml
        Telemetrie/20220103 120102.tmd ...
        Pictures/20220103 12/<object_id>.png ...
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from maze_image_processing_pipeline_tpu.dataio.imageio import encode_image

OBJECT_ID_FMT = (
    "{date} {time}  {ms:03d}  {seq:06d} {posx:04d} {posy:04d}"
)


def make_object_id(date="20220103", time="120102", ms=333, seq=0, posx=0, posy=0):
    return OBJECT_ID_FMT.format(date=date, time=time, ms=ms, seq=seq, posx=posx, posy=posy)


def draw_blob(rng, shape=(60, 80), r=12, intensity=180) -> np.ndarray:
    """A bright elliptical blob on dark noise — a fake plankton crop."""
    img = (rng.random(shape) * 20).astype(np.uint8)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    cy, cx = shape[0] // 2, shape[1] // 2
    blob = ((yy - cy) ** 2 / (r * r) + (xx - cx) ** 2 / (1.8 * r) ** 2) <= 1.0
    img[blob] = intensity
    return img


def make_loki_sample(
    root: str,
    name: str = "LOKI_00001.01",
    n_frames: int = 4,
    objects_per_frame: "int | Tuple[int, int]" = 3,
    frame_shape: Tuple[int, int] = (400, 500),
    seed: int = 0,
    station: str = "PS122-1",
    haul: str = "7",
    image_ext: str = ".png",
    with_telemetry: bool = True,
    telemetry_style: str = "tmd",
    crop_size_range: "Tuple[Tuple[int, int], Tuple[int, int]] | None" = None,
) -> str:
    """Create a synthetic LOKI sample tree; returns the sample-root path.

    ``crop_size_range``: ((h_min, w_min), (h_max, w_max)) — per-object
    vignette sizes drawn log-uniformly from the range instead of the
    fixed (60, 80). Used by the dense/large-frame haul profile to stress
    the pow2 shape buckets and batch rungs with a wide size distribution.

    ``objects_per_frame``: an int, or an inclusive ``(lo, hi)`` range drawn
    uniformly per frame (``lo`` may be 0 — frames whose draw is 0 simply
    contribute no vignettes, like real field hauls where most camera
    triggers see nothing). Used by the sparse haul profile."""
    rng = np.random.default_rng(seed)
    sample = os.path.join(root, name)
    os.makedirs(os.path.join(sample, "Log"), exist_ok=True)
    os.makedirs(os.path.join(sample, "Telemetrie"), exist_ok=True)

    with open(os.path.join(sample, "Log", "LOKI_00001.log"), "w") as f:
        f.write(
            "DEVICE: LOKI\n"
            "CRUISE: PS122\n"
            f"STATION: {station}\n"
            f"HAUL: {haul}\n"
            "VESSEL: Polarstern\n"
            "REGION: Arctic Ocean\n"
            "LOCATION: Central Arctic\n"
            "GPS_LAT: 84.95\n"
            "GPS_LON: 134.72\n"
            "BOTTOM_DEPTH: 4200\n"
        )

    with open(os.path.join(sample, "meta.yaml"), "w") as f:
        f.write("sample_program: MOSAiC\n")

    date = "20220103"
    times = [f"12{(62 + 30 * i) // 60:02d}{(62 + 30 * i) % 60:02d}" for i in range(n_frames)]

    if with_telemetry:
        for i, t in enumerate(times[:n_frames]):
            # telemetry_style: "tmd" writes modern .tmd snapshots; "dat"
            # writes only old-style .dat files (`A=1;B=2` single-line
            # format, reference lokidata fallback); "mixed" alternates so
            # some timestamps are ONLY covered by the .dat fallback.
            style = telemetry_style
            if style == "mixed":
                style = "tmd" if i % 2 == 0 else "dat"
            if style == "tmd":
                fn = os.path.join(sample, "Telemetrie", f"{date} {t}.tmd")
                with open(fn, "w") as f:
                    f.write(
                        f"GPS_LON;134.{70 + i}\n"
                        f"GPS_LAT;84.{90 + i}\n"
                        f"PRESS;{10.5 + i}\n"
                        f"TEMP;{-1.5 + 0.1 * i}\n"
                        f"OXY_CON;{300 + i}\n"
                        f"COND_SALY;{34.2}\n"
                    )
            else:
                fn = os.path.join(sample, "Telemetrie", f"{date} {t}.dat")
                with open(fn, "w") as f:
                    f.write(
                        f"GPS_LON=134.{70 + i};GPS_LAT=84.{90 + i};"
                        f"PRESS={10.5 + i};TEMP={-1.5 + 0.1 * i};"
                        f"OXY_CON={300 + i};COND_SALY=34.2\n"
                    )

    pic_dir = os.path.join(sample, "Pictures", f"{date} 12")
    os.makedirs(pic_dir, exist_ok=True)

    H, W = frame_shape
    for fi in range(n_frames):
        t = times[fi]
        if isinstance(objects_per_frame, tuple):
            lo, hi = objects_per_frame
            n_objects = int(rng.integers(lo, hi + 1))
        else:
            n_objects = objects_per_frame
        for oi in range(n_objects):
            if crop_size_range is not None:
                (h0, w0), (h1, w1) = crop_size_range
                ch = int(np.exp(rng.uniform(np.log(h0), np.log(h1))))
                cw = int(np.exp(rng.uniform(np.log(w0), np.log(w1))))
                ch, cw = min(ch, H - 10), min(cw, W - 10)
                r = max(4, min(ch, cw) // 4 + int(rng.integers(0, 4)))
            else:
                ch, cw = 60, 80
                r = 8 + int(rng.integers(0, 6))
            posx = int(rng.integers(0, max(1, W - cw - 10)))
            posy = int(rng.integers(0, max(1, H - ch - 10)))
            oid = make_object_id(date=date, time=t, ms=333, seq=oi, posx=posx, posy=posy)
            crop = draw_blob(rng, shape=(ch, cw), r=r)
            with open(os.path.join(pic_dir, oid + image_ext), "wb") as f:
                f.write(encode_image(crop, oid + image_ext))

    return sample


def make_threshold_model_dir(path: str, threshold: float = 60.0 / 255.0) -> str:
    """Save an oracle 'segmentation model' checkpoint: a 1x1-conv net whose
    sigmoid output reproduces a brightness threshold. Shared by e2e tests."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from maze_image_processing_pipeline_tpu.models import save_model
    from maze_image_processing_pipeline_tpu.models.model_io import _ARCHITECTURES

    class ThresholdNet(nn.Module):
        threshold: float = 60.0 / 255.0
        scale: float = 500.0

        @nn.compact
        def __call__(self, x):
            w = self.param("w", lambda k: jnp.full((1, 1, 3, 1), self.scale / 3))
            b = self.param("b", lambda k: jnp.full((1,), -self.scale * self.threshold))
            return (
                jax.lax.conv_general_dilated(
                    x.astype(jnp.float32),
                    w,
                    (1, 1),
                    "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + b
            )

    module = _ARCHITECTURES.setdefault("threshold_net", ThresholdNet)(
        threshold=threshold
    )
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(path, module, params, outputs={"pred": {"channel_names": ["fg"]}})
    return path
