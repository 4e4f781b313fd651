"""Device-batched threshold measurement vs the host ImageProperties path.

Reference contract: /root/reference/maze_ipp/loki/pipeline.py:648-656 —
per-crop ``mask = img > t`` → ImageProperties (skimage regionprops incl.
filled area) → ZooProcess. The device path must reproduce the host path's
numbers exactly up to f32, in crop-local coordinates, for arbitrary crop
sizes (padding must not leak into any statistic).
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from maze_image_processing_pipeline_tpu.engine.core import Pipeline
from maze_image_processing_pipeline_tpu.engine.image import (
    BatchedImageProperties,
    ImageProperties,
)
from maze_image_processing_pipeline_tpu.engine.stream import Unpack
from maze_image_processing_pipeline_tpu.engine.core import Call


def _crops(rng, n=13):
    """Crops of varied size with blobs and rings (holes for area_filled)."""
    out = []
    for i in range(n):
        h = int(rng.integers(20, 180))
        w = int(rng.integers(20, 300))
        img = (rng.random((h, w)) * 40).astype(np.uint8)
        cy, cx = h // 2, w // 2
        r = max(4, min(h, w) // 3)
        yy, xx = np.mgrid[:h, :w]
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        blob = d2 <= r * r
        if i % 2:  # ring: a hole for binary_fill_holes parity
            blob &= d2 >= (r // 2) ** 2
        img[blob] = rng.integers(120, 250)
        out.append(img)
    return out


THRESHOLD = 60


def _run_node(node_factory, crops):
    results = []
    with Pipeline() as p:
        img = Unpack(crops)
        props = node_factory(img)
        Call(lambda pr: results.append(pr), props)
    p.run()
    return results


def test_batched_matches_host_imageproperties(rng):
    crops = _crops(rng)
    host = _run_node(
        lambda img: ImageProperties(
            Call(lambda im: np.asarray(im) > THRESHOLD, img), img
        ),
        crops,
    )
    dev = _run_node(
        lambda img: BatchedImageProperties(img, THRESHOLD, chunk_size=5),
        crops,
    )
    assert len(host) == len(dev) == len(crops)
    for i, (a, b) in enumerate(zip(host, dev)):
        assert b["__area_filled__"] == pytest.approx(
            a["__area_filled__"]
        ), f"area_filled crop {i}"
        for key, va in a["__props__"].items():
            vb = b["__props__"][key]
            if key == "orientation":
                d = abs(float(vb) - float(va)) % np.pi
                assert min(d, np.pi - d) < 2e-2
                continue
            np.testing.assert_allclose(
                np.asarray(vb, np.float64),
                np.asarray(va, np.float64),
                rtol=2e-3,
                atol=2e-2,
                err_msg=f"{key} crop {i}",
            )


def test_filled_area_with_nested_holes(rng):
    """Concentric rings: multiple background components, some border-connected."""
    img = np.zeros((65, 130), np.uint8)  # odd sizes force padding
    yy, xx = np.mgrid[:65, :130]
    d2 = (yy - 32) ** 2 + (xx - 60) ** 2
    img[(d2 <= 900) & (d2 >= 625)] = 200
    img[(d2 <= 400) & (d2 >= 100)] = 200
    dev = _run_node(
        lambda im: BatchedImageProperties(im, THRESHOLD), [img]
    )[0]
    mask = img > THRESHOLD
    expect = float(ndi.binary_fill_holes(mask).sum())
    assert dev["__area_filled__"] == expect


def test_bg_overflow_falls_back_to_host(rng):
    """More background components than n_bg_segments → host fallback."""
    img = np.zeros((40, 140), np.uint8)
    img[::2, :] = 200  # stripes: ~20 background components
    dev = _run_node(
        lambda im: BatchedImageProperties(im, THRESHOLD, n_bg_segments=4), [img]
    )[0]
    mask = img > THRESHOLD
    assert dev["__area_filled__"] == float(ndi.binary_fill_holes(mask).sum())
    assert dev["__props__"]["area"] == float(mask.sum())


def test_order_preserved(rng):
    crops = _crops(rng, n=9)
    dev = _run_node(
        lambda img: BatchedImageProperties(img, THRESHOLD, chunk_size=4), crops
    )
    for crop, res in zip(crops, dev):
        assert res["__props__"]["area"] == float((crop > THRESHOLD).sum())
