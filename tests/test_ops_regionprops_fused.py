import numpy as np
import scipy.ndimage as ndi

from maze_image_processing_pipeline_tpu.ops import label as label_mod
from maze_image_processing_pipeline_tpu.ops import regionprops as rp
from maze_image_processing_pipeline_tpu.ops.regionprops_fused import regionprops_fused


def blobs(rng, shape=(96, 128), p=0.08, iterations=2):
    return ndi.binary_dilation(rng.random(shape) < p, iterations=iterations)


def test_fused_matches_reference_regionprops(rng):
    masks = np.stack([blobs(rng) for _ in range(3)])
    intensity = (rng.random(masks.shape) * 255).astype(np.uint8)
    intensity[~masks] = 0

    labels, n = label_mod.label(masks, connectivity=2)
    R = 64

    ref = rp.regionprops(labels, intensity, num_segments=R, compute_histogram=True)
    fused = regionprops_fused(labels, intensity, num_segments=R, hist_row_chunk=32)

    n = np.asarray(n)
    for b in range(3):
        k = int(n[b])
        sl = slice(1, k + 1)
        for key in [
            "area",
            "min_row",
            "min_col",
            "max_row",
            "max_col",
            "centroid_row",
            "centroid_col",
            "perimeter",
            "intensity_mean",
            "intensity_min",
            "intensity_max",
            "intensity_sum",
            "weighted_centroid_row",
            "weighted_centroid_col",
            # Row-extreme caliper sweep is mathematically identical to the
            # full-pixel sweep of ops/regionprops.py (see
            # feret_from_row_extremes docstring) — tight tolerance.
            "feret_diameter_max",
        ]:
            a = np.asarray(ref[key])[b, sl]
            o = np.asarray(fused[key])[b, sl]
            np.testing.assert_allclose(o, a, rtol=1e-4, atol=1e-3, err_msg=key)
        for key in ["mu20", "mu02", "mu11", "axis_major_length", "axis_minor_length"]:
            a = np.asarray(ref[key])[b, sl]
            o = np.asarray(fused[key])[b, sl]
            np.testing.assert_allclose(o, a, rtol=5e-3, atol=5e-2, err_msg=key)
        for key in ["intensity_std", "intensity_skew", "intensity_kurtosis"]:
            a = np.asarray(ref[key])[b, sl]
            o = np.asarray(fused[key])[b, sl]
            np.testing.assert_allclose(o, a, rtol=2e-2, atol=5e-2, err_msg=key)
        hist_ref = np.asarray(ref["histogram"])[b, sl]
        hist_fused = np.asarray(fused["histogram"])[b, sl]
        np.testing.assert_allclose(hist_fused, hist_ref, atol=0.5)


def test_fused_without_intensity(rng):
    mask = blobs(rng)
    labels, n = label_mod.label(mask, connectivity=2)
    fused = regionprops_fused(labels, num_segments=32)
    ref = rp.regionprops(labels, num_segments=32)
    k = int(n)
    np.testing.assert_allclose(
        np.asarray(fused["area"])[1 : k + 1], np.asarray(ref["area"])[1 : k + 1]
    )
    np.testing.assert_allclose(
        np.asarray(fused["perimeter"])[1 : k + 1],
        np.asarray(ref["perimeter"])[1 : k + 1],
        rtol=1e-4,
    )


def test_float_intensity_falls_back_to_per_pixel_moments(rng):
    """Non-integer intensities cannot use the histogram-derived central
    moments (the 256-bin quantization would bias them): the per-pixel
    mean-shifted path must produce the same statistics as the integer
    image's exact values when the float image IS integral, and reasonable
    moments for truly fractional data."""
    mask = np.zeros((40, 64), bool)
    mask[8:20, 10:30] = True
    labels = mask.astype(np.int32)[None]
    inten_u8 = (rng.random((40, 64)) * 255).astype(np.uint8)
    inten_f = inten_u8.astype(np.float32)

    a = regionprops_fused(labels, inten_u8[None], num_segments=4)
    b = regionprops_fused(labels, inten_f[None], num_segments=4)
    for k in (
        "intensity_std",
        "intensity_skew",
        "intensity_kurtosis",
        "intensity_min",
        "intensity_max",
    ):
        np.testing.assert_allclose(
            np.asarray(a[k])[0, 1], np.asarray(b[k])[0, 1], rtol=1e-4,
            err_msg=k,
        )
