import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

from maze_image_processing_pipeline_tpu.ops import label as label_mod
from maze_image_processing_pipeline_tpu.ops import regionprops as rp
from maze_image_processing_pipeline_tpu.ops.merge_labels import merge_labels
from maze_image_processing_pipeline_tpu.ops.zooprocess import zooprocess_features


class TestMergeLabels:
    def test_merges_close_segments(self):
        labels = np.zeros((40, 60), dtype=np.int32)
        labels[10:20, 5:15] = 1  # segment 1
        labels[10:20, 18:28] = 2  # 3 px gap to segment 1
        labels[10:20, 45:55] = 3  # far away

        out, dists = merge_labels(
            labels, max_distance=5, return_merge_distances=True
        )
        # 1 and 2 merged into one label; 3 untouched.
        assert len(dists) == 1
        assert 2.5 < dists[0] <= 4.1
        merged_ids = np.unique(out[out > 0])
        assert len(merged_ids) == 2
        assert (out[10:20, 5:15] == out[10:20, 18:28]).all()
        assert out[12, 50] != out[12, 10]
        # A bridge now connects them: the filled region is 8-connected.
        m = out == out[12, 10]
        _, n = ndi.label(m, structure=np.ones((3, 3)))
        assert n == 1

    def test_no_merge_beyond_max_distance(self):
        labels = np.zeros((30, 60), dtype=np.int32)
        labels[5:10, 5:10] = 1
        labels[5:10, 40:45] = 2
        out = merge_labels(labels, max_distance=5)
        assert len(np.unique(out[out > 0])) == 2

    def test_merge_all_when_unbounded(self):
        labels = np.zeros((30, 60), dtype=np.int32)
        labels[5:10, 5:10] = 1
        labels[5:10, 25:30] = 2
        labels[20:25, 50:55] = 3
        out = merge_labels(labels, max_distance=None)
        assert len(np.unique(out[out > 0])) == 1
        m = out > 0
        _, n = ndi.label(m, structure=np.ones((3, 3)))
        assert n == 1

    def test_single_label_noop(self):
        labels = np.zeros((10, 10), dtype=np.int32)
        labels[2:5, 2:5] = 1
        out = merge_labels(labels, max_distance=3)
        np.testing.assert_array_equal(out, labels)

    def test_chain_merge(self):
        # Three segments in a row, each 3px apart: all must merge.
        labels = np.zeros((20, 70), dtype=np.int32)
        labels[5:15, 5:20] = 1
        labels[5:15, 23:38] = 2
        labels[5:15, 41:56] = 3
        out = merge_labels(labels, max_distance=4)
        assert len(np.unique(out[out > 0])) == 1


class TestZooProcessFeatures:
    def test_feature_sanity_disk(self):
        r = 15
        yy, xx = np.mgrid[-32:32, -32:32]
        mask = (yy + 2) ** 2 + (xx - 3) ** 2 <= r * r
        intensity = np.full(mask.shape, 100, dtype=np.uint8)
        intensity[~mask] = 0

        lab, n = label_mod.label(mask)
        props = rp.regionprops(lab, intensity, num_segments=8, compute_histogram=True)
        f = zooprocess_features(props, 1, prefix="object_")

        assert f["object_area"] == pytest.approx(np.pi * r * r, rel=0.05)
        assert f["object_mean"] == pytest.approx(100.0)
        assert f["object_stddev"] == pytest.approx(0.0, abs=1e-3)
        assert f["object_median"] == 100.0
        assert f["object_mode"] == 100.0
        assert f["object_circ."] == pytest.approx(1.0, rel=0.08)
        assert f["object_elongation"] == pytest.approx(1.0, rel=0.05)
        assert f["object_major"] == pytest.approx(2 * r, rel=0.07)
        assert f["object_feret"] == pytest.approx(2 * r, rel=0.07)
        assert f["object_x"] == pytest.approx(32 + 3, abs=0.1)
        assert f["object_y"] == pytest.approx(32 - 2, abs=0.1)
        assert f["object_%area"] == 0.0

    def test_fused_device_path_feret_parity(self):
        """The fused (hot) device path now carries true feret: ZooProcess
        features computed from ``regionprops_fused`` must match the K-angle
        oracle of ``regionprops`` — no major-axis fallback (the reference
        uses skimage feret at loki/pipeline.py:625)."""
        from maze_image_processing_pipeline_tpu.ops.regionprops_fused import (
            regionprops_fused,
        )

        mask = np.zeros((96, 96), bool)
        # Diagonal bar: feret (diagonal length) differs from the ellipse
        # major axis, so a fallback would be caught.
        for i in range(60):
            mask[10 + i // 2, 10 + i] = True
        mask = np.asarray(
            np.logical_or(mask, np.roll(mask, 1, axis=0))
        )
        intensity = np.where(mask, 120, 0).astype(np.uint8)
        lab, n = label_mod.label(mask)
        oracle = rp.regionprops(
            lab, intensity, num_segments=8, n_feret_angles=16, compute_histogram=True
        )
        fused = regionprops_fused(lab, intensity, num_segments=8, n_feret_angles=16)
        np.testing.assert_allclose(
            np.asarray(fused["feret_diameter_max"])[1],
            np.asarray(oracle["feret_diameter_max"])[1],
            rtol=1e-5,
        )
        f = zooprocess_features(fused, 1, prefix="object_")
        assert f["object_feret"] == pytest.approx(
            float(np.asarray(oracle["feret_diameter_max"])[1]), rel=1e-5
        )
        major = float(np.asarray(oracle["axis_major_length"])[1])
        assert abs(f["object_feret"] - major) > 1.0  # fallback would match major

    def test_area_exc_vs_filled(self):
        # Ring: filled area includes the hole.
        yy, xx = np.mgrid[-16:16, -16:16]
        rr = yy**2 + xx**2
        ring = (rr <= 100) & (rr >= 36)
        lab, _ = label_mod.label(ring)
        intensity = (ring * 128).astype(np.uint8)
        props = rp.regionprops(lab, intensity, num_segments=4, compute_histogram=True)

        filled = np.asarray(rp.fill_holes(ring))
        f = zooprocess_features(props, 1, area_filled=float(filled.sum()))
        assert f["area_exc"] == ring.sum()
        assert f["area"] == filled.sum()
        assert f["%area"] > 15  # the hole is a substantial share

    def test_angle_convention(self):
        # Horizontal bar: angle from x-axis should be ~0 deg.
        mask = np.zeros((40, 40), bool)
        mask[20, 5:35] = True
        mask[21, 5:35] = True
        lab, _ = label_mod.label(mask)
        props = rp.regionprops(lab, num_segments=4)
        f = zooprocess_features(props, 1)
        assert min(f["angle"], 180 - f["angle"]) < 2.0

        # Vertical bar: ~90 deg.
        mask2 = np.zeros((40, 40), bool)
        mask2[5:35, 20] = True
        lab2, _ = label_mod.label(mask2)
        props2 = rp.regionprops(lab2, num_segments=4)
        f2 = zooprocess_features(props2, 1)
        assert abs(f2["angle"] - 90) < 2.0


class TestRound3HuntFixes:
    def test_merge_labels_out_buffer_single_label(self):
        """With < 2 labels and a caller-provided labels_out, the input must
        be copied into the buffer (it used to come back uninitialized)."""
        from maze_image_processing_pipeline_tpu.ops.merge_labels import merge_labels

        labels = np.zeros((16, 16), np.int32)
        labels[4:8, 4:8] = 1
        out_buf = np.full_like(labels, -99)
        res = merge_labels(labels, labels_out=out_buf)
        assert res is out_buf
        np.testing.assert_array_equal(res, labels)

    def test_n_features_matches_actual_count(self):
        from maze_image_processing_pipeline_tpu.ops.zooprocess import (
            N_FEATURES,
            zooprocess_features,
        )
        from maze_image_processing_pipeline_tpu.ops.host_props import (
            host_region_props,
        )

        mask = np.zeros((20, 20), bool)
        mask[5:15, 5:15] = True
        inten = (mask * 200).astype(np.uint8)
        props = dict(host_region_props(mask, inten))
        hist = np.zeros((2, 256))
        hist[1] = np.bincount(inten[mask].ravel(), minlength=256)
        props["histogram"] = hist
        feats = zooprocess_features(props, 1)
        assert len(feats) == N_FEATURES

    def test_host_device_skew_guard_parity(self):
        """Near-constant regions (std in (1e-12, 1e-3]) must get identical
        0.0 skew/kurtosis from host_region_props and the fused device
        measurement (they used different guard thresholds)."""
        from maze_image_processing_pipeline_tpu.ops.host_props import (
            host_region_props,
        )
        from maze_image_processing_pipeline_tpu.ops.regionprops_fused import (
            regionprops_fused,
        )

        mask = np.zeros((16, 16), bool)
        mask[2:14, 2:14] = True
        inten = np.full((16, 16), 100, np.uint8)  # constant region
        h = {k: v[1] for k, v in host_region_props(mask, inten).items()}
        d = regionprops_fused(
            jnp.asarray(mask.astype(np.int32)),
            jnp.asarray(inten.astype(np.float32)),
            num_segments=4,
        )
        assert h["intensity_skew"] == 0.0
        assert float(d["intensity_skew"][1]) == 0.0
        assert h["intensity_kurtosis"] == 0.0
        assert float(d["intensity_kurtosis"][1]) == 0.0

    def test_center_crop_or_pad_explicit_layout(self):
        from maze_image_processing_pipeline_tpu.ops.image import (
            center_crop_or_pad,
        )

        nhw = jnp.zeros((2, 6, 8))
        out = center_crop_or_pad(nhw, 4, channels_last=False)
        assert out.shape == (2, 4, 4)
        hwc = jnp.zeros((6, 8, 3))
        out = center_crop_or_pad(hwc, 4)
        assert out.shape == (4, 4, 3)
        hw = jnp.zeros((6, 8))
        assert center_crop_or_pad(hw, 4).shape == (4, 4)
