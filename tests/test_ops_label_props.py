import numpy as np
import pytest
import scipy.ndimage as ndi

from maze_image_processing_pipeline_tpu.ops import label as label_mod
from maze_image_processing_pipeline_tpu.ops import regionprops as rp

S8 = np.ones((3, 3), bool)  # 8-connectivity structure
S4 = ndi.generate_binary_structure(2, 1)  # 4-connectivity (cross)


def assert_same_labeling(ours: np.ndarray, ref: np.ndarray):
    """Label images must agree as partitions AND in raster numbering order."""
    np.testing.assert_array_equal(ours > 0, ref > 0)
    # scipy numbers in raster order of first pixel; ours should match exactly.
    np.testing.assert_array_equal(ours, ref)


def blobs(rng, shape=(96, 128), p=0.08, iterations=2):
    return ndi.binary_dilation(rng.random(shape) < p, iterations=iterations)


class TestLabel:
    def test_8conn_matches_scipy(self, rng):
        mask = blobs(rng)
        ours, n = label_mod.label(mask, connectivity=2)
        ref, n_ref = ndi.label(mask, structure=S8)
        assert int(n) == n_ref
        assert_same_labeling(np.asarray(ours), ref)

    def test_4conn_matches_scipy(self, rng):
        mask = blobs(rng)
        ours, n = label_mod.label(mask, connectivity=1)
        ref, n_ref = ndi.label(mask, structure=S4)
        assert int(n) == n_ref
        assert_same_labeling(np.asarray(ours), ref)

    def test_diagonal_line(self):
        mask = np.eye(50, dtype=bool)
        ours, n = label_mod.label(mask, connectivity=2)
        assert int(n) == 1
        ours4, n4 = label_mod.label(mask, connectivity=1)
        assert int(n4) == 50

    def test_spiral(self):
        # A spiral: stresses the fixpoint iteration count.
        mask = np.zeros((41, 41), bool)
        y, x = 20, 20
        mask[y, x] = True
        step = 1
        d = 0
        dirs = [(0, 1), (1, 0), (0, -1), (-1, 0)]
        while step < 38:
            for _ in range(2):
                dy, dx = dirs[d % 4]
                for _ in range(step):
                    y2, x2 = y + dy, x + dx
                    if 0 <= y2 < 41 and 0 <= x2 < 41:
                        y, x = y2, x2
                        mask[y, x] = True
                d += 1
            step += 2
        ref, n_ref = ndi.label(mask, structure=S8)
        ours, n = label_mod.label(mask, connectivity=2, max_iters=128)
        assert int(n) == n_ref == 1

    def test_batched(self, rng):
        masks = np.stack([blobs(rng) for _ in range(3)])
        ours, n = label_mod.label(masks, connectivity=2)
        for i in range(3):
            ref, n_ref = ndi.label(masks[i], structure=S8)
            assert int(n[i]) == n_ref
            assert_same_labeling(np.asarray(ours[i]), ref)

    def test_empty_and_full(self):
        empty = np.zeros((16, 16), bool)
        lab, n = label_mod.label(empty)
        assert int(n) == 0 and (np.asarray(lab) == 0).all()
        full = np.ones((16, 16), bool)
        lab, n = label_mod.label(full)
        assert int(n) == 1 and (np.asarray(lab) == 1).all()


class TestLabelUtils:
    def test_remove_small_objects(self, rng):
        mask = blobs(rng)
        ref_lab, n_ref = ndi.label(mask, structure=S8)
        ours, _ = label_mod.label(mask, connectivity=2)

        min_area = 20
        got, n_got = label_mod.remove_small_objects(ours, min_area, num_segments=256)

        sizes = ndi.sum_labels(mask, ref_lab, index=np.arange(1, n_ref + 1))
        keep_mask = np.isin(ref_lab, np.where(sizes >= min_area)[0] + 1)
        np.testing.assert_array_equal(np.asarray(got) > 0, keep_mask)
        # Re-compacted ids must be consecutive 1..n
        got_np = np.asarray(got)
        ids = np.unique(got_np[got_np > 0])
        assert (ids == np.arange(1, len(ids) + 1)).all()
        assert int(n_got) == len(ids)

    def test_clear_border(self, rng):
        mask = blobs(rng)
        ours, _ = label_mod.label(mask, connectivity=2)
        got, n_got = label_mod.clear_border(ours, num_segments=256)

        ref_lab, n_ref = ndi.label(mask, structure=S8)
        border_ids = set(ref_lab[0, :]) | set(ref_lab[-1, :]) | set(ref_lab[:, 0]) | set(ref_lab[:, -1])
        keep_mask = mask & ~np.isin(ref_lab, sorted(border_ids))
        np.testing.assert_array_equal(np.asarray(got) > 0, keep_mask)


class TestRegionprops:
    def test_matches_scipy_measurements(self, rng):
        mask = blobs(rng)
        intensity = (rng.random(mask.shape) * 255).astype(np.uint8)
        ref_lab, n_ref = ndi.label(mask, structure=S8)

        ours_lab, n = label_mod.label(mask, connectivity=2)
        props = rp.regionprops(
            ours_lab, intensity, num_segments=256, compute_histogram=True
        )

        idx = np.arange(1, n_ref + 1)
        ref_area = ndi.sum_labels(mask, ref_lab, index=idx)
        np.testing.assert_allclose(np.asarray(props["area"])[1 : n_ref + 1], ref_area)

        ref_com = np.array(ndi.center_of_mass(mask, ref_lab, index=idx))
        np.testing.assert_allclose(
            np.asarray(props["centroid_row"])[1 : n_ref + 1], ref_com[:, 0], atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(props["centroid_col"])[1 : n_ref + 1], ref_com[:, 1], atol=1e-3
        )

        objects = ndi.find_objects(ref_lab)
        for i, sl in enumerate(objects, start=1):
            assert int(props["min_row"][i]) == sl[0].start
            assert int(props["max_row"][i]) == sl[0].stop
            assert int(props["min_col"][i]) == sl[1].start
            assert int(props["max_col"][i]) == sl[1].stop

        ref_mean = ndi.mean(intensity, ref_lab, index=idx)
        np.testing.assert_allclose(
            np.asarray(props["intensity_mean"])[1 : n_ref + 1], ref_mean, rtol=1e-5
        )
        ref_min = ndi.minimum(intensity, ref_lab, index=idx)
        ref_max = ndi.maximum(intensity, ref_lab, index=idx)
        np.testing.assert_allclose(
            np.asarray(props["intensity_min"])[1 : n_ref + 1], ref_min
        )
        np.testing.assert_allclose(
            np.asarray(props["intensity_max"])[1 : n_ref + 1], ref_max
        )

        hist = np.asarray(props["histogram"])[1 : n_ref + 1]
        assert hist.shape == (n_ref, 256)
        np.testing.assert_allclose(hist.sum(axis=1), ref_area)

    def test_ellipse_axes_of_rectangle(self):
        # A 40x10 axis-aligned rectangle: known moment formulas.
        mask = np.zeros((64, 64), bool)
        mask[10:50, 20:30] = True
        lab, n = label_mod.label(mask)
        props = rp.regionprops(lab, num_segments=8)
        h, w = 40, 10
        # For a discrete rectangle, mu20/area = (h^2-1)/12.
        got_major = float(props["axis_major_length"][1])
        got_minor = float(props["axis_minor_length"][1])
        np.testing.assert_allclose(got_major, 4 * np.sqrt((h**2 - 1) / 12), rtol=1e-3)
        np.testing.assert_allclose(got_minor, 4 * np.sqrt((w**2 - 1) / 12), rtol=1e-3)
        # Vertical rectangle: orientation ~ 0 (major axis along rows)
        assert abs(float(props["orientation"][1])) < 1e-3

    def test_perimeter_disk(self):
        # Marching-squares perimeter of a disk ≈ 2πr within a few percent.
        r = 20
        yy, xx = np.mgrid[-32:32, -32:32]
        mask = (yy**2 + xx**2) <= r * r
        lab, _ = label_mod.label(mask)
        props = rp.regionprops(lab, num_segments=4)
        perim = float(props["perimeter"][1])
        assert abs(perim - 2 * np.pi * r) / (2 * np.pi * r) < 0.04

    def test_perimeter_square(self):
        mask = np.zeros((50, 50), bool)
        mask[10:40, 10:40] = True
        lab, _ = label_mod.label(mask)
        props = rp.regionprops(lab, num_segments=4)
        # marching-squares length of an s-pixel square is 4s - 4 + corner cuts
        perim = float(props["perimeter"][1])
        assert abs(perim - 4 * 30) / (4 * 30) < 0.05

    def test_feret_of_line(self):
        mask = np.zeros((64, 64), bool)
        mask[32, 10:50] = True
        lab, _ = label_mod.label(mask)
        props = rp.regionprops(lab, num_segments=4, n_feret_angles=32)
        np.testing.assert_allclose(float(props["feret_diameter_max"][1]), 40.0, rtol=0.05)


class TestFillHoles:
    def test_matches_scipy(self, rng):
        mask = blobs(rng, p=0.15, iterations=3)
        ours = np.asarray(rp.fill_holes(mask))
        ref = ndi.binary_fill_holes(mask)
        np.testing.assert_array_equal(ours, ref)

    def test_ring(self):
        yy, xx = np.mgrid[-16:16, -16:16]
        rr = yy**2 + xx**2
        ring = (rr <= 100) & (rr >= 36)
        ours = np.asarray(rp.fill_holes(ring))
        np.testing.assert_array_equal(ours, ndi.binary_fill_holes(ring))


def test_label_serpentine_convergence():
    """Worst-case fixpoint convergence: a serpentine (boustrophedon) snake
    needs ~one sweep per switchback; the cap must comfortably cover
    realistic mask sizes and the result must match scipy exactly."""
    H, W = 128, 96
    mask = np.zeros((H, W), bool)
    for k, y in enumerate(range(0, H - 2, 4)):
        mask[y, 1:-1] = True
        x = W - 2 if k % 2 == 0 else 1
        mask[y : y + 5, x] = True
    mask[-1, :] = False

    lab, n = label_mod.label(mask, connectivity=2)
    ref, n_ref = ndi.label(mask, structure=np.ones((3, 3)))
    assert int(np.asarray(n)) == n_ref == 1
    np.testing.assert_array_equal(np.asarray(lab) > 0, ref > 0)
    assert np.unique(np.asarray(lab)[np.asarray(lab) > 0]).size == 1


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.parametrize("density", [0.02, 0.3, 0.6])
@pytest.mark.parametrize("shape", [(33, 64), (100, 47), (96, 128)])
@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_fuzz_matches_scipy(seed, density, shape, connectivity):
    """Seeded fuzz: raw Bernoulli masks (no dilation smoothing) across odd
    shapes, densities from sparse specks to near-percolation, both
    connectivities — the regime where run-merging and fixpoint sweeps are
    stressed hardest."""
    rng = np.random.default_rng(seed)
    mask = rng.random(shape) < density
    ours, n_ours = label_mod.label(mask[None], connectivity=connectivity)
    s = ndi.generate_binary_structure(2, connectivity)
    ref, n_ref = ndi.label(mask, structure=s)
    assert int(n_ours[0]) == n_ref
    np.testing.assert_array_equal(np.asarray(ours[0]), ref)
