import numpy as np
import pytest
import scipy.ndimage as ndi

from maze_image_processing_pipeline_tpu.ops import edt as edt_mod
from maze_image_processing_pipeline_tpu.ops import morphology as morph


def disk_structure(radius: int) -> np.ndarray:
    """Exact Euclidean disk footprint {dy²+dx² ≤ r²}."""
    r = int(radius)
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    return (yy * yy + xx * xx) <= radius * radius


def random_mask(rng, shape=(64, 80), p=0.1):
    return rng.random(shape) < p


class TestSquaredEDT:
    @pytest.mark.parametrize("max_distance", [1, 3, 7, 20])
    def test_matches_scipy_within_bound(self, rng, max_distance):
        mask = random_mask(rng)
        ours = np.asarray(edt_mod.squared_edt(mask, max_distance))
        ref = ndi.distance_transform_edt(~mask) ** 2
        cap = (max_distance + 1) ** 2
        within = ref <= max_distance**2
        np.testing.assert_array_equal(ours[within], np.round(ref[within]).astype(int))
        # Beyond the bound: never underestimates, never exceeds the cap.
        ref_rounded = np.round(ref[~within]).astype(np.int64)
        assert (ours[~within] >= np.minimum(ref_rounded, cap)).all()
        assert (ours[~within] <= cap).all()

    def test_batched(self, rng):
        masks = np.stack([random_mask(rng) for _ in range(4)])
        ours = np.asarray(edt_mod.squared_edt(masks, 5))
        for i in range(4):
            single = np.asarray(edt_mod.squared_edt(masks[i], 5))
            np.testing.assert_array_equal(ours[i], single)

    def test_empty_mask(self):
        mask = np.zeros((16, 16), bool)
        out = np.asarray(edt_mod.squared_edt(mask, 3))
        assert (out == 16).all()  # (3+1)^2

    def test_full_mask(self):
        mask = np.ones((16, 16), bool)
        out = np.asarray(edt_mod.squared_edt(mask, 3))
        assert (out == 0).all()


class TestDiskMorphology:
    @pytest.mark.parametrize("radius", [1, 2, 3, 5])
    def test_erosion_matches_scipy(self, rng, radius):
        mask = ndi.binary_dilation(random_mask(rng, p=0.02), iterations=3)
        ours = np.asarray(morph.binary_erosion(mask, radius))
        # skimage border convention: out-of-image counts as foreground.
        ref = ndi.binary_erosion(mask, structure=disk_structure(radius), border_value=1)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("radius", [1, 2, 3, 5])
    def test_dilation_matches_scipy(self, rng, radius):
        mask = random_mask(rng, p=0.02)
        ours = np.asarray(morph.binary_dilation(mask, radius))
        ref = ndi.binary_dilation(mask, structure=disk_structure(radius), border_value=0)
        np.testing.assert_array_equal(ours, ref)

    def test_opening_closing_match_scipy(self, rng):
        mask = ndi.binary_dilation(random_mask(rng, p=0.03), iterations=2)
        s = disk_structure(2)
        ours_open = np.asarray(morph.binary_opening(mask, 2))
        ref_er = ndi.binary_erosion(mask, structure=s, border_value=1)
        ref_open = ndi.binary_dilation(ref_er, structure=s, border_value=0)
        np.testing.assert_array_equal(ours_open, ref_open)

        ours_close = np.asarray(morph.binary_closing(mask, 2))
        ref_di = ndi.binary_dilation(mask, structure=s, border_value=0)
        ref_close = ndi.binary_erosion(ref_di, structure=s, border_value=1)
        np.testing.assert_array_equal(ours_close, ref_close)

    def test_zero_radius_identity(self, rng):
        mask = random_mask(rng)
        np.testing.assert_array_equal(np.asarray(morph.binary_erosion(mask, 0)), mask)
        np.testing.assert_array_equal(np.asarray(morph.binary_dilation(mask, 0)), mask)


class TestIsotropic:
    """Oracle: the reference's own EDT formulation (isotropic.py:8-129),
    reproduced with scipy on the same inputs."""

    @pytest.mark.parametrize("radius", [1.5, 3.0, 6.5])
    def test_isotropic_erosion(self, rng, radius):
        mask = ndi.binary_dilation(random_mask(rng, p=0.02), iterations=4)
        ours = np.asarray(morph.isotropic_erosion(mask, radius))
        ref = ndi.distance_transform_edt(mask) > radius
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("radius", [1.5, 3.0, 6.5])
    def test_isotropic_dilation(self, rng, radius):
        mask = random_mask(rng, p=0.02)
        ours = np.asarray(morph.isotropic_dilation(mask, radius))
        ref = ndi.distance_transform_edt(mask == 0) < radius
        np.testing.assert_array_equal(ours, ref)

    def test_isotropic_open_close_roundtrip(self, rng):
        mask = ndi.binary_dilation(random_mask(rng, p=0.02), iterations=4)
        ours_o = np.asarray(morph.isotropic_opening(mask, 2.5))
        er = ndi.distance_transform_edt(mask) > 2.5
        ref_o = ndi.distance_transform_edt(er == 0) < 2.5
        np.testing.assert_array_equal(ours_o, ref_o)
