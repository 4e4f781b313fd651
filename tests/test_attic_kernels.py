"""Retired attic/ Pallas kernels vs their in-package XLA oracles.

One pinned parity test per retired kernel (interpreter mode on CPU), so the
measured-negative-result knowledge in attic/ stays executable. See
attic/__init__.py for why each kernel lost."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

from maze_image_processing_pipeline_tpu.ops import label as label_mod
from maze_image_processing_pipeline_tpu.ops.regionprops_fused import regionprops_fused
from attic.pallas_props import regionprops_fused_pallas


def test_pallas_matches_xla_fused(rng):
    masks = np.stack(
        [ndi.binary_dilation(rng.random((64, 128)) < 0.05, iterations=2) for _ in range(2)]
    )
    inten = (rng.random(masks.shape) * 255).astype(np.uint8)
    labels, n = label_mod.label(masks, connectivity=2)

    ref = regionprops_fused(labels, inten, num_segments=32)
    got = regionprops_fused_pallas(
        labels, inten, num_segments=32, interpret=True
    )

    n = np.asarray(n)
    for key in ref:
        a = np.asarray(ref[key])
        b = np.asarray(got[key])
        for bi in range(2):
            sl = np.s_[bi, 1 : int(n[bi]) + 1]
            if key == "orientation":
                # The major axis is a direction mod pi; near-symmetric
                # regions legitimately flip between ±pi/2.
                d = np.abs(b[sl] - a[sl]) % np.pi
                d = np.minimum(d, np.pi - d)
                assert (d < 2e-2).all(), f"orientation b={bi}: {d.max()}"
                continue
            np.testing.assert_allclose(
                b[sl], a[sl], rtol=2e-3, atol=2e-2, err_msg=f"{key} b={bi}"
            )


def test_pallas_remove_small_matches_xla(rng):
    from maze_image_processing_pipeline_tpu.ops.label import remove_small_objects
    from attic.pallas_relabel import (
        remove_small_objects_pallas,
    )

    masks = np.stack(
        [
            ndi.binary_dilation(rng.random((48, 128)) < 0.06, iterations=2)
            for _ in range(3)
        ]
    )
    labels, _ = label_mod.label(masks, connectivity=2)
    a_lab, a_n = remove_small_objects(labels, 30, num_segments=64)
    b_lab, b_n = remove_small_objects_pallas(
        labels, 30, num_segments=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a_lab), np.asarray(b_lab))
    np.testing.assert_array_equal(np.asarray(a_n), np.asarray(b_n))


def test_pallas_histogram_matches_xla(rng):
    """region_histogram_pallas == regionprops_fused's histogram, incl. the
    padded-rows correction on a non-multiple-of-tile_rows height."""
    from attic.pallas_hist import (
        region_histogram_pallas,
    )

    masks = np.stack(
        [
            ndi.binary_dilation(rng.random((44, 128)) < 0.06, iterations=2)
            for _ in range(3)
        ]
    )
    inten = (rng.random(masks.shape) * 255).astype(np.uint8)
    labels, _ = label_mod.label(masks, connectivity=2)

    ref = np.asarray(regionprops_fused(labels, inten, num_segments=16)["histogram"])
    got = np.asarray(
        region_histogram_pallas(
            labels, inten, num_segments=16, tile_rows=8, interpret=True
        )
    )
    # Full equality: both versions now correct their padding artifacts, so
    # the background row matches too.
    np.testing.assert_array_equal(got, ref)
    # skip_empty (bg-strip skip + exact background reconstruction) must be
    # bit-identical to the always-contract variant.
    got_skip = np.asarray(
        region_histogram_pallas(
            labels, inten, num_segments=16, tile_rows=8,
            skip_empty=True, interpret=True,
        )
    )
    np.testing.assert_array_equal(got_skip, got)
    # Background row against numpy ground truth (both implementations
    # subtract their internal padding, so this is exact).
    lab_np = np.asarray(labels)
    for b in range(lab_np.shape[0]):
        true0 = np.bincount(
            inten[b][lab_np[b] == 0].ravel(), minlength=256
        ).astype(np.float64)
        np.testing.assert_array_equal(got[b, 0], true0)


def test_pallas_groupnorm_forward_matches_reference():
    """group_norm_pallas ≡ the XLA-ref forward (interpret mode on CPU).

    The kernel is no longer dispatched by ``layers.GroupNorm`` — the XLA
    formulation now composes at roofline while the kernel pays a 4×
    lane-padding tax at narrow channels (round-3 measurement,
    BASELINE.md) — but it is kept as a measured negative result, so its
    parity coverage stays."""
    from maze_image_processing_pipeline_tpu.models import layers
    from attic.pallas_norm import (
        group_norm_pallas,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(16), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)

    y_k = group_norm_pallas(
        x, scale, bias, num_groups=4, epsilon=1e-6, interpret=True
    )
    y_r = layers._group_norm_ref(x, scale, bias, 4, 1e-6)
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(y_r), rtol=1e-5, atol=1e-5
    )


def test_pallas_groupnorm_backward_kernel_matches_reference():
    """group_norm_bwd_pallas (fused strip backward) ≡ jax.vjp of the XLA
    reference, for dx, dscale, and dbias; interpret mode on CPU."""
    from maze_image_processing_pipeline_tpu.models import layers
    from attic.pallas_norm import (
        group_norm_bwd_pallas,
    )

    rng = np.random.default_rng(11)
    for shape, G in (((2, 8, 16, 16), 4), ((3, 12, 8, 32), 8)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        ct = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)

        dx, dscale, dbias = group_norm_bwd_pallas(
            x, ct, scale, num_groups=G, epsilon=1e-6, interpret=True
        )
        _, vjp = jax.vjp(
            lambda x_, s_, b_: layers._group_norm_ref(x_, s_, b_, G, 1e-6),
            x,
            scale,
            bias,
        )
        rx, rs, rb = vjp(ct)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dscale), np.asarray(rs), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dbias), np.asarray(rb), rtol=2e-4, atol=2e-4)


def test_pallas_vertical_pass_matches_xla(rng):
    """vertical_pass_pallas ≡ the XLA strip-walk vertical CCL pass (both
    directions, both connectivities; interpret mode on CPU). Retired:
    ≈210 vs ≈118 ms/batch composed — the row-dependency chain is
    latency-bound and Mosaic's per-row overhead exceeds XLA's
    (attic/pallas_label.py docstring)."""
    from attic.pallas_label import vertical_pass_pallas

    masks = np.stack(
        [
            ndi.binary_dilation(rng.random((48, 128)) < 0.06, iterations=2)
            for _ in range(2)
        ]
    )
    fg = jnp.asarray(masks)
    W = masks.shape[-1]
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, fg.shape, 1) * W
        + jax.lax.broadcasted_iota(jnp.int32, fg.shape, 2)
    )
    lab0 = jnp.where(fg, lin + 1, label_mod._INF)
    for connectivity in (1, 2):
        for reverse in (False, True):
            ref = label_mod._vertical_pass(
                lab0, fg, connectivity, reverse=reverse
            )
            got = vertical_pass_pallas(
                lab0, fg, connectivity, reverse=reverse, interpret=True
            )
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(ref),
                err_msg=f"conn={connectivity} reverse={reverse}",
            )
