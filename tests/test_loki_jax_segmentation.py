"""End-to-end test of the loki JAX-segmentation path on CPU.

Uses an 'oracle' U-Net-shaped model whose output reproduces a brightness
threshold (weights crafted so sigmoid(logits) ≈ [image > thr]), making the
full stitch → tile → inference → fused postprocess → region extraction
chain verifiable.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from maze_image_processing_pipeline_tpu.dataio import Archive, read_tsv
from maze_image_processing_pipeline_tpu.loki.pipeline import Runner
from maze_image_processing_pipeline_tpu.models import save_model
from maze_image_processing_pipeline_tpu.models.model_io import _ARCHITECTURES

from fixtures import make_loki_sample


class ThresholdNet(nn.Module):
    """A 1x1-conv 'segmentation model': sigmoid(scale*(x - thr))."""

    threshold: float = 60.0 / 255.0
    scale: float = 500.0

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) in [0, 1]
        w = self.param("w", lambda k: jnp.full((1, 1, 3, 1), self.scale / 3))
        b = self.param("b", lambda k: jnp.full((1,), -self.scale * self.threshold))
        logits = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            w,
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return logits


# Register so model_io can rebuild it from meta.json.
_ARCHITECTURES["threshold_net"] = ThresholdNet


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("model") / "thrnet")
    module = ThresholdNet()
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(path, module, params, outputs={"pred": {"channel_names": ["fg"]}})
    return path


def test_loki_jax_segmentation_end_to_end(tmp_path, model_dir):
    make_loki_sample(
        str(tmp_path / "data"), n_frames=3, objects_per_frame=2, frame_shape=(180, 230)
    )
    target_dir = str(tmp_path / "out")

    config = {
        "input": {"path": str(tmp_path / "data")},
        "segmentation": {
            "jax": {
                "model_fn": model_dir,
                "dtype": "float32",
                "batch_size": 4,
                "tile_size": 128,
                "tile_stride": 96,
                "stitch": True,
                "postprocess": {
                    "closing_radius": 2,
                    "opening_radius": 1,
                    "min_area": 20,
                    "clear_border": False,
                    "max_regions": 16,
                },
                "padding": 10,
            }
        },
        "postprocess": {},
        "output": {"target_dir": target_dir, "store_mask": True},
    }

    Runner._configure_and_run(config)

    archive_fn = os.path.join(target_dir, "LOKI_PS122-1_7.zip")
    assert os.path.exists(archive_fn), os.listdir(target_dir)

    df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
    # Each frame stitches its crops; each blob is re-found as one object.
    assert len(df) >= 5
    assert (df["object_area"] > 20).all()
    for col in ["object_area", "object_major", "object_mean", "object_frac_invalid"]:
        assert col in df.columns
    # Re-derived object ids follow the LOKI format with new posx/posy.
    assert df["object_id"].str.match(r"\d{8} \d{6}  \d+  \d{6} \d{4} \d{4}").all()
    # Stitched-frame segmentation found blobs roughly where they were placed:
    # areas should match an ellipse of r~8-13 within loose bounds.
    assert df["object_area"].between(100, 4000).all()


def test_loki_jax_without_stitch(tmp_path, model_dir):
    make_loki_sample(str(tmp_path / "data"), n_frames=2, objects_per_frame=1)
    target_dir = str(tmp_path / "out2")

    config = {
        "input": {"path": str(tmp_path / "data")},
        "segmentation": {
            "jax": {
                "model_fn": model_dir,
                "dtype": "float32",
                "stitch": False,
                "tile_size": 64,
                "tile_stride": 48,
                "postprocess": {"min_area": 10, "max_regions": 16},
                "padding": 5,
            }
        },
        "postprocess": {},
        "output": {"target_dir": target_dir},
    }
    Runner._configure_and_run(config)
    archive_fn = os.path.join(target_dir, "LOKI_PS122-1_7.zip")
    df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
    assert len(df) == 2


def test_device_blend_matches_host_blend(tmp_path, model_dir):
    """The fused device path (DeviceTiledSegmentation: tile inference +
    on-device linear blend + postprocess) must produce the same EcoTaxa
    output as the host-blend path (TiledPipeline{JaxInference} +
    DeviceFramePostprocess) it replaces."""
    make_loki_sample(
        str(tmp_path / "data"), n_frames=2, objects_per_frame=3,
        frame_shape=(180, 230),
    )

    def run(device_blend, out):
        Runner._configure_and_run(
            {
                "input": {"path": str(tmp_path / "data")},
                "segmentation": {
                    "jax": {
                        "model_fn": model_dir,
                        "dtype": "float32",
                        "batch_size": 4,
                        "tile_size": 128,
                        "tile_stride": 96,
                        "device_blend": device_blend,
                        "postprocess": {
                            "closing_radius": 2,
                            "opening_radius": 1,
                            "min_area": 20,
                            "max_regions": 16,
                        },
                        "padding": 10,
                    }
                },
                "postprocess": {},
                "output": {"target_dir": str(tmp_path / out), "store_mask": True},
            }
        )
        archive = Archive(os.path.join(str(tmp_path / out), "LOKI_PS122-1_7.zip"))
        df = read_tsv(archive / "ecotaxa_export.tsv")
        images = {}
        import cv2

        for fn in df["img_file_name"]:
            data = (archive / fn).read_bytes()
            images[fn] = cv2.imdecode(
                np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED
            )
            mask_fn = fn.replace(".png", "_mask.png")
            data = (archive / mask_fn).read_bytes()
            images[mask_fn] = cv2.imdecode(
                np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED
            )
        return df, images

    df_dev, img_dev = run(True, "out_dev")
    df_host, img_host = run(False, "out_host")
    assert len(df_dev) == len(df_host)
    key = ["object_posx", "object_posy"]
    df_dev = df_dev.sort_values(key).reset_index(drop=True)
    df_host = df_host.sort_values(key).reset_index(drop=True)
    for col in ["object_area", "object_width", "object_height", "object_major",
                "object_feret", "object_mean", "object_area_exc"]:
        np.testing.assert_allclose(
            df_dev[col].to_numpy(np.float64),
            df_host[col].to_numpy(np.float64),
            rtol=1e-3,
            atol=0.51,
            err_msg=col,
        )
    # Vignettes and masks must be pixel-identical: the device-crop path
    # cuts them on the accelerator, the host path slices the label frame.
    assert set(img_dev) == set(img_host)
    for fn in img_dev:
        np.testing.assert_array_equal(img_dev[fn], img_host[fn], err_msg=fn)


def test_n_threads_parallel_host_region(tmp_path, model_dir):
    """loki's n_threads knob (reference loki/config_schema.py:66-68) wraps
    the per-object host region in the order-preserving
    DataParallelPipeline; output must match the serial run."""
    make_loki_sample(
        str(tmp_path / "data"), n_frames=2, objects_per_frame=3,
        frame_shape=(180, 230),
    )

    def run(n_threads, out):
        Runner._configure_and_run(
            {
                "input": {"path": str(tmp_path / "data")},
                "segmentation": {
                    "jax": {
                        "model_fn": model_dir,
                        "dtype": "float32",
                        "tile_size": 128,
                        "tile_stride": 96,
                        "n_threads": n_threads,
                        "postprocess": {"min_area": 20, "closing_radius": 1,
                                        "max_regions": 16},
                    }
                },
                "postprocess": {},
                "output": {"target_dir": str(tmp_path / out)},
            }
        )
        return read_tsv(
            Archive(os.path.join(str(tmp_path / out), "LOKI_PS122-1_7.zip"))
            / "ecotaxa_export.tsv"
        )

    df1 = run(0, "out_serial")
    df4 = run(4, "out_threads")
    assert len(df1) == len(df4)
    assert list(df1["object_id"]) == list(df4["object_id"])  # order preserved
    np.testing.assert_allclose(
        df1["object_area"].to_numpy(np.float64),
        df4["object_area"].to_numpy(np.float64),
    )


@pytest.mark.parametrize("device_crops", [True, False])
def test_device_tiled_segmentation_mixed_buckets(model_dir, device_crops):
    """Frames of different bucket sizes interleaved: groups flush on bucket
    switches and objects re-emit in arrival order with correct labels (or
    device-extracted region crops in crops mode)."""
    import jax.numpy as jnp

    from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, Unpack
    from maze_image_processing_pipeline_tpu.loki.config_schema import (
        JaxSegmentationConfig,
        SegmentationPostprocessingConfig,
    )
    from maze_image_processing_pipeline_tpu.loki.pipeline import (
        DeviceTiledSegmentation,
    )
    from maze_image_processing_pipeline_tpu.models import load_model

    rng = np.random.default_rng(5)
    frames = []
    blob_counts = []
    sizes = [(200, 260), (300, 380), (200, 260), (200, 260), (300, 380)]
    for H, W in sizes:
        img = (rng.random((H, W)) * 40).astype(np.uint8)
        n_blobs = int(rng.integers(1, 4))
        yy, xx = np.mgrid[:H, :W]
        for b in range(n_blobs):
            cy = 30 + 60 * b
            cx = int(rng.integers(30, W - 30))
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 100] = 200
        frames.append(img)
        blob_counts.append(n_blobs)

    cfg = JaxSegmentationConfig(
        model_fn=model_dir,
        dtype="float32",
        tile_size=128,
        tile_stride=96,
        frame_batch=2,
        device_crops=device_crops,
    )
    post = SegmentationPostprocessingConfig(min_area=20)
    model = load_model(model_dir, dtype="float32")

    results = []
    with Pipeline() as p:
        img = Unpack(frames)
        labels, props, n, regions = DeviceTiledSegmentation(img, model, cfg, post)
        Call(
            lambda lab, nn, regs: results.append(
                (
                    None if lab is None else lab.shape,
                    int(nn),
                    None if regs is None else len(regs),
                )
            ),
            labels,
            n,
            regions,
        )
    p.run()

    assert [r[1] for r in results] == blob_counts  # order kept
    if device_crops:
        assert [r[2] for r in results] == blob_counts
    else:
        assert [r[0] for r in results] == [f.shape for f in frames]


def test_device_compose_matches_dense_upload(model_dir, monkeypatch):
    """Sparse device-side frame composition (StitchedImage.sources ride up
    row-packed and paste on device) must reproduce the dense group-buffer
    upload bit-for-bit — including OVERLAPPING crops, where Stitch's
    last-write-wins paste order decides pixel ownership."""
    from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, Unpack
    from maze_image_processing_pipeline_tpu.engine.stitch import StitchedImage
    from maze_image_processing_pipeline_tpu.loki.config_schema import (
        JaxSegmentationConfig,
        SegmentationPostprocessingConfig,
    )
    from maze_image_processing_pipeline_tpu.loki.pipeline import (
        DeviceTiledSegmentation,
    )
    from maze_image_processing_pipeline_tpu.models import load_model

    rng = np.random.default_rng(11)

    def make_frame(seed):
        r = np.random.default_rng(seed)
        crops = []
        # Two overlapping crops (second must win in the overlap) + one
        # bright separate blob.
        a = (r.random((60, 70)) * 40).astype(np.uint8)
        a[10:40, 10:50] = 190
        b = (r.random((50, 60)) * 40).astype(np.uint8)
        b[5:30, 5:45] = 220
        c = np.zeros((40, 40), np.uint8)
        c[5:35, 5:35] = 210
        crops = [(a, 20, 30), (b, 50, 60), (c, 120, 150)]  # b overlaps a
        canvas = np.zeros((200, 260), np.uint8)
        for img, oy, ox in crops:
            canvas[oy : oy + img.shape[0], ox : ox + img.shape[1]] = img
        st = canvas.view(StitchedImage)
        st.n_regions = len(crops)
        st.sources = crops
        st.fill_value = 0
        return st

    frames = [make_frame(s) for s in range(3)]
    cfg = JaxSegmentationConfig(
        model_fn=model_dir, dtype="float32", tile_size=128, tile_stride=96,
        frame_batch=2, device_crops=False,
    )
    post = SegmentationPostprocessingConfig(min_area=20)
    model = load_model(model_dir, dtype="float32")

    def run(compose):
        monkeypatch.setenv("MAZE_DEVICE_COMPOSE", "1" if compose else "0")
        out = []
        with Pipeline() as p:
            img = Unpack(frames)
            labels, props, n, _ = DeviceTiledSegmentation(img, model, cfg, post)
            Call(
                lambda lab, pr, nn: out.append((np.asarray(lab), pr, int(nn))),
                labels, props, n,
            )
        p.run()
        return out

    dense = run(False)
    sparse = run(True)
    assert len(dense) == len(sparse) == len(frames)
    for (ld, pd, nd), (ls, ps, ns) in zip(dense, sparse):
        assert nd == ns
        np.testing.assert_array_equal(ld, ls)
        for k in pd:
            np.testing.assert_array_equal(pd[k], ps[k], err_msg=str(k))


def test_two_frame_chains_with_different_prop_configs():
    """Two frame chains in one process unpack independently: the packed
    prop-key order is owned per chain (it used to be a process-global
    captured at first trace, which silently mis-unpacked the second chain
    if key sets or region counts diverged)."""
    from maze_image_processing_pipeline_tpu.loki.config_schema import (
        SegmentationPostprocessingConfig,
    )
    from maze_image_processing_pipeline_tpu.loki.pipeline import (
        _make_frame_chain,
        _unpack_frame_result,
    )

    cfg_a = SegmentationPostprocessingConfig(min_area=0, max_regions=16)
    cfg_b = SegmentationPostprocessingConfig(min_area=0, max_regions=64)
    chain_a, keys_a = _make_frame_chain(cfg_a)
    chain_b, keys_b = _make_frame_chain(cfg_b)
    assert keys_a is not keys_b
    assert keys_a == []  # filled at first trace, not before

    H = W = 128
    img = np.zeros((H, W), np.uint8)
    img[10:20, 10:30] = 200
    img[50:70, 40:60] = 180
    pred = (img > 100).astype(np.float32)

    out_a = chain_a(pred, img)
    out_b = chain_b(pred, img)
    assert keys_a and keys_a == keys_b  # same config family -> same keys

    for out, keys, cfg in ((out_a, keys_a, cfg_a), (out_b, keys_b, cfg_b)):
        labels, n, props = _unpack_frame_result(out, H, W, H, W, keys)
        assert n == 2
        assert props["area"].shape == (cfg.max_regions,)
        areas = sorted(props["area"][1 : n + 1].tolist())
        assert areas == [200.0, 400.0]
        assert props["histogram"].shape == (cfg.max_regions, 256)

    # Per-chain key lists are isolated: clearing one must not affect the other.
    keys_a.clear()
    assert keys_b


def test_device_crops_max_regions_overflow_matches_host(tmp_path, model_dir):
    """Frames with more regions than max_regions keep ALL objects on the
    device-crops path via the host overflow fallback (round-3 review: the
    crops mode used to silently drop labels >= max_regions while the
    host path kept them through FindRegions' host-props fallback)."""
    make_loki_sample(
        str(tmp_path / "data"), n_frames=2, objects_per_frame=6,
        frame_shape=(180, 230),
    )

    def run(device_blend, out):
        Runner._configure_and_run(
            {
                "input": {"path": str(tmp_path / "data")},
                "segmentation": {
                    "jax": {
                        "model_fn": model_dir,
                        "dtype": "float32",
                        "batch_size": 4,
                        "tile_size": 128,
                        "tile_stride": 96,
                        "device_blend": device_blend,
                        "postprocess": {
                            "closing_radius": 2,
                            "min_area": 20,
                            "max_regions": 4,
                        },
                        "padding": 10,
                    }
                },
                "postprocess": {},
                "output": {"target_dir": str(tmp_path / out)},
            }
        )
        return read_tsv(
            Archive(os.path.join(str(tmp_path / out), "LOKI_PS122-1_7.zip"))
            / "ecotaxa_export.tsv"
        )

    df_dev = run(True, "out_dev")
    df_host = run(False, "out_host")
    # Both paths must keep every segmented region (blobs can merge when
    # they overlap, so compare the two paths, not the raw object count).
    assert len(df_dev) == len(df_host)
    assert len(df_dev) > 4  # the overflow fallback actually engaged
    key = ["object_posx", "object_posy"]
    df_dev = df_dev.sort_values(key).reset_index(drop=True)
    df_host = df_host.sort_values(key).reset_index(drop=True)
    for col in ["object_area", "object_width", "object_height", "object_mean"]:
        np.testing.assert_allclose(
            df_dev[col].to_numpy(np.float64),
            df_host[col].to_numpy(np.float64),
            rtol=1e-3,
            atol=0.51,
            err_msg=col,
        )
