import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from maze_image_processing_pipeline_tpu.dataio import (
    Archive,
    EcotaxaWriter,
    read_tsv,
)
from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, Unpack
from maze_image_processing_pipeline_tpu.models import ConvClassifier, UNet, save_model
from maze_image_processing_pipeline_tpu.predict.pipeline import (
    Runner,
    build_polytaxo_pipeline,
    measure_segments,
)
from maze_image_processing_pipeline_tpu.predict.config_schema import (
    PredictionPipelineConfig,
)

from fixtures import draw_blob

TAXONOMY_YAML = """
Copepoda:
  _index: 0
  Calanoida:
    _index: 1
  Cyclopoida:
    _index: 2
  _tags:
    oil-sack: 3
"""


def make_input_archive(tmp_path, rng, n=4, size=64, with_annotations=False):
    archive_fn = str(tmp_path / "input" / "crops.zip")
    crops = [draw_blob(rng, shape=(size, size), r=10 + i) for i in range(n)]

    def meta_for(i):
        m = {"object_id": f"obj{i}", "object_area": 100.0 + i}
        if with_annotations:
            m["object_annotation_category"] = "Copepoda"
            m["object_annotation_status"] = "validated" if i == 0 else "predicted"
        return m

    with Pipeline() as p:
        i = Unpack(list(range(n)))
        img = Call(lambda k: crops[k], i)
        meta = Call(meta_for, i)
        fn = Call(lambda k: f"obj{k}.png", i)
        EcotaxaWriter(archive_fn, [(fn, img)], meta)
    p.run()
    return archive_fn, crops


def make_taxonomy_files(tmp_path):
    tax_fn = str(tmp_path / "taxonomy.yaml")
    open(tax_fn, "w").write(TAXONOMY_YAML)
    csv_fn = str(tmp_path / "ecotaxa_taxonomy.csv")
    pd.DataFrame(
        {
            "display_name": [
                "Copepoda",
                "Calanoida",
                "Cyclopoida",
                "Calanoida with oil",
                "Copepoda with oil",
                "Cyclopoida with oil",
            ],
            "lineage": [
                "Copepoda",
                "Copepoda>Calanoida",
                "Copepoda>Cyclopoida",
                "Copepoda>Calanoida>oil-sack",
                "Copepoda>oil-sack",
                "Copepoda>Cyclopoida>oil-sack",
            ],
        }
    ).to_csv(csv_fn, index=False)
    return tax_fn, csv_fn


class TestMeasureSegments:
    def test_measures_largest_component(self, rng):
        probs = np.zeros((64, 64, 2), np.float32)
        probs[10:30, 10:30, 0] = 0.9  # big blob channel 0
        probs[40:45, 40:45, 0] = 0.8  # small blob channel 0 (discarded)
        probs[20:28, 20:28, 1] = 0.7
        image = (rng.random((64, 64)) * 255).astype(np.uint8)

        meta, images = measure_segments(
            {"object_id": "x", "bogus": 1},
            image,
            probs,
            ["prosoma", "oilsack"],
            draw=True,
            fill_holes=True,
        )
        assert meta["object_prosoma_raw_area"] == 20 * 20 + 25
        assert meta["object_prosoma_area"] == 400  # largest component only
        assert meta["object_oilsack_area"] == 64
        assert meta["object_prosoma_area_convex_ratio"] == pytest.approx(1.0, abs=0.05)
        assert "bogus" not in meta
        assert len(images) == 1 and images[0][0] == "x_overlay.jpg"

    def test_empty_channel(self):
        probs = np.zeros((32, 32, 1), np.float32)
        meta, images = measure_segments(
            {"object_id": "x"}, np.zeros((32, 32), np.uint8), probs, ["c"], False
        )
        assert meta["object_c_area"] == 0
        assert images == []


class TestPolytaxoStage:
    def _run_stage(self, tmp_path, metas, probs, **overrides):
        tax_fn, csv_fn = make_taxonomy_files(tmp_path)
        config = PredictionPipelineConfig.model_validate(
            {
                "input": {"path": "unused"},
                "model": {"model_fn": "unused"},
                "target_dir": str(tmp_path),
                "polytaxo": {
                    "poly_taxonomy_fn": tax_fn,
                    "ecotaxa_taxonomy_fn": csv_fn,
                    "threshold": 0.6,
                    "skip_unchanged_objects": False,
                    **overrides,
                },
            }
        )

        class FakeObj:
            def __init__(self, meta):
                self.meta = meta

        with Pipeline() as p:
            pair = Unpack(list(zip(metas, probs)))
            et_obj = Call(lambda t: FakeObj(t[0]), pair)
            pvar = Call(lambda t: t[1], pair)
            meta_out = build_polytaxo_pipeline(config, et_obj, pvar)
        objs = p.run()
        return [o[meta_out] for o in objs]

    def test_prediction(self, tmp_path):
        metas = [{"object_id": "a"}]
        probs = [np.array([0.95, 0.9, 0.05, 0.9])]  # Copepoda>Calanoida + oil-sack
        out = self._run_stage(tmp_path, metas, probs)
        assert out[0]["object_annotation_category"] == "Calanoida with oil"
        assert out[0]["object_annotation_status"] == "predicted"

    def test_negative_tag_dropped(self, tmp_path):
        metas = [{"object_id": "a"}]
        probs = [np.array([0.95, 0.9, 0.05, 0.01])]  # oil-sack strongly negative
        out = self._run_stage(tmp_path, metas, probs)
        assert out[0]["object_annotation_category"] == "Calanoida"

    def test_validated_baseline_respected(self, tmp_path):
        metas = [
            {
                "object_id": "a",
                "object_annotation_category": "Calanoida",
                "object_annotation_status": "validated",
            }
        ]
        # Probabilities favor Cyclopoida, but validated Calanoida constrains.
        probs = [np.array([0.95, 0.1, 0.99, 0.05])]
        out = self._run_stage(tmp_path, metas, probs)
        assert out[0]["object_annotation_category"] == "Calanoida"

    def test_skip_unchanged(self, tmp_path):
        metas = [
            {
                "object_id": "a",
                "object_annotation_category": "Calanoida",
                "object_annotation_status": "predicted",
            }
        ]
        probs = [np.array([0.95, 0.9, 0.05, 0.01])]  # predicts Calanoida again
        out = self._run_stage(tmp_path, metas, probs, skip_unchanged_objects=True)
        assert out == []

    def test_constraint_rule(self, tmp_path):
        metas = [{"object_id": "a"}]
        probs = [np.array([0.95, 0.9, 0.05, 0.9])]
        out = self._run_stage(
            tmp_path,
            metas,
            probs,
            prediction_constraint_rules={"Calanoida": "!oil-sack"},
        )
        assert out[0]["object_annotation_category"] == "Calanoida"

    def test_strip_metadata_modes(self, tmp_path):
        metas = [{"object_id": "a", "object_area": 5.0, "object_annotation_person": "x"}]
        probs = [np.array([0.95, 0.9, 0.05, 0.01])]
        out = self._run_stage(tmp_path, metas, probs, strip_metadata=True)
        assert set(out[0]) <= {
            "object_id",
            "object_annotation_category",
            "object_annotation_status",
            "object_polytaxo_description",
        }
        out2 = self._run_stage(tmp_path, metas, probs, strip_metadata=False)
        assert "object_area" in out2[0]
        assert "object_annotation_person" not in out2[0]


class TestPredictEndToEnd:
    def test_semseg_and_h5(self, tmp_path, rng):
        archive_fn, crops = make_input_archive(tmp_path, rng, n=3, size=64)

        model_dir = str(tmp_path / "unet")
        module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
        params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        save_model(
            model_dir,
            module,
            params,
            outputs={"pred": {"channel_names": ["prosoma", "oilsack"]}},
        )

        target_dir = str(tmp_path / "out")
        config = {
            "input": {"path": archive_fn},
            "model": {
                "model_fn": model_dir,
                "dtype": "float32",
                "batch_size": 2,
                "tiling": {"size": 64, "stride": 48},
            },
            "save_raw_h5": True,
            "segmentation": {"draw": True, "fill_holes": True},
            "target_dir": target_dir,
        }
        Runner._configure_and_run(config)

        h5_fn = os.path.join(target_dir, "crops.h5")
        assert os.path.exists(h5_fn)
        with h5py.File(h5_fn) as h5:
            assert set(h5.keys()) == {"obj0", "obj1", "obj2"}
            assert h5["obj0"].shape == (64, 64, 2)

        seg_fn = os.path.join(target_dir, "crops.segmentation.zip")
        df = read_tsv(Archive(seg_fn) / "ecotaxa_export.tsv")
        assert len(df) == 3
        for col in [
            "object_prosoma_area",
            "object_oilsack_area",
            "object_prosoma_area_convex_ratio",
        ]:
            assert col in df.columns

    def test_semseg_h5_uint8(self, tmp_path, rng):
        """raw_h5_dtype: uint8 quantizes maps to round(p*255) on the device
        (opt-in 1/255-resolution rung); segment measurements keep their
        0.5-threshold semantics and match the float32 run exactly (the
        fused measurement thresholds BEFORE the transfer cast)."""
        archive_fn, crops = make_input_archive(tmp_path, rng, n=3, size=64)

        model_dir = str(tmp_path / "unet")
        module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
        params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        # Saturate the output head (x20 logits): random-init nets emit
        # probabilities hovering AT the 0.5 threshold, where the 1/255
        # quantization legitimately flips borderline pixels in the
        # overflow host-fallback remeasurement; trained models saturate.
        params = jax.tree_util.tree_map_with_path(
            lambda path, p: p * 20.0
            if any(getattr(k, "key", None) == "Conv_1" for k in path)
            else p,
            params,
        )
        save_model(
            model_dir,
            module,
            params,
            outputs={"pred": {"channel_names": ["prosoma", "oilsack"]}},
        )

        outs, dfs = {}, {}
        for dtype in ("float32", "uint8"):
            target_dir = str(tmp_path / f"out_{dtype}")
            Runner._configure_and_run(
                {
                    "input": {"path": archive_fn},
                    "model": {
                        "model_fn": model_dir,
                        "dtype": "float32",
                        "batch_size": 2,
                        "tiling": {"size": 64, "stride": 48},
                    },
                    "save_raw_h5": True,
                    "raw_h5_dtype": dtype,
                    "segmentation": {"draw": False, "fill_holes": True,
                                     "device": True},
                    "target_dir": target_dir,
                }
            )
            with h5py.File(os.path.join(target_dir, "crops.h5")) as h5:
                outs[dtype] = {k: h5[k][...] for k in h5.keys()}
                assert h5.attrs["raw_dtype"] == dtype
                if dtype == "uint8":
                    assert h5.attrs["raw_scale"] == pytest.approx(1 / 255)
            seg_fn = os.path.join(target_dir, "crops.segmentation.zip")
            dfs[dtype] = read_tsv(Archive(seg_fn) / "ecotaxa_export.tsv")

        assert all(v.dtype == np.uint8 for v in outs["uint8"].values())
        for k in outs["float32"]:
            np.testing.assert_allclose(
                outs["uint8"][k].astype(np.float32) / 255.0,
                outs["float32"][k],
                atol=0.5 / 255 + 1e-6,
            )
        # Measurements ran on the f32 canvas before quantization: exact
        # parity with the float32 run.
        for col in dfs["float32"].columns:
            if col in ("process_datetime", "process_id"):
                continue
            a, b = dfs["float32"][col], dfs["uint8"][col]
            if a.dtype.kind == "f":
                np.testing.assert_allclose(
                    a.to_numpy(), b.to_numpy(), rtol=1e-6, err_msg=col
                )
            else:
                assert a.tolist() == b.tolist(), col

    def test_semseg_h5_float16(self, tmp_path, rng):
        """raw_h5_dtype: float16 stores half-precision maps (and keeps the
        halved device fetch); values match float32 within f16 resolution."""
        archive_fn, crops = make_input_archive(tmp_path, rng, n=2, size=64)

        model_dir = str(tmp_path / "unet")
        module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
        params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        save_model(
            model_dir,
            module,
            params,
            outputs={"pred": {"channel_names": ["prosoma", "oilsack"]}},
        )

        outs = {}
        for dtype in ("float32", "float16"):
            target_dir = str(tmp_path / f"out_{dtype}")
            Runner._configure_and_run(
                {
                    "input": {"path": archive_fn},
                    "model": {
                        "model_fn": model_dir,
                        "dtype": "float32",
                        "batch_size": 2,
                        "tiling": {"size": 64, "stride": 48},
                    },
                    "save_raw_h5": True,
                    "raw_h5_dtype": dtype,
                    "target_dir": target_dir,
                }
            )
            with h5py.File(os.path.join(target_dir, "crops.h5")) as h5:
                outs[dtype] = {k: h5[k][...] for k in h5.keys()}
                # Provenance: the storage dtype is recorded on the file.
                assert h5.attrs["raw_dtype"] == dtype

        assert all(v.dtype == np.float16 for v in outs["float16"].values())
        assert all(v.dtype == np.float32 for v in outs["float32"].values())
        for k in outs["float32"]:
            np.testing.assert_allclose(
                outs["float16"][k].astype(np.float32),
                outs["float32"][k],
                atol=2e-3,
            )

    def test_polytaxo_end_to_end(self, tmp_path, rng):
        archive_fn, _ = make_input_archive(tmp_path, rng, n=3, size=64)
        tax_fn, csv_fn = make_taxonomy_files(tmp_path)

        model_dir = str(tmp_path / "clf")
        module = ConvClassifier(n_outputs=4, features=(4, 8), dtype=jnp.float32)
        params = module.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        save_model(model_dir, module, params, outputs={"probs": {}})

        target_dir = str(tmp_path / "out")
        config = {
            "input": {"path": archive_fn},
            "model": {
                "model_fn": model_dir,
                "dtype": "float32",
                "batch_size": 2,
                "input_size": 64,
            },
            "save_raw_h5": True,
            "polytaxo": {
                "poly_taxonomy_fn": tax_fn,
                "ecotaxa_taxonomy_fn": csv_fn,
                "threshold": 0.01,
                "skip_unchanged_objects": False,
                "strip_metadata": True,
            },
            "target_dir": target_dir,
        }
        Runner._configure_and_run(config)

        # Feature export (append mode for non-tiled models).
        with h5py.File(os.path.join(target_dir, "crops.h5")) as h5:
            assert h5["predictions"].shape == (3, 4)
            assert h5["object_id"].shape == (3,)

        poly_fn = os.path.join(target_dir, "crops.polytaxo.zip")
        df = read_tsv(Archive(poly_fn) / "ecotaxa_export.tsv")
        assert len(df) == 3
        assert "object_annotation_category" in df.columns


def test_batched_segment_measure_matches_host(rng):
    """Device-batched channel measurement == per-object host
    measure_segments (reference contract predict/pipeline.py:59-180),
    including exact convex areas from row extremes."""
    from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, Unpack
    from maze_image_processing_pipeline_tpu.predict.pipeline import (
        BatchedSegmentMeasure,
        measure_segments,
    )

    names = ["Prosoma", "Oilsack"]
    crops = []
    for i in range(7):
        h = int(rng.integers(24, 120))
        w = int(rng.integers(24, 200))
        p = np.zeros((h, w, 2), np.float32)
        yy, xx = np.mgrid[:h, :w]
        for c in range(2):
            for _ in range(int(rng.integers(0, 3))):
                cy, cx = rng.integers(4, h - 4), rng.integers(4, w - 4)
                r = int(rng.integers(3, min(h, w) // 3))
                d2 = (yy - cy) ** 2 + (xx - cx) ** 2
                blob = d2 <= r * r
                if r > 5 and rng.random() < 0.5:
                    blob &= d2 >= (r // 2) ** 2  # ring: holes
                p[..., c][blob] = 0.9
        crops.append(p)

    meta0 = {"object_id": "x", "ignored_prefix_foo": 1}

    host = [
        measure_segments(dict(meta0), None, p, names, False, fill_holes=True)[0]
        for p in crops
    ]

    dev_out = []
    with Pipeline() as pl:
        probs = Unpack(crops)
        meta = BatchedSegmentMeasure(meta0, probs, names, True, chunk_size=3)
        Call(lambda m: dev_out.append(m), meta)
    pl.run()

    assert len(dev_out) == len(host)
    for i, (a, b) in enumerate(zip(host, dev_out)):
        assert set(a) == set(b), f"crop {i}: {set(a) ^ set(b)}"
        for k in a:
            if isinstance(a[k], (int, float)):
                assert b[k] == pytest.approx(a[k], rel=2e-3, abs=0.51), (
                    f"crop {i} {k}: host={a[k]} dev={b[k]}"
                )


def test_device_tiled_inference_matches_host_blend(tmp_path, rng):
    """DeviceTiledInference (on-device tile blending, packed chunk fetch)
    must reproduce the host path (TiledPipeline{JaxInference}) on a mixed
    stream of crop sizes incl. multi-tile and smaller-than-tile objects.

    (170, 170) and (150, 200) land in the same (256, 256) pow2 bucket with
    different true extents: they exercise the shared per-bucket fetch
    window (max member extent on the quarter-bucket rung ladder) AND the
    [:h, :w] crop where the window actually engages (192 < 256)."""
    sizes = [(64, 64), (100, 90), (40, 56), (90, 120), (170, 170), (150, 200), (64, 64)]
    crops = [draw_blob(rng, shape=s, r=12) for s in sizes]
    archive_fn = str(tmp_path / "input" / "crops.zip")
    with Pipeline() as p:
        i = Unpack(list(range(len(crops))))
        img = Call(lambda k: crops[k], i)
        meta = Call(lambda k: {"object_id": f"obj{k}", "object_area": 1.0}, i)
        fn = Call(lambda k: f"obj{k}.png", i)
        EcotaxaWriter(archive_fn, [(fn, img)], meta)
    p.run()

    model_dir = str(tmp_path / "unet")
    module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(
        model_dir, module, params,
        outputs={"pred": {"channel_names": ["prosoma", "oilsack"]}},
    )

    def run(device_blend, out):
        target_dir = str(tmp_path / out)
        Runner._configure_and_run(
            {
                "input": {"path": archive_fn},
                "model": {
                    "model_fn": model_dir,
                    "dtype": "float32",
                    "batch_size": 2,
                    "tiling": {
                        "size": 64,
                        "stride": 48,
                        "device_blend": device_blend,
                    },
                },
                "save_raw_h5": True,
                # f32 keeps this parity check bit-tight (see the
                # device-false test above); the float16 default has its
                # own dedicated test.
                "raw_h5_dtype": "float32",
                "segmentation": {"draw": False, "fill_holes": True},
                "target_dir": target_dir,
            }
        )
        with h5py.File(os.path.join(target_dir, "crops.h5")) as h5:
            preds = {k: np.asarray(h5[k]) for k in h5.keys()}
        df = read_tsv(
            Archive(os.path.join(target_dir, "crops.segmentation.zip"))
            / "ecotaxa_export.tsv"
        )
        return preds, df

    preds_dev, df_dev = run(True, "out_dev")
    preds_host, df_host = run(False, "out_host")

    assert set(preds_dev) == set(preds_host)
    for k in preds_dev:
        assert preds_dev[k].shape == preds_host[k].shape, k
        np.testing.assert_allclose(
            preds_dev[k], preds_host[k], rtol=1e-5, atol=1e-6, err_msg=k
        )
    meas_cols = [c for c in df_host.columns if "_area" in c or "axis" in c]
    assert meas_cols
    for col in meas_cols:
        # atol=2: device blend sums tiles in a different order than the
        # host path, so a prediction pixel sitting exactly on the 0.5
        # threshold can flip — a 1-2 px area difference on a multi-tile
        # crop is expected, any structural disagreement is far larger.
        np.testing.assert_allclose(
            df_dev[col].to_numpy(np.float64),
            df_host[col].to_numpy(np.float64),
            rtol=1e-5,
            atol=2,
            err_msg=col,
        )


def test_device_tiled_inference_uint16_inputs(tmp_path, rng):
    """Non-uint8 inputs ride the device tiling path too (round-3 review:
    the node used to hard-reject them while device_blend defaults True).
    u16 = u8 * 257 scales to identical [0, 1] floats, so predictions must
    match the u8 run exactly."""
    from maze_image_processing_pipeline_tpu.models import (
        DeviceTiledInference,
        load_model,
        save_model,
    )

    crops8 = [draw_blob(rng, shape=s, r=10) for s in [(64, 64), (100, 90)]]
    crops16 = [c.astype(np.uint16) * 257 for c in crops8]

    model_dir = str(tmp_path / "unet16")
    module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(
        model_dir, module, params,
        outputs={"pred": {"channel_names": ["a", "b"]}},
    )
    model = load_model(model_dir, dtype="float32")

    def run(crops):
        out = []
        with Pipeline() as pl:
            img = Unpack(crops)
            pred, _ = DeviceTiledInference(
                model, img, tile_size=64, tile_stride=48, batch_size=2
            )
            Call(lambda p: out.append(np.asarray(p)), pred)
        pl.run()
        return out

    p8 = run(crops8)
    p16 = run(crops16)
    assert len(p8) == len(p16) == len(crops8)
    for a, b in zip(p8, p16):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_device_tiled_inference_narrow_bucket_and_row_packing(tmp_path, rng):
    """The fused path uploads each chunk ROW-PACKED (images stacked
    vertically, columns padded to Wp) and extracts tiles on device. Two
    regimes the standard parity test (ts=64) never reaches:

    * Wp < tile_size — vignettes narrower than the 128-lane floor inside
      a large tile (the production semseg shape: 100 px crops, 256
      tiles): the device pads the missing tile columns with zeros.
    * a tile window reading past an image's last row into the NEXT
      image's rows — the hlim mask must restore the host zero-pad
      exactly, or image k+1's pixels bleed into image k's prediction.

    Both crops share one (256, 256) bucket, stack consecutively in the
    rows buffer, and are shorter than the 192-tile, so every window
    overruns. Oracle: the host TiledPipeline path via per-image runs."""
    from maze_image_processing_pipeline_tpu.models import (
        DeviceTiledInference,
        JaxInference,
        load_model,
        save_model,
    )
    from maze_image_processing_pipeline_tpu.engine.tiles import TiledPipeline

    crops = [
        draw_blob(rng, shape=(100, 90), r=14),
        draw_blob(rng, shape=(80, 110), r=12),
        draw_blob(rng, shape=(120, 60), r=10),
    ]

    model_dir = str(tmp_path / "unet_nb")
    module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(
        model_dir, module, params,
        outputs={"pred": {"channel_names": ["a", "b"]}},
    )
    model = load_model(model_dir, dtype="float32")

    dev = []
    with Pipeline() as pl:
        img = Unpack(crops)
        pred, _ = DeviceTiledInference(
            model, img, tile_size=192, tile_stride=144, batch_size=2
        )
        Call(lambda p: dev.append(np.asarray(p)), pred)
    pl.run()

    host = []
    with Pipeline() as pl:
        img = Unpack(crops)
        with TiledPipeline(
            (192, 192), img, tile_stride=(144, 144), blend_strategy="linear"
        ):
            pred = JaxInference(model, img, batch_size=2)
        Call(lambda p: host.append(np.asarray(p)), pred)
    pl.run()

    assert len(dev) == len(host) == len(crops)
    for a, b, c in zip(dev, host, crops):
        assert a.shape == c.shape + (2,)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_device_tiled_inference_rowpacked_fetch_parity(tmp_path, rng, monkeypatch):
    """The row-packed FETCH (canvases leave the device stacked at their
    true heights when that saves >=1/8 of the rows — the dense-haul
    mean-vs-max padding fix) must return byte-identical predictions and
    stats vs the dense-window fetch. 16 mixed-height crops share one
    (256, 256) bucket so sum(h) < Bo*Hq engages the packing."""
    from maze_image_processing_pipeline_tpu.models import (
        DeviceTiledInference,
        load_model,
        save_model,
    )

    crops = [draw_blob(rng, shape=(250, 150), r=20)] + [
        draw_blob(rng, shape=(140 + 2 * i, 140 + 5 * i), r=12)
        for i in range(15)
    ]

    model_dir = str(tmp_path / "unet_rp")
    module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(
        model_dir, module, params,
        outputs={"pred": {"channel_names": ["a", "b"]}},
    )
    model = load_model(model_dir, dtype="float32")

    from maze_image_processing_pipeline_tpu.ops import segment_measure as sm

    seen_rows = []
    orig_scs = sm.split_canvas_stats

    def spy_scs(buf, *a, elems=None, **k):
        seen_rows.append(elems)
        return orig_scs(buf, *a, elems=elems, **k)

    monkeypatch.setattr(sm, "split_canvas_stats", spy_scs)

    def run(rowpack):
        monkeypatch.setenv("MAZE_ROWPACK_FETCH", "1" if rowpack else "0")
        preds, stats = [], []
        with Pipeline() as pl:
            img = Unpack(crops)
            pred, st = DeviceTiledInference(
                model, img, tile_size=64, tile_stride=48, batch_size=4,
                chunk_size=16, measure_channels=["a", "b"],
            )
            Call(lambda p, s: (preds.append(np.asarray(p)), stats.append(s)),
                 pred, st)
        pl.run()
        return preds, stats

    p1, s1 = run(True)
    assert any(r is not None for r in seen_rows), (
        "row-packed fetch never engaged — crop mix no longer clears the "
        ">=1/8 row-savings gate"
    )
    seen_rows.clear()
    p0, s0 = run(False)
    assert all(r is None for r in seen_rows)
    assert len(p1) == len(p0) == len(crops)
    for a, b, c in zip(p1, p0, crops):
        assert a.shape == b.shape == c.shape + (2,)
        np.testing.assert_array_equal(a, b)
    for a, b in zip(s1, s0):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_batched_segment_measure_overflow_falls_back_to_host(rng):
    """A noisy mask with more components than the device one-hot bound
    (num_segments=16) must still report the TRUE largest component —
    round-3 hunt: 20 specks + one blob used to return area=1.0 because
    the blob's raster label id fell beyond the measured range."""
    from maze_image_processing_pipeline_tpu.predict.pipeline import (
        BatchedSegmentMeasure,
        measure_segments,
    )

    h, w = 32, 140
    p = np.zeros((h, w, 1), np.float32)
    # 20 single-pixel specks with raster-order labels before the blob...
    for k in range(20):
        p[1 + 0, 2 + 6 * k, 0] = 0.9
    # ...then a 6x6 blob (raster id 21, beyond num_segments-1=15).
    p[20:26, 20:26, 0] = 0.9

    host_meta, _ = measure_segments(
        {}, None, p, ["ch"], False, fill_holes=False
    )
    assert host_meta["object_ch_area"] == 36.0

    out = []
    with Pipeline() as pl:
        probs = Unpack([p])
        meta = BatchedSegmentMeasure({"object_id": "x"}, probs, ["ch"], False)
        Call(lambda m: out.append(m), meta)
    pl.run()

    assert out[0]["object_ch_area"] == 36.0
    assert (
        out[0]["object_ch_axis_major_length"]
        == pytest.approx(host_meta["object_ch_axis_major_length"], rel=1e-3)
    )


def test_fused_measure_overflow_falls_back_to_host(tmp_path, rng):
    """The DeviceTiledInference fused measurement signals overflow when a
    channel has more components than the one-hot bound; the pipeline must
    then report the host-measured values for that object."""
    import jax.numpy as jnp

    from maze_image_processing_pipeline_tpu.models.inference import (
        DeviceTiledInference,
    )
    from maze_image_processing_pipeline_tpu.models.model_io import LoadedModel

    # An "identity" model: sigmoid(post) of a huge logit where the input
    # is bright — so the prediction mask equals the input's bright mask
    # and we control the component count exactly.
    class Passthrough:
        def apply(self, params, x):
            return (x[..., :1] - 0.4) * 50.0

    crop = np.zeros((64, 160), np.uint8)
    for k in range(34):  # 34 specks (raster ids 1..34, beyond the 32 bound)
        crop[2, 2 + 4 * k] = 255
    crop[30:42, 30:42] = 255  # the true largest component, id 35

    model = LoadedModel(Passthrough(), {}, {})

    out = []
    with Pipeline() as pl:
        img = Unpack([crop])
        pred, stats = DeviceTiledInference(
            model, img, tile_size=64, tile_stride=48, batch_size=2,
            measure_channels=["ch"], measure_fill_holes=False,
        )
        Call(lambda p, s: out.append((p, s)), pred, stats)
    pl.run()

    p, s = out[0]
    assert s is not None and bool(s["overflow"][0])
    # Host fallback (what predict.pipeline._fused_meta does on overflow):
    from maze_image_processing_pipeline_tpu.predict.pipeline import (
        measure_segments,
    )

    host_meta, _ = measure_segments({}, None, p[..., :1], ["ch"], False)
    assert host_meta["object_ch_area"] == 144.0


def test_segmentation_device_false_forces_host_path(tmp_path, rng):
    """segmentation.device: false must keep the host measure_segments path
    even with device_blend tiling — outputs stay identical either way."""
    archive_fn, crops = make_input_archive(tmp_path, rng, n=3, size=64)
    model_dir = str(tmp_path / "unet")
    module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(
        model_dir, module, params,
        outputs={"pred": {"channel_names": ["prosoma", "oilsack"]}},
    )

    def run(device, out):
        target_dir = str(tmp_path / out)
        Runner._configure_and_run(
            {
                "input": {"path": archive_fn},
                "model": {
                    "model_fn": model_dir,
                    "dtype": "float32",
                    "batch_size": 2,
                    "tiling": {"size": 64, "stride": 48},
                },
                "segmentation": {
                    "draw": False, "fill_holes": True, "device": device,
                },
                # f32 end-to-end so the parity check stays bit-tight: at
                # the f16 transfer default the two paths round at
                # different points and this random-init model's outputs
                # hover at the 0.5 threshold (borderline pixels flip).
                "save_raw_h5": True,
                "raw_h5_dtype": "float32",
                "target_dir": target_dir,
            }
        )
        return read_tsv(
            Archive(os.path.join(target_dir, "crops.segmentation.zip"))
            / "ecotaxa_export.tsv"
        )

    df_fused = run(True, "out_fused")
    df_host = run(False, "out_host")
    cols = [c for c in df_host.columns if "_area" in c or "axis" in c]
    assert cols
    for col in cols:
        np.testing.assert_allclose(
            df_fused[col].to_numpy(np.float64),
            df_host[col].to_numpy(np.float64),
            rtol=1e-5,
            err_msg=col,
        )


def test_measure_with_canvas_f16_bitcast_roundtrip(rng):
    """The carried-canvas stats buffer must decode exactly when the canvas
    rides at float16 (f32 stats bitcast into f16 lane pairs)."""
    import jax
    import jax.numpy as jnp

    from maze_image_processing_pipeline_tpu.ops.segment_measure import (
        measure_channels_packed,
        measure_channels_with_canvas,
        split_canvas_stats,
        unpack_channel_stats,
    )

    Bo, Hb, Wb, C = 4, 32, 128, 2
    canvas = np.zeros((Bo, Hb, Wb, C), np.float32)
    canvas[1, 5:20, 10:60, 0] = 0.9
    canvas[2, 8:12, 8:40, 1] = 0.8
    hs = np.full((Bo,), 24, np.int32)
    ws = np.full((Bo,), 100, np.int32)

    for dtype in (jnp.float32, jnp.float16):
        flat = jnp.asarray(canvas.reshape(-1), dtype)
        ref = np.asarray(
            measure_channels_packed(
                flat, hs, ws, shape=(Bo, Hb, Wb, C), fill_channels=(True, False)
            )
        )
        buf = measure_channels_with_canvas(
            flat, hs, ws, shape=(Bo, Hb, Wb, C), fill_channels=(True, False)
        )
        got_canvas, small, extremes = split_canvas_stats(buf, Bo, Hb, Wb, C)
        np.testing.assert_array_equal(
            np.asarray(got_canvas), np.asarray(flat).reshape(Bo, Hb, Wb, C)
        )
        ref_small, ref_ext = unpack_channel_stats(ref, Bo, Hb, C)
        np.testing.assert_array_equal(small, ref_small)
        np.testing.assert_array_equal(extremes, ref_ext)
        assert small[0, 1, 1] > 0  # channel 0, area, object 1


def test_device_tiled_inference_measure_on_mesh(rng):
    """Fused measurement composes with mesh-sharded tiled inference."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multi-device mesh")
    from jax.sharding import Mesh

    from maze_image_processing_pipeline_tpu.models import UNet, save_model, load_model
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        import jax.numpy as jnp

        module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
        params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        save_model(os.path.join(td, "m"), module, params,
                   outputs={"pred": {"channel_names": ["a", "b"]}})
        model = load_model(os.path.join(td, "m"), dtype="float32")

        from maze_image_processing_pipeline_tpu.models.inference import (
            DeviceTiledInference,
        )

        crops = [draw_blob(rng, shape=(70, 80), r=15) for _ in range(3)]
        mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
        out = []
        with Pipeline() as pl:
            img = Unpack(crops)
            pred, stats = DeviceTiledInference(
                model, img, tile_size=64, tile_stride=48, batch_size=2,
                mesh=mesh, measure_channels=["a", "b"],
                measure_fill_holes=True,
            )
            Call(lambda p, s: out.append((p, s)), pred, stats)
        pl.run()
        assert len(out) == 3
        for p, s in out:
            assert p.shape == (70, 80, 2)
            assert s is not None and s["extremes"].shape[0] == 2


def test_fused_measure_channel_count_mismatch_errors(rng):
    """A clear error (not an IndexError inside tracing) when the measured
    channel names do not match the model's output channel count."""
    import jax.numpy as jnp

    from maze_image_processing_pipeline_tpu.models.inference import (
        DeviceTiledInference,
    )
    from maze_image_processing_pipeline_tpu.models.model_io import LoadedModel

    class TwoChannel:
        def apply(self, params, x):
            return jnp.stack([x[..., 0], x[..., 0]], axis=-1) * 10 - 2

    model = LoadedModel(TwoChannel(), {}, {})
    with Pipeline() as pl:
        img = Unpack([np.zeros((64, 64), np.uint8)])
        DeviceTiledInference(
            model, img, tile_size=64, tile_stride=48, batch_size=2,
            measure_channels=["only_one"],
        )
    with pytest.raises(ValueError, match="only_one.*2 channels"):
        pl.run()


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_measure_fuzz_matches_host(seed):
    """Random noise canvases: every non-overflow (object, channel) must
    match the host measure_segments values exactly (areas/raw) and to
    float tolerance (axis); overflow flags must be set whenever the host
    found more components than the one-hot bounds."""
    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from maze_image_processing_pipeline_tpu.ops.segment_measure import (
        convex_area_from_extremes,
        measure_channels_packed,
        unpack_channel_stats,
    )

    rng = np.random.default_rng(seed)
    Bo, Hb, Wb, C = 6, 64, 128, 2
    # Sub-threshold noise floor + a bounded number of blobs/specks so a
    # realistic fraction (not all) of the masks stays under the one-hot
    # component bounds.
    canvas = rng.random((Bo, Hb, Wb, C)).astype(np.float32) * 0.45
    yy, xx = np.mgrid[0:Hb, 0:Wb]
    for b in range(Bo):
        for c in range(C):
            for _ in range(int(rng.integers(0, 4))):
                cy, cx = rng.integers(5, 50, 2)
                r = int(rng.integers(3, 12))
                canvas[b][((yy - cy) ** 2 + (xx - cx) ** 2) < r * r, c] = 0.9
                canvas[b, cy : cy + 2, cx : cx + 2, c] = 0.1
            for _ in range(int(rng.integers(0, 8))):
                sy, sx = rng.integers(0, Hb), rng.integers(0, Wb)
                canvas[b, sy, sx, c] = 0.8
    hs = rng.integers(20, Hb + 1, Bo).astype(np.int32)
    ws = rng.integers(40, Wb + 1, Bo).astype(np.int32)

    flat = jnp.asarray(canvas.reshape(-1))
    out = measure_channels_packed(
        flat, hs, ws, shape=(Bo, Hb, Wb, C), fill_channels=(True, False)
    )
    small, extremes = unpack_channel_stats(np.asarray(out), Bo, Hb, C)

    checked = 0
    for b in range(Bo):
        crop = canvas[b, : hs[b], : ws[b]]
        host_meta, _ = measure_segments(
            {}, None, crop, ["c0", "c1"], False, fill_holes=("c0",)
        )
        for c, name in enumerate(["c0", "c1"]):
            if small[c, 3, b] > 0:  # overflow → host fallback path
                continue
            assert small[c, 0, b] == host_meta[f"object_{name}_raw_area"], (b, c)
            assert small[c, 1, b] == host_meta[f"object_{name}_area"], (b, c)
            np.testing.assert_allclose(
                small[c, 2, b],
                host_meta[f"object_{name}_axis_major_length"],
                rtol=1e-4,
                err_msg=f"{b},{c}",
            )
            if small[c, 1, b] > 0:
                convex = convex_area_from_extremes(
                    extremes[c, b], (int(hs[b]), int(ws[b]))
                )
                assert convex == host_meta[f"object_{name}_area_convex"], (b, c)
            checked += 1
    assert checked >= Bo  # the fuzz must actually exercise the device path
