"""Full-haul end-to-end: loki re-segmentation → semseg → polytaxo.

Covers BASELINE.json config #5 on the CPU backend: a synthetic LOKI sample
tree is re-segmented with a U-Net-shaped oracle model, the resulting EcoTaxa
archive is run through tiled semantic segmentation (+ raw HDF5 features) and
polyhierarchical classification, producing all three output artifact kinds.
"""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maze_image_processing_pipeline_tpu.dataio import Archive, read_tsv
from maze_image_processing_pipeline_tpu.loki.pipeline import Runner as LokiRunner
from maze_image_processing_pipeline_tpu.models import ConvClassifier, UNet, save_model
from maze_image_processing_pipeline_tpu.predict.pipeline import Runner as PredictRunner

from fixtures import make_loki_sample
from test_loki_jax_segmentation import ThresholdNet  # registers the oracle arch
from test_predict_pipeline import make_taxonomy_files


def test_full_haul(tmp_path):
    # --- stage 0: models
    seg_model = str(tmp_path / "m" / "thrnet")
    module = ThresholdNet()
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(seg_model, module, params, outputs={"pred": {"channel_names": ["fg"]}})

    semseg_model = str(tmp_path / "m" / "unet2")
    unet = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    params = unet.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
    save_model(
        semseg_model, unet, params,
        outputs={"pred": {"channel_names": ["prosoma", "oilsack"]}},
    )

    clf_model = str(tmp_path / "m" / "clf")
    clf = ConvClassifier(n_outputs=4, features=(4, 8), dtype=jnp.float32)
    params = clf.init(jax.random.key(2), jnp.zeros((1, 64, 64, 3)))
    save_model(clf_model, clf, params, outputs={"probs": {}})

    tax_fn, csv_fn = make_taxonomy_files(tmp_path)

    # --- stage 1: loki re-segmentation
    make_loki_sample(str(tmp_path / "data"), n_frames=2, objects_per_frame=2,
                     frame_shape=(200, 260))
    loki_out = str(tmp_path / "loki_out")
    LokiRunner._configure_and_run(
        {
            "input": {"path": str(tmp_path / "data")},
            "segmentation": {
                "jax": {
                    "model_fn": seg_model,
                    "dtype": "float32",
                    "tile_size": 128,
                    "tile_stride": 96,
                    "postprocess": {"min_area": 20, "closing_radius": 1},
                    "padding": 8,
                }
            },
            "postprocess": {},
            "output": {"target_dir": loki_out},
        }
    )
    archive_fn = os.path.join(loki_out, "LOKI_PS122-1_7.zip")
    df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
    assert len(df) >= 2

    # --- stage 2: semseg + features over the loki output archive
    semseg_out = str(tmp_path / "semseg_out")
    PredictRunner._configure_and_run(
        {
            "input": {"path": archive_fn},
            "model": {
                "model_fn": semseg_model,
                "dtype": "float32",
                "batch_size": 2,
                "tiling": {"size": 64, "stride": 48},
            },
            "save_raw_h5": True,
            "segmentation": {"draw": False, "fill_holes": True, "device": True},
            "target_dir": semseg_out,
        }
    )
    seg_df = read_tsv(
        Archive(os.path.join(semseg_out, "LOKI_PS122-1_7.segmentation.zip"))
        / "ecotaxa_export.tsv"
    )
    assert "object_prosoma_area" in seg_df.columns
    with h5py.File(os.path.join(semseg_out, "LOKI_PS122-1_7.h5")) as h5:
        assert len(h5.keys()) == len(df)

    # --- stage 3: polytaxo over the same archive
    poly_out = str(tmp_path / "poly_out")
    PredictRunner._configure_and_run(
        {
            "input": {"path": archive_fn},
            "model": {
                "model_fn": clf_model,
                "dtype": "float32",
                "batch_size": 2,
                "input_size": 64,
            },
            "polytaxo": {
                "poly_taxonomy_fn": tax_fn,
                "ecotaxa_taxonomy_fn": csv_fn,
                "threshold": 0.01,
                "skip_unchanged_objects": False,
            },
            "target_dir": poly_out,
        }
    )
    poly_df = read_tsv(
        Archive(os.path.join(poly_out, "LOKI_PS122-1_7.polytaxo.zip"))
        / "ecotaxa_export.tsv"
    )
    assert len(poly_df) == len(df)
    assert (poly_df["object_annotation_status"] == "predicted").all()
