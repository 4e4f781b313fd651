"""End-to-end multi-chip tests on the virtual 8-device CPU mesh.

The ``parallel:`` config section (the TPU analog of the reference's
``n_threads`` knob, ``maze_ipp/loki/config_schema.py:66-68``) must produce
archives identical to the single-device run: batches are sharded over the
mesh's ``data`` axis and frames round-robined over devices, neither of
which may change results or output order.
"""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from maze_image_processing_pipeline_tpu.dataio import Archive, read_tsv
from maze_image_processing_pipeline_tpu.loki.pipeline import Runner
from maze_image_processing_pipeline_tpu.parallel import ParallelConfig, setup_parallel

from fixtures import make_loki_sample, make_threshold_model_dir


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    return make_threshold_model_dir(
        str(tmp_path_factory.mktemp("model") / "thrnet")
    )


def test_setup_parallel_defaults():
    assert setup_parallel(False) is None
    mesh = setup_parallel(ParallelConfig())
    assert mesh is not None and mesh.devices.size == len(jax.devices())
    mesh = setup_parallel(ParallelConfig(mesh={"data": 4, "model": 2}))
    assert mesh.devices.shape == (4, 2)


def _run_loki(tmp_path, model_dir, name, parallel):
    data_dir = tmp_path / "data"
    if not data_dir.exists():
        make_loki_sample(
            str(data_dir), n_frames=4, objects_per_frame=3, frame_shape=(180, 230)
        )
    target_dir = str(tmp_path / name)
    config = {
        "input": {"path": str(data_dir)},
        "segmentation": {
            "jax": {
                "model_fn": model_dir,
                "dtype": "float32",
                "batch_size": 4,
                "tile_size": 128,
                "tile_stride": 96,
                "stitch": True,
                "postprocess": {"closing_radius": 2, "min_area": 20,
                                "max_regions": 16},
                "padding": 10,
            }
        },
        "postprocess": {},
        "output": {"target_dir": target_dir},
        "parallel": parallel,
    }
    Runner._configure_and_run(config)
    archive_fn = os.path.join(target_dir, "LOKI_PS122-1_7.zip")
    assert os.path.exists(archive_fn), os.listdir(target_dir)
    return read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")


def test_loki_parallel_matches_single_device(tmp_path, model_dir):
    df_single = _run_loki(tmp_path, model_dir, "out_single", False)
    df_mesh = _run_loki(tmp_path, model_dir, "out_mesh", True)

    assert len(df_mesh) == len(df_single) >= 4
    # Output order (stateful downstream stages depend on it) and content
    # must be identical.
    assert list(df_mesh["object_id"]) == list(df_single["object_id"])
    for col in df_single.columns:
        if col in ("process_datetime", "process_id"):
            continue  # run-timestamp provenance, differs between runs
        a, b = df_single[col], df_mesh[col]
        if pd.api.types.is_float_dtype(a):
            np.testing.assert_allclose(a.to_numpy(), b.to_numpy(), rtol=1e-5, atol=1e-8)
        else:
            assert a.tolist() == b.tolist(), col


def test_loki_parallel_explicit_mesh(tmp_path, model_dir):
    df = _run_loki(
        tmp_path, model_dir, "out_mesh2", {"mesh": {"data": 8}}
    )
    assert len(df) >= 4


def test_device_tiled_inference_mesh_matches_single(tmp_path):
    """DeviceTiledInference with a mesh must run ONE sharded program over
    the data axis (params via shard_params) and reproduce the
    single-device predictions exactly."""
    import jax.numpy as jnp

    from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, Unpack
    from maze_image_processing_pipeline_tpu.models import (
        DeviceTiledInference,
        UNet,
        load_model,
        save_model,
    )

    from fixtures import draw_blob

    rng = np.random.default_rng(3)
    crops = [draw_blob(rng, shape=s, r=10) for s in [(64, 64), (100, 90), (40, 56)]]

    model_dir = str(tmp_path / "unet")
    module = UNet(out_channels=2, base_features=4, depth=1, dtype=jnp.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    save_model(
        model_dir, module, params,
        outputs={"pred": {"channel_names": ["a", "b"]}},
    )
    model = load_model(model_dir, dtype="float32")
    mesh = setup_parallel(ParallelConfig(mesh={"data": 8}))

    def run(mesh):
        out = []
        with Pipeline() as pl:
            img = Unpack(crops)
            pred, _ = DeviceTiledInference(
                model, img, tile_size=64, tile_stride=48, batch_size=2,
                mesh=mesh,
            )
            Call(lambda p: out.append(np.asarray(p)), pred)
        pl.run()
        return out

    single = run(None)
    sharded = run(mesh)
    assert len(single) == len(sharded) == len(crops)
    for a, b in zip(single, sharded):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_multihost_shard_union_equals_single_run(tmp_path, model_dir):
    """input.num_shards strided sample sharding (the multi-host scaling
    path, parallel/multihost.py): the union of the per-shard runs'
    archives must equal the unsharded run, byte-for-column."""
    data_dir = tmp_path / "multi"
    make_loki_sample(
        str(data_dir), name="LOKI_00001.01", n_frames=2,
        objects_per_frame=3, frame_shape=(180, 230), haul="7",
    )
    make_loki_sample(
        str(data_dir), name="LOKI_00002.01", n_frames=2,
        objects_per_frame=3, frame_shape=(180, 230), haul="8", seed=1,
    )

    def run(name, num_shards=1, shard_index=0):
        target_dir = str(tmp_path / name)
        Runner._configure_and_run(
            {
                "input": {
                    "path": str(data_dir),
                    "num_shards": num_shards,
                    "shard_index": shard_index,
                },
                "segmentation": {
                    "jax": {
                        "model_fn": model_dir,
                        "dtype": "float32",
                        "batch_size": 4,
                        "tile_size": 128,
                        "tile_stride": 96,
                        "stitch": True,
                        "postprocess": {"closing_radius": 2, "min_area": 20,
                                        "max_regions": 16},
                        "padding": 10,
                    }
                },
                "postprocess": {},
                "output": {"target_dir": target_dir},
            }
        )
        return {
            fn: read_tsv(Archive(os.path.join(target_dir, fn)) / "ecotaxa_export.tsv")
            for fn in sorted(os.listdir(target_dir))
            if fn.endswith(".zip") and "input_meta" not in fn
        }

    single = run("out_all")
    shard0 = run("out_s0", 2, 0)
    shard1 = run("out_s1", 2, 1)

    assert len(single) == 2
    # Disjoint shards covering everything.
    assert set(shard0) | set(shard1) == set(single)
    assert not (set(shard0) & set(shard1))
    for fn, df_ref in single.items():
        df_shard = (shard0 | shard1)[fn]
        assert list(df_shard["object_id"]) == list(df_ref["object_id"])
        for col in df_ref.columns:
            if col in ("process_datetime", "process_id"):
                continue
            a, b = df_shard[col], df_ref[col]
            if a.dtype.kind == "f":
                np.testing.assert_allclose(
                    a.to_numpy(), b.to_numpy(), rtol=1e-6, err_msg=col
                )
            else:
                assert a.tolist() == b.tolist(), col
