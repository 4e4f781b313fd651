import numpy as np
import pytest

from maze_image_processing_pipeline_tpu.parallel import (
    make_mesh,
    partition_work,
    shard_batch_spec,
)


class TestPartitionWork:
    def test_strided_cover_disjoint(self):
        items = list(range(10))
        shards = [partition_work(items, 3, i) for i in range(3)]
        assert sorted(sum(shards, [])) == items
        assert shards[0] == [0, 3, 6, 9]
        assert shards[1] == [1, 4, 7]

    def test_bad_host(self):
        with pytest.raises(ValueError):
            partition_work([1], 2, 5)


class TestMesh:
    def test_make_mesh_axes(self):
        mesh = make_mesh({"data": 4, "model": 2})
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "model")

    def test_make_mesh_bad_product(self):
        with pytest.raises(ValueError):
            make_mesh({"data": 3})

    def test_shard_batch_spec(self):
        mesh = make_mesh({"data": 2, "space": 2, "model": 2})
        spec = shard_batch_spec(mesh, 4)
        assert spec == __import__("jax").sharding.PartitionSpec("data", "space", None, None)


def test_resolve_device_flag():
    """'auto' resolves via the dispatch probe: False on the CPU backend,
    explicit booleans pass through untouched."""
    from maze_image_processing_pipeline_tpu.parallel.probe import (
        resolve_device_flag,
    )

    assert resolve_device_flag(True) is True
    assert resolve_device_flag(False) is False
    # Test session runs on the CPU backend -> host path.
    assert resolve_device_flag("auto") is False
