import numpy as np
import pytest

from maze_image_processing_pipeline_tpu.engine import (
    AggregateErrorsPipeline,
    Batch,
    BatchedPipeline,
    Call,
    DataParallelPipeline,
    Filter,
    MergeNodesPipeline,
    Node,
    Output,
    Pipeline,
    ReturnOutputs,
    Slice,
    Stitch,
    StreamBuffer,
    StreamObject,
    TiledPipeline,
    Unpack,
    Variable,
    stream_groupby,
)


def run_collect(pipeline, seed=None):
    if seed is None:
        seed = [StreamObject(n_remaining_hint=1)]
    return pipeline.run(iter(seed))


def test_call_and_unpack():
    with Pipeline() as p:
        item = Unpack([1, 2, 3])
        doubled = Call(lambda x: x * 2, item)

    objs = run_collect(p)
    assert [o[doubled] for o in objs] == [2, 4, 6]


def test_variable_operators():
    with Pipeline() as p:
        item = Unpack([{"a": 5}, {"a": 10}])
        a = item["a"]
        gt = a > 7
        s = a + 1

    objs = run_collect(p)
    assert [o[a] for o in objs] == [5, 10]
    assert [o[gt] for o in objs] == [False, True]
    assert [o[s] for o in objs] == [6, 11]


def test_filter_variable_and_callable():
    with Pipeline() as p:
        item = Unpack(range(10))
        keep = Call(lambda x: x % 2 == 0, item)
        Filter(keep)
        Filter(lambda obj: obj[item] > 3)

    objs = run_collect(p)
    assert [o[item] for o in objs] == [4, 6, 8]


def test_slice():
    with Pipeline() as p:
        item = Unpack(range(100))
        Slice(5)

    assert len(run_collect(p)) == 5


def test_stream_buffer_preserves_order():
    with Pipeline() as p:
        item = Unpack(range(50))
        StreamBuffer(4)
        out = Call(lambda x: x + 1, item)

    objs = run_collect(p)
    assert [o[out] for o in objs] == list(range(1, 51))


def test_stream_buffer_propagates_errors():
    def boom(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    with Pipeline() as p:
        item = Unpack(range(5))
        Call(boom, item)
        StreamBuffer(2)

    with pytest.raises(RuntimeError):
        run_collect(p)


def test_batched_pipeline_batches_and_splits():
    seen_batches = []

    def record(xs):
        seen_batches.append(list(xs))
        return Batch([x * 10 for x in xs])

    with Pipeline() as p:
        item = Unpack(range(7))
        with BatchedPipeline(3):
            out = Call(record, item)

    objs = run_collect(p)
    assert [o[out] for o in objs] == [x * 10 for x in range(7)]
    assert seen_batches == [[0, 1, 2], [3, 4, 5], [6]]


def test_data_parallel_pipeline():
    with Pipeline() as p:
        item = Unpack(range(20))
        with DataParallelPipeline(executor=4):
            out = Call(lambda x: x * x, item)

    objs = run_collect(p)
    assert sorted(o[out] for o in objs) == [x * x for x in range(20)]


def test_data_parallel_pipeline_preserves_order():
    """Stream order must survive uneven per-object latencies (the contract
    that makes Stitch/dedup/HDF5-append safe downstream)."""
    import time

    def jittery(x):
        time.sleep(0.02 if x % 5 == 0 else 0.001)
        return x * x

    with Pipeline() as p:
        item = Unpack(range(40))
        with DataParallelPipeline(executor=4):
            out = Call(jittery, item)

    objs = run_collect(p)
    assert [o[out] for o in objs] == [x * x for x in range(40)]


def test_data_parallel_pipeline_order_into_hdf5(tmp_path):
    """n_workers>1 feeding HDF5Writer(append) keeps row order aligned."""
    import time

    import h5py

    from maze_image_processing_pipeline_tpu.dataio import HDF5Writer

    fn = str(tmp_path / "out.h5")

    def jittery(x):
        time.sleep(0.015 if x % 3 == 0 else 0.001)
        return float(x) * 2

    with Pipeline() as p:
        item = Unpack(range(24))
        with DataParallelPipeline(executor=4):
            val = Call(jittery, item)
        HDF5Writer(fn, [("idx", item), ("val", val)], dataset_mode="append")

    run_collect(p)
    with h5py.File(fn) as f:
        idx = f["idx"][:]
        val = f["val"][:]
    assert list(idx) == list(range(24))
    assert list(val) == [2.0 * x for x in range(24)]


def test_merge_nodes_pipeline_absorbs_errors():
    errors = []

    def boom(x):
        if x % 2:
            raise ValueError(x)
        return x

    with Pipeline() as p:
        item = Unpack(range(6))
        with MergeNodesPipeline(on_error=lambda exc, x: errors.append(x), on_error_args=(item,)):
            out = Call(boom, item)

    objs = run_collect(p)
    assert [o[out] for o in objs] == [0, 2, 4]
    assert errors == [1, 3, 5]


def test_aggregate_errors_pipeline():
    with Pipeline() as p:
        item = Unpack(range(4))
        with AggregateErrorsPipeline():
            Call(lambda x: 1 / (x % 2), item)

    with pytest.raises(ExceptionGroup) as excinfo:
        run_collect(p)
    assert len(excinfo.value.exceptions) == 2


def test_custom_node_with_outputs():
    @ReturnOutputs
    @Output("twice")
    @Output("thrice")
    class Multi(Node):
        def __init__(self, value):
            self.value = value
            super().__init__()

        def transform(self, value):
            return value * 2, value * 3

    with Pipeline() as p:
        item = Unpack([1, 2])
        twice, thrice = Multi(item)

    objs = run_collect(p)
    assert [o[twice] for o in objs] == [2, 4]
    assert [o[thrice] for o in objs] == [3, 6]


def test_stream_groupby():
    with Pipeline() as p:
        item = Unpack([("a", 1), ("a", 2), ("b", 3), ("b", 4), ("a", 5)])
        key = Call(lambda t: t[0], item)

    stream = p.transform_stream(iter([StreamObject(n_remaining_hint=1)]))
    groups = [(k, [o[item][1] for o in sub]) for k, sub in stream_groupby(stream, key)]
    assert groups == [("a", [1, 2]), ("b", [3, 4]), ("a", [5])]


def test_n_remaining_hint_propagation():
    with Pipeline() as p:
        item = Unpack(range(10))

    objs = run_collect(p)
    # First object should estimate 10 to come, last should estimate 1.
    assert objs[0].n_remaining_hint == 10
    assert objs[-1].n_remaining_hint == 1


def test_unpack_of_variable():
    with Pipeline() as p:
        seq = Call(lambda: [7, 8], )
        item = Unpack(seq)

    objs = run_collect(p)
    assert [o[item] for o in objs] == [7, 8]


class TestTiledPipeline:
    def test_roundtrip_linear_blend(self, rng):
        image = rng.integers(0, 255, (300, 500), dtype=np.uint8)

        with Pipeline() as p:
            img_var = Unpack([image])
            with TiledPipeline((128, 128), img_var, tile_stride=(96, 96), blend_strategy="linear"):
                out = Call(lambda t: t.astype(np.float32) / 255.0, img_var)

        objs = run_collect(p)
        assert len(objs) == 1
        # The reassembled derived output must match the untiled computation.
        np.testing.assert_allclose(objs[0][out], image.astype(np.float32) / 255.0, atol=1e-5)
        # The original image variable must be restored to full frame.
        np.testing.assert_array_equal(objs[0][img_var], image)

    def test_small_image_single_padded_tile(self, rng):
        image = rng.integers(0, 255, (50, 60), dtype=np.uint8)
        shapes = []

        with Pipeline() as p:
            img_var = Unpack([image])
            with TiledPipeline((128, 128), img_var):
                Call(lambda t: shapes.append(t.shape), img_var)

        objs = run_collect(p)
        assert shapes == [(128, 128)]
        np.testing.assert_array_equal(objs[0][img_var], image)

    def test_flat_blend_exact_with_many_tiles(self, rng):
        """Flat (overwrite) reassembly must be exact for frames with many
        tiles — the previous (index+1)**4 weight emulation lost float32
        precision past a few dozen tiles."""
        image = rng.integers(0, 255, (200, 210), dtype=np.uint8)

        with Pipeline() as p:
            img_var = Unpack([image])
            # 20x21 grid = 420 tiles; (421)**4 ≈ 3e10 would have eaten the
            # low bits of weighted values.
            with TiledPipeline((10, 10), img_var, blend_strategy="flat"):
                out = Call(lambda t: t.astype(np.float32), img_var)

        objs = run_collect(p)
        np.testing.assert_array_equal(objs[0][out], image.astype(np.float32))
        np.testing.assert_array_equal(objs[0][img_var], image)

    def test_dropped_tiles_fill_zero(self):
        image = np.zeros((100, 200), dtype=np.float32)
        image[:, 100:] = 1.0

        with Pipeline() as p:
            img_var = Unpack([image])
            with TiledPipeline((100, 100), img_var):
                keep = Call(lambda t: bool((t > 0).any()), img_var)
                Filter(keep)
                out = Call(lambda t: t + 1.0, img_var)

        objs = run_collect(p)
        result = objs[0][out]
        assert result.shape == (100, 200)
        np.testing.assert_allclose(result[:, 100:], 2.0)
        np.testing.assert_allclose(result[:, :100], 0.0)


def test_stitch():
    crops = [
        ("f1", 0, 0, np.full((2, 2), 1, dtype=np.uint8)),
        ("f1", 0, 3, np.full((2, 2), 2, dtype=np.uint8)),
        ("f2", 1, 1, np.full((3, 3), 5, dtype=np.uint8)),
    ]

    with Pipeline() as p:
        crop = Unpack(crops)
        frame_id = Call(lambda c: c[0], crop)
        posy = Call(lambda c: c[1], crop)
        posx = Call(lambda c: c[2], crop)
        img = Call(lambda c: c[3], crop)
        stitched = Stitch(img, groupby=frame_id, offset=(posy, posx))

    objs = run_collect(p)
    assert len(objs) == 2
    s1 = objs[0][stitched]
    assert s1.shape == (2, 5)
    assert s1.n_regions == 2
    assert s1[0, 0] == 1 and s1[0, 4] == 2 and s1[0, 2] == 0
    s2 = objs[1][stitched]
    assert s2.shape == (4, 4)
    assert s2.n_regions == 1


def test_stream_buffer_early_close_unblocks_producer():
    """Abandoning the consumer mid-stream must stop the worker thread and
    run upstream finalizers (writer close/archive finalize live there) —
    round-3 hunt: the worker used to block forever in q.put on the full
    bounded queue."""
    import threading
    import time

    from maze_image_processing_pipeline_tpu.engine.core import StreamObject

    upstream_closed = []

    def upstream():
        try:
            for i in range(1000):
                yield StreamObject({})
        finally:
            upstream_closed.append(True)

    buf = StreamBuffer(2)
    gen = buf.transform_stream(upstream())
    next(gen)
    next(gen)
    gen.close()  # early consumer termination

    deadline = time.time() + 3
    while not upstream_closed and time.time() < deadline:
        time.sleep(0.05)
    assert upstream_closed, "upstream finally never ran"
    deadline = time.time() + 3
    while time.time() < deadline and any(
        t.name == "StreamBuffer" and t.is_alive() for t in threading.enumerate()
    ):
        time.sleep(0.05)
    assert not any(
        t.name == "StreamBuffer" and t.is_alive() for t in threading.enumerate()
    ), "StreamBuffer worker thread leaked"


def test_data_parallel_early_close_unblocks_threads():
    """Same defect class as StreamBuffer for DataParallelPipeline's
    feeder/worker threads."""
    import threading
    import time

    from maze_image_processing_pipeline_tpu.engine import DataParallelPipeline
    from maze_image_processing_pipeline_tpu.engine.core import StreamObject

    upstream_closed = []

    def upstream():
        try:
            for i in range(1000):
                yield StreamObject({})
        finally:
            upstream_closed.append(True)

    with Pipeline() as p:
        dp = DataParallelPipeline(executor=2, queue_size=2)

    gen = dp.transform_stream(upstream())
    next(gen)
    gen.close()

    deadline = time.time() + 5
    while time.time() < deadline and (
        not upstream_closed
        or any(t.name.startswith("dp-") and t.is_alive() for t in threading.enumerate())
    ):
        time.sleep(0.05)
    assert upstream_closed, "upstream finally never ran"
    assert not any(
        t.name.startswith("dp-") and t.is_alive() for t in threading.enumerate()
    ), "dp threads leaked"


def test_slice_does_not_overpull_upstream():
    """Slice(n) must not pull (and fully compute) object n+1 just to
    discard it (round-3 hunt)."""
    pulled = []

    with Pipeline() as p:
        item = Unpack(range(100))
        Call(lambda x: pulled.append(x), item)
        Slice(5)

    objs = run_collect(p)
    assert len(objs) == 5
    assert len(pulled) == 5  # not 6
