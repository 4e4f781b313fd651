import logging
import os

import numpy as np
import pytest

from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, Unpack
from maze_image_processing_pipeline_tpu.loki.zoomie import StoreDupsets
from maze_image_processing_pipeline_tpu.progress import LogProgress, ProgressLogger, format_interval, format_number


class TestStoreDupsets:
    def test_stores_dupsets_and_masters(self, tmp_path, rng):
        out_dir = str(tmp_path / "dups")
        img = (rng.random((16, 16)) * 255).astype(np.uint8)
        # frame f1: master 'a'; frame f2: 'b' is a duplicate of 'a'
        objects = [
            ("f1", "a", "a", img),
            ("f2", "b", "a", img),
            ("f2", "c", "c", img),  # singleton master
        ]

        with Pipeline() as p:
            obj = Unpack(objects)
            frame = Call(lambda o: o[0], obj)
            oid = Call(lambda o: o[1], obj)
            dupset = Call(lambda o: o[2], obj)
            image = Call(lambda o: o[3], obj)
            StoreDupsets(oid, dupset, image, frame, out_dir, save_singletons=True)
        p.run()

        # duplicate 'b' and its master 'a' stored in the dupset folder
        assert os.path.exists(os.path.join(out_dir, "a", "b.jpg"))
        assert os.path.exists(os.path.join(out_dir, "a", "a.jpg"))


class TestProgress:
    def test_format_helpers(self):
        assert format_number(1500, "si") == "1.50k"
        assert format_number(2048, "iec") == "2.00ki"
        assert format_number(3.5, None) == "3.50"
        assert format_interval(3723) == "1:02:03"
        assert format_interval(83) == "01:23"

    def test_progress_logger_logs(self, caplog):
        plog = ProgressLogger(description="test", n_total=10, log_interval=0)
        with caplog.at_level(logging.INFO):
            for _ in range(3):
                plog.update()
        assert any("test" in r.message for r in caplog.records)

    def test_sliding_window_rate(self, monkeypatch):
        """rate() averages over the trailing window only: old checkpoints
        age out (slow warm-up no longer biases the estimate) and the
        retained head may straddle the horizon."""
        import maze_image_processing_pipeline_tpu.progress as prog

        t = [0.0]
        monkeypatch.setattr(prog.time, "monotonic", lambda: t[0])
        p = prog.ProgressLogger(log_interval=1e9, window=10.0)
        # slow phase: 1 item / 5 s
        for _ in range(4):
            t[0] += 5.0
            p.update(1)
        # fast phase: 10 items / s for 10 s -> window now covers only this
        for _ in range(10):
            t[0] += 1.0
            p.update(10)
        assert p.rate() == pytest.approx(10.0, rel=0.15)
        # head of the deque is at most one checkpoint older than horizon
        assert p._checkpoints[1][0] > t[0] - 10.0

    def test_finish_logs_summary(self, caplog):
        plog = ProgressLogger(description="haul", log_interval=1e9)
        with caplog.at_level(logging.INFO):
            plog.update(5)
            plog.finish()
        assert any(
            "done" in r.message and "haul" in r.message for r in caplog.records
        )

    def test_log_progress_node(self, caplog):
        with Pipeline() as p:
            Unpack(range(5))
            LogProgress("items", log_interval=0)
        with caplog.at_level(logging.INFO):
            p.run()
        assert any("items" in r.message for r in caplog.records)
