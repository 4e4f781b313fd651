import os
import zipfile

import numpy as np
import pandas as pd
import pytest

from maze_image_processing_pipeline_tpu.dataio import Archive, read_tsv
from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, Unpack
from maze_image_processing_pipeline_tpu.loki.meta import (
    MissingMetaError,
    ensure_object_frame_id,
    parse_object_id,
    update_and_validate_sample_meta,
)
from maze_image_processing_pipeline_tpu.loki.pipeline import (
    MergeAnnotations,
    Runner,
    calc_overlap,
    score_fn_simple,
)
from maze_image_processing_pipeline_tpu.loki.zoomie import (
    DetectDuplicates,
    DetectDuplicatesSimple,
)

from fixtures import make_loki_sample, make_object_id


class TestMeta:
    def test_parse_object_id(self):
        oid = make_object_id(seq=7, posx=123, posy=45)
        meta = parse_object_id(oid, {"x": 1})
        assert meta["object_id"] == oid
        assert meta["object_sequence"] == 7
        assert meta["object_posx"] == 123
        assert meta["object_posy"] == 45
        assert meta["object_frame_id"] == "20220103 120102  333"
        assert meta["x"] == 1

    def test_validate_sample_meta(self):
        with pytest.raises(MissingMetaError):
            update_and_validate_sample_meta("root", {"sample_station": "s"})

        full = {
            "sample_bottomdepth": 100,
            "sample_region": "r",
            "sample_detail_location": "l",
            "sample_vessel": "v",
            "sample_latitude": 1,
            "sample_longitude": 2,
            "sample_station": "st",
            "sample_haul": "7",
            "acq_instrument": "LOKI",
        }
        out = update_and_validate_sample_meta("root", full)
        assert out["sample_id"] == "st_7"
        assert out["acq_id"] == "LOKI_st_7"
        assert "process_id" in out

    def test_ensure_object_frame_id(self):
        df = pd.DataFrame({"object_id": [make_object_id(seq=1), make_object_id(seq=2)]})
        out = ensure_object_frame_id(df)
        assert (out["object_frame_id"] == "20220103 120102  333").all()


class TestOverlap:
    def test_calc_overlap_identical(self):
        assert calc_overlap((0, 0), (10, 10), (0, 0), (10, 10))[2] == 1.0

    def test_calc_overlap_disjoint(self):
        assert calc_overlap((0, 0), (10, 10), (20, 20), (5, 5))[2] == 0.0

    def test_score_fn_simple(self):
        m0 = dict(object_posx=0, object_posy=0, object_width=10, object_height=10)
        m1 = dict(object_posx=5, object_posy=0, object_width=10, object_height=10)
        iou = score_fn_simple(m0, m1)
        assert iou == pytest.approx(50 / 150)


class TestDedup:
    def _run(self, objects, min_similarity=0.5, max_age=1):
        with Pipeline() as p:
            item = Unpack(objects)
            frame = Call(lambda o: o["frame"], item)
            oid = Call(lambda o: o["id"], item)
            meta = Call(lambda o: o["meta"], item)
            dupset = DetectDuplicatesSimple(
                frame, oid, score_fn=score_fn_simple, score_arg=meta,
                min_similarity=min_similarity, max_age=max_age,
            )
        objs = p.run()
        return [(o[oid], o[dupset]) for o in objs]

    @staticmethod
    def obj(frame, oid, x, y, w=10, h=10):
        return {
            "frame": frame,
            "id": oid,
            "meta": dict(object_posx=x, object_posy=y, object_width=w, object_height=h),
        }

    def test_duplicate_across_frames(self):
        objects = [
            self.obj("f1", "a", 0, 0),
            self.obj("f1", "b", 100, 100),
            self.obj("f2", "c", 1, 0),   # overlaps a -> dup of a
            self.obj("f2", "d", 200, 200),
        ]
        result = dict(self._run(objects))
        assert result["a"] == "a"
        assert result["c"] == "a"
        assert result["d"] == "d"

    def test_max_age_eviction(self):
        # max_age counts the frames an unseen object stays matchable:
        # with max_age=0 'a' is evicted right after f2, so 'c' is new;
        # with max_age=1 'a' survives one missed frame and 'c' matches it.
        objects = [
            self.obj("f1", "a", 0, 0),
            self.obj("f2", "b", 500, 500),
            self.obj("f3", "c", 1, 0),
        ]
        result = dict(self._run(objects, max_age=0))
        assert result["c"] == "c"

        result2 = dict(self._run(objects, max_age=1))
        assert result2["c"] == "a"

    def test_orb_duplicates(self, rng):
        # The feature-based variant: the same textured crop twice must match.
        from fixtures import draw_blob

        crop = draw_blob(rng, shape=(80, 100), r=18)
        texture = (rng.random(crop.shape) * 120).astype(np.uint8)
        crop = np.where(crop > 100, texture + 100, crop).astype(np.uint8)
        shifted = np.roll(crop, 2, axis=1)
        other = (rng.random((80, 100)) * 255).astype(np.uint8)

        objects = [
            {"frame": "f1", "id": "a", "img": crop, "meta": {}},
            {"frame": "f2", "id": "b", "img": shifted, "meta": {}},
            {"frame": "f3", "id": "c", "img": other, "meta": {}},
        ]
        with Pipeline() as p:
            item = Unpack(objects)
            frame = Call(lambda o: o["frame"], item)
            oid = Call(lambda o: o["id"], item)
            img = Call(lambda o: o["img"], item)
            dupset = DetectDuplicates(
                oid, img, frame, min_similarity=0.3, max_age=1
            )
        objs = p.run()
        result = {o[oid]: o[dupset] for o in objs}
        assert result["b"] == "a"
        assert result["c"] == "c"

    def test_orb_duplicates_parallel_matches_serial(self, rng):
        """Thread-pooled feature scoring (n_workers>1) must give the same
        dupsets as serial scoring."""
        from fixtures import draw_blob

        frames = []
        for f in range(4):
            crop = draw_blob(rng, shape=(80, 100), r=18)
            texture = (rng.random(crop.shape) * 120).astype(np.uint8)
            crop = np.where(crop > 100, texture + 100, crop).astype(np.uint8)
            frames.append(crop)

        objects = []
        for f, crop in enumerate(frames):
            objects.append({"frame": f"f{f}", "id": f"o{f}a", "img": crop})
            objects.append(
                {"frame": f"f{f}", "id": f"o{f}b", "img": np.roll(crop, 3, axis=0)}
            )

        def run(n_workers):
            with Pipeline() as p:
                item = Unpack(objects)
                frame = Call(lambda o: o["frame"], item)
                oid = Call(lambda o: o["id"], item)
                img = Call(lambda o: o["img"], item)
                dupset = DetectDuplicates(
                    oid, img, frame, min_similarity=0.3, max_age=1,
                    n_workers=n_workers,
                )
            return {o[oid]: o[dupset] for o in p.run()}

        assert run(4) == run(1)


class TestMergeAnnotations:
    def test_merge(self):
        annotations = pd.DataFrame(
            {
                "object_id": ["old1", "old2"],
                "object_frame_id": ["f1", "f1"],
                "object_posx": [0, 100],
                "object_posy": [0, 100],
                "object_width": [10, 10],
                "object_height": [10, 10],
                "object_annotation_category": ["Calanus", "Oithona"],
                "object_annotation_status": ["validated", "predicted"],
            }
        )

        metas = [
            dict(object_frame_id="f1", object_posx=1, object_posy=0,
                 object_width=10, object_height=10),   # near old1 (iou ~0.8)
            dict(object_frame_id="f1", object_posx=50, object_posy=50,
                 object_width=5, object_height=5),     # no match
            dict(object_frame_id="f2", object_posx=0, object_posy=0,
                 object_width=10, object_height=10),   # unknown frame
        ]

        with Pipeline() as p:
            m = Unpack(metas)
            merged = MergeAnnotations(m, annotations, min_overlap=0.5,
                                      min_validated_overlap=0.95)
        objs = p.run()

        m0 = objs[0][merged]
        assert m0["object_annotation_category"] == "Calanus"
        # overlap < min_validated_overlap downgrades validated -> predicted
        assert m0["object_annotation_status"] == "predicted"
        assert m0["object_annotation_merge_src"] == "old1"

        m1 = objs[1][merged]
        assert m1["object_annotation_category"] == ""

        m2 = objs[2][merged]
        assert "object_annotation_merge_overlap" not in m2


class TestLokiEndToEnd:
    def test_threshold_pipeline(self, tmp_path):
        make_loki_sample(str(tmp_path / "data"), n_frames=3, objects_per_frame=2)
        target_dir = str(tmp_path / "out")

        config = {
            "input": {
                "path": str(tmp_path / "data"),
                "discover": True,
                "default_meta": {},
            },
            "segmentation": {"threshold": 60},
            "postprocess": {"rescale_max_intensity": True,
                            "scalebar": {"px_per_mm": 50.0}},
            "output": {"target_dir": target_dir, "store_mask": True},
        }

        Runner._configure_and_run(config)

        archive_fn = os.path.join(target_dir, "LOKI_PS122-1_7.zip")
        assert os.path.exists(archive_fn)

        df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
        assert len(df) == 6  # 3 frames x 2 objects
        # ZooProcess features present
        for col in ["object_area", "object_major", "object_minor", "object_mean",
                    "object_perim.", "object_circ."]:
            assert col in df.columns, col
        assert (df["object_area"] > 0).all()
        # telemetry merged
        assert "object_pressure" in df.columns
        # sample metadata propagated
        assert (df["sample_id"] == "PS122-1_7").all()
        # process metadata recorded
        assert "process_id" in df.columns
        # images written (vignette + mask per object)
        with zipfile.ZipFile(archive_fn) as zf:
            names = zf.namelist()
        jpgs = [n for n in names if n.endswith(".jpg")]
        assert len(jpgs) == 12  # 6 images + 6 masks

    def test_golden_dat_fallback_and_annotation_merge(self, tmp_path):
        """Real-haul fidelity: telemetry .dat-fallback + annotation-merge
        downgrade, end-to-end (reference maze_ipp/loki/pipeline.py:242-254
        telemetry read, :991-1073 annotation merge).

        The sample tree alternates .tmd / .dat telemetry snapshots, so
        half the frames are ONLY covered by the old-format fallback; a
        second pipeline pass merges a prior EcoTaxa export where one
        annotation matches exactly (stays validated) and one overlaps
        below min_validated_overlap (downgrades to predicted).
        """
        make_loki_sample(
            str(tmp_path / "data"),
            n_frames=4,
            objects_per_frame=2,
            telemetry_style="mixed",
        )
        target_dir = str(tmp_path / "out")
        config = {
            "input": {"path": str(tmp_path / "data")},
            "segmentation": {"threshold": 60},
            "postprocess": {},
            "output": {"target_dir": target_dir},
        }
        Runner._configure_and_run(config)

        archive_fn = os.path.join(target_dir, "LOKI_PS122-1_7.zip")
        df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
        assert len(df) == 8

        # Golden telemetry values: frame i carries PRESS = 10.5 + i; the
        # odd frames exist only as .dat files, so their presence proves
        # the fallback was read and joined by nearest timestamp.
        by_frame = df.groupby("object_frame_id")["object_pressure"].first()
        assert len(by_frame) == 4
        np.testing.assert_allclose(
            np.sort(by_frame.to_numpy()), [10.5, 11.5, 12.5, 13.5]
        )
        lon = df.groupby("object_frame_id")["object_lon"].first()
        np.testing.assert_allclose(
            np.sort(lon.to_numpy()), [134.70, 134.71, 134.72, 134.73]
        )

        # Build a prior export: object 0's bbox matches exactly
        # (overlap 1.0 >= min_validated_overlap -> stays validated);
        # object 1's bbox is shifted so IoU lands in
        # [min_overlap, min_validated_overlap) -> downgraded.
        o0, o1 = df.iloc[0], df.iloc[1]
        w, h = int(o1["object_width"]), int(o1["object_height"])
        shift = max(1, int(round(w * 0.25)))
        annotations = pd.DataFrame(
            {
                "object_id": ["prior0", "prior1"],
                "object_frame_id": [
                    o0["object_frame_id"],
                    o1["object_frame_id"],
                ],
                "object_posx": [o0["object_posx"], o1["object_posx"] + shift],
                "object_posy": [o0["object_posy"], o1["object_posy"]],
                "object_width": [o0["object_width"], w],
                "object_height": [o0["object_height"], h],
                "object_annotation_category": ["Calanus", "Oithona"],
                "object_annotation_status": ["validated", "validated"],
            }
        )
        iou_shift = (w - shift) / (w + shift)  # overlap of the shifted bbox
        assert 0.5 <= iou_shift < 0.95

        ann_fn = str(tmp_path / "prior.tsv")
        annotations.to_csv(ann_fn, sep="\t", index=False)

        target2 = str(tmp_path / "out2")
        config2 = {
            "input": {"path": str(tmp_path / "data")},
            "segmentation": {"threshold": 60},
            "postprocess": {
                "merge_annotations": {
                    "annotations_fn": ann_fn,
                    "min_overlap": 0.4,
                    "min_validated_overlap": 0.95,
                }
            },
            "output": {"target_dir": target2},
        }
        Runner._configure_and_run(config2)
        df2 = read_tsv(
            Archive(os.path.join(target2, "LOKI_PS122-1_7.zip"))
            / "ecotaxa_export.tsv"
        )
        df2 = df2.set_index("object_id")
        m0 = df2.loc[o0["object_id"]]
        assert m0["object_annotation_category"] == "Calanus"
        assert m0["object_annotation_status"] == "validated"
        assert m0["object_annotation_merge_src"] == "prior0"
        m1 = df2.loc[o1["object_id"]]
        assert m1["object_annotation_category"] == "Oithona"
        assert m1["object_annotation_status"] == "predicted"
        # Objects with no prior annotation get blanked columns.
        rest = df2.drop([o0["object_id"], o1["object_id"]])
        assert (rest["object_annotation_category"].fillna("") == "").all()

    def test_skip_existing(self, tmp_path):
        make_loki_sample(str(tmp_path / "data"), n_frames=1, objects_per_frame=1)
        target_dir = str(tmp_path / "out")
        os.makedirs(target_dir)
        archive_fn = os.path.join(target_dir, "LOKI_PS122-1_7.zip")
        open(archive_fn, "wb").write(b"existing")

        config = {
            "input": {"path": str(tmp_path / "data")},
            "segmentation": {"threshold": 60},
            "postprocess": {},
            "output": {"target_dir": target_dir, "skip_existing": True},
        }
        Runner._configure_and_run(config)
        assert open(archive_fn, "rb").read() == b"existing"

    def test_input_filter_and_slice(self, tmp_path):
        make_loki_sample(str(tmp_path / "data"), n_frames=3, objects_per_frame=2)
        target_dir = str(tmp_path / "out")
        config = {
            "input": {"path": str(tmp_path / "data"), "slice": 3},
            "segmentation": {"threshold": 60,
                             "filter_expr": "object_area > 0"},
            "postprocess": {},
            "output": {"target_dir": target_dir},
        }
        Runner._configure_and_run(config)
        df = read_tsv(Archive(os.path.join(target_dir, "LOKI_PS122-1_7.zip")) / "ecotaxa_export.tsv")
        assert len(df) == 3
