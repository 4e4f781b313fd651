import io
import os
import zipfile

import numpy as np
import pandas as pd
import pytest

from maze_image_processing_pipeline_tpu.dataio import (
    Archive,
    EcotaxaReader,
    EcotaxaWriter,
    HDF5Writer,
    ImageReader,
    LOG_FIELDS_TO_ECOTAXA,
    Telemetry,
    decode_image,
    encode_image,
    find_data_roots,
    read_log,
    read_tmd,
    read_tsv,
    write_tsv,
)
from maze_image_processing_pipeline_tpu.engine import Call, Pipeline, StreamObject, Unpack

from fixtures import make_loki_sample


class TestArchive:
    def test_directory_archive(self, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "sub" / "a.txt").write_text("hello")
        (tmp_path / "b.txt").write_text("world")

        arch = Archive(str(tmp_path))
        assert (arch / "sub" / "a.txt").read_text() == "hello"
        assert (arch / "missing.txt").exists() is False
        names = [p.name for p in arch.glob("*.txt")]
        assert names == ["b.txt"]
        assert [p.name for p in arch.glob("sub/*.txt")] == ["a.txt"]

    def test_zip_archive_roundtrip(self, tmp_path):
        zpath = str(tmp_path / "test.zip")
        w = Archive(zpath, mode="w")
        (w / "x/y.txt").write_bytes(b"abc")
        (w / "z.txt").write_bytes(b"def")
        w.close()

        r = Archive(zpath)
        assert (r / "x" / "y.txt").read_bytes() == b"abc"
        assert (r / "x").is_dir()
        assert sorted(p.name for p in r.iterdir()) == ["x", "z.txt"]
        assert [p.rel for p in r.glob("x/*.txt")] == ["x/y.txt"]
        r.close()


class TestTsv:
    def test_roundtrip_with_types(self, tmp_path):
        df = pd.DataFrame(
            {"object_id": ["a", "b"], "object_area": [1.5, 2.0], "object_n": [1, 2]}
        )
        fn = str(tmp_path / "t.tsv")
        write_tsv(df, fn)

        raw = open(fn).read().splitlines()
        assert raw[1].split("\t") == ["[t]", "[f]", "[f]"]

        back = read_tsv(fn)
        assert list(back.columns) == list(df.columns)
        assert back["object_area"].tolist() == [1.5, 2.0]
        assert back["object_id"].tolist() == ["a", "b"]

    def test_read_without_type_row(self, tmp_path):
        fn = str(tmp_path / "t.tsv")
        with open(fn, "w") as f:
            f.write("object_id\tobject_area\no1\t3.5\no2\t4.5\n")
        df = read_tsv(fn)
        assert len(df) == 2
        assert df["object_area"].tolist() == [3.5, 4.5]


class TestImageIO:
    @pytest.mark.parametrize("ext", [".png", ".jpg", ".bmp"])
    def test_encode_decode(self, rng, ext):
        img = (rng.random((32, 40)) * 255).astype(np.uint8)
        data = encode_image(img, "x" + ext)
        back = decode_image(data, mode="L")
        assert back.shape == img.shape
        if ext != ".jpg":
            np.testing.assert_array_equal(back, img)

    def test_image_reader_node(self, tmp_path, rng):
        img = (rng.random((20, 30)) * 255).astype(np.uint8)
        fn = str(tmp_path / "img.png")
        open(fn, "wb").write(encode_image(img, fn))

        with Pipeline() as p:
            path = Unpack([fn])
            image = ImageReader(path, "L")

        objs = p.run()
        np.testing.assert_array_equal(objs[0][image], img)


class TestEcotaxaArchives:
    def test_writer_reader_roundtrip(self, tmp_path, rng):
        images = [(rng.random((16, 16)) * 255).astype(np.uint8) for _ in range(3)]
        archive_fn = str(tmp_path / "out" / "archive.zip")

        with Pipeline() as p:
            idx = Unpack([0, 1, 2])
            img = Call(lambda i: images[i], idx)
            meta = Call(lambda i: {"object_id": f"obj{i}", "object_area": float(i)}, idx)
            fn = Call(lambda i: f"obj{i}.png", idx)
            EcotaxaWriter(archive_fn, [(fn, img)], meta)
        p.run()

        assert os.path.exists(archive_fn)
        with zipfile.ZipFile(archive_fn) as zf:
            names = set(zf.namelist())
        assert {"obj0.png", "obj1.png", "obj2.png", "ecotaxa_export.tsv"} <= names

        with Pipeline() as p2:
            et_obj = EcotaxaReader(archive_fn)
        objs = p2.run()
        assert len(objs) == 3
        o0 = objs[0][et_obj]
        assert o0.meta["object_id"] == "obj0"
        np.testing.assert_array_equal(o0.image.squeeze(), images[0])

    def test_writer_drops_invalid_columns(self, tmp_path):
        archive_fn = str(tmp_path / "a.zip")
        with Pipeline() as p:
            i = Unpack([1])
            meta = Call(lambda x: {"object_id": "a", "bogus_col": 1}, i)
            EcotaxaWriter(archive_fn, [], meta)
        p.run()
        with zipfile.ZipFile(archive_fn) as zf:
            tsv = zf.read("ecotaxa_export.tsv").decode()
        assert "bogus_col" not in tsv

    def test_writer_streams_rows_to_sidecar(self, tmp_path):
        """Rows are spilled to a crash-safe JSONL sidecar during the stream
        (bounded memory over a full haul) and folded into the TSV on close."""
        import json

        archive_fn = str(tmp_path / "big.zip")
        sidecar_fn = archive_fn + ".rows.jsonl"
        n = 10_000
        seen_mid_stream = {}

        def check_mid_stream(x):
            if x == n // 2:
                # Mid-stream: sidecar exists and already holds every row so far.
                with open(sidecar_fn) as f:
                    rows = [json.loads(line) for line in f]
                seen_mid_stream["n_rows"] = len(rows)
                seen_mid_stream["first"] = rows[0]
            return x

        with Pipeline() as p:
            i = Unpack(range(n))
            meta = Call(
                lambda x: {"object_id": f"o{x:05d}", "object_area": float(x)}, i
            )
            EcotaxaWriter(archive_fn, [], meta)
            Call(check_mid_stream, i)
        p.run()

        assert seen_mid_stream["n_rows"] >= n // 2 - 1
        assert seen_mid_stream["first"]["object_id"] == "o00000"
        # Clean close: sidecar folded into the archive TSV and removed.
        assert not os.path.exists(sidecar_fn)
        df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
        assert len(df) == n
        assert df["object_id"].iloc[-1] == f"o{n - 1:05d}"
        assert df["object_area"].iloc[-1] == float(n - 1)

    def test_writer_mixed_and_missing_columns(self, tmp_path):
        """Union of columns across rows; missing values blank; numeric
        columns typed [f], mixed ones [t] (parity with the pandas-based
        golden behavior)."""
        archive_fn = str(tmp_path / "mixed.zip")
        rows = [
            {"object_id": "a", "object_area": 1.5},
            {"object_id": "b", "object_extra": "x"},
            {"object_id": "c", "object_area": 2.0, "object_extra": "y"},
        ]
        with Pipeline() as p:
            i = Unpack(range(3))
            meta = Call(lambda x: rows[x], i)
            EcotaxaWriter(archive_fn, [], meta)
        p.run()
        with zipfile.ZipFile(archive_fn) as zf:
            tsv = zf.read("ecotaxa_export.tsv").decode().splitlines()
        header = tsv[0].split("\t")
        types = dict(zip(header, tsv[1].split("\t")))
        assert types["object_id"] == "[t]"
        assert types["object_area"] == "[f]"
        assert types["object_extra"] == "[t]"
        df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
        assert df["object_id"].tolist() == ["a", "b", "c"]
        assert np.isnan(df["object_area"].iloc[1])

    def test_meta_only_archive(self, tmp_path):
        archive_fn = str(tmp_path / "meta.zip")
        with Pipeline() as p:
            i = Unpack([0, 1])
            meta = Call(lambda x: {"object_id": f"o{x}"}, i)
            EcotaxaWriter(archive_fn, [], meta)
        p.run()
        df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
        assert df["object_id"].tolist() == ["o0", "o1"]


class TestHDF5:
    def test_append_mode(self, tmp_path, rng):
        import h5py

        fn = str(tmp_path / "feat.h5")
        feats = [rng.random(8).astype(np.float32) for _ in range(4)]

        with Pipeline() as p:
            i = Unpack([0, 1, 2, 3])
            v = Call(lambda x: feats[x], i)
            oid = Call(lambda x: f"obj{x}", i)
            HDF5Writer(fn, [("object_id", oid), ("predictions", v)], dataset_mode="append")
        p.run()

        with h5py.File(fn) as h5:
            assert h5["predictions"].shape == (4, 8)
            np.testing.assert_allclose(h5["predictions"][2], feats[2])
            assert h5["object_id"][1].decode() == "obj1"

    def test_create_mode(self, tmp_path, rng):
        import h5py

        fn = str(tmp_path / "preds.h5")
        with Pipeline() as p:
            i = Unpack([0, 1])
            v = Call(lambda x: np.full((4, 4), x, np.float32), i)
            oid = Call(lambda x: f"obj{x}", i)
            HDF5Writer(fn, [(oid, v)], dataset_mode="create")
        p.run()

        with h5py.File(fn) as h5:
            assert set(h5.keys()) == {"obj0", "obj1"}
            np.testing.assert_allclose(h5["obj1"][()], 1.0)

    def test_create_direct_chunk_roundtrip(self, tmp_path, rng):
        """The libdeflate direct-chunk fast path must produce a standard
        gzip+shuffle HDF5 file that plain h5py reads back bit-identically
        (and must quietly fall back when libdeflate is unavailable)."""
        import h5py

        from maze_image_processing_pipeline_tpu import native

        arrs = [
            rng.random((37, 21, 2)).astype(np.float16),
            (rng.random((5, 9)) * 255).astype(np.uint8),
            np.arange(11, dtype=np.int64),
        ]

        def write(fn):
            with Pipeline() as p:
                i = Unpack([0, 1, 2])
                v = Call(lambda x: arrs[x], i)
                oid = Call(lambda x: f"obj{x}", i)
                HDF5Writer(
                    fn, [(oid, v)], dataset_mode="create",
                    compression="gzip", compression_opts=1,
                )
            p.run()

        fn = str(tmp_path / "direct.h5")
        write(fn)
        with h5py.File(fn) as h5:
            for i, a in enumerate(arrs):
                got = h5[f"obj{i}"]
                assert got.compression == "gzip"
                assert got.shuffle
                assert got.dtype == a.dtype
                np.testing.assert_array_equal(got[()], a)

        # Fallback path (no libdeflate) writes the same logical content.
        fn2 = str(tmp_path / "fallback.h5")
        orig = native.zlib_compress
        native.zlib_compress = lambda *a, **k: None
        try:
            write(fn2)
        finally:
            native.zlib_compress = orig
        with h5py.File(fn2) as h5:
            for i, a in enumerate(arrs):
                np.testing.assert_array_equal(h5[f"obj{i}"][()], a)


    def test_adaptive_store_for_incompressible_streams(self, tmp_path, rng):
        """Noisy payloads (DEFLATE ratio ~1) switch to stored DEFLATE
        blocks after the ratio EMA settles — still standard gzip-filtered
        HDF5 that h5py inflates bit-identically — and re-probe the
        configured level every 32 chunks. Compressible streams must keep
        compressing (file size stays small)."""
        import h5py

        def write(fn, arrs, **kw):
            writers = []

            def capture(node):
                writers.append(node)
                return node

            with Pipeline() as p:
                i = Unpack(list(range(len(arrs))))
                v = Call(lambda x: arrs[x], i)
                oid = Call(lambda x: f"obj{x}", i)
                w = HDF5Writer(
                    fn, [(oid, v)], dataset_mode="create",
                    compression="gzip", compression_opts=1, **kw,
                )
            p.run()
            return w

        # 40 random-byte chunks — truly incompressible (uniform f16 maps
        # shuffle to ~0.85: the exponent plane compresses; real haul
        # canvases measure ~0.45 and never trip the stored path).
        noisy = [
            rng.integers(0, 256, (64, 64, 2), dtype=np.uint8)
            for _ in range(40)
        ]
        fn = str(tmp_path / "noisy.h5")
        node = write(fn, noisy)
        # ratio EMA must have tripped the stored path for most chunks
        assert node._ratio_ema is not None and node._ratio_ema > 0.92
        assert node._stored_since_probe > 0
        with h5py.File(fn) as h5:
            for i, a in enumerate(noisy):
                got = h5[f"obj{i}"]
                assert got.compression == "gzip"
                np.testing.assert_array_equal(got[()], a)

        # Compressible stream: adaptive must NOT store (size stays small).
        smooth = [np.zeros((64, 64, 2), np.float16) for _ in range(10)]
        fn_s = str(tmp_path / "smooth.h5")
        node = write(fn_s, smooth)
        assert node._ratio_ema is not None and node._ratio_ema < 0.5
        assert os.path.getsize(fn_s) < 10 * 64 * 64 * 2 * 2 / 4  # zeros compress

        # adaptive_store=False always compresses at the configured level.
        fn_off = str(tmp_path / "off.h5")
        node = write(fn_off, noisy[:5], adaptive_store=False)
        assert node._stored_since_probe == 0
        with h5py.File(fn_off) as h5:
            np.testing.assert_array_equal(h5["obj0"][()], noisy[0])


class TestLokiReaders:
    def test_sample_tree(self, tmp_path):
        sample = make_loki_sample(str(tmp_path))

        roots = list(find_data_roots(str(tmp_path)))
        assert len(roots) == 1
        root = roots[0]

        (log_fn,) = (root / "Log").glob("LOKI*.log")
        meta = read_log(log_fn, remap_fields=LOG_FIELDS_TO_ECOTAXA)
        assert meta["sample_station"] == "PS122-1"
        assert meta["sample_vessel"] == "Polarstern"
        assert meta["sample_latitude"] == 84.95
        assert meta["acq_instrument"] == "LOKI"

        tmds = (root / "Telemetrie").glob("*.tmd")
        assert len(tmds) == 4
        t0 = read_tmd(tmds[0])
        assert t0["PRESS"] == 10.5

        pics = (root / "Pictures").glob("*/*.*")
        assert len(pics) == 12

    def test_find_data_roots_ignore(self, tmp_path):
        make_loki_sample(str(tmp_path), name="LOKI_A")
        make_loki_sample(str(tmp_path), name="LOKI_B")
        roots = list(find_data_roots(str(tmp_path), ignore_patterns=["*LOKI_B*"]))
        assert len(roots) == 1


class TestTelemetry:
    def test_nearest_join(self, tmp_path):
        sample = make_loki_sample(str(tmp_path))
        tele = Telemetry(sample)
        meta = {"object_date": "20220103", "object_time": "120104"}  # 2s after 1st
        merged = tele.merge_telemetry(meta)
        assert merged["object_pressure"] == 10.5
        assert merged["object_lon"] == 134.70

    def test_tolerance_miss(self, tmp_path):
        sample = make_loki_sample(str(tmp_path))
        tele = Telemetry(sample, tolerance="1s")
        meta = {"object_date": "20220103", "object_time": "235959"}
        merged = tele.merge_telemetry(meta)
        assert "object_pressure" not in merged

    def test_nearest_matches_pandas(self, tmp_path):
        """The searchsorted fast path must reproduce pandas
        ``get_indexer(method="nearest", tolerance=...)`` exactly,
        including midpoint ties and out-of-range probes."""
        import datetime

        import pandas as pd

        sample = make_loki_sample(str(tmp_path))
        for tol in (None, "1s", "3s", "1h"):
            tele = Telemetry(sample, tolerance=tol)
            base = datetime.datetime(2022, 1, 3, 12, 1, 2)
            probes = [
                base + datetime.timedelta(seconds=s, milliseconds=ms)
                for s in (-90, -4, -2, -1, 0, 1, 2, 3, 5, 7, 11, 600)
                for ms in (0, 1, 500, 999)
            ]
            for dt in probes:
                (idx,) = tele.telemetry.index.get_indexer(
                    [dt], method="nearest", tolerance=tele.tolerance
                )
                expected = (
                    None if idx == -1 else tele.telemetry.iloc[idx].to_dict()
                )
                assert tele._nearest_row(dt) == expected, (tol, dt)


class TestRound3Fixes:
    def test_writer_bool_meta_is_numeric(self, tmp_path):
        """Booleans type as [f] so the cells must be 0/1, not
        'True'/'False' — EcoTaxa's float parse would reject the whole
        archive import (round-3 hunt)."""
        archive_fn = str(tmp_path / "b.zip")
        with Pipeline() as p:
            i = Unpack([0, 1])
            meta = Call(
                lambda k: {"object_id": f"o{k}", "object_flag": bool(k)}, i
            )
            EcotaxaWriter(archive_fn, [], meta)
        p.run()

        with zipfile.ZipFile(archive_fn) as zf:
            lines = zf.read("ecotaxa_export.tsv").decode().splitlines()
        header, types, *rows = lines
        col = header.split("\t").index("object_flag")
        assert types.split("\t")[col] == "[f]"
        assert [r.split("\t")[col] for r in rows] == ["0", "1"]

        df = read_tsv(Archive(archive_fn) / "ecotaxa_export.tsv")
        assert df["object_flag"].tolist() == [0, 1]

    def test_read_dat_single_pair_trailing_semicolon(self, tmp_path):
        """'TEMP=5.3;' (one ';'-terminated pair per line) must parse the
        float, not keep the ';' in a string value (round-3 hunt)."""
        from maze_image_processing_pipeline_tpu.dataio.loki import read_dat

        fn = tmp_path / "t.dat"
        fn.write_text("TEMP=5.3;\nPRESS=10.5;\nFLAG=ok;\n")
        data = read_dat(str(fn))
        assert data["TEMP"] == 5.3
        assert data["PRESS"] == 10.5
        assert data["FLAG"] == "ok"
