import numpy as np
import pytest

from maze_image_processing_pipeline_tpu.common import (
    FormatParser,
    convert_img_dtype,
    natsorted,
    recursive_update,
)


def test_convert_img_dtype_uint8():
    img = np.array([0, 127, 255], dtype=np.uint8)
    out = convert_img_dtype(img, np.dtype("float32"))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, [0, 127 / 255, 1.0])


def test_convert_img_dtype_float_passthrough():
    img = np.array([0.5], dtype=np.float64)
    out = convert_img_dtype(img, np.dtype("float32"))
    assert out.dtype == np.float32


def test_convert_img_dtype_rejects_int_target():
    with pytest.raises(ValueError):
        convert_img_dtype(np.zeros(3, np.uint8), np.dtype("int32"))


def test_recursive_update():
    left = {"a": {"x": 1, "y": 2}, "b": 3}
    right = {"a": {"y": 20, "z": 30}, "c": 4}
    out = recursive_update(left, right)
    assert out == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}


def test_natsorted():
    assert natsorted(["s10", "s2", "s1"]) == ["s1", "s2", "s10"]
    assert natsorted(["B", "a"]) == ["a", "B"]


OBJECT_ID_FMT = "{object_date} {object_time}  {object_milliseconds}  {object_sequence:06d} {object_posx:04d} {object_posy:04d}"


def test_format_parser_object_id():
    p = FormatParser(OBJECT_ID_FMT)
    r = p.parse("20220103 120102  333  000042 0100 0200")
    assert r is not None
    assert r.named["object_date"] == "20220103"
    assert r.named["object_time"] == "120102"
    assert r.named["object_milliseconds"] == "333"
    assert r.named["object_sequence"] == 42
    assert r.named["object_posx"] == 100
    assert r.named["object_posy"] == 200


def test_format_parser_no_match():
    p = FormatParser(OBJECT_ID_FMT)
    assert p.parse("garbage") is None


def test_format_parser_search_positional():
    p = FormatParser("{:04d}{:02d}{:02d} {:02d}{:02d}{:02d}")
    r = p.search("prefix 20220103 045959.tmd")
    assert r is not None
    assert list(r) == [2022, 1, 3, 4, 59, 59]
