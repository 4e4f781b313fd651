import numpy as np
import pytest

from maze_image_processing_pipeline_tpu import native
from maze_image_processing_pipeline_tpu.dataio.imageio import decode_image, encode_image


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


class TestNativeBmp:
    def test_roundtrip(self, lib, rng):
        img = (rng.random((37, 53)) * 255).astype(np.uint8)  # odd width: padding
        data = native.bmp8_encode(img)
        assert data is not None and data[:2] == b"BM"
        back = native.bmp_decode(data)
        np.testing.assert_array_equal(back, img)

    def test_interop_with_cv2(self, lib, rng):
        # Our encoder's output must decode identically through OpenCV.
        import cv2

        img = (rng.random((20, 31)) * 255).astype(np.uint8)
        data = native.bmp8_encode(img)
        via_cv2 = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(via_cv2, img)

        # ... and cv2-encoded BMPs must decode through our decoder.
        ok, buf = cv2.imencode(".bmp", img)
        assert ok
        ours = native.bmp_decode(buf.tobytes())
        assert ours is not None
        if ours.ndim == 3:  # cv2 may write 24-bit
            ours = ours[..., 0]
        np.testing.assert_array_equal(ours, img)

    def test_garbage_rejected(self, lib):
        assert native.bmp_decode(b"BMgarbage") is None
        assert native.bmp_decode(b"\x89PNG\r\n") is None

    def test_imageio_integration(self, lib, rng):
        img = (rng.random((16, 24)) * 255).astype(np.uint8)
        data = encode_image(img, "x.bmp")
        assert data[:2] == b"BM"
        back = decode_image(data, mode="L")
        np.testing.assert_array_equal(back, img)


def test_native_png_encode_roundtrip(rng):
    import cv2

    from maze_image_processing_pipeline_tpu import native
    from maze_image_processing_pipeline_tpu.dataio.imageio import (
        decode_image,
        encode_image,
    )

    img = (rng.random((60, 90)) * 255).astype(np.uint8)
    data = native.png_encode(img)
    if data is None:
        pytest.skip("native library unavailable")
    dec = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(dec, img)

    rgb = np.stack([img, img // 2, 255 - img], axis=-1)
    dec3 = cv2.imdecode(
        np.frombuffer(native.png_encode(rgb), np.uint8), cv2.IMREAD_UNCHANGED
    )
    np.testing.assert_array_equal(cv2.cvtColor(dec3, cv2.COLOR_BGR2RGB), rgb)

    # The dataio encode path roundtrips through its own decoder too.
    np.testing.assert_array_equal(
        decode_image(encode_image(img, "x.png"), mode="L"), img
    )


class TestNativePNGDecode:
    def test_roundtrip_all_encoders(self, tmp_path):
        import cv2
        import numpy as np

        from maze_image_processing_pipeline_tpu import native

        rng = np.random.default_rng(3)
        img = (rng.random((37, 53)) * 255).astype(np.uint8)
        rgb = (rng.random((21, 33, 3)) * 255).astype(np.uint8)

        for arr, enc in [
            (img, cv2.imencode(".png", img)[1].tobytes()),
            (img, cv2.imencode(".png", img, [cv2.IMWRITE_PNG_COMPRESSION, 9])[1].tobytes()),
            (img, native.png_encode(img, 1)),
            (rgb, cv2.imencode(".png", cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))[1].tobytes()),
        ]:
            got = native.png_decode(enc)
            assert got is not None
            np.testing.assert_array_equal(got, arr)

    def test_unsupported_variants_fall_back(self):
        import cv2
        import numpy as np

        from maze_image_processing_pipeline_tpu import native

        img16 = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 900)
        b16 = cv2.imencode(".png", img16)[1].tobytes()
        assert native.png_decode(b16) is None
        assert native.png_decode(b"\x89PNG\r\n\x1a\njunk") is None
        assert native.png_decode(b"not a png") is None

    def test_decode_image_uses_native_path(self):
        import numpy as np

        from maze_image_processing_pipeline_tpu import native
        from maze_image_processing_pipeline_tpu.dataio.imageio import decode_image

        rng = np.random.default_rng(4)
        img = (rng.random((40, 60)) * 255).astype(np.uint8)
        data = native.png_encode(img, 1)
        np.testing.assert_array_equal(decode_image(data), img)
        np.testing.assert_array_equal(decode_image(data, mode="L"), img)
        rgb = decode_image(data, mode="RGB")
        assert rgb.shape == (40, 60, 3)
        np.testing.assert_array_equal(rgb[..., 0], img)

    def test_trns_transparency_falls_back(self):
        """PNGs carrying a tRNS chunk must NOT decode natively — cv2
        expands tRNS into an alpha channel this decoder would drop."""
        import struct
        import zlib

        import numpy as np

        from maze_image_processing_pipeline_tpu import native

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d))
            )

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
        ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        idat = chunk(b"IDAT", zlib.compress(raw))
        iend = chunk(b"IEND", b"")
        sig = b"\x89PNG\r\n\x1a\n"
        trns = chunk(b"tRNS", struct.pack(">H", 5))
        assert native.png_decode(sig + ihdr + trns + idat + iend) is None
        got = native.png_decode(sig + ihdr + idat + iend)
        np.testing.assert_array_equal(got, img)
