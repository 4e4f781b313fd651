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


class TestMalformedInputCorpus:
    """Adversarial inputs for the native decoders (round-3 verdict item 6).

    Both decoders parse untrusted bytes in C++ on the hottest host loop of
    both pipelines; a segfault here would kill a whole haul where the
    reference's Python decoding raises and is absorbed per-image by
    MergeNodesPipeline (/root/reference/maze_ipp/loki/pipeline.py:914-921).
    Every case must return None (clean cv2 fallback) or a well-formed
    array — never crash, never allocate from a lying header."""

    @staticmethod
    def _png_chunk(t, d):
        import struct
        import zlib

        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    @classmethod
    def _valid_png(cls, h=8, w=8):
        import struct
        import zlib

        img = (np.arange(h * w, dtype=np.uint32) % 251).astype(np.uint8).reshape(h, w)
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
        return img, (
            b"\x89PNG\r\n\x1a\n"
            + cls._png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + cls._png_chunk(b"IDAT", zlib.compress(raw))
            + cls._png_chunk(b"IEND", b"")
        )

    def test_png_truncation_sweep(self, lib):
        img, data = self._valid_png()
        idat_end = len(data) - 12  # the trailing IEND chunk
        for cut in range(0, len(data), 3):
            got = native.png_decode(data[:cut])
            if cut < idat_end:
                assert got is None, f"truncated to {cut} bytes decoded"
            elif got is not None:
                # Only the IEND trailer is missing: the complete pixel
                # data may legitimately still decode — but then exactly.
                np.testing.assert_array_equal(got, img)
        np.testing.assert_array_equal(native.png_decode(data), img)

    def test_png_truncated_idat_payload(self, lib):
        import struct
        import zlib

        img, _ = self._valid_png()
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(8))
        comp = zlib.compress(raw)
        for cut in (1, len(comp) // 2, len(comp) - 1):
            data = (
                b"\x89PNG\r\n\x1a\n"
                + self._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
                + self._png_chunk(b"IDAT", comp[:cut])
                + self._png_chunk(b"IEND", b"")
            )
            assert native.png_decode(data) is None

    def test_png_lying_ihdr_dimensions(self, lib):
        import struct
        import zlib

        img, _ = self._valid_png()
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(8))
        idat = self._png_chunk(b"IDAT", zlib.compress(raw))
        iend = self._png_chunk(b"IEND", b"")
        sig = b"\x89PNG\r\n\x1a\n"
        # Claims 64x64 but carries 8x8 of data: inflate-size mismatch.
        big = self._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 64, 64, 8, 0, 0, 0, 0))
        assert native.png_decode(sig + big + idat + iend) is None
        # Claims fewer rows than the payload carries: also a mismatch.
        small = self._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 4, 8, 0, 0, 0, 0))
        assert native.png_decode(sig + small + idat + iend) is None

    def test_png_oversized_dimensions_rejected_cheaply(self, lib):
        """A 16M x 16M IHDR must be rejected at probe time (total-pixel
        cap) — not after the caller allocates petabytes for the output."""
        import struct

        ihdr = self._png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 1 << 24, 1 << 24, 8, 0, 0, 0, 0)
        )
        data = b"\x89PNG\r\n\x1a\n" + ihdr + self._png_chunk(b"IEND", b"")
        assert native.png_channels(data) is None
        assert native.png_decode(data) is None

    def test_png_bad_filter_byte(self, lib):
        import struct
        import zlib

        img, _ = self._valid_png()
        raw = b"".join(b"\x07" + img[y].tobytes() for y in range(8))  # filter 7
        data = (
            b"\x89PNG\r\n\x1a\n"
            + self._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
            + self._png_chunk(b"IDAT", zlib.compress(raw))
            + self._png_chunk(b"IEND", b"")
        )
        assert native.png_decode(data) is None

    def test_png_chunk_length_overflow(self, lib):
        """A chunk header declaring 4 GiB must not walk past the buffer."""
        import struct

        _, data = self._valid_png()
        evil = data[:8] + struct.pack(">I", 0xFFFFFFFF) + data[12:]
        assert native.png_decode(evil) is None
        # Same lie on the IDAT chunk (after a valid IHDR).
        ihdr_end = 8 + 12 + 13
        evil2 = (
            data[:ihdr_end] + struct.pack(">I", 0xFFFFFFF0) + data[ihdr_end + 4 :]
        )
        assert native.png_decode(evil2) is None

    def test_png_garbage_idat(self, lib):
        import struct

        data = (
            b"\x89PNG\r\n\x1a\n"
            + self._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
            + self._png_chunk(b"IDAT", b"\xde\xad\xbe\xef" * 8)
            + self._png_chunk(b"IEND", b"")
        )
        assert native.png_decode(data) is None

    def test_png_mutation_fuzz(self, lib):
        """300 seeded random byte corruptions: every outcome is None or a
        well-formed (probed-shape) array; the process must survive all."""
        img, data = self._valid_png(16, 24)
        rng = np.random.default_rng(1234)
        buf = bytearray(data)
        for _ in range(300):
            i = int(rng.integers(8, len(buf)))  # keep the signature
            old = buf[i]
            buf[i] = int(rng.integers(0, 256))
            got = native.png_decode(bytes(buf))
            if got is not None:
                assert got.dtype == np.uint8 and got.shape[0] <= 1 << 13
            buf[i] = old

    def test_bmp_truncation_sweep(self, lib, rng):
        img = (rng.random((9, 13)) * 255).astype(np.uint8)
        data = native.bmp8_encode(img)
        for cut in range(0, len(data), 7):
            got = native.bmp_decode(data[:cut])
            assert got is None or cut == len(data)
        np.testing.assert_array_equal(native.bmp_decode(data), img)

    def test_bmp_lying_offset_and_dib(self, lib, rng):
        import struct

        img = (rng.random((9, 13)) * 255).astype(np.uint8)
        data = bytearray(native.bmp8_encode(img))
        # Pixel offset beyond the file.
        evil = bytearray(data)
        evil[10:14] = struct.pack("<I", len(data) + 1000)
        assert native.bmp_decode(bytes(evil)) is None
        # Adversarial 4-billion DIB header size: the palette pointer must
        # not be formed out of bounds (decode may proceed palette-less).
        evil = bytearray(data)
        evil[14:18] = struct.pack("<I", 0xFFFFFF00)
        native.bmp_decode(bytes(evil))  # must simply not crash

    def test_bmp_oversized_dimensions_rejected(self, lib, rng):
        import struct

        img = (rng.random((4, 4)) * 255).astype(np.uint8)
        data = bytearray(native.bmp8_encode(img))
        data[18:22] = struct.pack("<i", 1 << 20)
        data[22:26] = struct.pack("<i", 1 << 20)
        assert native.bmp_decode(bytes(data)) is None

    def test_bmp_mutation_fuzz(self, lib, rng):
        img = (rng.random((12, 17)) * 255).astype(np.uint8)
        data = native.bmp8_encode(img)
        buf = bytearray(data)
        mrng = np.random.default_rng(4321)
        for _ in range(300):
            i = int(mrng.integers(2, len(buf)))  # keep the BM magic
            old = buf[i]
            buf[i] = int(mrng.integers(0, 256))
            got = native.bmp_decode(bytes(buf))
            if got is not None:
                assert got.dtype == np.uint8
            buf[i] = old
