"""Image decode/encode (host, native-accelerated via OpenCV with PIL fallback).

Replaces ``morphocut.image.ImageReader`` (``loki/pipeline.py:921``). Decode
runs on host behind stream buffers so it overlaps with TPU compute.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from ..engine.core import Node, Output, RawOrVariable, ReturnOutputs
from .archive import ArchivePath

__all__ = ["decode_image", "encode_image", "ImageReader"]


def decode_image(data: bytes, mode: Optional[str] = None) -> np.ndarray:
    """Decode an encoded image buffer to a numpy array.

    OpenCV decodes when available; BMP buffers (LOKI's native crop format)
    fall back to the in-repo native codec (:mod:`..native`) otherwise —
    measured: cv2 wins at vignette sizes (ctypes call overhead), so it
    stays primary.

    Args:
        data: encoded bytes (PNG/JPEG/BMP/...).
        mode: "L" grayscale, "RGB", or None (native channels).
    """
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        # Native PNG decode (libdeflate inflate + unfilter): measured
        # 2-3x cv2.imdecode on vignette-size crops — both the LOKI input
        # builder and the predict EcotaxaReader decode PNGs on their
        # hottest host loop. Unsupported variants (16-bit, palette,
        # interlaced) return None and fall through.
        from .. import native

        # Header-only probe first: grayscale-from-color needs cv2's exact
        # BT.601 weights, so don't pay a full native decode just to
        # discard it.
        ch = native.png_channels(data)
        if ch is not None and not (mode == "L" and ch == 3):
            img = native.png_decode(data)
            if img is not None:
                if mode == "RGB" and img.ndim == 2:
                    img = np.stack([img] * 3, axis=-1)
                return img

    if not _HAS_CV2 and data[:2] == b"BM":
        from .. import native

        img = native.bmp_decode(data)
        if img is not None:
            if mode == "L" and img.ndim == 3:
                img = img.mean(axis=-1).astype(np.uint8)
            elif mode == "RGB" and img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            return img

    if _HAS_CV2:
        buf = np.frombuffer(data, np.uint8)
        if mode == "L":
            img = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
        else:
            img = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
            if img is not None and img.ndim == 3:
                if img.shape[2] == 3:
                    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                elif img.shape[2] == 4:
                    img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
            if mode == "RGB" and img is not None and img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
        if img is None:
            raise ValueError("Could not decode image buffer")
        return img

    import io

    from PIL import Image  # pragma: no cover

    img = Image.open(io.BytesIO(data))  # pragma: no cover
    if mode:  # pragma: no cover
        img = img.convert(mode)
    return np.asarray(img)  # pragma: no cover


def encode_image(image: np.ndarray, filename: str, quality: int = 90) -> bytes:
    """Encode a numpy image by the extension of ``filename``."""
    ext = os.path.splitext(filename)[1].lower() or ".png"
    image = np.asarray(image)
    if image.dtype == bool:
        image = image.astype(np.uint8) * 255
    elif image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)

    if not _HAS_CV2 and ext == ".bmp" and image.ndim == 2:
        from .. import native

        data = native.bmp8_encode(image)
        if data is not None:
            return data

    if ext == ".png":
        # Vignette-export hot path: the native single-pass encoder (zlib,
        # 'Up' filter) measures ~1.4x cv2's at comparable size.
        from .. import native

        data = native.png_encode(image)
        if data is not None:
            return data

    if _HAS_CV2:
        bgr = image
        if image.ndim == 3 and image.shape[2] == 3:
            bgr = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
        params = []
        if ext in (".jpg", ".jpeg"):
            params = [cv2.IMWRITE_JPEG_QUALITY, quality]
        elif ext == ".png":
            params = [cv2.IMWRITE_PNG_COMPRESSION, 1]
        ok, buf = cv2.imencode(ext, bgr, params)
        if not ok:
            raise ValueError(f"Could not encode image as {ext}")
        return buf.tobytes()

    import io

    from PIL import Image  # pragma: no cover

    pil = Image.fromarray(image)  # pragma: no cover
    out = io.BytesIO()  # pragma: no cover
    pil.save(out, format=ext.lstrip(".").upper().replace("JPG", "JPEG"))  # pragma: no cover
    return out.getvalue()  # pragma: no cover


@ReturnOutputs
@Output("image")
class ImageReader(Node):
    """Read an image file (filesystem path or ArchivePath) as numpy array."""

    def __init__(self, path: RawOrVariable, mode: Optional[str] = "L") -> None:
        self.path = path
        self.mode = mode
        super().__init__()

    def transform(self, path: Union[str, ArchivePath]):
        if isinstance(path, ArchivePath):
            data = path.read_bytes()
        else:
            with open(path, "rb") as f:
                data = f.read()
        return decode_image(data, mode=self.mode)

    def _input_names(self):
        return ("path",)
