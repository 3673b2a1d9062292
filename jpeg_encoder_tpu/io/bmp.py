"""BMP (Windows bitmap) reading and writing, host-side.

Same wire assumptions as the reference reader (bmp_image.rs): pixel-data
offset at byte 10, signed width/height at 18/22, 24-bit BGR pixels stored
bottom-to-top with rows padded to 4-byte multiples. Unlike the reference
(which issues one 3-byte read() syscall per pixel), ingest here is a single
buffer read + one vectorized numpy reshape — this is host code feeding the
device, so it must not be the bottleneck.

The writer exists for fixtures, benchmarks, and round-trip tests (the
reference ships no sample images).
"""

from __future__ import annotations

import os
import struct

import numpy as np

_DATA_OFFSET_POS = 10
_WIDTH_POS = 18
_HEIGHT_POS = 22
_BPP_POS = 28


def decode(buf: bytes | np.ndarray) -> np.ndarray:
    """BMP file bytes -> (H, W, 3) uint8 RGB, top-to-bottom rows."""
    raw = np.frombuffer(memoryview(buf), dtype=np.uint8)
    if raw.size < 54 or bytes(raw[:2]) != b"BM":
        raise ValueError("not a BMP file (missing 'BM' magic)")
    data_offset = int.from_bytes(raw[_DATA_OFFSET_POS:_DATA_OFFSET_POS + 4], "little")
    width = int.from_bytes(raw[_WIDTH_POS:_WIDTH_POS + 4], "little", signed=True)
    height = int.from_bytes(raw[_HEIGHT_POS:_HEIGHT_POS + 4], "little", signed=True)
    bpp = int.from_bytes(raw[_BPP_POS:_BPP_POS + 2], "little")
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP is supported, got {bpp}-bit")
    if width <= 0 or height <= 0:
        raise ValueError(f"unsupported BMP dimensions {width}x{height}")

    row_stride = (width * 3 + 3) // 4 * 4
    need = data_offset + row_stride * height
    if raw.size < need:
        raise ValueError("BMP file truncated")
    rows = raw[data_offset:need].reshape(height, row_stride)[:, : width * 3]
    bgr = rows.reshape(height, width, 3)
    rgb = bgr[::-1, :, ::-1]  # bottom-up storage, BGR channel order
    return np.ascontiguousarray(rgb)


def read(path: str | os.PathLike) -> np.ndarray:
    with open(path, "rb") as f:
        return decode(f.read())


def encode(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP file bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    height, width = rgb.shape[:2]
    row_stride = (width * 3 + 3) // 4 * 4
    data_size = row_stride * height
    file_size = 54 + data_size

    header = struct.pack(
        "<2sIHHI"  # BITMAPFILEHEADER
        "IiiHHIIiiII",  # BITMAPINFOHEADER
        b"BM", file_size, 0, 0, 54,
        40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0,
    )
    rows = np.zeros((height, row_stride), dtype=np.uint8)
    rows[:, : width * 3] = rgb[::-1, :, ::-1].reshape(height, width * 3)
    return header + rows.tobytes()


def write(path: str | os.PathLike, rgb: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(encode(rgb))
