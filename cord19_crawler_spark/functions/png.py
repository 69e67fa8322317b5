"""Minimal pure-Python PNG codec (PNG spec, ISO 15948): DEFLATE via zlib +
the five scanline filters. Covers the common subset — 8-bit depth, color
types 0 (grayscale), 2 (RGB), 6 (RGBA), non-interlaced — which is enough to
make the multimodal decode kernels REAL in codec-less containers; when PIL
is importable the operators prefer it (more formats, C speed).

Scanline unfiltering (Sub/Up/Average/Paeth) is inherently sequential per
byte, so this decoder is pure-Python-loop speed — fine for fixtures and the
fallback path; the production kernel is PIL/cv2 behind the same interface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes, max_pixel_bytes: int = 1 << 28) -> np.ndarray:
    """PNG bytes → uint8 array of shape (h, w) for grayscale or
    (h, w, channels) for RGB/RGBA. Raises PngError on malformed or
    unsupported input (record-level fail-loud; callers catch per row).

    Decompression-bomb safe: the declared IHDR dimensions are capped at
    ``max_pixel_bytes`` BEFORE any allocation, and the IDAT inflate is
    bounded to the declared pixel size — a tiny crafted record raises
    PngError instead of OOMing the executor (the per-row error contract
    decode_mode='real' promises)."""
    if data[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise PngError("truncated chunk")
        pos += 12 + length  # length + type + data + crc (crc not enforced)
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None or channels is None:
        raise PngError("missing IHDR")
    stride = width * channels
    expected = height * (stride + 1)
    if expected > max_pixel_bytes:
        raise PngError(
            f"declared dimensions {width}x{height}x{channels} exceed "
            f"max_pixel_bytes={max_pixel_bytes}"
        )
    # bounded inflate: never materialize more than the declared pixel size
    # (+1 so over-long streams are detected), whatever the IDAT expands to
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) > expected:
        raise PngError("pixel data exceeds declared dimensions")
    if len(raw) < expected:
        raise PngError("truncated pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    bpp = channels
    off = 0
    for y in range(height):
        f = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise PngError(f"bad filter byte {f}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out.reshape(height, width) if channels == 1 else out.reshape(
        height, width, channels
    )


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes (filter 0)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        channels = a.shape[2]
        color = 2 if channels == 3 else 6
        h, w = a.shape[:2]
    else:
        raise PngError(f"unsupported array shape {a.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = a.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (the classic index-map form)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def grayscale(arr: np.ndarray) -> np.ndarray:
    """Luma approximation (ITU-R BT.601 integer weights)."""
    if arr.ndim == 2:
        return arr
    rgb = arr[..., :3].astype(np.uint32)
    return ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000).astype(
        np.uint8
    )
