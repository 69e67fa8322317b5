"""Real image decode: the pure-Python PNG codec (functions/png.py) and the
multimodal operators' decode_mode='real' path over actual PNG pixels.

The codec makes 'real' testable without PIL; when PIL IS importable the
operators prefer it behind the same interface (these tests remain valid —
they only assert pixel-level outcomes)."""

import struct
import zlib

import numpy as np
import pytest

from cord19_crawler_spark.functions.png import (
    PngError,
    decode_png,
    encode_png,
    grayscale,
    resize_nearest,
)
from cord19_crawler_spark.operators import multimodal


def _rng(seed=7):
    return np.random.default_rng(seed)


def test_png_roundtrip_gray_rgb_rgba():
    for shape in [(5, 9), (6, 4, 3), (3, 7, 4)]:
        img = _rng().integers(0, 256, size=shape, dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape
        assert np.array_equal(back, img)


def _encode_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-assemble a PNG using a chosen filter per scanline (the encoder
    itself always writes filter 0) — exercises the Sub/Up/Average/Paeth
    unfilter paths against spec-computed filtered bytes."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(stride):
            left = int(line[i - ch]) if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            x = int(line[i])
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - ((left + up) >> 1)
            else:
                v = x - paeth(left, up, ul)
            raw.append(v & 0xFF)
        prev = line

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_all_filter_types_decode():
    img = _rng(3).integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    data = _encode_with_filters(img, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), img)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    img = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[24] = 16  # IHDR bit depth byte → 16-bit (unsupported subset)
    with pytest.raises(PngError):
        decode_png(bytes(data))


def test_resize_nearest_and_grayscale():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], img)  # every source pixel preserved
    g = grayscale(np.full((2, 2, 3), [255, 0, 0], dtype=np.uint8))
    assert g.shape == (2, 2) and int(g[0, 0]) == 76  # 0.299 * 255


def _media_df(spark, imgs: dict[str, np.ndarray]):
    rows = [
        ("d" + ref, ref, "image", encode_png(img),
         {"mime": "image/png", "width": img.shape[1], "height": img.shape[0],
          "duration_ms": None})
        for ref, img in imgs.items()
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_real_decode_featurize_on_actual_pixels(spark):
    """decode_mode='real' end-to-end: a black image puts all histogram mass
    in bin 0, a white image in the last bin; a corrupt row degrades to an
    error status without failing the task."""
    imgs = {
        "black": np.zeros((8, 8, 3), dtype=np.uint8),
        "white": np.full((8, 8, 3), 255, dtype=np.uint8),
        "half": np.vstack([np.zeros((4, 8), dtype=np.uint8),
                           np.full((4, 8), 255, dtype=np.uint8)]),
    }
    media = _media_df(spark, imgs)
    corrupt = spark.createDataFrame(
        [("dX", "corrupt", "image", b"\x89PNG\r\n\x1a\nGARBAGE",
          {"mime": "image/png", "width": 1, "height": 1, "duration_ms": None})],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r["media_ref"]: r for r in multimodal.decode_and_featurize(
        media.unionByName(corrupt), dim=4, decode_mode="real").collect()}
    assert out["black"]["decode_status"] == "ok"
    assert out["black"]["feature"] == [1.0, 0.0, 0.0, 0.0]
    assert out["white"]["feature"] == [0.0, 0.0, 0.0, 1.0]
    assert out["half"]["feature"] == [0.5, 0.0, 0.0, 0.5]
    assert out["corrupt"]["decode_status"].startswith("error:")
    assert out["corrupt"]["feature"] is None


def test_real_resize_roundtrips_pixels(spark):
    """decode_mode='real' resize: output payload is a valid PNG whose pixels
    equal nearest-neighbor of the input; meta dims + mime updated."""
    img = _rng(11).integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    media = _media_df(spark, {"a": img})
    out = multimodal.resize_images(media, 6, 8, decode_mode="real").collect()[0]
    assert out["meta"]["width"] == 6 and out["meta"]["height"] == 8
    assert out["meta"]["mime"] == "image/png"
    got = decode_png(bytes(out["content"]))
    assert np.array_equal(got, resize_nearest(img, 6, 8))
    # composes: resized media → real featurize, still 'ok'
    feats = multimodal.decode_and_featurize(
        multimodal.resize_images(media, 6, 8, decode_mode="real"),
        dim=8, decode_mode="real",
    ).collect()
    assert feats[0]["decode_status"] == "ok" and len(feats[0]["feature"]) == 8


def test_png_decompression_bomb_rejected():
    """A tiny crafted PNG whose IDAT inflates enormously (or whose IHDR
    declares absurd dimensions) raises PngError BEFORE any large
    allocation — per-row containment, not an executor OOM."""
    # absurd declared dimensions: rejected before touching the IDAT
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1000)) + chunk(b"IEND", b""))
    with pytest.raises(PngError, match="max_pixel_bytes"):
        decode_png(bomb)
    # plausible dims but an over-long inflate stream: bounded + rejected
    ihdr2 = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    overlong = zlib.compress(b"\x00" * (4 * 5 + 10_000))
    bomb2 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr2)
             + chunk(b"IDAT", overlong) + chunk(b"IEND", b""))
    with pytest.raises(PngError, match="exceeds declared"):
        decode_png(bomb2)


def test_lsh_bucket_plan_full_recall_clamps():
    from cord19_crawler_spark.operators.dedup import lsh_bucket_plan

    b, tables = lsh_bucket_plan(1_000_000, target_recall=1.0, max_tables=32)
    assert b >= 1 and tables == 32  # capped, not math-domain-error


def test_sniff_media_metadata_formats(spark):
    """Header-only dimension sniffing: real PNG bytes (via the built-in
    codec), hand-built GIF/BMP/JPEG headers, and garbage — per-row results,
    no task failure, no decode library."""
    import numpy as np
    from pyspark.sql import Row

    from cord19_crawler_spark.functions.png import encode_png
    from cord19_crawler_spark.operators.multimodal import (
        _sniff_one,
        sniff_media_metadata,
    )

    png = encode_png(np.zeros((5, 9), dtype=np.uint8))  # h=5, w=9
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\0" * 6
    bmp = (
        b"BM" + b"\0" * 16
        + (640).to_bytes(4, "little")
        + (-480).to_bytes(4, "little", signed=True)  # top-down BMP: negative h
        + b"\0" * 4
    )
    jpeg = (
        b"\xff\xd8"                       # SOI
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\0" + b"\0" * 9   # APP0
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"                  # SOF0
        + (768).to_bytes(2, "big") + (1024).to_bytes(2, "big") + b"\0" * 10
    )
    assert _sniff_one(png) == ("png", 9, 5)
    assert _sniff_one(gif) == ("gif", 320, 200)
    assert _sniff_one(bmp) == ("bmp", 640, 480)
    assert _sniff_one(jpeg) == ("jpeg", 1024, 768)
    assert _sniff_one(b"\x00garbage") == ("unknown", None, None)
    assert _sniff_one(None) == ("unknown", None, None)
    assert _sniff_one(b"\xff\xd8trunc") == ("jpeg", None, None)

    media = spark.createDataFrame(
        [
            Row(media_ref="m1", content=bytearray(png)),
            Row(media_ref="m2", content=bytearray(jpeg)),
            Row(media_ref="m3", content=bytearray(b"nope")),
        ]
    )
    got = {
        r["media_ref"]: (r["sniff_format"], r["sniff_width"], r["sniff_height"])
        for r in sniff_media_metadata(media).collect()
    }
    assert got == {
        "m1": ("png", 9, 5),
        "m2": ("jpeg", 1024, 768),
        "m3": ("unknown", None, None),
    }
