"""Pure-stdlib PNG codec + the real decode/resize kernels.

Layers:

* decoder vs a HAND-BUILT PNG byte string (struct+zlib composed inline
  here, independent of the module's encoder) with hand-computed
  Sub/Up/Average/Paeth unfilter results;
* encoder/decoder round-trip across every filter type and color type
  (gray, gray+alpha, RGB, RGBA, palette);
* malformed input -> PngError (bad CRC, truncation, interlace, depth);
* the Spark kernels: decode_images/resize_images run the REAL path for
  PNG payloads (ok_png), per-row decode_error for corrupt PNGs, and a
  per-row unsupported_format status for non-PNG formats.
"""

from __future__ import annotations

import hashlib
import random
import struct
import zlib

import numpy as np
import pytest

from cdx_writer_spark.functions import multimodal
from cdx_writer_spark.functions.png import (
    PNG_SIGNATURE,
    PngError,
    decode_png,
    encode_png,
    features_from_pixels,
    resize_nearest,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _manual_png(width, height, color_type, raw_scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(raw_scanlines))
            + _chunk(b"IEND", b""))


def test_decode_hand_built_filters():
    """3x3 grayscale, one row per filter, unfiltered values computed by
    hand (not by this repo's encoder)."""
    # row0 Sub:   stored [10, 5, 5]   -> [10, 15, 20]
    # row1 Up:    stored [1, 2, 3]    -> [11, 17, 23]
    # row2 Paeth: stored [4, 0, 0]    -> left/up/ul predictors:
    #   x0: a=0 b=11 c=0  -> p=11, pb=0 -> pred=11 -> 15
    #   x1: a=15 b=17 c=11 -> p=21, pa=6 pb=4 pc=10 -> pred=17 -> 17
    #   x2: a=17 b=23 c=17 -> p=23, pb=0 -> pred=23 -> 23
    raw = bytes([1, 10, 5, 5]) + bytes([2, 1, 2, 3]) + bytes([4, 4, 0, 0])
    w, h, ch, pix = decode_png(_manual_png(3, 3, 0, raw))
    assert (w, h, ch) == (3, 3, 1)
    assert list(pix) == [10, 15, 20, 11, 17, 23, 15, 17, 23]


def test_decode_average_filter_hand_built():
    # 2x2 RGB: row0 None, row1 Average with hand-computed predictors
    # row1 px0: pred = up//2 -> [50,60,70]//2 = [25,30,35]; stored
    # [5,6,7] -> [30,36,42]; px1: pred = (left+up)//2 =
    # ([30+80]//2,[36+90]//2,[42+100]//2) = [55,63,71]; stored [1,2,3]
    # -> [56,65,74]
    row0 = bytes([0, 50, 60, 70, 80, 90, 100])
    row1 = bytes([3, 5, 6, 7, 1, 2, 3])
    w, h, ch, pix = decode_png(_manual_png(2, 2, 2, row0 + row1))
    assert (w, h, ch) == (2, 2, 3)
    assert list(pix) == [50, 60, 70, 80, 90, 100, 30, 36, 42, 56, 65, 74]


def test_palette_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = bytes([0, 0, 1]) + bytes([0, 2, 2])  # 2x2 indices
    png = _manual_png(2, 2, 3, raw, extra=_chunk(b"PLTE", plte))
    w, h, ch, pix = decode_png(png)
    assert (w, h, ch) == (2, 2, 3)
    assert list(pix) == [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255]


@pytest.mark.parametrize("n_channels", [1, 2, 3, 4])
def test_round_trip_every_filter(n_channels):
    rng = random.Random(42 + n_channels)
    w, h = 13, 11
    pixels = bytes(rng.randrange(256) for _ in range(w * h * n_channels))
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        enc = encode_png(w, h, n_channels, pixels, filters=filters)
        got = decode_png(enc)
        assert got == (w, h, n_channels, pixels), f"filters={filters}"


def test_malformed_inputs_raise_png_error():
    good = encode_png(2, 2, 3, bytes(range(12)))
    # flip a byte inside IDAT -> CRC failure
    bad_crc = bytearray(good)
    bad_crc[len(good) - 20] ^= 0xFF
    with pytest.raises(PngError):
        decode_png(bytes(bad_crc))
    with pytest.raises(PngError):
        decode_png(good[:30])  # truncated
    with pytest.raises(PngError):
        decode_png(b"notapng" + good)
    # interlaced flag set (IHDR rebuilt, CRC valid)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    inter = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
             + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="interlaced"):
        decode_png(inter)
    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr16)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="bit depth"):
        decode_png(deep)


def test_resize_nearest_hand_computed():
    # 4x2 gray -> 2x1: picks columns 0,2 of row 0
    pix = bytes([1, 2, 3, 4, 5, 6, 7, 8])
    assert list(resize_nearest(pix, 4, 2, 1, 2, 1)) == [1, 3]
    # upscale 1x1 RGB -> 2x2 replicates the pixel
    assert list(resize_nearest(bytes([9, 8, 7]), 1, 1, 3, 2, 2)) == \
        [9, 8, 7] * 4


def _gradient_png(doc_id: int, w=16, h=12, ch=3) -> bytes:
    pixels = bytes(((x * 17 + y * 31 + c * 7 + doc_id) % 256)
                   for y in range(h) for x in range(w) for c in range(ch))
    return encode_png(w, h, ch, pixels, filters=[0, 1, 2, 3, 4])


def test_spark_decode_images_real_png(spark):
    rows = [(i, _gradient_png(i)) for i in range(6)]
    rows.append((50, b"\x89PNG\r\n\x1a\nbroken"))  # corrupt
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in
           multimodal.decode_images(df, feature_dim=8).collect()}
    assert len(out) == 8
    r = out[2]
    assert (r.width, r.height, r.n_channels, r.decode_status) == \
        (16, 12, 3, "ok_png")
    # features recomputed independently from the known gradient
    _, _, _, pix = decode_png(_gradient_png(2))
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(-1, 3)
    want = list(arr.mean(axis=0) / 255.0) + list(arr.std(axis=0) / 255.0)
    assert r.features == pytest.approx(want + [0.0] * 2, abs=1e-6)
    assert out[50].decode_status.startswith("decode_error:")
    assert out[50].width is None
    assert out[99].decode_status == "null_payload"


def test_spark_resize_images_real_png(spark):
    rows = [(i, _gradient_png(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in
           multimodal.resize_images(df, width=8, height=8).collect()}
    r = out[1]
    assert (r.out_width, r.out_height, r.resize_status) == (8, 8, "ok_png")
    # expected digest recomputed outside the kernel
    _, _, _, pix = decode_png(_gradient_png(1))
    expect = encode_png(8, 8, 3, resize_nearest(pix, 16, 12, 3, 8, 8))
    assert r.resized_bytes == len(expect)
    assert r.resized_digest == hashlib.md5(expect).hexdigest()
    # the resized output itself re-decodes to the expected buffer
    assert decode_png(expect)[:3] == (8, 8, 3)


def test_spark_unknown_format_is_status_row_not_abort(spark):
    # WebP has no stdlib codec here: the env-blocked seam surfaces as
    # a per-row unsupported_format status (mixed-format batches must
    # survive), and never silently falls back to the fake path.
    df = spark.createDataFrame(
        [(1, b"RIFF\x24\x00\x00\x00WEBPVP8 fake")],
        "doc_id long, payload binary")
    (d,) = multimodal.decode_images(df).collect()
    assert d.decode_status == "unsupported_format"
    assert d.width is None and d.features is None
    (r,) = multimodal.resize_images(df).collect()
    assert r.resize_status == "unsupported_format"
    assert r.resized_digest is None


def test_spark_malformed_jpeg_is_row_level_error_not_stage_abort(spark):
    # A truncated-but-magic JPEG is untrusted-web-input territory: it
    # must produce a decode_error row, never abort the Arrow stage.
    df = spark.createDataFrame([(1, b"\xff\xd8\xff\xe0fakejpeg")],
                               "doc_id long, payload binary")
    (d,) = multimodal.decode_images(df).collect()
    assert d.decode_status.startswith("decode_error:")
    (r,) = multimodal.resize_images(df).collect()
    assert r.resize_status.startswith("decode_error:")


def test_spark_resize_images_real_gif_and_jpeg(spark):
    from cdx_writer_spark.functions.gif import decode_gif, synth_gif_bytes
    from cdx_writer_spark.functions.jpeg import decode_jpeg, synth_jpeg_bytes

    rows = [(1, synth_gif_bytes(7)), (2, synth_jpeg_bytes(7))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in
           multimodal.resize_images(df, width=8, height=8).collect()}
    assert (out[1].out_width, out[1].resize_status) == (8, "ok_gif")
    assert (out[2].out_width, out[2].resize_status) == (8, "ok_jpeg")
    # recompute the GIF expectation outside the kernel: first frame,
    # nearest resize, deterministic PNG re-encode
    w0, h0, frames = decode_gif(synth_gif_bytes(7))
    expect = encode_png(8, 8, 3, resize_nearest(
        frames[0]["rgb"], w0, h0, 3, 8, 8))
    assert out[1].resized_bytes == len(expect)
    assert out[1].resized_digest == hashlib.md5(expect).hexdigest()
    # and the JPEG one
    w0, h0, ch, pix = decode_jpeg(synth_jpeg_bytes(7))
    expect = encode_png(8, 8, ch, resize_nearest(pix, w0, h0, ch, 8, 8))
    assert out[2].resized_bytes == len(expect)
    assert out[2].resized_digest == hashlib.md5(expect).hexdigest()


def test_spark_resize_gif_subrect_first_frame(spark):
    # a valid GIF whose FIRST frame covers only a sub-rectangle of the
    # logical screen: the resize must pair the frame's own dims with
    # its pixel buffer, not the screen dims
    from cdx_writer_spark.functions.gif import encode_gif

    small = bytes((i * 7) % 256 for i in range(4 * 3))
    big = bytes((i * 5) % 256 for i in range(8 * 6))
    data = encode_gif([(4, 3, small), (8, 6, big)])
    df = spark.createDataFrame([(1, data)], "doc_id long, payload binary")
    (r,) = multimodal.resize_images(df, width=8, height=8).collect()
    assert r.resize_status == "ok_gif"
    rgb = bytes(v for i in small for v in (i, i, i))  # grayscale ramp
    expect = encode_png(8, 8, 3, resize_nearest(rgb, 4, 3, 3, 8, 8))
    assert r.resized_bytes == len(expect)
    assert r.resized_digest == hashlib.md5(expect).hexdigest()


def test_features_padding_and_truncation():
    pix = bytes([0, 255] * 8)  # 2-channel, mean .0/1.0, std 0
    f4 = features_from_pixels(pix, 2, 4)
    assert f4 == pytest.approx([0.0, 1.0, 0.0, 0.0])
    f3 = features_from_pixels(pix, 2, 3)
    assert f3 == pytest.approx([0.0, 1.0, 0.0])


def test_hostile_png_headers_rejected_cheaply():
    """A 16k x 16k header exceeds the pixel budget; and a zlib bomb
    whose stream inflates past the declared geometry is cut off at the
    bounded decompression, not after ballooning in memory."""
    from cdx_writer_spark.functions.png import MAX_PIXELS

    ihdr = struct.pack(">IIBBBBB", 1 << 14, 1 << 14, 8, 2, 0, 0, 0)
    assert (1 << 14) * (1 << 14) > MAX_PIXELS
    big = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
           + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="too large"):
        decode_png(big)
    # 2x2 RGB geometry (14 filtered bytes) but a ~1 MB inflating bomb
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr2)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="larger than the image"):
        decode_png(bomb)
