"""Pure-stdlib TIFF codec + its Spark kernels.

Same layering as the png/gif/jpeg/bmp suites: round-trips across
channel counts, byte orders and strip splits; malformed/hostile input
-> TiffError; the Spark kernels surface ok_tiff / decode_error /
unsupported boundaries per row."""

from __future__ import annotations

import random
import struct

import pytest

from cdx_writer_spark.functions import multimodal
from cdx_writer_spark.functions.tiff import (
    MAX_PIXELS,
    TiffError,
    decode_tiff,
    encode_tiff,
    synth_tiff_bytes,
)


@pytest.mark.parametrize("nch", [1, 3, 4])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rps", [None, 1, 2, 5])
def test_round_trip(nch, big_endian, rps):
    rng = random.Random(nch * 10 + big_endian)
    w, h = 7, 5
    pix = bytes(rng.randrange(256) for _ in range(w * h * nch))
    enc = encode_tiff(w, h, nch, pix, big_endian=big_endian,
                      rows_per_strip=rps)
    assert decode_tiff(enc) == (w, h, nch, pix)


def test_hand_built_little_endian_gray():
    """2x2 gray built by hand (struct only, independent of the
    encoder): single strip at a hand-chosen offset."""
    pix = bytes([10, 20, 30, 40])
    entries = [
        (256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 1),
        (273, 4, 1, 8 + 2 + 12 * 9 + 4),   # strip right after IFD
        (277, 3, 1, 1), (278, 4, 1, 2), (279, 4, 1, 4),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, vt, cnt, val in entries:
        ifd += struct.pack("<HHI", tag, vt, cnt)
        ifd += struct.pack("<I", val) if vt == 4 else \
            struct.pack("<HH", val, 0)
    data = b"II*\x00" + struct.pack("<I", 8) + ifd \
        + struct.pack("<I", 0) + pix
    assert decode_tiff(data) == (2, 2, 1, pix)


def test_malformed_and_unsupported_raise():
    good = encode_tiff(2, 2, 3, bytes(range(12)))
    with pytest.raises(TiffError, match="signature"):
        decode_tiff(b"notatiff")
    with pytest.raises(TiffError, match="out of bounds"):
        decode_tiff(good[:-5])
    # LZW compression flag (tag 259 = 5)
    lzw = bytearray(good)
    # II layout: entries start at 10; compression is the 4th entry
    off = 10 + 12 * 3 + 8
    struct.pack_into("<H", lzw, off, 5)
    with pytest.raises(TiffError, match="compressed"):
        decode_tiff(bytes(lzw))
    # hostile dimensions
    big = bytearray(good)
    struct.pack_into("<I", big, 10 + 8, 1 << 14)
    struct.pack_into("<I", big, 10 + 12 + 8, 1 << 14)
    assert (1 << 28) > MAX_PIXELS
    with pytest.raises(TiffError, match="too large"):
        decode_tiff(bytes(big))


def test_required_tag_with_zero_count_raises_typed_error():
    """A hostile IFD declaring count=0 on a required tag (e.g.
    ImageWidth) must surface as TiffError — the mapInPandas kernels
    catch only TiffError, so an IndexError would abort the whole
    batch instead of producing a per-row decode_error."""
    good = encode_tiff(2, 2, 3, bytes(range(12)))
    evil = bytearray(good)
    # II layout: entries start at 10; ImageWidth (256) is entry 0;
    # its count field is at +4 within the 12-byte entry
    struct.pack_into("<I", evil, 10 + 4, 0)
    with pytest.raises(TiffError):
        decode_tiff(bytes(evil))


def test_synth_variety_and_determinism():
    shapes = set()
    for i in range(12):
        a, b = synth_tiff_bytes(i), synth_tiff_bytes(i)
        assert a == b
        w, h, ch, pix = decode_tiff(a)
        assert pix[0] == (i * 23) % 256
        shapes.add((w, h, ch))
    assert len(shapes) == 12


def test_spark_decode_images_real_tiff(spark):
    rows = [(i, synth_tiff_bytes(i)) for i in range(4)]
    rows.append((50, b"II*\x00\x08\x00\x00\x00trunc"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in
           multimodal.decode_images(df, feature_dim=4).collect()}
    w, h, ch, _ = decode_tiff(synth_tiff_bytes(2))
    assert (out[2].width, out[2].height, out[2].n_channels,
            out[2].decode_status) == (w, h, ch, "ok_tiff")
    assert out[50].decode_status.startswith("decode_error:")
    rz = {r.doc_id: r for r in multimodal.resize_images(
        df, width=4, height=4).collect()}
    assert rz[1].resize_status == "ok_tiff"
    assert rz[50].resize_status.startswith("decode_error:")


def test_sniff_mime_tiff(spark):
    df = spark.createDataFrame(
        [(1, synth_tiff_bytes(0)), (2, synth_tiff_bytes(1))],
        "doc_id long, payload binary")
    got = {r.doc_id: r.payload_mime
           for r in multimodal.attach_binary_meta(df).collect()}
    assert got == {1: "image/tiff", 2: "image/tiff"}
