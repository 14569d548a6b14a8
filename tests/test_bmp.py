"""Pure-stdlib BMP codec + its Spark kernel integration."""
import hashlib
import struct

import pytest

from cdx_writer_spark.functions import multimodal
from cdx_writer_spark.functions.bmp import (
    BmpError, decode_bmp, encode_bmp, synth_bmp_bytes,
)
from cdx_writer_spark.functions.png import encode_png, resize_nearest


def test_roundtrip_rgb_and_rgba():
    for nch in (3, 4):
        pix = bytes((i * 13) % 256 for i in range(5 * 3 * nch))
        data = encode_bmp(5, 3, nch, pix)
        assert decode_bmp(data) == (5, 3, nch, pix)


def test_row_padding_widths():
    # stride padding kicks in whenever w*3 % 4 != 0
    for w in (1, 2, 3, 4, 5):
        pix = bytes((i * 7) % 256 for i in range(w * 2 * 3))
        assert decode_bmp(encode_bmp(w, 2, 3, pix)) == (w, 2, 3, pix)


def test_top_down_negative_height():
    pix = bytes(range(4 * 2 * 3))
    data = bytearray(encode_bmp(4, 2, 3, pix))
    # flip to top-down: negate height, reverse the stored row order
    struct.pack_into("<i", data, 22, -2)
    stride = 4 * 3  # w*3 already 4-aligned
    rows = [bytes(data[54 + r * stride:54 + (r + 1) * stride])
            for r in range(2)]
    data[54:] = rows[1] + rows[0]
    assert decode_bmp(bytes(data)) == (4, 2, 3, pix)


@pytest.mark.parametrize("mutate,reason", [
    (lambda b: b[:40], "truncated header"),
    (lambda b: b[:-8], "truncated pixels"),
    (lambda b: b[:30] + b"\x01" + b[31:], "RLE compression"),
    (lambda b: b[:28] + b"\x08\x00" + b[30:], "8-bit palette"),
    (lambda b: b[:18] + struct.pack("<i", 1 << 20) + b[22:],
     "hostile width"),
])
def test_malformed_bmps_raise_bmperror(mutate, reason):
    data = synth_bmp_bytes(4)
    with pytest.raises(BmpError):
        decode_bmp(bytes(mutate(bytearray(data))))


def test_garbage_after_magic_raises_bmperror_not_struct_error():
    with pytest.raises(BmpError):
        decode_bmp(b"BMgarbage")


def test_spark_decode_images_bmp_branch(spark):
    rows = [(d, bytearray(synth_bmp_bytes(d))) for d in range(6)]
    rows.append((90, bytearray(b"BM\x3a\x00truncated")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.decode_images(df).collect()}
    for d in range(6):
        w, h, nch, pix = decode_bmp(synth_bmp_bytes(d))
        r = got[d]
        assert (r.width, r.height, r.n_channels) == (w, h, nch)
        assert r.decode_status == "ok_bmp"
        # first feature = channel-0 mean / 255
        ch0 = pix[0::nch]
        assert r.features[0] == pytest.approx(sum(ch0) / len(ch0) / 255.0)
    assert got[90].decode_status.startswith("decode_error:")


def test_spark_resize_images_bmp_branch(spark):
    df = spark.createDataFrame([(1, bytearray(synth_bmp_bytes(3)))],
                               "doc_id long, payload binary")
    (r,) = multimodal.resize_images(df, width=8, height=8).collect()
    assert (r.out_width, r.out_height, r.resize_status) == (8, 8, "ok_bmp")
    w, h, nch, pix = decode_bmp(synth_bmp_bytes(3))
    expect = encode_png(8, 8, nch, resize_nearest(pix, w, h, nch, 8, 8))
    assert r.resized_bytes == len(expect)
    assert r.resized_digest == hashlib.md5(expect).hexdigest()
