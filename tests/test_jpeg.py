"""Baseline-JPEG decoder tests.

The decoder is the real kernel behind `multimodal.decode_images` /
`jpeg_gray_features` for JPEG payloads.  Exactness without a reference
decoder comes from the lossless constant-block construction (module
docstring of :mod:`functions.jpeg`): unit quantizers + DC-only blocks
round-trip bit-exactly, so the full marker/Huffman/bitstream/
predictor/IDCT path is verified against hand-computable pixels.
"""

from __future__ import annotations

import struct

import pytest

from cdx_writer_spark.functions import jpeg, multimodal


def test_lossless_constant_block_roundtrip():
    for d in (0, 1, 2, 3, 4, 5, 123, 999):
        w, h, nc, pix = jpeg.decode_jpeg(jpeg.synth_jpeg_bytes(d))
        bw, bh = 2 + d % 3, 1 + d % 2
        assert (w, h, nc) == (8 * bw, 8 * bh, 1)
        for by in range(bh):
            for bx in range(bw):
                v = (d * 11 + (by * bw + bx) * 29) % 256
                for yy in (0, 3, 7):
                    for xx in (0, 4, 7):
                        assert pix[(by * 8 + yy) * w + bx * 8 + xx] == v


def test_extreme_values_and_dc_swings():
    """0 and 255 blocks adjacent — the largest possible DC differences
    (|diff| up to 2040, 11-bit categories)."""
    vals = [[0, 255, 0, 255], [255, 0, 255, 0]]
    w, h, nc, pix = jpeg.decode_jpeg(
        jpeg.encode_gray_blocks_jpeg(4, 2, vals))
    for by in range(2):
        for bx in range(4):
            assert pix[(by * 8) * w + bx * 8] == vals[by][bx]
            assert pix[(by * 8 + 7) * w + bx * 8 + 7] == vals[by][bx]


def test_restart_markers_reset_predictors():
    vals = [[(7 * i + 3 * j) % 256 for i in range(6)] for j in range(2)]
    data = jpeg.encode_gray_blocks_jpeg(6, 2, vals, restart_interval=5)
    assert b"\xFF\xD0" in data and b"\xFF\xD1" in data
    w, h, nc, pix = jpeg.decode_jpeg(data)
    for by in range(2):
        for bx in range(6):
            assert pix[(by * 8) * w + bx * 8] == vals[by][bx]


def _color_420(yv: int, cbv: int, crv: int) -> bytes:
    """Hand-built one-MCU 4:2:0 YCbCr JPEG with constant planes."""
    out = bytearray(jpeg.JPEG_SOI)
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += b"\xFF\xC4" + struct.pack(
        ">H", 19 + len(jpeg._DC_SYMBOLS)) + b"\x00" \
        + jpeg._DC_COUNTS + jpeg._DC_SYMBOLS
    out += b"\xFF\xC4" + struct.pack(
        ">H", 19 + len(jpeg._AC_SYMBOLS)) + b"\x10" \
        + jpeg._AC_COUNTS + jpeg._AC_SYMBOLS
    out += b"\xFF\xDA" + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dc_codes = jpeg._huff_codes(jpeg._DC_COUNTS, jpeg._DC_SYMBOLS)
    ac_codes = jpeg._huff_codes(jpeg._AC_COUNTS, jpeg._AC_SYMBOLS)
    bw = jpeg._BitWriter()
    preds: dict[str, int] = {}

    def block(comp: str, v: int):
        dc = 8 * (v - 128)
        diff = dc - preds.get(comp, 0)
        preds[comp] = dc
        s = abs(diff).bit_length() if diff else 0
        length, code = dc_codes[s]
        bw.write(length, code)
        if s:
            bw.write(s, diff if diff > 0 else diff + (1 << s) - 1)
        length, code = ac_codes[0x00]
        bw.write(length, code)

    for _ in range(4):
        block("y", yv)
    block("cb", cbv)
    block("cr", crv)
    bw.flush()
    out += bw.out + b"\xFF\xD9"
    return bytes(out)


@pytest.mark.parametrize("yv,cbv,crv", [
    (128, 128, 128), (200, 100, 60), (50, 220, 130), (0, 255, 0),
])
def test_chroma_subsampled_color(yv, cbv, crv):
    w, h, nc, pix = jpeg.decode_jpeg(_color_420(yv, cbv, crv))
    assert (w, h, nc) == (16, 16, 3)
    r = jpeg._clamp(yv + 1.402 * (crv - 128))
    g = jpeg._clamp(yv - 0.344136 * (cbv - 128)
                    - 0.714136 * (crv - 128))
    b = jpeg._clamp(yv + 1.772 * (cbv - 128))
    assert pix[:3] == bytes([r, g, b])
    assert pix[-3:] == bytes([r, g, b])


@pytest.mark.parametrize("mutate,reason", [
    (lambda b: b[:30], "truncated headers"),
    (lambda b: b"\xFF\xD9" + b[2:], "EOI first"),
    (lambda b: b.replace(b"\xFF\xC0", b"\xFF\xC2", 1), "progressive"),
    (lambda b: b[:-40], "entropy stream truncated"),
])
def test_malformed_jpegs_raise(mutate, reason):
    data = jpeg.synth_jpeg_bytes(7)
    with pytest.raises(jpeg.JpegError):
        jpeg.decode_jpeg(bytes(mutate(bytearray(data))))


@pytest.mark.parametrize("payload,reason", [
    (b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x01", "truncated SOF body"),
    (b"\xff\xd8\xff\xc4\x00\x04\x00\x00", "truncated DHT counts"),
    (b"\xff\xd8\xff\xdb\x00\x03\x10", "truncated DQT"),
    (b"\xff\xd8\xff\xda\x00\x04\x03\x00", "SOS before SOF, short"),
    (b"\xff\xd8\xff\xc0\x00\x0b\x08\xff\xff\xff\xff\x01\x01\x11\x00",
     "hostile 65535x65535 dimensions"),
])
def test_garbage_segments_raise_jpegerror_not_parser_errors(payload, reason):
    """Untrusted magic-matched bytes must surface as JpegError (a
    per-row decode_error in the Spark kernels), never struct.error /
    IndexError escaping to abort the whole Arrow batch."""
    with pytest.raises(jpeg.JpegError):
        jpeg.decode_jpeg(payload)


# --- Spark kernels over real JPEGs -------------------------------------------

@pytest.fixture()
def jpeg_payloads(spark):
    rows = [(d, bytearray(jpeg.synth_jpeg_bytes(d))) for d in range(10)]
    rows.append((90, bytearray(jpeg.synth_jpeg_bytes(4)[:30])))
    rows.append((91, None))
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_jpeg_gray_features_kernel(spark, jpeg_payloads):
    got = {r.doc_id: r for r in multimodal.jpeg_gray_features(
        jpeg_payloads).collect()}
    for d in range(10):
        r = got[d]
        bw, bh = 2 + d % 3, 1 + d % 2
        assert (r.width, r.height, r.n_channels) == (8 * bw, 8 * bh, 1)
        assert r.decode_status == "ok_jpeg"
        assert r.luma_sum == 64 * sum(
            (d * 11 + b * 29) % 256 for b in range(bw * bh))
    assert got[90].decode_status.startswith("decode_error:")
    assert got[91].decode_status == "null_payload"


def test_decode_images_jpeg_branch(spark, jpeg_payloads):
    got = {r.doc_id: r for r in multimodal.decode_images(
        jpeg_payloads.filter("doc_id < 10")).collect()}
    for d in range(10):
        r = got[d]
        assert r.decode_status == "ok_jpeg"
        bw, bh = 2 + d % 3, 1 + d % 2
        mean = sum((d * 11 + b * 29) % 256
                   for b in range(bw * bh)) / (bw * bh) / 255.0
        assert r.features[0] == pytest.approx(mean)
