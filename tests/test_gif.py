"""GIF codec + real frame-sampling kernel tests.

The decoder is the real kernel behind `multimodal.sample_frames` /
`decode_images` / `gif_frame_features` for GIF payloads, so it gets
the same treatment the PNG codec did: hand-built byte vectors at the
format's tricky spots (variable-width LZW, dictionary growth, CLEAR
handling, interlacing, palette bounds) plus pipeline-shape tests over
mapInPandas.
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from cdx_writer_spark.functions import gif, multimodal


# --- a REAL compressing LZW encoder (test-only) ------------------------------
#
# The fixture encoder emits literal-only streams that never grow the
# code width; this one builds the dictionary like a normal GIF writer,
# so decoding it exercises width bumps, the code==len(table) case and
# table-full behavior.

def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code, width = clear + 2, min_code_size + 1
    emit(clear, width)
    w = b""
    for b in bytes(indices):
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = clear + 2, min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_roundtrip_compressed_streams():
    """Width growth + code==len(table) (the 'cScSc' case) + repetitive
    data that builds deep dictionary chains."""
    cases = [
        bytes([1, 1, 1, 1, 1, 1]),                     # KwKwK pattern
        bytes(range(4)) * 200,                          # width growth
        bytes((i * 7 + (i * i) % 3) % 4 for i in range(5000)),
        b"\x00" * 4096,                                 # max-run chains
    ]
    for idx in cases:
        enc = _lzw_compress(idx, 2)
        assert gif._lzw_decode(2, enc, len(idx)) == idx


def test_lzw_roundtrip_256_color_compressed():
    idx = bytes((i * 31 + 7) % 256 for i in range(10000))
    assert gif._lzw_decode(8, _lzw_compress(idx, 8), len(idx)) == idx


def test_synth_roundtrip_matches_generation_rule():
    for d in (0, 1, 2, 3, 4, 11, 123, 777):
        w, h = 8 + d % 5, 6 + d % 3
        _, _, frames = gif.decode_gif(gif.synth_gif_bytes(d))
        assert len(frames) == 2 + d % 4
        for f, fr in enumerate(frames):
            assert (fr["width"], fr["height"]) == (w, h)
            exp = bytes(v for p in range(w * h)
                        for v in [(d * 7 + f * 13 + p * 3) % 256] * 3)
            assert fr["rgb"] == exp


def _single_frame_gif(w, h, indices, *, interlaced=False,
                      local_palette=None):
    """Hand-built single-frame GIF89a with a LOCAL color table (the
    path the fixture encoder never takes)."""
    palette = local_palette or bytes(
        v for i in range(4) for v in (i * 80 % 256, i, 255 - i))
    size_bits = max(1, (len(palette) // 3).bit_length() - 1)
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])      # no global table
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x80 | (0x40 if interlaced else 0) | (size_bits - 1))
    out += palette
    out.append(2)
    data = _lzw_compress(indices, 2)
    for i in range(0, len(data), 255):
        out.append(len(data[i:i + 255]))
        out += data[i:i + 255]
    out += b"\x00\x3B"
    return bytes(out)


def test_local_color_table_and_extension_skip():
    idx = bytes([0, 1, 2, 3] * 4)
    raw = bytearray(_single_frame_gif(4, 4, idx))
    # splice a graphics-control extension before the image descriptor
    at = raw.index(0x2C, 6)
    with_ext = bytes(raw[:at]) + b"\x21\xF9\x04\x00\x00\x00\x00\x00" \
        + bytes(raw[at:])
    _, _, frames = gif.decode_gif(with_ext)
    palette = bytes(v for i in range(4) for v in (i * 80 % 256, i, 255 - i))
    exp = b"".join(palette[3 * v:3 * v + 3] for v in idx)
    assert frames[0]["rgb"] == exp


def test_interlaced_rows_are_reordered():
    # 4x8 frame, row y filled with index y % 4; supply rows in
    # interlace pass order (0, 8.. / 4.. / 2, 6.. / 1, 3, 5, 7)
    h = 8
    pass_order = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                  for y in range(s, h, st)]
    rows_interlaced = b"".join(bytes([y % 4] * 4) for y in pass_order)
    data = _single_frame_gif(4, h, rows_interlaced, interlaced=True)
    _, _, frames = gif.decode_gif(data)
    palette = bytes(v for i in range(4) for v in (i * 80 % 256, i, 255 - i))
    exp = b"".join(palette[3 * (y % 4):3 * (y % 4) + 3] * 4
                   for y in range(h))
    assert frames[0]["rgb"] == exp


@pytest.mark.parametrize("mutate,reason", [
    (lambda b: b[:20], "truncated"),
    (lambda b: b"JIF89a" + b[6:], "bad signature"),
    (lambda b: b.replace(b"\x3B", b"", 1)[:-1], "missing trailer"),
    # image descriptor starts right after header(6)+screen(7)+palette
    (lambda b: b[:781] + b"\x7E" + b[782:], "bad block"),
])
def test_malformed_gifs_raise_giferror(mutate, reason):
    data = gif.synth_gif_bytes(3)
    with pytest.raises(gif.GifError):
        gif.decode_gif(mutate(bytearray(data)))


def test_palette_index_out_of_range_raises():
    # 2-bit local palette (4 entries) but index 3 replaced by... build
    # directly: indices valid for LZW but >= palette size
    data = _single_frame_gif(
        2, 2, bytes([0, 1, 2, 3]),
        local_palette=bytes(v for i in range(2) for v in (i, i, i)))
    with pytest.raises(gif.GifError):
        gif.decode_gif(data)


# --- Spark kernels over real GIFs --------------------------------------------

@pytest.fixture()
def gif_payloads(spark):
    rows = [(d, bytearray(gif.synth_gif_bytes(d))) for d in range(12)]
    rows.append((90, bytearray(gif.synth_gif_bytes(5)[:25])))  # corrupt
    rows.append((91, None))
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_sample_frames_real_gif(spark, gif_payloads):
    got = {(r.doc_id, r.frame_index): r
           for r in multimodal.sample_frames(
               gif_payloads, stride=2).collect()}
    for d in range(12):
        n_frames = 2 + d % 4
        w, h = 8 + d % 5, 6 + d % 3
        for i in range(0, n_frames, 2):
            r = got[(d, i)]
            assert r.n_frames == n_frames
            rgb = bytes(v for p in range(w * h)
                        for v in [(d * 7 + i * 13 + p * 3) % 256] * 3)
            assert r.frame_digest == hashlib.md5(rgb).hexdigest()
            # grayscale: mean luma == mean palette index
            vals = [(d * 7 + i * 13 + p * 3) % 256 for p in range(w * h)]
            assert r.frame_luma_x256 == sum(vals) // len(vals)
    # corrupt payload -> one decode_error row, not a batch abort
    err = [r for (doc, _), r in got.items() if doc == 90]
    assert len(err) == 1 and err[0].frame_digest.startswith("decode_error:")
    assert (91, None) in got  # null payload row preserved


def test_decode_images_gif_first_frame(spark, gif_payloads):
    got = {r.doc_id: r for r in multimodal.decode_images(
        gif_payloads.filter("doc_id < 12")).collect()}
    for d in range(12):
        r = got[d]
        assert r.decode_status == "ok_gif"
        assert (r.width, r.height, r.n_channels) == (8 + d % 5,
                                                     6 + d % 3, 3)
        vals = [(d * 7 + p * 3) % 256
                for p in range(r.width * r.height)]
        assert r.features[0] == pytest.approx(
            sum(vals) / len(vals) / 255.0)


def test_gif_frame_features_partitioning_invariant(spark, gif_payloads):
    base = multimodal.gif_frame_features(gif_payloads)
    one = sorted(map(tuple, base.coalesce(1).collect()))
    many = sorted(map(tuple,
                      multimodal.gif_frame_features(
                          gif_payloads.repartition(7, "doc_id"))
                      .collect()))
    assert one == many
    stat = {r[0]: r[-1] for r in one}
    assert stat[90].startswith("decode_error:")
    assert stat[91] == "null_payload"


def test_hostile_frame_dimensions_rejected():
    """A tiny crafted GIF declaring a 65535x65535 frame must raise
    GifError at the header check — before the LZW loop can build a
    multi-GB index buffer (same 1<<26 budget as png/jpeg/bmp)."""
    import struct

    from cdx_writer_spark.functions.gif import GifError, decode_gif

    hdr = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)
    hdr += bytes([255, 0, 0, 0, 255, 0])      # 2-entry global table
    img = b"," + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
    img += bytes([2]) + bytes([1, 0x44]) + b"\x00"
    with pytest.raises(GifError, match="too large"):
        decode_gif(hdr + img + b";")
