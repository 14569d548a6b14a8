"""Property-based round-trip gates for the pure-stdlib codecs
(hypothesis): ANY 8-bit pixel buffer must survive encode -> decode
bit-exactly, across dimensions, channel counts, byte orders, strip
splits and PNG filter choices.  The example-based suites pin
hand-computed values; these pin the algebraic contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cdx_writer_spark.functions.bmp import decode_bmp, encode_bmp
from cdx_writer_spark.functions.png import decode_png, encode_png
from cdx_writer_spark.functions.tiff import decode_tiff, encode_tiff

_dims = st.tuples(st.integers(1, 12), st.integers(1, 12))


def _pixels(w, h, ch, data):
    return bytes(data.draw(st.binary(min_size=w * h * ch,
                                     max_size=w * h * ch)))


@settings(max_examples=40, deadline=None)
@given(dims=_dims, ch=st.sampled_from([1, 2, 3, 4]),
       filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
       data=st.data())
def test_png_round_trip_any_pixels(dims, ch, filters, data):
    w, h = dims
    pix = _pixels(w, h, ch, data)
    assert decode_png(encode_png(w, h, ch, pix, filters=filters)) \
        == (w, h, ch, pix)


@settings(max_examples=40, deadline=None)
@given(dims=_dims, ch=st.sampled_from([1, 3, 4]),
       big_endian=st.booleans(), rps=st.integers(1, 13),
       data=st.data())
def test_tiff_round_trip_any_pixels(dims, ch, big_endian, rps, data):
    w, h = dims
    pix = _pixels(w, h, ch, data)
    enc = encode_tiff(w, h, ch, pix, big_endian=big_endian,
                      rows_per_strip=rps)
    assert decode_tiff(enc) == (w, h, ch, pix)


@settings(max_examples=40, deadline=None)
@given(dims=_dims, ch=st.sampled_from([3, 4]), data=st.data())
def test_bmp_round_trip_any_pixels(dims, ch, data):
    w, h = dims
    pix = _pixels(w, h, ch, data)
    assert decode_bmp(encode_bmp(w, h, ch, pix)) == (w, h, ch, pix)


@settings(max_examples=25, deadline=None)
@given(payload=st.binary(min_size=0, max_size=200))
def test_decoders_never_hang_or_leak_on_garbage(payload):
    """Arbitrary bytes prefixed with each format's magic must raise
    the format's own error type (the per-row decode_error contract) —
    never any other exception and never succeed on garbage this
    short unless it genuinely parses."""
    from cdx_writer_spark.functions.avi import AviError, parse_avi
    from cdx_writer_spark.functions.bmp import BmpError
    from cdx_writer_spark.functions.gif import GifError, decode_gif
    from cdx_writer_spark.functions.jpeg import JpegError, decode_jpeg
    from cdx_writer_spark.functions.png import PngError
    from cdx_writer_spark.functions.tiff import TiffError

    cases = [
        (b"\x89PNG\r\n\x1a\n", decode_png, PngError),
        (b"GIF89a", decode_gif, GifError),
        (b"\xff\xd8", decode_jpeg, JpegError),
        (b"BM", decode_bmp, BmpError),
        (b"II*\x00", decode_tiff, TiffError),
        (b"MM\x00*", decode_tiff, TiffError),
        (b"RIFF\xff\x00\x00\x00AVI ", parse_avi, AviError),
    ]
    for magic, decoder, err in cases:
        try:
            decoder(magic + payload)
        except err:
            pass


@settings(max_examples=25, deadline=None)
@given(doc_id=st.integers(0, 10_000),
       n_frames=st.integers(1, 6))
def test_avi_container_round_trip(doc_id, n_frames):
    """The MJPEG-AVI wrapper must hand back exactly the JPEG byte
    strings it was given, in order, with the declared geometry."""
    from cdx_writer_spark.functions.avi import encode_mjpeg_avi, parse_avi
    from cdx_writer_spark.functions.jpeg import encode_gray_blocks_jpeg

    frames = [encode_gray_blocks_jpeg(1, 1, [[(doc_id + f) % 256]])
              for f in range(n_frames)]
    w, h, us, got = parse_avi(encode_mjpeg_avi(frames, 8, 8, 12345))
    assert (w, h, us) == (8, 8, 12345)
    assert got == frames
