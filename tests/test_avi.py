"""MJPEG-AVI container codec: roundtrip, pathologies, kernel rows."""
from __future__ import annotations

import struct

import pytest

from cdx_writer_spark.functions import avi, jpeg, multimodal


def test_synth_roundtrip_lossless():
    for d in (0, 1, 2, 3, 5, 11, 42):
        w, h, us, frames = avi.parse_avi(avi.synth_avi_bytes(d))
        bw, bh = 2 + d % 3, 1 + d % 2
        assert (w, h) == (8 * bw, 8 * bh)
        assert len(frames) == 1 + d % 4
        for f, fr in enumerate(frames):
            fw, fh, nc, px = jpeg.decode_jpeg(fr)
            assert (fw, fh, nc) == (w, h, 1)
            for p in range(fw * fh):
                bx, by = (p % fw) // 8, (p // fw) // 8
                assert px[p] == (d * 11 + f * 47
                                 + (by * bw + bx) * 29) % 256


def test_not_avi_and_truncation():
    assert not avi.is_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(avi.AviError):
        avi.parse_avi(b"GIF89a")
    data = avi.synth_avi_bytes(3)
    with pytest.raises(avi.AviError):
        avi.parse_avi(data[:40])  # header cut mid-chunk


def test_declared_size_past_end_raises():
    data = bytearray(avi.synth_avi_bytes(1))
    # find the first 00dc chunk and inflate its declared size
    i = bytes(data).index(b"00dc")
    struct.pack_into("<I", data, i + 4, 1 << 30)
    with pytest.raises(avi.AviError):
        avi.parse_avi(bytes(data))


def test_non_jpeg_frame_raises():
    bad = avi.encode_mjpeg_avi([b"\x00\x01\x02\x03"], 8, 8)
    with pytest.raises(avi.AviError):
        avi.parse_avi(bad)


def test_missing_header_raises():
    movi = avi._list(b"movi", avi._chunk(b"00dc", b"\xFF\xD8\xFF\xD9"))
    body = b"AVI " + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(avi.AviError, match="avih"):
        avi.parse_avi(data)


def test_frame_cap():
    frame = jpeg.encode_gray_blocks_jpeg(1, 1, [[0]])
    data = avi.encode_mjpeg_avi([frame] * (avi.MAX_FRAMES + 1), 8, 8)
    with pytest.raises(avi.AviError, match="frames"):
        avi.parse_avi(data)


def test_avi_frame_features_kernel(spark):
    rows = [(d, bytearray(avi.synth_avi_bytes(d))) for d in range(6)]
    rows.append((100, bytearray(b"not a container")))
    rows.append((101, None))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = multimodal.avi_frame_features(df, stride=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in range(6):
        nf = 1 + d % 4
        want_idx = list(range(0, nf, 2))
        rs = sorted(by_doc[d], key=lambda r: r["frame_index"])
        assert [r["frame_index"] for r in rs] == want_idx
        assert all(r["frame_status"] == "ok_avi"
                   and r["n_frames"] == nf for r in rs)
        bw, bh = 2 + d % 3, 1 + d % 2
        # frame 0 luma sum from the generation rule
        want0 = 64 * sum((d * 11 + (by * bw + bx) * 29) % 256
                         for by in range(bh) for bx in range(bw))
        assert rs[0]["luma_sum"] == want0
    assert by_doc[100][0]["frame_status"] == "not_avi"
    assert by_doc[101][0]["frame_status"] == "null_payload"


def test_sample_frames_real_avi_path(spark):
    rows = [(1, bytearray(avi.synth_avi_bytes(7)))]  # 4 frames
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sorted(multimodal.sample_frames(df, stride=2).collect(),
                 key=lambda r: r["frame_index"])
    assert [r["frame_index"] for r in got] == [0, 2]
    assert all(r["n_frames"] == 4 for r in got)
    assert all(len(r["frame_digest"]) == 32 for r in got)


def test_strh_declares_correct_fps():
    """strh field order is (dwScale, dwRate): fps = rate/scale must be
    1e6/us_per_frame — a swap declares 0.04 fps to external players
    (parse_avi only reads avih, so round-trips can't catch it)."""
    data = avi.encode_mjpeg_avi(
        [jpeg.encode_gray_blocks_jpeg(1, 1, [[0]])], 8, 8,
        us_per_frame=40000)
    i = data.index(b"strh")
    scale, rate = struct.unpack_from("<II", data, i + 8 + 20)
    assert (scale, rate) == (40000, 1_000_000)
    assert rate / scale == 25.0


def test_sample_frames_mid_stream_bad_frame_rolls_back(spark):
    """A frame that passes the SOI check but fails JPEG decode must
    yield ONE decode_error row for the doc — never a mix of ok rows
    and an error row with contradictory n_frames.  Frame 2 (a sampled
    index at stride=2) keeps its SOI but loses its entropy stream, so
    the container parse passes and frame 0 decodes first."""
    _, _, _, frames = avi.parse_avi(avi.synth_avi_bytes(7))
    broken = frames[2][:2] + b"\x00" * (len(frames[2]) - 2)
    data = avi.encode_mjpeg_avi([frames[0], frames[1], broken], 16, 16)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "doc_id long, payload binary")
    got = multimodal.sample_frames(df, stride=2).collect()
    assert len(got) == 1
    assert got[0]["frame_digest"].startswith("decode_error:")
    assert got[0]["n_frames"] is None


def test_avi_frame_features_mid_stream_bad_frame_rolls_back(spark):
    _, _, _, frames = avi.parse_avi(avi.synth_avi_bytes(7))
    broken = frames[2][:2] + b"\x00" * (len(frames[2]) - 2)
    data = avi.encode_mjpeg_avi([frames[0], frames[1], broken], 16, 16)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "doc_id long, payload binary")
    got = multimodal.avi_frame_features(df, stride=2).collect()
    assert len(got) == 1
    assert got[0]["frame_status"].startswith("frame_error:")
