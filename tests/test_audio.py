"""Real WAV audio kernel: stdlib decode, exact-integer features.

The synth fixture round-trips through a REAL parse (stdlib ``wave``
reads the RIFF container the generator wrote), and the features are
checked against values computed independently here from first
principles — plus hand-built 8-bit and stereo WAVs, malformed bytes,
non-WAV payloads and NULLs (per-row statuses, never batch failures).
"""

from __future__ import annotations

import io
import struct
import wave

from cdx_writer_spark.functions import audio


def _expected(doc_id: int):
    n = 64 + doc_id % 129
    xs = [(doc_id * 31 + i * 17) % 2048 - 1024 for i in range(n)]
    return n, max(abs(x) for x in xs), sum(x * x for x in xs)


def test_synth_wav_decodes_to_generation_rule():
    for doc_id in (0, 1, 7, 128, 129, 1000003):
        ch, rate, width, n, peak, sum_sq = audio._decode_wav(
            audio.synth_wav_bytes(doc_id))
        en, epeak, esum = _expected(doc_id)
        assert (ch, rate, width) == (1, 8000, 2)
        assert (n, peak, sum_sq) == (en, epeak, esum)


def test_decode_wav_8bit_and_stereo():
    # 8-bit unsigned, centered at 128: bytes [128, 130, 125] -> samples
    # [0, 2, -3] -> peak 3, sum_sq 13
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(4000)
        w.writeframes(bytes([128, 130, 125]))
    ch, rate, width, n, peak, sum_sq = audio._decode_wav(buf.getvalue())
    assert (ch, rate, width, n, peak, sum_sq) == (1, 4000, 1, 3, 3, 13)
    # stereo 16-bit: frames [(1, -2), (3, 4)] -> 2 frames, 4 samples
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 1, -2, 3, 4))
    ch, rate, width, n, peak, sum_sq = audio._decode_wav(buf2.getvalue())
    assert (ch, n) == (2, 2)
    assert (peak, sum_sq) == (4, 1 + 4 + 9 + 16)


def test_audio_features_spark(spark):
    rows = [(i, audio.synth_wav_bytes(i)) for i in range(8)]
    rows += [(50, b"RIFFgarbage-not-a-wav"), (51, b"\xff\xd8\xff"),
             (99, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in audio.audio_features(df).collect()}
    assert len(out) == 11
    for i in range(8):
        en, epeak, esum = _expected(i)
        r = out[i]
        assert (r.channels, r.sample_rate, r.sample_width) == (1, 8000, 2)
        assert (r.n_frames, r.peak, r.sum_sq) == (en, epeak, esum)
        assert r.duration_ms == en * 1000 // 8000
        assert r.decode_status == "ok_wav"
    assert out[50].decode_status.startswith("decode_error:")
    assert out[51].decode_status.startswith("decode_error:")
    assert out[51].peak is None
    assert out[99].decode_status == "null_payload"
