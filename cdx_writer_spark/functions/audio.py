"""Audio column ops: real WAV decode + feature extraction, stdlib-only.

Like :mod:`.png`, the audio tier needs no external library for its
bread-and-butter container: PCM WAV is RIFF framing (``struct``) around
raw samples, and the stdlib ``wave`` module parses it.  The kernel
extracts per-payload features over ``mapInPandas`` (Arrow batches, no
per-row Python in the driver path):

* container metadata — channels, sample rate, sample width, frame
  count, duration;
* signal features — peak amplitude and the SUM OF SQUARES of the
  samples.  Deliberately integers: ``sum_sq``/``n`` carry exactly the
  information of RMS (rms = sqrt(sum_sq / n)) but are EXACT int64s, so
  a cross-engine oracle can recompute them bit-for-bit with integer
  arithmetic — no float-rounding ambiguity crosses the engine boundary
  (same trick as the dyadic-rational image features).

Non-WAV payloads yield a per-row ``decode_error:*`` status (a corrupt
byte string must never abort a 100 TB scan); compressed WAV variants
(non-PCM) are reported, not crashed on.

``synth_wav_bytes`` is the deterministic fixture generator: a doc_id-
seeded integer waveform whose features the DuckDB oracle re-derives
from the generation rule alone (if the parser mis-read any RIFF offset
or sample byte, the values could not match).
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("sample_width", IntegerType()),
    StructField("n_frames", LongType()),
    StructField("duration_ms", LongType()),
    StructField("peak", IntegerType()),
    StructField("sum_sq", LongType()),
    StructField("decode_status", StringType()),
])


def synth_wav_bytes(doc_id: int, sample_rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV for fixtures/oracles:
    ``n = 64 + doc_id % 129`` samples, sample i =
    ``(doc_id * 31 + i * 17) % 2048 - 1024`` — pure integer
    arithmetic a SQL oracle reproduces exactly."""
    n = 64 + doc_id % 129
    samples = [(doc_id * 31 + i * 17) % 2048 - 1024 for i in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def _wav_samples(data: bytes):
    """``wav bytes -> (channels, rate, width, n_frames, samples)``
    with ``n_frames`` the DECLARED header frame count and ``samples``
    the interleaved int list actually present."""
    with wave.open(io.BytesIO(data), "rb") as w:
        ch = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    elif width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = [b - 128 for b in raw]
    else:
        raise ValueError(f"unsupported sample width {width}")
    return ch, rate, width, n, samples


def _decode_wav(data: bytes):
    ch, rate, width, n, samples = _wav_samples(data)
    peak = max((abs(s) for s in samples), default=0)
    sum_sq = sum(s * s for s in samples)
    return ch, rate, width, n, peak, sum_sq


def audio_features(df: DataFrame, bin_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """WAV metadata + integer signal features per payload, Arrow-
    batched over ``mapInPandas`` (1 row -> 1 row; NULL payloads and
    malformed bytes yield status rows, never batch failures)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                out["doc_id"].append(doc_id)
                if payload is None:
                    for k in ("channels", "sample_rate", "sample_width",
                              "n_frames", "duration_ms", "peak", "sum_sq"):
                        out[k].append(None)
                    out["decode_status"].append("null_payload")
                    continue
                try:
                    ch, rate, width, n, peak, sum_sq = _decode_wav(
                        bytes(payload))
                    out["channels"].append(ch)
                    out["sample_rate"].append(rate)
                    out["sample_width"].append(width)
                    out["n_frames"].append(n)
                    out["duration_ms"].append(n * 1000 // rate)
                    out["peak"].append(peak)
                    out["sum_sq"].append(sum_sq)
                    out["decode_status"].append("ok_wav")
                except Exception as e:  # wave.Error, EOFError, struct...
                    for k in ("channels", "sample_rate", "sample_width",
                              "n_frames", "duration_ms", "peak", "sum_sq"):
                        out[k].append(None)
                    out["decode_status"].append(
                        f"decode_error:{type(e).__name__}")
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_FINGERPRINT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("frame_len", IntegerType()),
    StructField("fingerprint_bits", StringType()),
    StructField("decode_status", StringType()),
])


def audio_fingerprint(df: DataFrame, bin_col: str = "payload",
                      id_col: str = "doc_id",
                      n_frames: int = 65) -> DataFrame:
    """Chromaprint-style energy-delta fingerprint over REAL decoded
    WAV payloads — the audio-side near-dup signature that feeds the
    SAME generic pair engine as the image tier
    (:func:`cdx_writer_spark.functions.dedup.bits_near_pairs`): a
    re-encoded or uniformly amplitude-scaled copy fingerprints
    identically from different bytes (energy scales by c^2 in every
    frame, so adjacent-frame comparisons are invariant), while exact
    digests all differ.

    Integer-exact variant: the sample stream splits into ``n_frames``
    fixed frames of ``len(samples) // n_frames`` samples (the tail
    remainder is dropped; interleaved channels are fingerprinted as
    one stream), each frame's value is the exact int64 SUM OF SQUARES,
    and ``bit(f) = energy(f) > energy(f+1)`` — ``n_frames - 1`` bits
    (64 at the 65-frame default), MSB-first as a portable '0'/'1'
    string.  Payloads with fewer than ``n_frames`` samples surface as
    per-row ``too_short``; malformed bytes as ``decode_error:*``.

    Output: ``(doc_id, n_samples, frame_len, fingerprint_bits,
    decode_status)``."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        def err_row(doc_id, status):
            out["doc_id"].append(doc_id)
            out["n_samples"].append(None)
            out["frame_len"].append(None)
            out["fingerprint_bits"].append(None)
            out["decode_status"].append(status)

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "frame_len": [],
                   "fingerprint_bits": [], "decode_status": []}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    err_row(doc_id, "null_payload")
                    continue
                try:
                    _, _, _, _, samples = _wav_samples(bytes(payload))
                except Exception as e:
                    err_row(doc_id, f"decode_error:{type(e).__name__}")
                    continue
                frame_len = len(samples) // n_frames
                if frame_len == 0:
                    err_row(doc_id, "too_short")
                    continue
                energies = [
                    sum(s * s
                        for s in samples[f * frame_len:(f + 1) * frame_len])
                    for f in range(n_frames)]
                bits = "".join(
                    "1" if energies[f] > energies[f + 1] else "0"
                    for f in range(n_frames - 1))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(samples))
                out["frame_len"].append(frame_len)
                out["fingerprint_bits"].append(bits)
                out["decode_status"].append("ok_wav")
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        kernel, schema=AUDIO_FINGERPRINT_SCHEMA)
