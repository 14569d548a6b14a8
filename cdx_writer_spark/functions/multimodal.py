"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns; decode/feature ops run
as Arrow-batched functions over ``mapInPandas``.

PNG payloads decode/resize FOR REAL via the pure-stdlib codec in
:mod:`.png` (zlib + struct — no image library needed); malformed PNGs
yield a per-row ``decode_error:*`` status rather than aborting the
batch.  Every other format (JPEG/GIF/video) needs PIL/ffmpeg, which are
NOT in this container, so those rows are the clearly-marked
NotImplementedError integration point — unless ``fake_decode=True``,
which substitutes a deterministic hash-derived decode so the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is testable
and independently recomputable by the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)

# magic-byte sniffing (native; no Python)
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FFE0": "image/jpeg",
    "FFD8FFE1": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "riff",  # wav/webp container
    "1A45DFA3": "video/webm",
}


def sniff_mime_col(bin_col: F.Column) -> F.Column:
    # when-chain over the magic table (hex of the first 4 bytes)
    expr = None
    for magic, mime in _MAGIC.items():
        cond = F.hex(F.substring(bin_col, 1, 4)) == magic
        expr = F.when(cond, F.lit(mime)) if expr is None else expr.when(
            cond, F.lit(mime))
    return expr.otherwise(F.lit("application/octet-stream"))


def attach_binary_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata columns for an opaque binary column: byte size,
    sniffed mime, content digest prefix (all JVM-side)."""
    c = F.col(bin_col)
    return (
        df.withColumn("payload_bytes", F.octet_length(c).cast("long"))
        .withColumn("payload_mime", sniff_mime_col(c))
        .withColumn("payload_digest", F.sha2(c, 256))
    )


IMAGE_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("features", ArrayType(FloatType())),
    StructField("decode_status", StringType()),
])


def decode_images(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "doc_id", feature_dim: int = 8,
                  fake_decode: bool = False) -> DataFrame:
    """Arrow-batched image decode + feature extraction over mapInPandas.

    PNG payloads decode for real (pure-stdlib codec, :mod:`.png`):
    width/height/channels from IHDR, pixels unfiltered, features =
    per-channel mean+std (see ``png.features_from_pixels``); malformed
    PNGs get a per-row ``decode_error:<PngError reason>`` status.
    Non-PNG formats require PIL/cv2 (absent here): without
    `fake_decode` those rows raise NotImplementedError at the kernel,
    the clearly-marked integration point.  With `fake_decode=True` a
    deterministic stand-in derives (width, height, features) from the
    payload's sha256 — stable across runs/partitionings, so the
    pipeline shape (schema, batch iteration, column pruning) is fully
    testable, AND independently recomputable by an ANSI-SQL oracle
    (DuckDB has sha256; feature values are exact dyadic rationals
    byte/256, so no float-rounding ambiguity crosses the engine
    boundary).
    """

    def kernel(batches: Iterator) -> Iterator:
        import hashlib
        import pandas as pd

        from . import png as pnglib

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_channels": [], "features": [], "decode_status": []}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                out["doc_id"].append(doc_id)
                if payload is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_channels"].append(None)
                    out["features"].append(None)
                    out["decode_status"].append("null_payload")
                    continue
                if not fake_decode:
                    data = bytes(payload)
                    if data.startswith(pnglib.PNG_SIGNATURE):
                        try:
                            w, h, ch, pix = pnglib.decode_png(data)
                            out["width"].append(w)
                            out["height"].append(h)
                            out["n_channels"].append(ch)
                            out["features"].append(
                                pnglib.features_from_pixels(
                                    pix, ch, feature_dim))
                            out["decode_status"].append("ok_png")
                        except pnglib.PngError as e:
                            out["width"].append(None)
                            out["height"].append(None)
                            out["n_channels"].append(None)
                            out["features"].append(None)
                            out["decode_status"].append(
                                f"decode_error:{e}")
                        continue
                    raise NotImplementedError(
                        "non-PNG image decode requires PIL/cv2, absent "
                        "in this environment; pass fake_decode=True for "
                        "the deterministic test double")
                d = hashlib.sha256(bytes(payload)).digest()
                out["width"].append(64 + d[0])
                out["height"].append(64 + d[1])
                out["n_channels"].append(3)
                # byte/256 is exactly representable in binary floating
                # point at any width -> byte-identical across engines
                out["features"].append(
                    [b / 256.0 for b in d[:feature_dim]])
                out["decode_status"].append("ok_fake")
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        kernel, schema=IMAGE_DECODE_SCHEMA)


IMAGE_RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_width", IntegerType()),
    StructField("out_height", IntegerType()),
    StructField("resized_bytes", LongType()),
    StructField("resized_digest", StringType()),
    StructField("resize_status", StringType()),
])


def resize_images(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "doc_id", width: int = 64,
                  height: int = 64, fake_resize: bool = False) -> DataFrame:
    """Arrow-batched image resize over mapInPandas (1 row -> 1 row).

    PNG payloads resize for real: decode (pure-stdlib codec), nearest-
    neighbor resample, deterministic re-encode (fixed zlib level) —
    resized_bytes = encoded PNG size, resized_digest = md5 of the
    encoded PNG.  Non-PNG formats need PIL/cv2 (absent from this
    container), the clearly-marked NotImplementedError integration
    point; ``fake_resize=True`` substitutes a deterministic stand-in —
    resized_digest = md5(sha256(payload) || '@WxH') and resized_bytes =
    W*H*3 (the raw RGB buffer a real resize would produce) — so the
    batching/schema/pruning plumbing is fully testable and the DuckDB
    oracle recomputes every value (both engines hash the same
    lowercase-hex UTF-8 string).
    """

    tag = f"@{width}x{height}"

    def kernel(batches: Iterator) -> Iterator:
        import hashlib
        import pandas as pd

        from . import png as pnglib

        for pdf in batches:
            out = {"doc_id": [], "out_width": [], "out_height": [],
                   "resized_bytes": [], "resized_digest": [],
                   "resize_status": []}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                out["doc_id"].append(doc_id)
                if payload is None:
                    out["out_width"].append(None)
                    out["out_height"].append(None)
                    out["resized_bytes"].append(None)
                    out["resized_digest"].append(None)
                    out["resize_status"].append("null_payload")
                    continue
                if not fake_resize:
                    data = bytes(payload)
                    if data.startswith(pnglib.PNG_SIGNATURE):
                        try:
                            w0, h0, ch, pix = pnglib.decode_png(data)
                            resized = pnglib.resize_nearest(
                                pix, w0, h0, ch, width, height)
                            enc = pnglib.encode_png(
                                width, height, ch, resized)
                            out["out_width"].append(width)
                            out["out_height"].append(height)
                            out["resized_bytes"].append(len(enc))
                            out["resized_digest"].append(
                                hashlib.md5(enc).hexdigest())
                            out["resize_status"].append("ok_png")
                        except pnglib.PngError as e:
                            out["out_width"].append(None)
                            out["out_height"].append(None)
                            out["resized_bytes"].append(None)
                            out["resized_digest"].append(None)
                            out["resize_status"].append(
                                f"decode_error:{e}")
                        continue
                    raise NotImplementedError(
                        "non-PNG image resize requires PIL/cv2, absent "
                        "in this environment; pass fake_resize=True for "
                        "the deterministic test double")
                dg = hashlib.sha256(bytes(payload)).hexdigest()
                out["out_width"].append(width)
                out["out_height"].append(height)
                out["resized_bytes"].append(width * height * 3)
                out["resized_digest"].append(
                    hashlib.md5((dg + tag).encode()).hexdigest())
                out["resize_status"].append("ok_fake")
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        kernel, schema=IMAGE_RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("frame_index", IntegerType()),
    StructField("frame_digest", StringType()),
    StructField("frame_luma_x256", IntegerType()),
])


def sample_frames(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "doc_id", stride: int = 4,
                  fake_decode: bool = False) -> DataFrame:
    """Video frame sampling over mapInPandas — the 1-row -> N-rows batch
    shape (each input payload fans out to every ``stride``-th frame).

    Real frame extraction needs ffmpeg/cv2 (absent here): the kernel is
    the marked NotImplementedError integration point.  With
    ``fake_decode=True`` the frame count and per-frame values derive
    deterministically from the payload digest — n_frames = 8 +
    (sha256 byte 2 mod 25), frame_digest = md5(hex_digest ':' index),
    luma byte = first byte of the frame digest — stable across runs
    and partitionings, and independently recomputable by the DuckDB
    oracle (range + md5 over the same strings).
    """

    def kernel(batches: Iterator) -> Iterator:
        import hashlib
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "frame_index": [],
                   "frame_digest": [], "frame_luma_x256": []}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    out["doc_id"].append(doc_id)
                    out["n_frames"].append(None)
                    out["frame_index"].append(None)
                    out["frame_digest"].append(None)
                    out["frame_luma_x256"].append(None)
                    continue
                if not fake_decode:
                    try:
                        import cv2  # noqa: F401
                    except ImportError:
                        raise NotImplementedError(
                            "frame sampling requires ffmpeg/cv2, absent in "
                            "this environment; pass fake_decode=True for "
                            "the deterministic test double")
                d = hashlib.sha256(bytes(payload))
                hx = d.hexdigest()
                n_frames = 8 + d.digest()[2] % 25
                for i in range(0, n_frames, stride):
                    fd = hashlib.md5(f"{hx}:{i}".encode()).hexdigest()
                    out["doc_id"].append(doc_id)
                    out["n_frames"].append(n_frames)
                    out["frame_index"].append(i)
                    out["frame_digest"].append(fd)
                    out["frame_luma_x256"].append(int(fd[:2], 16))
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        kernel, schema=FRAME_SAMPLE_SCHEMA)
