"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns; decode/feature ops run
as Arrow-batched functions over ``mapInPandas``.  The decode libraries
(PIL/ffmpeg/etc.) are NOT in this container, so the decode kernel is a
STUB — `decode_images` raises NotImplementedError unless
``fake_decode=True``, which substitutes a deterministic hash-derived
decode so the Spark-side plumbing (schema, batching, partitioning, UDF
signature) is real and tested end-to-end.
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

    Real decode requires PIL/cv2 (absent here): without `fake_decode`
    each batch raises NotImplementedError at the decode kernel, which is
    the clearly-marked integration point.  With `fake_decode=True` a
    deterministic stand-in derives (width, height, features) from the
    payload's sha256 — stable across runs/partitionings, so the pipeline
    shape (schema, batch iteration, column pruning) is fully testable,
    AND independently recomputable by an ANSI-SQL oracle (DuckDB has
    sha256; feature values are exact dyadic rationals byte/256, so no
    float-rounding ambiguity crosses the engine boundary).
    """

    def kernel(batches: Iterator) -> Iterator:
        import hashlib
        import pandas as pd

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
                    try:
                        import PIL  # noqa: F401
                    except ImportError:
                        raise NotImplementedError(
                            "image decode requires PIL/cv2, absent in this "
                            "environment; pass fake_decode=True for the "
                            "deterministic test double")
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
