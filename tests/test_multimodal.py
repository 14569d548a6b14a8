"""Multimodal mapInPandas plumbing: decode, resize, frame sampling.

The decode/resize/frame kernels are the stubbed integration points for
libraries absent from this container (PIL/cv2/ffmpeg); the fake paths
are deterministic hash chains, so these tests pin the *plumbing*
contract — schemas, null handling, 1->N fan-out, and invariance under
repartitioning — which is exactly what survives when a real kernel is
dropped in.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cdx_writer_spark.functions import multimodal


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(i, f"payload body {i}".encode()) for i in range(20)]
    rows.append((99, None))
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_resize_deterministic_and_oracle_chain(spark, payloads):
    out = {r.doc_id: r for r in multimodal.resize_images(
        payloads, width=64, height=64, fake_resize=True).collect()}
    assert len(out) == 21
    # digest chain recomputed independently
    dg = hashlib.sha256(b"payload body 3").hexdigest()
    want = hashlib.md5((dg + "@64x64").encode()).hexdigest()
    r = out[3]
    assert (r.resized_digest, r.out_width, r.resized_bytes,
            r.resize_status) == (want, 64, 64 * 64 * 3, "ok_fake")
    n = out[99]
    assert n.resize_status == "null_payload" and n.resized_digest is None


def test_frame_sample_fanout_and_chain(spark, payloads):
    rows = multimodal.sample_frames(
        payloads, stride=4, fake_decode=True).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # null payload -> exactly one null row (no silent drop)
    assert len(by_doc[99]) == 1 and by_doc[99][0].n_frames is None
    for doc_id in range(20):
        d = hashlib.sha256(f"payload body {doc_id}".encode())
        n_frames = 8 + d.digest()[2] % 25
        frames = sorted(by_doc[doc_id], key=lambda r: r.frame_index)
        # every 4th frame, all carrying the doc's frame count
        assert [r.frame_index for r in frames] == list(
            range(0, n_frames, 4))
        assert {r.n_frames for r in frames} == {n_frames}
        fd = hashlib.md5(f"{d.hexdigest()}:4".encode()).hexdigest()
        assert frames[1].frame_digest == fd
        assert frames[1].frame_luma_x256 == int(fd[:2], 16)


def test_frame_sample_invariant_under_partitioning(spark, payloads):
    def run(df):
        return sorted(
            (r.doc_id, r.frame_index, r.frame_digest)
            for r in multimodal.sample_frames(
                df, stride=4, fake_decode=True).collect())

    assert run(payloads.repartition(1)) == run(payloads.repartition(7))


def test_unsupported_formats_get_status_rows_not_raises(spark, payloads):
    """Without the fake flag an off-format payload (these fixtures are
    not PNG/GIF/JPEG/BMP) must yield a per-row unsupported_format
    status — never abort the batch (one WebP in a mixed 100 TB scan
    must not kill the job) and never silently fall back to the fake
    path."""
    rz = {r.doc_id: r for r in
          multimodal.resize_images(payloads).collect()}
    assert rz[3].resize_status == "unsupported_format"
    assert rz[3].resized_digest is None
    assert rz[99].resize_status == "null_payload"
    fr = {r.doc_id: r for r in
          multimodal.sample_frames(payloads).collect()}
    assert fr[3].frame_digest == "unsupported_format"
    assert fr[3].n_frames is None
    dc = {r.doc_id: r for r in
          multimodal.decode_images(payloads).collect()}
    assert dc[3].decode_status == "unsupported_format"
    assert dc[3].features is None
