"""Test-set decontamination: planted-overlap ground truth."""
from __future__ import annotations

from pyspark.sql import functions as F

from cdx_writer_spark.functions import decontam


def _run(spark, corpus_rows, test_rows, n):
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    test = spark.createDataFrame(test_rows, "doc_id long, text string")
    banned = decontam.banned_ngram_digests(test, n=n)
    out = decontam.decontaminate(corpus, banned, n=n)
    return {r["doc_id"]: (r["n_hits"], r["contaminated"])
            for r in out.collect()}


def test_planted_ngram_overlap(spark):
    eval_text = "alpha bravo charlie delta echo"
    rows = [
        # doc 1 contains the eval 3-gram "bravo charlie delta"
        (1, "zz bravo charlie delta yy"),
        # doc 2 shares no 3-gram
        (2, "alpha charlie bravo delta echo foxtrot"),
        # doc 3 repeats a banned 3-gram twice -> still ONE distinct hit
        (3, "alpha bravo charlie x alpha bravo charlie"),
    ]
    got = _run(spark, rows, [(100, eval_text)], n=3)
    assert got == {1: (1, True), 2: (0, False), 3: (1, True)}


def test_short_docs_fall_back_to_whole_text(spark):
    # both sides shorter than n: whole text is the single n-gram
    got = _run(spark, [(1, "tiny doc"), (2, "other doc")],
               [(100, "tiny doc")], n=13)
    assert got == {1: (1, True), 2: (0, False)}


def test_multiple_distinct_hits_counted(spark):
    got = _run(spark, [(1, "a b c d e")], [(100, "a b c d")], n=2)
    # corpus 2-grams: ab bc cd de; banned: ab bc cd -> 3 distinct hits
    assert got == {1: (3, True)}


def test_empty_test_set(spark):
    test = spark.createDataFrame([], "doc_id long, text string")
    banned = decontam.banned_ngram_digests(test, n=3)
    corpus = spark.createDataFrame([(1, "a b c d")],
                                   "doc_id long, text string")
    out = decontam.decontaminate(corpus, banned, n=3)
    assert [(r["n_hits"], r["contaminated"]) for r in out.collect()] \
        == [(0, False)]


def test_no_forced_broadcast_hint(spark):
    """The banned-set join must stay un-hinted: AQE may still choose a
    broadcast from runtime bytes, but the logical plan carries no
    user hint (the unbounded-broadcast scale bug class)."""
    test = spark.createDataFrame([(100, "a b c")],
                                 "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "a b c d")],
                                   "doc_id long, text string")
    banned = decontam.banned_ngram_digests(test, n=3)
    out = decontam.decontaminate(corpus, banned, n=3)
    assert "UnresolvedHint" not in out._jdf.queryExecution().logical() \
        .toString()
    assert "hints=" not in out._jdf.queryExecution().analyzed().toString()
