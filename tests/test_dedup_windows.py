"""Overlapping-window duplicate-substring removal: hand-built ground
truth for the owner/coverage rule."""
from __future__ import annotations

from cdx_writer_spark.functions import dedup


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.drop_duplicate_windows(df, k=k)
    return {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_kept"])
            for r in out.collect()}


def test_verbatim_repost_vanishes_entirely(spark):
    text = " ".join(f"w{i}" for i in range(12))
    got = _run(spark, [(1, text), (2, text)], k=4)
    assert got[1] == (text, 12, 12)      # first occurrence untouched
    assert got[2] == ("", 12, 0)         # re-post fully removed


def test_embedded_duplicate_run_removed_boundary_words_survive(spark):
    # doc 2 embeds doc 1's words a0..a7 between unique u/v words; with
    # k=4 the copied interior words are covered ONLY by loser windows,
    # while the junction words ride straddling unique windows
    a = ["a%d" % i for i in range(8)]
    doc1 = " ".join(a)
    doc2 = " ".join(["u0", "u1", "u2"] + a + ["v0", "v1", "v2"])
    got = _run(spark, [(1, doc1), (2, doc2)], k=4)
    assert got[1] == (doc1, 8, 8)
    clean2, n_words2, n_kept2 = got[2]
    assert n_words2 == 14
    kept_words = clean2.split(" ")
    # all unique words survive
    for w in ["u0", "u1", "u2", "v0", "v1", "v2"]:
        assert w in kept_words
    # the copied run's interior is gone: words covered only by
    # loser windows are a3 and a4 (a0-a2 ride windows starting in u*,
    # a5-a7 ride windows ending in v*)
    for w in ["a3", "a4"]:
        assert w not in kept_words
    for w in ["a0", "a1", "a2", "a5", "a6", "a7"]:
        assert w in kept_words


def test_unique_document_untouched(spark):
    text = " ".join(f"x{i}" for i in range(20))
    got = _run(spark, [(1, text)], k=10)
    assert got[1] == (text, 20, 20)


def test_short_doc_whole_text_window(spark):
    got = _run(spark, [(1, "tiny doc"), (2, "tiny doc"),
                       (3, "other one")], k=10)
    assert got[1] == ("tiny doc", 2, 2)
    assert got[2] == ("", 2, 0)
    assert got[3] == ("other one", 2, 2)


def test_within_document_repeat_keeps_first_occurrence(spark):
    # the same 4 words repeated back-to-back within one doc: the
    # second copy's interior loses to the first (global min includes
    # position)
    text = "p q r s p q r s"
    got = _run(spark, [(1, text)], k=4)
    clean, n_words, n_kept = got[1]
    assert n_words == 8
    # first copy fully owned; second copy's words are covered by the
    # straddling windows "q r s p", "r s p q", "s p q r" (positions
    # 2-4), all of which are FIRST occurrences of their texts ->
    # everything up to position 7 is covered; only the final 's' (pos
    # 8, covered solely by the losing "p q r s" at pos 5) drops
    assert clean == "p q r s p q r"
    assert n_kept == 7


def test_alignment_independence_vs_spans(spark):
    """The case fixed chunks miss: a duplicated run that is NOT
    aligned to a k boundary is still caught."""
    a = ["d%d" % i for i in range(6)]
    doc1 = " ".join(a)
    # one word of unique prefix shifts the copy off any k-alignment
    doc2 = " ".join(["z0"] + a + ["z1"])
    got = _run(spark, [(1, doc1), (2, doc2)], k=3)
    clean2 = got[2][0].split(" ")
    assert "d2" not in clean2 and "d3" not in clean2
    assert "z0" in clean2 and "z1" in clean2
