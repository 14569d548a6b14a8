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


# --- paragraph-level exact dedup ------------------------------------------------


def _py_paras(rows):
    """Reference for drop_duplicate_paragraphs in plain dicts."""
    owner = {}
    for i, t in sorted(rows):
        for idx, p in enumerate(t.split("\n")):
            if p.strip() == "":
                continue
            owner.setdefault(p, (i, idx))
    out = {}
    for i, t in rows:
        ps = t.split("\n")
        kept = [p for idx, p in enumerate(ps)
                if p.strip() == "" or owner[p] == (i, idx)]
        out[i] = (len(ps), len(kept), "\n".join(kept))
    return out


def _run_paras(spark, rows):
    from cdx_writer_spark.functions import dedup

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
            for r in dedup.drop_duplicate_paragraphs(docs).collect()}


def test_paragraph_dedup_first_occurrence_wins(spark):
    rows = [
        (1, "unique one\nshared footer\nunique two"),
        (2, "other text\nshared footer"),
        (3, "shared footer\nmore text"),
    ]
    got = _run_paras(spark, rows)
    assert got == _py_paras(rows)
    assert got[1] == (3, 3, "unique one\nshared footer\nunique two")
    assert got[2] == (2, 1, "other text")
    assert got[3] == (2, 1, "more text")


def test_paragraph_dedup_blank_lines_are_exempt(spark):
    rows = [(1, "a\n\nb"), (2, "c\n\nd"), (3, "  \na")]
    got = _run_paras(spark, rows)
    assert got == _py_paras(rows)
    # every blank/whitespace-only line survives everywhere
    assert got[1] == (3, 3, "a\n\nb")
    assert got[2] == (3, 3, "c\n\nd")
    assert got[3] == (2, 1, "  ")      # 'a' owned by doc 1


def test_paragraph_dedup_within_doc_repeats(spark):
    rows = [(5, "x\nx\nx\ny")]
    got = _run_paras(spark, rows)
    assert got == _py_paras(rows)
    assert got[5] == (4, 2, "x\ny")


def test_paragraph_dedup_fully_duplicate_doc_empties(spark):
    rows = [(1, "only para"), (2, "only para")]
    got = _run_paras(spark, rows)
    assert got == _py_paras(rows)
    assert got[2] == (1, 0, "")


def test_paragraph_dedup_partitioning_invariance(spark):
    from cdx_writer_spark.functions import dedup

    import random
    rng = random.Random(61)
    blocks = [f"para {i}" for i in range(8)]
    rows = [(i, "\n".join(rng.choice(blocks)
                          for _ in range(rng.randrange(1, 6))))
            for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.drop_duplicate_paragraphs(
        docs.repartition(1)).collect()))
    b = sorted(map(tuple, dedup.drop_duplicate_paragraphs(
        docs.repartition(16, "doc_id")).collect()))
    assert a == b
    assert {t[0]: t[1:] for t in a} == {
        k: v for k, v in _py_paras(rows).items()}
