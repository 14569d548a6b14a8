"""Text-analysis operators over a document table — all native Catalyst
(whole-stage codegen; no Python in the hot path).

Each op is a Column factory so pipelines compose with select/withColumn
and Catalyst prunes what a query doesn't use.  Formulas are deliberately
SQL-expressible so the DuckDB oracle can reproduce them exactly
(`__spark_entry__.oracle_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = r"\s+"

# tiny marker vocabularies for the n-gram-free language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "fr": ("le", "la", "les", "et", "des", "un", "est"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (empty string -> [''], matching
    DuckDB's string_split_regex for oracle parity)."""
    return F.split(F.trim(text), _WS)


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def punct_ratio_col(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-whitespace characters."""
    stripped = F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    return F.round(
        (F.length(text) - F.length(stripped)).cast("double")
        / F.greatest(F.length(text), F.lit(1)), 6)


def stopword_ratio_col(text: Column, stopwords: tuple[str, ...] =
                       LANG_MARKERS["en"]) -> Column:
    toks = tokens_col(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.round(hits.cast("double") / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score_col(text: Column) -> Column:
    """Composite document-quality score in [0,1]: length signal +
    cleanliness + stopword naturalness (the shape of C4/Gopher-style
    heuristic filters, reduced to SQL-expressible terms)."""
    length_sig = F.least(F.lit(1.0), token_count_col(text) / F.lit(100.0))
    clean_sig = F.lit(1.0) - punct_ratio_col(text)
    stop_sig = F.least(F.lit(1.0), stopword_ratio_col(text) * F.lit(5.0))
    return F.round(0.4 * length_sig + 0.3 * clean_sig + 0.3 * stop_sig, 4)


def lang_votes_col(text: Column, lang: str) -> Column:
    toks = tokens_col(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def lang_id_col(text: Column) -> Column:
    """Marker-token language vote with deterministic tie order
    en > fr > de, 'und' when no marker hits."""
    en, fr, de = (lang_votes_col(text, l) for l in ("en", "fr", "de"))
    return (
        F.when((en >= fr) & (en >= de) & (en > 0), F.lit("en"))
        .when((fr >= de) & (fr > 0), F.lit("fr"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


# GPT-2-style pre-tokenizer shape, reduced to a regex both engines
# implement identically: letter runs, digit runs, single
# non-alphanumeric non-space marks.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish token count (the LLM-pipeline 'how many tokens is this
    document' estimator): counts letter runs + digit runs + individual
    punctuation marks — the shape of a byte-pair-encoding
    pre-tokenizer, without a vocab.  Native regexp_count, zero Python;
    DuckDB re-derives it with regexp_extract_all."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def normalized_text_col(text: Column) -> Column:
    """Dedup normalization: lowercase, strip non-alphanumerics,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, _WS, " ")
    return F.trim(t)


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (md5 exists in
    both engines; the rolling/simhash variants live in dedup.py)."""
    return F.md5(normalized_text_col(text))
