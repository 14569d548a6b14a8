"""PII detection + scrubbing for training corpora.

The standard redaction pass a web-text pipeline runs before training:
emails, US-style phone numbers, SSN-shaped ids and IPv4 literals are
replaced with typed placeholder tokens, and per-document detection
counts are emitted for auditing/routing (documents over a PII budget
are usually dropped instead of scrubbed).

Regex discipline (same rule as ``functions/extract.py``): patterns are
restricted to the Java-regex/RE2 common subset so the DuckDB oracle
runs the IDENTICAL pattern strings — explicit ASCII classes only,
never ``\\s`` (unicode semantics differ between engines); ``\\b`` is
safe HERE because both Java (default, no UNICODE_CHARACTER_CLASS) and
RE2 define it over ASCII word characters.

Semantics: the four counts are measured on the RAW text, one pattern
at a time; the scrub applies the replacements sequentially in the
documented order (email → ssn → phone → ipv4).  A span matching two
patterns is counted by both but scrubbed by the first — counts answer
"what did the detectors see", the text answers "what survives".

Scale shape: one native projection per row — 8 regex evaluations
(4 counts on raw text + 4 sequential replaces, each replace consumed
exactly once so Catalyst cannot duplicate the chain), zero Python,
zero shuffles, fully pipelined into whatever stage consumes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: (name, pattern, placeholder) — the scrub applies top-down
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn",
     "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
     "<SSN>"),
    ("phone",
     "(\\+[0-9]{1,2}[- ])?\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b",
     "<PHONE>"),
    ("ipv4",
     "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
     "<IP>"),
)


def pii_counts(text: Column) -> list[Column]:
    """Per-pattern detection counts on the raw text, aliased
    ``n_<name>``."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        .cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def scrub_col(text: Column) -> Column:
    """The sequentially-scrubbed text (email → ssn → phone → ipv4)."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """One row per document: ``(id, clean_text, n_email, n_ssn,
    n_phone, n_ipv4)``."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        scrub_col(t).alias("clean_text"),
        *pii_counts(t),
    )
