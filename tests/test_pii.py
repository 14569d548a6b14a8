"""PII scrub: planted-PII ground truth + engine-subset discipline."""
from __future__ import annotations

import re

from cdx_writer_spark.functions import pii


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in pii.scrub_pii(df).collect()}


def test_each_pattern_scrubs_and_counts(spark):
    got = _run(spark, [
        (1, "mail a.b+c%d@sub.example.org or x@y.io today"),
        (2, "ssn 123-45-6789 ok"),
        (3, "call 555-123-4567 or +1 555-987-6543"),
        (4, "from 192.168.1.77 port 80"),
        (5, "nothing here"),
    ])
    assert got[1]["clean_text"] == "mail <EMAIL> or <EMAIL> today"
    assert got[1]["n_email"] == 2 and got[1]["n_phone"] == 0
    assert got[2]["clean_text"] == "ssn <SSN> ok"
    assert got[2]["n_ssn"] == 1
    assert got[3]["clean_text"] == "call <PHONE> or <PHONE>"
    assert got[3]["n_phone"] == 2
    assert got[4]["clean_text"] == "from <IP> port 80"
    assert got[4]["n_ipv4"] == 1
    assert got[5]["clean_text"] == "nothing here"
    assert all(got[5][k] == 0
               for k in ("n_email", "n_ssn", "n_phone", "n_ipv4"))


def test_boundaries_hold(spark):
    got = _run(spark, [
        # longer digit runs must not match ssn/ip via partial spans
        (1, "id 1234-56-78901 is not an ssn"),
        (2, "ver 1.2.3.4.5 is a version"),  # \b allows the 1.2.3.4 span
        (3, "x123-45-6789 tail"),           # leading \b blocked by 'x'? no: x|1 IS a boundary... digits after letters are word chars
    ])
    assert got[1]["n_ssn"] == 0
    # 1.2.3.4 inside 1.2.3.4.5: the trailing \b sits between '4' and
    # '.', so the span matches — documented detector behavior
    assert got[2]["n_ipv4"] == 1
    # 'x' and '1' are both word chars: no boundary, no match
    assert got[3]["n_ssn"] == 0


def test_counts_are_raw_text_scrub_is_sequential(spark):
    # an email whose local part contains an ssn-shaped id: both
    # detectors count it, the email scrub consumes it first
    got = _run(spark, [(1, "report 123-45-6789@example.com sent")])
    assert got[1]["n_email"] == 1
    assert got[1]["n_ssn"] == 1
    assert got[1]["clean_text"] == "report <EMAIL> sent"


def test_patterns_are_engine_subset_clean():
    """The module's own regex discipline: no \\s, no \\d/\\w shorthand
    (unicode semantics differ across engines), and every pattern
    compiles under Python re (a proxy for well-formedness)."""
    for name, pat, _ in pii.PII_PATTERNS:
        assert "\\s" not in pat and "\\d" not in pat and "\\w" not in pat
        re.compile(pat)
