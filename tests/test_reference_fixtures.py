"""Byte-parity sweep over the reference's ENTIRE small-WARC golden
corpus: every .warc/.arc fixture is read through the distributed
warc_source + CDX pipeline and compared line-for-line with the
reference's expected output, in both --all-records and default modes
(the reference's own two test passes, test_small_warcs.py:108-143).

The expected strings are parsed from the reference's test file at
RUNTIME (skipped when /root/reference is absent) — nothing is copied
into this repo.

No exclusions: 86/86 cases.  (empty_record.arc.gz, historically the
one divergence, is matched by fabricating the ARC payload digest at
parse time with warctools' universal-line-ending boundary — see
warc_source.parse_arc_record.)
"""

from __future__ import annotations

import ast
import os
import re
import shutil

import pytest

from cdx_writer_spark import warc_source
from cdx_writer_spark.job import CDXConfig, cdx_lines

REF_TESTS = "/root/reference/tests/test_small_warcs.py"
REF_WARCS = "/root/reference/tests/small_warcs"



def _expected_maps():
    src = open(REF_TESTS, "rb").read().decode("latin1")

    def extract(dictname):
        m = re.search(dictname + r"\s*=\s*\{(.*?)\n\}", src, re.S)
        out = {}
        for mm in re.finditer(r"'([^']+)':\s*(b'(?:[^'\\]|\\.)*')",
                              m.group(1), re.S):
            out[mm.group(1)] = ast.literal_eval(mm.group(2))
        return out

    return extract("warcs_all_records"), extract("warcs_defaults")


@pytest.mark.skipif(not os.path.exists(REF_TESTS),
                    reason="reference corpus not present")
@pytest.mark.parametrize("all_records", [True, False],
                         ids=["all_records", "default"])
def test_reference_corpus_parity(spark, tmp_path, all_records):
    all_rec, defaults = _expected_maps()
    expmap = all_rec if all_records else defaults
    names = [n for n in sorted(expmap)
             if os.path.exists(os.path.join(REF_WARCS, n))]
    assert len(names) >= 40
    d = tmp_path / "corpus"
    d.mkdir()
    for n in names:
        shutil.copy(os.path.join(REF_WARCS, n), d / n)

    # ONE distributed pass over the whole corpus; lines regroup by the
    # g field (file name), order within a file by the V field (offset)
    pages = warc_source.read_warc(spark, str(d))
    rows = (cdx_lines(pages, CDXConfig(all_records=all_records),
                      sort=False)
            .collect())
    by_file: dict[str, list[str]] = {}
    for r in rows:
        by_file.setdefault(r.cdx_line.rsplit(" ", 1)[1],
                           []).append(r.cdx_line)

    failures = []
    for n in names:
        expected = expmap[n].decode("latin1").rstrip("\n").split("\n")[1:]
        got = by_file.get(n, [])
        if got != expected:
            failures.append((n, got[:1], expected[:1]))
    assert not failures, (
        f"{len(failures)}/{len(names)} fixtures diverge; first: "
        f"{failures[0]}")
