"""cdx_writer_spark — a PySpark-native web-archive indexing + crawl-frontier engine.

A from-scratch rebuild of the capabilities of openAccess/CDX-Writer
(reference snapshot at /root/reference, cited as ``cdx_writer.py:LINE``)
re-expressed Spark-first:

* columnar DataFrame pipeline (Catalyst-optimized) instead of the
  reference's per-row Python loop (``cdx_writer.py:820-855``);
* three Arrow-vectorized pandas UDFs for the only non-SQL-expressible
  scalar ops (SURT canonicalization, SHA-1/base32 digests, HTML meta-tag
  robots flags);
* a URL-frontier scheduler (Bloom seen-set, per-host politeness,
  priority queue) designed for 10^10-URL scale (north rule; no
  reference counterpart).
"""

__version__ = "0.1.0"
