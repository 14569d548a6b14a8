"""From-scratch URL-frontier + fetch scheduler (north rule).

No reference counterpart in openAccess/CDX-Writer (the reference is a
single-file CDX indexer); this package is designed first-principles on
Spark per SURVEY.md §7.2.8:

* :mod:`bloom`       — vectorized double-hashing Bloom filter blobs
* :mod:`seen`        — partitioned URL-seen set: Bloom fast path +
                       exact anti-join ground truth, checkpointed
* :mod:`politeness`  — robots.txt rule cache + per-host fetch budgets
* :mod:`priority`    — deterministic (host_rank, depth, surt) frontier
                       ordering with per-host top-k selection
* :mod:`webgraph`    — deterministic synthetic web for tests/benches
* :mod:`loop`        — batch crawl rounds with resumable parquet
                       checkpoints and per-partition lineage metrics
"""
