"""Partitioned URL-seen set: Bloom fast path + exact ground truth.

Semantics (exact, by construction): a URL is *seen* once it has ever
been enqueued into the frontier (seed or discovered outlink).  The
authoritative seen-set is a parquet/Iceberg table of SURT keys hash-
partitioned by ``pmod(xxhash64(surt_key), P)``; each partition also
maintains a :class:`~.bloom.BloomFilter` blob checkpointed alongside.

Probe flow for a batch of discovered candidates:

1. JVM-side: compute ``(pid, h1, h2)`` columns (xxhash64 — no Python).
2. ``flag_maybe_seen`` flags each candidate — by default with a
   PURE-CATALYST probe (broadcast the filters' int64 word arrays,
   ``element_at`` + ``shiftright`` bit tests; no Python, no shuffle),
   falling back to a pandas-UDF blob probe or a per-pid cogroup at
   filter-state sizes past the broadcast budget → boolean
   ``maybe_seen``.  Definitely-new rows (the vast majority in a
   growing crawl) **skip the anti-join shuffle entirely**.
3. Only the maybe-seen minority anti-joins the exact seen table
   (co-partitioned on pid → no full-table shuffle at scale), turning
   Bloom false positives back into new URLs — output is exact, the
   filter only shrinks the expensive join's probe side.
4. ``update_filters`` folds the truly-new keys into the blobs
   (cogroup again) and the caller appends them to the exact table.

At 10^10 keys / P=4096 partitions each blob sizes for ~2.4M keys →
~2.9 MB at 1% FPR: comfortably broadcast-free, one blob per task.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import BloomFilter

DEFAULT_PARTITIONS = 16
DEFAULT_CAPACITY = 250_000   # per-partition sizing hint for new blobs
DEFAULT_FPR = 0.01

_CAND_COLS = ["surt_key", "url", "host", "host_rank", "depth"]
_FLAG_SCHEMA = ("surt_key string, url string, host string, "
                "host_rank double, depth int, maybe_seen boolean")
# filter_blob is the canonical serialized filter (Python paths);
# bits_longs/n_bits/k expose the same bit array to the native Catalyst
# probe (element_at + shiftright — zero Python in the probe stage)
_FILTER_SCHEMA = ("partition_id int, filter_blob binary, n_items long, "
                  "bits_longs array<bigint>, n_bits long, k int")


def _native_probe_col(h1, h2, bits_longs, n_bits, k,
                      static_k: int | None = None):
    """The Bloom probe as a pure Catalyst expression — MUST mirror
    BloomFilter._positions exactly (masked double hashing keeps every
    intermediate < 2^54, so ANSI long arithmetic never overflows and
    matches numpy bit-for-bit).  Word indexing mirrors to_longs():
    little-endian int64 view of the byte array.

    With ``static_k`` (all partition filters share one k — always true
    under uniform sizing) the k bit tests UNROLL into a flat AND chain:
    no per-row sequence/transform/forall array allocations, the whole
    probe stays inside whole-stage codegen.  Without it, a
    higher-order-function fallback handles per-row k."""
    from .bloom import H1_MASK, H2_MASK

    h1m = h1.bitwiseAND(F.lit(H1_MASK))
    h2m = h2.bitwiseAND(F.lit(H2_MASK)).bitwiseOR(F.lit(1))

    def bit(i):
        pos = F.pmod(h1m + i.cast("long") * h2m, n_bits)
        word = F.element_at(bits_longs,
                            (pos / 64).cast("int") + F.lit(1))
        # call_function: shiftright with a COLUMN shift amount (the
        # python helper F.shiftright only takes a literal); arithmetic
        # sign extension is harmless under the & 1
        shifted = F.call_function(
            "shiftright", word, F.pmod(pos, F.lit(64)).cast("int"))
        return shifted.bitwiseAND(F.lit(1)) == 1

    if static_k is not None:
        cond = bit(F.lit(0))
        for j in range(1, static_k):
            cond = cond & bit(F.lit(j))
        return cond
    return F.forall(
        F.transform(F.sequence(F.lit(0), k - F.lit(1)), bit),
        lambda b: b)


def with_hash_cols(df: DataFrame, n_partitions: int = DEFAULT_PARTITIONS,
                   key: str = "surt_key") -> DataFrame:
    return (
        df.withColumn("pid", F.pmod(F.xxhash64(key),
                                    F.lit(n_partitions)).cast("int"))
        .withColumn("h1", F.xxhash64(key))
        .withColumn("h2", F.xxhash64(F.lit("b"), F.col(key)))
    )


def empty_filters(spark, n_partitions: int = DEFAULT_PARTITIONS,
                  capacity: int = DEFAULT_CAPACITY,
                  fpr: float = DEFAULT_FPR) -> DataFrame:
    bf = BloomFilter.sized_for(capacity, fpr)
    rows = [(i, bytearray(bf.to_bytes()), 0, bf.to_longs(), bf.n_bits,
             bf.k) for i in range(n_partitions)]
    return spark.createDataFrame(rows, _FILTER_SCHEMA)


def flag_maybe_seen(candidates: DataFrame, filters: DataFrame,
                    n_partitions: int = DEFAULT_PARTITIONS,
                    broadcast_probe: bool | None = None,
                    cleanup: list | None = None,
                    strategy: str = "native",
                    static_k: int | None = None) -> DataFrame:
    """Candidates + ``maybe_seen`` flag from the per-partition Bloom
    probe.  Input needs _CAND_COLS; hashes are computed here.

    Three physical strategies, same semantics (tested equal):

    * ``strategy='native'`` (default): broadcast-join the tiny filters
      table (pid → bits_longs words) onto the candidates and evaluate
      the probe as a pure Catalyst expression — zero shuffle of the
      candidates, ZERO Python (the probe was the crawl round's main
      pandas stage; Arrow serde + Python workers burn ~2 cores per
      task slot).  Right while total filter state fits the broadcast
      budget.
    * ``strategy='pandas'`` (``broadcast_probe=True``): collect the
      blobs (bounded: P × blob size) and probe inside a pandas UDF
      over the candidates' natural partitioning — zero shuffle.
    * ``strategy='cogroup'`` (``broadcast_probe=False``): cogroup
      candidates with blobs per pid — two hash shuffles, but each task
      holds exactly one blob.  The 10^10-key path (4096 × ~2.9 MB
      blobs ≈ 12 GB total filter state, too big to broadcast).

    ``broadcast_probe`` (bool) is the legacy selector for the two
    Python paths and overrides ``strategy`` when given.

    ``cleanup``: with the pandas strategy, the Broadcast handle is
    appended here so the caller can ``.unpersist()`` it once the
    round's actions complete — otherwise a long resumable crawl
    accumulates one blob broadcast per round in driver + executor
    memory.
    """
    if broadcast_probe is not None:
        strategy = "pandas" if broadcast_probe else "cogroup"
    cand = with_hash_cols(candidates.select(*_CAND_COLS), n_partitions)

    if strategy == "native":
        flt = F.broadcast(filters.select(
            F.col("partition_id").alias("pid"), "bits_longs", "n_bits",
            "k"))
        if static_k is None:
            # one tiny driver peek at the (uniformly sized) filters: a
            # shared k lets the probe unroll into a flat codegen AND
            # chain.  Callers that size the filters themselves pass
            # static_k (BloomFilter.sized_for(capacity, fpr).k) and
            # skip this per-call job.
            krow = filters.agg(F.min("k").alias("lo"),
                               F.max("k").alias("hi")).first()
            static_k = int(krow["lo"]) if (
                krow["lo"] is not None
                and krow["lo"] == krow["hi"]) else None
        joined = cand.join(flt, "pid", "left")
        hof = _native_probe_col(
            F.col("h1"), F.col("h2"), F.col("bits_longs"),
            F.col("n_bits"), F.col("k"))
        if static_k is not None:
            unrolled = _native_probe_col(
                F.col("h1"), F.col("h2"), F.col("bits_longs"),
                F.col("n_bits"), F.col("k"), static_k=static_k)
            # rows whose filter was sized differently (e.g. resumed
            # state from another config) fall back to the per-row-k
            # path — the unrolled chain must never probe a wrong k
            per_row = F.when(F.col("k") == F.lit(static_k),
                             unrolled).otherwise(hof)
        else:
            per_row = hof
        probe = F.when(F.col("bits_longs").isNull(),
                       F.lit(False)).otherwise(per_row)
        return joined.withColumn("maybe_seen", probe) \
            .select(*_CAND_COLS, "maybe_seen")

    if strategy == "pandas":
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        blobs = {int(r["partition_id"]): bytes(r["filter_blob"])
                 for r in filters.collect()}
        sc = candidates.sparkSession.sparkContext
        b_blobs = sc.broadcast(blobs)
        if cleanup is not None:
            cleanup.append(b_blobs)

        @pandas_udf("boolean")
        def probe_udf(pid: pd.Series, h1: pd.Series,
                      h2: pd.Series) -> pd.Series:
            out = np.zeros(len(pid), dtype=bool)
            pids = pid.to_numpy()
            h1v, h2v = h1.to_numpy(), h2.to_numpy()
            for p in np.unique(pids):
                blob = b_blobs.value.get(int(p))
                if blob is None:
                    continue
                bf = BloomFilter.from_bytes(blob)
                mask = pids == p
                out[mask] = bf.contains_many(h1v[mask], h2v[mask])
            return pd.Series(out)

        return cand.withColumn(
            "maybe_seen", probe_udf("pid", "h1", "h2")
        ).select(*_CAND_COLS, "maybe_seen")

    def probe(cpdf: pd.DataFrame, fpdf: pd.DataFrame) -> pd.DataFrame:
        if len(cpdf) == 0:
            return pd.DataFrame(
                columns=_CAND_COLS + ["maybe_seen"])
        if len(fpdf) == 0:
            flags = [False] * len(cpdf)
        else:
            bf = BloomFilter.from_bytes(bytes(fpdf["filter_blob"].iloc[0]))
            flags = bf.contains_many(
                cpdf["h1"].to_numpy(), cpdf["h2"].to_numpy())
        out = cpdf[_CAND_COLS].copy()
        out["maybe_seen"] = flags
        return out

    return (
        cand.groupBy("pid")
        .cogroup(filters.groupBy("partition_id"))
        .applyInPandas(probe, schema=_FLAG_SCHEMA)
    )


def split_new(candidates: DataFrame, filters: DataFrame, seen: DataFrame,
              n_partitions: int = DEFAULT_PARTITIONS,
              broadcast_probe: bool | None = None,
              strategy: str = "native") -> DataFrame:
    """Exactly-new candidates: Bloom-definite-new ∪ (Bloom-maybe-seen
    ⟕̸ exact seen table).  ``seen`` has column ``surt_key``."""
    flagged = flag_maybe_seen(candidates, filters, n_partitions,
                              broadcast_probe, strategy=strategy)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    verified_new = (
        flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        .join(seen.select("surt_key"), "surt_key", "left_anti")
    )
    return definitely_new.unionByName(verified_new)


def _update_filters_native(new_keys: DataFrame, filters: DataFrame,
                           n_partitions: int, capacity: int,
                           fpr: float) -> DataFrame:
    """The Bloom fold as (almost) pure Catalyst: explode each new key
    into its k probe positions (the SAME masked double-hash arithmetic
    as ``_native_probe_col`` — bit parity is property-tested against
    the numpy fold), ``bit_or`` the per-word bit masks with map-side
    partial aggregation, then merge the sparse new words onto the
    dense old word arrays.  Python touches exactly ``n_partitions``
    final rows — the blob header serialization — instead of every new
    key (the pandas-cogroup fold shipped the whole keyed delta through
    Arrow, and its Python workers borrowing cores beyond the task-slot
    count is a single-box scaling distortion).

    Word-count note: all filters produced by ``empty_filters``/this
    fold share the uniform config geometry; a partition absent from
    ``filters`` (never the case after init_state) gets the default
    geometry, like the pandas fold."""
    from .bloom import H1_MASK, H2_MASK

    sized = BloomFilter.sized_for(capacity, fpr)
    d_words = len(sized.to_longs())

    keyed = with_hash_cols(new_keys.select("surt_key"), n_partitions)
    geo = filters.select(F.col("partition_id").alias("pid"),
                         F.col("n_bits").alias("_nb"),
                         F.col("k").alias("_k"))
    g = keyed.join(F.broadcast(geo), "pid", "left")
    h1m = F.col("h1").bitwiseAND(F.lit(H1_MASK))
    h2m = F.col("h2").bitwiseAND(F.lit(H2_MASK)).bitwiseOR(F.lit(1))
    nb = F.coalesce(F.col("_nb"), F.lit(sized.n_bits))
    kk = F.coalesce(F.col("_k"), F.lit(sized.k))
    pos = F.explode(F.transform(
        F.sequence(F.lit(0), kk - F.lit(1)),
        lambda i: F.pmod(h1m + i.cast("long") * h2m, nb)))
    sparse = (
        g.select("pid", pos.alias("p"))
        .groupBy("pid", F.shiftright("p", 6).alias("word"))
        .agg(F.bit_or(F.call_function(
            "shiftleft", F.lit(1).cast("long"),
            F.pmod("p", F.lit(64)).cast("int"))).alias("add_bits"))
    )
    counts = keyed.groupBy("pid").agg(
        F.count(F.lit(1)).alias("_n_new"))

    # dense word skeleton: existing filters posexplode their word
    # arrays; pids seen only in the delta synthesize default-geometry
    # zero words
    old_words = filters.select(
        F.col("partition_id").alias("pid"),
        F.posexplode("bits_longs").alias("word", "old_bits"))
    new_pids = (keyed.select("pid").distinct()
                .join(geo.select("pid"), "pid", "left_anti"))
    zero_words = new_pids.select(
        "pid", F.explode(F.sequence(
            F.lit(0), F.lit(d_words - 1))).alias("word"),
        F.lit(0).cast("long").alias("old_bits"))
    dense = old_words.unionByName(zero_words)
    merged = (
        dense.join(sparse, ["pid", "word"], "left")
        .select("pid", "word",
                F.col("old_bits").bitwiseOR(
                    F.coalesce("add_bits", F.lit(0))).alias("bits"))
    )
    folded = merged.groupBy("pid").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("word", "bits"))),
                    lambda s: s["bits"]).alias("bits_longs"))

    meta = (filters.select(F.col("partition_id").alias("pid"),
                           "n_bits", "k", "n_items")
            .unionByName(new_pids.select(
                "pid",
                F.lit(sized.n_bits).cast("long").alias("n_bits"),
                F.lit(sized.k).cast("int").alias("k"),
                F.lit(0).cast("long").alias("n_items")))
            .join(counts, "pid", "left")
            .select("pid", "n_bits", "k",
                    (F.col("n_items")
                     + F.coalesce("_n_new", F.lit(0))).alias("n_items")))

    # blob header+bytes: n_partitions rows of pure serialization — a
    # row-at-a-time UDF is fine at this cardinality
    blob = F.udf(
        lambda longs, nbits, k_, items: BloomFilter.from_longs(
            longs, nbits, k_, items).to_bytes(),
        "binary")
    return (
        folded.join(F.broadcast(meta), "pid")
        .select(F.col("pid").alias("partition_id"),
                blob("bits_longs", "n_bits", "k", "n_items")
                .alias("filter_blob"),
                "n_items", "bits_longs", "n_bits", "k")
    )


def update_filters(new_keys: DataFrame, filters: DataFrame,
                   n_partitions: int = DEFAULT_PARTITIONS,
                   capacity: int = DEFAULT_CAPACITY,
                   fpr: float = DEFAULT_FPR,
                   strategy: str = "native") -> DataFrame:
    """Fold new SURT keys into the partition blobs; returns the full
    next-generation filters table (one row per partition — partitions
    with no new keys pass their blob through unchanged).

    ``strategy='native'`` (default) folds JVM-side with only the final
    per-partition blob serialization in Python;  ``'pandas'`` is the
    cogroup fold (numpy per partition), kept as the cross-check the
    parity property test runs both of."""
    if strategy == "native":
        return _update_filters_native(new_keys, filters, n_partitions,
                                      capacity, fpr)
    keyed = with_hash_cols(new_keys.select("surt_key"), n_partitions)

    def fold(kpdf: pd.DataFrame, fpdf: pd.DataFrame) -> pd.DataFrame:
        if len(fpdf) > 0:
            pid = int(fpdf["partition_id"].iloc[0])
            bf = BloomFilter.from_bytes(bytes(fpdf["filter_blob"].iloc[0]))
        else:
            pid = int(kpdf["pid"].iloc[0])
            bf = BloomFilter.sized_for(capacity, fpr)
        if len(kpdf) > 0:
            bf.add_many(kpdf["h1"].to_numpy(), kpdf["h2"].to_numpy())
        return pd.DataFrame({
            "partition_id": [pid],
            "filter_blob": [bf.to_bytes()],
            "n_items": [bf.n_items],
            "bits_longs": [bf.to_longs()],
            "n_bits": [bf.n_bits],
            "k": [bf.k],
        })

    return (
        keyed.groupBy("pid")
        .cogroup(filters.groupBy("partition_id"))
        .applyInPandas(fold, schema=_FILTER_SCHEMA)
    )
