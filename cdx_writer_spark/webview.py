"""Deterministic Common-Crawl-style ``pages`` view over the testdata
``documents`` table.

Every column is a pure function of ``doc_id``/``text``/``n_chars`` built
from native Catalyst expressions (no UDFs, no RNG), so an independent
ANSI-SQL oracle (DuckDB, ``__spark_entry__.oracle_sql``) can recompute
the *expected* CDX output for each row straight from ``doc_id`` without
sharing any code with the engine.  The URL/record-type/status taxonomy
deliberately exercises each admission + field-computation path from
SURVEY.md §2 (case/port/query-order SURT massaging, IP-host reversal,
ftp-scheme hosts, revisit/request records, 304 drops, robots meta flags,
digest-header fast path vs computed SHA-1).

Scale note: the view is a narrow projection + one cumulative-sum window
partitioned by ``warc_file`` (the per-file byte offset, field V).  At
100 TB the window partitions by file — bounded size (~1 GB of records
per WARC), no global shuffle; everything else is embarrassingly
parallel and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BASE_TS = "2011-02-18 23:32:56"

# Shared derivation constants (mirrored textually in the oracle SQL).
N_HOSTS = 37          # host index = doc_id % 37
N_URL_VARIANTS = 5    # url shape = doc_id % 5
N_FILES = 512         # warc_file = doc_id % 512: ALSO the offset
                      # window's partition key.  Must be >> cores: with
                      # only 64 keys, hashing into 32 shuffle partitions
                      # gives ~2.5x balls-in-bins skew and the slowest
                      # task gates the whole UDF stage (measured: 0.4
                      # scaling efficiency at 64 files, ~0.8 at 512)
REVISIT_MOD = 17      # doc_id % 17 == 0 -> revisit record
REQUEST_MOD = 23      # doc_id % 23 == 0 -> request record (never indexed)
STATUS_MOD = 11       # doc_id % 11 -> 404 / 301 / 304 / 200
ROBOTS_MOD = 20       # doc_id % 20 == 0 -> <meta name=robots noindex>
DIGEST_MOD = 3        # doc_id % 3 != 0 -> WARC-Payload-Digest header


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         amplify: int = 1) -> DataFrame:
    """Build the PAGES_SCHEMA view from ``{sf_dir}/documents.parquet``.

    ``amplify`` > 1 replicates each document that many times with
    distinct doc_ids/texts (bench-scale input without touching the
    read-only testdata) — derivations stay deterministic because every
    downstream column is a function of the new (doc_id, text).
    """
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    if amplify > 1:
        # Shuffle-free scale-out: the testdata documents table is one
        # parquet file (one scan task), so amplified rows are generated
        # from a well-partitioned range broadcast-joined to the tiny
        # docs table — no repartition of full rows, no serial explode.
        n = docs.count()
        base = spark.range(0, n * amplify, 1, par)
        docs = (
            base.withColumn("_base_id", F.col("id") % n)
            .withColumn("_i", (F.col("id") / n).cast("long"))
            .join(F.broadcast(docs.withColumnRenamed("doc_id",
                                                     "_base_id")),
                  "_base_id")
            .select(
                (F.col("_base_id") + F.col("_i") * F.lit(1_000_000))
                .alias("doc_id"),
                F.concat(F.col("text"), F.lit(" v"),
                         F.col("_i").cast("string")).alias("text"),
                "lang",
                (F.col("n_chars") + F.length(
                    F.concat(F.lit(" v"), F.col("_i").cast("string"))))
                .alias("n_chars"),
            )
        )
    else:
        # unamplified correctness runs are tiny; a cheap spread keeps
        # multi-core sessions busy on the single-file scan
        docs = docs.repartition(par, "doc_id")
    d = F.col("doc_id")
    h = (d % N_HOSTS).cast("string")

    record_type = (
        F.when(d % REVISIT_MOD == 0, F.lit("revisit"))
        .when(d % REQUEST_MOD == 0, F.lit("request"))
        .otherwise(F.lit("response"))
    )
    status = (
        F.when(d % STATUS_MOD == 0, F.lit("404 Not Found"))
        .when(d % STATUS_MOD == 1, F.lit("301 Moved Permanently"))
        .when(d % STATUS_MOD == 2, F.lit("304 Not Modified"))
        .otherwise(F.lit("200 OK"))
    )
    ds = d.cast("string")
    url = (
        F.when(d % N_URL_VARIANTS == 0, F.concat(
            F.lit("http://www.site"), h, F.lit(".example.com/page/"), ds))
        .when(d % N_URL_VARIANTS == 1, F.concat(
            F.lit("http://Site"), h, F.lit(".Example.COM:80/Page/"), ds,
            F.lit("?b=2&a=1")))
        .when(d % N_URL_VARIANTS == 2, F.concat(
            F.lit("https://site"), h, F.lit(".example.com/cat/item/"), ds))
        .when(d % N_URL_VARIANTS == 3, F.concat(
            F.lit("http://203.0.113."), h, F.lit("/item/"), ds))
        .otherwise(F.concat(
            F.lit("ftp://files.site"), h, F.lit(".example.com/pub/"), ds))
    )
    meta = F.when(
        d % ROBOTS_MOD == 0,
        F.lit('<meta name="robots" content="noindex">'),
    ).otherwise(F.lit(""))
    response_html = F.concat(
        F.lit("HTTP/1.1 "), status,
        F.lit("\r\nContent-Type: text/html\r\n\r\n<html><head>"), meta,
        F.lit("</head><body>"), F.col("text"), F.lit("</body></html>"))
    html_str = (
        F.when(record_type == "revisit", F.lit(""))
        .when(record_type == "request", F.lit("GET / HTTP/1.1\r\n\r\n"))
        .otherwise(response_html)
    )
    content_type = (
        F.when(record_type == "request",
               F.lit("application/http; msgtype=request"))
        # variant 3 rows look ARC-style: record-level mime, no msgtype
        .when((record_type == "response") & (d % N_URL_VARIANTS == 3),
              F.lit("text/html"))
        .otherwise(F.lit("application/http; msgtype=response"))
    )
    digest = F.concat(F.lit("sha1:"), F.upper(F.md5(F.col("text"))))
    warc_headers = (
        F.when(
            (record_type == "revisit") & (d % DIGEST_MOD != 0),
            F.create_map(
                F.lit("WARC-Payload-Digest"), digest,
                F.lit("WARC-Profile"),
                F.lit("http://netpreserve.org/warc/1.0/revisit/"
                      "identical-payload-digest")))
        .when(
            record_type == "revisit",
            F.create_map(
                F.lit("WARC-Profile"),
                F.lit("http://netpreserve.org/warc/1.0/revisit/"
                      "identical-payload-digest")))
        .when(d % DIGEST_MOD != 0,
              F.create_map(F.lit("WARC-Payload-Digest"), digest))
        .otherwise(F.create_map().cast("map<string,string>"))
    )
    compressed_size = (F.lit(200) + F.col("n_chars")).cast("long")
    warc_file = F.concat(F.lit("synth-"), (d % N_FILES).cast("string"),
                         F.lit(".warc.gz"))
    pages = docs.select(
        url.alias("url"),
        F.expr(f"timestampadd(SECOND, doc_id, timestamp'{BASE_TS}')")
        .alias("warc_ts"),
        F.lit(None).cast("string").alias("raw_date"),
        record_type.alias("record_type"),
        content_type.alias("content_type"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        warc_headers.alias("warc_headers"),
        F.octet_length(F.encode(html_str, "UTF-8")).cast("long")
        .alias("content_length"),
        compressed_size.alias("compressed_size"),
        warc_file.alias("warc_file"),
        d.alias("doc_id"),
    )
    # field V: running byte offset of each record within its file
    w = (Window.partitionBy("warc_file").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return pages.withColumn(
        "offset", F.coalesce(F.sum("compressed_size").over(w), F.lit(0)))


# The same derivation in ANSI SQL, as a CTE body the oracle queries build
# on (DuckDB view `documents` is pre-registered by the driver).  This is
# the *independent* recomputation: expected SURT keys, dates, mimes,
# statuses, robots flags and offsets are derived straight from doc_id,
# not by parsing the URLs/HTML the engine parses.
ORACLE_PAGES_CTE = """
pages AS (
    SELECT
        doc_id,
        text,
        lang,
        doc_id % 37 AS h,
        doc_id % 5 AS v,
        CASE WHEN doc_id % 17 = 0 THEN 'revisit'
             WHEN doc_id % 23 = 0 THEN 'request'
             ELSE 'response' END AS record_type,
        CASE WHEN doc_id % 11 = 0 THEN '404'
             WHEN doc_id % 11 = 1 THEN '301'
             WHEN doc_id % 11 = 2 THEN '304'
             ELSE '200' END AS status,
        CASE WHEN doc_id % 5 = 0 THEN 'http://www.site' || (doc_id % 37)
                  || '.example.com/page/' || doc_id
             WHEN doc_id % 5 = 1 THEN 'http://Site' || (doc_id % 37)
                  || '.Example.COM:80/Page/' || doc_id || '?b=2&a=1'
             WHEN doc_id % 5 = 2 THEN 'https://site' || (doc_id % 37)
                  || '.example.com/cat/item/' || doc_id
             WHEN doc_id % 5 = 3 THEN 'http://203.0.113.' || (doc_id % 37)
                  || '/item/' || doc_id
             ELSE 'ftp://files.site' || (doc_id % 37)
                  || '.example.com/pub/' || doc_id END AS url,
        CASE WHEN doc_id % 5 = 0 THEN 'com,example,site' || (doc_id % 37)
                  || ')/page/' || doc_id
             WHEN doc_id % 5 = 1 THEN 'com,example,site' || (doc_id % 37)
                  || ')/page/' || doc_id || '?a=1&b=2'
             WHEN doc_id % 5 = 2 THEN 'com,example,site' || (doc_id % 37)
                  || ')/cat/item/' || doc_id
             WHEN doc_id % 5 = 3 THEN (doc_id % 37) || ',113,0,203)/item/'
                  || doc_id
             ELSE 'com,example,site' || (doc_id % 37) || ',files)/pub/'
                  || doc_id END AS surt,
        strftime(TIMESTAMP '2011-02-18 23:32:56'
                 + to_seconds(doc_id), '%Y%m%d%H%M%S') AS date14,
        CASE WHEN doc_id % 20 = 0 THEN 'I' END AS robots_flag,
        CASE WHEN doc_id % 3 <> 0 THEN upper(md5(text)) END AS digest,
        200 + n_chars AS compressed_size,
        'synth-' || (doc_id % 512) || '.warc.gz' AS warc_file,
        COALESCE(SUM(200 + n_chars) OVER (
            PARTITION BY doc_id % 512 ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset
    FROM documents
),
admitted AS (
    SELECT * FROM pages
    WHERE record_type = 'revisit'
       OR (record_type = 'response' AND status <> '304')
)
"""
