"""v2 statement-surface operators (SURVEY §2.1, §2.11) exposed as driver
contract queries: VALUES/expression scan, dummy scan, CREATE TABLE + INSERT
round-trip, CSV ingestion (read_csv table function), catalog introspection.

These exercise the Session frontend end-to-end; each one returns data whose
oracle is a self-contained VALUES expression, so the check is independent
of catalog state.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from sqlrs_spark.functions.hashing import h31_duck, h31_spark
from sqlrs_spark.operators.common import VAL_NAN_NULL, materialize_then_rm
from sqlrs_spark.registry import register
from sqlrs_spark.sources.tables import TABLES, load_table, register_views


@register(
    "v01_values_scan",
    oracle="""
    SELECT id, name, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, NULL, NULL))
      t(id, name, score)
    ORDER BY id
    """,
    tags=("core", "scan", "statement"),
)
def v01_values_scan(spark, sf_dir):
    """VALUES-list expression scan with per-row expressions and NULLs
    (reference: bind_expression_list_ref.rs + expression_scan.rs; types
    unified via max_logical_type — Spark's VALUES coercion is equivalent)."""
    return spark.sql(
        """
        SELECT id, name, CAST(score AS DOUBLE) AS score
        FROM VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, NULL, NULL)
          AS t(id, name, score)
        ORDER BY id
        """
    )


@register(
    "v02_dummy_scan",
    oracle="""
    SELECT 1 AS one, 'x' AS s, CAST(2.5 AS DOUBLE) AS f,
           CAST(1 + 2 * 3 AS INT) AS arith, (1 < 2) AS cmp,
           TRY_CAST('12' AS INT) AS try_ok, TRY_CAST('abc' AS INT) AS try_null
    """,
    tags=("core", "scan", "statement"),
)
def v02_dummy_scan(spark, sf_dir):
    """SELECT without FROM — one-row dummy scan (bind_dummy_table_ref.rs);
    covers constant folding of arithmetic/comparison scalar functions and
    try_cast (safe cast → NULL on failure, default_cast.rs:152-181)."""
    return spark.sql(
        "SELECT 1 AS one, 'x' AS s, CAST(2.5 AS DOUBLE) AS f, "
        "CAST(1 + 2 * 3 AS INT) AS arith, (1 < 2) AS cmp, "
        "TRY_CAST('12' AS INT) AS try_ok, TRY_CAST('abc' AS INT) AS try_null"
    )


@register(
    "v03_ddl_roundtrip",
    oracle="""
    SELECT id, val FROM (VALUES (1, 'a'), (2, 'b'), (3, NULL), (4, 'd'))
      t(id, val)
    ORDER BY id
    """,
    tags=("core", "statement", "ddl"),
)
def v03_ddl_roundtrip(spark, sf_dir):
    """CREATE TABLE → INSERT INTO (incl. partial column list with NULL fill,
    bind_insert.rs:56-82) → SELECT round-trip, on an explicit parquet
    location so it works from any driver cwd."""
    loc = tempfile.mkdtemp(prefix="sqlrs_ddl_")
    spark.sql("DROP TABLE IF EXISTS sqlrs_ddl_t")
    spark.sql(
        f"CREATE TABLE sqlrs_ddl_t (id INT, val STRING) USING parquet LOCATION '{loc}/t'"
    )
    spark.sql("INSERT INTO sqlrs_ddl_t VALUES (1, 'a'), (2, 'b')")
    # partial column list: unspecified columns filled with NULL
    spark.sql("INSERT INTO sqlrs_ddl_t (id) VALUES (3)")
    spark.sql("INSERT INTO sqlrs_ddl_t VALUES (4, 'd')")
    return spark.sql("SELECT id, val FROM sqlrs_ddl_t ORDER BY id")


@register(
    "v04_csv_roundtrip",
    oracle="""
    SELECT id, state_code, state_name FROM (VALUES
      (1, 'CA', 'California State'),
      (2, 'CO', 'Colorado State'),
      (3, 'NJ', 'New Jersey'),
      (4, NULL, 'Unknown, Quoted'))
      t(id, state_code, state_name)
    ORDER BY id
    """,
    tags=("core", "statement", "csv"),
)
def v04_csv_roundtrip(spark, sf_dir):
    """read_csv table function with header + '|' delimiter + quoted values +
    empty→NULL (read_csv.rs:44-199, tests/slt/csv/csv.slt) through the
    Session frontend's SQL rewrite."""
    from sqlrs_spark.session import Session

    path = os.path.join(tempfile.mkdtemp(prefix="sqlrs_csv_"), "state.csv")
    with open(path, "w") as f:
        f.write("id|state_code|state_name\n")
        f.write("1|CA|California State\n")
        f.write("2|CO|Colorado State\n")
        f.write("3|NJ|New Jersey\n")
        f.write('4||"Unknown, Quoted"\n')
    s = Session(spark)
    return s.sql(
        f"SELECT id, state_code, state_name "
        f"FROM read_csv('{path}', header=>true, delim=>'|') ORDER BY id"
    )


@register(
    "v06_ctas",
    oracle="""
    SELECT nk, n FROM (VALUES (0, 2), (1, 3)) t(nk, n) ORDER BY nk
    """,
    tags=("core", "statement", "ddl"),
)
def v06_ctas(spark, sf_dir):
    """CREATE TABLE AS SELECT — names and types taken from the bound query
    (bind_create.rs:13-48; CTAS-from-read_csv in create_table.slt:32)."""
    loc = tempfile.mkdtemp(prefix="sqlrs_ctas_")
    spark.sql("DROP TABLE IF EXISTS sqlrs_ctas_t")
    spark.sql(
        f"""
        CREATE TABLE sqlrs_ctas_t USING parquet LOCATION '{loc}/t' AS
        SELECT nk, COUNT(*) AS n
        FROM VALUES (0), (0), (1), (1), (1) AS s(nk)
        GROUP BY nk
        """
    )
    return spark.sql("SELECT nk, CAST(n AS INT) AS n FROM sqlrs_ctas_t ORDER BY nk")


@register(
    "v07_catalog_columns",
    oracle="""
    SELECT column_name, column_type FROM (VALUES
      ('r_regionkey', 'int'), ('r_name', 'string'),
      ('n_nationkey', 'int'), ('n_name', 'string'), ('n_regionkey', 'int'))
      t(column_name, column_type)
    ORDER BY column_name
    """,
    tags=("core", "statement", "catalog"),
)
def v07_catalog_columns(spark, sf_dir):
    """sqlrs_columns() per-table column introspection (sqlrs_columns.rs),
    over the region+nation views."""
    from sqlrs_spark.session import Session

    register_views(spark, sf_dir, ("region", "nation"))
    s = Session(spark)
    region = s.sqlrs_columns("region")
    nation = s.sqlrs_columns("nation")
    return (
        region.unionAll(nation)
        .select("column_name", "column_type")
        .orderBy("column_name")
    )


@register(
    "v08_replacement_scan",
    oracle="""
    SELECT id, name FROM (VALUES (1, 'ada'), (2, 'grace')) t(id, name)
    ORDER BY id
    """,
    tags=("core", "statement", "csv"),
)
def v08_replacement_scan(spark, sf_dir):
    """`SELECT * FROM 'file.csv'` replacement scan
    (bind_base_table_ref.rs:97-126) through the Session SQL rewrite."""
    from sqlrs_spark.session import Session

    path = os.path.join(tempfile.mkdtemp(prefix="sqlrs_rs_"), "people.csv")
    with open(path, "w") as f:
        f.write("id,name\n1,ada\n2,grace\n")
    return Session(spark).sql(f"SELECT id, name FROM '{path}' ORDER BY id")


@register(
    "v05_catalog_tables",
    oracle="""
    SELECT table_name FROM (VALUES
      ('customer'), ('documents'), ('embeddings'), ('events'), ('lineitem'),
      ('nation'), ('orders'), ('part'), ('region'), ('supplier'))
      t(table_name)
    ORDER BY table_name
    """,
    tags=("core", "statement", "catalog"),
)
def v05_catalog_tables(spark, sf_dir):
    """sqlrs_tables() catalog introspection (sqlrs_tables.rs:90-183) —
    filtered to the testdata tables so the check is independent of whatever
    else is registered in the driver session."""
    from sqlrs_spark.session import Session

    register_views(spark, sf_dir)
    s = Session(spark)
    return (
        s.sqlrs_tables()
        .filter(F.col("table_name").isin(*TABLES))
        .select("table_name")
        .orderBy("table_name")
    )


@register(
    "v09_partitioned_sink",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("extension", "sink"),
)
def v09_partitioned_sink(spark, sf_dir):
    """Partitioned parquet sink round-trip: write the documents table
    partitioned by `lang` (the layout a curated-corpus store uses so
    downstream language-filtered scans prune whole directories), then read
    it back and aggregate per partition.

    Beyond-reference: the reference's only sinks are INSERT/CTAS into its
    in-memory storage (SURVEY §2.1).  Scale: partition-by on a
    low-cardinality column keeps file counts sane (#partitions × #tasks);
    high-cardinality keys would need bucketing instead
    (sources/bucketing.py).  The read-back proves partition pruning-ready
    layout: each lang directory is self-contained.
    """
    register_views(spark, sf_dir, ("documents",))
    root = tempfile.mkdtemp(prefix="sqlrs_sink_")
    out = os.path.join(root, "documents_by_lang")
    spark.table("documents").write.partitionBy("lang").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return materialize_then_rm(
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang"),
        root,
    )


@register(
    "v10_jsonl_roundtrip",
    oracle=f"""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM({h31_duck('text')}) AS BIGINT) AS text_digest
    FROM documents
    WHERE lang IN ('fr', 'zh')
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    tags=("statement", "json", "source"),
)
def v10_jsonl_roundtrip(spark, sf_dir):
    """JSONL sink → source round-trip over the documents table — the
    interchange format real training corpora arrive in (one JSON object
    per line, unicode text).

    Writes a language slice to newline-delimited JSON, reads it back with
    an explicit schema, and aggregates a content digest (md5-derived sum
    over `text`): the oracle runs the same digest on the ORIGINAL rows, so
    any text mangled in serialization (escapes, unicode, embedded
    newlines) changes the sum and fails the hash gate.  Scale notes: the
    write is partition-parallel (one shard file per task, no shuffle);
    the read's explicit schema skips Spark's whole-data inference pass —
    mandatory at 100 TB, where schema inference would double the scan;
    text integrity rides the digest, not a row-by-row compare.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("fr", "zh"))
    )
    root = tempfile.mkdtemp(prefix="sqlrs_jsonl_")
    out_dir = os.path.join(root, "docs")
    docs.write.mode("overwrite").json(out_dir)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(out_dir)
    return materialize_then_rm(
        back.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.sum(F.expr(h31_spark("text"))).alias("text_digest"),
        )
        .orderBy("lang", "source"),
        root,
    )


@register(
    "v11_partitioned_write",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM((CASE WHEN isnan(value) THEN NULL ELSE value END)::DECIMAL(18,4)) AS DOUBLE) AS total_value,
           CAST(MIN(event_id) AS BIGINT) AS first_id,
           CAST(MAX(event_id) AS BIGINT) AS last_id
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("statement", "sink", "source"),
)
def v11_partitioned_write(spark, sf_dir):
    """Hive-partitioned parquet sink → partition-pruned source round-trip.

    Writes events partitioned by event_type (`.partitionBy` — the layout
    every production table uses so predicates become directory pruning),
    reads the directory back, and aggregates ONLY two partitions.  The
    oracle computes the same aggregate over the original rows, so any
    row lost/duplicated/mistyped by the partitioned round-trip fails the
    value hash; test_plans asserts the read's PartitionFilters actually
    prune (the scan must list 2 of 4 directories, not filter rows).

    Scale: the write shuffles once on the partition column so each task
    writes one directory (without the repartition, every task writes a
    file into every partition — the classic small-files explosion at
    1000 executors); the pruned read's cost is proportional to the
    selected partitions, not the table.
    """
    ev = load_table(spark, sf_dir, "events")
    # stable per-(user, session) scratch, overwritten in place on
    # re-invocation (NOT a fresh mkdtemp per call — the bench's
    # warm+timed reruns would leak one full events copy each): v11 must
    # return a LAZY plan so test_plans can assert the read's
    # PartitionFilters, so the materialize-then-rm cleanup the other sink
    # round-trips use is not available here.  The uid keeps multi-user
    # hosts from colliding on permissions; the applicationId keeps two
    # live sessions (parallel pytest + bench) from overwriting files the
    # other's lazy plan is still reading; stale sibling sessions' dirs
    # are swept best-effort after a day.
    root = os.path.join(
        tempfile.gettempdir(), f"sqlrs_scratch_v11_{os.getuid()}"
    )
    app = spark.sparkContext.applicationId
    out_dir = os.path.join(root, app, "events")
    try:
        import shutil as _shutil
        import time as _time

        for sib in os.listdir(root):
            p = os.path.join(root, sib)
            if sib != app and _time.time() - os.path.getmtime(p) > 86400:
                _shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    (
        ev.repartition("event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(VAL_NAN_NULL).cast("decimal(18,4)")).cast("double").alias("total_value"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
        )
        .orderBy("event_type")
    )


@register(
    "v12_orc_roundtrip",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM({h31_duck('text')}) AS BIGINT) AS text_digest
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("statement", "orc", "source"),
)
def v12_orc_roundtrip(spark, sf_dir):
    """ORC sink → source round-trip: the second JVM-native columnar format
    next to parquet (a user migrating Hive/Trino data arrives with ORC).
    Writes documents to ORC, reads back, aggregates a content digest;
    the oracle computes the identical digest over the ORIGINAL parquet
    rows, so any value mangled by the ORC writer/reader path (string
    encoding, nulls, column order) breaks the hash.

    Scale: ORC write is partition-parallel (no shuffle); the read's
    predicate/column pushdown matches parquet's (both are Spark
    DataSource v1 columnar scans with min/max stripe stats).
    """
    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="sqlrs_orc_")
    out_dir = os.path.join(root, "docs")
    docs.write.mode("overwrite").orc(out_dir)
    back = spark.read.orc(out_dir)
    return materialize_then_rm(
        back.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.sum(F.expr(h31_spark("text"))).alias("text_digest"),
        )
        .orderBy("source"),
        root,
    )


@register(
    "x26_bucketed_fact_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM((CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))))
                AS BIGINT) / 10000.0 AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("extension", "sink", "bucketing", "join"),
)
def x26_bucketed_fact_join(spark, sf_dir):
    """Zero-shuffle fact⋈fact join through the bucketed storage layout:
    orders and lineitem are materialized ONCE as co-bucketed tables on
    the order key (sources/bucketing.ensure_bucketed_facts), after which
    every orderkey join between them elides BOTH Exchanges — the scan
    itself reports HashPartitioning, so only the final aggregate
    shuffles (its 5-group key).  test_plans asserts the executed plan
    has no Exchange under the join.

    This is the 100 TB answer to the orders⋈lineitem shuffle that
    dominates q03/q05-shaped plans (round-2 verdict, q05 audit): at
    cluster scale the bucketed layout turns the recurring multi-TB
    fact shuffle into a bucket-aligned local join, paid for by one
    ETL write.  The oracle aggregates the ORIGINAL tables, so the
    driver hash also proves the bucketed copies hold exactly the
    source rows.  Revenue recombines via the split-radix money sums
    (operators/common.money_sum_aggs — overflow-safe past SF100k).
    """
    from sqlrs_spark.operators.common import money_sum_aggs, money_sum_total
    from sqlrs_spark.sources.bucketing import ensure_bucketed_facts

    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    o = spark.table(orders_t).select("o_orderkey", "o_orderpriority")
    li = spark.table(lineitem_t).select(
        "l_orderkey",
        (
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint"))
        ).alias("rev_c"),
    )
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), *money_sum_aggs("rev_c"))
        .select(
            "o_orderpriority",
            "n_lines",
            money_sum_total("rev_c").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "v13_schema_evolution",
    # the oracle states the merge semantics over the ORIGINAL rows: the
    # generation written before the column existed contributes NULLs
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN source <> 'src0' THEN 1 END) AS n_with_quality,
           CAST(COALESCE(SUM(CASE WHEN source <> 'src0'
                                  THEN n_chars % 97 END), 0) AS BIGINT)
             AS sum_quality,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("extension", "source", "schema"),
)
def v13_schema_evolution(spark, sf_dir):
    """Schema-evolution parquet read: two generations of the same dataset
    directory — generation 1 written BEFORE a ``quality`` column existed,
    generation 2 with it — read back as one table via ``mergeSchema``,
    old rows null-filled.  This is the ingest reality of any long-lived
    100 TB corpus store: columns get added mid-corpus and a reader must
    union by name across file vintages, not by position.

    Beyond-reference (the reference's storage has a fixed per-table
    schema, src/storage/mod.rs).  Scale notes: mergeSchema reconciles
    footers only (one driver-side metadata pass, no data read); steady
    state pins the merged schema explicitly so scans skip footer
    reconciliation entirely — which is why the read below also asserts
    the merged schema rather than trusting it.
    """
    register_views(spark, sf_dir, ("documents",))
    root = tempfile.mkdtemp(prefix="sqlrs_evo_")
    out = os.path.join(root, "documents_evolving")
    docs = spark.table("documents")
    gen1 = docs.filter(F.col("source") == "src0").select("doc_id", "lang", "n_chars")
    gen2 = (
        docs.filter(F.col("source") != "src0")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("n_chars") % 97).cast("int").alias("quality"),
        )
    )
    gen1.write.parquet(os.path.join(out, "gen=1"))
    gen2.write.parquet(os.path.join(out, "gen=2"))
    back = spark.read.option("mergeSchema", "true").parquet(out)
    assert "quality" in back.columns, "mergeSchema dropped the evolved column"
    return materialize_then_rm(
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("quality").alias("n_with_quality"),
            F.coalesce(F.sum("quality"), F.lit(0)).cast("bigint").alias("sum_quality"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang"),
        root,
    )


@register(
    "v14_gzip_jsonl_source",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM({h31_duck('text')}) AS BIGINT) AS text_digest
    FROM documents
    WHERE lang IN ('de', 'es')
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("statement", "json", "source", "compression"),
)
def v14_gzip_jsonl_source(spark, sf_dir):
    """GZIP-compressed JSONL sink → source round-trip — the wire format
    training corpora actually ship in (CommonCrawl WET/WARC derivatives,
    HF dataset shards: .jsonl.gz).  Same digest contract as v10; what
    this adds is the COMPRESSED path: the writer emits .json.gz shards
    and the reader decodes them transparently by extension.

    Scale note the docstring owes the 100 TB design: gzip is a
    NON-SPLITTABLE codec — one .gz shard is one input split is one task,
    so parallelism is fixed at ingest by the shard count, not by
    maxPartitionBytes (asserted below: the read plan sees exactly as
    many partitions as shards).  A corpus store wanting splittable text
    shards uses zstd-in-parquet (v09/v11) — this operator exists because
    external corpora arrive gzipped whether we like it or not.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("de", "es"))
        .repartition(4)  # fixed shard count: the parallelism contract below
    )
    root = tempfile.mkdtemp(prefix="sqlrs_jsonlgz_")
    out_dir = os.path.join(root, "docs")
    docs.write.mode("overwrite").option("compression", "gzip").json(out_dir)
    import glob as _glob

    shards = _glob.glob(os.path.join(out_dir, "*.json.gz"))
    assert shards, "gzip writer produced no .json.gz shards"
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(out_dir)
    # non-splittable codec: partitions == shards, the fixed-parallelism
    # property the docstring claims
    assert back.rdd.getNumPartitions() == len(shards)
    return materialize_then_rm(
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.sum(F.expr(h31_spark("text"))).alias("text_digest"),
        )
        .orderBy("lang"),
        root,
    )


@register(
    "v15_corrupt_csv",
    # the oracle states the malformed-row semantics directly over the
    # source rows the CSV was rendered from: a row is corrupt iff its
    # acct field was written unparseable (c_custkey % 7 = 0), clean rows
    # keep their exact cents value — so the driver hash proves the
    # PERMISSIVE read classified and null-filled EXACTLY those rows
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CASE WHEN c_custkey % 7 = 0 THEN NULL
                         ELSE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                    END) AS BIGINT) AS clean_cents,
           CAST(SUM(CASE WHEN c_custkey % 7 = 0 THEN c_custkey END) AS BIGINT)
             AS corrupt_key_sum
    FROM customer
    """,
    tags=("statement", "source", "csv", "robustness"),
)
def v15_corrupt_csv(spark, sf_dir):
    """Malformed-record CSV ingestion: the three Spark reader modes over a
    shard with unparseable rows — the ingest reality of external corpora
    (a 100 TB crawl drop always carries rows that don't parse; a reader
    that aborts the job on row 3 billion, or silently drops rows with no
    audit trail, is operationally useless).

    A CSV is rendered from ``customer`` with every ``c_custkey % 7 = 0``
    row carrying an unparseable acct field ('N/A' in a BIGINT column).
    The PERMISSIVE read null-fills the bad field, keeps the parseable
    columns of the same row (corrupt_key_sum proves the keys of corrupt
    rows survive), and captures the raw line in ``_corrupt`` for the
    quarantine audit; FAILFAST on the same shard must raise, and
    DROPMALFORMED must count exactly n_rows - n_corrupt (both asserted
    in-plan below).  Beyond-reference: the reference CSV reader has no
    malformed-row policy (src/storage/csv.rs parses trusting arrow);
    this extends the §2.1 source family (v04 is the clean-CSV twin).

    Scale shape: classification is per-row in the scan itself (no extra
    pass, no shuffle until the audit aggregate); the corrupt-row audit
    table is a filter over the same scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    rendered = cust.select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("N/A"))
        .otherwise(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint").cast("string")
        )
        .alias("acct_cents"),
    )
    root = tempfile.mkdtemp(prefix="sqlrs_badcsv_")
    out = os.path.join(root, "customer_csv")
    rendered.write.mode("overwrite").option("header", "true").csv(out)

    schema = "c_custkey bigint, c_name string, acct_cents bigint, _corrupt string"
    read = lambda mode: (  # noqa: E731
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
    )
    permissive = read("PERMISSIVE").cache()
    # Mode contract, asserted on the same shard.  The probes aggregate the
    # TYPED bad column on purpose: a count() prunes every column, the CSV
    # parser then never attempts the failing cast, and neither mode
    # triggers (measured: FAILFAST.count() returns happily) — the same
    # pruning that makes clean scans fast makes malformedness lazy.
    # Laziness goes further for STRUCTURAL malformation (wrong field
    # count): those rows trip FAILFAST only when EVERY schema column is
    # materialized — even sum(<the missing column>) sails past a short
    # row (measured by the corrupt-CSV fuzz family, test_differential).
    # v15's corrupt rows are type-malformed, so the one-column probe
    # here is sufficient.
    try:
        read("FAILFAST").agg(F.sum("acct_cents")).collect()
        raise AssertionError("FAILFAST accepted a malformed shard")
    except AssertionError:
        raise
    except Exception as e:  # expected: malformed-record abort
        msg = str(e).upper()
        assert "MALFORMED" in msg or "FAILFAST" in msg, e
    n_total = permissive.count()
    n_corrupt = permissive.filter(F.col("_corrupt").isNotNull()).count()
    # … and DROPMALFORMED silently keeps exactly the clean rows.
    # count(lit(1)), not count(c_custkey): a NULL source key renders as an
    # empty CSV field, parses back as a clean NULL row, and must still be
    # counted as KEPT (r8 star-schema sweep); the sum() keeps the typed
    # bad column aggregated so the parse isn't pruned away (comment above)
    n_kept = (
        read("DROPMALFORMED")
        .agg(F.count(F.lit(1)), F.sum("acct_cents"))
        .collect()[0][0]
    )
    assert n_kept == n_total - n_corrupt, (n_kept, n_total, n_corrupt)

    out = materialize_then_rm(
        permissive.agg(
            F.count("*").alias("n_rows"),
            F.sum((F.col("_corrupt").isNotNull()).cast("bigint")).alias("n_corrupt"),
            F.sum(
                F.when(F.col("_corrupt").isNull(), F.col("acct_cents"))
            ).cast("bigint").alias("clean_cents"),
            F.sum(
                F.when(F.col("_corrupt").isNotNull(), F.col("c_custkey"))
            ).cast("bigint").alias("corrupt_key_sum"),
        ),
        root,
    )
    permissive.unpersist()
    return out


@register(
    "x34_dynamic_partition_pruning",
    # the oracle restates the runtime-pruned join over the ORIGINAL rows:
    # a day participates iff its md5-derived tag is 1 — the same
    # derivation the dim table carries, computable in both engines
    oracle="""
    WITH tagged AS (
      SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM tagged
    WHERE (('0x'||substr(md5(day),1,15))::BIGINT) % 5 = 1
    """,
    tags=("extension", "source", "join", "pruning"),
)
def x34_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning: the fact's partition directories are
    selected at RUNTIME by the dim side of a join — the scan cannot be
    statically pruned (v11's case) because which days survive is only
    known after the dim's filter runs.  At 100 TB this is the difference
    between scanning a date-partitioned corpus wholesale and touching
    only the partitions a (runtime-derived) calendar selection names:
    Spark plans a DPP subquery that reuses the dim broadcast and injects
    the surviving day list into the fact scan's PartitionFilters
    (asserted in test_plans — `dynamicpruning` must appear under the
    fact scan, with the partition count reduced).

    Shape: events written day-partitioned (one shuffle on day, the v11
    small-files discipline); a (day, tag) dim derived once and read back
    from parquet so the tag filter is a real scan predicate, not a
    foldable constant; the join aggregates only the ~1/5 of partitions
    whose md5-derived tag is 1.  Beyond-reference (the reference scans
    whole tables; SURVEY §2.1).
    """
    from sqlrs_spark.functions.hashing import md5int_spark

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    # v11's stable-scratch discipline: lazy plan => no mkdtemp-per-call
    root = os.path.join(tempfile.gettempdir(), f"sqlrs_scratch_x34_{os.getuid()}")
    app = spark.sparkContext.applicationId
    fact_dir = os.path.join(root, app, "events_by_day")
    dim_dir = os.path.join(root, app, "day_dim")
    try:
        import shutil as _shutil
        import time as _time

        for sib in os.listdir(root):
            p = os.path.join(root, sib)
            if sib != app and _time.time() - os.path.getmtime(p) > 86400:
                _shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    ev.repartition("day").write.mode("overwrite").partitionBy("day").parquet(fact_dir)
    (
        ev.select("day")
        .distinct()
        .selectExpr("day", f"{md5int_spark('day')} % 5 AS dtag")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(dim_dir)
    )
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("dtag") == 1)
    return fact.join(dim, "day").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("day").alias("n_days"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )
