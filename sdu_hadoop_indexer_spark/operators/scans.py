"""Sources & sinks (SURVEY.md §2.B-1).

Generalizes the reference's input layer — a line-oriented text scan
(`FileInputFormat.setInputPaths`, App.scala:28,248) whose every record is
``split("\t", 2)``-parsed into (title, body) (App.scala:151-152) — and its
sink, a pre-delete-then-write text output (App.scala:249,261-263).

Scale notes: Parquet scans get predicate pushdown + column pruning from
Catalyst (verified in tests via PushedFilters/ReadSchema in the plan); the
sink uses ``mode("overwrite")`` which replaces the reference's manual
``FileSystem.delete`` (App.scala:261-263) with an atomic-per-partition commit
protocol that scales to thousands of writers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..session import app_sink_dir


@register("scan_parquet", oracle="SELECT * FROM lineitem")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full columnar scan of the fact table (R1)."""
    return table(spark, sf_dir, "lineitem")


@register(
    "scan_text_parse",
    oracle="""
    WITH lines AS (
        SELECT CAST(doc_id AS VARCHAR) || chr(9) || text AS line FROM documents
    )
    SELECT split_part(line, chr(9), 1) AS doc_title,
           substr(line, strpos(line, chr(9)) + 1) AS body
    FROM lines
    """,
)
def scan_text_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference input contract (R1+R2): one line per doc, tab-split in two.

    Round-trips documents through the reference's wire format
    (``title \t body``, App.scala:151-152) and re-parses it: first-tab split,
    title must contain no tab — the reference's implicit contract.
    """
    lines = table(spark, sf_dir, "documents").select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text")).alias("line")
    )
    return lines.select(
        F.substring_index("line", "\t", 1).alias("doc_title"),
        F.expr("substring(line, instr(line, '\t') + 1)").alias("body"),
    )


@register(
    "scan_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def scan_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction from the event stream's props column."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register("scan_csv_roundtrip", oracle="SELECT * FROM nation")
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source demonstration: the dimension table round-trips through a
    header CSV and is read back with the ORIGINAL schema applied explicitly
    (schema-on-read: inference is a two-pass anti-pattern at scale; a real
    pipeline pins the DDL). EXACT oracle against the parquet source proves
    the format conversion is lossless for this schema."""
    out = app_sink_dir(spark, "nation_csv", "SPARK_GRAFT_CSV_DIR")
    src = table(spark, sf_dir, "nation")
    src.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(src.schema).option("header", True).csv(out)


@register(
    "sink_partitioned_pruned",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def sink_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned sink + partition-PRUNED read-back: the filter on
    the partition column must resolve at planning time to a directory listing
    (PartitionFilters in the scan node — asserted in tests), so a 100 TB
    table scans only the requested partition. EXACT oracle over the source
    proves the round trip."""
    out = app_sink_dir(spark, "orders_partitioned", "SPARK_GRAFT_PART_DIR")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    return back.select(*src.columns)


@register(
    "sink_bucketed_join",
    oracle="""
    WITH tok AS (
        SELECT u.doc_id, CAST(u.pos AS INTEGER) AS pos, u.term
        FROM (
            SELECT doc_id,
                   unnest(range(len(string_split_regex(lower(text), '\\s+')))) AS pos,
                   unnest(string_split_regex(lower(text), '\\s+')) AS term
            FROM documents
        ) u
        WHERE u.term <> ''
    ),
    flat AS (
        SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
    ),
    dls AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)
    SELECT f.term, f.doc_id, f.tf, d.dl
    FROM flat f JOIN dls d USING (doc_id)
    """,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join — the cluster-scale index layout
    (SURVEY.md §7 known-hard item 4: "bucketed/partitioned index layout").

    The flat index and the doc-length table are both written bucketed by
    doc_id into the warehouse; the ranking join (the BM25 shape) then needs
    NO exchange on either side — bucket co-location replaces the shuffle,
    which at 100 TB is the difference between a metadata operation and
    moving the whole index over the network. Tests assert the joined plan
    has zero Exchange nodes. EXACT oracle proves the bucketed round trip
    loses nothing."""
    from ..text.indexer import doclen, index_flat

    n_buckets = 8
    spark.sql("CREATE DATABASE IF NOT EXISTS sdu_bucketed")
    flat = index_flat(spark, sf_dir).select("term", "doc_id", "tf")
    dl = doclen(spark, sf_dir)
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "/tmp/sdu-spark-warehouse"
    ).removeprefix("file:")
    for df, name in ((flat, "flat_idx"), (dl, "doc_len")):
        spark.sql(f"DROP TABLE IF EXISTS sdu_bucketed.{name}")
        # a previous session's managed-table dir survives its metastore —
        # clear the location too or saveAsTable raises LOCATION_ALREADY_EXISTS
        shutil.rmtree(f"{warehouse}/sdu_bucketed.db/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, "doc_id")
            .sortBy("doc_id")
            .saveAsTable(f"sdu_bucketed.{name}")
        )
    f = spark.table("sdu_bucketed.flat_idx")
    d = spark.table("sdu_bucketed.doc_len")
    return f.join(d, "doc_id").select("term", "doc_id", "tf", "dl")


@register(
    "sink_parquet",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overwrite parquet sink + read-back (R13) — EXACT oracle: the
    partitioned round-trip must reproduce the source table bit-for-bit
    (round-2 upgrade from the round-1 ROWS-ONLY row).

    The reference deleted its output dir by hand before the job
    (App.scala:261-263); ``mode("overwrite")`` is the engine-level equivalent.
    """
    out = app_sink_dir(spark, "orders_by_status", "SPARK_GRAFT_SINK_DIR")
    src = table(spark, sf_dir, "orders")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    return spark.read.parquet(out).select(*cols)


@register(
    "scan_schema_merge",
    oracle="""
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet batches written with DIFFERENT
    schemas (the second adds o_orderpriority — the standard situation when a
    long-lived 100 TB table gains columns) are read as ONE relation with
    `mergeSchema=true`; old rows surface NULL for the new column. The oracle
    is the explicit NULL-padded UNION ALL. At cluster scale schema merge is
    a footer-only planning step — no data rewrite — which is exactly why
    column-add is the cheap evolution path for parquet lakes."""
    out = app_sink_dir(spark, "orders_evolving", "SPARK_GRAFT_MERGE_DIR")
    src = table(spark, sf_dir, "orders")
    v1 = src.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = src.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(f"{out}/batch=1")
    v2.write.mode("overwrite").parquet(f"{out}/batch=2")
    back = spark.read.option("mergeSchema", True).parquet(
        f"{out}/batch=1", f"{out}/batch=2"
    )
    return back.select("o_orderkey", "o_totalprice", "o_orderpriority")


@register("scan_orc_roundtrip", oracle="SELECT * FROM supplier")
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink demonstration: the supplier dimension round-trips
    through ORC (the other big columnar lake format — same pushdown/pruning
    machinery as parquet in Spark's DSv1 path) and is read back with the
    original schema pinned. EXACT oracle against the parquet source proves
    the conversion is lossless for this schema."""
    out = app_sink_dir(spark, "supplier_orc", "SPARK_GRAFT_ORC_DIR")
    src = table(spark, sf_dir, "supplier")
    src.write.mode("overwrite").orc(out)
    return spark.read.schema(src.schema).orc(out)


@register("scan_jsonl_roundtrip", oracle="SELECT * FROM customer")
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink: the customer dimension round-trips through
    newline-delimited JSON (the interchange format of most crawl/training
    corpora) and is read back schema-pinned — inference is a second full
    pass at 100 TB, so a real pipeline always supplies the DDL. Doubles
    survive exactly (shortest-roundtrip serialization both ways). EXACT
    oracle against the parquet source."""
    out = app_sink_dir(spark, "customer_jsonl", "SPARK_GRAFT_JSONL_DIR")
    src = table(spark, sf_dir, "customer")
    src.write.mode("overwrite").json(out)
    return spark.read.schema(src.schema).json(out)


@register(
    "sink_merge_upsert",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0
                THEN o_totalprice + 1000.0 ELSE o_totalprice
           END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN 'P' ELSE o_orderstatus
           END AS o_orderstatus
    FROM orders
    """,
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style MERGE/upsert compaction on a parquet lake: a base snapshot
    and a delta batch (10% of keys re-priced and re-statused) are staged as
    versioned parquet, read back as one relation, and compacted to
    latest-version-per-key with a row_number window — the keep-latest
    pattern every mutable-table-on-immutable-files pipeline runs (Delta/
    Iceberg MERGE does exactly this inside its file rewrite).

    Scale shape: ONE shuffle on the merge key for the window; at table
    scale the base side would be bucketed by key (`sink_bucketed_join`
    layout) making compaction shuffle-free. The oracle is the closed-form
    spec (base with delta rows substituted) — an independent formulation,
    not the same plan."""
    from pyspark.sql import Window

    out = app_sink_dir(spark, "orders_upsert", "SPARK_GRAFT_MERGE_UPSERT_DIR")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = src.withColumn("version", F.lit(0))
    delta = (
        src.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            # +1000.0, not round(x*1.1,2): a single IEEE add is bit-identical
            # across engines; round() tie-breaking on doubles is not
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
            F.lit("P").alias("o_orderstatus"),
        )
        .withColumn("version", F.lit(1))
    )
    base.write.mode("overwrite").parquet(f"{out}/batch=0")
    delta.write.mode("overwrite").parquet(f"{out}/batch=1")
    merged = spark.read.parquet(f"{out}/batch=0", f"{out}/batch=1")
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


@register(
    "sink_acid_merge",
    oracle="""
    WITH upd1 AS (
        SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 3
        UNION ALL
        SELECT c_custkey + 10000000,
               'new-' || CAST(c_custkey AS VARCHAR), 1000.0
        FROM customer WHERE c_custkey % 97 = 5
    ),
    after1 AS (
        SELECT * FROM upd1
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM upd1)
    ),
    upd2 AS (
        SELECT c_custkey, c_name, c_acctbal - 50.0 AS c_acctbal
        FROM after1 WHERE c_custkey % 10 = 7
    )
    SELECT c_custkey, c_name, round(c_acctbal, 2) + 0.0 AS c_acctbal
    FROM (
        SELECT * FROM upd2
        UNION ALL
        SELECT * FROM after1
        WHERE c_custkey NOT IN (SELECT c_custkey FROM upd2)
    )
    """,
)
def sink_acid_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE ACID MERGE on the minimal transaction-log table format
    (`sdu_hadoop_indexer_spark.acid` — Delta-protocol commit semantics:
    atomic exclusive-create commits, optimistic concurrency, snapshot
    isolation, copy-on-write with file-level min/max pruning; see that
    module for the 100 TB argument). Upgrades `sink_merge_upsert`'s
    keep-latest *simulation* to real commit-log semantics, closing the
    round-2 "real ACID table format" gap without external jars.

    Two sequential MERGEs against a customer snapshot: (1) re-price 10% of
    keys AND insert new high-key rows (update+insert in one batch),
    (2) discount a different 10% — then the final snapshot is returned and
    gate-compared against the closed-form relational spec (an independent
    formulation: the oracle never sees the log). The log's pruning/
    isolation invariants are pinned separately in tests/test_acid.py."""
    import tempfile

    from .. import acid

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    tbl = tempfile.mkdtemp(prefix="sdu-acid-") + "/customers"
    acid.create_table(c, tbl, "c_custkey", n_files=8)
    upd1 = c.where(F.col("c_custkey") % 10 == 3).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
    ).unionByName(
        c.where(F.col("c_custkey") % 97 == 5).select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("c_custkey").cast("string")).alias(
                "c_name"
            ),
            F.lit(1000.0).alias("c_acctbal"),
        )
    )
    acid.merge_upsert(spark, tbl, upd1, "c_custkey")
    after1 = acid.read_table(spark, tbl)
    upd2 = after1.where(F.col("c_custkey") % 10 == 7).select(
        "c_custkey", "c_name", (F.col("c_acctbal") - 50.0).alias("c_acctbal")
    )
    acid.merge_upsert(spark, tbl, upd2, "c_custkey")
    return acid.read_table(spark, tbl).select(
        "c_custkey",
        "c_name",
        # + 0.0: acctbal can be negative; a tiny negative rounding to zero
        # is -0.0 in DuckDB vs +0.0 through Spark's BigDecimal round
        (F.round("c_acctbal", 2) + F.lit(0.0)).alias("c_acctbal"),
    )


PYDS_N = 10_000
PYDS_PARTS = 8
_PYDS_STEP = -(-PYDS_N // PYDS_PARTS)


@register(
    "scan_python_datasource",
    oracle=f"""
    SELECT i AS id,
           CAST(floor(i / {_PYDS_STEP}) AS INTEGER) AS part,
           (i * i % 97) / 10.0 AS val
    FROM range({PYDS_N}) t(i)
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM SOURCE via the Python DataSource API (Spark 4): a synthetic
    sequence source that plans its own input partitions — each of the
    {PYDS_PARTS} `InputPartition`s carries a [start, end) range and executors
    read their slice independently, exactly how a real connector (REST
    cursor, kafka-like offsets, proprietary store) parallelizes. The rows
    are a pure function of `id`, so DuckDB's `range()` reproduces them for
    an EXACT oracle. No JVM code: the source registers per-session and
    ships to executors via pickle."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _SeqPartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _SeqReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", PYDS_N))
            self.step = int(options.get("step", _PYDS_STEP))

        def partitions(self):
            return [
                _SeqPartition(lo, min(self.n, lo + self.step))
                for lo in range(0, self.n, self.step)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield (i, partition.start // self.step, (i * i % 97) / 10.0)

    class SyntheticSeqSource(DataSource):
        @classmethod
        def name(cls):
            return "sdu_synthetic_seq"

        def schema(self):
            return "id bigint, part int, val double"

        def reader(self, schema):
            return _SeqReader(self.options)

    spark.dataSource.register(SyntheticSeqSource)
    return (
        spark.read.format("sdu_synthetic_seq")
        .option("n", PYDS_N)
        .option("step", _PYDS_STEP)
        .load()
    )


ZORDER_BITS = 16
ZORDER_FILES = 8
# The 2D box the registered query probes (narrow in BOTH dims — the case
# where a single-column sort layout cannot prune). Anchored at the low
# corner of the key space so it selects rows at every fixture scale
# (keys grow with sf; see TESTDATA.md).
ZORDER_BOX = {"pk_lo": 10, "pk_hi": 150, "sk_lo": 1, "sk_hi": 8}


def _z_value(c1, c2, bits: int = ZORDER_BITS):
    """Bit-interleaved Morton code of two integer columns — pure JVM
    shift/mask expressions, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(c1, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(c2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zorder_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem Z-ORDERED on (l_partkey, l_suppkey): range-partition +
    sort by the Morton code so each output file covers a small RECTANGLE of
    the 2D key space rather than a stripe — multi-dimensional data skipping
    from plain parquet min/max stats, no table format required. At 100 TB
    this is the layout that lets a (part, supplier) point lookup touch a
    handful of files; the pruning factor is asserted from the real file
    footers in tests/test_zorder.py."""
    out = app_sink_dir(spark, "lineitem_zorder", "SPARK_GRAFT_ZORDER_DIR")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    z = _z_value(F.col("l_partkey").cast("long"), F.col("l_suppkey").cast("long"))
    (
        li.withColumn("zval", z)
        .repartitionByRange(ZORDER_FILES, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


@register(
    "sink_zorder_scan",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_partkey BETWEEN {ZORDER_BOX["pk_lo"]} AND {ZORDER_BOX["pk_hi"]}
      AND l_suppkey BETWEEN {ZORDER_BOX["sk_lo"]} AND {ZORDER_BOX["sk_hi"]}
    """,
)
def sink_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip proof for the z-ordered layout: write, then answer a 2D
    box predicate from the layout — EXACT vs the source table (losslessness);
    the file-level pruning factor is proven separately from parquet footers."""
    out = write_zorder_layout(spark, sf_dir)
    b = ZORDER_BOX
    return spark.read.parquet(out).where(
        (F.col("l_partkey").between(b["pk_lo"], b["pk_hi"]))
        & (F.col("l_suppkey").between(b["sk_lo"], b["sk_hi"]))
    )


LOOKUP_TERMS = ("spark", "hash")
TERM_BUCKETS = 8


@register(
    "sink_term_bucketed_lookup",
    oracle=f"""
    WITH tok AS (
        SELECT u.doc_id, u.term
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS term
            FROM documents
        ) u
        WHERE u.term <> ''
    )
    SELECT term, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tf) AS BIGINT) AS total_tf
    FROM (
        SELECT term, doc_id, count(*) AS tf
        FROM tok
        WHERE term IN {LOOKUP_TERMS!r}
        GROUP BY term, doc_id
    )
    GROUP BY term
    """,
)
def sink_term_bucketed_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED search index (VERDICT r1 item 7 / SURVEY §7 hard item 4):
    the flat postings index persisted as a table BUCKETED AND SORTED BY
    TERM, then probed with a term-equality lookup. Bucket pruning turns the
    lookup into a read of SelectedBucketsCount/8 buckets (pinned in
    tests/test_plans.py) — at 100 TB, a term query touches 1/N of the index
    files from metadata alone, before any row is read; this is the layout
    `text_tf_idf`/`text_bm25` would consume instead of re-deriving postings
    from the corpus per query. The probe aggregates per term, so the bucketed
    distribution also makes the aggregation Exchange-free — the scan stays
    `Bucketed: true` instead of being planner-disabled. EXACT oracle proves
    the stored round trip."""
    from ..text.indexer import index_flat

    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS sdu_bucketed")
    tbl = "sdu_bucketed.term_index"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "/tmp/sdu-spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{warehouse}/sdu_bucketed.db/term_index", ignore_errors=True)
    (
        index_flat(spark, sf_dir)
        .select("term", "doc_id", "tf")
        .write.mode("overwrite")
        .bucketBy(TERM_BUCKETS, "term")
        .sortBy("term")
        .saveAsTable(tbl)
    )
    return (
        spark.table(tbl)
        .where(F.col("term").isin(*LOOKUP_TERMS))
        .groupBy("term")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tf").alias("total_tf"),
        )
    )


# Row-level expectations for the orders feed (dead-letter pattern). The
# price cap is deliberately set inside the fixture's value range so the
# quarantine path is non-empty at every scale factor.
QUARANTINE_PRED = (
    "o_totalprice > 0 AND o_totalprice <= 300000 "
    "AND o_orderstatus IN ('F', 'O', 'P')"
)


@register(
    "sink_quarantine_split",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE {QUARANTINE_PRED}
    """,
)
def sink_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations with a DEAD-LETTER sink: every row either
    passes the declared constraints and flows on, or is diverted to a
    quarantine parquet dir with its violation reason — the
    validate-don't-drop pattern every production ingest runs, so bad rows
    are auditable instead of silently vanishing. Both branches are
    partition-local filters of one scan (no shuffle); the quarantine write
    is the only extra cost and is proportional to the violation rate.
    tests/test_quarantine.py asserts the two branches partition the input
    exactly."""
    out = app_sink_dir(spark, "orders_quarantine", "SPARK_GRAFT_QUARANTINE_DIR")
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    valid = src.where(QUARANTINE_PRED)
    rejected = src.where(f"NOT ({QUARANTINE_PRED})").withColumn(
        "violation",
        F.when(~F.col("o_totalprice").between(0.01, 300000), "price_out_of_range")
        .when(~F.col("o_orderstatus").isin("F", "O", "P"), "unknown_status")
        .otherwise("other"),
    )
    rejected.write.mode("overwrite").parquet(out)
    return valid


@register(
    "sink_dynamic_overwrite",
    oracle="""
    SELECT event_id, event_type, user_id,
           CASE WHEN event_type IN ('click', 'view') THEN value * 2
                ELSE value END AS value
    FROM events
    """,
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: a restatement job rewrites ONLY the
    partitions it produced rows for (here click/view, with doubled values),
    leaving every other partition's files untouched — the idempotent
    backfill primitive for a 100 TB partitioned lake, where static overwrite
    mode would truncate the whole table. `partitionOverwriteMode=dynamic` is
    a writer option, so concurrent jobs restating disjoint partitions don't
    clobber each other. EXACT oracle over the merged read-back (value*2 is
    exact in binary floating point — no rounding needed).
    """
    out = app_sink_dir(spark, "events_dyn_overwrite", "SPARK_GRAFT_DYNOVR_DIR")
    base = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    base.write.mode("overwrite").partitionBy("event_type").parquet(out)
    restated = base.where(F.col("event_type").isin("click", "view")).withColumn(
        "value", F.col("value") * 2
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(out)
    )
    return spark.read.parquet(out).select("event_id", "event_type", "user_id", "value")


# scan_binary_files / scan_file_metadata have no DuckDB *view* twin (they
# read the filesystem directly), so their ORACLE strings — frozen at import
# time by the driver contract — embed this directory. The SPARK side now
# derives the dir from its sf_dir argument (round-3 verdict: the old shared
# sf0.001 pin meant benching at another SF silently measured sf0.001).
# Lockstep rule: the oracle dir defaults to the DRIVER's gate fixture
# (sf0.01, TESTDATA.md); a local mirror running at another SF exports
# SPARK_GRAFT_FILE_SCAN_DIR=<sf_dir> BEFORE importing the registry
# (tools/check_oracle.py and tools/schema_audit.py both do) so the two
# engine sides always read the same files.
FILE_SCAN_DIR = os.environ.get(
    "SPARK_GRAFT_FILE_SCAN_DIR", "/root/testdata/sf0.01"
)


@register(
    "scan_binary_files",
    oracle=f"""
    SELECT parse_filename(filename) AS fname, size AS length
    FROM read_blob('{FILE_SCAN_DIR}/*.parquet')
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingest (`binaryFile` source) — the entry point for
    multimodal corpora (images/audio/video land as (path, bytes) rows that
    `multimodal.media` then decodes via mapInPandas).

    One row per file with content as an opaque BINARY column; the scan
    parallelizes per file and `spark.sql.files.maxPartitionBytes` does not
    split files (whole-file semantics). Only (fname, length) are emitted
    here: the driver gate needs scalar columns, and DuckDB 1.0's md5()
    can't hash raw BLOBs for a content oracle. The Spark side scans
    ``sf_dir``; see ``FILE_SCAN_DIR`` for how the oracle stays in lockstep.
    """
    df = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        "length",
    )


@register(
    "scan_file_metadata",
    oracle=f"""
    SELECT parse_filename(filename) AS fname,
           count(*) AS n_rows,
           min(file_row_number) AS first_idx,
           max(file_row_number) AS last_idx
    FROM read_parquet('{FILE_SCAN_DIR}/orders.parquet',
                      filename=true, file_row_number=true)
    GROUP BY parse_filename(filename)
    """,
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden `_metadata` columns (file_name, row_index) — file-level
    lineage surfaced relationally: per-file row counts and row-index
    ranges without a separate listing job. The lakehouse audit primitive
    (which file produced this row?) and the basis of row-level
    idempotent re-ingest. Like `scan_binary_files`, the Spark side scans
    ``sf_dir`` and the oracle embeds ``FILE_SCAN_DIR`` (same dir under the
    driver gate and under the env-exporting local mirrors).
    """
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return df.groupBy(F.col("_metadata.file_name").alias("fname")).agg(
        F.count("*").alias("n_rows"),
        F.min("_metadata.row_index").alias("first_idx"),
        F.max("_metadata.row_index").alias("last_idx"),
    )


@register(
    "sink_codec_zstd",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, 'zstd' AS codec FROM customer
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal, 'snappy' AS codec FROM customer
    """,
)
def sink_codec_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar codec control: the same relation written with ZSTD and
    SNAPPY parquet compression, both read back losslessly. Codec choice is
    THE storage knob at 100 TB (zstd ≈ 30-40% smaller than snappy at
    slightly higher CPU — the archival default; snappy the hot-path
    default), and it is a writer OPTION, not a table property — mixed-codec
    files coexist in one table and readers never care.
    """
    base = app_sink_dir(spark, "codecs", "SPARK_GRAFT_CODEC_DIR")
    src = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    out = []
    for codec in ("zstd", "snappy"):
        path = f"{base}/{codec}"
        src.write.mode("overwrite").option("compression", codec).parquet(path)
        out.append(spark.read.parquet(path).withColumn("codec", F.lit(codec)))
    return out[0].unionAll(out[1])


@register(
    "sink_acid_timetravel",
    oracle="""
    SELECT 0 AS version, c_custkey, c_name,
           round(c_acctbal, 2) + 0.0 AS c_acctbal
    FROM customer WHERE c_custkey % 20 = 1
    UNION ALL
    SELECT 1 AS version, c_custkey, c_name,
           round(CASE WHEN c_custkey % 40 = 1 THEN c_acctbal + 10.0
                      ELSE c_acctbal END, 2) + 0.0 AS c_acctbal
    FROM customer WHERE c_custkey % 20 = 1
    """,
)
def sink_acid_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL on the ACID table format: after a MERGE commits version
    1, version 0 must still read back byte-for-byte unchanged (snapshot
    isolation made relational — the gate twin of `sink_acid_merge`, which
    only checks the FINAL state).

    Builds a customer-subset table, merges a +10.0 re-price of half its
    keys, then returns BOTH pinned snapshots under a `version` column. The
    oracle is the closed-form spec of each snapshot computed straight from
    the source relation — it never sees the log, so any isolation leak
    (the merge mutating files version 0 still references) hash-fails.
    Snapshot reads list files from the commit log only (object-store-safe,
    `acid.snapshot_files`), which is what makes pinned-version reads O(1)
    metadata at any table size."""
    import tempfile

    from .. import acid

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    ).where(F.col("c_custkey") % 20 == 1)
    tbl = tempfile.mkdtemp(prefix="sdu-acid-tt-") + "/customers"
    acid.create_table(c, tbl, "c_custkey", n_files=4)
    upd = c.where(F.col("c_custkey") % 40 == 1).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 10.0).alias("c_acctbal")
    )
    acid.merge_upsert(spark, tbl, upd, "c_custkey")
    out = []
    for v in (0, 1):
        out.append(
            acid.read_table(spark, tbl, version=v).select(
                F.lit(v).alias("version"),
                "c_custkey",
                "c_name",
                (F.round("c_acctbal", 2) + F.lit(0.0)).alias("c_acctbal"),
            )
        )
    return out[0].unionByName(out[1])


COMPACT_TARGET_BYTES = 1 << 20  # 1 MiB target at fixture scale


@register(
    "sink_compact_small_files",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — THE standing maintenance job of every
    file-based lakehouse: streaming/CDC ingestion produces thousands of
    KB-scale files whose per-file open/footer/task overhead eventually
    dominates scan cost; compaction rewrites them into target-size files.

    Simulates the pathology (the customer table scattered into 64 shards),
    then sizes the output from the MEASURED input bytes —
    ceil(total / {COMPACT_TARGET_BYTES}B) files via round-robin
    `repartition(n)` (uniform sizes; no key skew transfer) — and returns
    the compacted read-back. EXACT oracle against the source proves
    losslessness. At 100 TB the same job runs per partition/bucket with
    `maxRecordsPerFile` as the guard rail, and on the ACID format it
    commits as remove(small)+add(big) — same protocol as `acid.vacuum`'s
    retention story."""
    import math

    base = app_sink_dir(spark, "compact", "SPARK_GRAFT_COMPACT_DIR")
    src = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    small = f"{base}/small"
    src.repartition(64).write.mode("overwrite").parquet(small)
    total = sum(
        e.stat().st_size
        for e in os.scandir(small)
        if e.name.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / COMPACT_TARGET_BYTES))
    compacted = f"{base}/compacted"
    (
        spark.read.parquet(small)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(compacted)
    )
    return spark.read.parquet(compacted)
