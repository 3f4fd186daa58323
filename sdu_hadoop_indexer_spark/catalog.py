"""Fixture catalog: load the 10 parquet tables of an sf dir, register views.

Replaces the reference's input layer (a line-oriented text scan +
``split("\t", 2)`` parse, App.scala:151-152,248) with columnar Parquet scans.
Catalyst pushes predicates and prunes columns into these scans for free
(SURVEY.md §4.2) — verified in tests via ``explain`` (PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. All queries funnel through here.

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    timestamp type, so it is read as int64 nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and floor-converted to a
    microsecond timestamp here. Any cross-engine-compared output derived from
    it must still be truncated to second precision (FIXTURES.md parity trap 1).
    """
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) fixture variant
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # plain timestamp[us] fixture variant
            # Session tz is UTC (session.tune), so this cast is the identity
            # on the stored wall-clock instant — it only moves the type to
            # TIMESTAMP_LTZ so unix_micros/unix_timestamp/window() resolve.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() sees the catalog."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
