"""Sorts, limits, top-k, set operations (SURVEY.md §2.B-6).

The reference's only ordering is the shuffle sort on (word, doc)
(App.scala:105-111); here ordering is a first-class operator. Global
``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-partition
top-k then a k-row merge on the driver, the scalable form at 100 TB (no full
global sort materialization). Per-group top-k uses a ranking window, which
shuffles once on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (deterministic tie-break on o_orderkey, always)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (overlapping inputs on purpose — duplicates must survive)."""
    c = table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey", "c_mktsegment")
    b = c.where(F.col("c_acctbal") > 9000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a key ordering k times in 1995 and m
    times in 1996 survives min(k, m) times.

    Spark plans `intersectAll` as a grouped count per side + generate —
    one shuffle per side on the row value, no join explosion; survives
    100 TB the same way a groupBy does.
    """
    o = table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: multiplicities subtract (max(k - m, 0))
    instead of the distinct-set EXCEPT of `set_except`."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.exceptAll(b)


# Keyset cursor: the (o_totalprice, o_orderkey) of the last row of some
# previous page — fixed literals so the op is deterministic at every SF.
_KS_PRICE = 450000.0
_KS_KEY = 0
_KS_PAGE = 25


@register(
    "sort_keyset_pagination",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_totalprice < {_KS_PRICE!r}
       OR (o_totalprice = {_KS_PRICE!r} AND o_orderkey > {_KS_KEY})
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT {_KS_PAGE}
    """,
)
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — the scale-correct form of "page N of
    results ordered by X": resume strictly after the previous page's last
    (o_totalprice, o_orderkey) via a sargable predicate, never
    OFFSET·LIMIT.

    Why it matters at 100 TB: `ORDER BY … OFFSET k LIMIT p` must
    materialize and discard k rows EVERY page — O(k) per page, O(n²/p)
    for a full crawl. The keyset predicate is pushed to the parquet scan
    (min/max row-group pruning on o_totalprice) and the plan stays
    `TakeOrderedAndProject(p)` over the filtered scan — O(page) work per
    page regardless of depth, the only pagination that survives a deep
    crawl of a fact table. The strict total order (unique tie-break key
    in the cursor) is what makes pages non-overlapping and the result
    deterministic/oracle-able.
    """
    o = table(spark, sf_dir, "orders")
    after_cursor = (F.col("o_totalprice") < _KS_PRICE) | (
        (F.col("o_totalprice") == _KS_PRICE) & (F.col("o_orderkey") > _KS_KEY)
    )
    return (
        o.where(after_cursor)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(_KS_PAGE)
    )
