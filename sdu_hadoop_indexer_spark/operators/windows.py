"""Window functions (SURVEY.md §2.B-5).

The closest reference construct is the composite-key secondary sort
(TextPair.compareTo, App.scala:105-111) — a partition-then-order-within
pattern, which is precisely a Spark window spec. Everything else is new
surface.

Parity rules: every ORDER BY carries a unique tie-break column; window SUMs
over doubles accumulate in decimal (see parity.py) so frame evaluation order
can't shift the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .parity import SQL_EVENTS_US, sql_epoch_s, ratio


@register(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rn,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
    FROM customer
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w_det = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    w_val = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w_det).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
    )


@register(
    "win_lag_lead",
    oracle=f"""
    WITH {SQL_EVENTS_US}
    SELECT event_id, user_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM ev
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "win_running_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame (decimal-accumulated)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "win_range_frame",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    e2 AS (SELECT event_id, user_id, value, {sql_epoch_s('ts')} AS epoch_s FROM ev)
    SELECT event_id, user_id, epoch_s,
           CAST(sum(CAST(value AS DECIMAL(25,4)))
                OVER (PARTITION BY user_id ORDER BY epoch_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_1h
    FROM e2
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per-user sliding 1-hour sum over epoch secs."""
    ev = table(spark, sf_dir, "events")
    e2 = ev.select(
        "event_id", "user_id", "value", F.unix_timestamp("ts").alias("epoch_s")
    )
    w = Window.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-3600, 0)
    return e2.select(
        "event_id",
        "user_id",
        "epoch_s",
        F.sum(F.col("value").cast("decimal(25,4)")).over(w).cast("double").alias("sum_1h"),
    )


@register(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select("c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("quartile"))


@register(
    "win_first_last",
    oracle=f"""
    WITH {SQL_EVENTS_US}
    SELECT event_id, user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           nth_value(event_type, 2) OVER w AS second_type
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-navigation window family: first/last/nth over an explicit
    unbounded frame (the default frame for last_value — up to CURRENT ROW —
    is a classic cross-engine trap; pinning ROWS UNBOUNDED..UNBOUNDED makes
    both engines see the whole partition)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@register(
    "win_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN count(*) OVER wp = 1 THEN 0.0
                ELSE CAST(floor(CAST((row_number() OVER w - 1) * 2000000 + (count(*) OVER wp - 1) AS DOUBLE) / (2 * (count(*) OVER wp - 1))) AS DOUBLE) / 1000000.0
           END AS pr,
           CAST(floor(CAST((row_number() OVER w) * 2000000 + (count(*) OVER wp) AS DOUBLE) / (2 * (count(*) OVER wp))) AS DOUBLE) / 1000000.0 AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
           wp AS (PARTITION BY o_orderstatus)
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions: percent_rank and cume_dist per
    status partition — the distributional ranking pair (rank/ntile cover the
    ordinal side). Deterministic via the (o_totalprice, o_orderkey) total
    order; values rounded identically on both engines."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
    )
    wp = Window.partitionBy("o_orderstatus")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        # integer-ratio form (parity.ratio): the (o_totalprice, o_orderkey)
        # order is UNIQUE, so percent_rank ≡ (row_number-1)/(n-1) and
        # cume_dist ≡ row_number/n — ratios of ints, rounded boundary-proof
        # (engine round() implementations split on exact half boundaries)
        F.when(F.count("*").over(wp) == 1, F.lit(0.0))
        .otherwise(
            ratio(
                F.row_number().over(w) - 1, F.count("*").over(wp) - 1, 6
            )
        )
        .alias("pr"),
        ratio(F.row_number().over(w), F.count("*").over(wp), 6).alias("cd"),
    )


@register(
    "win_locf_fill",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    s AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM ev
    )
    SELECT user_id, event_id, {sql_epoch_s('ts')} AS ts_s,
           round(last_value(pv IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               + 0.0 AS last_purchase_value
    FROM s
    """,
)
def win_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF): carry each user's most recent purchase value
    onto every subsequent event via `last_value ... IGNORE NULLS` — the
    state-propagation window (sessionless attribution, sensor carry-
    forward). Rows before a user's first purchase stay NULL.

    One window pass over a per-user sort; at 100 TB the partition key is
    the user, so state never crosses executors and no broadcast exists.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("ts_s"),
        (
            F.round(F.last(pv, ignorenulls=True).over(w), 4) + F.lit(0.0)
        ).alias("last_purchase_value"),
    )


@register(
    "win_running_distinct",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    f AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM ev
    )
    SELECT user_id, event_id, {sql_epoch_s('ts')} AS ts_s,
           CAST(sum(is_first) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_seen
    FROM f
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user (how many distinct event types seen
    so far) — the window aggregate SQL engines don't support directly
    (`COUNT(DISTINCT) OVER` is invalid in both Spark and DuckDB).

    The O(n) first-occurrence rewrite: rank within (user, type) marks each
    type's first row, then a running SUM of the flags over the user
    timeline IS the running distinct count. Costs two window passes with
    different partition keys (one (user, type) exchange, one (user)
    exchange) — still linear, vs the quadratic correlated-subquery
    formulation. A `size(collect_set() OVER)` alternative is linear-pass
    but carries a growing set per row; the flag rewrite shuffles only
    bigints.
    """
    ev = table(spark, sf_dir, "events")
    wf = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wu = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_first = F.when(F.row_number().over(wf) == 1, 1).otherwise(0)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("ts_s"),
            is_first.alias("is_first"),
            F.col("ts"),
        )
        .select(
            "user_id",
            "event_id",
            "ts_s",
            F.sum("is_first").over(wu).cast("bigint").alias(
                "distinct_types_seen"
            ),
        )
    )


@register(
    "win_rolling_median",
    oracle=f"""
    WITH {SQL_EVENTS_US}
    SELECT event_id, event_type, {sql_epoch_s('ts')} AS ts_s,
           median(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
               AS med25
    FROM ev
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN over a 25-row window — a window aggregate Spark has
    no native function for (`median()` is grouped-only), rewritten as
    `sort_array(collect_list(...))` over the frame + middle-element
    arithmetic. The robust-location twin of the rolling mean in
    `events_anomaly_zscore` (medians shrug off the outliers that drag a
    mean).

    Cost note: the array rewrite carries O(frame) state per row — right
    for bounded ROWS frames (25 here); for unbounded or very wide frames
    the scale path is a two-heap/sketch `transformWithState` processor
    instead. Median of an even frame = mean of the two middles, the same
    IEEE `(a+b)/2` DuckDB interpolates, so the oracle stays EXACT.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list(F.col("value").cast("double")).over(w))
    n = F.size(arr)
    # collect_list drops NULLs: an all-NULL frame yields an EMPTY array, and
    # element_at(arr, 0) raises INVALID_INDEX_OF_ZERO — clamp the indices to
    # 1 and emit NULL when n == 0 (median of no observations), so nullable
    # inputs degrade instead of hard-failing (round-2 ADVICE).
    mid_lo = F.greatest(F.floor((n + 1) / 2).cast("int"), F.lit(1))
    mid_hi = F.greatest(F.floor((n + 2) / 2).cast("int"), F.lit(1))
    lo = F.element_at(arr, mid_lo)
    hi = F.element_at(arr, mid_hi)
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, lo)
        .otherwise((lo + hi) / 2.0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("ts_s"),
        med.alias("med25"),
    )
