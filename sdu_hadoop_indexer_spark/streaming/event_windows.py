"""Event-time windowed operators (SURVEY.md §2.B-9), batch form.

Every query here uses the event-time primitives that run unchanged under
Structured Streaming (`F.window`, `F.session_window`, keyed dedup); the
driver's correctness gate runs them in batch, and `streaming.pipeline` re-runs
the tumbling one as a real `readStream` micro-batch job (t1 smoke / tests).

Scale notes (100 TB streams): state lives in the state store keyed by
(window, group) — at production scale use the RocksDB provider
(`spark.sql.streaming.stateStore.providerClass`) plus watermarks to bound
state; both are config, not plan changes. The batch plans below shuffle once
on the grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..operators.parity import SQL_EVENTS_US

_SUM_DEC = "CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE)"


@register(
    "stream_tumbling",
    oracle=f"""
    WITH {SQL_EVENTS_US}
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           {_SUM_DEC} AS sum_value
    FROM ev
    GROUP BY 1, 2
    """,
)
def tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window per event_type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@register(
    "stream_sliding",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    e2 AS (SELECT event_type, value,
                  CAST(floor(epoch(ts)) AS BIGINT) AS es
           FROM ev),
    w AS (SELECT event_type, value,
                 (es // 900) * 900 - k * 900 AS ws
          FROM e2 CROSS JOIN (SELECT unnest(range(4)) AS k))
    SELECT make_timestamp(ws * 1000000) AS window_start,
           event_type,
           count(*) AS n_events,
           {_SUM_DEC} AS sum_value
    FROM w
    GROUP BY 1, 2
    """,
)
def sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 15m slide): each event lands in 4 windows.

    Oracle derives the same 4 epoch-aligned starts arithmetically — Spark
    aligns windows to the epoch in the session timezone (UTC here).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@register(
    "stream_session",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
    ),
    sessions AS (
        SELECT user_id, ts, event_id, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           {_SUM_DEC} AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user.

    Spark semantics: session end = last event + gap; an event exactly at the
    gap boundary starts a NEW session ([start, end) half-open) — the oracle's
    gaps-and-islands flag uses `>=` to mirror that exactly.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_dedup",
    oracle=f"""
    WITH {SQL_EVENTS_US}
    SELECT event_id, user_id, event_type, ts FROM (
        SELECT event_id, user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM ev
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed keep-first dedup — the deterministic batch twin of streaming
    ``dropDuplicates(["user_id","event_type"])`` (which keeps an arbitrary
    first-seen row; here first = min event time, tie-broken by id)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@register(
    "stream_gapfill_rollup",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM ev
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS TIMESTAMP)
                   AS bucket
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM ev),
    actual AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
               count(*) AS n_events, {_SUM_DEC} AS sum_value
        FROM ev GROUP BY 1, 2
    )
    SELECT s.bucket, t.event_type,
           coalesce(a.n_events, 0) AS n_events,
           coalesce(a.sum_value, 0.0) AS sum_value
    FROM spine s CROSS JOIN types t
    LEFT JOIN actual a ON a.bucket = s.bucket AND a.event_type = t.event_type
    """,
)
def gapfill_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup with GAP FILL: a dense (hour × event_type)
    spine left-joined against the hourly aggregate, empty buckets zero-filled
    — the time-series materialization dashboards and downsampling pipelines
    need (a plain GROUP BY silently omits empty buckets).

    Scale shape: the spine is generated, not scanned — `sequence()` between
    the corpus min/max hour (two scalars from one agg) exploded into rows,
    cross-joined with the tiny distinct-type dim; the only wide shuffle is
    the hourly aggregation of the fact stream itself. Gap detection is a
    left join against a broadcastable spine, never a self-join."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,4)")).cast("double").alias("sum_value"),
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(actual, ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


CDC_KEYS = 500  # synthetic CDC key space


@register(
    "stream_cdc_apply",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    changes AS (
        SELECT user_id % {CDC_KEYS} AS k,
               CASE event_type WHEN 'purchase' THEN 'U'
                               WHEN 'error' THEN 'D'
                               ELSE 'I' END AS op,
               value AS v,
               printf('%020d-%019d', epoch_us(ts), event_id) AS seq
        FROM ev
    ),
    latest AS (
        SELECT k, op, v, seq,
               row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        FROM changes
    )
    SELECT k, v AS last_value, seq AS last_seq
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC materialization: fold an insert/update/delete change stream into
    final table state — keep each key's highest-sequence change, drop keys
    whose latest change is a delete. The batch form of what
    `stream_foreachbatch_upsert` does incrementally, and the consumer side
    of every Debezium/binlog-style ingestion pipeline.

    The change stream is synthesized deterministically from the event
    fixture (purchase→U, error→D, else I; sequence = the zero-padded
    (epoch_us, event_id) total-order string, so 'latest' is unambiguous on
    both engines). ONE ranking window per key — at 100 TB this is a single
    shuffle on the CDC key, the same cost as the upsert itself; a real
    deployment runs it per micro-batch against the ACID table
    (`acid.merge_upsert`) with tombstone handling exactly as modeled here."""
    ev = table(spark, sf_dir, "events")
    changes = ev.select(
        (F.col("user_id") % CDC_KEYS).alias("k"),
        F.when(F.col("event_type") == "purchase", "U")
        .when(F.col("event_type") == "error", "D")
        .otherwise("I")
        .alias("op"),
        F.col("value").alias("v"),
        F.format_string(
            "%020d-%019d", F.unix_micros("ts"), F.col("event_id")
        ).alias("seq"),
    )
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("k", F.col("v").alias("last_value"), F.col("seq").alias("last_seq"))
    )


TOPK_PER_WINDOW = 3


@register(
    "stream_windowed_topk",
    oracle=f"""
    WITH {SQL_EVENTS_US},
    c AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type, CAST(count(*) AS BIGINT) AS n_events
        FROM ev GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type) AS rk
        FROM c
    ) WHERE rk <= {TOPK_PER_WINDOW}
    """,
)
def windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window top-K leaderboard: the {TOPK_PER_WINDOW} busiest event
    types in every tumbling 1 h event-time window (count desc,
    event_type tiebreak) — the trending-now / hot-keys panel every
    event-stream dashboard serves.

    Same event-time-window discipline as `stream_tumbling` (this is its
    rank-gated reduction): in a live pipeline the windowed counts stream
    with a watermark and the rank gate runs in `foreachBatch` over the
    upserted window rows (ranking needs the window's FINAL counts, so it
    belongs in the sink batch, not the incremental state — the
    `stream_foreachbatch_upsert` pattern). Scale shape: one (window,
    type) hash agg (map-side combinable), then a window-keyed rank over
    the types-bounded reduction; all-integer, deterministic tiebreak."""
    ev = table(spark, sf_dir, "events")
    c = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
    )
    return c.withColumn("rk", rk.cast("long")).where(
        F.col("rk") <= TOPK_PER_WINDOW
    )
