"""Real Structured Streaming execution (SURVEY.md §2.B-9 stream mode).

Replays the events fixture through `readStream` (file source) with an
event-time watermark, runs the same tumbling aggregation as
`event_windows.tumbling`, and drains it with an availableNow trigger into a
memory sink. Registered ROWS-ONLY — the batch twin carries the EXACT oracle.

Production-scale design (documented, config-level):
- watermark `10 minutes` bounds state; late rows beyond it are dropped;
- state store: RocksDB provider for large keyspaces
  (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`);
- sink: `writeStream.format("parquet")` with checkpointing for exactly-once;
  memory sink here is test harness only.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..session import tune

# Raw parquet schema (ts is int64 nanos on disk; see catalog.table).
_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture as a streaming DataFrame (file source, explicit schema)."""
    tune(spark)
    # FileStreamSource needs a directory; narrow to the events file via glob.
    raw = (
        spark.readStream.schema(_EVENTS_RAW)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


@register("stream_live_tumbling")  # ROWS-ONLY: real streaming execution
def live_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end micro-batch run: readStream → watermark → tumbling window →
    memory sink, drained with availableNow and returned as a batch result."""
    ev = streaming_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    name = f"live_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sdu-stream-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    return spark.table(name)


@register(
    "stream_stateful_counter",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``: a
    per-user running (count, sum) accumulator — the harness for any
    user-defined state machine Spark's built-in aggregates can't express
    (charter: "applyInPandasWithState for custom stateful operators").

    State = one (count, sum) pair per user key, updated per micro-batch from
    Arrow record batches; NoTimeout keeps state forever (a production
    deployment bounds it with event-time timeouts + RocksDB state store).
    The whole fixture drains in one availableNow pass, so the emitted final
    state must equal the batch GROUP BY — which gives this streaming
    operator a true EXACT oracle instead of the usual ROWS-ONLY waiver.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = streaming_events(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        cnt, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            tot += float(pdf["value"].sum())
        state.update((cnt, tot))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "total_value": [round(tot, 4)]}
        )

    counted = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="cnt long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_counter_{uuid.uuid4().hex[:8]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sdu-stream-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    # One batch per availableNow drain of a single file → the memory sink
    # holds exactly one (final) row per user. A multi-batch replay would
    # append per-batch updates; dedup to the last emission per key would
    # then be required — keep the max-count row per user for robustness.
    sunk = spark.table(name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sunk.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
