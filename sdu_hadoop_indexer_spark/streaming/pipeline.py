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
