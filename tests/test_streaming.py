"""Structured Streaming: real readStream run matches the batch twin."""

from __future__ import annotations

from sdu_hadoop_indexer_spark.streaming import event_windows, pipeline


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    live = {
        (r.window_start, r.event_type): r.n_events
        for r in pipeline.live_tumbling(spark, sf_dir).collect()
    }
    batch = {
        (r.window_start, r.event_type): r.n_events
        for r in event_windows.tumbling(spark, sf_dir).collect()
    }
    assert live == batch


def test_session_windows_end_after_start(spark, sf_dir):
    rows = event_windows.session(spark, sf_dir).collect()
    assert rows
    assert all(r.session_end > r.session_start for r in rows)


def test_dedup_unique_keys(spark, sf_dir):
    rows = event_windows.dedup_keep_first(spark, sf_dir).collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))
