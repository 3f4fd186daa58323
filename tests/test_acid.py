"""ACID-table-format invariants (sdu_hadoop_indexer_spark.acid): the commit
protocol claims the operator gate can't see — snapshot isolation / time
travel, optimistic-concurrency conflict detection, and copy-on-write
file-level pruning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sdu_hadoop_indexer_spark import acid


def _mk(spark, tmp_path, n=1000, files=8):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    tbl = str(tmp_path / "tbl")
    acid.create_table(df, tbl, "k", n_files=files)
    return tbl, df


def test_create_and_snapshot_roundtrip(spark, tmp_path):
    tbl, df = _mk(spark, tmp_path)
    got = acid.read_table(spark, tbl)
    assert got.count() == 1000
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    assert acid.latest_version(tbl) == 0


def test_merge_updates_and_inserts(spark, tmp_path):
    tbl, _ = _mk(spark, tmp_path)
    upd = spark.range(10).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    ).unionByName(
        spark.range(5000, 5003).select(
            F.col("id").alias("k"), F.lit(7).alias("v")
        )
    )
    res = acid.merge_upsert(spark, tbl, upd, "k")
    assert res["version"] == 1
    got = acid.read_table(spark, tbl)
    assert got.count() == 1003  # 1000 base + 3 inserts
    assert got.where(F.col("v") == -1).count() == 10
    assert got.where(F.col("k") >= 5000).count() == 3


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    tbl, _ = _mk(spark, tmp_path)
    upd = spark.range(10).select(F.col("id").alias("k"), F.lit(-1).alias("v"))
    acid.merge_upsert(spark, tbl, upd, "k")
    v0 = acid.read_table(spark, tbl, version=0)
    assert v0.where(F.col("v") == -1).count() == 0  # isolation: v0 unchanged
    assert v0.count() == 1000


def test_commit_conflict_detected(spark, tmp_path):
    """The optimistic-concurrency race: writer A computes its change set
    against snapshot v0, writer B commits v1 first, A's commit of v1 must
    fail atomically (exclusive create), never overwrite."""
    tbl, _ = _mk(spark, tmp_path)
    snapshot_a = acid.latest_version(tbl)  # A reads v0
    # B commits version 1 while A is still planning
    with open(acid._log_path(tbl, 1), "x") as fh:
        json.dump({"version": 1, "op": "MERGE", "add": [], "remove": []}, fh)
    upd = spark.range(5).select(F.col("id").alias("k"), F.lit(-1).alias("v"))
    with pytest.raises(acid.CommitConflict):
        acid.merge_upsert(spark, tbl, upd, "k", base_version=snapshot_a)
    # retry against the new head succeeds
    res = acid.merge_upsert(spark, tbl, upd, "k")
    assert res["version"] == 2


def test_merge_prunes_untouched_files(spark, tmp_path):
    """Copy-on-write must rewrite only key-range-overlapping files: a
    narrow update batch against 8 range-partitioned files may not touch
    them all, and untouched files must be carried by reference (same
    path in the new snapshot)."""
    tbl, _ = _mk(spark, tmp_path, n=1000, files=8)
    before = {f.path for f in acid.snapshot_files(tbl)}
    assert len(before) == 8
    upd = spark.range(3).select(F.col("id").alias("k"), F.lit(-1).alias("v"))
    res = acid.merge_upsert(spark, tbl, upd, "k")
    assert res["rewritten"] < 8 and res["carried"] > 0
    after = {f.path for f in acid.snapshot_files(tbl)}
    assert before & after  # carried files appear in both snapshots
    # and the rewrite preserved every row
    assert acid.read_table(spark, tbl).count() == 1000


def test_empty_update_is_a_noop(spark, tmp_path):
    tbl, _ = _mk(spark, tmp_path)
    empty = spark.range(0).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    res = acid.merge_upsert(spark, tbl, empty, "k")
    assert res["version"] == 0 and acid.latest_version(tbl) == 0
