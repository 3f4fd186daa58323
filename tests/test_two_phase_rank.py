"""Direct contract test for the shared two-phase global rank helper
(`llm.curation._two_phase_rank`) — the shape behind llm_global_sort_index,
llm_ppl_buckets, and llm_dsir_weights' selection flag.

The helper must reproduce `row_number() OVER (ORDER BY ...)` EXACTLY
(1-based, deterministic tiebreak) on inputs with heavy ties, negatives,
and skew, while keeping every Window partitioned (no "No Partition
Defined" WindowExec) — the registry-wide sweep pins the consumers; this
pins the helper itself, including the empty-relation guard.
"""

import pytest
from pyspark.sql import functions as F


def _reference_rank(rows, key_idx_desc):
    """Driver-side ground truth: 1-based rank by (value per direction, id)."""
    order = sorted(rows, key=lambda r: (-r[1] if key_idx_desc else r[1], r[0]))
    return {doc: i + 1 for i, (doc, _) in enumerate(order)}


@pytest.mark.parametrize(
    "values,desc",
    [
        # heavy ties: every two-phase bucket boundary lands inside a tie run
        ([5] * 40 + [3] * 40 + [7] * 20, True),
        # negatives + zeros, ascending
        (list(range(-25, 25)) * 2, False),
        # single distinct value (fully degenerate: one bucket)
        ([42] * 33, True),
        # skew: one huge value, rest tiny
        ([1] * 99 + [10**12], False),
    ],
)
def test_matches_global_row_number(spark, values, desc):
    from sdu_hadoop_indexer_spark.llm.curation import _two_phase_rank

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "doc_id: long, v: long")
    key = (-F.col("v").cast("double")) if desc else F.col("v").cast("double")
    order = [F.desc("v") if desc else F.asc("v"), F.asc("doc_id")]
    b, rank, n = _two_phase_rank(df, key, order)
    assert n == len(rows)
    got = {r.doc_id: r.rk for r in b.select("doc_id", rank.alias("rk")).collect()}
    assert got == _reference_rank(rows, desc)


def test_empty_relation(spark):
    from sdu_hadoop_indexer_spark.llm.curation import _two_phase_rank

    df = spark.createDataFrame([], "doc_id: long, v: long")
    b, rank, n = _two_phase_rank(df, F.col("v").cast("double"), ["v", "doc_id"])
    assert n == 0
    assert b.select("doc_id", rank.alias("rk")).collect() == []


def test_all_windows_partitioned(spark):
    from sdu_hadoop_indexer_spark.llm.curation import _two_phase_rank
    from tools.plan_audit import unpartitioned_windows

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17).alias("v")
    )
    b, rank, _ = _two_phase_rank(
        df, F.col("v").cast("double"), ["v", "doc_id"]
    )
    plan = (
        b.select("doc_id", rank.alias("rk"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not unpartitioned_windows(plan), plan
