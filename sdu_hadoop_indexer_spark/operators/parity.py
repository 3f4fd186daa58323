"""Cross-engine parity helpers (SURVEY.md §5.2 rule list).

Floating-point SUMs are order-dependent; at 60k+ rows the Spark-vs-DuckDB
difference can exceed round(,4) resolution. Rule: route every large SUM —
and since round 3, every AVG too — through an exact ``decimal(25,4)``
accumulation and cast the result back to double: bit-identical on both
engines, independent of partitioning. (The round-2 "avg error ~ 1/n of sum
error, so round(avg) is safe" heuristic was replaced after
``agg_stats_moments`` demonstrated that ANY engine-divergent float under
``round()`` can land on a .5-ulp boundary; ``tools/schema_audit.py``
enforces the exact-accumulation rule across all registered oracles.)

At 100 TB this costs nothing: decimal sum is still a single-pass partial agg
(Spark plans ``HashAggregate[partial]→Exchange→HashAggregate[final]``), and
decimal(25,4) fits in a 128-bit unscaled long.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(25,4)")).cast("double").alias(alias)


def ravg(col: Column | str, alias: str, ndigits: int = 4) -> Column:
    """Rounded average over the exact decimal sum: identical dividend and
    divisor on both engines ⇒ identical pre-round double ⇒ stable round.
    `+ 0.0` folds a -0.0 (possible when the column is negative-valued) to
    +0.0 in lockstep with :func:`sql_ravg`."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.round(
            F.sum(c.cast("decimal(25,4)")).cast("double") / F.count(c),
            ndigits,
        )
        + F.lit(0.0)
    ).alias(alias)


# SQL-side counterpart (DuckDB): use in oracle strings.
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(25,4))) AS DOUBLE) AS {alias}"


def sql_ravg(expr: str, alias: str, ndigits: int = 4) -> str:
    """DuckDB twin of :func:`ravg` — `+ 0.0` is load-bearing here: DuckDB's
    round() stays in IEEE doubles and emits -0.0 for tiny negative inputs
    where Spark's BigDecimal round emits +0.0 (round-3 driver red)."""
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(25,4))) AS DOUBLE)"
        f" / count({expr}), {ndigits}) + 0.0 AS {alias}"
    )


# DuckDB reads events.ts as TIMESTAMP_NS; Spark's catalog floors it to µs
# (catalog.table). `CAST(ts AS TIMESTAMP)` floors ns→µs in DuckDB (verified),
# so this CTE gives the oracle the exact timestamps Spark sees.
SQL_EVENTS_US = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)

# DuckDB `CAST(date_part('epoch', ts) AS BIGINT)` ROUNDS; Spark
# unix_timestamp() floors. Use this for second-precision epochs in oracles.
def sql_epoch_s(expr: str) -> str:
    return f"CAST(epoch(date_trunc('second', {expr})) AS BIGINT)"
