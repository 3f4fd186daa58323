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
    """Half-away-rounded average computed ENTIRELY in integer arithmetic.

    The previous form — `round(sum(decimal)/count, 4)` — still diverged
    when the TRUE average sits exactly on a half boundary (round-4
    `ts_ohlc` at sf0.001: 307.03/8 = 38.378750 → Spark's BigDecimal round
    re-reads the double's shortest decimal string and rounds UP while
    DuckDB's binary ×1e4 lands a hair below .5 and rounds DOWN). Integer
    form kills the class: columns carry ≤2 decimals (fixture invariant),
    so Σ(value·100) is an exact int64 and the half-away ndigits quotient
    is `(2·S·f + n) DIV (2·n)` with f = 10^(ndigits-2) — pure integer
    ops, bit-identical on any engine at EVERY boundary. Non-negative
    inputs assumed (DIV truncation == floor); all current users qualify."""
    assert ndigits >= 2
    factor = 10 ** (ndigits - 2)  # cents → target digits
    c = F.col(col) if isinstance(col, str) else col
    s2 = F.sum(F.round(c * 100, 0).cast("long"))
    n = F.count(c)
    q = (s2 * (2 * factor) + n).cast("long") / (2 * n)  # double; floor next
    return (
        F.floor(q).cast("double") / F.lit(float(10 ** ndigits))
    ).alias(alias)


def ratio(num: Column, den: Column, ndigits: int = 4) -> Column:
    """Half-away-rounded ratio of two INTEGER-valued columns, computed as
    an integer quotient — boundary-proof like :func:`ravg` (ratios of
    integers are exactly the values whose doubles' shortest decimal reprs
    can terminate ON a rounding half, where Spark's string-based BigDecimal
    round and DuckDB's binary scale-multiply legitimately disagree —
    the round-4 ts_ohlc lesson). Non-negative numerators assumed.

    Zero-denominator contract: NULL. Under Spark 4's default ANSI mode a
    bare division throws DIVIDE_BY_ZERO at runtime while DuckDB's float
    division yields NULL-ish results — a hard-failure-vs-NULL divergence
    on degenerate input (e.g. a corpus with no near-dup ground truth in
    `dedup_lsh_quality_eval`). Both engine twins guard explicitly, so a
    ratio over an empty/zero base is NULL everywhere."""
    scale = 10 ** ndigits
    n64 = num.cast("long")
    d64 = den.cast("long")
    mag = F.floor((n64 * (2 * scale) + d64) / (2 * d64)).cast(
        "double"
    ) / F.lit(float(scale))
    return F.when(d64 > 0, mag)


def sql_ratio(num: str, den: str, ndigits: int = 4) -> str:
    """DuckDB twin of :func:`ratio` (same double-division-then-floor ops,
    same NULL-on-zero-denominator guard)."""
    scale = 10 ** ndigits
    # ::BIGINT before the scale multiply: an INT32-typed numerator (e.g. an
    # integer literal column) would overflow DuckDB's checked 32-bit
    # multiply at ndigits ≥ 5 (round-4 llm_mixing_weights at sf0.1)
    mag = (
        f"CAST(floor(CAST(CAST(({num}) AS BIGINT) * {2 * scale} + ({den})"
        f" AS DOUBLE) / (2 * ({den}))) AS DOUBLE) / {float(scale)!r}"
    )
    return f"CASE WHEN ({den}) > 0 THEN {mag} END"


# SQL-side counterpart (DuckDB): use in oracle strings.
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(25,4))) AS DOUBLE) AS {alias}"


def sql_ravg(expr: str, alias: str, ndigits: int = 4) -> str:
    """DuckDB twin of :func:`ravg` — the same integer half-away quotient
    (see ravg's docstring for why float round() is boundary-unsafe even
    over exact decimal sums)."""
    factor = 10 ** (ndigits - 2)
    return (
        f"CAST(floor(CAST(sum(CAST(round({expr} * 100) AS BIGINT))"
        f" * {2 * factor} + count({expr}) AS DOUBLE)"
        f" / (2 * count({expr}))) AS DOUBLE)"
        f" / {float(10 ** ndigits)!r} AS {alias}"
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


def sratio(num: Column, den: Column, ndigits: int = 4) -> Column:
    """Signed half-away-rounded integer ratio — :func:`ratio` extended to
    negative numerators (period-over-period deltas, regression residuals).
    Computed as sign(num) · ratio(|num|, den); den must be positive.
    Same boundary-proof property: the only float ops are one exact
    int→double conversion, one correctly-rounded division, and floor.
    The trailing `+ 0.0` folds the -0.0 a tiny negative delta produces
    (|num|/den rounds to 0.0, negated to -0.0) back to +0.0 — the same
    signed-zero canonicalization the round-3 driver-hasher class forced
    on every float round() (see tools/schema_audit.py)."""
    from pyspark.sql import functions as F

    mag = ratio(F.abs(num), den, ndigits)
    return F.when(num < 0, -mag).otherwise(mag) + F.lit(0.0)


def sql_sratio(num: str, den: str, ndigits: int = 4) -> str:
    """DuckDB twin of :func:`sratio` (incl. the `+ 0.0` -0.0 fold)."""
    mag = sql_ratio(f"abs({num})", den, ndigits)
    return f"(CASE WHEN ({num}) < 0 THEN -({mag}) ELSE ({mag}) END) + 0.0"
