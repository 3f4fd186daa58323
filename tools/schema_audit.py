"""One-shot audit of every registered query for the two known gate-killers.

The driver samples ~50 of the 200 registered queries per round, so a query
can sit unsampled for rounds and then go red on its first draw. The two
failure classes the gate has actually produced:

1. **Driver-unhashable output** — array/map/struct columns crash the
   driver's pandas canonicalizer (CORRECTNESS_r01 "unhashable ndarray").
   Registered wrappers must emit scalar columns only (``registry.
   jsonify_complex`` exists for exactly this).
2. **Boundary-sensitive ROUNDED oracles** — ``round()`` over a value the
   two engines compute with different last-bit error (one-pass moment
   aggregates, or float sums accumulated in different orders) flips a
   digit when the true value sits on a .5-ulp rounding boundary
   (CORRECTNESS_r02 ``agg_stats_moments``). The stable pattern is exact
   integer/decimal sums + identical final expression text on both engines
   (see ``_SM_FORMULAS`` in operators/aggregates.py).

   Round-4 sharpening: IDENTICAL pre-round doubles are STILL not enough
   when the true value is a ratio of integers that lands EXACTLY on a
   decimal half (ts_ohlc at sf0.001: 307.03/8 = 38.378750 — Spark's
   BigDecimal round re-reads the double's shortest decimal string and
   rounds UP; DuckDB's binary ×10^k lands a hair under .5 and rounds
   DOWN). Every rounded integer-ratio output therefore goes through
   ``parity.ratio``/``sql_ratio`` (integer half-away quotient — no float
   round anywhere); ``round()`` stays legal only for transcendental-
   valued expressions (ln/sqrt/exp/cosine...), whose doubles land on a
   ≤(k+1)-digit shortest repr with negligible probability.

Usage::

    python tools/schema_audit.py [--sf /root/testdata/sf0.001]

Exit 0 = clean. Any finding prints one line and exits 1.
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

from sdu_hadoop_indexer_spark.registry import all_oracles, all_queries
from sdu_hadoop_indexer_spark.session import get_spark

COMPLEX_TYPES = ("array", "map", "struct")

# Engine-native one-pass moment aggregates: their streaming implementations
# differ between Spark and DuckDB in the last float bits, so they may never
# appear inside a ROUNDED oracle (rewrite on exact sums instead).
MOMENT_FNS = re.compile(
    r"\b(stddev_samp|stddev_pop|stddev|var_samp|var_pop|variance|"
    r"covar_samp|covar_pop|corr|regr_slope|regr_intercept|regr_r2|"
    r"skewness|kurtosis)\s*\(",
    re.IGNORECASE,
)

# round(avg(x)) / round(sum(x)) over a raw DOUBLE accumulates in
# engine-specific order (float addition is non-associative). Exempt when the
# argument is cast to DECIMAL (exact accumulation) or is an integer-typed
# expression — conservatively we only flag avg/sum applied directly to the
# known double fixture columns.
DOUBLE_COLS = (
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "value",
    "c_acctbal",
    "s_acctbal",
    "o_totalprice",
    "p_retailprice",
    "quality_score",
)
FLOAT_SUM = re.compile(
    r"\b(avg|sum)\s*\(\s*(" + "|".join(DOUBLE_COLS) + r")\s*\)",
    re.IGNORECASE,
)


def _round_spans(sql: str) -> list[tuple[int, int]]:
    """(start, end) index pairs of every matched ``round(...)`` call."""
    spans = []
    for m in re.finditer(r"\bround\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth == 0:
            spans.append((m.start(), i))
    return spans


# What may legally follow a round() call WITHOUT the `+ 0.0` idiom: an
# integer cast (integers have no signed zero) — `CAST(round(x) AS BIGINT)`
# puts ` AS BIGINT)` right after the inner call.
_INT_CAST_AFTER = re.compile(
    r"^\s*AS\s+(BIGINT|INTEGER|INT|SMALLINT|TINYINT|HUGEINT)\b", re.IGNORECASE
)


def audit_signed_zero(name: str, sql: str) -> list[str]:
    """Flag every float-producing round() not normalized with `+ 0.0`.

    DuckDB's round() stays in IEEE doubles and emits -0.0 for tiny negative
    inputs; Spark's goes through BigDecimal and emits +0.0 — the driver's
    value-hash distinguishes them (round-3 agg_stats_moments red). The
    enforced idiom is `round(...) + 0.0` on BOTH engine sides (IEEE
    addition folds -0.0 to +0.0). Rounds consumed by an integer CAST are
    exempt — integers carry no sign of zero.
    """
    finds = []
    for start, end in _round_spans(sql):
        after = sql[end:]
        if _INT_CAST_AFTER.match(after):
            continue
        if re.match(r"^\s*\+\s*0\.0", after):
            continue
        snippet = " ".join(sql[start:end].split())[:60]
        finds.append(
            f"{name}: round() without `+ 0.0` signed-zero guard — "
            f"`{snippet}…` (append `+ 0.0` on both engine sides)"
        )
    return finds


def audit_oracle(name: str, sql: str) -> list[str]:
    finds = []
    if "round" in sql.lower():
        m = MOMENT_FNS.search(sql)
        if m:
            finds.append(
                f"{name}: ROUNDED oracle uses one-pass moment fn "
                f"`{m.group(1)}` — rewrite on exact sums"
            )
        m = FLOAT_SUM.search(sql)
        if m:
            finds.append(
                f"{name}: ROUNDED oracle has `{m.group(1)}({m.group(2)})` — "
                f"raw double accumulation is order-dependent; sum via "
                f"DECIMAL cast instead"
            )
        finds.extend(audit_signed_zero(name, sql))
    return finds


def _is_neg_zero(v) -> bool:
    import math

    return isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0


def probe_neg_zero(name: str, con, sql: str) -> list[str]:
    """Dynamic probe: does the oracle ACTUALLY emit -0.0 at the audit SF?
    (The static rule is the insurance for other SFs; this catches live
    divergence the driver would hash red today.)"""
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    except Exception as e:
        return [f"{name}: oracle failed under -0.0 probe ({type(e).__name__}: {e})"]
    for row in rows:
        for col, v in zip(cols, row):
            if _is_neg_zero(v):
                return [
                    f"{name}: oracle emits -0.0 in column `{col}` at this SF "
                    f"— Spark emits +0.0; driver hash WILL diverge"
                ]
    return []


def probe_result_types(name: str, con, sql: str, schema) -> list[str]:
    """Rule 3 (round-4 class): the DECLARED DuckDB result type of every
    oracle column must be physically equivalent to the Spark output type.
    Values can be bit-identical and the driver hash still red: DuckDB's
    pandas bridge turns HUGEINT (any uncast sum(BIGINT) chain) into
    float64 where Spark ships int64. Value-level compares can never see
    this — both sides fetch as Python int — so the check is structural,
    against `con.sql(...).types` (prepare-only, no execution)."""
    from sdu_hadoop_indexer_spark.oracle_types import type_parity_findings

    try:
        rel = con.sql(sql)
        duck_cols, duck_types = rel.columns, [str(t) for t in rel.types]
    except Exception as e:
        return [f"{name}: oracle failed type probe ({type(e).__name__}: {e})"]
    spark_fields = {f.name: f.dataType.simpleString() for f in schema.fields}
    return type_parity_findings(name, spark_fields, duck_cols, duck_types)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import os

    import duckdb

    from sdu_hadoop_indexer_spark.catalog import TABLES

    # must precede all_queries(): the file-scan oracles freeze this dir into
    # their SQL at registration time (operators/scans.py FILE_SCAN_DIR)
    os.environ["SPARK_GRAFT_FILE_SCAN_DIR"] = args.sf
    queries, oracles = all_queries(), all_oracles()
    spark = get_spark("schema-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    findings: list[str] = []
    for name in sorted(queries):
        # 1. output schema must be driver-hashable (scalar columns only)
        try:
            schema = queries[name](spark, args.sf).schema
        except Exception as e:  # a query that cannot even plan is a finding
            findings.append(f"{name}: failed to build ({type(e).__name__}: {e})")
            continue
        for f in schema.fields:
            if f.dataType.typeName() in COMPLEX_TYPES:
                findings.append(
                    f"{name}: column `{f.name}` is {f.dataType.simpleString()} "
                    f"— wrap with registry.jsonify_complex"
                )
        # 2. ROUNDED oracles must not round engine-divergent floats, and
        #    every float round() must carry the `+ 0.0` signed-zero guard
        if name in oracles:
            findings.extend(audit_oracle(name, oracles[name]))
            findings.extend(probe_neg_zero(name, con, oracles[name]))
            findings.extend(probe_result_types(name, con, oracles[name], schema))

    for line in findings:
        print(f"AUDIT {line}")
    print(f"== audited {len(queries)} queries: {len(findings)} finding(s) ==")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
