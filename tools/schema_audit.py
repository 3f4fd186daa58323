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
    return finds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    queries, oracles = all_queries(), all_oracles()
    spark = get_spark("schema-audit")
    spark.sparkContext.setLogLevel("ERROR")

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
        # 2. ROUNDED oracles must not round engine-divergent floats
        if name in oracles:
            findings.extend(audit_oracle(name, oracles[name]))

    for line in findings:
        print(f"AUDIT {line}")
    print(f"== audited {len(queries)} queries: {len(findings)} finding(s) ==")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
