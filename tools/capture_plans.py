"""Capture .explain("formatted") output for bench rows into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [name ...]
Writes plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<suffix>.txt (default round:
r16) for each requested query (default: the bench headline + extended
lists). Plan generation is driver-side only — no job runs, so this is safe
to run next to other work.

Ops that compute via a driver-side collect and return a tiny
createDataFrame (e.g. sim_pca_power) have NOTHING in their .explain — the
plan is just the result's ExistingRDD/LocalTableScan leaf, before AND after
any change. VERDICT r15 wrong-item 4: such captures are marked explicitly
so a before/after pair can't silently document nothing; the evidence for
those ops is the code diff, not the plan file.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from sdu_hadoop_indexer_spark.registry import all_queries
from sdu_hadoop_indexer_spark.session import get_spark

VACUOUS_MARK = (
    "NOTE: VACUOUS PLAN — this operator computes via a driver-side collect\n"
    "and returns a small createDataFrame; the physical plan below is only\n"
    "the result relation's leaf and documents nothing about the compute.\n"
    "The evidence for changes to this op is the code diff.\n\n"
)


def _is_vacuous(plan: str) -> bool:
    """A plan whose ONLY scan-class nodes are local/driver-side leaves."""
    body = plan.splitlines()
    scans = [
        ln
        for ln in body
        if "Scan" in ln or "FileScan" in ln or "Relation" in ln
    ]
    return bool(scans) and all(
        ("ExistingRDD" in ln or "LocalTableScan" in ln) for ln in scans
    )


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.EXTENDED)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if _is_vacuous(plan):
                plan = VACUOUS_MARK + plan
        except Exception as exc:  # noqa: BLE001 - record the failure inline
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}_{suffix}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
