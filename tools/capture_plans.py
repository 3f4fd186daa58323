"""Capture .explain("formatted") output for bench rows into plans/r15/.

Usage: python tools/capture_plans.py <suffix> [name ...]
Writes plans/r15/<name>_<suffix>.txt for each requested query (default: the
bench headline + extended lists). Plan generation is driver-side only — no
job runs, so this is safe to run next to other work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from sdu_hadoop_indexer_spark.registry import all_queries
from sdu_hadoop_indexer_spark.session import get_spark


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
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
        except Exception as exc:  # noqa: BLE001 - record the failure inline
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}_{suffix}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
