"""Driver-hashability audit: every registered query must return only
scalar-typed columns.

The driver's correctness gate canonicalizes Spark results via pandas
``sort_values`` over all columns, which raises ``TypeError: unhashable
type: 'numpy.ndarray'`` on Array/Map cells (CORRECTNESS_r01.json). This
tool mirrors that weakness deliberately: for each registered query it

1. flags any top-level Array/Map/Struct column in the result schema, and
2. collects the sf0.001 result, converts to pandas, and runs the same
   ``sort_values(by=all_columns)`` the driver's ``_canon`` performs.

Usage::

    python tools/schema_audit.py [--sf /root/testdata/sf0.001] [name ...]

Exit 0 = every query is driver-hashable.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T

from sdu_hadoop_indexer_spark.registry import all_queries
from sdu_hadoop_indexer_spark.session import get_spark

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark()
    queries = all_queries()
    names = args.names or sorted(queries)
    bad = []
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            complex_cols = [
                f.name for f in df.schema.fields if isinstance(f.dataType, COMPLEX)
            ]
            if complex_cols:
                bad.append((name, f"complex-typed columns: {complex_cols}"))
                print(f"{name}: FAIL {complex_cols}")
                continue
            pdf = df.toPandas()
            # the driver's _canon sorts by every column — ndarray/dict cells
            # crash here exactly as they do at the gate
            pdf.sort_values(by=list(pdf.columns), inplace=True, kind="mergesort")
            print(f"{name}: OK rows={len(pdf)}")
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"{type(exc).__name__}: {exc}"))
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    print(f"== {len(names) - len(bad)} hashable, {len(bad)} not ==")
    for name, why in bad:
        print(f"  {name}: {why[:200]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
