"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count + column names + an
order-insensitive canonical value multiset. Usage:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import datetime
import math
import sys
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb

from sdu_hadoop_indexer_spark.catalog import TABLES
from sdu_hadoop_indexer_spark.registry import all_oracles, all_queries
from sdu_hadoop_indexer_spark.session import get_spark


def canon(v) -> str:
    """Engine-neutral canonical repr of one cell value."""
    try:
        import numpy as np

        if isinstance(v, np.generic):
            v = v.item()
    except ImportError:
        pass
    if v is None:
        return "None"
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Deliberately DO distinguish -0.0 from +0.0: the driver's hasher
        # does, and round-3's only red row (agg_stats_moments) was a -0.0
        # DuckDB/+0.0 Spark divergence this mirror masked for two rounds.
        return repr(v)
    if isinstance(v, Decimal):
        return canon(float(v))
    if isinstance(v, (int, str, bytes)):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "asDict"):  # pyspark Row
        return canon(v.asDict(recursive=True))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rows_to_multiset(rows: list[dict]) -> list[str]:
    out = []
    for r in rows:
        out.append("|".join(f"{k}={canon(r[k])}" for k in sorted(r)))
    out.sort()
    return out


def spark_rows(df) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def assert_driver_hashable(srows: list[dict], cols: list[str]) -> None:
    """Deliberately mirror the DRIVER's canonicalizer weakness: it pandas
    sort_values/factorizes result cells, which raises TypeError on
    ndarray/list/dict cells (CORRECTNESS_r01 'unhashable numpy.ndarray').
    Any registered query that trips this would score red at the gate even
    if its values match DuckDB — so trip it here first."""
    import pandas as pd

    pdf = pd.DataFrame(srows, columns=cols)
    if len(pdf):
        pdf.sort_values(by=list(pdf.columns))


def duck_rows(con, sql: str) -> list[dict]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return [dict(zip(cols, row)) for row in cur.fetchall()]


def type_fingerprint_findings(name: str, con, sql: str, schema) -> list[str]:
    """Round-4 class: compare the DECLARED DuckDB result type of every
    oracle column against the Spark output type. Fetched Python values are
    identical for int64 vs HUGEINT, but the driver's pandas bridge turns
    HUGEINT into float64 and hashes red — only a structural check sees it."""
    from sdu_hadoop_indexer_spark.oracle_types import type_parity_findings

    rel = con.sql(sql)  # prepare-only; no second execution
    spark_fields = {f.name: f.dataType.simpleString() for f in schema.fields}
    return type_parity_findings(
        name, spark_fields, rel.columns, [str(t) for t in rel.types]
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    # r13 sf3.0 finding: at DuckDB's default threads=32, the text-index
    # family's list/JSON aggregates OOM on a 150k-doc corpus with >90 GB
    # free — the per-thread radix-partitioned aggregate states over-reserve
    # and the allocator throws at its accounting limit long before real
    # memory runs out. threads=8 completes the same query in ~26 s.
    # Thread count cannot change results (the compare is an
    # order-insensitive multiset), so a capped default is safe for the
    # gate and required for scale sweeps.
    ap.add_argument("--duck-threads", type=int, default=8)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # must precede all_queries(): the file-scan oracles freeze this dir into
    # their SQL at registration time (operators/scans.py FILE_SCAN_DIR)
    import os

    os.environ["SPARK_GRAFT_FILE_SCAN_DIR"] = args.sf
    # Oracle-parity context (ADVICE r8): the static _pair_band_sql oracle
    # encodes the registered 10x6 sign-LSH point, while the Spark side's
    # N-adaptive default departs from it above PAIR_FIXTURE_MAX vectors —
    # correct behavior in production, a false mismatch in a parity
    # comparison. Pin the registered point for the mirror run (unless the
    # caller pinned one explicitly) so parity holds at EVERY --sf.
    from sdu_hadoop_indexer_spark.llm.similarity import (
        PAIR_BAND_PLANES,
        PAIR_BANDS,
    )

    os.environ.setdefault(
        "SPARK_GRAFT_PAIR_BANDS", f"{PAIR_BANDS}x{PAIR_BAND_PLANES}"
    )
    queries, oracles = all_queries(), all_oracles()
    names = args.names or sorted(queries)
    spark = get_spark("oracle-check")
    def fresh_con():
        c = duckdb.connect()
        c.execute(f"SET threads={args.duck_threads}")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf}/{t}.parquet')"
            )
        return c

    con = fresh_con()

    n_pass = n_fail = 0
    for name in names:
        if name not in queries:
            print(f"{name}: NO SUCH QUERY")
            n_fail += 1
            continue
        import time

        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, args.sf)
            srows = spark_rows(sdf)
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_spark = time.perf_counter() - t0
        try:
            assert_driver_hashable(srows, sdf.columns)
        except Exception as e:
            print(f"{name}: FAIL driver-unhashable ({type(e).__name__}: {e})")
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(srows) > 0  # empty ROWS-ONLY results are failures
            print(
                f"{name}: ROWS-ONLY rows={len(srows)} "
                f"{'PASS' if ok else 'FAIL'} spark={t_spark:.1f}s"
            )
            if ok:
                n_pass += 1
            else:
                n_fail += 1
            continue
        t1 = time.perf_counter()
        # r13 sf3.0 finding: DuckDB buffer reservations accumulate on a
        # long-lived connection — after enough heavy queries (or ONE
        # OutOfMemoryException, which never releases the failed query's
        # reservation) every later query OOMs at tiny block sizes. 11 of
        # the sf3.0 text sweep's 16 reds were this cascade, each green in
        # isolation. A fresh connection per oracle (view re-registration
        # is milliseconds) makes every row independent.
        con.close()
        con = fresh_con()
        try:
            drows = duck_rows(con, oracles[name])
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        tfinds = type_fingerprint_findings(name, con, oracles[name], sdf.schema)
        if tfinds:
            print(f"{name}: FAIL type-parity — {tfinds[0]}")
            n_fail += 1
            continue
        scols = sorted(srows[0]) if srows else sorted(sdf.columns)
        dcols = sorted(drows[0]) if drows else []
        if drows and scols != dcols:
            print(f"{name}: FAIL cols spark={scols} duck={dcols}")
            n_fail += 1
            continue
        sms, dms = rows_to_multiset(srows), rows_to_multiset(drows)
        if len(sms) != len(dms):
            print(f"{name}: FAIL rowcount spark={len(sms)} duck={len(dms)}")
            n_fail += 1
            continue
        if sms != dms:
            diff = next(
                (i for i, (a, b) in enumerate(zip(sms, dms)) if a != b), None
            )
            print(f"{name}: FAIL values (first diff at sorted idx {diff})")
            if diff is not None:
                print(f"  spark: {sms[diff][:300]}")
                print(f"  duck : {dms[diff][:300]}")
            n_fail += 1
            continue
        print(
            f"{name}: PASS rows={len(sms)} spark={t_spark:.1f}s "
            f"duck={time.perf_counter() - t1:.1f}s"
        )
        n_pass += 1

    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
