"""Independent `graph_kcore` parity at scales where the DuckDB oracle dies
(VERDICT r11 missing-item 1 / next-round item 3).

At sf1.0 the unrolled-peel DuckDB CTE spills >76 GB and is infeasible, so
the r11 sweep's one non-parity row was graph_kcore (engine-green, 826
rows, oracle absent). The repo already owns an INDEPENDENT verifier — the
driver-fixture test's pure-Python synchronous peel
(tests/test_llm_ops.py::test_kcore_is_fixpoint_and_min_degree_holds) —
which needs no unrolled SQL and runs the peel to TRUE fixpoint. This tool
applies it at arbitrary scale:

1. run the engine's `graph_kcore` (10 unrolled synchronous rounds);
2. collect the same degree-capped τ=0.9 edge relation the engine peels
   (bounded: the capped graph is duplicate-cluster-sized, NOT corpus-sized
   — a count gate refuses to collect >5M edges);
3. Python-peel adjacency sets to the true fixpoint, counting rounds;
4. compare exact (doc_id → core_degree) maps, and report whether the
   true fixpoint round count fits inside KCORE_ROUNDS (the truncation
   proof the fixture test pins at driver SFs, re-proven at this scale).

Usage::

    python tools/kcore_parity.py --sf /tmp/spark_graft_sf1.0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGE_COLLECT_CAP = 5_000_000


def run(sf_dir: str) -> dict:
    from sdu_hadoop_indexer_spark.llm.dedup import (
        KCORE_K,
        KCORE_ROUNDS,
        _capped_oriented_edges,
        graph_kcore,
    )
    from sdu_hadoop_indexer_spark.session import get_spark

    spark = get_spark("kcore_parity")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    engine = {
        r.doc_id: r.core_degree for r in graph_kcore(spark, sf_dir).collect()
    }
    engine_s = round(time.monotonic() - t0, 1)

    e, _ = _capped_oriented_edges(spark, sf_dir)
    n_edges = e.count()
    if n_edges > EDGE_COLLECT_CAP:
        raise SystemExit(
            f"capped edge set {n_edges} > {EDGE_COLLECT_CAP}: the driver-"
            "side peel would not be independent evidence at this size — "
            "shard the adjacency or verify on a sample instead"
        )
    adj: dict[int, set[int]] = defaultdict(set)
    for r in e.collect():
        adj[r.u].add(r.v)
        adj[r.v].add(r.u)
    rounds = 0
    while True:  # synchronous peel to TRUE fixpoint (no round cap)
        drop = [n for n, ms in adj.items() if len(ms) < KCORE_K]
        if not drop:
            break
        rounds += 1
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    python = {n: len(ms) for n, ms in adj.items()}

    out = {
        "sf_dir": sf_dir,
        "n_capped_edges": n_edges,
        "engine_rows": len(engine),
        "python_rows": len(python),
        "engine_wall_s": engine_s,
        "true_fixpoint_rounds": rounds,
        "kcore_rounds_unrolled": KCORE_ROUNDS,
        "fixpoint_within_unroll": rounds <= KCORE_ROUNDS,
        "exact_match": engine == python,
    }
    if not out["exact_match"]:
        only_e = set(engine) - set(python)
        only_p = set(python) - set(engine)
        diff_dg = {
            n: (engine[n], python[n])
            for n in set(engine) & set(python)
            if engine[n] != python[n]
        }
        out["diff"] = {
            "only_engine": sorted(only_e)[:10],
            "only_python": sorted(only_p)[:10],
            "degree_mismatch_sample": dict(list(diff_dg.items())[:10]),
        }
    print(json.dumps(out), flush=True)
    assert out["exact_match"], "engine k-core != independent Python peel"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/spark_graft_sf1.0")
    args = ap.parse_args()
    run(args.sf)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
