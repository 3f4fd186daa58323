"""Independent (DuckDB-free) verifier for the SemDeDup family at scales
where the unrolled-Lloyd oracle is infeasible — the `kcore_parity.py`
pattern applied to `dedup_semantic_ivf_auto` / `dedup_semantic_ivf_probe`.

Why it exists: the auto-cells oracle replays k = ceil(N/64) Lloyd rounds
as CTEs whose assignment join materializes (k x 16 sample) x k x d rows
per round — at 60k vectors (k = 938) that is ~10^9 materialized rows and
DuckDB grinds past 65 GB without finishing. The ENGINE side is linear and
finishes in seconds; only the SQL twin dies. This tool recomputes the
whole verdict INDEPENDENTLY in numpy over the collected embeddings:

  1. k = semantic_auto_cells(N); centroids from the engine's own
     deterministic bounded-sample trainer (`_train_ivf_centroids` — two
     driver collects, the staged model artifact a cluster would broadcast);
  2. assignment = one numpy matmul with `_ivf_assign_np`'s exact
     arithmetic (round-half-away quantization, int64 d2, first-min);
  3. candidates = all within-cell pairs (plus the top-P probe superset in
     --probe mode, `_ivf_probe_np`'s stable-argsort rule);
  4. verdict = drop vb iff some pair (va < vb) has
     np.round(cosine, 4) >= COSINE_DUP_TAU — the registered drop rule.

Everything after the trainer is a from-scratch numpy evaluation of the
op's CONTRACT (no Spark plan, no per-cell join, no Arrow batching), so a
bug in the distributed pair fan-out, the broadcast gating, or the verify
stage shows up as a verdict diff. The arithmetic rules themselves are
shared by design — they ARE the contract (same caveat kcore_parity
documents: independence is in the evaluation strategy, not in respecifying
the op).

Usage::

    python tools/semantic_parity.py --sf /tmp/spark_graft_sf3.0 [--probe]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def numpy_verdict(
    vec_ids: np.ndarray,
    vecs: np.ndarray,
    cents: list[list[int]],
    tau: float,
    n_probe: int = 1,
) -> dict[int, tuple[int, bool]]:
    """{vec_id: (home_cell, dropped)} by direct evaluation of the contract."""
    from sdu_hadoop_indexer_spark.llm.similarity import IVF_SCALE

    cmat = np.array(cents, dtype=np.int64)
    cc = (cmat * cmat).sum(axis=1)
    v = vecs.astype(np.float64) * IVF_SCALE
    q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
    d2 = (q * q).sum(axis=1)[:, None] + cc[None, :] - 2 * (q @ cmat.T)
    p = min(n_probe, len(cents))
    order = np.argsort(d2, axis=1, kind="stable")[:, :p]
    home = order[:, 0]

    # Replay the engine's arithmetic order — dot / (norm_a * norm_b), NOT a
    # pre-normalized matmul: the latter differs by ~1 ulp and the 4dp tau
    # compare is tolerance-free, so a regenerated fixture landing on a
    # .00005 boundary could flap the verdict (ADVICE r13 low #2).
    raw = vecs.astype(np.float64)
    norms = np.sqrt((raw * raw).sum(axis=1))

    # order rows by vec_id so "lower id" = "earlier row"
    idx = np.argsort(vec_ids)
    dropped: set[int] = set()
    for cell in range(len(cents)):
        # candidate membership: home-cell in co-cell mode; in probe mode a
        # pair qualifies when either side PROBES the other's home cell, so
        # cell c's group = vectors with home c  UNION  vectors probing c —
        # restricted to pairs where at least one side is HOME in c (the
        # registered probe op's candidate rule).
        home_rows = idx[home[idx] == cell]
        if n_probe > 1:
            probe_rows = idx[(order[idx] == cell).any(axis=1)]
        else:
            probe_rows = home_rows
        if len(home_rows) == 0 or len(probe_rows) < 2:
            continue
        dots = raw[probe_rows] @ raw[home_rows].T
        cos = np.round(
            dots / (norms[probe_rows][:, None] * norms[home_rows][None, :]), 4
        )
        pid = vec_ids[probe_rows][:, None]  # probe-side ids (rows)
        hid = vec_ids[home_rows][None, :]  # home-side ids (cols)
        hit = cos >= tau
        # drop the HIGHER id of every qualifying (va < vb) pair
        hgrid = np.broadcast_to(hid, hit.shape)
        dropped.update(np.unique(hgrid[hit & (pid < hid)]).tolist())
        dropped.update(np.unique(pid[(hit & (pid > hid)).any(axis=1)][:, 0]).tolist())
    return {
        int(vec_ids[i]): (int(home[i]), int(vec_ids[i]) in dropped)
        for i in range(len(vec_ids))
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--probe", action="store_true",
        help="verify dedup_semantic_ivf_probe instead of the auto row",
    )
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.llm.dedup import (
        COSINE_DUP_TAU,
        dedup_semantic_ivf_auto,
        dedup_semantic_ivf_probe,
        semantic_auto_cells,
    )
    from sdu_hadoop_indexer_spark.llm.similarity import (
        N_PROBE,
        _train_ivf_centroids,
    )
    from sdu_hadoop_indexer_spark.session import get_spark

    t = pq.read_table(
        os.path.join(args.sf, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    vec_ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    k = semantic_auto_cells(len(vec_ids))
    print(f"# N={len(vec_ids)} k={k} probe={args.probe}", flush=True)

    spark = get_spark("semantic-parity")
    t0 = time.monotonic()
    cents = _train_ivf_centroids(spark, args.sf, n_cells=k)
    t_train = time.monotonic() - t0

    t0 = time.monotonic()
    op = dedup_semantic_ivf_probe if args.probe else dedup_semantic_ivf_auto
    engine = {
        r.vec_id: (r.cell, r.dropped) for r in op(spark, args.sf).collect()
    }
    t_engine = time.monotonic() - t0

    t0 = time.monotonic()
    expected = numpy_verdict(
        vec_ids,
        vecs,
        cents,
        COSINE_DUP_TAU,
        n_probe=N_PROBE if args.probe else 1,
    )
    t_np = time.monotonic() - t0

    diff = {
        vid
        for vid in expected
        if engine.get(vid) != expected[vid]
    } | (set(engine) - set(expected))
    n_drop = sum(1 for _, d in expected.values() if d)
    print(
        f"rows={len(expected)} dropped={n_drop} "
        f"train={t_train:.1f}s engine={t_engine:.1f}s numpy={t_np:.1f}s"
    )
    if diff:
        some = sorted(diff)[:5]
        print(f"MISMATCH: {len(diff)} verdicts differ, e.g. {some}")
        for vid in some:
            print(f"  vec_id={vid} engine={engine.get(vid)} numpy={expected[vid]}")
        return 1
    print("PASS: engine verdict == independent numpy verdict")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
