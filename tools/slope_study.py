"""Scale-slope study for the exact-join dedup family (round 6) and the
ANN/embedding family (round 7).

Measures wall-clock of `dedup_near_jaccard`, `dedup_containment`,
`text_paragraph_dedup`, `graph_triangle_count`, `llm_contamination_matrix`
(over synthetic documents) and `dedup_embedding_ann` (over synthetic
embeddings) on matched corpora at two sizes (default 5 000 vs 50 000 docs/
vectors, an OPEN 20 000-term vocabulary via ``gen_scale_fixture
--synth-vocab``) so the prefix-filter and sign-LSH-banding "linear at
scale" claims are empirical, not theory + one SF step.

Protocol (matches the round-5 study in BASELINE.md):
- corpora come from the SAME generator at both sizes — never generated
  vs driver fixture;
- two reps per operator; the SECOND (JVM-warm) rep is reported;
- `dedup_near_jaccard`'s memoized persist is EVICTED before each of its
  own reps (so rep 2 measures the build, not a cache read), but left warm
  for `graph_triangle_count` — production semantics, and it isolates the
  triangle join's own slope from the edge relation it consumes.

Usage::

    python tools/slope_study.py [--small 5000] [--large 50000]
                                [--vocab 20000] [--out /tmp/slope]

Prints one JSON line per (docs, operator) and a final summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _evict_near_jaccard_memo() -> None:
    from sdu_hadoop_indexer_spark.llm import dedup

    for k, df in list(dedup._NEAR_JACCARD_CACHE.items()):
        df.unpersist(blocking=True)
        del dedup._NEAR_JACCARD_CACHE[k]


def _evict_pair_bands_memo() -> None:
    """Evict the sign-LSH band table so each dedup_embedding_ann rep
    measures the full band-build + bucket-join + verify, not a pin read."""
    from sdu_hadoop_indexer_spark.llm import similarity

    for k, df in list(similarity._PAIR_BANDS_CACHE.items()):
        df.unpersist(blocking=True)
        del similarity._PAIR_BANDS_CACHE[k]


def _evict_containment_memo() -> None:
    """Evict the staged containment edge relation so each
    dedup_containment rep measures the COLD BUILD (candidates + verify),
    the quantity whose 3.3x-at-10x slope VERDICT r9/r10 asked to
    decompose — not the ~0.2 s pin read the r9 study row reported."""
    from sdu_hadoop_indexer_spark.llm import dedup

    for k, df in list(dedup._CONTAINMENT_CACHE.items()):
        df.unpersist(blocking=True)
        del dedup._CONTAINMENT_CACHE[k]


def run(small: int, large: int, vocab: int, out_root: str) -> dict:
    from gen_scale_fixture import generate, generate_embeddings

    from sdu_hadoop_indexer_spark.llm import dedup
    from sdu_hadoop_indexer_spark.session import get_spark

    spark = get_spark("slope_study")
    ops = [
        ("dedup_near_jaccard", dedup.dedup_near_jaccard),
        # containment decomposition (VERDICT r10 item 4): candidates-only
        # stage FIRST (token-set memo warms on rep 1; rep 2 isolates the
        # prefix/size/position-filtered join + distinct), then the full
        # cold build with the edge pin evicted per rep — verify wall ≈
        # full − candidates, both JVM-warm over the same staged inputs.
        ("containment_candidates", dedup._containment_candidates),
        ("dedup_containment", dedup.dedup_containment),
        ("text_paragraph_dedup", dedup.text_paragraph_dedup),
        # AFTER near_jaccard so the memoized edge relation is warm: the
        # number isolates the degree-cap + wedge join itself.
        ("graph_triangle_count", dedup.graph_triangle_count),
        # the peel loop and the per-node wedge rollup read the same warm
        # `_capped_edges_persisted` pin as the triangle count (VERDICT r10
        # item 8: re-measure the family after the r10 shared-pin changes).
        ("graph_kcore", dedup.graph_kcore),
        ("graph_clustering_coeff", dedup.graph_clustering_coeff),
        # AFTER containment, same logic: the composer row measures the
        # per-source-pair rollup over the warm staged edge relation —
        # exactly its production position in a contamination audit.
        ("llm_contamination_matrix", dedup.llm_contamination_matrix),
        # banded sign-LSH pair dedup over the synthetic embeddings: the
        # band-table memo is evicted per rep so the number is the full
        # band-build + slim bucket self-join + Arrow verify.
        ("dedup_embedding_ann", dedup.dedup_embedding_ann),
    ]
    evictors = {
        "dedup_near_jaccard": _evict_near_jaccard_memo,
        "dedup_containment": _evict_containment_memo,
        "dedup_embedding_ann": _evict_pair_bands_memo,
    }
    results: dict[str, dict[int, dict]] = {name: {} for name, _ in ops}
    for n_docs in (small, large):
        d = os.path.join(out_root, f"docs{n_docs}")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            generate(n_docs, d, "/root/testdata/sf0.1", vocab_terms=vocab)
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            generate_embeddings(n_docs, d)
        for name, fn in ops:
            walls, rows = [], 0
            for _rep in range(2):
                evict = evictors.get(name)
                if evict:
                    evict()
                t0 = time.monotonic()
                rows = fn(spark, d).count()
                walls.append(time.monotonic() - t0)
            rec = {"docs": n_docs, "op": name, "warm_s": round(walls[1], 2),
                   "cold_s": round(walls[0], 2), "rows": rows}
            results[name][n_docs] = rec
            print(json.dumps(rec), flush=True)
    print(f"\n| operator | {small} docs | {large} docs | slope | rows "
          f"{small}->{large} |")
    print("|---|---|---|---|---|")
    for name, _ in ops:
        s, l = results[name][small], results[name][large]
        slope = l["warm_s"] / max(s["warm_s"], 1e-9)
        print(f"| `{name}` | {s['warm_s']} s | {l['warm_s']} s | "
              f"**{slope:.1f}x** | {s['rows']} -> {l['rows']} |")
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=5000)
    ap.add_argument("--large", type=int, default=50000)
    ap.add_argument("--vocab", type=int, default=20000)
    ap.add_argument("--out", default="/tmp/slope_r6")
    args = ap.parse_args()
    run(args.small, args.large, args.vocab, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
