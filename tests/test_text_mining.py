"""TextRank invariants + count-min sketch accuracy guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdu_hadoop_indexer_spark.text import mining


def test_pagerank_invariants(spark, sf_dir):
    """Ranks ≥ (1-d), output sorted desc, deterministic, and the top term is
    structurally central (among the top weighted-degree vocabulary)."""
    out = mining.pagerank_keywords(spark, sf_dir).collect()
    assert len(out) == mining.PR_TOPK
    ranks = [r.rank for r in out]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r >= (1 - mining.PR_DAMPING) - 1e-9 for r in ranks)
    again = mining.pagerank_keywords(spark, sf_dir).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    degree_top = {
        r.a
        for r in mining._bigram_edges(spark, sf_dir)
        .groupBy("a")
        .agg(F.sum("w").alias("deg"))
        .orderBy(F.desc("deg"))
        .limit(10)
        .collect()
    }
    assert out[0].term in degree_top


def test_countmin_never_underestimates_and_bounded(spark, sf_dir):
    """CMS hard guarantee: est ≥ true for every term; soft guarantee: the
    overestimate stays within a few εN (ε = 1/width) for these fixtures."""
    truth = {
        r.term: r.n
        for r in mining._tokens(spark, sf_dir)
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(truth.values())
    est = {
        r.term: r.est_count
        for r in mining.countmin_heavyhitters(spark, sf_dir).collect()
    }
    assert est, "sketch returned no heavy hitters"
    for term, e in est.items():
        assert e >= truth[term], (term, e, truth[term])
        assert e - truth[term] <= 4 * total / mining.CMS_WIDTH, (term, e, truth[term])


def test_winnowing_guarantee_and_density(spark, tmp_path):
    """The MOSS guarantee: two documents sharing a substring of length
    ≥ w + k − 1 normalized chars MUST share at least one selected
    fingerprint hash; and selection density on prose sits near the
    published 2/(w+1) expectation (loosely bounded)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.text.analysis import (
        WINNOW_K,
        WINNOW_W,
        text_winnowing,
        winnow_selection,
    )

    shared = "the winnowing guarantee holds for every long enough match"
    texts = [
        "completely unrelated preamble material here " + shared,
        shared + " followed by a different unrelated trailing section",
        "nothing in common with either of the other two documents at all",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["t"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    d = str(tmp_path)
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    sel: dict[int, set] = {0: set(), 1: set(), 2: set()}
    for r in winnow_selection(spark, d).collect():
        sel[r.doc_id].add(r.h)
    assert sel[0] & sel[1], "docs sharing a long run must share a fingerprint"
    prof = {r.doc_id: r for r in text_winnowing(spark, d).collect()}
    for r in prof.values():
        assert r.n_fp >= 1
        expected = 2.0 / (WINNOW_W + 1)
        assert 0.5 * expected <= r.density <= 3.0 * expected


def test_countmin_error_gate_nonnegative_and_bounded(spark, sf_dir):
    """CMS guarantee surfaced by the registered gate: est >= true for
    every reported heavy hitter, and the overestimate stays within the
    classical depth-min bound scale (a few N/width)."""
    from sdu_hadoop_indexer_spark.text import mining

    rows = mining.countmin_error_eval(spark, sf_dir).collect()
    assert rows
    n_tokens = sum(r.true_count for r in rows)  # lower bound on N
    for r in rows:
        assert r.overestimate >= 0, r.term
        assert r.est_count == r.true_count + r.overestimate
