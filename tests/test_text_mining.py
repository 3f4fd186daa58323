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
