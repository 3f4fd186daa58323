"""Search layer semantics: phrase ⊆ AND, BM25/TF-IDF sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdu_hadoop_indexer_spark.text import search
from sdu_hadoop_indexer_spark.text.indexer import index_flat


def test_phrase_hits_subset_of_and_hits(spark, sf_dir):
    """Docs matching the phrase must contain both phrase terms."""
    phrase_docs = {r.doc_id for r in search.phrase(spark, sf_dir).collect()}
    flat = index_flat(spark, sf_dir)
    both = (
        flat.where(F.col("term").isin(*search.PHRASE))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("k"))
        .where(F.col("k") == 2)
    )
    and_docs = {r.doc_id for r in both.collect()}
    assert phrase_docs <= and_docs
    assert phrase_docs  # nonempty at this SF


def test_bool_and_docs_contain_all_terms(spark, sf_dir):
    docs = [r.doc_id for r in search.bool_and(spark, sf_dir).collect()]
    flat = index_flat(spark, sf_dir).where(F.col("doc_id").isin(docs[:20]))
    per_doc = (
        flat.where(F.col("term").isin(*search.QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("k"))
        .collect()
    )
    assert all(r.k == len(search.QUERY_TERMS) for r in per_doc)


def test_tfidf_zero_for_ubiquitous_terms(spark, sf_dir):
    """A term present in every doc has idf=ln(1)=0."""
    tfidf = search.tf_idf(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    flat = index_flat(spark, sf_dir)
    ubiquitous = [
        r.term
        for r in flat.groupBy("term").count().where(F.col("count") >= n_docs).collect()
        if r.term
    ]
    if ubiquitous:
        vals = tfidf.where(F.col("term").isin(ubiquitous)).select("tfidf").collect()
        assert all(abs(v.tfidf) < 1e-9 for v in vals)


def test_bm25_scores_positive_and_sorted(spark, sf_dir):
    rows = search.bm25(spark, sf_dir).collect()
    assert rows
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_cooccur_pmi_properties(spark, sf_dir):
    """PMI rows: min-count gate respected, values finite, deterministic
    ordering on (pmi desc, w1, w2), and each PMI consistent with a direct
    recount of its bigram/marginal frequencies."""
    import math

    from sdu_hadoop_indexer_spark.text.search import MIN_COOCCUR, cooccur_pmi
    from sdu_hadoop_indexer_spark.text.indexer import tokenize
    from pyspark.sql import Window

    rows = cooccur_pmi(spark, sf_dir).collect()
    assert rows
    keys = [(-r.pmi, r.w1, r.w2) for r in rows]
    assert keys == sorted(keys)

    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tokenize(spark, sf_dir)
        .withColumn("w2", F.lead("term").over(w))
        .where(F.col("w2").isNotNull())
        .select(F.col("term").alias("w1"), "w2")
    )
    counts = {(r.w1, r.w2): r.c for r in big.groupBy("w1", "w2").agg(F.count("*").alias("c")).collect()}
    n = sum(counts.values())
    left = {}
    right = {}
    for (w1, w2), c in counts.items():
        left[w1] = left.get(w1, 0) + c
        right[w2] = right.get(w2, 0) + c
    for r in rows:
        c = counts[(r.w1, r.w2)]
        assert c >= MIN_COOCCUR
        expect = round(math.log(c * n / (left[r.w1] * right[r.w2])), 4)
        assert abs(r.pmi - expect) < 1e-9


def test_hybrid_rrf_fuses_both_legs(spark, sf_dir):
    """RRF score must equal the lattice-quantized 1/(K+rank) sum of the
    two registered legs, docs on BOTH legs must outrank equal-rank
    single-leg docs, and the output must be the top-10 by fused score."""
    from sdu_hadoop_indexer_spark.llm import similarity
    from sdu_hadoop_indexer_spark.text import search as s

    rows = similarity.search_hybrid_rrf(spark, sf_dir).collect()
    assert len(rows) == 10

    def q(rank):
        if rank is None:
            return 0
        return (2 * similarity.RRF_SCALE + (similarity.RRF_K + rank)) // (
            2 * (similarity.RRF_K + rank)
        )

    for r in rows:
        assert r.rrf_q8 == q(r.r_bm25) + q(r.r_vec)
        assert r.r_bm25 is not None or r.r_vec is not None
    # fused ordering is by rrf desc with doc_id tiebreak
    scores = [(r.rrf_q8, -r.doc_id) for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cooccur_llr_matches_independent_recompute(spark, tmp_path):
    """G² recomputed in pure Python from the bigram contingency must match
    the operator's rounded score, and a planted high-evidence collocation
    must outrank an equally-PMI'd rare pair (the property LLR exists for)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.text.search import MIN_COOCCUR, cooccur_llr

    # corpus: "alpha beta" x 40 (high-evidence collocation) vs "gamma
    # delta" x 5 (rare pair with the SAME perfect association — PMI ranks
    # it equal/higher, G² must rank it lower on evidence); filler words
    # keep the marginals from being degenerate without touching either
    # pair
    docs = ["alpha beta " * 40, "gamma delta " * 5,
            "filler other widget gadget " * 20]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["s"] * len(docs), pa.string()),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = cooccur_llr(spark, str(tmp_path)).collect()
    assert rows, "no collocations above MIN_COOCCUR"

    # independent bigram contingency from the raw texts
    from collections import Counter

    bg = Counter()
    for t in docs:
        toks = [x for x in t.lower().split(" ") if x]
        bg.update(zip(toks, toks[1:]))
    n = sum(bg.values())
    ca = Counter(); cb = Counter()
    for (a, b), k in bg.items():
        ca[a] += k
        cb[b] += k

    def g2(a, b):
        k = bg[(a, b)]
        terms = [
            (k, ca[a], cb[b]),
            (ca[a] - k, ca[a], n - cb[b]),
            (cb[b] - k, n - ca[a], cb[b]),
            (n - ca[a] - cb[b] + k, n - ca[a], n - cb[b]),
        ]
        s = sum(kk * math.log(kk * n / (r * c)) for kk, r, c in terms if kk > 0)
        return round(2 * s, 4) + 0.0

    for r in rows:
        assert r.c >= MIN_COOCCUR
        assert abs(r.llr - g2(r.w1, r.w2)) < 1e-9, (r.w1, r.w2)
    scores = {(r.w1, r.w2): r.llr for r in rows}
    assert scores[("alpha", "beta")] > scores[("gamma", "delta")] > 0
