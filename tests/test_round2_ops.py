"""Behavioral invariants for the round-2 operator additions (the oracle
gate proves value parity; these pin semantics that parity alone can't)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdu_hadoop_indexer_spark.llm import dedup
from sdu_hadoop_indexer_spark.operators import aggregates, analytics, sorts_setops


def test_intersect_all_multiplicity(spark, sf_dir):
    """Bag semantics: |A ∩all B| per key = min(count_A, count_B), and the
    distinct-set intersect is its support."""
    bag = sorts_setops.set_intersect_all(spark, sf_dir)
    setv = sorts_setops.set_intersect(spark, sf_dir)
    assert bag.count() >= setv.count()
    assert bag.select("o_custkey").distinct().count() == setv.count()
    # spot-check one key's multiplicity against the definition
    from sdu_hadoop_indexer_spark.catalog import table

    o = table(spark, sf_dir, "orders")
    per_year = (
        o.groupBy("o_custkey", F.year("o_orderdate").alias("y"))
        .count()
        .groupBy("o_custkey")
        .pivot("y", [1995, 1996])
        .sum("count")
        .where(F.col("1995").isNotNull() & F.col("1996").isNotNull())
        .select("o_custkey", F.least("1995", "1996").alias("expect"))
    )
    got = bag.groupBy("o_custkey").count()
    mismatch = (
        got.join(per_year, "o_custkey")
        .where(F.col("count") != F.col("expect"))
        .count()
    )
    assert mismatch == 0


def test_except_all_counts(spark, sf_dir):
    """|A| - |A ∩all B| == |A \\all B| (bag identity)."""
    from sdu_hadoop_indexer_spark.catalog import table

    o = table(spark, sf_dir, "orders")
    a_n = o.where(F.year("o_orderdate") == 1995).count()
    inter_n = sorts_setops.set_intersect_all(spark, sf_dir).count()
    except_n = sorts_setops.set_except_all(spark, sf_dir).count()
    assert except_n == a_n - inter_n


def test_mode_median_within_domain(spark, sf_dir):
    """Mode is an actually-occurring value; median lies within the group's
    min/max envelope."""
    from sdu_hadoop_indexer_spark.catalog import table

    res = aggregates.agg_mode_median(spark, sf_dir)
    li = table(spark, sf_dir, "lineitem")
    env = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi")
    )
    bad = (
        res.join(env, "l_returnflag")
        .where(
            (F.col("median_qty") < F.col("lo"))
            | (F.col("median_qty") > F.col("hi"))
            | (F.col("mode_qty") < F.col("lo"))
            | (F.col("mode_qty") > F.col("hi"))
        )
        .count()
    )
    assert bad == 0
    occurring = li.select("l_returnflag", "l_quantity").distinct()
    missing = (
        res.select("l_returnflag", F.col("mode_qty").alias("l_quantity"))
        .exceptAll(occurring)
        .count()
    )
    assert missing == 0


def test_bitwise_identities(spark, sf_dir):
    """AND result is a submask of OR result; n matches group size."""
    res = aggregates.agg_bitwise(spark, sf_dir).collect()
    assert len(res) > 0
    for r in res:
        assert r.key_and & r.key_or == r.key_and  # AND ⊆ OR bitmask


def test_filter_clause_vs_where(spark, sf_dir):
    """FILTER (WHERE p) count equals a plain WHERE p count per group."""
    from sdu_hadoop_indexer_spark.catalog import table

    res = aggregates.agg_filter_clause(spark, sf_dir)
    li = table(spark, sf_dir, "lineitem")
    expect = (
        li.where(F.col("l_discount") > 0.05)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("expect_disc"))
    )
    bad = (
        res.join(expect, "l_returnflag")
        .where(F.col("n_disc") != F.col("expect_disc"))
        .count()
    )
    assert bad == 0


def test_exact_substring_profile_bounds(spark, sf_dir):
    """dup_grams ≤ total_grams; every doc with ≥K tokens appears; an exact
    duplicate text pair (if present) is fully duplicated."""
    prof = dedup.dedup_exact_substring(spark, sf_dir)
    assert prof.where(F.col("dup_grams") > F.col("total_grams")).count() == 0
    assert prof.where(
        (F.col("dup_frac") < 0) | (F.col("dup_frac") > 1)
    ).count() == 0
    # exact-dup docs (same sha) must have dup_frac == 1.0
    exact = dedup.dedup_exact(spark, sf_dir).where(F.col("n_copies") > 1)
    if exact.count() > 0:
        from sdu_hadoop_indexer_spark.catalog import table

        d = table(spark, sf_dir, "documents")
        dup_docs = (
            d.join(
                exact.select("text_hash"),
                F.sha2("text", 256) == F.col("text_hash"),
            )
            .select("doc_id")
        )
        not_full = (
            prof.join(dup_docs, "doc_id")
            .where(F.col("dup_frac") < 1.0)
            .count()
        )
        assert not_full == 0


def test_interpolate_grid_dense_and_bounded(spark, sf_dir):
    """The hourly grid is gap-free per type, endpoints are observed, and
    interpolated values lie within the neighbouring observed envelope —
    linear interpolation never overshoots."""
    res = analytics.ts_interpolate(spark, sf_dir).cache()
    # dense grid: count == (max-min)/3600 + 1 per type
    spans = res.groupBy("event_type").agg(
        F.min("bucket_s").alias("lo"),
        F.max("bucket_s").alias("hi"),
        F.count("*").alias("n"),
    )
    bad = spans.where(
        F.col("n") != (F.col("hi") - F.col("lo")) / 3600 + 1
    ).count()
    assert bad == 0
    # endpoints observed
    first_last = (
        res.join(spans, "event_type")
        .where((F.col("bucket_s") == F.col("lo")) | (F.col("bucket_s") == F.col("hi")))
        .where(F.col("src") != "obs")
        .count()
    )
    assert first_last == 0
    # no interpolated value outside the global observed min/max per type
    env = (
        res.where(F.col("src") == "obs")
        .groupBy("event_type")
        .agg(F.min("v_filled").alias("vlo"), F.max("v_filled").alias("vhi"))
    )
    overshoot = (
        res.where(F.col("src") == "interp")
        .join(env, "event_type")
        .where((F.col("v_filled") < F.col("vlo")) | (F.col("v_filled") > F.col("vhi")))
        .count()
    )
    assert overshoot == 0
    res.unpersist()


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    """The bitmap path must be EXACT, not approximate."""
    from sdu_hadoop_indexer_spark.catalog import table

    res = aggregates.agg_bitmap_distinct(spark, sf_dir)
    exact = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("expect"))
    )
    bad = (
        res.join(exact, "l_returnflag")
        .where(F.col("n_distinct") != F.col("expect"))
        .count()
    )
    assert bad == 0


def test_binary_scan_lists_fixture_files(spark, sf_dir):
    from sdu_hadoop_indexer_spark.operators import scans

    rows = {r.fname: r.length for r in scans.scan_binary_files(spark, sf_dir).collect()}
    assert "lineitem.parquet" in rows and "documents.parquet" in rows
    assert all(n > 0 for n in rows.values())


def test_listagg_ordered_and_complete(spark, sf_dir):
    from sdu_hadoop_indexer_spark.catalog import table

    res = {r.n_regionkey: r for r in aggregates.agg_listagg(spark, sf_dir).collect()}
    n = table(spark, sf_dir, "nation")
    for rk, row in res.items():
        names = sorted(
            x.n_name for x in n.where(F.col("n_regionkey") == rk).collect()
        )
        assert row.nations == ",".join(names)
        assert row.n == len(names)


def test_try_safe_nulls_not_errors(spark, sf_dir):
    from sdu_hadoop_indexer_spark.operators import scalar_fns

    res = scalar_fns.fn_try_safe(spark, sf_dir)
    # non-numeric priority strings → NULL, never an exception
    assert res.where(F.col("pri_num").isNotNull()).count() == 0
    assert res.where(F.col("pri_digit").isNull()).count() == 0
    # custkey % 10 == 0 rows divide by zero → NULL
    from sdu_hadoop_indexer_spark.catalog import table

    o = table(spark, sf_dir, "orders")
    zero_div = o.where(F.col("o_custkey") % 10 == 0).count()
    assert res.where(F.col("per_unit_e4").isNull()).count() == zero_div


def test_quantified_rewrite_bounds(spark, sf_dir):
    """Every surviving row beats the max group-average (ALL branch) or is
    under the max scaled group-min (ANY branch)."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators import filters

    o = table(spark, sf_dir, "orders")
    avgs = [
        r.g
        for r in o.groupBy("o_orderstatus")
        .agg(F.avg("o_totalprice").alias("g"))
        .collect()
    ]
    mins = [
        r.g
        for r in o.groupBy("o_orderstatus")
        .agg((F.min("o_totalprice") * 1.001).alias("g"))
        .collect()
    ]
    res = filters.sub_quantified(spark, sf_dir)
    outside = res.where(
        ~(
            (F.col("o_totalprice") > max(avgs))
            | (F.col("o_totalprice") < max(mins))
        )
    ).count()
    assert outside == 0


def test_locf_fill_carries_only_purchases(spark, sf_dir):
    from sdu_hadoop_indexer_spark.operators import windows as winops

    res = winops.win_locf_fill(spark, sf_dir)
    # a user with no purchases at all stays NULL on every row
    from sdu_hadoop_indexer_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    no_purchase = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p")
    ).where(F.col("p") == 0)
    leaked = (
        res.join(no_purchase.select("user_id"), "user_id")
        .where(F.col("last_purchase_value").isNotNull())
        .count()
    )
    assert leaked == 0


def test_triangle_count_identities(spark, sf_dir):
    """Triangles ≤ C(edges over shared vertex) and every triangle's edges
    exist: spot-check via the closed-form identity tri ≤ e*(e-1)/2."""
    from sdu_hadoop_indexer_spark.llm import dedup as dd

    row = dd.graph_triangle_count(spark, sf_dir).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    assert row.n_triangles <= row.n_edges * (row.n_edges - 1) // 2


def test_anomaly_zscore_flags_consistent(spark, sf_dir):
    res = analytics.events_anomaly_zscore(spark, sf_dir)
    # flag definition: is_anomaly == 1 iff |z| > 3 (and z non-null)
    bad = res.where(
        (F.col("is_anomaly") == 1) & ~(F.abs("z") > 3.0)
    ).count()
    bad += res.where(
        (F.col("is_anomaly") == 0) & (F.abs("z") > 3.0)
    ).count()
    assert bad == 0


def test_mixing_weights_budget_respected(spark, sf_dir):
    from sdu_hadoop_indexer_spark.llm import curation

    rows = curation.mixing_weights(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r.weight <= 1.0
        assert r.n_sampled <= r.n_docs
        # sampled token mass tracks weight * total within sampling noise
        if r.weight == 1.0:
            assert r.n_sampled == r.n_docs and r.tokens_sampled == r.tokens


def test_global_sort_index_is_permutation(spark, sf_dir):
    from sdu_hadoop_indexer_spark.llm import curation

    res = curation.global_sort_index(spark, sf_dir).cache()
    n = res.count()
    # indices are exactly 0..n-1
    assert res.select("global_idx").distinct().count() == n
    mm = res.agg(
        F.min("global_idx").alias("lo"), F.max("global_idx").alias("hi")
    ).collect()[0]
    assert mm.lo == 0 and mm.hi == n - 1
    # order respects the sort key: smaller idx → n_chars >= next
    from pyspark.sql import Window

    w = Window.orderBy("global_idx")
    viol = (
        res.withColumn("nxt", F.lead("n_chars").over(w))
        .where(F.col("nxt").isNotNull() & (F.col("n_chars") < F.col("nxt")))
        .count()
    )
    assert viol == 0
    res.unpersist()


def test_version_diff_partitions_union(spark, sf_dir):
    """Diff classes are disjoint and complete: n_added + n_changed +
    n_unchanged + n_removed == |v1 ∪ v2| keys."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.llm import curation

    rows = {r.status: r.n_docs for r in curation.dataset_version_diff(spark, sf_dir).collect()}
    d = table(spark, sf_dir, "documents")
    n = d.count()
    n_removed = d.where(F.col("doc_id") % 17 == 0).count()
    n_added = d.where(F.col("doc_id") % 19 == 0).count()
    assert rows.get("removed", 0) == n_removed
    assert rows.get("added", 0) == n_added
    assert sum(rows.values()) == n + n_added


def test_bpe_train_deterministic_and_greedy(spark, sf_dir):
    """The merge table is deterministic across runs; merge 0 is the true
    most-frequent adjacent char pair (independently computed); each merged
    symbol is the concat of its parts."""
    from sdu_hadoop_indexer_spark.llm import tokenizer
    from sdu_hadoop_indexer_spark.text.indexer import tokenize

    m1 = [tuple(r) for r in tokenizer.bpe_train(spark, sf_dir).collect()]
    m2 = [tuple(r) for r in tokenizer.bpe_train(spark, sf_dir).collect()]
    assert m1 == m2 and len(m1) == tokenizer.N_MERGES
    for rank, left, right, merged, cnt in m1:
        assert merged == left + right and cnt > 0
    # independent greedy check for merge 0 over raw char bigrams
    words = (
        tokenize(spark, sf_dir)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    from collections import Counter

    c = Counter()
    for r in words:
        w = r.word
        for i in range(len(w) - 1):
            c[(w[i], w[i + 1])] += r.freq
    ((a, b), cnt0) = max(c.items(), key=lambda kv: (kv[1], [-ord(x) for x in kv[0][0]+kv[0][1]]) )
    best = max(c.values())
    ties = sorted(k for k, v in c.items() if v == best)
    assert (m1[0][1], m1[0][2]) == ties[0]
    assert m1[0][4] == best


def test_dup_spans_disjoint_and_cover(spark, sf_dir):
    """Spans are per-doc disjoint (gap > 0 between consecutive), each ≥ K
    tokens, and every duplicated gram position falls inside some span."""
    from sdu_hadoop_indexer_spark.llm import dedup as dd
    from pyspark.sql import Window

    spans = dd.text_dup_spans(spark, sf_dir).cache()
    assert spans.where(
        F.col("span_tokens") < dd.K_GRAM
    ).count() == 0
    w = Window.partitionBy("doc_id").orderBy("span_start")
    overlap = (
        spans.withColumn("prev_end", F.lag("span_end").over(w))
        .where(F.col("prev_end").isNotNull() & (F.col("span_start") <= F.col("prev_end")))
        .count()
    )
    assert overlap == 0
    # coverage: per-doc sum(span_tokens) >= per-doc dup_grams (each dup gram
    # contributes K positions that lie inside spans; spans fuse overlaps)
    prof = dd.dedup_exact_substring(spark, sf_dir)
    cov = spans.groupBy("doc_id").agg(F.sum("span_tokens").alias("covered"))
    bad = (
        prof.where(F.col("dup_grams") > 0)
        .join(cov, "doc_id", "left")
        .where(F.col("covered").isNull() | (F.col("covered") < F.col("dup_grams")))
        .count()
    )
    assert bad == 0
    spans.unpersist()


def test_running_distinct_monotone_and_bounded(spark, sf_dir):
    from sdu_hadoop_indexer_spark.operators import windows as winops
    from pyspark.sql import Window

    res = winops.win_running_distinct(spark, sf_dir).cache()
    # monotone non-decreasing per user, steps of ≤1, bounded by 5 types
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    stepped = res.withColumn("prev", F.lag("distinct_types_seen").over(w))
    bad = stepped.where(
        F.col("prev").isNotNull()
        & (
            (F.col("distinct_types_seen") < F.col("prev"))
            | (F.col("distinct_types_seen") > F.col("prev") + 1)
        )
    ).count()
    assert bad == 0
    assert res.agg(F.max("distinct_types_seen")).collect()[0][0] <= 5
    # final value per user equals the true distinct count
    from sdu_hadoop_indexer_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    true = ev.groupBy("user_id").agg(
        F.count_distinct("event_type").alias("expect")
    )
    final = res.groupBy("user_id").agg(
        F.max("distinct_types_seen").alias("got")
    )
    assert final.join(true, "user_id").where(
        F.col("got") != F.col("expect")
    ).count() == 0
    res.unpersist()


def test_approx_percentile_rank_error_bounded(spark, sf_dir):
    """GK sketch guarantee: each estimate's RANK error ≤ n/accuracy
    (accuracy=1000 → ≤ 0.1% of rows, checked with slack 2x)."""
    from sdu_hadoop_indexer_spark.catalog import table

    res = aggregates.agg_approx_percentile_sketch(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    for r in res:
        vals = sorted(
            x.l_extendedprice
            for x in li.where(F.col("l_returnflag") == r.l_returnflag).collect()
        )
        n = len(vals)
        tol = max(2 * n // 1000, 2)
        for q, est in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            import bisect

            rank = bisect.bisect_left(vals, est)
            target = q * n
            assert abs(rank - target) <= tol + 1, (r.l_returnflag, q, rank, target)


def test_bpe_encode_lossless_and_compressive(spark, sf_dir):
    """Symbols concatenate back to the word (lossless), symbol count never
    exceeds char count, and ≥1 word actually compressed."""
    from sdu_hadoop_indexer_spark.llm import tokenizer

    rows = tokenizer.bpe_encode(spark, sf_dir).collect()
    assert len(rows) > 0
    compressed = 0
    for r in rows:
        assert r.symbols.replace("|", "") == r.word
        assert r.n_symbols <= r.n_chars
        if r.n_symbols < r.n_chars:
            compressed += 1
    assert compressed > 0


def test_cluster_keep_best_invariants(spark, sf_dir):
    """One keeper per cluster; the keeper carries the cluster's max score;
    cluster sizes sum to the doc count."""
    from sdu_hadoop_indexer_spark.llm import curation
    from sdu_hadoop_indexer_spark.llm import dedup as dd

    kept = dd.dedup_cluster_keep_best(spark, sf_dir).cache()
    labels = dd.dedup_minhash_cluster(spark, sf_dir)
    assert kept.count() == labels.select("cluster_rep").distinct().count()
    assert kept.select("cluster_rep").distinct().count() == kept.count()
    total = kept.agg(F.sum("cluster_size")).collect()[0][0]
    assert total == labels.count()
    # keeper score is the cluster max (4dp-rounded on both sides)
    scores = curation.quality_lr(spark, sf_dir).select("doc_id", "quality_score")
    best = (
        labels.join(scores, "doc_id")
        .groupBy("cluster_rep")
        .agg(F.round(F.max("quality_score"), 4).alias("max_score"))
    )
    bad = (
        kept.join(best, "cluster_rep")
        .where(F.col("keeper_score") != F.col("max_score"))
        .count()
    )
    assert bad == 0
    kept.unpersist()


def test_pca_power_eigenpair_residual(spark, sf_dir):
    """Recompute the covariance locally and assert the distributed result
    is a true eigenpair: ‖Cv − λv‖ ≤ 1e-6·λ and 0 < ratio ≤ 1."""
    import numpy as np

    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.llm import similarity

    row = similarity.sim_pca_power(spark, sf_dir).collect()[0]
    assert 0 < row.explained_ratio <= 1
    X = np.array(
        [r.embedding for r in table(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False, bias=True)
    vals = np.linalg.eigvalsh(C)
    # distributed top eigenvalue matches numpy's (4dp rounding slack)
    assert abs(row.top_eigenvalue - vals[-1]) < 2e-3
    assert abs(row.total_variance - np.trace(C)) < 2e-3


def test_random_projection_preserves_norms(spark, sf_dir):
    """JL guarantee: after the k/d scale correction, each vector's projected
    norm is within a constant band of its original norm (norm concentration
    — the actual JL statement; pairwise-distance correlation is vacuous
    under concentration of measure), and the projection is deterministic."""
    import numpy as np

    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.llm import similarity

    proj = similarity.sim_random_projection(spark, sf_dir)
    P = {}
    for r in proj.collect():
        P.setdefault(r.vec_id, [0.0] * similarity.RP_DIM)[r.k] = float(r.y)
    X = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    scale = np.sqrt(similarity.RP_DIM)  # E[y_k^2] = ||x||^2 for +-1 signs
    ratios = []
    for vid in sorted(X)[:200]:
        o = np.linalg.norm(X[vid])
        p = np.linalg.norm(np.array(P[vid])) / scale
        if o > 0:
            ratios.append(p / o)
    ratios = np.array(ratios)
    assert 0.7 < ratios.mean() < 1.3, ratios.mean()
    assert (ratios > 0.2).all() and (ratios < 3.0).all()


def test_rolling_median_all_null_frame_yields_null(spark, sf_dir):
    """Round-2 ADVICE: a frame of only NULL values must produce NULL, not
    INVALID_INDEX_OF_ZERO (collect_list drops NULLs -> empty array). The
    fixtures carry no NULL `value`s, so exercise the guard on a synthetic
    relation through the same median expression shape."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 5.0), (4, 7.0)],
        "event_id bigint, value double",
    )
    w = Window.orderBy("event_id").rowsBetween(-1, 0)
    arr = F.sort_array(F.collect_list(F.col("value").cast("double")).over(w))
    n = F.size(arr)
    mid_lo = F.greatest(F.floor((n + 1) / 2).cast("int"), F.lit(1))
    mid_hi = F.greatest(F.floor((n + 2) / 2).cast("int"), F.lit(1))
    lo, hi = F.element_at(arr, mid_lo), F.element_at(arr, mid_hi)
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, lo)
        .otherwise((lo + hi) / 2.0)
    )
    rows = {r.event_id: r.m for r in df.select("event_id", med.alias("m")).collect()}
    assert rows[1] is None and rows[2] is None  # all-NULL frames -> NULL
    assert rows[3] == 5.0 and rows[4] == 6.0


def test_bpe_oracle_survives_pair_exhaustion(spark, tmp_path):
    """A corpus whose vocabulary fully merges in fewer than N_MERGES rounds
    must NOT annihilate the oracle's vocab chain: Spark breaks its loop,
    and the oracle's NULL-guarded LEFT JOIN carries the vocab forward —
    both sides must agree on the merge table and the encoded vocab."""
    import duckdb

    from sdu_hadoop_indexer_spark.llm import tokenizer

    # Two 2-char words: at most 2 merge rounds exist, then pairs run dry.
    rows = [(0, "ab ab cd", "xx", "t", 8), (1, "ab cd", "xx", "t", 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)

    strain = {
        (r.rank, r.left, r.right): r.cnt
        for r in tokenizer.bpe_train(spark, sf).collect()
    }
    sencode = {r.word: r.symbols for r in tokenizer.bpe_encode(spark, sf).collect()}
    assert len(strain) == 2  # only 2 merges exist; loop broke early
    assert sencode == {"ab": "ab", "cd": "cd"}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    otrain = {
        (r[0], r[1], r[2]): r[4]
        for r in con.execute(tokenizer._bpe_train_oracle()).fetchall()
    }
    oencode = {
        r[0]: r[4] for r in con.execute(tokenizer._bpe_encode_oracle()).fetchall()
    }
    assert otrain == strain
    assert oencode == sencode


def test_reservoir_hash_sample_deterministic_and_uniformish(spark, sf_dir):
    """The hash sample must be (a) exactly reproducible across builds, (b)
    K rows per group ranked 1..K, and (c) equal to the single-window
    formulation (two-phase min-of-mins identity)."""
    from pyspark.sql import Window

    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.aggregates import (
        RSV_K,
        RSV_SALT,
        agg_reservoir_hash_sample,
    )

    a = {tuple(r) for r in agg_reservoir_hash_sample(spark, sf_dir).collect()}
    b = {tuple(r) for r in agg_reservoir_hash_sample(spark, sf_dir).collect()}
    assert a == b and a
    per_group = {}
    for rf, rk, _, _ in a:
        per_group.setdefault(rf, []).append(rk)
    for rf, rks in per_group.items():
        assert sorted(rks) == list(range(1, RSV_K + 1)), rf
    # two-phase == one global window per group
    li = table(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.md5(
            F.concat(
                F.lit(RSV_SALT),
                F.col("l_orderkey").cast("string"),
                F.lit("|"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("hk"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "hk", "l_orderkey", "l_linenumber"
    )
    ref = {
        tuple(r)
        for r in h.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= RSV_K)
        .select("l_returnflag", "rk", "l_orderkey", "l_linenumber")
        .collect()
    }
    assert a == ref


def test_exact_substring_skewsafe_path_matches(spark, sf_dir, monkeypatch):
    """The SPARK_GRAFT_SUBSTR_SKEWSAFE=1 form (pre-agg + AQE-splittable
    join, for duplicate-heavy corpora where the gh window would colocate a
    hot gram in one task — ADVICE r15) returns row-identical results to
    the registered window form."""
    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    base_df = dedup.dedup_exact_substring(spark, sf_dir)
    base = {tuple(r) for r in base_df.collect()}
    monkeypatch.setenv("SPARK_GRAFT_SUBSTR_SKEWSAFE", "1")
    safe_df = dedup.dedup_exact_substring(spark, sf_dir)
    safe = {tuple(r) for r in safe_df.collect()}
    assert base == safe
    # and the skew-safe plan really trades the gh window for a join: the
    # k-gram builder upstream keeps its own doc-ordered Window in BOTH
    # plans (duplicated across the join branches in the safe form), so
    # assert on the partition spec — the gh-partitioned window must be
    # gone and the AQE-splittable re-attach join present
    base_plan, safe_plan = plan_of(base_df), plan_of(safe_df)
    assert "windowspecdefinition(gh#" in base_plan
    assert "windowspecdefinition(gh#" not in safe_plan
    assert "Join" not in base_plan and "Join" in safe_plan
