"""Physical-plan shape assertions: the 100 TB design claims, checked.

SURVEY.md §4.2: pushdown, pruning, broadcast, codegen, partial aggregation and
TakeOrdered are supposed to come from Catalyst *because we express plans
declaratively* — these tests pin that contract so a refactor that silently
breaks it (e.g. an opaque UDF wrapping a filter) fails CI.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sdu_hadoop_indexer_spark.catalog import table
from sdu_hadoop_indexer_spark.operators import joins, sorts_setops
from sdu_hadoop_indexer_spark.text.indexer import index_nested


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    df = li.where(F.col("l_quantity") < 10).select("l_orderkey")
    explained = _formatted(df)
    assert "LessThan(l_quantity,10.0)" in explained  # in PushedFilters


def test_column_pruning_reads_two_columns(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    explained = _formatted(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in explained


def test_broadcast_join_is_broadcast(spark, sf_dir):
    assert "BroadcastHashJoin" in _plan(joins.join_broadcast(spark, sf_dir))


def test_sortmerge_hint_respected(spark, sf_dir):
    assert "SortMergeJoin" in _plan(joins.join_sortmerge(spark, sf_dir))


def test_sort_limit_is_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(sorts_setops.sort_limit(spark, sf_dir))


def test_index_build_has_partial_aggregation(spark, sf_dir):
    """The in-mapper-combining pattern (App.scala:153-166) must appear as
    partial→final aggregation around the exchange. (collect_list aggregates
    run in ObjectHashAggregate, which is partial-capable but not codegen'd —
    codegen is asserted on the scalar-aggregate path below.)"""
    plan = _plan(index_nested(spark, sf_dir))
    assert "partial" in plan.lower()
    assert "ObjectHashAggregate" in plan or "HashAggregate" in plan


def test_scalar_agg_is_codegened(spark, sf_dir):
    """Q1-shape aggregation must stay inside WholeStageCodegen spans."""
    from sdu_hadoop_indexer_spark.operators.aggregates import agg_hash_groupby

    import contextlib
    import io

    df = agg_hash_groupby(spark, sf_dir)
    # AQE wraps the plan lazily and reports 0 codegen subtrees pre-execution;
    # disable it just for the explain so the static plan is visible.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in buf.getvalue()
    assert "Found 0" not in buf.getvalue()


def test_partitioned_sink_readback_prunes_partitions(spark, sf_dir):
    """The filter on the Hive partition column must become a PartitionFilters
    entry on the scan (planning-time directory pruning), not a post-scan
    Filter over all partitions."""
    from sdu_hadoop_indexer_spark.operators.scans import sink_partitioned_pruned

    explained = _formatted(sink_partitioned_pruned(spark, sf_dir))
    assert "PartitionFilters" in explained
    assert "o_orderstatus" in explained.split("PartitionFilters", 1)[1].split("\n")[0]


def test_topk_search_broadcasts_query_side(spark, sf_dir):
    """Brute-force ANN must broadcast the (tiny) query set so the candidate
    scan never shuffles."""
    from sdu_hadoop_indexer_spark.llm.similarity import sim_topk_search

    assert "Broadcast" in _plan(sim_topk_search(spark, sf_dir))


def test_minhash_pairs_join_is_distributed_equi_join(spark, sf_dir):
    """Pair generation must go through a shuffled/broadcast equi-join on the
    bucket key — not an in-array expansion (which would serialize a
    mega-bucket into one task) and not a cartesian product."""
    from sdu_hadoop_indexer_spark.llm.dedup import dedup_minhash_lsh

    plan = _plan(dedup_minhash_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed+sorted by doc_id → the join must be a SortMergeJoin
    with ZERO Exchange nodes (bucket co-location replaces the shuffle)."""
    from sdu_hadoop_indexer_spark.operators.scans import sink_bucketed_join

    df = sink_bucketed_join(spark, sf_dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # at tiny SF the dl side would broadcast, hiding the co-location being
    # demonstrated — disable auto-broadcast so the merge path is planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_range_join_not_cartesian(spark, sf_dir):
    """join_range keys on user_id — must be an equi-join strategy, never
    BroadcastNestedLoop/cartesian over the full event table."""
    plan = _plan(joins.join_range(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_blocked_pairs_not_cartesian(spark, sf_dir):
    """The blocked all-pairs harness must distribute via broadcast pair maps
    + one shuffle on pair_id — never a cartesian product of embeddings, and
    never a driver-side collect (the plan sources only the parquet scan)."""
    from sdu_hadoop_indexer_spark.llm.dedup import dedup_embedding_cosine
    from sdu_hadoop_indexer_spark.llm.similarity import sim_nearest_pairs

    for q in (sim_nearest_pairs, dedup_embedding_cosine):
        plan = _plan(q(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # the tiny block-pair maps
        # vectors must come straight from the parquet scan; the only
        # driver-originated relations (Scan ExistingRDD = the block-pair
        # maps) must not carry the embedding column
        for line in plan.splitlines():
            if "Scan ExistingRDD" in line:
                assert "embedding" not in line


def test_pmi_broadcasts_marginals(spark, sf_dir):
    """PMI: the vocabulary-sized marginals and the 1-row total must be
    broadcast; the only wide exchange is the bigram count shuffle; the
    final top-50 is TakeOrdered, not a global sort."""
    from sdu_hadoop_indexer_spark.text.search import cooccur_pmi

    plan = _plan(cooccur_pmi(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_curation_pipeline_single_scan(spark, sf_dir):
    """The three gates must fuse into the one documents scan (pipelined
    filters — no intermediate materialization), with the dedup as a single
    aggregation exchange on the fingerprint."""
    from sdu_hadoop_indexer_spark.llm.curation import curation_pipeline

    plan = _plan(curation_pipeline(spark, sf_dir))
    scans = plan.count("Scan parquet")  # matches FileScan parquet too
    assert scans <= 2  # gated side + rep side of the self-join, nothing more
    assert "CartesianProduct" not in plan


def test_salted_join_shuffles_on_salted_key(spark, sf_dir):
    """The salted join must run as a shuffled join whose keys include the
    salt column (each hot key spread over JOIN_SALTS reducers) — not a
    broadcast (where salting would demonstrate nothing)."""
    plan = _plan(joins.join_skew_salted(spark, sf_dir))
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    join_line = next(
        l for l in plan.splitlines()
        if "ShuffledHashJoin" in l or "SortMergeJoin" in l
    )
    assert "salt" in join_line


def test_python_datasource_plans_8_partitions(spark, sf_dir):
    """The custom source must parallelize: its reader plans PYDS_PARTS
    input partitions, and the scan reflects that."""
    from sdu_hadoop_indexer_spark.operators import scans

    df = scans.scan_python_datasource(spark, sf_dir)
    assert df.rdd.getNumPartitions() == scans.PYDS_PARTS
    parts = {r.part for r in df.select("part").distinct().collect()}
    assert parts == set(range(scans.PYDS_PARTS))


def test_term_bucketed_lookup_prunes_buckets(spark, sf_dir):
    """The stored term-bucketed index must satisfy an equality lookup from a
    subset of buckets (bucket pruning visible in the scan node)."""
    import re

    from sdu_hadoop_indexer_spark.operators import scans

    plan = _plan(scans.sink_term_bucketed_lookup(spark, sf_dir))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(1)) < int(m.group(2))
    assert int(m.group(1)) <= len(scans.LOOKUP_TERMS)


def test_fuzzy_dedup_join_is_blocked_equi_join(spark, sf_dir):
    """Blocked entity resolution must join on the block key (hash/merge
    equi-join), never evaluate Levenshtein over a cartesian pair space."""
    from sdu_hadoop_indexer_spark.operators import analytics

    plan = _plan(analytics.dedup_fuzzy_names(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_sessionize_windows_share_one_exchange(spark, sf_dir):
    """Both window passes (lag flag, running session id) use the same
    (user_id | ts, event_id) spec — the plan must contain exactly one
    shuffle for them (plus the final partial→final session rollup, which
    re-uses the user_id hash partitioning, so: one Exchange total)."""
    from sdu_hadoop_indexer_spark.operators import analytics

    plan = _plan(analytics.win_sessionize(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_stages_share_one_exchange(spark, sf_dir):
    """Three chained per-user window mins + the distinct + global rollup:
    the user_id partitioning must be established once."""
    from sdu_hadoop_indexer_spark.operators import analytics

    plan = _plan(analytics.events_funnel(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_dpp_join_has_dynamic_pruning_expression(spark, sf_dir):
    """The day-partitioned fact scan must carry a runtime
    dynamicpruningexpression in its PartitionFilters (star-join pruning)."""
    from sdu_hadoop_indexer_spark.operators import joins

    df = joins.join_dpp_partitioned(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_null_safe_join_is_hash_join(spark, sf_dir):
    """`<=>` must plan as a real equi-join (hash/sort-merge), not a nested
    loop over the cross space."""
    from sdu_hadoop_indexer_spark.operators import joins

    plan = _plan(joins.join_null_safe(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_pii_redact_is_map_only(spark, sf_dir):
    """Redaction is a fused scan+project: no Exchange, fully codegen'd."""
    from sdu_hadoop_indexer_spark.llm import curation

    plan = _plan(curation.pii_redact(spark, sf_dir))
    assert "Exchange" not in plan
    assert "*(1)" in plan  # whole-stage-codegen stage marker


def test_quality_lr_is_map_only(spark, sf_dir):
    """Model inference as a projection: no Exchange in the plan."""
    from sdu_hadoop_indexer_spark.llm import curation

    plan = _plan(curation.quality_lr(spark, sf_dir))
    assert "Exchange" not in plan


def test_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime Bloom-filter join pruning (SURVEY §4.2): with a selective
    filter on the build side of a shuffled join, Spark injects a
    `might_contain(bloom_filter_agg(...))` predicate on the probe side so
    the big fact shuffle drops non-joining rows BEFORE the exchange — the
    100 TB complement to dynamic partition pruning for non-partition keys.
    Size thresholds are production-tuned, so this scopes them down to
    fixture scale (and restores them) rather than leaving toy thresholds in
    the shared session.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
        "spark.sql.autoBroadcastJoinThreshold": "10485760",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "1024PB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = table(spark, sf_dir, "lineitem")
        df = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert df.count() > 0  # executes with the bloom filter in place
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_banded_range_join_is_equi_not_bnlj(spark, sf_dir):
    """The banded pure-range join must plan as a shuffled equi-join on the
    band key — the whole point is escaping BroadcastNestedLoopJoin."""
    from sdu_hadoop_indexer_spark.operators import joins

    plan = _plan(joins.join_range_banded(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cbo_stats_inform_planner(spark, sf_dir):
    """ANALYZE TABLE stats must reach the optimizer: after COMPUTE
    STATISTICS the table's row count and size appear in the catalog and the
    CBO (spark.sql.cbo.enabled) can use them — the 100 TB prerequisite for
    stats-driven join reordering on tables too big to sample at plan time."""
    from sdu_hadoop_indexer_spark.catalog import table

    table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "cbo_nation"
    )
    spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
    stats = spark.sql("DESCRIBE EXTENDED cbo_nation").collect()
    blob = "\n".join(str(r) for r in stats)
    assert "rowCount" in blob or "Statistics" in blob
    old = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        li = table(spark, sf_dir, "lineitem")
        joined = li.join(
            spark.table("cbo_nation"),
            li.l_suppkey % 25 == spark.table("cbo_nation").n_nationkey,
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        # the analyzed dim's stats mark it broadcast-eligible
        assert "cbo_nation" in plan or "nation" in plan
        phys = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in phys or "BroadcastHashJoin" in phys
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_rfm_has_no_global_window(spark, sf_dir):
    """Round-3 scale fix pin: events_rfm_segments must contain NO
    unpartitioned window ("No Partition Defined" WindowExec funnels the
    whole relation through one task). Every ntile is rebuilt as a
    bucket-partitioned row_number + prefix-sum offset."""
    from sdu_hadoop_indexer_spark.operators.analytics import events_rfm_segments

    plan = _plan(events_rfm_segments(spark, sf_dir))
    assert "Window" in plan  # the bucket-partitioned windows are there
    assert "No Partition Defined" not in plan


def test_asof_join_is_single_window_pass(spark, sf_dir):
    """Round-3 scale fix pin: join_asof must be the LOCF window form — one
    user-partitioned window over events, NO join (the round-2 join-then-rank
    exploded each purchase against its full per-user history)."""
    plan = _plan(joins.join_asof(spark, sf_dir))
    assert "Window" in plan
    assert "Join" not in plan
    assert "No Partition Defined" not in plan


def test_xhash_pipelines_stay_jvm_side(spark, sf_dir):
    """The cross-engine fold/family hashing (round 3) is pure Catalyst
    expression arithmetic — flipping the sketch family to EXACT oracles must
    not have smuggled Python into the hot path. No Python eval operator may
    appear in any xhash-based plan (simhash is one hash aggregation; LSH is
    the bucket equi-join pinned above)."""
    from sdu_hadoop_indexer_spark.llm.dedup import dedup_simhash
    from sdu_hadoop_indexer_spark.llm.similarity import sim_topk_lsh
    from sdu_hadoop_indexer_spark.text.mining import countmin_heavyhitters

    for fn in (dedup_simhash, sim_topk_lsh, countmin_heavyhitters):
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
        assert "FlatMapGroupsInPandas" not in plan, fn.__name__


def test_ewma_uses_single_window_pass(spark, sf_dir):
    """All EWMA_LOOKBACK lag() expressions (numerator + denominator, 40
    window calls) share ONE window spec — Catalyst must evaluate them in a
    single WindowExec over a single per-type sort, or the hourly series
    would be re-sorted dozens of times."""
    from sdu_hadoop_indexer_spark.operators.analytics import ts_ewma

    plan = _plan(ts_ewma(spark, sf_dir))
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_attribution_is_single_window_no_join(spark, sf_dir):
    """Last-touch attribution must stay a one-window-pass per-user
    computation — a join formulation (purchases × touches) would shuffle
    the event stream twice and explode on heavy users."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        events_attribution_last_touch,
    )

    plan = _plan(events_attribution_last_touch(spark, sf_dir))
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_semi_filters_map_side_and_never_cartesian(spark, sf_dir):
    """The bloom is a LITERAL word array tested map-side on the fact rows
    (round-5: replaced the fixture-scale survivor-key broadcast): the only
    join in the plan is the exact residual semi against the broadcast
    build side — the fact table is pruned without a distinct, a survivor
    set, or any exchange — and nothing degenerates to a cartesian/BNLJ."""
    plan = _plan(joins.join_bloom_semi(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 1  # residual semi only
    assert "element_at" in plan  # the literal-array bloom probe filter
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_recall_eval_joins_broadcast(spark, sf_dir):
    from sdu_hadoop_indexer_spark.llm.similarity import sim_ann_recall_eval

    plan = _plan(sim_ann_recall_eval(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_cdc_apply_is_single_ranking_window(spark, sf_dir):
    from sdu_hadoop_indexer_spark.streaming.event_windows import cdc_apply

    plan = _plan(cdc_apply(spark, sf_dir))
    # exactly one Window node; WindowGroupLimit nodes are the rank-filter
    # pushdown (rn = 1 evaluated before the full sort) — keep them
    assert plan.count("Window [") == 1
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan


def test_rake_broadcasts_word_scores_no_cartesian(spark, sf_dir):
    from sdu_hadoop_indexer_spark.text.mining import keyphrase_rake

    plan = _plan(keyphrase_rake(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_asof_forward_is_single_window_pass(spark, sf_dir):
    """The forward as-of must stay the single-window form like its backward
    twin — a join-then-rank regression would be quadratic per long user."""
    plan = _plan(joins.join_asof_forward(spark, sf_dir))
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_hll_portable_is_two_hash_aggs_no_window(spark, sf_dir):
    """The portable HLL must stay a pure (partial-combinable) aggregation
    pipeline: register build + register merge are HashAggregates, never a
    window or sort — that mergeability IS the 100 TB claim."""
    from sdu_hadoop_indexer_spark.operators.aggregates import agg_hll_portable

    plan = _plan(agg_hll_portable(spark, sf_dir))
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # estimate (3 rows) broadcast onto exact


def test_linreg_is_single_partial_agg(spark, sf_dir):
    """OLS = one HashAggregate pair over the fact scan (map-side partial),
    then scalar projection — no join, window, or second scan."""
    from sdu_hadoop_indexer_spark.operators.aggregates import agg_linreg

    plan = _plan(agg_linreg(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert "Window" not in plan
    assert "Join" not in plan
    # partial→final pair present
    assert plan.count("HashAggregate") >= 2


def test_weighted_median_windows_are_not_global_fact_sorts(spark, sf_dir):
    """Bucket-then-refine: the only windows run (a) over the ~100-row
    bucket relation and (b) over the rows of ONE located bucket per group
    (reached through broadcast joins) — never a window over the whole
    fact table without the bucket filter. Pin: every join that feeds the
    refine stage is broadcast, nothing is cartesian."""
    from sdu_hadoop_indexer_spark.operators.aggregates import (
        agg_weighted_median,
    )

    plan = _plan(agg_weighted_median(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # all tiny sides broadcast
    assert plan.count("Window") == 2  # bucket locate + in-bucket refine only
    assert plan.count("Scan parquet") == 2  # bucket build + refine probe


def test_autocorr_pairs_after_reduction(spark, sf_dir):
    """The self-join must happen AFTER the corpus reduces to (type, hour)
    counts — exactly one scan of the events parquet, and no cartesian."""
    from sdu_hadoop_indexer_spark.operators.analytics import ts_autocorr

    plan = _plan(ts_autocorr(spark, sf_dir))
    assert plan.count("Scan parquet") <= 2  # Spark may rescan for self-join
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_existence_flag_plans_existence_join_no_fanout(spark, sf_dir):
    """The EXISTS-in-SELECT form must plan Catalyst's ExistenceJoin (one
    probe, no row duplication) — not a left join needing a re-distinct —
    and the status filter must prune the build side before its exchange."""
    from sdu_hadoop_indexer_spark.operators.joins import join_existence_flag

    plan = _plan(join_existence_flag(spark, sf_dir))
    assert "ExistenceJoin" in plan
    assert "CartesianProduct" not in plan
    # build-side pushdown: the orders scan carries the status predicate
    assert "o_orderstatus" in plan and "O" in plan


def test_pct_change_is_single_window_over_reduced_series(spark, sf_dir):
    """One fact scan reduces to (type, hour) counts; ONE lag window over
    that calendar-sized relation; no joins."""
    from sdu_hadoop_indexer_spark.operators.analytics import ts_pct_change

    plan = _plan(ts_pct_change(spark, sf_dir))
    assert plan.count("Scan parquet") == 1
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_type_overlap_single_fact_pass_with_exchange_reuse(spark, sf_dir):
    """The overlap matrix must make ONE pass over the fact table: the
    marginal (a,a) and intersection (a,b) branches both consume the same
    per-user pair aggregation, so after execution AQE must show the
    per-user exchange REUSED (not a re-derived fact subtree), the
    types-sized marginals broadcast, and nothing cartesian."""
    from sdu_hadoop_indexer_spark.operators.analytics import events_type_overlap

    df = events_type_overlap(spark, sf_dir)
    df.collect()  # AQE finalizes stage reuse at runtime
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the marginals
    assert "ReusedExchange" in plan  # shared per-user aggregation exchange


def test_gini_has_no_global_windows(spark, sf_dir):
    """Every WindowExec must be partitioned (by group or by group+band) —
    the global per-group sort the classic formulation needs must NOT
    appear, and the plan must stay non-cartesian."""
    from sdu_hadoop_indexer_spark.operators.analytics import agg_gini

    plan = _plan(agg_gini(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # Spark renders an unpartitioned window spec as "Window [..], [..]" with
    # an empty partition list → "windowspecdefinition(" directly after a
    # bare ORDER BY; cheap proxy: every Window line mentions a partition col
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "st#" in line, line


def test_asof_nearest_fuses_both_directions_one_window(spark, sf_dir):
    """Backward MAX and forward MIN share one partition+order spec, so
    Catalyst must evaluate them in a single WindowExec — one shuffle, no
    join anywhere in the plan."""
    from sdu_hadoop_indexer_spark.operators.joins import join_asof_nearest

    plan = _plan(join_asof_nearest(spark, sf_dir))
    assert plan.count("Window") == 1
    assert "Join" not in plan


def test_keyset_pagination_pushes_cursor_and_takes_ordered(spark, sf_dir):
    """The cursor predicate must reach the parquet scan (PushedFilters on
    o_totalprice) and the page must plan as TakeOrderedAndProject — never
    a global sort + offset discard."""
    from sdu_hadoop_indexer_spark.operators.sorts_setops import (
        sort_keyset_pagination,
    )

    df = sort_keyset_pagination(spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)
    assert "o_totalprice" in _formatted(df).split("PushedFilters", 1)[1].split("\n")[0]


def test_round5_ops_plan_shapes(spark, sf_dir):
    """Scale-shape pins for the round-5 additions: the window-form ops plan
    NO join at all, the pair miners never degenerate to a cartesian, and
    the two-phase sampler uses exactly two ranking windows."""
    from sdu_hadoop_indexer_spark.llm.curation import bigram_ppl
    from sdu_hadoop_indexer_spark.llm.dedup import (
        dedup_containment,
        text_paragraph_dedup,
    )
    from sdu_hadoop_indexer_spark.llm.similarity import sim_matryoshka_eval
    from sdu_hadoop_indexer_spark.operators.aggregates import (
        agg_reservoir_hash_sample,
    )
    from sdu_hadoop_indexer_spark.operators.joins import join_asof_tolerance

    plan = _plan(join_asof_tolerance(spark, sf_dir))
    assert "Join" not in plan  # LOCF window form, not join-then-rank
    assert plan.count("Window [") == 1

    plan = _plan(text_paragraph_dedup(spark, sf_dir))
    assert "Join" not in plan  # chunk → rank window → rollup only
    assert plan.count("Window [") == 1

    plan = _plan(agg_reservoir_hash_sample(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window [") == 2  # two-phase: sharded then global

    # the registered op returns the memoized pin, which since r15 is a
    # checkpoint LEAF (driver re-analysis fix) — the join shape this test
    # pins lives in the BUILD the pin wraps, so assert on the build plan.
    from sdu_hadoop_indexer_spark.llm.dedup import _containment_build

    plan = _plan(_containment_build(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # prefix-term join + array verify

    plan = _plan(bigram_ppl(spark, sf_dir))
    assert "CartesianProduct" not in plan  # the 1-row vocab crossJoin is BNLJ
    assert "BroadcastHashJoin" in plan  # C2/C1 broadcast onto the stream

    plan = _plan(sim_matryoshka_eval(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_ann_pairs_plan_no_cartesian_takes_ordered(spark, sf_dir):
    """`sim_nearest_pairs_ann` (round 6): the candidate stage must be an
    equi-join on (band_idx, bucket) — no CartesianProduct / BroadcastNested
    LoopJoin anywhere (the exact miner's all-pairs shape is precisely what
    this operator exists to avoid) — and the global top-20 must plan as
    TakeOrderedAndProject, not a full sort."""
    from sdu_hadoop_indexer_spark.llm import similarity

    plan = _plan(similarity.sim_nearest_pairs_ann(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # the bucket self-join keys on both band_idx and bucket
    assert "band_idx" in plan and "bucket" in plan


def test_order_priority_plans_semi_join(spark, sf_dir):
    """`sql_order_priority` (round 6): the EXISTS must plan as a LeftSemi
    join (each order counted once however many line items are late — an
    inner join would over-count) and the one-year window must push into
    the orders scan."""
    from sdu_hadoop_indexer_spark.sql_api import sql_order_priority

    df = sql_order_priority(spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan
    explained = _formatted(df)
    assert "o_orderdate" in explained  # window reaches the scan filters


def test_minhash_incremental_no_distinct_no_cartesian(spark, sf_dir):
    """`dedup_minhash_incremental` (round 6): pair dedup must be the
    first-matching-band FILTER, not a distinct — the plan may contain only
    the signature-build aggregates (bands/sig_arr lineage), no
    deduplicating aggregate over the joined pair stream, and no cartesian
    shapes."""
    from sdu_hadoop_indexer_spark.llm import dedup

    plan = _plan(dedup.dedup_minhash_incremental(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join output flows to the project/filter directly: no aggregate
    # keyed on (new_doc, dup_of) anywhere (that's what a distinct would be)
    assert "functions=[], output=[new_doc" not in plan.replace("#", "")
    import re

    assert not re.search(r"HashAggregate\(keys=\[new_doc[^\]]*dup_of", plan)


def test_q14_pushdown_and_broadcast(spark, sf_dir):
    """Q14's month window must reach the lineitem parquet scan as a pushed
    filter and the part dimension must broadcast — the star-join probe
    shape that keeps the query map-side at any corpus size."""
    from sdu_hadoop_indexer_spark.sql_api import sql_promo_revenue

    plan = _formatted(sql_promo_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[-1][:500]


def test_q3_pushdown_and_broadcast(spark, sf_dir):
    """Q3's date predicates must reach the parquet scans as pushed
    filters and the one-segment customer dimension must broadcast — the
    pushdown-star-probe shape that keeps the big side single-shuffle."""
    from sdu_hadoop_indexer_spark.sql_api import sql_shipping_priority

    plan = _formatted(sql_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "l_shipdate" in plan
    assert "TakeOrderedAndProject" in plan  # LIMIT 10 never global-sorts


def test_q18_semi_join_shape(spark, sf_dir):
    """Q18's IN-subquery on an aggregate must plan as a (left-semi or
    broadcast) join against the lineitem self-aggregation, not a
    cartesian or a driver-side collect."""
    from sdu_hadoop_indexer_spark.sql_api import sql_large_volume_customer

    plan = _formatted(sql_large_volume_customer(spark, sf_dir))
    assert "LeftSemi" in plan or "ExistenceJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q13_outer_join_preserves_zero_order_customers(spark, sf_dir):
    """Q13 must keep customers with no orders (count 0 bucket present
    when the fixture has any) and its join must stay LeftOuter."""
    from sdu_hadoop_indexer_spark.sql_api import sql_customer_distribution

    df = sql_customer_distribution(spark, sf_dir)
    plan = _formatted(df)
    assert "LeftOuter" in plan
    rows = {r.c_count: r.custdist for r in df.collect()}
    total_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(rows.values()) == total_cust  # every customer in exactly one bucket


def test_q10_pushdown_and_takeordered(spark, sf_dir):
    """Q10's returnflag and quarter predicates must push into their scans
    and the LIMIT must plan as TakeOrdered, not a global sort."""
    from sdu_hadoop_indexer_spark.sql_api import sql_returned_items

    plan = _formatted(sql_returned_items(spark, sf_dir))
    assert "l_returnflag" in plan and "o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_volume_shipping_broadcasts_all_dimensions(spark, sf_dir):
    """TPC-H Q7's docstring claim: every dimension side (supplier,
    customer, nation x2) broadcasts, so the only shuffle join is
    lineitem<->orders — the plan must carry at most one non-broadcast
    join and at least four broadcast joins."""
    from sdu_hadoop_indexer_spark import sql_api

    plan = _plan(sql_api.sql_volume_shipping(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "CartesianProduct" not in plan


def test_forecast_revenue_pushes_every_predicate(spark, sf_dir):
    """TPC-H Q6: date/discount/quantity predicates must reach the lineitem
    scan as PushedFilters, and the whole query reduces map-side (partial
    aggregation present, no join at all)."""
    from sdu_hadoop_indexer_spark import sql_api

    df = sql_api.sql_forecast_revenue(spark, sf_dir)
    fmt = _formatted(df)
    assert "PushedFilters:" in fmt
    assert "l_shipdate" in fmt.split("PushedFilters:")[1][:400]
    plan = _plan(df)
    assert "Join" not in plan
    assert "partial" in plan.lower()


def test_semantic_ivf_assignment_is_map_side(spark, sf_dir):
    """SemDeDup's assignment must stay map-side (broadcast centroid
    literal folded into a project, no exchange between the embeddings
    scan and the cell column): the plan's only shuffles belong to the
    per-cell pair join and the verdict aggregation."""
    from sdu_hadoop_indexer_spark.llm import dedup as d

    plan = _plan(d.dedup_semantic_ivf(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_dsir_weight_join_broadcasts_bucket_map(spark, sf_dir, monkeypatch):
    """DSIR's lambda relation is 1024 rows — it must come back to the
    per-occurrence stream as a broadcast, never a shuffle join keyed on
    the bucket id. The op stages its per-doc weight relation (it feeds the
    rank pivots, the bucket counts, AND the final select), which truncates
    the visible plan — so the test neutralizes staging to pin the FULL
    lineage, including (r14 verdict #1) that the top-quartile rank's only
    Window is partitioned by the range bucket, never global."""
    from sdu_hadoop_indexer_spark import iteration
    from sdu_hadoop_indexer_spark.llm import curation

    monkeypatch.setattr(iteration, "stage_round", lambda df, *a, **k: df)
    plan = _plan(curation.llm_dsir_weights(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    from tools.plan_audit import unpartitioned_windows

    assert not unpartitioned_windows(plan)


def test_vocab_relation_broadcast_gates_fall_back_to_shuffle(spark, sf_dir):
    """VERDICT r9 item 1 (+ the same class in text/): every vocab-sized /
    corpus-growing relation that carries an explicit broadcast hint —
    unigram tf, bigram C2+C1, the BPE-encoded vocab, tf-idf df, the PMI
    marginals, the RAKE word scores — must drop the hint when the shared
    docs-bytes gate says the relation exceeds the session broadcast
    threshold, degrading to a co-partitioned shuffle join (SortMergeJoin /
    ShuffledHashJoin) with IDENTICAL rows. Only constant-size relations
    (single-row aggregate scalars, top-k slices, fixed sketch grids) may
    keep forced hints past the gate."""
    from sdu_hadoop_indexer_spark.llm import curation, tokenizer
    from sdu_hadoop_indexer_spark.llm.dedup import _arrs_fits_broadcast
    from sdu_hadoop_indexer_spark.text import mining, search

    ops = [
        curation.unigram_logprob,
        curation.bigram_ppl,
        tokenizer.llm_tokenizer_fertility,
        search.tf_idf,
        search.cooccur_pmi,
        mining.keyphrase_rake,
    ]
    key = "spark.sql.autoBroadcastJoinThreshold"
    assert _arrs_fits_broadcast(spark, sf_dir)
    hinted_counts = {}
    for op in ops:
        df = op(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # below the gate the hint is taken: the vocab join broadcasts
        assert "BroadcastHashJoin" in plan, op.__name__
        hinted_counts[op.__name__] = df.count()
    old = spark.conf.get(key)
    spark.conf.set(key, "1")
    try:
        assert not _arrs_fits_broadcast(spark, sf_dir)
        for op in ops:
            df = op(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # hint dropped: the equi-join shuffles on its key; the only
            # surviving broadcasts are the 1-row scalar cross-joins
            assert "BroadcastHashJoin" not in plan, op.__name__
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
                op.__name__
            )
            assert df.count() == hinted_counts[op.__name__], op.__name__
    finally:
        spark.conf.set(key, old)


def test_ivf_partitioned_ann_prunes_partitions(spark, sf_dir):
    """The stored ANN index read must prune at the directory level: the
    probe-cell predicate appears as PartitionFilters on the parquet scan
    (cell is the Hive partition column), so only N_PROBE'd cells are read."""
    from sdu_hadoop_indexer_spark.llm.similarity import sink_ivf_partitioned_ann

    explained = _formatted(sink_ivf_partitioned_ann(spark, sf_dir))
    pf_lines = [
        line
        for line in explained.splitlines()
        if "PartitionFilters" in line and "cell" in line
    ]
    assert pf_lines, explained


def test_range_search_is_shuffle_free(spark, sf_dir):
    """Radius search must be ONE broadcast-driven scan: no hash-partitioned
    exchange anywhere (top-k needs the per-query window shuffle; the tau
    filter must not)."""
    from sdu_hadoop_indexer_spark.llm.similarity import sim_range_search

    assert "hashpartitioning" not in _plan(sim_range_search(spark, sf_dir))


def test_ivf_range_lookup_prunes_partitions_and_skips_shuffle(spark, sf_dir):
    """The stored radius lookup must (a) prune the store read at the
    directory level — the probe-cell predicate appears as PartitionFilters
    on the parquet scan — and (b) add NO exchange after the pruned read:
    the tau filter is vectorized, unlike top-k's per-query window."""
    from sdu_hadoop_indexer_spark.llm.similarity import sink_ivf_range_lookup

    explained = _formatted(sink_ivf_range_lookup(spark, sf_dir))
    pf_lines = [
        line
        for line in explained.splitlines()
        if "PartitionFilters" in line and "cell" in line
    ]
    assert pf_lines, explained
    # (b): the stored-candidate side joins the broadcast probe frame —
    # never a shuffle join — and the tau tail adds no window, so the only
    # exchange keyed on query_id is the N_QUERIES-row probe ranking itself.
    assert "BroadcastHashJoin" in explained, explained
    assert "SortMergeJoin" not in explained, explained


def test_no_corpus_scale_unpartitioned_window_anywhere(spark, sf_dir):
    """Registry-wide contract (r14 verdict item 2): EVERY registered
    query's physical plan is swept for Window nodes that have an ORDER
    spec but NO partition spec — Spark's "No Partition Defined" WindowExec,
    which funnels its whole input through one task. Any hit must be on the
    explicit bounded-input allowlist in tools/plan_audit.py (deciles, per-
    day/source series, limit(N) pages, query-k legs — each entry states
    its bound). llm_dsir_weights' corpus-sized selection rank was the one
    real offender; it is fixed (bucket-parallel two-phase rank), NOT
    allowlisted, and must stay clean.

    The sweep also fails on allowlist rot: a name whose plan no longer has
    an unpartitioned window must be removed from the list, so the list
    can only ever shrink to match reality.
    """
    from tools.plan_audit import (
        ALLOW_UNPART_WINDOW,
        SKIP,
        unpartitioned_windows,
    )
    from sdu_hadoop_indexer_spark.registry import all_queries

    queries = all_queries()
    old = spark.conf.get("spark.sql.adaptive.enabled")
    violations, confirmed_allowed = [], set()
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for name in sorted(queries):
            if name in SKIP:
                continue
            df = queries[name](spark, sf_dir)
            hits = unpartitioned_windows(
                df._jdf.queryExecution().executedPlan().toString()
            )
            if not hits:
                continue
            if name in ALLOW_UNPART_WINDOW:
                confirmed_allowed.add(name)
            else:
                violations.append((name, hits))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert not violations, "corpus-scale unpartitioned WindowExec:\n" + "\n".join(
        f"  {n}: {h}" for n, hs in violations for h in hs
    )
    rotted = set(ALLOW_UNPART_WINDOW) - confirmed_allowed
    assert not rotted, f"allowlist entries no longer needed: {sorted(rotted)}"


def test_bootstrap_expansion_is_map_side_before_shuffle(spark, sf_dir):
    """agg_bootstrap_ci's scale claim: the 40× replicate expansion
    (Generate) is consumed by a PARTIAL (group, b) HashAggregate on the
    map side, so the only corpus-coupled Exchange carries groups×B rows.
    In executedPlan().toString() parents print before children, so the
    Exchange on (l_returnflag, b) must appear BEFORE the partial agg,
    which must appear BEFORE the Generate feeding it."""
    from sdu_hadoop_indexer_spark.operators.analytics import agg_bootstrap_ci

    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = _plan(agg_bootstrap_ci(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    i_exch = plan.index("Exchange hashpartitioning(l_returnflag")
    i_partial = plan.index("partial_sum", i_exch)
    assert "Generate explode" in plan
    assert i_exch < i_partial < plan.index("Generate explode")
    # and the b-table is literal: no join introduces the replicate axis
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_theil_sen_pair_join_is_keyed_not_cartesian(spark, sf_dir):
    """ts_theil_sen's pair enumeration must be an equi-join on
    event_type (with the day-range predicate as a post-join filter or
    join condition) — never a cartesian/BNLJ over the daily relation."""
    from sdu_hadoop_indexer_spark.operators.analytics import ts_theil_sen

    plan = _plan(ts_theil_sen(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )
