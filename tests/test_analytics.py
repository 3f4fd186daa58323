"""Behavioral checks for the §2.B-12 analytics family and sketch merges
(the oracle gate proves value parity; these pin the semantic invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdu_hadoop_indexer_spark.operators import aggregates, analytics


def test_funnel_stage_counts_monotone(spark, sf_dir):
    row = analytics.events_funnel(spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_view >= row.n_click_after_view >= row.n_purchase_after_click
    assert row.n_purchase_after_click > 0  # fixture has full conversions


def test_sessionize_sessions_respect_gap(spark, sf_dir):
    """Within a user, consecutive sessions are separated by > the gap, and
    every session's duration is consistent (end >= start)."""
    sess = analytics.win_sessionize(spark, sf_dir)
    bad_dur = sess.where(F.col("sess_end_s") < F.col("sess_start_s")).count()
    assert bad_dur == 0
    gap_s = analytics.SESSION_GAP_US // 1_000_000
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_id")
    adjacent = sess.select(
        "user_id",
        "session_id",
        "sess_start_s",
        F.lag("sess_end_s").over(w).alias("prev_end_s"),
    ).where(F.col("prev_end_s").isNotNull())
    # next session starts more than the gap after the previous end; the
    # outputs are second-truncated while the gap rule runs on microseconds,
    # so a just-over-gap boundary can floor to exactly gap_s — allow equality
    violations = adjacent.where(
        F.col("sess_start_s") - F.col("prev_end_s") < gap_s
    ).count()
    assert violations == 0


def test_retention_week_zero_covers_all_users(spark, sf_dir):
    """Every user is active in their own cohort week, so the week_no=0 rows
    must sum to the total distinct-user count."""
    from sdu_hadoop_indexer_spark.catalog import table

    ret = analytics.events_retention_cohort(spark, sf_dir)
    week0 = (
        ret.where(F.col("week_no") == 0).agg(F.sum("n_users").alias("s")).collect()[0].s
    )
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == n_users


def test_hll_sketch_merge_estimate_close(spark, sf_dir):
    """Two-level sketch merge (partial per (flag, status) → union per flag)
    must land within HLL error bounds of the exact distinct count."""
    rows = aggregates.agg_hll_sketch_merge(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rel_err < 0.05, (r.l_returnflag, r.est_distinct, r.exact_distinct)


def test_ohlc_low_high_bracket_open_close(spark, sf_dir):
    bad = (
        analytics.ts_ohlc(spark, sf_dir)
        .where(
            (F.col("low") > F.col("open"))
            | (F.col("low") > F.col("close"))
            | (F.col("high") < F.col("open"))
            | (F.col("high") < F.col("close"))
        )
        .count()
    )
    assert bad == 0


def test_conversion_wilson_interval_properties(spark, sf_dir):
    """Wilson bounds must bracket the point rate, stay inside [0, 1],
    narrow with sample size (checked against a scipy-free reference
    implementation), and the purchase row must convert at 100%."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        agg_conversion_wilson,
    )

    rows = {r.event_type: r for r in agg_conversion_wilson(spark, sf_dir).collect()}
    assert rows
    import math

    for t, r in rows.items():
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0, t
        # reference Wilson (z = 1.96)
        n, k = r.n_users, r.n_conv
        ph = k / n
        z2 = 3.8416
        center = ph + z2 / (2 * n)
        rad = 1.96 * math.sqrt((ph * (1 - ph) + z2 / (4 * n)) / n)
        den = 1 + z2 / n
        assert abs(r.wilson_lo - round((center - rad) / den, 4)) < 5e-4
        assert abs(r.wilson_hi - round((center + rad) / den, 4)) < 5e-4
    pr = rows["purchase"]
    assert pr.n_conv == pr.n_users and pr.rate == 1.0


def test_bot_flags_median_is_order_statistic(spark, sf_dir):
    """med_gap_us must equal the python lower-median of the user's exact
    integer gaps; events_per_min must be consistent with (n, span); flags
    follow the threshold exactly."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        BOT_GAP_US,
        BOT_MIN_EVENTS,
        events_bot_flags,
    )

    from sdu_hadoop_indexer_spark.catalog import table

    rows = {r.user_id: r for r in events_bot_flags(spark, sf_dir).collect()}
    assert rows
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("tsu"), "event_id")
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.tsu, r.event_id))
    for uid, r in list(rows.items())[:200]:
        ts = sorted(by_user[uid])
        assert r.n_events == len(ts) >= BOT_MIN_EVENTS
        gaps = sorted(
            ts[i + 1][0] - ts[i][0] for i in range(len(ts) - 1)
        )
        assert r.med_gap_us == gaps[(len(gaps) + 1) // 2 - 1]
        assert r.is_bot == (r.med_gap_us < BOT_GAP_US)
        span = ts[-1][0] - ts[0][0]
        assert abs(r.events_per_min - round(len(ts) * 60_000_000 / span, 4)) < 5e-4
    # users below the evidence floor are absent
    small = [u for u, es in by_user.items() if len(es) < BOT_MIN_EVENTS]
    assert all(u not in rows for u in small)


def test_user_entropy_reference_and_bounds(spark, sf_dir):
    """entropy in [0, ln(n_types)]; equals the direct python computation;
    single-type users have exactly 0."""
    import math

    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.analytics import events_user_entropy

    rows = {r.user_id: r for r in events_user_entropy(spark, sf_dir).collect()}
    assert rows
    counts = {}
    for r in (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    ):
        counts.setdefault(r.user_id, []).append(r["count"])
    for uid, r in list(rows.items())[:300]:
        ks = counts[uid]
        n = sum(ks)
        ref = sum(-(k / n) * math.log(k / n) for k in ks)
        assert abs(r.entropy_nats - round(ref, 4)) < 5e-4
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_types) + 1e-9
        if r.n_types == 1:
            assert r.entropy_nats == 0.0


def test_pareto_cut_is_minimal_cover(spark, sf_dir):
    """n_top must be the MINIMAL desc-sorted prefix reaching 80% of group
    revenue (one fewer order falls short), and rev_share the prefix's
    exact share."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.analytics import agg_pareto_cut

    got = {
        r.o_orderpriority: r for r in agg_pareto_cut(spark, sf_dir).collect()
    }
    assert got
    orders = (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x"),
        )
        .collect()
    )
    groups = {}
    for r in orders:
        groups.setdefault(r.o_orderpriority, []).append((r.x, r.o_orderkey))
    for pr, rows in groups.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        total = sum(x for x, _ in rows)
        cum = k = 0
        for x, _ in rows:
            cum += x
            k += 1
            if 5 * cum >= 4 * total:
                break
        r = got[pr]
        assert r.n_orders == len(rows)
        assert r.n_top == k, pr
        assert abs(r.rev_share - round(cum / total, 4)) < 5e-4
        # minimality: one fewer falls short
        if k > 1:
            assert 5 * (cum - rows[k - 1][0]) < 4 * total


def test_windowed_funnel_is_a_subset_of_unbounded(spark, sf_dir):
    """Every stage count of the time-boxed funnel must be <= the unbounded
    funnel's (bounding delays can only lose journeys), n_view must be
    EQUAL (stage 1 has no bound), and the monotone funnel property holds."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        events_funnel,
        events_funnel_windowed,
    )

    wf = events_funnel_windowed(spark, sf_dir).first()
    uf = events_funnel(spark, sf_dir).first()
    assert wf.n_users == uf.n_users
    assert wf.n_view == uf.n_view
    assert wf.n_click_1h <= uf.n_click_after_view
    assert wf.n_purchase_24h <= uf.n_purchase_after_click
    assert wf.n_view >= wf.n_click_1h >= wf.n_purchase_24h >= 0


def test_cohort_ltv_triangle_consistency(spark, sf_dir):
    """cum_rev_c must be the running sum of wk_rev_c within each cohort,
    total revenue must equal the purchase-event cent sum, and LTV must be
    monotone nondecreasing per cohort."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.analytics import events_cohort_ltv

    rows = events_cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    grand = 0
    for ch, rs in by_cohort.items():
        rs.sort(key=lambda r: r.week_no)
        cum = 0
        prev_ltv = -1.0
        for r in rs:
            cum += r.wk_rev_c
            assert r.cum_rev_c == cum, (ch, r.week_no)
            assert r.ltv >= prev_ltv
            prev_ltv = r.ltv
        grand += cum
    total_cents = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"))
        .first()
        .c
    )
    assert grand == total_cents


def test_key_skew_profiler_invariants(spark, sf_dir):
    """Top-N ranks descend by weight, shares/skews are consistent with a
    recount, and the salt fan-out is the exact integer ceiling."""
    rows = analytics.diag_key_skew(spark, sf_dir).collect()
    assert len(rows) == analytics.SKEW_TOP_N
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    total, n_keys = sum(counts.values()), len(counts)
    top_true = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    for i, r in enumerate(rows):
        assert r.rank == i + 1
        assert (r.user_id, r.n_rows) == top_true[i]
        assert r.total == total and r.n_keys == n_keys
        assert r.salt_parts == -((-r.n_rows * n_keys) // total) >= 1
    assert [r.n_rows for r in rows] == sorted(
        (r.n_rows for r in rows), reverse=True
    )


def test_attribution_position_credit_conserves(spark, sf_dir):
    """U-shaped credit totals must equal the number of attributed
    conversions to within the middle-share truncation (≤1e-6 per middle
    touch), and channel counts must be internally consistent."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        events_attribution_position,
    )

    rows = events_attribution_position(spark, sf_dir).collect()
    assert rows
    total_credit = sum(r.credit for r in rows)
    n_touches = sum(r.n_touches for r in rows)
    # conversions with ≥1 touch each contribute exactly 1.0 minus middle
    # truncation; bound the loss by touches × 1e-6
    n_conv_lower = max(r.n_conversions for r in rows)
    assert total_credit <= n_touches  # sanity: credit never exceeds touches
    assert total_credit >= n_conv_lower - n_touches * 1e-6 - 0.01


def test_ks_test_zero_on_identical_one_on_disjoint(spark, tmp_path):
    """KS D must be exactly 0 for identical sample multisets and exactly
    1 (d_num = n·m) for completely separated ranges — the two closed-form
    endpoints of the statistic, checked on crafted events fixtures."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.operators.analytics import (
        KS_TYPE_A,
        KS_TYPE_B,
        agg_ks_test,
    )

    def write(dirname, vals_a, vals_b):
        n = len(vals_a) + len(vals_b)
        t0 = dt.datetime(2024, 1, 1)
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [t0 + dt.timedelta(seconds=i) for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
                "event_type": pa.array(
                    [KS_TYPE_A] * len(vals_a) + [KS_TYPE_B] * len(vals_b),
                    pa.string(),
                ),
                "value": pa.array(vals_a + vals_b, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        )
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"))
        return str(d)

    base = [float(x) for x in (1, 2, 2, 3, 5, 8, 13)]
    same = write("same", base, list(base))
    r = agg_ks_test(spark, same).collect()[0]
    assert (r.n, r.m) == (7, 7)
    assert r.d_num == 0 and r.d_stat == 0.0

    apart = write("apart", base, [x + 100.0 for x in base])
    r = agg_ks_test(spark, apart).collect()[0]
    assert r.d_num == r.n * r.m and r.d_stat == 1.0


def _write_events(tmp_path, dirname, rows):
    """rows = list of (user_id, event_type, value); ts increments 1 s."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [t0 + dt.timedelta(seconds=i) for i in range(len(rows))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / dirname
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_vshape_pattern_counts_local_minima(spark, tmp_path):
    """Crafted per-user sequences with known strict-local-minimum counts:
    user 0 traces 5→1→4→2→6 (two Vs), user 1 is monotone (none), user 2
    has a flat middle 3→3→5 (strictness excludes it)."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        win_pattern_vshape,
    )

    rows = (
        [(0, "view", v) for v in (5.0, 1.0, 4.0, 2.0, 6.0)]
        + [(1, "view", v) for v in (1.0, 2.0, 3.0, 4.0)]
        + [(2, "view", v) for v in (3.0, 3.0, 5.0)]
    )
    d = _write_events(tmp_path, "vshape", rows)
    got = {r.user_id: r for r in win_pattern_vshape(spark, d).collect()}
    assert set(got) == {0}
    assert got[0].n_vshapes == 2
    assert got[0].deepest_dip == 1.0


def test_hhi_closed_form_endpoints(spark, tmp_path):
    """HHI = 1.0 when one user owns all events of a type; 1/n for a
    perfectly uniform base of n users."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        events_concentration_hhi,
    )

    rows = [(7, "whale", float(i)) for i in range(10)] + [
        (u, "uniform", float(u)) for u in range(4)
    ]
    d = _write_events(tmp_path, "hhi", rows)
    got = {r.event_type: r for r in events_concentration_hhi(spark, d).collect()}
    assert got["whale"].hhi == 1.0 and got["whale"].n_users == 1
    assert got["uniform"].hhi == 0.25 and got["uniform"].n_users == 4


def test_mann_whitney_closed_form_endpoints(spark, tmp_path):
    """AUC endpoints: 0.5 for identical multisets (all ties → midranks),
    1.0 when every A value exceeds every B value, 0.0 reversed."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        KS_TYPE_A,
        KS_TYPE_B,
        agg_mann_whitney,
    )

    base = [1.0, 2.0, 3.0, 5.0]

    def run(dirname, va, vb):
        d = _write_events(
            tmp_path,
            dirname,
            [(0, KS_TYPE_A, v) for v in va] + [(1, KS_TYPE_B, v) for v in vb],
        )
        return agg_mann_whitney(spark, d).collect()[0]

    r = run("ties", base, list(base))
    assert r.u_a_x2 == r.n * r.m  # 2U = nm at AUC 0.5
    assert r.auc == 0.5
    r = run("above", [v + 100 for v in base], base)
    assert r.auc == 1.0 and r.u_a_x2 == 2 * r.n * r.m
    r = run("below", base, [v + 100 for v in base])
    assert r.auc == 0.0 and r.u_a_x2 == 0


def test_chi_square_zero_on_independent_table(spark, tmp_path):
    """A perfectly independent contingency table (every cell = r·c/N
    exactly) must score χ² = 0; a fully dependent one (diagonal) must
    score χ² = N·(k−1) in closed form."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.operators.analytics import agg_chi_square

    def write(dirname, pairs):
        texts = [f"doc {i}" for i in range(len(pairs))]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(pairs)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array([p[1] for p in pairs], pa.string()),
                "source": pa.array([p[0] for p in pairs], pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    # independent: every (source, lang) combo appears exactly twice
    indep = write(
        "indep",
        [(s, l) for s in ("a", "b") for l in ("x", "y", "z")] * 2,
    )
    row = agg_chi_square(spark, indep).collect()[0]
    assert row.chi2_micro == 0 and row.chi2 == 0.0
    assert row.n_cells == 6 and row.dof == 2

    # fully dependent: source determines lang, k=3 symmetric diagonal
    dep = write("dep", [("a", "x"), ("b", "y"), ("c", "z")] * 4)
    row = agg_chi_square(spark, dep).collect()[0]
    assert row.dof == 4 and row.n_cells == 9
    # closed form N·(k−1) up to per-cell micro quantization (≤ 0.5e-6 each)
    assert abs(row.chi2 - 12 * (3 - 1)) <= row.n_cells * 0.5e-6


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """Plant a clean level shift (5/day for 10 days, then 50/day for 10)
    — the CUSUM peak must land exactly on the last low day, with the
    closed-form peak value n_days·prefix − i·total at that point."""
    import datetime as dt

    from sdu_hadoop_indexer_spark.operators.analytics import (
        ts_cusum_changepoint,
    )

    rows = []
    for day in range(20):
        per_day = 5 if day < 10 else 50
        for k in range(per_day):
            rows.append((k % 7, "view", float(k)))
    # _write_events spaces events 1 s apart; respace to days here instead
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    ts, idx = [], 0
    for day in range(20):
        per_day = 5 if day < 10 else 50
        for k in range(per_day):
            ts.append(t0 + dt.timedelta(days=day, seconds=k))
            idx += 1
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "cusum"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    r = ts_cusum_changepoint(spark, str(d)).collect()[0]
    assert r.n_days == 20 and r.total == 550
    assert r.cp_day == dt.datetime(2024, 1, 10)  # last low day (day idx 9)
    # closed form at i=10: |20·50 − 10·550| = 4500
    assert r.cusum_peak == 4500


def test_max_drawdown_planted_slump(spark, tmp_path):
    """Plant daily revenues [1.00, 3.00, 0.50, 2.00] dollars: runmax is
    [100, 300, 300, 300] cents so drawdowns are [0, 0, 250, 100] — peak
    250 cents on day 3."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.operators.analytics import ts_max_drawdown

    days = [1.00, 3.00, 0.50, 2.00]
    t0 = dt.datetime(1995, 1, 1)
    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(len(days)), pa.int64()),
            "o_custkey": pa.array([1] * len(days), pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(days), pa.string()),
            "o_totalprice": pa.array(days, pa.float64()),
            "o_orderdate": pa.array(
                [t0 + dt.timedelta(days=i) for i in range(len(days))],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(days), pa.string()),
        }
    )
    d = tmp_path / "dd"
    d.mkdir()
    pq.write_table(tbl, str(d / "orders.parquet"))
    r = ts_max_drawdown(spark, str(d)).collect()[0]
    assert r.n_days == 4
    assert r.max_drawdown_cents == 250
    assert r.trough_day == t0 + dt.timedelta(days=2)


def test_survival_km_planted_lifetimes(spark, tmp_path):
    """Four users: two churn at lifetime 2 days, two censored (active at
    corpus end) with lifetimes 5 and 10. KM: at t=2 risk set is all 4,
    2 churn → S = 0.5; no further events, so S stays 0.5 at t=5, t=10."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.operators.analytics import (
        events_survival_km,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, day):
        return (uid, t0 + dt.timedelta(days=day))

    # (user, event day): u1 0→2 churned, u2 0→10 censored (corpus max),
    # u3 1→3 churned, u4 5→10 censored
    pts = [ev(1, 0), ev(1, 2), ev(2, 0), ev(2, 10), ev(3, 1), ev(3, 3), ev(4, 5), ev(4, 10)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(pts)), pa.int64()),
            "ts": pa.array([p[1] for p in pts], pa.timestamp("us")),
            "user_id": pa.array([p[0] for p in pts], pa.int64()),
            "event_type": pa.array(["view"] * len(pts), pa.string()),
            "value": pa.array([1.0] * len(pts), pa.float64()),
            "props": pa.array(["{}"] * len(pts), pa.string()),
        }
    )
    d = tmp_path / "km"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    rows = {r.t_day: r for r in events_survival_km(spark, str(d)).collect()}
    assert set(rows) == {2, 5, 10}
    assert rows[2].n_risk == 4 and rows[2].n_churn == 2
    assert rows[2].survival == 0.5
    assert rows[5].n_risk == 2 and rows[5].n_churn == 0
    assert rows[5].survival == 0.5
    assert rows[10].n_risk == 1 and rows[10].n_churn == 0
    assert rows[10].survival == 0.5


def test_diff_in_diff_matches_cellwise_means(spark, sf_dir):
    """DiD must equal the four cell means computed driver-side, and the
    estimator must be exactly (t_post - t_pre) - (c_post - c_pre)."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators import analytics

    row = analytics.events_diff_in_diff(spark, sf_dir).collect()[0]
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
        .collect()
    )
    import datetime

    split = datetime.datetime(2024, 1, 15)
    cells = {}
    for r in ev:
        key = (r.user_id % 2 == 1, r.ts >= split)
        cells.setdefault(key, []).append(round(r.value * 100))
    m = {k: sum(v) / len(v) / 100.0 for k, v in cells.items()}
    assert abs(row.mean_treated_pre - m[(True, False)]) < 1e-3
    assert abs(row.mean_control_post - m[(False, True)]) < 1e-3
    expect = (m[(True, True)] - m[(True, False)]) - (
        m[(False, True)] - m[(False, False)]
    )
    assert abs(row.did - expect) < 2e-3
    assert row.n_events == len(ev)


def test_cuped_matches_numpy_regression(spark, sf_dir):
    """theta must equal the OLS slope of post on pre spend over both-period
    users, and rho2 the squared correlation — computed independently in
    numpy from the same per-user sums."""
    import datetime

    import numpy as np

    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators import analytics

    row = analytics.events_cuped_adjustment(spark, sf_dir).collect()[0]
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
        .collect()
    )
    split = datetime.datetime(2024, 1, 15)
    pre: dict[int, int] = {}
    post: dict[int, int] = {}
    for r in ev:
        d = pre if r.ts < split else post
        d[r.user_id] = d.get(r.user_id, 0) + round(r.value * 100)
    users = sorted(set(pre) & set(post))
    x = np.array([pre[u] for u in users], dtype=np.float64)
    y = np.array([post[u] for u in users], dtype=np.float64)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    assert row.n_users == len(users)
    assert abs(row.theta - theta) < 1e-3
    assert abs(row.rho2 - rho2) < 1e-3
    assert 0.0 <= row.rho2 <= 1.0


def test_holt_smoothing_matches_python_recursion(spark, sf_dir):
    """Level/trend/forecast must equal the textbook Holt recursion with
    alpha = beta = 0.5 computed driver-side over the same daily counts."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators import analytics

    rows = sorted(
        analytics.ts_holt_smoothing(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    days = sorted(
        (r.day, r.y)
        for r in table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("y"))
        .collect()
    )
    ys = [y for _, y in days]
    lvl, tr = float(ys[0]), float(ys[1] - ys[0])
    states = [(lvl, tr)]
    for y in ys[1:]:
        nl = 0.5 * y + 0.5 * (lvl + tr)
        tr = 0.5 * (nl - lvl) + 0.5 * tr
        lvl = nl
        states.append((lvl, tr))
    assert len(rows) == len(ys)
    assert rows[0].forecast is None
    # compare UNROUNDED within half a 4dp rounding unit: the dyadic-exact
    # states legitimately land exactly on .00005 boundaries, where the
    # engines' half-away round and Python's banker's round diverge
    for i, r in enumerate(rows):
        assert abs(r.level - states[i][0]) <= 5.0001e-5
        assert abs(r.trend - states[i][1]) <= 5.0001e-5
        if i:
            fc = states[i - 1][0] + states[i - 1][1]
            assert abs(r.forecast - fc) <= 5.0001e-5


def test_mad_anomaly_matches_python_medians(spark, sf_dir):
    """Position-picked medians and robust z must equal a driver-side
    recompute over the same hourly series; flags obey the 3.5 rule."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators import analytics

    rows = analytics.events_anomaly_mad(spark, sf_dir).collect()
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in hourly:
        by_type.setdefault(r.event_type, []).append((r.n, r.h))

    def pick(vals):
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1][0]

    for t, series in by_type.items():
        med = pick(series)
        mad = pick([(abs(n - med), h) for n, h in series])
        mine = [r for r in rows if r.event_type == t]
        assert len(mine) == len(series)
        for r in mine:
            assert r.med == med and r.mad == mad
            if mad > 0:
                rz = 0.6745 * (r.n - med) / mad
                assert abs(r.robust_z - rz) <= 5.1e-5
                assert r.is_anomaly == (abs(rz) > 3.5)
            else:
                assert r.robust_z is None and r.is_anomaly is False


def _write_daily(tmp_path, name, days):
    """events.parquet with controlled daily composition.

    days: list of (day_idx, n_events, per_event_value) — one entry per
    calendar day starting 2024-01-01 (a Monday, so dow == day_idx % 7)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    eid, ts, uid, typ, val = [], [], [], [], []
    i = 0
    for day, n, v in days:
        for k in range(n):
            eid.append(i)
            ts.append(t0 + dt.timedelta(days=day, seconds=k))
            uid.append(k % 5)
            typ.append("view")
            val.append(float(v))
            i += 1
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(typ, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(["{}"] * len(eid), pa.string()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_theil_sen_planted_linear_trend(spark, tmp_path):
    """n_d = 10 + 3d for 15 days: every pairwise slope is exactly 3, so
    the median slope is 3.0, Mann–Kendall S saturates at n_pairs, and
    n_pairs = C(15,2)."""
    from sdu_hadoop_indexer_spark.operators.analytics import ts_theil_sen

    d = _write_daily(
        tmp_path, "tsen", [(i, 10 + 3 * i, 1.0) for i in range(15)]
    )
    r = ts_theil_sen(spark, d).collect()[0]
    assert r.n_days == 15
    assert r.n_pairs == 15 * 14 // 2
    assert r.mk_s == r.n_pairs  # strictly increasing everywhere
    assert r.theil_slope == 3.0


def test_theil_sen_outlier_resistant(spark, tmp_path):
    """One 100× spike day in an otherwise flat series must leave the
    median slope at 0 (the estimator's whole point; OLS would tilt)."""
    from sdu_hadoop_indexer_spark.operators.analytics import ts_theil_sen

    days = [(i, 20, 1.0) for i in range(21)]
    days[10] = (10, 2000, 1.0)  # spike
    d = _write_daily(tmp_path, "tsen_out", days)
    r = ts_theil_sen(spark, d).collect()[0]
    assert r.theil_slope == 0.0
    # spike contributes +10 rises then -10 falls: S nets to zero too
    assert r.mk_s == 0


def test_spearman_perfect_antimonotone(spark, tmp_path):
    """Daily value totals ranked exactly opposite to daily counts →
    ρ = −1.0 (and the monotone twin → +1.0)."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        agg_spearman_rank,
    )

    # counts [5,8,2,10,4] rank [3,4,1,5,2]; per-event values chosen so
    # daily SUMS are [30,20,50,10,40] dollars — v ranks [3,2,5,1,4],
    # the exact reverse (6 − rank) of the count ranks
    n = [5, 8, 2, 10, 4]
    per = [6.0, 2.5, 25.0, 1.0, 10.0]
    d = _write_daily(
        tmp_path, "sp_anti", [(i, n[i], per[i]) for i in range(5)]
    )
    r = agg_spearman_rank(spark, d).collect()[0]
    assert r.n_days == 5
    assert r.spearman_rho == -1.0

    d2 = _write_daily(
        tmp_path, "sp_mono", [(i, n[i], 1.0) for i in range(5)]
    )
    r2 = agg_spearman_rank(spark, d2).collect()[0]
    assert r2.spearman_rho == 1.0


def test_spearman_constant_series_is_null(spark, tmp_path):
    """Zero rank variance (all days identical) → NULL, not NaN/±inf."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        agg_spearman_rank,
    )

    d = _write_daily(tmp_path, "sp_const", [(i, 7, 1.0) for i in range(6)])
    r = agg_spearman_rank(spark, d).collect()[0]
    assert r.spearman_rho is None


def test_seasonal_decompose_planted_weekly_bump(spark, tmp_path):
    """Flat 100/day with a +7 Monday bump over 4 full weeks: trend MA is
    constant, so seasonal recovers exactly +6.0 on Monday and −1.0 on
    the other six days (indices sum to zero per week)."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        ts_seasonal_decompose,
    )

    days = [(i, 100 + (7 if i % 7 == 0 else 0), 1.0) for i in range(28)]
    d = _write_daily(tmp_path, "seas", days)
    rows = {r.dow: r for r in ts_seasonal_decompose(spark, d).collect()}
    assert set(rows) == set(range(7))
    # 2024-01-01 is a Monday → dow 0 carries the bump
    assert rows[0].seasonal == 6.0
    for k in range(1, 7):
        assert rows[k].seasonal == -1.0
    # valid centers are days 3..24 → at least 3 full weeks per dow
    assert all(r.n_weeks >= 3 for r in rows.values())
    assert rows[0].mean_n == 107.0 and rows[1].mean_n == 100.0


def test_bootstrap_ci_brackets_and_orders(spark, sf_dir):
    """CI endpoints bracket the full-sample mean on the fixture, are
    ordered, and the replicate count is the declared B."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        BOOT_B,
        agg_bootstrap_ci,
    )

    rows = agg_bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_reps == BOOT_B
        assert r.boot_lo <= r.boot_hi
        # B=40 hash-Poisson replicate means around a ~2000-row group mean:
        # the 2.6–97.4% interval bracketing the point estimate is the
        # expected behavior this op exists to report
        assert r.boot_lo <= r.mean_qty <= r.boot_hi


def test_bootstrap_ci_constant_column_degenerate(spark, tmp_path):
    """All-constant quantity → every replicate mean is that constant, so
    the interval collapses to [c, c] exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.operators.analytics import agg_bootstrap_ci

    n = 500
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(n), pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array([7.0] * n, pa.float64()),
            "l_extendedprice": pa.array([1.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["A"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
        }
    )
    d = tmp_path / "boot_const"
    d.mkdir()
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    r = agg_bootstrap_ci(spark, str(d)).collect()[0]
    assert r.mean_qty == 7.0
    assert r.boot_lo == 7.0 and r.boot_hi == 7.0


def test_path_trigrams_mass_conservation(spark, sf_dir):
    """Each user with c events contributes exactly max(0, c−2) trigrams,
    and per-path distinct users never exceed occurrences."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.analytics import (
        events_path_trigrams,
    )

    tri = events_path_trigrams(spark, sf_dir).collect()
    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    expected = sum(max(0, r["count"] - 2) for r in per_user)
    assert sum(r.n_occurrences for r in tri) == expected
    assert all(1 <= r.n_users <= r.n_occurrences for r in tri)
    assert all(len(r.path.split(" > ")) == 3 for r in tri)


def test_ip_blocklist_partition_and_determinism(spark, sf_dir):
    """The screen is a partition of the corpus (disjoint CIDRs → every
    event counted exactly once) over the declared label vocabulary, and
    the hash-synthesized IPs make it bit-reproducible."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.filters import (
        CIDR_BLOCKLIST,
        filter_ip_blocklist,
    )

    rows = filter_ip_blocklist(spark, sf_dir).collect()
    total = table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total
    names = {n for n, _ in CIDR_BLOCKLIST} | {"allowed"}
    assert {r.block for r in rows} <= names
    again = {r.block: r.n_events for r in filter_ip_blocklist(spark, sf_dir).collect()}
    assert again == {r.block: r.n_events for r in rows}


def test_anova_matches_numpy_reference(spark, sf_dir):
    """F and η² must equal an independent numpy recomputation of the
    textbook one-way decomposition on the same data."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.analytics import agg_anova_oneway

    import numpy as np

    r = agg_anova_oneway(spark, sf_dir).collect()[0]
    rows = (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .collect()
    )
    groups = {}
    for x in rows:
        groups.setdefault(x.l_returnflag, []).append(round(x.l_quantity))
    assert {r.n_a, r.n_n, r.n_r} == {len(groups[g]) for g in "ANR"}
    arrs = [np.array(groups[g], dtype=np.float64) for g in "ANR"]
    allv = np.concatenate(arrs)
    ssb = sum(len(a) * (a.mean() - allv.mean()) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    f_ref = (ssb / 2) / (ssw / (len(allv) - 3))
    eta_ref = ssb / (ssb + ssw)
    assert abs(r.f_stat - round(f_ref, 4)) < 5e-4
    assert abs(r.eta_sq - round(eta_ref, 6)) < 5e-6


def test_anova_planted_separation_and_degenerate(spark, tmp_path):
    """Fully separated constant groups → SSW = 0 → F is NULL by guard
    while η² = 1.0 exactly; a single shared constant everywhere → both
    NULL (no 0/0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.operators.analytics import agg_anova_oneway

    def li_table(quantities, flags):
        n = len(quantities)
        return pa.table(
            {
                "l_orderkey": pa.array(range(n), pa.int64()),
                "l_partkey": pa.array([1] * n, pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int32()),
                "l_quantity": pa.array([float(q) for q in quantities]),
                "l_extendedprice": pa.array([1.0] * n),
                "l_discount": pa.array([0.0] * n),
                "l_tax": pa.array([0.0] * n),
                "l_returnflag": pa.array(flags, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
            }
        )

    d1 = tmp_path / "sep"
    d1.mkdir()
    pq.write_table(
        li_table([10] * 4 + [20] * 4 + [30] * 4, ["A"] * 4 + ["N"] * 4 + ["R"] * 4),
        str(d1 / "lineitem.parquet"),
    )
    r = agg_anova_oneway(spark, str(d1)).collect()[0]
    assert r.f_stat is None and r.eta_sq == 1.0

    d2 = tmp_path / "flat"
    d2.mkdir()
    pq.write_table(
        li_table([7] * 12, ["A", "N", "R"] * 4), str(d2 / "lineitem.parquet")
    )
    r2 = agg_anova_oneway(spark, str(d2)).collect()[0]
    assert r2.f_stat is None and r2.eta_sq is None


def test_granger_lag1_matches_numpy_ols(spark, sf_dir):
    """Both models refit with numpy least squares on independently
    rebuilt (y_t, y_{t-1}, x_{t-1}) triples must reproduce every output
    column."""
    import numpy as np

    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.analytics import (
        KS_TYPE_A,
        KS_TYPE_B,
        ts_granger_lag1,
    )

    r = ts_granger_lag1(spark, sf_dir).collect()[0]
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B))
        .select(F.to_date("ts").alias("d"), "event_type")
        .collect()
    )
    days = {}
    for x in ev:
        a, b = days.setdefault(x.d, [0, 0])
        if x.event_type == KS_TYPE_A:
            days[x.d][0] += 1
        else:
            days[x.d][1] += 1
    ds = sorted(days)
    triples = [
        (days[d][0], days[p][0], days[p][1])
        for d, p in zip(ds[1:], ds[:-1])
        if (d - p).days == 1
    ]
    assert r.n_obs == len(triples) > 3
    yt = np.array([t[0] for t in triples], dtype=float)
    u = np.array([t[1] for t in triples], dtype=float)
    v = np.array([t[2] for t in triples], dtype=float)
    Xr = np.column_stack([np.ones_like(u), u])
    Xf = np.column_stack([np.ones_like(u), u, v])
    br, rss_r = np.linalg.lstsq(Xr, yt, rcond=None)[:2]
    bf, rss_f = np.linalg.lstsq(Xf, yt, rcond=None)[:2]
    cyy = ((yt - yt.mean()) ** 2).sum()
    assert abs(r.coef_self - round(bf[1], 4)) < 5e-4
    assert abs(r.coef_cross - round(bf[2], 4)) < 5e-4
    assert abs(r.r2_restricted - round(1 - rss_r[0] / cyy, 6)) < 5e-6
    assert abs(r.r2_full - round(1 - rss_f[0] / cyy, 6)) < 5e-6
    f_ref = (rss_r[0] - rss_f[0]) * (len(triples) - 3) / rss_f[0]
    assert abs(r.f_change - round(f_ref, 4)) < 5e-4
    # the full model can never fit worse than its nested restriction
    assert r.r2_full >= r.r2_restricted


def test_mutual_information_matches_numpy_and_bounds(spark, sf_dir):
    """MI recomputed with numpy from the same contingency table must
    match to quantization; 0 ≤ MI ≤ min(H_source, H_lang)."""
    import math

    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.analytics import (
        agg_mutual_information,
    )

    r = agg_mutual_information(spark, sf_dir).collect()[0]
    cells = (
        table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .count()
        .collect()
    )
    n = sum(x["count"] for x in cells)
    rt, ct = {}, {}
    for x in cells:
        rt[x.source] = rt.get(x.source, 0) + x["count"]
        ct[x.lang] = ct.get(x.lang, 0) + x["count"]
    mi = sum(
        (x["count"] / n)
        * math.log((x["count"] / rt[x.source]) * (n / ct[x.lang]))
        for x in cells
    )
    hs = sum(-(m / n) * math.log(m / n) for m in rt.values())
    hl = sum(-(m / n) * math.log(m / n) for m in ct.values())
    assert r.n_docs == n and r.n_cells == len(cells)
    assert abs(r.mi_nats - round(mi, 6)) < 2e-6
    assert abs(r.h_source_nats - round(hs, 6)) < 2e-6
    assert abs(r.h_lang_nats - round(hl, 6)) < 2e-6
    assert -1e-9 <= r.mi_nats <= min(r.h_source_nats, r.h_lang_nats) + 1e-9


def test_mutual_information_independent_table_is_zero(spark, tmp_path):
    """A perfectly independent (source ⊗ lang) table → every cell's
    ln-ratio is exactly 0 → MI is exactly 0.0 (not just small)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdu_hadoop_indexer_spark.operators.analytics import (
        agg_mutual_information,
    )

    rows = [
        (s, l)
        for s in ("web", "books")
        for l in ("en", "fr")
        for _ in range({"web": 6, "books": 3}[s] * {"en": 4, "fr": 2}[l])
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array([l for _, l in rows], pa.string()),
            "source": pa.array([s for s, _ in rows], pa.string()),
            "n_chars": pa.array([1] * len(rows), pa.int64()),
        }
    )
    d = tmp_path / "mi_ind"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    r = agg_mutual_information(spark, str(d)).collect()[0]
    assert r.mi_nats == 0.0
    assert r.h_source_nats > 0 and r.h_lang_nats > 0


def test_bootstrap_ci_valid_under_production_hash_family(
    spark, sf_dir, monkeypatch
):
    """SPARK_GRAFT_XXHASH=1 swaps the per-row fold for xxhash64 inside
    the same [0, XH_P) domain: the CI's STRUCTURAL contract (B replicates,
    ordered endpoints bracketing the point estimate, unchanged full-sample
    mean) must hold under either family, and the two families' draws must
    genuinely differ (the flag reaches the op)."""
    from sdu_hadoop_indexer_spark.operators.analytics import (
        BOOT_B,
        agg_bootstrap_ci,
    )

    monkeypatch.delenv("SPARK_GRAFT_XXHASH", raising=False)
    portable = {r.l_returnflag: r for r in agg_bootstrap_ci(spark, sf_dir).collect()}
    monkeypatch.setenv("SPARK_GRAFT_XXHASH", "1")
    prod = {r.l_returnflag: r for r in agg_bootstrap_ci(spark, sf_dir).collect()}
    assert set(portable) == set(prod)
    for k, r in prod.items():
        assert r.n_reps == BOOT_B
        assert r.boot_lo <= r.mean_qty <= r.boot_hi
        assert r.mean_qty == portable[k].mean_qty  # point estimate hash-free
    assert any(
        (prod[k].boot_lo, prod[k].boot_hi)
        != (portable[k].boot_lo, portable[k].boot_hi)
        for k in prod
    )


def test_json_schema_profile_matches_residue_recompute(spark, sf_dir):
    """Per-key presence and type censuses recomputed in Python from the
    synthesis residues (over the actual event_id population) must match
    exactly; dominant types follow."""
    from sdu_hadoop_indexer_spark.catalog import table
    from sdu_hadoop_indexer_spark.operators.scalar_fns import (
        fn_json_schema_profile,
    )

    ids = [
        r.event_id
        for r in table(spark, sf_dir, "events").select("event_id").collect()
    ]
    n = len(ids)
    exp = {
        "k": dict(n_present=n, n_int=n, n_float=0, n_bool=0),
        "lang": dict(
            n_present=sum(1 for i in ids if i % 3 != 0),
            n_int=0,
            n_float=0,
            n_bool=0,
        ),
        "score": dict(
            n_present=sum(1 for i in ids if i % 5 == 0),
            n_int=sum(1 for i in ids if i % 20 == 0),
            n_float=sum(1 for i in ids if i % 5 == 0 and i % 20 != 0),
            n_bool=0,
        ),
        "flag": dict(
            n_present=sum(1 for i in ids if i % 7 == 0),
            n_int=0,
            n_float=0,
            n_bool=sum(1 for i in ids if i % 7 == 0),
        ),
    }
    rows = {r.key: r for r in fn_json_schema_profile(spark, sf_dir).collect()}
    assert set(rows) == set(exp)
    for k, e in exp.items():
        r = rows[k]
        for f, v in e.items():
            assert getattr(r, f) == v, (k, f, getattr(r, f), v)
        assert r.n_present == r.n_int + r.n_float + r.n_bool + r.n_string
    assert rows["k"].dominant_type == "int"
    assert rows["lang"].dominant_type == "string"
    assert rows["score"].dominant_type == "float"
    assert rows["flag"].dominant_type == "bool"
    assert rows["k"].presence_share == 1.0
