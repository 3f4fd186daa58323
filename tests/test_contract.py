"""Driver-contract invariants: names, aliases, oracle coverage."""

from __future__ import annotations

import re

from sdu_hadoop_indexer_spark.registry import all_oracles, all_queries

# ROWS-ONLY set must stay deliberate (SURVEY §2.B): each entry has a stated
# reason (sketch/hash divergence, side effect, streaming execution, stub).
EXPECTED_ROWS_ONLY = {
    "agg_approx_distinct",
    "agg_hll_sketch_merge",  # DataSketches binary sketches engine-specific
    # (round 3) the MinHash/SimHash family moved to the cross-engine xhash
    # family and now carries EXACT oracles; the media stub family moved to
    # EXACT too (payloads are documents' ASCII bytes, so DuckDB replays the
    # stub arithmetic and gate-verifies the Arrow plumbing).
    # (round 4) sim_topk_ivf moved to EXACT: the quantizer runs on an
    # integer lattice (no float accumulation anywhere in training or
    # assignment), so DuckDB replays the Lloyd rounds as unrolled CTEs.
    # (round 4) sim_pca_power moved to EXACT: integer-lattice Gram/mean
    # sums + a fixed-order pure-Python power iteration that DuckDB replays
    # as unrolled list_reduce folds.
    # (round 4) the streaming family moved to EXACT: stream_live_tumbling
    # (complete-mode availableNow drains everything → final state == batch
    # aggregation), stream_late_data_drop and stream_outer_join_watermark
    # (FIXED synthetic replays → the sink is the closed-form watermark /
    # outer-join SPEC), and scan_state_store (append mode retains exactly
    # the windows ending after max-event-time − delay).
    # (round 3) llm_bpe_train / llm_bpe_encode moved to EXACT oracles: the
    # training loop unrolls to MATERIALIZED CTE rounds in DuckDB.
    "agg_approx_percentile_sketch",  # GK sketch merge order engine-local
}


def test_every_query_callable_and_named():
    q = all_queries()
    assert len(q) >= 80
    assert all(re.fullmatch(r"[a-z0-9_]+", name) for name in q)


def test_oracle_coverage_is_total_minus_declared():
    q, o = all_queries(), all_oracles()
    assert set(o) <= set(q)
    assert set(q) - set(o) == EXPECTED_ROWS_ONLY


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["term", "postings", "df"]


def test_coverage_order_red_then_changed_then_reverify_then_fresh_then_green():
    """queries()/oracle_sql() must enumerate (1) names whose LATEST driver
    sample was red, then (2) CHANGED_OPS names whose latest sample predates
    the recorded change round (VERDICT r10 item 6: a plan-shape change needs
    a post-change hard signal next window, not when the sweep wraps), then
    (3) a 10-name re-verify slice of the OLDEST-green names (VERDICT r6
    item 2) — with STALE-LEDGER names (latest green was a weak `no_oracle`
    row but the op has an exact oracle now, VERDICT r8 item 4) jumped to
    the front of the slice — then (4) names the gate has never verified,
    then (5) the remaining sampled-green names oldest first, keep the two
    dicts' relative order consistent, and lose/duplicate nothing relative
    to the registry."""
    import glob
    import json
    import os

    import __spark_entry__ as e
    from sdu_hadoop_indexer_spark.registry import all_oracles, all_queries

    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(all_queries())
    assert set(o) == set(all_oracles())
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as fh:
            for name, res in json.load(fh).items():
                latest[name] = (rnd, res)

    def green(n: str) -> bool:
        res = latest[n][1]
        if not isinstance(res, dict):
            return True  # name-list-only row counts as sampled green
        return bool(
            res.get("rows_match")
            and res.get("schema_match") is not False
            and res.get("hash_match") is not False
        ) or res.get("err") == "no_oracle"

    changed_pending = {
        n
        for n, rnd in e.CHANGED_OPS.items()
        if n in latest and latest[n][0] < rnd
    }
    stale = {
        n
        for n, (_, res) in latest.items()
        if isinstance(res, dict)
        and res.get("err") == "no_oracle"
        and all_oracles().get(n)
    }
    greens_oldest = sorted(
        (n for n in q if n in latest and green(n) and n not in changed_pending),
        key=lambda n: (n not in stale, latest[n][0], n),
    )
    reverify = set(greens_oldest[:10])

    def cls(n: str) -> int:
        if n in latest and not green(n):
            return 0
        if n in changed_pending:
            return 1
        if n in reverify:
            return 2
        if n not in latest:
            return 3
        return 4

    classes = [cls(n) for n in q]
    # monotone: red-retests, changed-ops, re-verify canaries, fresh, green
    assert classes == sorted(classes), (
        "class order must be red, changed, canary, fresh, green"
    )
    # the trailing green class is aged oldest-sample-first
    tail = [n for n in q if cls(n) == 4]
    assert tail == sorted(tail, key=lambda n: (latest[n][0], n))
    # oracle enumeration follows the same order (restricted to oracle names)
    assert [n for n in q if n in o] == list(o)


def test_stale_ledger_name_jumps_reverify_slice(tmp_path):
    """ADVICE r9: the stale-ledger carve-out must hold under a SYNTHESIZED
    ledger, not the live repo state (which stops exercising it the moment
    a real sweep upgrades the last stale row). Fixture: a LATE-round
    `no_oracle` row for an op that has an exact oracle must outrank 5+
    older plain-green rows for the re-verify slice, and a name-list-only
    re-sample in a later round must clear the stale flag."""
    import json

    import __spark_entry__ as e
    from sdu_hadoop_indexer_spark.registry import all_oracles

    names = sorted(all_oracles())
    stale_name, greens = names[0], names[1:15]
    # round 1: fourteen names green with full rows
    r1 = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True}
        for n in greens
    }
    # round 7 (LATER than every green): the stale no_oracle row
    r7 = {stale_name: {"rows_match": True, "err": "no_oracle"}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(r7))

    order = e._coverage_order(names, ledger_dir=str(tmp_path))
    # the stale name must claim one of the 10 re-verify slots (no reds or
    # changed-pending names in this synthesized ledger, so the slice is
    # the first 10 enumerated names; within it names order by age, so the
    # YOUNGER stale row sits at the back of the slice) despite its round-7
    # row being younger than all fourteen round-1 greens — with the old
    # (round, stale) key it would rank 15th and never enter the slice
    assert order.index(stale_name) < 10
    # and at least three r1 greens are pushed out of the slice behind it
    assert sum(order.index(g) >= 10 for g in greens) >= 3

    # a name-list-only re-sample in round 8 (a row whose value is not a
    # result dict) supersedes the stale flag: the name rejoins the plain
    # green rotation (now the YOUNGEST green)
    (tmp_path / "CORRECTNESS_r08.json").write_text(json.dumps({stale_name: True}))
    order2 = e._coverage_order(names, ledger_dir=str(tmp_path))
    assert order2.index(stale_name) > max(order2.index(g) for g in greens)


def test_changed_op_outranks_reverify_slice(tmp_path, monkeypatch):
    """VERDICT r10 item 6: a CHANGED_OPS name whose latest driver sample
    predates the recorded change round must jump ahead of the age-based
    re-verify slice (its green row no longer describes the shipped plan),
    and a post-change sample must demote it back to the green rotation."""
    import json

    import __spark_entry__ as e
    from sdu_hadoop_indexer_spark.registry import all_oracles

    GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
    names = sorted(all_oracles())
    changed, greens = names[0], names[1:15]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: GREEN for n in greens})
    )
    # the changed op was sampled green in r3; its code changed in r5
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({changed: GREEN}))
    monkeypatch.setattr(e, "CHANGED_OPS", {changed: 5})

    order = e._coverage_order(names, ledger_dir=str(tmp_path))
    # no reds → the changed-pending name leads the whole enumeration,
    # ahead of every re-verify-slice green (which are all OLDER samples —
    # the age key alone would bury the changed op behind all 14 of them)
    assert order.index(changed) == 0

    # a post-change sample (r6 ≥ change round 5) clears the priority: the
    # name rejoins the plain green rotation as the youngest green
    (tmp_path / "CORRECTNESS_r06.json").write_text(json.dumps({changed: GREEN}))
    order2 = e._coverage_order(names, ledger_dir=str(tmp_path))
    assert order2.index(changed) > max(order2.index(g) for g in greens)


def test_extended_band_warning_fires_on_synthetic_regression():
    """VERDICT r10 item 3: the frozen extended-suite envelope must turn a
    row regression into a visible warning in the bench output — a row at
    reference stays silent, a row at 2x its frozen reference (the
    r8-ivfpq-class episode and worse) fires, and the deflation factor is
    applied before the comparison (a contended run must not false-fire)."""
    import bench

    name, ref = next(iter(bench.EXTENDED_BANDS.items()))
    # at reference: silent
    assert bench.band_warnings({name: ref}, deflate=1.0) == []
    # synthetic 2x regression: fires, names the row
    warns = bench.band_warnings({name: ref * 2.0}, deflate=1.0)
    assert len(warns) == 1 and name in warns[0]
    # same raw 2x on a 2x-contended box (deflate 0.5): silent after deflation
    assert bench.band_warnings({name: ref * 2.0}, deflate=0.5) == []
    # rows without a frozen band (new entries) never warn
    assert bench.band_warnings({"brand_new_row": 99.0}, deflate=1.0) == []
    # every extended-list entry plus the two minhash-family rows is banded
    assert set(bench.EXTENDED) <= set(bench.EXTENDED_BANDS)


def test_changed_ops_names_are_registered():
    """Every CHANGED_OPS key must be a registered query name — a typo'd or
    renamed entry silently loses its priority re-verify slot (the exact
    failure mode the dict exists to prevent; VERDICT r11 item 4)."""
    import __spark_entry__ as e

    q = all_queries()
    missing = [n for n in e.CHANGED_OPS if n not in q]
    assert not missing, f"CHANGED_OPS names not in queries(): {missing}"
