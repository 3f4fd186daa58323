"""Property-based invariants over generated corpora (SURVEY.md §5.2 item 4).

Hypothesis drives small random document sets through the REAL pipeline
(parquet round-trip → the registered operators) and asserts the algebraic
invariants that must hold for every corpus, not just the fixtures:

- Σ tf over the flat index == total token count of the corpus
- df(term) == |postings(term)| in the nested index
- positions are strictly increasing ordinals bounded by the raw split length
- phrase hits ⊆ boolean-AND hits (on every adjacent token pair present)
- exact dedup is idempotent and covers every doc exactly once

Example count is kept low: each example is a real Spark job; the value here
is the generator's edge cases (empty bodies, repeated/unicode tokens,
whitespace runs), not volume.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sdu_hadoop_indexer_spark.text.indexer import (  # noqa: E402
    index_flat,
    index_nested,
    tokenize,
)

# Tokens: ascii words, unicode words, and whitespace-only runs mixed in via
# the separator strategy below.
token = st.text(
    alphabet=st.sampled_from("abπé1"),
    min_size=1,
    max_size=4,
)
body = st.lists(token, min_size=0, max_size=12).map(lambda ts: "  ".join(ts))
corpus = st.lists(body, min_size=1, max_size=6)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _write_docs(spark, tmp_path, bodies: list[str]) -> str:
    rows = [
        (i, text, "xx", "prop", len(text)) for i, text in enumerate(bodies)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@given(bodies=corpus)
@SETTINGS
def test_index_invariants_hold_for_any_corpus(spark, tmp_path, bodies):
    d = _write_docs(spark, tmp_path, bodies)

    toks = tokenize(spark, d).collect()
    n_tokens = len(toks)
    expected_tokens = sum(len(b.lower().split()) for b in bodies)
    assert n_tokens == expected_tokens

    flat = index_flat(spark, d).collect()
    assert sum(r.tf for r in flat) == n_tokens
    for r in flat:
        assert r.positions == sorted(set(r.positions)), "strictly increasing"
        assert r.tf == len(r.positions)

    nested = index_nested(spark, d).collect()
    assert {r.term for r in nested} == {r.term for r in flat}
    for r in nested:
        assert r.df == len({p.doc_id for p in r.postings})
        # postings doc-sorted (the reference's secondary sort, App.scala:105-111)
        assert [p.doc_id for p in r.postings] == sorted(
            p.doc_id for p in r.postings
        )


@given(bodies=corpus)
@SETTINGS
def test_dedup_exact_partitions_corpus(spark, tmp_path, bodies):
    from sdu_hadoop_indexer_spark.llm.dedup import dedup_exact

    d = _write_docs(spark, tmp_path, bodies)
    groups = dedup_exact(spark, d).collect()
    assert sum(r.n_copies for r in groups) == len(bodies)
    assert len({r.keeper for r in groups}) == len(groups)  # one keeper each
    # idempotence: re-running over the keepers yields singleton groups
    keepers = {r.keeper for r in groups}
    uniq_texts = {bodies[k] for k in keepers}
    assert len(uniq_texts) == len(keepers)


@given(bodies=corpus)
@SETTINGS
def test_phrase_hits_subset_of_and_hits(spark, tmp_path, bodies):
    """For the first adjacent token pair in the corpus: every phrase-matched
    doc must also be an AND-matched doc."""
    pair = None
    for b in bodies:
        ts = b.lower().split()
        if len(ts) >= 2:
            pair = (ts[0], ts[1])
            break
    if pair is None:
        return
    d = _write_docs(spark, tmp_path, bodies)
    flat = index_flat(spark, d)
    t1 = flat.where(F.col("term") == pair[0]).select(
        "doc_id", F.col("positions").alias("pa")
    )
    t2 = flat.where(F.col("term") == pair[1]).select(
        "doc_id", F.col("positions").alias("pb")
    )
    joined = t1.join(t2, "doc_id")
    and_docs = {r.doc_id for r in joined.collect()}
    phrase_docs = {
        r.doc_id
        for r in joined.where(
            F.arrays_overlap(
                F.transform("pa", lambda p: p + 1), F.col("pb")
            )
        ).collect()
    }
    assert phrase_docs <= and_docs


@given(bodies=corpus)
@SETTINGS
def test_pack_sequences_partitions_token_stream(spark, tmp_path, bodies):
    """Property: packing is a bijective layout of each shard's token stream —
    offsets are the exclusive prefix sums of token counts, every offset maps
    into [0, PACK_BUDGET), and pack ids are non-decreasing in doc order."""
    from sdu_hadoop_indexer_spark.llm.curation import PACK_BUDGET, pack_sequences

    sf = _write_docs(spark, tmp_path, bodies)
    rows = sorted(
        pack_sequences(spark, sf).collect(), key=lambda r: (r.source, r.doc_id)
    )
    pos = 0
    for r in rows:  # single synthetic source ⇒ one stream
        assert r.pack_id * PACK_BUDGET + r.pack_offset == pos
        assert 0 <= r.pack_offset < PACK_BUDGET
        pos += r.n_tokens


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**16 - 1),
            st.integers(min_value=0, max_value=2**16 - 1),
        ),
        min_size=1,
        max_size=16,
    )
)
@SETTINGS
def test_zorder_interleave_bit_property(spark, pairs):
    """Property: the Morton code's even bits are exactly the first column's
    bits and its odd bits the second's — so z-sort ordering groups rows
    sharing high-bit prefixes of BOTH dims (the locality the layout needs)."""
    from sdu_hadoop_indexer_spark.operators.scans import _z_value

    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", _z_value(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b), (r.a, r.b, r.z)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=40
    )
)
@SETTINGS
def test_distributed_ntile_matches_native(spark, vals):
    """Property (round-3 RFM plan): `_ntile4_distributed` — percentile-pivot
    buckets + prefix-sum offsets + the ntile bucket-size formula — must
    reproduce Spark's native `ntile(4) OVER (ORDER BY key, user_id)`
    bit-for-bit on arbitrary tie-heavy inputs (ties are the hard case: they
    must share a bucket id yet still split across quartiles by the user_id
    tie-break, exactly as ntile does)."""
    from pyspark.sql import Window

    from sdu_hadoop_indexer_spark.operators.analytics import (
        _ntile4_distributed,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "user_id long, v double"
    )
    pivots = df.agg(
        F.percentile_approx("v", [i / 4 for i in range(1, 4)], 1000).alias("p")
    ).first()["p"]
    bexpr = F.lit(0)
    for pv in pivots:
        bexpr = bexpr + F.when(F.col("v") > F.lit(pv), 1).otherwise(0)
    b = df.withColumn("_b", bexpr)
    counts = [
        (r._b, r.c)
        for r in b.groupBy("_b").agg(F.count("*").alias("c")).collect()
    ]
    got = b.select(
        "user_id",
        _ntile4_distributed(b, F.col("v"), "_b", counts).alias("nt"),
    )
    want = df.select(
        "user_id",
        F.ntile(4).over(Window.orderBy("v", "user_id")).alias("nt"),
    )
    assert {(r.user_id, r.nt) for r in got.collect()} == {
        (r.user_id, r.nt) for r in want.collect()
    }


@given(
    series=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40)
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_ewma_matches_python_reference(spark, series):
    """Differential test: the distributed truncated-EWMA formula must equal
    a direct Python evaluation of the same renormalized weighted mean for
    ANY integer series (the operator's own oracle only checks the fixture
    corpus)."""
    from sdu_hadoop_indexer_spark.operators.analytics import _EWMA_W

    rows = [(i, int(n)) for i, n in enumerate(series)]
    df = spark.createDataFrame(rows, "t int, n long")
    from pyspark.sql import Window

    w = Window.orderBy("t")
    num = sum(
        (
            F.coalesce(F.lag("n", i).over(w), F.lit(0)) * F.lit(wt)
            for i, wt in enumerate(_EWMA_W)
        ),
        start=F.lit(0.0),
    )
    den = sum(
        (
            F.when(F.lag("n", i).over(w).isNull(), F.lit(0.0)).otherwise(F.lit(wt))
            for i, wt in enumerate(_EWMA_W)
        ),
        start=F.lit(0.0),
    )
    got = {
        r.t: r.e
        for r in df.select("t", (num / den).alias("e")).collect()
    }
    for t in range(len(series)):
        window = series[max(0, t - len(_EWMA_W) + 1) : t + 1][::-1]
        ws = _EWMA_W[: len(window)]
        want = sum(v * wt for v, wt in zip(window, ws)) / sum(ws)
        assert abs(got[t] - want) < 1e-9, (t, got[t], want)


# ---------------------------------------------------------------------------
# parity.ratio / sratio / sql twins: the integer half-away quotient is the
# load-bearing rounding primitive for every rounded ratio oracle — prove it
# against Fraction-exact half-away rounding, including exact .5 boundaries.
# ---------------------------------------------------------------------------


def _halfaway(num: int, den: int, ndigits: int) -> float:
    """Ground truth: Fraction-exact round-half-away-from-zero."""
    from fractions import Fraction

    f = Fraction(num, den) * 10**ndigits
    q, r = divmod(abs(f.numerator), f.denominator)
    scaled = q + (1 if 2 * r >= f.denominator else 0)
    return (-scaled if num < 0 else scaled) / 10**ndigits


@given(
    num=st.integers(min_value=-(10**9), max_value=10**9),
    den=st.integers(min_value=1, max_value=10**6),
    ndigits=st.integers(min_value=2, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_sql_sratio_matches_fraction_rounding(num, den, ndigits):
    """DuckDB evaluation of sql_sratio == Fraction half-away for any signed
    int ratio (sql_ratio is its non-negative restriction). Hypothesis finds
    the exact-half cases (e.g. 1/8 at 2dp) that float round() gets wrong."""
    import duckdb

    from sdu_hadoop_indexer_spark.operators.parity import sql_sratio

    got = duckdb.sql(
        f"SELECT {sql_sratio(str(num), str(den), ndigits)} AS v"
    ).fetchone()[0]
    assert got == _halfaway(num, den, ndigits), (num, den, ndigits)


def test_ratio_spark_duckdb_boundary_grid(spark):
    """Cross-engine: Spark's ratio/sratio columns and DuckDB's sql twins
    must agree bit-for-bit on a fixed grid dense in exact .5 boundaries
    (num = k·den/2·10^-n shapes) and sign flips."""
    import duckdb

    from sdu_hadoop_indexer_spark.operators.parity import (
        ratio,
        sql_ratio,
        sql_sratio,
        sratio,
    )

    grid = [
        (n, d)
        for d in (1, 2, 3, 7, 8, 16, 1000)
        for n in (-1001, -125, -1, 0, 1, 4, 5, 124, 125, 625, 10**7)
    ]
    df = spark.createDataFrame(grid, "num long, den long")
    spark_rows = df.select(
        "num",
        "den",
        ratio(F.abs(F.col("num")), F.col("den")).alias("r"),
        sratio(F.col("num"), F.col("den")).alias("sr"),
    ).collect()
    for row in spark_rows:
        dr = duckdb.sql(
            f"SELECT {sql_ratio(str(abs(row.num)), str(row.den))} AS r,"
            f" {sql_sratio(str(row.num), str(row.den))} AS sr"
        ).fetchone()
        assert (row.r, row.sr) == dr, (row.num, row.den)


@given(
    s=st.integers(min_value=-(10**15), max_value=10**15),
    n=st.integers(min_value=1, max_value=100_000),
)
@settings(max_examples=300, deadline=None)
def test_round_half_away_matches_both_engines(s, n):
    """The numpy Lloyd trainers requantize centroids with
    `_round_half_away(sum/count)`; the oracles replay the same rounds with
    each engine's round(). The three must agree for ANY integer sum/count
    — including exact .5 quotients, negatives, and the 2^53 edge of the
    docstring regime — or trained centroids silently diverge from the
    oracle's replay."""
    import numpy as np
    import duckdb

    from sdu_hadoop_indexer_spark.llm.similarity import _round_half_away

    got = int(_round_half_away(np.float64(s) / np.float64(n)))
    duck = duckdb.sql(
        f"SELECT CAST(round(CAST({s} AS DOUBLE) / {n}) AS BIGINT)"
    ).fetchone()[0]
    assert got == duck, f"{s}/{n}: numpy {got} vs duckdb {duck}"


def test_round_half_away_matches_spark_round(spark):
    """Same agreement against Spark's round() on a crafted boundary set
    (exact .5 quotients both signs, big magnitudes)."""
    import numpy as np

    from sdu_hadoop_indexer_spark.llm.similarity import _round_half_away

    cases = [(1, 2), (-1, 2), (3, 2), (-3, 2), (5, 4), (7, 2), (-7, 2),
             (10**15 + 1, 2), (-(10**15) - 1, 2), (999999999999, 7),
             (-123456789, 11), (0, 5)]
    df = spark.createDataFrame(cases, "s long, n long")
    rows = df.select(
        "s", "n",
        F.round(F.col("s").cast("double") / F.col("n"), 0)
        .cast("long")
        .alias("r"),
    ).collect()
    for r in rows:
        got = int(_round_half_away(np.float64(r.s) / np.float64(r.n)))
        assert got == r.r, f"{r.s}/{r.n}: numpy {got} vs spark {r.r}"


@given(rank=st.integers(min_value=1, max_value=10_000))
@settings(max_examples=200, deadline=None)
def test_rrf_quotient_lattice_matches_duckdb(rank):
    """The hybrid-RRF per-rank quotient floor((2S + (K+r)) / (2(K+r)))
    must agree between Python/Spark integer arithmetic and DuckDB's
    evaluation of the identical expression for any rank."""
    import duckdb

    from sdu_hadoop_indexer_spark.llm.similarity import RRF_K, RRF_SCALE

    py = (2 * RRF_SCALE + (RRF_K + rank)) // (2 * (RRF_K + rank))
    duck = duckdb.sql(
        f"SELECT CAST(floor((2 * {RRF_SCALE} + ({RRF_K} + {rank}))"
        f" / (2.0 * ({RRF_K} + {rank}))) AS BIGINT)"
    ).fetchone()[0]
    assert py == duck, rank
