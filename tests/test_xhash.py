"""Cross-engine hash parity: the xhash fold/family must agree bit-for-bit
between Spark and DuckDB — this is the foundation the round-3 EXACT oracles
for the MinHash/SimHash/count-min/plane-LSH family stand on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sdu_hadoop_indexer_spark import xhash as X

WORDS = ["a", "abc", "hello", "zz9'q", "the", "partition", "x" * 40, "0", "9x", ""]


def py_fold(s: str, mult: int, init: int) -> int:
    """Pure-python reference of the char fold. Both engines split '' into
    one empty element whose ascii() is 0 — mirrored here."""
    h = init
    for code in [ord(c) for c in s] or [0]:
        h = (h * mult + code) % X.XH_P
    return h


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_fold_parity_spark_vs_duckdb(spark, duck):
    df = spark.createDataFrame([(w,) for w in WORDS], ["term"])
    rows = df.select(
        "term", X.xh1("term").alias("x1"), X.xh2("term").alias("x2")
    ).collect()
    for r in rows:
        d1 = duck.execute(f"SELECT {X.xh1_sql('?')}", [r.term]).fetchone()[0]
        d2 = duck.execute(f"SELECT {X.xh2_sql('?')}", [r.term]).fetchone()[0]
        assert (r.x1, r.x2) == (d1, d2), r.term
        assert r.x1 == py_fold(r.term, 131, 7), r.term
        assert r.x2 == py_fold(r.term, 137, 17), r.term


def test_fold_duckdb_matches_python_reference_property(duck):
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ascii_printable = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
    )

    @given(ascii_printable)
    @settings(max_examples=150, deadline=None)
    def check(s: str) -> None:
        got = duck.execute(f"SELECT {X.xh1_sql('?')}", [s]).fetchone()[0]
        assert got == py_fold(s, 131, 7), s

    check()


def test_family_parity_and_range(spark, duck):
    df = spark.createDataFrame([(w,) for w in WORDS], ["term"])
    cols = [
        X.hfam(i, X.xh1("term"), X.xh2("term")).alias(f"h{i}") for i in (0, 7, 63)
    ]
    rows = df.select("term", *cols).collect()
    for r in rows:
        x1 = duck.execute(f"SELECT {X.xh1_sql('?')}", [r.term]).fetchone()[0]
        x2 = duck.execute(f"SELECT {X.xh2_sql('?')}", [r.term]).fetchone()[0]
        for i in (0, 7, 63):
            dv = duck.execute(
                f"SELECT {X.hfam_sql(i, str(x1), str(x2))}"
            ).fetchone()[0]
            assert getattr(r, f"h{i}") == dv
            assert 0 <= dv < X.XH_P


def test_combine_parity(spark, duck):
    vals = [123456789, 7, 999999999, 0]
    sdf = spark.createDataFrame([tuple(vals)], ["a", "b", "c", "d"])
    got = sdf.select(
        X.combine([F.col("a"), F.col("b"), F.col("c"), F.col("d")]).alias("h")
    ).collect()[0].h
    dv = duck.execute(
        "SELECT " + X.combine_sql([str(v) for v in vals])
    ).fetchone()[0]
    assert got == dv


def test_constants_are_int64_safe():
    # DuckDB raises on int64 overflow where Spark wraps — every operand must
    # keep products provably below 2**63.
    for i in range(64):
        assert 1 <= X.A[i] < 2**30
        assert 1 <= X.B[i] < 2**30
        assert 1 <= X.C[i] < 2**30
    worst = (2**30) * (X.XH_P - 1) * 2 + 2**30
    assert worst < 2**63
