"""Cross-engine deterministic hashing for sketch / LSH operators.

Spark's ``xxhash64`` has no DuckDB twin, which forced the MinHash / SimHash /
count-min family to be ROWS-ONLY at the oracle gate.  This module defines a
hash family BOTH engines evaluate bit-identically, so those operators can be
EXACT-oracled:

- ``xh(col)`` — a left-fold polynomial hash of a string's characters,
  ``h := (h*M + codepoint) % P`` with ``P = 1_000_000_007``.  Spark evaluates
  it with ``aggregate(split(s, ''), init, ...)``; DuckDB with
  ``list_reduce(list_prepend(init, list_transform(string_split(s, ''), ...)))``.
  Both are plain int64 arithmetic in the engine (JVM codegen / vectorized),
  and both fold in identical left-to-right order, so the results agree
  exactly (verified by the oracle gate, and int64 overflow is impossible:
  every intermediate is < 2**62).

- ``hfam(i, x1, x2)`` — the i-th member of a universal-style family
  ``(A[i]*x1 + C[i]*x2 + B[i]) % P`` over the pair of independent folds
  ``x1, x2`` (two multipliers/seeds → ~60 bits of term identity, keeping
  accidental full-collisions across a 100 TB vocabulary negligible while
  every operand stays < 2**30 so products stay < 2**60 — DuckDB raises on
  int64 overflow where Spark wraps, so provable headroom is load-bearing).

Constants come from a fixed LCG so the family is reproducible from source
with no runtime RNG (SURVEY §5.2: no nondeterminism in registered queries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

XH_P = 1_000_000_007  # prime modulus, < 2**30
_M1, _INIT1 = 131, 7
_M2, _INIT2 = 137, 17

_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2**31


def _lcg_consts(seed: int, n: int) -> list[int]:
    """n reproducible constants in [1, 2**30): a fixed LCG stream."""
    out, s = [], seed
    for _ in range(n):
        s = (_LCG_A * s + _LCG_C) % _LCG_M
        out.append(s % (2**30 - 1) + 1)
    return out


_N_FAM = 64  # enough members for SimHash's 64 bit-votes; MinHash uses 16
A = _lcg_consts(1, _N_FAM)
B = _lcg_consts(2, _N_FAM)
C = _lcg_consts(3, _N_FAM)


def xh1(col: str | Column) -> Column:
    """First char-fold hash of a string column (Spark side)."""
    return _fold(col, _M1, _INIT1)


def xh2(col: str | Column) -> Column:
    """Second, independent char-fold hash (different multiplier + seed)."""
    return _fold(col, _M2, _INIT2)


def _fold(col: str | Column, mult: int, init: int) -> Column:
    return F.aggregate(
        F.split(col, ""),
        F.lit(init).cast("long"),
        lambda h, c: (h * mult + F.ascii(c)) % F.lit(XH_P),
    )


def xh1_sql(expr: str) -> str:
    """DuckDB twin of :func:`xh1` over an SQL string expression."""
    return _fold_sql(expr, _M1, _INIT1)


def xh2_sql(expr: str) -> str:
    return _fold_sql(expr, _M2, _INIT2)


def _fold_sql(expr: str, mult: int, init: int) -> str:
    return (
        f"list_reduce(list_prepend({init}::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(h, c) -> (h * {mult} + c) % {XH_P})"
    )


def hfam(i: int, x1: Column, x2: Column) -> Column:
    """i-th family hash over the fold pair — value in [0, XH_P)."""
    return (F.lit(A[i]) * x1 + F.lit(C[i]) * x2 + F.lit(B[i])) % F.lit(XH_P)


def hfam_sql(i: int, x1: str = "x1", x2: str = "x2") -> str:
    # ::BIGINT so the products can't overflow INT32 even on literal operands
    return (
        f"(({A[i]}::BIGINT * ({x1}) + {C[i]}::BIGINT * ({x2}) + {B[i]}) % {XH_P})"
    )


# Fold used to combine several already-reduced values (< XH_P each) into one
# bucket key — e.g. a MinHash band hash over its row minima. A single mod-P
# combine is only ~30 bits: at 10^9 docs that is ~C(n,2)/2^30 spurious
# same-bucket collisions per band, so `combine` packs TWO independent mod-P
# folds (different multipliers) as c1*XH_P + c2 — a ~60-bit key, still
# provably < 2^61 so DuckDB's checked int64 arithmetic can't overflow.
_COMBINE_M1 = 1_000_003
_COMBINE_M2 = 1_000_033

# Exclusive upper bound of combine()'s output: (XH_P-1)*XH_P + XH_P = XH_P².
COMBINE_BOUND = XH_P * XH_P


def _combine_one(cols: list[Column], mult: int) -> Column:
    h = cols[0]
    for c in cols[1:]:
        h = (h * mult + c) % F.lit(XH_P)
    return h


def combine(cols: list[Column]) -> Column:
    return _combine_one(cols, _COMBINE_M1) * F.lit(XH_P) + _combine_one(
        cols, _COMBINE_M2
    )


def _combine_one_sql(exprs: list[str], mult: int) -> str:
    h = f"({exprs[0]})::BIGINT"
    for e in exprs[1:]:
        h = f"(({h}) * {mult}::BIGINT + ({e})) % {XH_P}"
    return h


def combine_sql(exprs: list[str]) -> str:
    return (
        f"({_combine_one_sql(exprs, _COMBINE_M1)}) * {XH_P}::BIGINT"
        f" + ({_combine_one_sql(exprs, _COMBINE_M2)})"
    )
