"""Cross-engine result-TYPE parity rules for the oracle gate.

Round 4's only driver-red row (`agg_weighted_median`) was a pure TYPE
divergence: Spark emitted int64 while the DuckDB oracle's uncast
``sum(BIGINT)`` chain surfaced as HUGEINT (int128). Every VALUE was
bit-identical, but DuckDB's pandas bridge converts HUGEINT to float64, so
the driver's hasher saw `1.5e8` (float) against `150000000` (int) and went
red — invisible to any compare that only looks at fetched Python values
(both sides fetch as `int`). The fix class is mechanical (`CAST(... AS
BIGINT)` in the oracle), but the DETECTION must be structural: compare the
DECLARED DuckDB result type of every oracle column against the type Spark
emits for the same column, using the physical-equivalence table below.

Used by ``tools/schema_audit.py`` (registry-wide audit, exit-1 on any
finding) and ``tools/check_oracle.py`` (the per-query local mirror, so a
new operator can never reach the driver with a latent type divergence).
"""

from __future__ import annotations

import re

# Spark simpleString -> DuckDB declared types that reach pandas in the SAME
# physical CLASS with bit-equal values. Anything outside the set is a gate
# risk: HUGEINT/UHUGEINT -> float64, DECIMAL -> float64/object, unsigned
# ints -> widened dtypes, TIME has no Spark twin at all.
#
# The signed-int family is interchangeable across widths: int32 vs int64
# both bridge to exact numpy integers with equal values, and the driver has
# hashed that combination green since round 1 (`topk_per_group.rn` = Spark
# int32 `row_number()` vs DuckDB BIGINT, driver r1 PASS). Float widths stay
# STRICT — float32 vs float64 values genuinely differ in precision.
_INTS = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT")
_SPARK_TO_DUCK: dict[str, tuple[str, ...]] = {
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": ("DOUBLE",),
    "float": ("FLOAT",),
    "string": ("VARCHAR",),
    "boolean": ("BOOLEAN",),
    "date": ("DATE",),
    # Spark session-tz timestamps round-trip through parquet as either
    # depending on writer metadata; both fetch as datetime64[ns].
    "timestamp": ("TIMESTAMP", "TIMESTAMP WITH TIME ZONE"),
    "timestamp_ntz": ("TIMESTAMP",),
    "binary": ("BLOB",),
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+),(\d+)\)$")


def _split_top(s: str) -> list[str]:
    """Split on commas at bracket depth 0 (handles nested <>, (), [])."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def duck_types_compat(spark_type: str, duck_type: str) -> bool | None:
    """Tri-state type-parity check. True = physically equivalent bridges,
    False = known divergence (hard finding), None = unknown combination
    (warn, don't fail — e.g. an exotic type neither table covers).

    Complex types recurse: Spark ``array<T>`` ↔ DuckDB ``T'[]``,
    ``map<K,V>`` ↔ ``MAP(K, V)``, ``struct<a:T,...>`` ↔ ``STRUCT(a T', ...)``
    (field names matched case-insensitively, order-sensitively — both
    engines' pandas bridges emit dicts keyed by field name but the driver's
    hasher serializes in declaration order).
    """
    st, dt = spark_type.strip().lower(), duck_type.strip()
    dtu = dt.upper()
    if st.startswith("array<") and st.endswith(">"):
        return duck_types_compat(st[6:-1], dt[:-2]) if dtu.endswith("[]") else False
    if st.startswith("map<") and st.endswith(">"):
        if not (dtu.startswith("MAP(") and dtu.endswith(")")):
            return False
        skv, dkv = _split_top(st[4:-1]), _split_top(dt[4:-1])
        if len(skv) != 2 or len(dkv) != 2:
            return None
        rs = [duck_types_compat(a, b) for a, b in zip(skv, dkv)]
        return None if None in rs else all(rs)
    if st.startswith("struct<") and st.endswith(">"):
        if not (dtu.startswith("STRUCT(") and dtu.endswith(")")):
            return False
        sfields, dfields = _split_top(st[7:-1]), _split_top(dt[7:-1])
        if len(sfields) != len(dfields):
            return False
        for sf, df in zip(sfields, dfields):
            sname, _, styp = sf.partition(":")
            dname, _, dtyp = df.partition(" ")
            if dname.strip('"').lower() != sname.strip().lower():
                return False
            r = duck_types_compat(styp, dtyp)
            if r is not True:
                return r
        return True
    m = _DECIMAL_RE.match(st)
    if m:
        # exact precision/scale match only — Spark decimal(p,s) and DuckDB
        # DECIMAL(p,s) both bridge via decimal/object consistently.
        return dtu == f"DECIMAL({m.group(1)},{m.group(2)})"
    allowed = _SPARK_TO_DUCK.get(st)
    if allowed is None:
        return None  # Spark type not in the physical-equivalence table
    return dtu in allowed


def duck_types_ok(spark_type: str, duck_type: str) -> bool:
    """True when the DuckDB declared type is physically equivalent to the
    Spark output type (same pandas dtype after each engine's bridge)."""
    return duck_types_compat(spark_type, duck_type) is True


def type_parity_findings(
    name: str,
    spark_fields: dict[str, str],
    duck_cols: list[str],
    duck_types: list[str],
) -> list[str]:
    """Compare per-column Spark output type vs DuckDB declared oracle type.

    ``spark_fields`` maps column name -> Spark simpleString type. Column
    matching is by NAME (the driver sorts columns by name before hashing);
    a column present on one side only is reported by the existing
    cols-compare, not here.
    """
    finds = []
    for col, dt in zip(duck_cols, duck_types):
        st = spark_fields.get(col)
        if st is None:
            continue
        compat = duck_types_compat(st, str(dt))
        if compat is None:
            # unknown combination: warn (stderr), never a hard finding —
            # a complex/exotic type outside the equivalence table must not
            # block registration when the bridges may well agree (ADVICE r5)
            import sys

            print(
                f"WARN {name}: column `{col}` type pair Spark `{st}` / "
                f"DuckDB `{dt}` not in the parity table — verify by hash",
                file=sys.stderr,
            )
            continue
        if compat is False:
            finds.append(
                f"{name}: column `{col}` — Spark `{st}` vs DuckDB `{dt}`; "
                f"the pandas bridges diverge (e.g. HUGEINT->float64) and "
                f"the driver hash goes red on identical values — CAST the "
                f"oracle output to the Spark-equivalent type"
            )
    return finds
