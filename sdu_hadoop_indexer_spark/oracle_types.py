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


def duck_types_ok(spark_type: str, duck_type: str) -> bool:
    """True when the DuckDB declared type is physically equivalent to the
    Spark output type (same pandas dtype after each engine's bridge)."""
    st, dt = spark_type.lower(), duck_type.upper()
    m = _DECIMAL_RE.match(st)
    if m:
        # exact precision/scale match only — Spark decimal(p,s) and DuckDB
        # DECIMAL(p,s) both bridge via decimal/object consistently.
        return dt == f"DECIMAL({m.group(1)},{m.group(2)})"
    allowed = _SPARK_TO_DUCK.get(st)
    return allowed is not None and dt in allowed


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
        if not duck_types_ok(st, str(dt)):
            finds.append(
                f"{name}: column `{col}` — Spark `{st}` vs DuckDB `{dt}`; "
                f"the pandas bridges diverge (e.g. HUGEINT->float64) and "
                f"the driver hash goes red on identical values — CAST the "
                f"oracle output to the Spark-equivalent type"
            )
    return finds
