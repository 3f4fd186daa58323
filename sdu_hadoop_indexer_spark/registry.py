"""Query/oracle registry backing the ``__spark_entry__.py`` driver contract.

Every operator module registers its declared queries here via :func:`register`.
A query is a ``(spark, sf_dir) -> DataFrame`` callable; most also carry an
ANSI-SQL oracle string that DuckDB runs over the same parquet fixtures
(SURVEY.md §2.B "oracle" column). Queries without an oracle are the declared
ROWS-ONLY set (engine-specific hashes/sketches, side-effects, streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def jsonify_complex(df: DataFrame) -> DataFrame:
    """Project every array/map/struct column to its canonical JSON string.

    The driver's correctness gate canonicalizes results with pandas
    ``sort_values``/``factorize``, which cannot hash ndarray cells — so
    registered queries must emit scalar columns only. Spark ``to_json`` and
    DuckDB ``to_json(...)::VARCHAR`` are byte-identical on nested
    array/struct values (verified: int/string arrays incl. escapes, empty
    arrays, NULL, array<struct<...>>), so wrapping both engines' complex
    outputs in to_json preserves EXACT hash-compare semantics. Library
    functions keep native types; only the registered wrappers scalarize.
    """
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.to_json(f.name).alias(f.name)
            if f.dataType.typeName() in ("array", "map", "struct")
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: declare a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from .operators import (  # noqa: F401
        aggregates,
        analytics,
        filters,
        joins,
        scalar_fns,
        scans,
        sorts_setops,
        udfs,
        windows,
    )
    from . import sql_api  # noqa: F401
    from .text import analysis, indexer, mining, search  # noqa: F401
    from .llm import curation, dedup, similarity, tokenizer  # noqa: F401
    from .streaming import event_windows, pipeline  # noqa: F401
    from .multimodal import media  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
