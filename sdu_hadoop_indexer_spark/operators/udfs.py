"""UDF / UDAF / UDTF surface (SURVEY.md §2.B-11).

Demonstrations of the four Python extension points, each with a pure-SQL
oracle twin. Everything ELSE in this engine is JVM built-ins; these exist to
prove the escape hatches work and to document their cost model:
row-Python UDF ≪ Arrow-batched pandas UDF ≪ built-in (SURVEY §4 "UDFs are
the slow path"). The pandas paths are the pattern multimodal decode uses.

UDF objects are constructed lazily inside each query: pyspark parses DDL
return types at decoration time, which requires an active SparkSession —
module import must stay session-free (the registry imports everything before
the driver hands us its session).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..catalog import table
from ..registry import register


@register(
    "udf_python",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars < 200 THEN 'short'
                WHEN n_chars < 400 THEN 'medium'
                ELSE 'long' END AS size_bucket
    FROM documents
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-scalar Python UDF (the slow path, shown once, small input)."""

    # no type hints on the inner fn: PySpark 4 tries to infer a pandas-UDF
    # eval type from them and warns on plain scalar hints
    @udf("string")
    def size_bucket(n_chars):
        if n_chars is None:
            return "unknown"
        if n_chars < 200:
            return "short"
        if n_chars < 400:
            return "medium"
        return "long"

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", size_bucket("n_chars").alias("size_bucket"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, round(ln(1 + value), 4) + 0.0 AS log1p_value
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched vectorized scalar UDF (numpy over column batches)."""

    @pandas_udf("double")
    def log1p(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(v)

    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.round(log1p("value"), 4) + F.lit(0.0)).alias("log1p_value"),
    )


@register(
    "udf_grouped_agg",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events
    )
    SELECT event_type,
           round(sqrt(CAST(sum(v4 * v4) AS DOUBLE) / 1e8 / count(*)), 4)
               + 0.0 AS rms_value
    FROM c GROUP BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas UDAF: root-mean-square per group — computed from the EXACT
    integer sum of squared ten-thousandths (schema_audit rule: a rounded
    float mean is accumulation-order-dependent across engines; identical
    integer sums + identical final expression are not)."""

    @pandas_udf("double")
    def rms(v: pd.Series) -> float:
        import numpy as np

        v4 = np.rint(v.to_numpy(dtype="float64") * 1e4).astype("int64")
        s2 = float(int((v4.astype(object) * v4.astype(object)).sum()))
        return float(np.sqrt(s2 / 1e8 / len(v4)))

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (F.round(rms("value"), 4) + F.lit(0.0)).alias("rms_value")
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    # Mean/std from EXACT integer sums of ten-thousandths, evaluated through
    # the same expression shape as the oracle (schema_audit rule): numpy's
    # one-pass mean/std and DuckDB's streaming stddev_pop disagree in the
    # last float bits, which round() can amplify into a hash mismatch.
    import numpy as np

    v4 = np.rint(pdf["value"].to_numpy(dtype="float64") * 1e4).astype("int64")
    n = float(len(v4))
    sv = float(int(v4.astype(object).sum()))
    sv2 = float(int((v4.astype(object) * v4.astype(object)).sum()))
    var = max((sv2 / 1e8 - (sv / 1e4) * (sv / 1e4) / n) / n, 0.0)
    std = float(np.sqrt(var))
    if std > 0:
        # + 0.0 folds a pandas-side -0.0 (tiny negative z rounded to
        # zero) onto +0.0, in lockstep with the oracle's `+ 0.0`
        z = pd.Series((v4 / 1e4 - (sv / 1e4) / n) / std).round(4) + 0.0
    else:
        z = pd.Series([None] * len(v4), dtype="float64")
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z}
    )


@register(
    "udtf_applyinpandas",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id,
               CAST(round(value * 10000) AS BIGINT) AS v4
        FROM events
    ), s AS (
        SELECT event_id, user_id, v4,
               CAST(sum(v4) OVER w AS DOUBLE) AS sv,
               CAST(sum(v4 * v4) OVER w AS DOUBLE) AS sv2,
               CAST(count(*) OVER w AS DOUBLE) AS n
        FROM c
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id,
           round((v4 / 1e4 - (sv / 1e4) / n)
                 / nullif(sqrt(greatest(
                       (sv2 / 1e8 - (sv / 1e4) * (sv / 1e4) / n) / n, 0)),
                     0), 4) + 0.0 AS z
    FROM s
    """,
)
def udtf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (UDTF-like): per-user z-score normalization via
    applyInPandas — the multimodal/feature-engineering batch shape."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        _zscore, "event_id long, user_id long, z double"
    )


@register(
    "udtf_python_lateral",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
                   AS toks
        FROM documents WHERE doc_id < 40
    )
    SELECT doc_id, CAST(i AS INTEGER) AS pos, toks[i + 1] AS token
    FROM t, unnest(range(len(toks))) AS u(i)
    """,
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Python UDTF (Spark 4 `@udtf` table function) applied as a
    correlated LATERAL join: each document row fans out to one row per
    token with its ordinal — the table-function form of the reference's
    tokenize stage (`App.scala:150-169` map side). Row-Python execution, so
    like `udf_python` it is the demonstration of the extension point on a
    bounded input, not the corpus-scale path (that is `text_tokenize`'s
    JVM-side posexplode)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            toks = [w for w in (text or "").lower().split() if w]
            for i, tok in enumerate(toks):
                yield (i, tok)

    spark.udtf.register("sdu_tokenize_udtf", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("sdu_docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM sdu_docs_for_udtf d, LATERAL sdu_tokenize_udtf(d.text) t
        WHERE d.doc_id < 40
        """
    )


@register(
    "udf_sql_function",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice * CASE WHEN o_orderstatus = 'F' THEN 0.9
                                     ELSE 1.0 END, 4) + 0.0
               AS effective_price
    FROM orders
    """,
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 `CREATE FUNCTION ... RETURN`):
    business logic packaged as a named catalog function in pure SQL — unlike
    every Python UDF it inlines into the Catalyst plan (whole-stage codegen,
    pushdown through it), so it is the ONLY user-defined-function flavor
    with zero serialization cost; the first choice before any Python escape
    hatch."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_for_sqludf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION effective_price(
            price DOUBLE, status STRING) RETURNS DOUBLE
        RETURN round(price * CASE WHEN status = 'F' THEN 0.9 ELSE 1.0 END, 4) + 0.0
        """
    )
    return spark.sql(
        """
        SELECT o_orderkey,
               effective_price(o_totalprice, o_orderstatus) AS effective_price
        FROM orders_for_sqludf
        """
    )


@register(
    "udtf_applyinarrow",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           sum(l_quantity) AS qty_sum,
           CAST(max(l_extendedprice) - min(l_extendedprice) AS DOUBLE)
               AS price_range
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udtf_applyinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`applyInArrow` (Spark 4): grouped table-function over RAW Arrow
    tables — the zero-copy sibling of `applyInPandas` for when the Python
    logic speaks Arrow natively (no pandas conversion on either edge).
    Same exchange-per-group scale shape as `udtf_applyinpandas`; sums here
    are exact (integral doubles), so the oracle is EXACT.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def summarize(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity")
        p = t.column("l_extendedprice")
        return pa.table(
            {
                "l_returnflag": [t.column("l_returnflag")[0].as_py()],
                "n": [t.num_rows],
                "qty_sum": [pc.sum(q).as_py()],
                "price_range": [
                    pc.max(p).as_py() - pc.min(p).as_py()
                ],
            }
        )

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInArrow(
        summarize,
        "l_returnflag string, n bigint, qty_sum double, price_range double",
    )
