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
    SELECT event_id, round(ln(1 + value), 4) AS log1p_value
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
    return ev.select("event_id", F.round(log1p("value"), 4).alias("log1p_value"))


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT event_type, round(sqrt(avg(value * value)), 4) AS rms_value
    FROM events GROUP BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas UDAF: root-mean-square per group."""

    @pandas_udf("double")
    def rms(v: pd.Series) -> float:
        import numpy as np

        return float(np.sqrt(np.mean(np.square(v.to_numpy(dtype="float64")))))

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.round(rms("value"), 4).alias("rms_value"))


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype="float64")
    std = v.std()  # ddof=0 == stddev_pop
    if std > 0:
        z = pd.Series((v - v.mean()) / std).round(4)
    else:
        z = pd.Series([None] * len(v), dtype="float64")
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z}
    )


@register(
    "udtf_applyinpandas",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / nullif(stddev_pop(value) OVER (PARTITION BY user_id), 0),
                 4) AS z
    FROM events
    """,
)
def udtf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (UDTF-like): per-user z-score normalization via
    applyInPandas — the multimodal/feature-engineering batch shape."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        _zscore, "event_id long, user_id long, z double"
    )
