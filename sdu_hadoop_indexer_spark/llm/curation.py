"""End-to-end training-data curation (charter: "the operations a
large-scale training-data pipeline would need" — composed, not just as
separate demos).

`llm_curation_pipeline` chains the analysis/dedup building blocks into the
shape every LLM-corpus job has: quality gate → language gate →
content-fingerprint dedup → surviving docs. Everything is JVM-side column
expressions plus two hash aggregations; at 100 TB the stages pipeline inside
one scan of `documents` (no intermediate materialization), the dedup is one
shuffle on the fingerprint, and the rep-keep join is an aggregation-backed
semi join — the same shapes proven by the component operators' own plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..text.analysis import STOPWORDS

MIN_TOKENS = 30
MIN_UNIQ_RATIO = 0.35
MIN_EN_HITS = 2  # of the 5 heuristic English stopwords


@register(
    "llm_curation_pipeline",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
                   AS toks
        FROM documents
    ),
    gated AS (
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS uniq_ratio,
               sha256(array_to_string(list_sort(list_distinct(toks)), ' '))
                   AS fingerprint
        FROM t
        WHERE len(toks) >= {MIN_TOKENS}
          AND len(list_distinct(toks)) * 1.0 / len(toks) >= {MIN_UNIQ_RATIO}
          AND len(list_intersect(list_distinct(toks),
                                 ['the', 'a', 'of', 'and', 'to'])) >= {MIN_EN_HITS}
    ),
    reps AS (SELECT fingerprint, min(doc_id) AS doc_id FROM gated GROUP BY fingerprint)
    SELECT g.doc_id, g.n_tokens, g.uniq_ratio
    FROM gated g JOIN reps r ON g.doc_id = r.doc_id
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality gate (length + type/token ratio) → English gate
    (stopword hits) → exact near-dup removal (content fingerprint, keep the
    min doc_id per fingerprint) → curated doc set with its quality signals."""
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
    uniq = F.array_distinct("toks")
    en_hits = F.size(
        F.array_intersect(uniq, F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    )
    gated = (
        table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= MIN_TOKENS)
        .where(F.size(uniq) / F.size("toks") >= MIN_UNIQ_RATIO)
        .where(en_hits >= MIN_EN_HITS)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.round(F.size(uniq) / F.size("toks"), 4).alias("uniq_ratio"),
            F.sha2(F.concat_ws(" ", F.sort_array(uniq)), 256).alias("fingerprint"),
        )
    )
    reps = gated.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return gated.join(reps, ["fingerprint", "doc_id"]).select(
        "doc_id", "n_tokens", "uniq_ratio"
    )


HOLDOUT_PREFIX = "0a"  # md5 hex < "0a" ≈ 10/256 ≈ 3.9% of docs


@register(
    "llm_split_holdout",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5('split-v1|' || CAST(doc_id AS VARCHAR)), 1, 2)
                     < '{HOLDOUT_PREFIX}'
                THEN 'holdout' ELSE 'train' END AS split
    FROM documents
    """,
)
def split_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, reproducible train/holdout split — the
    contamination-control primitive of every training-data pipeline: the
    assignment is a pure function of (salt, doc_id), so it is stable across
    runs, engines, partitionings and re-shards, and adding documents never
    reassigns existing ones. Implemented as a lexicographic threshold on the
    md5 hex digest (identical bytes on both engines — EXACT oracle, unlike
    xxhash64-based sampling which is engine-local). At 100 TB this is a
    stateless map — no shuffle, no sampling pass, no stored split table."""
    d = table(spark, sf_dir, "documents")
    digest = F.md5(F.concat(F.lit("split-v1|"), F.col("doc_id").cast("string")))
    return d.select(
        "doc_id",
        F.when(F.substring(digest, 1, 2) < HOLDOUT_PREFIX, "holdout")
        .otherwise("train")
        .alias("split"),
    )
