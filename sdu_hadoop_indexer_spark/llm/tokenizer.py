"""BPE tokenizer training as iterative distributed aggregation (SURVEY.md
§2.B-10; charter training-data extension, N-provenance).

Byte-Pair Encoding's training loop is a pure counting algorithm — "find the
most frequent adjacent symbol pair, merge it everywhere, repeat" — which maps
directly onto Spark's grouped aggregation + array fold:

- the corpus compresses to the (word, freq) vocabulary first (classic BPE
  trick: merging operates on vocab entries weighted by frequency, so the
  iteration cost is vocab-sized, NOT corpus-sized — at 100 TB the one
  corpus-sized job is the initial word count);
- each round: explode adjacent symbol pairs (weighted by word freq) → one
  hash agg → deterministic arg-max by (count DESC, pair ASC) → apply the
  merge to every vocab entry with a JVM-side `aggregate` fold (no Python);
- `localCheckpoint` truncates the per-round lineage exactly like
  `dedup_minhash_cluster`'s label-propagation loop.

ROWS-ONLY: the merge TABLE is deterministic (pinned in tests), but the
iterative loop is not expressible as one DuckDB SQL statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..text.indexer import tokenize

N_MERGES = 10


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair counts over vocab entries, weighted
    by word frequency — symbols explode with their ordinal so adjacency is
    an equi-join-free window-free zip of the array with its own tail."""
    pairs = vocab.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice("sym", 1, F.size("sym") - 1),
                F.slice("sym", 2, F.size("sym") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt"))


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every adjacent (a, b) into one symbol a+b via a JVM-side
    left fold over the symbol array (no Python, no explode)."""
    merged = F.aggregate(
        "sym",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.select("word", "freq", merged.alias("sym"))


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Train `n_merges` BPE merges over the fixture corpus; returns the
    merge table (rank, left, right, merged, cnt)."""
    words = (
        tokenize(spark, sf_dir)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count("*").alias("freq"))
    )
    vocab = words.select(
        "word", "freq", F.split("word", "").alias("sym")
    ).localCheckpoint()
    merges = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((rank, a, b, a + b, int(cnt)))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, cnt bigint"
    )


@register("llm_bpe_train")  # ROWS-ONLY: iterative loop not one-statement SQL
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train(spark, sf_dir)


def bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Apply trained merges: re-run the training fold sequence over the
    vocab (merge application is the SAME `aggregate` fold used in
    training, replayed in rank order), yielding each word's BPE symbol
    sequence. Corpus encoding is then a vocab-sized broadcast join — the
    corpus itself is never re-folded."""
    words = (
        tokenize(spark, sf_dir)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count("*").alias("freq"))
    )
    vocab = words.select(
        "word", "freq", F.split("word", "").alias("sym")
    ).localCheckpoint()
    merges = bpe_train(spark, sf_dir, n_merges).collect()
    for m in sorted(merges, key=lambda r: r.rank):
        vocab = _apply_merge(vocab, m.left, m.right).localCheckpoint()
    return vocab.select(
        "word",
        "freq",
        F.length("word").alias("n_chars"),
        F.size("sym").alias("n_symbols"),
        F.array_join("sym", "|").alias("symbols"),
    )


@register("llm_bpe_encode")  # ROWS-ONLY: depends on learned merge table
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_encode(spark, sf_dir)
