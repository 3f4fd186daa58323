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

EXACT oracles (round 3): the training loop IS expressible as one DuckDB
statement — each of the N_MERGES rounds unrolls to three MATERIALIZED CTEs
(pair counts → deterministic arg-max → merge application), the same pattern
as `dedup_minhash_cluster`'s unrolled label propagation. The merge
application encodes each vocab entry's symbol sequence as the string
``|s1||s2||…||sn|`` and applies ``replace(ss, '|a||b|', '|ab|')``: because
every element is wrapped in its OWN delimiters (boundaries are ``||``), a
single non-overlapping left-to-right replace consumes exactly the pairs the
Spark-side greedy left fold merges — [a,a,a,a] → [aa,aa], [a,a,a] → [aa,a] —
verified by the oracle gate over the full vocabulary. (Encoding precondition:
tokens contain no ``'|'``; the Spark output uses the same separator.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..iteration import RoundStager
from ..registry import register
from ..text.indexer import TOK_SQL, tokenize

N_MERGES = 10


def _bpe_chain_sql() -> tuple[str, str]:
    """(CTE chain, final vocab name): tok → wordfreq → v0 → N_MERGES ×
    (p_k pair counts, t_k arg-max, v_k merged vocab). MATERIALIZED is
    load-bearing — each round references its predecessor several times and
    DuckDB inlines CTEs by default."""
    rounds = []
    prev = "v0"
    for k in range(1, N_MERGES + 1):
        rounds.append(
            f"""p{k} AS MATERIALIZED (
        SELECT sy[u] AS a, sy[u + 1] AS b, sum(freq) AS cnt
        FROM (SELECT freq, sy, unnest(range(1, len(sy))) AS u
              FROM (SELECT freq, string_split(trim(ss, '|'), '||') AS sy
                    FROM {prev}))
        GROUP BY a, b
    ),
    t{k} AS MATERIALIZED (
        SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
    ),
    v{k} AS MATERIALIZED (
        -- LEFT JOIN ON TRUE (not CROSS JOIN): if a round has no pairs left,
        -- t{k} is empty and a cross join would annihilate the vocabulary;
        -- the NULL-guarded replace carries the vocab forward unchanged,
        -- matching the Spark loop's break.
        SELECT word, freq,
               CASE WHEN t.a IS NULL THEN ss
                    ELSE replace(ss, '|' || t.a || '||' || t.b || '|',
                                 '|' || t.a || t.b || '|') END AS ss
        FROM {prev} LEFT JOIN t{k} t ON TRUE
    )"""
        )
        prev = f"v{k}"
    rounds_sql = ",\n    ".join(rounds)
    chain = f"""{TOK_SQL},
    wordfreq AS (SELECT term AS word, count(*) AS freq FROM tok
                 WHERE term NOT LIKE '%|%' GROUP BY term),
    v0 AS MATERIALIZED (
        SELECT word, freq,
               '|' || array_to_string(string_split(word, ''), '||') || '|' AS ss
        FROM wordfreq
    ),
    {rounds_sql}"""
    return chain, prev


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


def _merge_fold(sym_col, a: str, b: str):
    """Column: `sym_col` with every adjacent (a, b) merged into one symbol
    a+b via a JVM-side left fold (no Python, no explode)."""
    return F.aggregate(
        sym_col,
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


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every adjacent (a, b) into one symbol a+b."""
    return vocab.select("word", "freq", _merge_fold("sym", a, b).alias("sym"))


def _bpe_core(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = N_MERGES,
    reliable: bool = False,
) -> tuple[list[tuple], DataFrame]:
    """Shared train loop: returns (merge list, FINAL merged vocab).

    Two job-count savings vs the pre-r15 form (the loop is inherently
    sequential — each arg-max depends on the previous merge — so the wall
    is round-count × per-round job cost, and the per-round jobs are what
    an optimization can cut):

    - per-round checkpoints are LAZY (``eager=False``): round k's single
      collect materializes vocab_k's blocks as part of computing the pair
      counts, instead of a separate eager materialization job per round —
      half the round-trips, identical lineage truncation;
    - the final vocab is returned so ``bpe_encode`` can reuse it: applying
      every merge in rank order to the full vocab is exactly what the
      train loop already did, so encode needs NO second corpus pass, no
      merge replay, and no per-merge checkpoints of its own.
    """
    # Tokens containing '|' are excluded from the vocab on BOTH engines: the
    # symbol output (and the oracle's delimiter encoding) use '|' as the
    # separator, so such tokens would make the representation ambiguous.
    words = (
        tokenize(spark, sf_dir)
        .where(~F.col("term").contains("|"))
        .groupBy(F.col("term").alias("word"))
        .agg(F.count("*").alias("freq"))
    )
    stager = RoundStager(reliable, eager=False)  # ≤1 staged copy on disk
    vocab = stager.stage(
        words.select("word", "freq", F.split("word", "").alias("sym"))
    )
    if os.environ.get("SPARK_GRAFT_BPE_INCREMENTAL", "") != "1":
        # DEFAULT: full per-round recount. The incremental-delta form
        # below (VERDICT r15 next-round #6) was built and A/B-measured at
        # r16: merge tables identical, but 4.1-4.4 s vs 2.2-2.6 s
        # same-process at sf0.1 — maintaining the counts relation costs an
        # extra checkpoint leaf + union/agg shuffle per round, which
        # dominates when the whole vocab fits a task. NEGATIVE RESULT at
        # bench scale; kept env-gated because the asymptotics flip at
        # corpus scale (a merge touches a vanishing vocab fraction, so
        # O(affected + distinct_pairs) per round beats re-exploding
        # O(vocab·len) pair occurrences).
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
            vocab = stager.stage(_apply_merge(vocab, a, b))
        return merges, vocab
    # SPARK_GRAFT_BPE_INCREMENTAL=1 — the corpus-scale delta form: only
    # words CONTAINING the just-merged adjacent pair change their symbol
    # sequences, so the staged pair-count relation is updated with the
    # affected words' exact integer delta (−counts before, +counts after).
    # Every maintained count equals its full-recount value by algebra
    # (freqs are positive ints; a pair whose count reaches 0 has no
    # occurrences left and is dropped so the arg-max candidacy matches
    # the recount relation exactly — pinned by
    # test_bpe_incremental_counts_path_matches).
    cstager = RoundStager(reliable, eager=False)
    counts = cstager.stage(_pair_counts(vocab))
    merges = []
    for rank in range(n_merges):
        top = counts.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((rank, a, b, a + b, int(cnt)))
        has_pair = F.exists(
            F.zip_with(
                F.slice("sym", 1, F.size("sym") - 1),
                F.slice("sym", 2, F.size("sym") - 1),
                lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
            ),
            lambda h: h,
        )

        def signed_pairs(sym_col, sign):
            return F.transform(
                F.zip_with(
                    F.slice(sym_col, 1, F.size(sym_col) - 1),
                    F.slice(sym_col, 2, F.size(sym_col) - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                ),
                lambda p: F.struct(
                    p.a.alias("a"),
                    p.b.alias("b"),
                    (sign * F.col("freq")).alias("cnt"),
                ),
            )

        # both delta sides (−pairs of the old sequence, +pairs of the
        # merged one) come out of ONE projection over the affected words,
        # so the counts-update job references the previous vocab leaf
        # exactly once — two lazy-leaf references inside one job race on
        # the unmaterialized checkpoint (the r15-measured regression on
        # dedup_minhash_est_quality's eager variant)
        delta = (
            vocab.where(has_pair)
            .select(
                F.explode(
                    F.concat(
                        signed_pairs(F.col("sym"), F.lit(-1)),
                        signed_pairs(_merge_fold("sym", a, b), F.lit(1)),
                    )
                ).alias("q")
            )
            .select("q.a", "q.b", "q.cnt")
        )
        counts = cstager.stage(
            counts.unionByName(delta)
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .where(F.col("cnt") > 0)
        )
        vocab = stager.stage(_apply_merge(vocab, a, b))
    return merges, vocab


def bpe_train(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = N_MERGES,
    reliable: bool = False,
) -> DataFrame:
    """Train `n_merges` BPE merges over the fixture corpus; returns the
    merge table (rank, left, right, merged, cnt). ``reliable=True`` stages
    each round to parquet instead of executor-local blocks (see
    `iteration.stage_round` — the executor-loss-safe cluster form)."""
    merges, _ = _bpe_core(spark, sf_dir, n_merges, reliable)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, cnt bigint"
    )


def _bpe_train_oracle() -> str:
    chain, _ = _bpe_chain_sql()
    ranks = "\n        UNION ALL ".join(
        f'SELECT {k - 1} AS rank, a AS "left", b AS "right", '
        f"a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM t{k}"
        for k in range(1, N_MERGES + 1)
    )
    return f"""
    WITH {chain}
    {ranks}
    """


@register("llm_bpe_train", oracle=_bpe_train_oracle())
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train(spark, sf_dir)


def bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Each word's BPE symbol sequence under the trained merges. The train
    loop already applied every merge in rank order to the full vocab, so
    its FINAL staged vocab IS the encoded vocab (`_bpe_core`) — the
    pre-r15 form re-ran the corpus word count and replayed all
    {N_MERGES} folds with one localCheckpoint each, recomputing what
    training had just produced. Corpus encoding downstream is a
    vocab-sized broadcast join — the corpus itself is never re-folded."""
    _, vocab = _bpe_core(spark, sf_dir, n_merges)
    return vocab.select(
        "word",
        "freq",
        F.length("word").alias("n_chars"),
        F.size("sym").alias("n_symbols"),
        F.array_join("sym", "|").alias("symbols"),
    )


def _bpe_encode_oracle() -> str:
    chain, final = _bpe_chain_sql()
    return f"""
    WITH {chain}
    SELECT word, freq,
           CAST(length(word) AS INTEGER) AS n_chars,
           CAST(len(string_split(trim(ss, '|'), '||')) AS INTEGER) AS n_symbols,
           replace(trim(ss, '|'), '||', '|') AS symbols
    FROM {final}
    """


@register("llm_bpe_encode", oracle=_bpe_encode_oracle())
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_encode(spark, sf_dir)


def _fertility_oracle() -> str:
    from ..operators.parity import sql_ratio

    chain, final = _bpe_chain_sql()
    return f"""
    WITH {chain},
    enc AS (
        SELECT word,
               CAST(len(string_split(trim(ss, '|'), '||')) AS BIGINT)
                   AS n_symbols,
               CAST(length(word) AS BIGINT) AS n_chars
        FROM {final}
    ),
    wl AS (
        SELECT d.lang, t.term AS word, CAST(count(*) AS BIGINT) AS freq
        FROM tok t JOIN documents d USING (doc_id)
        WHERE NOT contains(t.term, '|')
        GROUP BY d.lang, t.term
    )
    SELECT lang,
           CAST(sum(freq) AS BIGINT) AS n_tokens,
           CAST(sum(freq * n_symbols) AS BIGINT) AS n_bpe,
           {sql_ratio("sum(freq * n_symbols)", "sum(freq)")} AS fertility,
           {sql_ratio("sum(freq * n_chars)", "sum(freq * n_symbols)")}
               AS chars_per_symbol
    FROM wl JOIN enc USING (word)
    GROUP BY lang
    """


@register("llm_tokenizer_fertility", oracle=_fertility_oracle())
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — BPE symbols emitted per word
    occurrence (and chars per symbol, its compression dual): THE number a
    multilingual pretraining run budgets by, since a language with 2×
    fertility pays 2× the sequence length for the same text. Computed
    against this repo's own trained `llm_bpe_train` merges, so the
    metric moves when the training corpus mix does.

    Pure composition: the encoded vocab (`bpe_encode`, vocab-sized,
    merge fold replayed over symbols never the corpus) broadcast-joins
    per-(lang, word) occurrence counts; output is languages-sized. The
    corpus is scanned once for the counts — never re-folded."""
    from ..catalog import table
    from ..operators.parity import ratio

    enc = bpe_encode(spark, sf_dir).select(
        "word",
        F.col("n_symbols").cast("long").alias("n_symbols"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    wl = (
        tokenize(spark, sf_dir)
        .where(~F.col("term").contains("|"))
        .join(langs, "doc_id")
        .groupBy("lang", F.col("term").alias("word"))
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # The encoded vocab is bounded by the corpus's distinct words, so the
    # shared docs-bytes×expansion gate over-estimates it; past the gate the
    # hint drops and the join shuffles on word (VERDICT r9 item 1).
    from .dedup import _arrs_fits_broadcast

    if _arrs_fits_broadcast(spark, sf_dir):
        enc = F.broadcast(enc)
    return (
        wl.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.sum("freq").cast("long").alias("n_tokens"),
            F.sum(F.col("freq") * F.col("n_symbols"))
            .cast("long")
            .alias("n_bpe"),
            ratio(
                F.sum(F.col("freq") * F.col("n_symbols")), F.sum("freq")
            ).alias("fertility"),
            ratio(
                F.sum(F.col("freq") * F.col("n_chars")),
                F.sum(F.col("freq") * F.col("n_symbols")),
            ).alias("chars_per_symbol"),
        )
    )
