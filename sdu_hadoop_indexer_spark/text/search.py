"""Search-side operators over the inverted index (SURVEY.md §2.B-8).

The reference only *builds* the index (App.scala:186-219 assembles postings);
these queries are its consumer side — term lookup, boolean AND, positional
phrase match (the payoff for fixing reference bug B4: positions are token
ordinals, App.scala:160), and the TF-IDF/BM25 ranking that the reference's
"emit/save total document length" TODO (App.scala:168) was reaching toward.

Scale notes: every query here is a composition of the flat index (one row per
(term, doc)) with small derived dims (df table, doclen table, corpus scalars).
The df/avgdl sides are tiny → broadcast joins; the flat index never re-sorts
globally. Phrase match stays posting-local (array intersection per (doc,
term-pair) row), not positional explode, so its cost is O(matching docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.parity import ratio
from ..registry import jsonify_complex, register
from .indexer import TOK_SQL, doclen, index_flat, tokenize

# Shared DuckDB CTE: the flat positional index.
FLAT_SQL = f"""
{TOK_SQL},
flat AS (
    SELECT term, doc_id, list(pos ORDER BY pos) AS positions, count(*) AS tf
    FROM tok GROUP BY term, doc_id
)
"""

QUERY_TERMS = ("join", "hash", "scan")
PHRASE = ("fast", "join")


@register(
    "text_term_lookup",
    oracle=f"""
    WITH {FLAT_SQL}
    SELECT doc_id, to_json(positions)::VARCHAR AS positions, tf
    FROM flat WHERE term = 'join'
    """,
)
def term_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-term query → posting docs with positions (R10 consumer side).
    positions emitted as canonical JSON for the driver hash gate."""
    return jsonify_complex(
        index_flat(spark, sf_dir)
        .where(F.col("term") == "join")
        .select("doc_id", "positions", "tf")
    )


@register(
    "text_term_lookup_sharded",
    oracle=f"""
    WITH {FLAT_SQL}
    SELECT doc_id, to_json(positions)::VARCHAR AS positions, tf
    FROM flat WHERE term = 'join'
    """,
)
def term_lookup_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scatter-gather term lookup over the SHARDED index (round 12, the
    consumer side of `text_index_sharded`): the term filter selects ≤
    N_POSTING_SHARDS rows, each shard's postings explode back to per-doc
    rows, and the union IS the full posting set — same oracle as
    `text_term_lookup`, proving document-sharding costs the read path
    nothing but a small fan-in. At 100 TB with the index sunk bucketed by
    (term, shard), this is N pruned bucket reads running in parallel —
    the scatter-gather every doc-partitioned search engine serves queries
    with, and the reason the hot-term write straggler can be sharded away
    without a consumer-visible contract change (tf rebuilds as
    size(positions), so shards carry no redundant payload)."""
    from .indexer import index_sharded

    sh = index_sharded(spark, sf_dir).where(F.col("term") == "join")
    return jsonify_complex(
        sh.select(F.explode("postings").alias("p")).select(
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.positions").alias("positions"),
            F.size("p.positions").cast("long").alias("tf"),
        )
    )


@register(
    "text_bool_and",
    oracle=f"""
    WITH {FLAT_SQL}
    SELECT doc_id FROM flat
    WHERE term IN ('join', 'hash', 'scan')
    GROUP BY doc_id
    HAVING count(DISTINCT term) = 3
    """,
)
def bool_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND: docs containing every query term (postings intersection
    expressed as a grouped count over the flat index — one shuffle on doc_id,
    no pairwise joins, so it scales to long queries)."""
    return (
        index_flat(spark, sf_dir)
        .where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n_terms"))
        .where(F.col("n_terms") == len(QUERY_TERMS))
        .select("doc_id")
    )


@register(
    "text_phrase",
    oracle=f"""
    WITH {FLAT_SQL}
    SELECT a.doc_id,
           CAST(len(list_intersect(list_transform(a.positions, p -> p + 1),
                                   b.positions)) AS INTEGER) AS n_hits
    FROM flat a JOIN flat b ON a.doc_id = b.doc_id
    WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
      AND len(list_intersect(list_transform(a.positions, p -> p + 1),
              b.positions)) > 0
    """,
)
def phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query "fast join" via position adjacency (R4 payoff): a doc
    matches where some pos(t1)+1 ∈ positions(t2). Pure array intersection on
    the postings self-join — no token re-explosion."""
    flat = index_flat(spark, sf_dir)
    a = flat.where(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("positions").alias("pos_a")
    )
    b = flat.where(F.col("term") == PHRASE[1]).select(
        "doc_id", F.col("positions").alias("pos_b")
    )
    hits = F.array_intersect(
        F.transform("pos_a", lambda p: p + 1), F.col("pos_b")
    )
    return (
        a.join(b, "doc_id")
        .select("doc_id", F.size(hits).alias("n_hits"))
        .where(F.col("n_hits") > 0)
    )


@register(
    "join_self_positional",
    oracle=f"""
    WITH {FLAT_SQL}
    SELECT a.doc_id, a.tf AS tf_a, b.tf AS tf_b
    FROM flat a JOIN flat b ON a.doc_id = b.doc_id
    WHERE a.term = 'table' AND b.term = 'hash'
      AND len(list_intersect(list_transform(b.positions, p -> p - 1),
              a.positions)) > 0
    """,
)
def join_self_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-adjacency SELF-JOIN on the positional index (SURVEY §2.B-3
    `join_self_positional` — the *query side* of the reference's index,
    R10+R4): docs where "table" is immediately followed by "hash", expressed
    as an equi-join on doc_id with an `arrays_overlap` adjacency predicate.

    Differs from `text_phrase` (which counts hits via array_intersect) in
    being the join-operator demonstration: the adjacency test is a boolean
    join predicate, and both postings' tf columns survive into the output.
    Scale: the join keys on doc_id after term filters — each side is one
    term's postings, so the shuffle is tiny relative to the index."""
    flat = index_flat(spark, sf_dir)
    a = flat.where(F.col("term") == "table").select(
        "doc_id", F.col("positions").alias("pos_a"), F.col("tf").alias("tf_a")
    )
    b = flat.where(F.col("term") == "hash").select(
        "doc_id", F.col("positions").alias("pos_b"), F.col("tf").alias("tf_b")
    )
    adjacent = F.arrays_overlap(
        F.transform("pos_b", lambda p: p - 1), F.col("pos_a")
    )
    return a.join(b, "doc_id").where(adjacent).select("doc_id", "tf_a", "tf_b")


@register(
    "text_tf_idf",
    oracle=f"""
    WITH {FLAT_SQL},
    dfs AS (SELECT term, count(*) AS df FROM flat GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT f.term, f.doc_id,
           round(f.tf * ln(CAST(n.n_docs AS DOUBLE) / dfs.df), 4) + 0.0 AS tfidf
    FROM flat f JOIN dfs USING (term) CROSS JOIN n
    """,
)
def tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring (R16+R17 generalized): tf × ln(N/df).

    df table and the N scalar are broadcast; the flat index streams through
    unshuffled."""
    flat = index_flat(spark, sf_dir)
    dfs = flat.groupBy("term").agg(F.count("*").alias("df"))
    n = table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    # df is vocab-sized (corpus-growing): broadcast only under the shared
    # docs-bytes gate, else co-partitioned shuffle on term (VERDICT r9 #1)
    from ..llm.dedup import _arrs_fits_broadcast

    if _arrs_fits_broadcast(spark, sf_dir):
        dfs = F.broadcast(dfs)
    return (
        flat.join(dfs, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "doc_id",
            (
                F.round(
                    F.col("tf")
                    * F.log(F.col("n_docs").cast("double") / F.col("df")),
                    4,
                )
                + F.lit(0.0)
            ).alias("tfidf"),
        )
    )


@register(
    "text_bm25",
    oracle=f"""
    WITH {FLAT_SQL},
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                     avg(CAST(dl AS DOUBLE)) AS avgdl
              FROM dl),
    dfs AS (SELECT term, count(*) AS df FROM flat GROUP BY term),
    scored AS (
        SELECT f.doc_id,
               sum(ln(1 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
                   * f.tf * 2.2
                   / (f.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
        FROM flat f
        JOIN dfs USING (term)
        JOIN dl ON f.doc_id = dl.doc_id
        CROSS JOIN stats s
        WHERE f.term IN ('join', 'hash', 'scan')
        GROUP BY f.doc_id
    )
    SELECT doc_id, round(score, 4) + 0.0 AS bm25
    FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 (k1=1.2, b=0.75) for the 3-term query — the ranking the
    reference's doc-length TODO (App.scala:168) implies. Closed-form column
    expression; only shuffles are the index build and one groupBy(doc_id)."""
    k1, b = 1.2, 0.75
    flat = index_flat(spark, sf_dir)
    dl = doclen(spark, sf_dir)
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    # only the query terms' df rows are ever probed — filter BEFORE the
    # broadcast so the build side is query-sized (constant), not
    # vocab-sized, at any corpus scale
    dfs = (
        flat.where(F.col("term").isin(*QUERY_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        flat.where(F.col("term").isin(*QUERY_TERMS))
        .join(F.broadcast(dfs), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_part).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
        .select("doc_id", (F.round("score", 4) + F.lit(0.0)).alias("bm25"))
    )


@register(
    "text_ngrams",
    oracle=f"""
    WITH {TOK_SQL},
    nxt AS (
        SELECT doc_id, term,
               lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS next_term
        FROM tok
    )
    SELECT term || ' ' || next_term AS bigram, count(*) AS cnt
    FROM nxt WHERE next_term IS NOT NULL
    GROUP BY bigram
    """,
)
def ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram extraction + counts via a lead() window inside each doc."""
    from pyspark.sql import Window

    from .indexer import tokenize

    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        tokenize(spark, sf_dir)
        .withColumn("next_term", F.lead("term").over(w))
        .where(F.col("next_term").isNotNull())
        .groupBy(F.concat_ws(" ", "term", "next_term").alias("bigram"))
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(floor(CAST((sum(n_chars)) * 20000 + (count(*)) AS DOUBLE) / (2 * (count(*)))) AS DOUBLE) / 10000.0 AS avg_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (int sums are exact — no decimal detour)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        ratio(F.sum("n_chars"), F.count("*")).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


MIN_COOCCUR = 5


@register(
    "text_cooccur_pmi",
    oracle=f"""
    WITH {TOK_SQL},
    big AS (
        SELECT term AS w1,
               lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok
    ),
    bg AS (
        SELECT w1, w2, count(*) AS c FROM big
        WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM bg),
    lm AS (SELECT w1, sum(c) AS ca FROM bg GROUP BY w1),
    rm AS (SELECT w2, sum(c) AS cb FROM bg GROUP BY w2)
    SELECT bg.w1, bg.w2, bg.c,
           round(ln(bg.c * t.n / (lm.ca * rm.cb)), 4) + 0.0 AS pmi
    FROM bg JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot t
    WHERE bg.c >= {MIN_COOCCUR}
    ORDER BY round(ln(bg.c * t.n / (lm.ca * rm.cb)), 4) + 0.0 DESC, w1, w2
    LIMIT 50
    """,
)
def cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token pairs — collocation
    mining (the classic corpus-linguistics consumer of the positional index;
    PMI = ln(P(ab)/(P(a)P(b))) estimated from bigram counts).

    Shape at scale: ONE shuffle for the bigram counts (the lead() window is
    partition-local per doc); both marginals and the corpus total are
    vocabulary-sized aggregates of the count table → broadcast joins; the
    final top-50 is TakeOrdered on the ROUNDED pmi with (w1, w2) tie-break
    for cross-engine determinism. Min count {MIN_COOCCUR} guards the
    low-frequency PMI blowup."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tokenize(spark, sf_dir)
        .withColumn("w2", F.lead("term").over(w))
        .where(F.col("w2").isNotNull())
        .select(F.col("term").alias("w1"), "w2")
    )
    bg = big.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    tot = bg.agg(F.sum("c").cast("double").alias("n"))
    lm = bg.groupBy("w1").agg(F.sum("c").alias("ca"))
    rm = bg.groupBy("w2").agg(F.sum("c").alias("cb"))
    # + 0.0: a negative PMI rounding to zero is -0.0 in DuckDB's IEEE round
    # but +0.0 through Spark's BigDecimal round; normalize on both engines
    pmi = (
        F.round(
            F.log(F.col("c") * F.col("n") / (F.col("ca") * F.col("cb"))), 4
        )
        + F.lit(0.0)
    )
    # the marginal tables are vocab-sized (corpus-growing): broadcast only
    # under the shared docs-bytes gate, else shuffle on w1/w2
    from ..llm.dedup import _arrs_fits_broadcast

    if _arrs_fits_broadcast(spark, sf_dir):
        lm, rm = F.broadcast(lm), F.broadcast(rm)
    return (
        bg.where(F.col("c") >= MIN_COOCCUR)
        .join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


# Shared text of the four G² terms (k·ln(k·n/(r·c)), zero-guarded): the
# Spark expression below mirrors this EXACT shape term for term so both
# engines fold the same doubles in the same source order (the readability
# multi-term ROUNDED discipline).
_LLR_SQL = """
    CASE WHEN bg.c > 0 THEN bg.c * ln(bg.c * t.n / (lm.ca * rm.cb)) ELSE 0 END
    + CASE WHEN lm.ca - bg.c > 0 THEN (lm.ca - bg.c) *
        ln((lm.ca - bg.c) * t.n / (lm.ca * (t.n - rm.cb))) ELSE 0 END
    + CASE WHEN rm.cb - bg.c > 0 THEN (rm.cb - bg.c) *
        ln((rm.cb - bg.c) * t.n / ((t.n - lm.ca) * rm.cb)) ELSE 0 END
    + CASE WHEN t.n - lm.ca - rm.cb + bg.c > 0
        THEN (t.n - lm.ca - rm.cb + bg.c) *
        ln((t.n - lm.ca - rm.cb + bg.c) * t.n /
           ((t.n - lm.ca) * (t.n - rm.cb))) ELSE 0 END
"""


@register(
    "text_cooccur_llr",
    oracle=f"""
    WITH {TOK_SQL},
    big AS (
        SELECT term AS w1,
               lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok
    ),
    bg AS (
        SELECT w1, w2, count(*) AS c FROM big
        WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM bg),
    lm AS (SELECT w1, sum(c) AS ca FROM bg GROUP BY w1),
    rm AS (SELECT w2, sum(c) AS cb FROM bg GROUP BY w2)
    SELECT w1, w2, c,
           round(2 * ({_LLR_SQL}), 4) + 0.0 AS llr
    FROM bg JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot t
    WHERE bg.c >= {MIN_COOCCUR}
    ORDER BY round(2 * ({_LLR_SQL}), 4) + 0.0 DESC, w1, w2
    LIMIT 50
    """,
)
def cooccur_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood-ratio collocations (Dunning 1993, "Accurate Methods
    for the Statistics of Surprise and Coincidence" — public method): G²
    over the 2×2 bigram contingency table (k11 = c(ab), row = bigrams
    starting with a, col = bigrams ending with b). The robust companion to
    `text_cooccur_pmi`: PMI over-ranks rare pairs (its score GROWS as
    counts shrink at fixed association), while G² is χ²-distributed and
    scales with evidence — the standard collocation ranker when the
    corpus is big enough that rare-pair noise matters, i.e. at 100 TB.

    Same plan shape as PMI (one bigram-count shuffle; vocab-sized
    marginals broadcast under the shared gate; ROUNDED 4dp + 0.0 score;
    top-50 TakeOrdered with (w1, w2) tie-break). Cross-engine float
    discipline: all contingency products stay exact in double (counts ×
    n < 2^53 far beyond fixture scale), each ln argument is built with
    the identical expression shape on both engines, and the four G² terms
    fold in the same source order."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tokenize(spark, sf_dir)
        .withColumn("w2", F.lead("term").over(w))
        .where(F.col("w2").isNotNull())
        .select(F.col("term").alias("w1"), "w2")
    )
    bg = big.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    tot = bg.agg(F.sum("c").cast("double").alias("n"))
    lm = bg.groupBy("w1").agg(F.sum("c").alias("ca"))
    rm = bg.groupBy("w2").agg(F.sum("c").alias("cb"))
    c, ca, cb, n = (F.col(x) for x in ("c", "ca", "cb", "n"))

    def h(k, r, cc):
        return F.when(k > 0, k * F.log(k * n / (r * cc))).otherwise(F.lit(0))

    g2 = (
        h(c, ca, cb)
        + h(ca - c, ca, n - cb)
        + h(cb - c, n - ca, cb)
        + h(n - ca - cb + c, n - ca, n - cb)
    )
    llr = F.round(2 * g2, 4) + F.lit(0.0)
    from ..llm.dedup import _arrs_fits_broadcast

    if _arrs_fits_broadcast(spark, sf_dir):
        lm, rm = F.broadcast(lm), F.broadcast(rm)
    return (
        bg.where(F.col("c") >= MIN_COOCCUR)
        .join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c", llr.alias("llr"))
        .orderBy(F.desc("llr"), "w1", "w2")
        .limit(50)
    )


@register(
    "text_fuzzy_term_lookup",
    oracle=f"""
    WITH {TOK_SQL},
    vocab AS (
        SELECT term, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY term
    ),
    q AS (
        SELECT term AS qterm,
               substr(term, 1, 1) || substr(term, 3) AS typo
        FROM (SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rn
              FROM vocab)
        WHERE rn <= 5 AND length(qterm) >= 4
    )
    SELECT q.typo, v.term AS matched, v.df,
           levenshtein(q.typo, v.term) AS dist
    FROM q JOIN vocab v
      ON abs(length(q.typo) - length(v.term)) <= 2
     AND levenshtein(q.typo, v.term) <= 2
    """,
)
def text_fuzzy_term_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant term lookup against the index vocabulary: the 5 most
    frequent terms, each corrupted by dropping their 2nd character, are
    matched back to every vocab term within edit distance 2.

    BLOCKED fuzzy join (same shape as `dedup_fuzzy_names` and
    `join_range_banded`): each query term explodes to the 5 length bands
    its matches can inhabit (edit distance ≤ 2 bounds the length delta),
    the join is EQUI on the length key, and Levenshtein runs only inside
    blocks — never a cartesian over the vocabulary. At 100 TB the vocab
    relation is the big side and the length-band key (optionally + first
    char) is its shuffle partition. The 5 query terms come from
    `orderBy().limit(5)` — Catalyst plans TakeOrderedAndProject (per-
    partition top-5 + tiny driver merge), not the single-partition
    WindowExec a global `row_number` would force (round-2 verdict note).
    """
    vocab = (
        tokenize(spark, sf_dir)
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
    )
    q = (
        vocab.orderBy(F.desc("df"), "term")
        .limit(5)
        .select(
            F.concat(
                F.substring("term", 1, 1), F.expr("substring(term, 3)")
            ).alias("typo")
        )
        .where(F.length("typo") >= 3)
        .select(
            "typo",
            F.explode(
                F.sequence(
                    F.length("typo") - 2, F.length("typo") + 2
                )
            ).alias("blk"),
        )
    )
    v = vocab.select("term", "df", F.length("term").alias("blk"))
    return (
        q.join(v, "blk")
        .where(F.levenshtein("typo", "term") <= 2)
        .select(
            "typo",
            F.col("term").alias("matched"),
            "df",
            F.levenshtein("typo", "term").alias("dist"),
        )
    )


PROX_K = 3  # proximity window (tokens) for near-phrase search


@register(
    "text_proximity_search",
    oracle=f"""
    WITH {FLAT_SQL}
    SELECT a.doc_id,
           CAST(len(list_filter(a.positions, pa ->
                len(list_filter(b.positions, pb ->
                    abs(pa - pb) <= 3 AND pa <> pb)) > 0))
                AS INTEGER) AS n_anchor_hits
    FROM flat a JOIN flat b ON a.doc_id = b.doc_id
    WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
      AND len(list_filter(a.positions, pa ->
            len(list_filter(b.positions, pb ->
                abs(pa - pb) <= 3 AND pa <> pb)) > 0)) > 0
    """,
)
def proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROXIMITY query (`"t0 NEAR/k t1"`): docs where the two terms occur
    within K=3 tokens of each other, in either order — the relevance
    primitive between bag-of-words AND (`text_bool_and`) and strict
    adjacency (`text_phrase`). Counts anchor positions of t0 with ≥1
    near-miss t1 occurrence.

    Same postings self-join as the phrase query — the window widens only
    the ARRAY predicate (JVM lambda over the two position lists), so the
    scale shape is unchanged: one doc_id-keyed join of two term postings,
    no token re-explosion.
    """
    flat = index_flat(spark, sf_dir)
    a = flat.where(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("positions").alias("pos_a")
    )
    b = flat.where(F.col("term") == PHRASE[1]).select(
        "doc_id", F.col("positions").alias("pos_b")
    )
    near = F.filter(
        "pos_a",
        lambda pa: F.exists(
            "pos_b",
            lambda pb: (F.abs(pa - pb) <= PROX_K) & (pa != pb),
        ),
    )
    return (
        a.join(b, "doc_id")
        .select("doc_id", F.size(near).alias("n_anchor_hits"))
        .where(F.col("n_anchor_hits") > 0)
    )


SNIPPET_RADIUS = 2  # tokens of context either side of the hit


@register(
    "text_snippet",
    oracle=f"""
    WITH {{tok}},
    hit AS (
        SELECT doc_id, CAST(min(pos) AS INTEGER) AS p
        FROM tok WHERE term = 'join' GROUP BY doc_id
    )
    SELECT t.doc_id, h.p AS first_pos,
           string_agg(t.term, ' ' ORDER BY t.pos) AS snippet
    FROM tok t JOIN hit h
      ON t.doc_id = h.doc_id
     AND t.pos BETWEEN h.p - {SNIPPET_RADIUS} AND h.p + {SNIPPET_RADIUS}
    GROUP BY t.doc_id, h.p
    """.format(tok=TOK_SQL.strip()),
)
def text_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-hit snippet: ±{SNIPPET_RADIUS} tokens of context around the
    FIRST occurrence of the query term per matching document — the result
    surface a search UI renders under each hit (the consumer the
    reference's positional postings exist to serve, `App.scala:154-166`:
    positions are stored precisely so hits can be located in context).

    Built from the token RELATION, not by indexing a re-split array:
    `tokenize` ordinals count empty split slots, so positional array
    indexing would drift on multi-space documents — joining tok on a pos
    range is immune by construction and is also the scale shape (the
    context join touches ~(2r+1) rows per hit, never re-scans text).

    Ordered aggregation: Spark array_sort(collect_list(struct)) — the
    `agg_collect_sorted` discipline — mirrors DuckDB's
    `string_agg(... ORDER BY pos)` exactly."""
    toks = tokenize(spark, sf_dir)
    hit = (
        toks.where(F.col("term") == "join")
        .groupBy("doc_id")
        .agg(F.min("pos").cast("int").alias("p"))
    )
    ctx = toks.join(hit, "doc_id").where(
        (F.col("pos") >= F.col("p") - SNIPPET_RADIUS)
        & (F.col("pos") <= F.col("p") + SNIPPET_RADIUS)
    )
    return ctx.groupBy("doc_id", F.col("p").alias("first_pos")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s.term,
            ),
            " ",
        ).alias("snippet")
    )

