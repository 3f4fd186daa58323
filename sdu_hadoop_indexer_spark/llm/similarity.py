"""Similarity search over embeddings (SURVEY.md §2.B-10).

`embeddings(vec_id, embedding array<float>[64], label)` drives: pairwise
cosine, brute-force top-k ANN (the correctness baseline), an LSH-bucketed
top-k (the scale path), per-label centroids, and nearest-pair mining.

All dot products are JVM-side column expressions (`zip_with` + `aggregate`),
accumulated in float64 — no Python in the hot path.

Scale notes (100 TB): brute-force top-k is O(|Q|·N) per query batch — correct
but linear; it broadcasts the query set so the big side never shuffles, and
the per-partition row_number window prunes to k before the final exchange
(TakeOrdered semantics via rn filter). The LSH variant (`sim_topk_lsh`)
buckets vectors by random-hyperplane signs so each query only scans its
bucket — the IVF-style path you'd deploy, with recall measured against
brute force in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import spread, table
from ..operators.parity import ratio
from ..registry import register
from ..session import app_sink_dir
from ..xhash import A as XH_A
from ..xhash import B as XH_B
from ..xhash import XH_P, extended_planes

N_QUERIES = 5  # query set = vec_id < 5
TOP_K = 5


def _dot(a: str | Column, b: str | Column) -> Column:
    """float64 dot product of two float32 array columns (JVM-side)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _norm(col: str | Column) -> Column:
    """L2 norm — hoisted to a per-ROW column before any pairwise join so the
    O(pairs) stage does one dot product, not three (norms are O(rows))."""
    return F.sqrt(_dot(col, col))


def _cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    return _dot(a, b) / (na * nb)


# DuckDB twin: parallel-unnest zips the two lists; sums accumulate in double.
# (list_cosine_similarity exists but computes in float32 — diverges at 4dp.)
# `+ 0.0`: a negative cosine rounding to zero is -0.0 in DuckDB's IEEE round
# but +0.0 through Spark's BigDecimal round — normalized on both sides.
_COS_SQL = """
    SELECT va, vb,
           round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4) + 0.0
               AS cosine
    FROM (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(unnest(a.embedding) AS DOUBLE) AS x,
               CAST(unnest(b.embedding) AS DOUBLE) AS y
        FROM embeddings a JOIN embeddings b ON {pair_pred}
    )
    GROUP BY va, vb
"""


@register(
    "sim_cosine_pair",
    oracle=_COS_SQL.format(pair_pred="b.vec_id = a.vec_id + 1"),
)
def sim_cosine_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity between consecutive vec_ids (linear pair set)."""
    e = table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vb") == F.col("va") + 1)
        .select(
            "va",
            "vb",
            (F.round(_cosine("ea", "eb"), 4) + F.lit(0.0)).alias("cosine"),
        )
    )


@register(
    "sim_topk_search",
    oracle=f"""
    WITH cos AS (
        {_COS_SQL.format(pair_pred=f"a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}")}
    ),
    unrounded AS (
        SELECT va AS query_id, vb AS neighbor_id, cosine,
               row_number() OVER (PARTITION BY va ORDER BY cosine DESC, vb) AS rn
        FROM cos
    )
    SELECT query_id, neighbor_id, cosine, rn FROM unrounded WHERE rn <= {TOP_K}
    """,
)
def sim_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast query set × candidate scan.

    NOTE the oracle ranks on the ROUNDED cosine (4dp) with vec_id tie-break —
    ranking on raw doubles would be vulnerable to sub-4dp cross-engine drift.
    Spark side rounds before the window too, keeping both deterministic.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm("embedding").alias("qn"),
    )
    # candidate leg off the spread source (guide §2.5): the N_QUERIES×
    # interpreted cosine folds otherwise fuse into the one scan task
    c = _emb_spread(spark, sf_dir).where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm("embedding").alias("cn"),
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


N_PLANES = 8  # LSH: 8 random hyperplanes → 256 buckets


def _plane_sign_flips(i: int, x: Column, d: Column) -> Column:
    """±x for hyperplane i at (0-based) dim d — parity of the i-th xhash
    family member applied to the dim index (cross-engine arithmetic, so
    DuckDB rebuilds the identical plane pattern)."""
    parity = (
        F.lit(XH_A[i]).cast("long") * (d.cast("long") + 1) + XH_B[i]
    ) % F.lit(XH_P) % 2
    return F.when(parity == 1, x.cast("double")).otherwise(-x.cast("double"))


def _lsh_bucket(col: str | Column, start: int = 0, n: int = N_PLANES) -> Column:
    """Random-hyperplane LSH bucket id for a float32 vector column, over
    family planes ``start .. start+n-1``.

    Hyperplane i = deterministic pseudo-random ±1 pattern from the xhash
    family parity over the dim index: sign bit of sum over dims of
    (±1 · x_d). All JVM-side; DuckDB folds the same signed sum in the same
    order, so bucket ids match bit-for-bit (enabling the EXACT oracle).
    """
    def _flipper(i: int):
        return lambda x, d: _plane_sign_flips(i, x, d)

    bits = []
    for j, i in enumerate(range(start, start + n)):
        signed = F.transform(col, _flipper(i))
        proj = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj > 0, F.lit(2 ** j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _lsh_bucket_sql(col: str, start: int = 0, n: int = N_PLANES) -> str:
    """DuckDB twin of :func:`_lsh_bucket` (1-based lambda index == d+1)."""
    bits = []
    for j, i in enumerate(range(start, start + n)):
        signed = (
            f"list_transform({col}, (x, i) -> CASE WHEN "
            f"({XH_A[i]}::BIGINT * i + {XH_B[i]}) % {XH_P} % 2 = 1 "
            f"THEN CAST(x AS DOUBLE) ELSE -CAST(x AS DOUBLE) END)"
        )
        proj = f"list_reduce(list_prepend(0.0::DOUBLE, {signed}), (a, b) -> a + b)"
        bits.append(f"(CASE WHEN {proj} > 0 THEN {2 ** j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS INTEGER)"


@register(
    "sim_topk_lsh",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    pairs AS (
        SELECT q.vec_id AS va, c.vec_id AS vb,
               q.embedding AS ea, c.embedding AS eb
        FROM b q JOIN b c ON q.bucket = c.bucket
        WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    ),
    cos AS (
        SELECT va, vb,
               round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
                   + 0.0 AS cosine
        FROM (
            SELECT va, vb, CAST(unnest(ea) AS DOUBLE) AS x,
                   CAST(unnest(eb) AS DOUBLE) AS y
            FROM pairs
        )
        GROUP BY va, vb
    ),
    ranked AS (
        SELECT va AS query_id, vb AS neighbor_id, cosine,
               row_number() OVER (PARTITION BY va
                                  ORDER BY cosine DESC, vb) AS rn
        FROM cos
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {TOP_K}
    """,
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k (scale path): queries only scan same-bucket
    candidates. EXACT oracle (round 3): bucket ids are cross-engine xhash
    parity planes, so DuckDB reproduces the identical candidate sets; recall
    vs brute force additionally asserted in tests (same-bucket probability
    rises with cosine)."""
    e = table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _lsh_bucket("embedding")
    )
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm("embedding").alias("qn"),
        "bucket",
    )
    # candidate leg off the spread source: the plane projections + cosine
    # folds are per-row HOFs that otherwise run on the one scan task
    c = _emb_spread(spark, sf_dir).withColumn(
        "bucket", _lsh_bucket("embedding")
    ).where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm("embedding").alias("cn"),
        "bucket",
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    scored = F.broadcast(q).join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


N_CELLS = 8  # IVF coarse-quantizer cells
N_PROBE = 2  # cells probed per query
KMEANS_ITERS = 2
IVF_SCALE = 10_000  # embedding dims quantized to integer ten-thousandths
# Deterministic BOUNDED training sample for the IVF/PQ Lloyd loops: the
# TRAIN_CAP vectors with the lowest salted-md5 digests (vec_id tiebreak) —
# a uniform fixed-SIZE random sample that is a pure function of the id set,
# so both engines materialize the identical sample at any corpus size. At
# 100× nobody Lloyd-iterates the full corpus: the faiss discipline is to
# train the coarse quantizer / codebooks on a capped sample at the driver
# and ship the k×dim integer table as the staged model artifact. A capped
# sample (unlike a fraction) keeps the driver collect BOUNDED at any scale,
# and ORDER BY digest LIMIT k is replayable in the oracle where a row-count
# LIMIT without the digest order would not be. Assignment/probing of the
# FULL corpus is unchanged.
TRAIN_SALT = "ivf-train-v1|"
TRAIN_CAP = 512


def _train_sample_ids_sql() -> str:
    """Oracle-side id set of the training sample (DuckDB md5 emits the
    same lowercase hex Spark's does, so the digest order is identical)."""
    return (
        f"SELECT vec_id FROM embeddings "
        f"ORDER BY md5('{TRAIN_SALT}' || CAST(vec_id AS VARCHAR)), vec_id "
        f"LIMIT {TRAIN_CAP}"
    )


def _emb_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings spread off the single-row-group scan (guide §2.5): the
    shared source for CANDIDATE legs whose per-row scoring work —
    interpreted 64-dim cosine/assignment folds, LSH plane projections,
    query-set fan-outs — would otherwise fuse into the one scan task.
    Query legs (N_QUERIES rows, usually broadcast) keep reading the plain
    table; only corpus-sized expression work belongs above this."""
    return spread(
        spark,
        table(spark, sf_dir, "embeddings"),
        "vec_id",
        table_name="embeddings",
        sf_dir=sf_dir,
    )


def _train_digest() -> Column:
    """Spark twin of the sample's salted digest sort key."""
    return F.md5(
        F.concat(F.lit(TRAIN_SALT), F.col("vec_id").cast("string"))
    )


def _round_half_away(mean):
    """Round-half-away-from-zero on a float64 array — the rule Spark's
    round() and DuckDB's round() share (numpy's own round is banker's)."""
    import numpy as np

    return (np.sign(mean) * np.floor(np.abs(mean) + 0.5)).astype(np.int64)


def _ivf_qvec(col: str | Column) -> Column:
    """Quantize a float32 vector to integer ten-thousandths — the exactness
    foundation of the whole IVF path: float32→double casts are exact, the
    ×IVF_SCALE product is one deterministic IEEE op, and round() is
    half-away-from-zero on BOTH engines (the udfs.py v4 precedent), so the
    integer lattice is engine-identical."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * IVF_SCALE, 0).cast("long")
    )


def _ivf_dist2_arr(qv_col: Column, cents: list[list[int]]) -> Column:
    """array<long> of squared L2 distances to every integer centroid —
    PURE int64 arithmetic (|q−m| ≤ ~6e4 per dim → Σ over 64 dims ≤
    ~2e11), so each sum is order-independent and the argmin below cannot
    drift across engines.

    The centroid table ships as ONE nested-array literal + a transform
    loop rather than N_CELLS separately-built fold expressions: the
    unrolled form put ~N_CELLS×dims literal nodes in the tree and driver-
    side analysis/codegen of it dominated the whole operator (15 s of an
    18 s sf0.1 run — constant in data, but real at bench scale)."""
    carr = F.lit([[int(v) for v in m] for m in cents])
    return F.transform(
        carr,
        lambda m: F.aggregate(
            F.zip_with(qv_col, m, lambda q, c: (q - c) * (q - c)),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )


def _ivf_assign(qv_col: Column, cents: list[list[int]]) -> Column:
    """Nearest-centroid cell id, ties → smallest cell index (identical to
    the oracle's `ORDER BY dist2, cell` rank-1; array_position returns the
    FIRST occurrence of the min)."""
    dists = _ivf_dist2_arr(qv_col, cents)
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _ivf_assign_np(e: DataFrame, cents: list[list[int]]) -> DataFrame:
    """(vec_id, cell) via Arrow-batched numpy instead of the Catalyst
    transform/aggregate expression tree. Semantics are IDENTICAL to
    `_ivf_assign` on the same integer lattice: quantization is
    round-half-away of float64(x)·IVF_SCALE (the exact F.round HALF_UP
    twin), d2 = |q|²+|m|²−2q·m in exact int64 (products ≤ 4e8, 64-dim
    sums ≤ 2.6e10), argmin = first-min = the oracle's ORDER BY d2, cell.

    Why it exists: assignment cost is N·k·d. At the default k=8 the
    expression tree is fine; on the k ∝ N path (SemDeDup auto-cells,
    k = N/SEMANTIC_TARGET_CELL) an interpreted per-row fold over k
    centroids would make ASSIGNMENT the quadratic stage the auto mode
    exists to remove — one BLAS matmul per Arrow batch keeps it at
    memory-bandwidth speed (this is precisely the stage faiss hands to
    GPU at LAION scale). Centroids ride into the closure as a k×d int64
    ndarray — the broadcast model artifact.

    Rounding caveat (ADVICE r12): quantization here is binary
    floor(|v|·SCALE + 0.5) in float64, while the expression/oracle path
    rounds the decimal repr (F.round / DuckDB round are decimal HALF_UP on
    the double's shortest repr) — for a product within 1 ulp of an exact
    half boundary the two rules can in principle disagree by one lattice
    step, the same caveat documented for `drop_ids`' np.round. Measure-zero
    on real-valued embeddings; `test_ivf_assign_np_matches_expression_path`
    pins equality on the fixtures, and the DuckDB gate on the registered
    auto-cells rows is the standing cross-engine check."""
    import numpy as np

    cmat = np.array(cents, dtype=np.int64)
    cc = (cmat * cmat).sum(axis=1)

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            v = np.array(list(pdf["embedding"]), dtype=np.float64) * IVF_SCALE
            q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            d2 = (q * q).sum(axis=1)[:, None] + cc[None, :] - 2 * (q @ cmat.T)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": d2.argmin(axis=1).astype(np.int32),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id bigint, cell int"
    )


def _ivf_probe_np(e: DataFrame, cents: list[list[int]], n_probe: int) -> DataFrame:
    """(vec_id, cell, rk) for each vector's ``n_probe`` nearest centroids —
    `_ivf_assign_np`'s BLAS recipe extended from argmin to a rank list.
    Tie rule matches the oracle's ``ORDER BY d2, cell`` exactly: a STABLE
    argsort over the int64 d2 row ranks equal distances by cell index
    (first-min generalized to first-k). rk is 1-based; rk = 1 is the home
    cell, identical to `_ivf_assign_np`'s verdict. Same ulp rounding
    caveat as `_ivf_assign_np` (documented there)."""
    import numpy as np

    cmat = np.array(cents, dtype=np.int64)
    cc = (cmat * cmat).sum(axis=1)
    p = min(n_probe, len(cents))

    def probe(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            v = np.array(list(pdf["embedding"]), dtype=np.float64) * IVF_SCALE
            q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            d2 = (q * q).sum(axis=1)[:, None] + cc[None, :] - 2 * (q @ cmat.T)
            order = np.argsort(d2, axis=1, kind="stable")[:, :p]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), p),
                    "cell": order.astype(np.int32).ravel(),
                    "rk": np.tile(np.arange(1, p + 1, dtype=np.int32), n),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(
        probe, "vec_id bigint, cell int, rk int"
    )


_IVF_CENT_CACHE: dict[tuple[str, str, int], list[list[int]]] = {}

# Training-sample rows per centroid when n_cells exceeds the default: the
# faiss discipline trains k centroids on a sample PROPORTIONAL to k (its
# own warning floor is ~39 points/centroid; 16 is enough for a coarse
# quantizer whose only job is blocking, and keeps the bounded driver
# collect at k×16 rows — 16 MB even at k = 10 000).
TRAIN_PER_CELL = 16


def _train_ivf_centroids(
    spark: SparkSession, sf_dir: str, n_cells: int = N_CELLS
) -> list[list[int]]:
    """Lattice k-means, KMEANS_ITERS Lloyd rounds, fully deterministic:
    init = the first N_CELLS quantized vectors; assignment = integer-L2
    argmin (ties → lowest cell); the new centroid is RE-QUANTIZED to the
    integer grid (round-half-away of Σq/n — double division of exact
    integers, same rounding rule both engines). Keeping centroids ON the
    lattice is what removes every float-accumulation-order hazard — the
    DuckDB oracle replays the identical rounds as unrolled MATERIALIZED
    CTEs (the BPE/CC pattern), restricted to the same sample (`qs` CTE).

    SAMPLE-TRAINED AT THE DRIVER (round 7): the Lloyd rounds run in numpy
    over the deterministic TRAIN_CAP-vector sample — the faiss discipline
    (train the coarse quantizer on a bounded sample, ship the k×dim
    integer table as the staged model artifact). Two bounded collects
    (N_CELLS init rows + TRAIN_CAP sample rows, each ≤ a few hundred KB at
    ANY corpus size) replace KMEANS_ITERS× (join + two hash-aggs +
    collect) distributed rounds whose cost was per-round JOB LATENCY, not
    data. numpy arithmetic is exactly the engines': int64 d2 via
    |x|²+|m|²−2x·m (products ≤ 4e8, 64-dim sums ≤ 2.6e10 — exact),
    np.argmin = first-min = the oracle's ORDER BY d2, cell rank-1,
    float64 mean division = the same IEEE op, `_round_half_away` = both
    engines' round(). Cached per (app, sf_dir, n_cells) like the PQ
    codebooks.

    ``n_cells`` beyond the default N_CELLS (the SemDeDup k ∝ N path,
    VERDICT r11 item 5): the training sample grows to TRAIN_PER_CELL ×
    n_cells rows (faiss trains k centroids on a k-proportional sample —
    still a bounded driver collect, k×16 rows at any corpus size) and
    init = the first n_cells sample vectors in digest order (uniform
    deterministic seed with no density assumption on vec_id; the default
    path keeps its original `vec_id < N_CELLS` init for oracle parity —
    the unrolled Lloyd CTEs replay exactly that)."""
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir, n_cells)
    cached = _IVF_CENT_CACHE.get(key)
    if cached is not None:
        return cached
    for k in list(_IVF_CENT_CACHE):
        if k[0] != key[0]:
            del _IVF_CENT_CACHE[k]
    e = table(spark, sf_dir, "embeddings")
    qv = e.select("vec_id", _ivf_qvec("embedding").alias("qv"))
    cap = (
        TRAIN_CAP
        if n_cells <= N_CELLS
        else max(TRAIN_CAP, TRAIN_PER_CELL * n_cells)
    )
    sample = qv.orderBy(_train_digest(), "vec_id").limit(cap).collect()
    x = np.array([list(r.qv) for r in sample], dtype=np.int64)
    if n_cells == N_CELLS:
        init = qv.where(F.col("vec_id") < N_CELLS).orderBy("vec_id").collect()
        cents = np.array([list(r.qv) for r in init], dtype=np.int64)
    else:
        cents = x[: min(n_cells, len(x))].copy()
    for _ in range(KMEANS_ITERS):
        d2 = (
            (x * x).sum(axis=1)[:, None]
            + (cents * cents).sum(axis=1)[None, :]
            - 2 * (x @ cents.T)
        )
        a = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(len(cents)):
            members = x[a == c]
            if len(members):
                mean = members.sum(axis=0, dtype=np.int64) / np.float64(
                    len(members)
                )
                new[c] = _round_half_away(mean)
        cents = new
    result = [[int(v) for v in row] for row in cents]
    _IVF_CENT_CACHE[key] = result
    return result


def _lloyd_round_ctes(parts: list[str], prev: str) -> str:
    """Append the KMEANS_ITERS unrolled Lloyd-round CTEs (assign → integer
    mean re-rounded to the grid → empty cells carry forward) iterating the
    `qs` training-sample CTE, starting from centroid CTE `prev`. Returns
    the name of the final centroid CTE. Shared verbatim by the fixed-k
    (`_ivf_train_parts`) and k ∝ N (`_ivf_train_parts_auto`) oracle
    prefixes — the round text is identical; only seed/sample CTEs differ,
    because k is DATA to these rounds, not structure."""
    for k in range(1, KMEANS_ITERS + 1):
        parts.append(
            f""",
    a{k} AS MATERIALIZED (
        SELECT vec_id, cell FROM (
            SELECT qv.vec_id, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell) AS rk
            FROM qs qv JOIN {prev} c USING (dim)
            GROUP BY qv.vec_id, c.cell
        ) WHERE rk = 1
    ),
    cm{k} AS MATERIALIZED (
        SELECT a.cell, qv.dim,
               CAST(round(CAST(sum(qv.q) AS DOUBLE) / count(*)) AS BIGINT) AS m
        FROM a{k} a JOIN qs qv USING (vec_id)
        GROUP BY a.cell, qv.dim
    ),
    c{k} AS MATERIALIZED (
        SELECT * FROM cm{k}
        UNION ALL
        SELECT p.cell, p.dim, p.m FROM {prev} p
        WHERE p.cell NOT IN (SELECT DISTINCT cell FROM cm{k})
    )"""
        )
        prev = f"c{k}"
    return prev


def _ivf_train_parts() -> tuple[list[str], str]:
    """Shared CTE prefix of the IVF oracles (`sim_topk_ivf`,
    `sim_ivf_cell_stats`): quantize → KMEANS_ITERS unrolled Lloyd rounds
    (integer sums; centroids re-rounded to the grid; empty cells carry
    forward). Returns (CTE text parts, name of the final centroid CTE)."""
    parts = [
        f"""
    WITH qv AS MATERIALIZED (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
               CAST(round(CAST(v AS DOUBLE) * {IVF_SCALE}) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM embeddings)
    ),
    c0 AS (SELECT vec_id AS cell, dim, q AS m FROM qv WHERE vec_id < {N_CELLS}),
    -- the deterministic TRAIN_CAP-vector training sample (lowest salted
    -- digests — the Spark trainer's exact twin): Lloyd rounds iterate qs,
    -- final assignment/probing still scans qv
    qs AS MATERIALIZED (
        SELECT * FROM qv WHERE vec_id IN ({_train_sample_ids_sql()}))"""
    ]
    prev = _lloyd_round_ctes(parts, "c0")
    return parts, prev


def _ivf_train_parts_auto(target_cell: int) -> tuple[list[str], str]:
    """DuckDB twin of `_train_ivf_centroids(n_cells=semantic_auto_cells(N))`
    — the k ∝ N SemDeDup coarse quantizer (VERDICT r12 item 1). k is a
    VALUE here, not CTE structure, so the same unrolled Lloyd rounds replay
    at any corpus size:

    * ``nk``: k = max(N_CELLS, ceil(N / target_cell)) via exact integer
      arithmetic ((N + t − 1) // t — DuckDB `//` is integer division), the
      `semantic_auto_cells` rule; cap = max(TRAIN_CAP, TRAIN_PER_CELL·k),
      the trainer's k-proportional sample bound (the `n_cells <= N_CELLS`
      branch collapses to the same value: max(512, 16·8) = 512).
    * ``srk``: every vec_id ranked by the salted-digest sample order —
      `_train_sample_ids_sql`'s ORDER BY as a row_number so both the
      sample membership (rk ≤ cap) and the seed slice (rk ≤ k) read it.
    * ``c0``: the trainer's init branch, replayed exactly — k > N_CELLS
      seeds from the FIRST k sample vectors in digest order
      (`cents = x[:k]`), k == N_CELLS keeps the fixed-k path's
      `vec_id < N_CELLS` init (the trainer's `n_cells == N_CELLS` branch,
      hit on corpora small enough that ceil(N/target) ≤ N_CELLS — e.g.
      the 500-vector gate fixtures). The two arms are disjoint on the
      scalar k, so the UNION ALL is a CASE, not a double-seed.

    Returns (CTE text parts, final centroid CTE name) like
    `_ivf_train_parts`; the Lloyd rounds are the shared
    `_lloyd_round_ctes` text."""
    parts = [
        f"""
    WITH qv AS MATERIALIZED (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
               CAST(round(CAST(v AS DOUBLE) * {IVF_SCALE}) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM embeddings)
    ),
    nk AS MATERIALIZED (
        SELECT greatest({N_CELLS},
                        (count(*) + {target_cell} - 1) // {target_cell}) AS k,
               greatest({TRAIN_CAP},
                        {TRAIN_PER_CELL} * greatest({N_CELLS},
                            (count(*) + {target_cell} - 1) // {target_cell}))
                   AS cap
        FROM embeddings
    ),
    srk AS MATERIALIZED (
        SELECT vec_id,
               row_number() OVER (
                   ORDER BY md5('{TRAIN_SALT}' || CAST(vec_id AS VARCHAR)),
                            vec_id) AS rk
        FROM embeddings
    ),
    qs AS MATERIALIZED (
        SELECT qv.vec_id, qv.dim, qv.q, s.rk
        FROM qv JOIN srk s USING (vec_id)
        WHERE s.rk <= (SELECT cap FROM nk)
    ),
    c0 AS (
        SELECT CAST(rk - 1 AS BIGINT) AS cell, dim, q AS m
        FROM qs
        WHERE rk <= (SELECT k FROM nk) AND (SELECT k FROM nk) > {N_CELLS}
        UNION ALL
        SELECT vec_id AS cell, dim, q AS m
        FROM qv
        WHERE vec_id < {N_CELLS} AND (SELECT k FROM nk) = {N_CELLS}
    )"""
    ]
    prev = _lloyd_round_ctes(parts, "c0")
    return parts, prev


def _ivf_cos_prefix() -> str:
    """Shared prefix of the IVF retrieval oracles: trained centroids →
    per-query probe ranking + per-candidate home cell → rounded cosine of
    every probed (query, candidate) pair (CTE `cos`). `_ivf_oracle` ranks
    it into top-k; `_range_ivf_oracle` filters it at RANGE_TAU — same
    candidate generation, the two retrieval contracts."""
    parts, prev = _ivf_train_parts()
    parts = list(parts)
    parts.append(
        f""",
    probes AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT qv.vec_id, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell) AS rk
            FROM qv JOIN {prev} c USING (dim)
            WHERE qv.vec_id < {N_QUERIES}
            GROUP BY qv.vec_id, c.cell
        ) WHERE rk <= {N_PROBE}
    ),
    cand AS (
        SELECT vec_id AS neighbor_id, cell FROM (
            SELECT qv.vec_id, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell) AS rk
            FROM qv JOIN {prev} c USING (dim)
            WHERE qv.vec_id >= {N_QUERIES}
            GROUP BY qv.vec_id, c.cell
        ) WHERE rk = 1
    ),
    pairs AS (
        SELECT p.query_id AS va, a.neighbor_id AS vb,
               ea.embedding AS ea, eb.embedding AS eb
        FROM probes p
        JOIN cand a USING (cell)
        JOIN embeddings ea ON ea.vec_id = p.query_id
        JOIN embeddings eb ON eb.vec_id = a.neighbor_id
    ),
    cos AS (
        SELECT va, vb,
               round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
                   + 0.0 AS cosine
        FROM (
            SELECT va, vb, CAST(unnest(ea) AS DOUBLE) AS x,
                   CAST(unnest(eb) AS DOUBLE) AS y
            FROM pairs
        )
        GROUP BY va, vb
    )"""
    )
    return "".join(parts)


def _ivf_oracle() -> str:
    """DuckDB twin of the whole IVF pipeline: the shared probed-pair cosine
    prefix ranked into top-k (the sim_topk_lsh scoring shape)."""
    return (
        _ivf_cos_prefix()
        + f""",
    ranked AS (
        SELECT va AS query_id, vb AS neighbor_id, cosine,
               row_number() OVER (PARTITION BY va
                                  ORDER BY cosine DESC, vb) AS rn
        FROM cos
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {TOP_K}"""
    )


@register("sim_topk_ivf", oracle=_ivf_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-k (the other scale path next to `sim_topk_lsh`):
    a lattice-k-means coarse quantizer partitions vectors into N_CELLS
    inverted lists; each query probes its N_PROBE nearest cells and scans
    only those lists. At deployment scale the lists are the table's
    partition/bucket layout, so a probe is a partition-pruned scan; recall
    properties vs brute force are asserted in tests.

    EXACT-oracled since round 4: the quantizer runs on an integer lattice
    (quantized vectors, integer L2 distances, centroids re-rounded to the
    grid each round — see `_train_ivf_centroids`), so there is no float
    accumulation anywhere in training or assignment and DuckDB replays the
    identical rounds as unrolled MATERIALIZED CTEs. Only the final cosine
    SCORING is float, and it reuses the proven `sim_topk_lsh` rounded form.
    """
    cents = _train_ivf_centroids(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    qv = _ivf_qvec("embedding")
    # candidate leg off the spread source (guide §2.5): per-row centroid
    # assignment + the probe-join scoring folds otherwise fuse into the
    # one scan task
    cand = _emb_spread(spark, sf_dir).where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm("embedding").alias("cn"),
        _ivf_assign(qv, cents).alias("cell"),
    )
    # probe list: N_PROBE nearest cells per query (integer dist2, cell ties)
    q_dists = _ivf_dist2_arr(qv, cents)
    probes = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            _norm("embedding").alias("qn"),
            F.posexplode(q_dists).alias("cell", "d2"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d2", "cell")
            ),
        )
        .where(F.col("rk") <= N_PROBE)
        .select("query_id", "qe", "qn", "cell")
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    scored = F.broadcast(probes).join(cand, "cell").select(
        "query_id",
        "neighbor_id",
        (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


@register(
    "sim_label_centroid",
    oracle="""
    SELECT label, CAST(dim AS INTEGER) AS dim,
           round(avg(CAST(v AS DOUBLE)), 4) + 0.0 AS centroid,
           count(*) AS n_vecs
    FROM (
        SELECT label,
               unnest(range(len(embedding))) AS dim,
               unnest(embedding) AS v
        FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def sim_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dim) — posexplode + grouped avg
    (partial-aggregated map-side; never collects vectors to the driver)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            # + 0.0 is LIVE load-bearing here: negative embedding dims make
            # tiny negative centroids that round to -0.0 in DuckDB (found by
            # the schema_audit -0.0 probe at sf0.001) while Spark's
            # BigDecimal round emits +0.0
            (F.round(F.avg(F.col("v").cast("double")), 4) + F.lit(0.0)).alias(
                "centroid"
            ),
            F.count("*").alias("n_vecs"),
        )
    )


# Per-group memory is dominated by the b×b similarity matrix, not the input
# vectors: 4096² × 8 B ≈ 134 MB (+ comparable index arrays) — bounded per
# task regardless of corpus size.
ROWS_PER_BLOCK = 4096


# One cached blocked-pair relation per (app, sf_dir): the replication join is
# rebuilt identically by EVERY all-pairs consumer (sim_nearest_pairs,
# dedup_embedding_cosine, each bench repetition), so it is the canonical
# reuse-a-partitioning artifact — persist once, evict stale entries so the
# long-lived gate/bench session never accumulates caches (round-2 ADVICE).
_BLOCKED_CACHE: dict[tuple[str, str], DataFrame] = {}


def blocked_pair_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate embeddings into block-pair groups for distributed all-pairs.

    The memory-safe all-pairs harness (round-1 verdict fix — NOTHING is
    collected to the driver): vectors are hashed into
    B = ceil(N/ROWS_PER_BLOCK) blocks, a tiny broadcast block-pair map
    replicates each vector to its (bi ≤ bj) pair groups tagged L/R, and a
    `groupBy("pair_id").applyInPandas(...)` downstream sees exactly two
    blocks per group — executor memory bounded regardless of N. Diagonal
    groups (bi == bj, `same` column) must keep only the strict upper
    triangle by id; off-diagonal groups hold disjoint blocks so every cross
    pair is unique. N comes from the parquet footer (pure metadata — what a
    catalog serves at scale), falling back to a count job.

    The result is persisted and memoized per (application, sf_dir) — the
    round-2 verdict's stabilization item: the B-fold replicated relation is
    (replication × embeddings)-sized, bounded, and shared by every
    downstream all-pairs operator, exactly what an engine would pin as a
    build-side artifact. Stale entries (other sf_dir / dead session) are
    unpersisted on entry (caching.memoized_persist)."""
    from ..caching import memoized_persist

    return memoized_persist(
        _BLOCKED_CACHE, spark, sf_dir, lambda: _build_blocked_pair_groups(spark, sf_dir)
    )


def _build_blocked_pair_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    try:
        import pyarrow.parquet as pq

        n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    except Exception:
        n = e.count()
    # Memory bound first; floor of up-to-8 blocks so mid-size corpora still
    # parallelize across the cluster. Below ~2 blocks of work the group
    # overhead (shuffle + Arrow worker per group) exceeds the matmul, so
    # tiny corpora run as one group.
    n_blocks = max(1, -(-n // ROWS_PER_BLOCK), min(8, n // 2048))
    pair_ids = [
        (pid, i, j)
        for pid, (i, j) in enumerate(
            (i, j) for i in range(n_blocks) for j in range(i, n_blocks)
        )
    ]
    # One combined (blk, pair_id, side, same) map — a single broadcast join
    # replicates each vector to every group it belongs to on either side,
    # instead of scanning + joining the embeddings relation once per side.
    side_map = spark.createDataFrame(
        [(p, i, "L", i == j) for p, i, j in pair_ids]
        + [(p, j, "R", i == j) for p, i, j in pair_ids],
        "pair_id int, blk int, side string, same boolean",
    )
    eb = e.withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    )
    return eb.join(F.broadcast(side_map), "blk")


def _group_pair_cosines(pdf, min_cos=None, topk=None):
    """One block-pair group → (va, vb, cosine rounded 4dp) numpy arrays, with
    each unordered pair emitted exactly once (va < vb).

    Selection happens ON THE SIM MATRIX, before pair indices are expanded:
    `min_cos` keeps entries ≥ the threshold; `topk` tightens the cutoff to
    the k-th largest value in the group (exact — every true top-k member has
    cosine ≥ that value; ties are resolved downstream). Without this, a
    4096² group expands ~16M (va, vb) index pairs only to discard nearly
    all of them — the expansion, not the BLAS matmul, dominated wall-clock."""
    import numpy as np

    l, r = pdf[pdf["side"] == "L"], pdf[pdf["side"] == "R"]
    if l.empty or r.empty:
        return None
    lid = l["vec_id"].to_numpy(dtype=np.int64)
    rid = r["vec_id"].to_numpy(dtype=np.int64)
    lm = np.array(list(l["embedding"]), dtype=np.float64)
    rm = np.array(list(r["embedding"]), dtype=np.float64)
    # dot/(na*nb) — the oracle's sum(x*y)/(sqrt(Σx²)·sqrt(Σy²)) shape
    # (2-3 roundings per pair), NOT pre-normalized rows dotted (64 extra
    # per-element roundings), so 4dp parity doesn't lean on a pair cosine
    # staying clear of a 0.00005 boundary by ~1e-12
    nl = np.linalg.norm(lm, axis=1)
    nr = np.linalg.norm(rm, axis=1)
    sim = np.round((lm @ rm.T) / np.outer(nl, nr), 4)
    if bool(pdf["same"].iloc[0]):
        # diagonal group: L and R are the same block — strict upper
        # triangle by id so each unordered pair is emitted once
        keep = lid[:, None] < rid[None, :]
    else:
        keep = np.ones_like(sim, dtype=bool)
    if min_cos is not None:
        keep &= sim >= min_cos
    if topk is not None:
        vals = sim[keep]
        if len(vals) > topk:
            keep &= sim >= np.partition(vals, -topk)[-topk]
    ai, bj = np.nonzero(keep)
    if not len(ai):
        return None
    va = np.minimum(lid[ai], rid[bj])
    vb = np.maximum(lid[ai], rid[bj])
    return va, vb, sim[ai, bj]


@register(
    "sim_nearest_pairs",
    oracle=f"""
    WITH cos AS (
        {_COS_SQL.format(pair_pred="a.vec_id < b.vec_id")}
    )
    SELECT va, vb, cosine
    FROM cos ORDER BY cosine DESC, va, vb LIMIT 20
    """,
)
def sim_nearest_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup mining: 20 most-similar pairs corpus-wide (these
    fixtures are near-random, max cosine ≈0.51, so a fixed threshold would be
    empty — top-k is the robust formulation). Ranked on rounded cosine with
    (va, vb) tie-break for cross-engine determinism.

    Blocked all-pairs via `blocked_pair_groups`: each (bi ≤ bj) group does
    ONE BLAS matmul over two blocks inside `applyInPandas`, emitting only
    its local top-k under the total order, so the global orderBy sees
    ≤ k·groups rows. Exact all-pairs stays O(N²/B) work by nature — at real
    scale route to `sim_topk_lsh`; this is the exactness baseline."""
    import numpy as np
    import pandas as pd

    k = 20

    def pair_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        got = _group_pair_cosines(pdf, topk=k)
        if got is None:
            return pd.DataFrame({"va": [], "vb": [], "cosine": []})
        va, vb, cos = got
        order = np.lexsort((vb, va, -cos))[:k]
        return pd.DataFrame({"va": va[order], "vb": vb[order], "cosine": cos[order]})

    local = blocked_pair_groups(spark, sf_dir).groupBy("pair_id").applyInPandas(
        pair_topk, "va long, vb long, cosine double"
    )
    return local.orderBy(F.desc("cosine"), "va", "vb").limit(20)


# Banded sign-LSH for PAIR mining (vs the single 8-plane band of
# `sim_topk_lsh`, which serves point queries): L bands of r planes each,
# family planes b*r .. b*r+r-1. A pair is a candidate when ANY band bucket
# matches; per-band collision probability for angle θ is (1-θ/π)^r, so
# overall recall is 1-(1-(1-θ/π)^r)^L — banding amplifies the near/far gap
# the single band cannot.
PAIR_BANDS = 10
PAIR_BAND_PLANES = 6  # planes 0..59 of the 64-member xhash family
PAIR_SCALE = 100_000_000  # 1e-8 lattice (the sim_random_projection grid)

# auto operating-point rule (round-8, reworked round-9 after the judge
# refuted the round-8 bands=planes+4 recall claim): expected RANDOM-pair
# candidates ≈ bands · N²/2^planes, so holding them LINEAR in N
# (≈ PAIR_TARGET_CAND_PER_VEC · N) needs
#   planes = ceil(log2(N · bands / PAIR_TARGET_CAND_PER_VEC)),
# and holding TRUE-DUP recall ≥ PAIR_RECALL_TARGET at the design point
# (per-plane collision p = PAIR_DESIGN_P, i.e. cosine ≈ 0.9) needs
#   bands = ceil(ln(1-R) / ln(1-p^planes))
# — the two are mutually dependent (planes sees bands, bands sees planes),
# so the rule iterates to their joint fixpoint. PAIR_FIXTURE_MAX is the
# explicit oracle-parity guard: every corpus at or below it resolves to
# EXACTLY the registered 10×6 point the static DuckDB oracles encode
# (6553 = the largest N where the planes rule itself still floors at 6,
# so the guard and the arithmetic agree at the boundary). The plane
# ceiling bounds bucket width (int32) and per-vector hash cost; past it
# recall still holds but candidates/vector grow with N — pin a point via
# SPARK_GRAFT_PAIR_BANDS if that trade-off is wrong for a given corpus.
PAIR_TARGET_CAND_PER_VEC = 1024
PAIR_RECALL_TARGET = 0.95
PAIR_DESIGN_P = 0.86  # per-plane match prob 1-θ/π at cosine 0.9
PAIR_FIXTURE_MAX = 6553
PAIR_MIN_PLANES = 6
PAIR_MAX_PLANES = 24


def _bands_for_recall(planes: int) -> int:
    """Smallest band count L with 1-(1-p^planes)^L ≥ PAIR_RECALL_TARGET
    at the p = PAIR_DESIGN_P design point — exact, not the e^-x
    approximation, so the recall claim is true by construction at every
    emitted point."""
    import math

    pr = PAIR_DESIGN_P**planes
    return max(1, math.ceil(math.log(1 - PAIR_RECALL_TARGET) / math.log(1 - pr)))


def _auto_pair_point(n_vectors: int) -> tuple[int, int]:
    """The scale-adaptive (bands, planes) fixpoint for ``n_vectors``:
    planes from the linear-candidates rule, bands from the recall floor,
    iterated until stable (monotone non-decreasing and bounded by the
    plane ceiling, so it terminates in a handful of steps). Guarantees,
    all pinned by ``test_pair_band_auto_rule_anchors_and_monotonicity``:
    recall 1-(1-p^r)^b ≥ 0.95 for true dups (p ≥ 0.86 at cosine 0.9) at
    EVERY point the rule can emit; expected random candidates/vector
    b·N/2^r ≤ PAIR_TARGET_CAND_PER_VEC until the plane ceiling;
    N ≤ PAIR_FIXTURE_MAX → the registered 10×6 point, exactly."""
    import math

    if n_vectors <= PAIR_FIXTURE_MAX:
        return PAIR_BANDS, PAIR_BAND_PLANES
    def _planes_for(bands: int) -> int:
        r = math.ceil(
            math.log2(max(n_vectors, 1) * bands / PAIR_TARGET_CAND_PER_VEC)
        )
        return max(PAIR_MIN_PLANES, min(PAIR_MAX_PLANES, r))

    # Convergence proof for the cap (ADVICE r10): b only changes through
    # _planes_for(b) — if an iteration leaves planes unchanged, nb == b and
    # the loop breaks — so every non-final iteration strictly increases
    # _planes_for(b), an integer clamped to [PAIR_MIN_PLANES=6,
    # PAIR_MAX_PLANES=24]. At most 18 increments plus one confirming pass
    # ⇒ the fixpoint is always reached within 19 iterations; 24 is slack.
    b = PAIR_BANDS
    for _ in range(24):
        nb = max(PAIR_BANDS, _bands_for_recall(_planes_for(b)))
        if nb == b:
            break
        b = nb
    # Recompute planes from the FINAL band count so the returned (b, r) is
    # self-consistent, and assert the recall floor the docstring promises:
    # b must cover _bands_for_recall at the planes actually returned (holds
    # by the convergence argument above; the assert turns any future edit
    # that breaks it into a loud failure instead of a silent recall drop).
    r = _planes_for(b)
    assert b >= _bands_for_recall(r), (
        f"pair-band fixpoint did not converge: bands={b} < "
        f"recall floor {_bands_for_recall(r)} at planes={r}"
    )
    return b, r


def _pair_band_params(n_vectors: int | None = None) -> tuple[int, int]:
    """(bands, planes-per-band) operating point for the sign-LSH pair
    miner — resolved at BAND-BUILD time. Priority: explicit
    ``SPARK_GRAFT_PAIR_BANDS=BxR`` env override > the scale-adaptive
    rule (`_auto_pair_point`, when the caller supplies the corpus
    vector count) > the registered 10×6 constants.

    Why (round-7 slope study): candidate volume is N²·Σ_bands 2^-planes —
    at the fixed 10×6 point random pairs collide at ~15.7% (measured
    exactly at 5k AND predicted by the formula), a CONSTANT-FACTOR cut of
    all-pairs that went quadratic at 10× vectors (137× wall). The auto
    rule holds candidates LINEAR in N instead while its band count tracks
    the 0.95 recall floor (`_bands_for_recall`); the explicit
    PAIR_FIXTURE_MAX guard reproduces 10×6 at every gate fixture, so
    EXACT oracle parity never sees a different point (e.g. N = 5M
    resolves to 44×18: recall 0.951, ~839 candidates/vector). A user can
    still pin any point explicitly:
    ``SPARK_GRAFT_PAIR_BANDS=20x16`` (random collision 2^-16 → candidate
    fraction ~3e-4, recall 1-(1-p^16)^20 ≥ 0.97 on clustered corpora —
    both numbers test-pinned)."""
    raw = os.environ.get("SPARK_GRAFT_PAIR_BANDS", "")
    if raw:
        b, r = (int(x) for x in raw.lower().split("x", 1))
        if b < 1 or not 1 <= r <= 30:
            raise ValueError(
                f"SPARK_GRAFT_PAIR_BANDS={raw!r}: need BANDSxPLANES, "
                "planes 1..30"
            )
        return b, r
    if n_vectors is None:
        return PAIR_BANDS, PAIR_BAND_PLANES
    return _auto_pair_point(n_vectors)


def _embeddings_count(spark: SparkSession, sf_dir: str) -> int:
    """Corpus vector count for the operating-point rule — parquet footer
    metadata when the fixture layout allows (no scan at all), else one
    `count()` over the id column (a metadata-only aggregate on parquet:
    row-group counts, no data pages). Cheap at any scale by design."""
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    except Exception:
        return table(spark, sf_dir, "embeddings").select("vec_id").count()


def _pair_band_sql() -> str:
    """DuckDB CTE chain → pbands(vec_id, band_idx, bucket), one row per
    vector per band. INTEGER-LATTICE form (round-6 rework): dims quantize
    to exact 1e-8 bigints, each plane projection is Σ ±q_d with the ±1
    pattern from the xhash parity — an ORDER-FREE int64 sum, so the
    oracle is a plain grouped aggregate (no ordered list_reduce fold) and
    the Spark side is free to evaluate it as one vectorized Arrow matmul
    (`_build_pair_bands`). bucket = Σ_j (proj_{b·r+j} > 0)·2^j."""
    n_planes = PAIR_BANDS * PAIR_BAND_PLANES
    plane_rows = ", ".join(
        f"({i}, {XH_A[i]}, {XH_B[i]})" for i in range(n_planes)
    )
    return f"""pqv AS MATERIALIZED (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
               CAST(round(CAST(v AS DOUBLE) * {PAIR_SCALE}) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM embeddings)
    ),
    planes AS (SELECT i, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
               FROM (VALUES {plane_rows}) t(i, a, b)),
    proj AS (
        SELECT pqv.vec_id, pl.i,
               sum(CASE WHEN (pl.a * (pqv.dim + 1) + pl.b)
                             % {XH_P} % 2 = 1
                        THEN pqv.q ELSE -pqv.q END) AS pr
        FROM pqv CROSS JOIN planes pl
        GROUP BY pqv.vec_id, pl.i
    ),
    pbands AS (
        SELECT vec_id,
               CAST(i // {PAIR_BAND_PLANES} AS INTEGER) AS band_idx,
               CAST(sum(CASE WHEN pr > 0
                             THEN (1 << (i % {PAIR_BAND_PLANES}))
                             ELSE 0 END) AS INTEGER) AS bucket
        FROM proj GROUP BY vec_id, i // {PAIR_BAND_PLANES}
    )"""


_PAIR_BANDS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _pair_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slim (vec_id, band_idx, bucket) band relation, memoize-persisted per
    (app, sf_dir, operating point) — the staged ANN signature table (the
    `_lsh_bands` discipline): both pair-mining consumers and every
    eval/bench rerun read the same pinned copy instead of re-hashing the
    corpus. The RESOLVED operating point (env override or the N-adaptive
    default rule) joins the memo key so flipping SPARK_GRAFT_PAIR_BANDS
    mid-session can never serve stale buckets."""
    from ..caching import memoized_persist

    b, r = _pair_band_params(_embeddings_count(spark, sf_dir))
    keydir = (
        sf_dir
        if (b, r) == (PAIR_BANDS, PAIR_BAND_PLANES)
        else f"{sf_dir}#pair_bands={b}x{r}"
    )
    return memoized_persist(
        _PAIR_BANDS_CACHE,
        spark,
        keydir,
        lambda: _build_pair_bands(spark, sf_dir),
    )


def _build_pair_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow pass: quantize dims to the 1e-8 lattice JVM-side (Spark
    `round` half-up — the cross-engine rule every lattice op here uses),
    then an exact int64 matmul against the ±1 plane matrix per batch.
    60 planes × 64 dims × N vectors of integer multiply-add — microseconds
    per thousand vectors where the interpreted per-plane fold expressions
    cost ~1.6 ms/vector (the round-5 IVF lesson applied to LSH banding)."""
    e = table(spark, sf_dir, "embeddings")
    qv = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * PAIR_SCALE, 0).cast("long"),
        ).alias("qv"),
    )
    n_bands, n_pl = _pair_band_params(_embeddings_count(spark, sf_dir))
    n_planes = n_bands * n_pl
    # same LCG plane streams as the module-level XH_A/XH_B (identical
    # prefix ≤ 64), continued when the production operating point needs
    # more planes than the default family carries
    xa, xb = (
        (XH_A, XH_B)
        if n_planes <= len(XH_A)
        else extended_planes(n_planes)
    )

    def buckets(batches):
        import numpy as np
        import pandas as pd

        w = None
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.array(list(pdf["qv"]), dtype=np.int64)
            if w is None or w.shape[1] != q.shape[1]:
                dims = q.shape[1]
                w = np.array(
                    [
                        [
                            1
                            if (xa[i] * (d + 1) + xb[i]) % XH_P % 2 == 1
                            else -1
                            for d in range(dims)
                        ]
                        for i in range(n_planes)
                    ],
                    dtype=np.int64,
                )
            proj = q @ w.T  # (n, planes) exact int64
            bits = (proj > 0).astype(np.int64)
            n = len(pdf)
            weights = (1 << np.arange(n_pl)).astype(np.int64)
            buck = bits.reshape(n, n_bands, n_pl) @ weights
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(np.int64), n_bands
                    ),
                    "band_idx": np.tile(
                        np.arange(n_bands, dtype=np.int32), n
                    ),
                    "bucket": buck.reshape(-1).astype(np.int32),
                }
            )

    return qv.mapInPandas(buckets, "vec_id bigint, band_idx int, bucket int")


def _ann_cand_cos_sql() -> str:
    """DuckDB CTE chain pbands→cand→cos: LSH candidate pairs with exact
    rounded cosines — the shared front of `sim_nearest_pairs_ann` (top-20)
    and `dedup_embedding_ann` (threshold). DISTINCT equals the Spark side's
    first-matching-band dedup by construction."""
    return f"""{_pair_band_sql()},
    cand AS (
        SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
        FROM pbands a JOIN pbands b
          ON a.band_idx = b.band_idx AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
    ),
    cos AS (
        SELECT va, vb,
               round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
                   + 0.0 AS cosine
        FROM (
            SELECT c.va, c.vb,
                   CAST(unnest(ea.embedding) AS DOUBLE) AS x,
                   CAST(unnest(eb.embedding) AS DOUBLE) AS y
            FROM cand c
            JOIN embeddings ea ON c.va = ea.vec_id
            JOIN embeddings eb ON c.vb = eb.vec_id
        )
        GROUP BY va, vb
    )"""


def _embeddings_fit_broadcast(spark: SparkSession, sf_dir: str) -> bool:
    """Size gate for broadcasting the full embeddings relation: estimated
    bytes (rows × ~600 B for id + 64 float64 Arrow cells) must clear the
    session autoBroadcastJoinThreshold. Same discipline as the dedup
    module's `_arrs_fits_broadcast` — above the gate the hint is omitted
    and the verify join degrades to a co-partitioned shuffle, never an
    executor OOM."""
    from .dedup import _parse_size_bytes

    try:
        # _parse_size_bytes handles unit-suffixed settings ('100MB', '1g',
        # '-1') that a bare int() would reject, silently shrinking a
        # user-raised threshold back to the 10 MiB default
        thresh = _parse_size_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except Exception:
        thresh = 10 * 1024 * 1024
    if thresh <= 0:
        return False
    try:
        import pyarrow.parquet as pq

        n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    except Exception:
        return False
    return n * 600 <= thresh


def ann_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(va, vb, cosine): banded-LSH candidate pairs with one exact rounded
    cosine each — the candidate-generate → verify stage shared by
    `sim_nearest_pairs_ann` and `dedup_embedding_ann`.

    Shape (round-6 rework): the bucket self-join carries ONLY
    (vec_id, band_idx, bucket) — the 64-float payload never rides the
    band fan-out (the previous form shuffled every vector PAIR_BANDS
    times and scored pairs with interpreted higher-order-function folds,
    ~7 s warm at sf0.1; this form is ~1 s). Candidates dedup with one
    slim distinct, embeddings re-attach by (size-gated) broadcast joins,
    and the verify is ONE Arrow-vectorized `mapInPandas` pass using the
    exact-miner's numeric recipe (`_group_pair_cosines`: float64
    dot/(na·nb), round 4dp) — so the approximate path scores with the
    same arithmetic the blocked exact path does, and the DuckDB oracle's
    DISTINCT candidate set matches by construction."""
    e = table(spark, sf_dir, "embeddings")
    bands = _pair_bands(spark, sf_dir)
    a = bands.select(F.col("vec_id").alias("va"), "band_idx", "bucket")
    b = bands.select(F.col("vec_id").alias("vb"), "band_idx", "bucket")
    cand = (
        a.join(b, ["band_idx", "bucket"])
        .where(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    if _embeddings_fit_broadcast(spark, sf_dir):
        ea, eb = F.broadcast(ea), F.broadcast(eb)
    pairs = cand.join(ea, "va").join(eb, "vb")

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            am = np.array(list(pdf["ea"]), dtype=np.float64)
            bm = np.array(list(pdf["eb"]), dtype=np.float64)
            # dot/(na*nb) — the oracle's arithmetic shape (see
            # `_group_pair_cosines`); +0.0 normalizes -0.0
            dot = np.einsum("ij,ij->i", am, bm)
            na = np.linalg.norm(am, axis=1)
            nb = np.linalg.norm(bm, axis=1)
            cos = np.round(dot / (na * nb), 4) + 0.0
            yield pd.DataFrame(
                {"va": pdf["va"], "vb": pdf["vb"], "cosine": cos}
            )

    return pairs.mapInPandas(score, "va bigint, vb bigint, cosine double")


@register(
    "sim_nearest_pairs_ann",
    oracle=f"""
    WITH {_ann_cand_cos_sql()}
    SELECT va, vb, cosine FROM cos ORDER BY cosine DESC, va, vb LIMIT 20
    """,
)
def sim_nearest_pairs_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-blocked nearest-pair mining (round 6): the sublinear sibling of
    the exact `sim_nearest_pairs`, closing the one remaining O(N²)
    operator. Candidates come from banded sign-LSH buckets ({PAIR_BANDS}
    bands × {PAIR_BAND_PLANES} hyperplanes), verified with one exact cosine
    per candidate, then global top-20 — the candidate-generate → verify →
    rank shape every production near-dup miner uses at corpus scale.

    The bucket self-join is SLIM — (vec_id, band_idx, bucket) only; the
    64-float payload never rides the band fan-out, candidates dedup with
    one distinct over the slim pair stream, and the verify re-attaches
    embeddings by broadcast and scores one Arrow batch pass (see
    `ann_scored_pairs`). EXACT oracle: bucket ids are cross-engine xhash
    parity planes, so DuckDB rebuilds identical candidate sets, and the
    verify uses the exact miner's numeric recipe.

    Honesty note on the fixture: these embeddings are near-random (top-20
    pair cosines 0.44–0.51, i.e. θ≈60°, barely off the random-pair 90°),
    the adversarial regime for angular LSH — measured recall ≈0.5 at a
    6.3× candidate reduction, and `sim_pairs_recall_eval` REPORTS that
    honestly (the gate is the point: it tells you when not to trust the
    approximate path). On a real near-dup corpus (duplicate cosine ≥0.8 →
    per-band p=(1-θ/π)^{PAIR_BAND_PLANES}≈0.25) the same parameters give
    recall ≥0.94 while candidate fraction stays ≈1.5% per the same
    formula.
    """
    scored = ann_scored_pairs(spark, sf_dir)
    return scored.orderBy(F.desc("cosine"), "va", "vb").limit(20)


def _pairs_recall_oracle() -> str:
    """Compose the two registered nearest-pair oracles (both EXACT for
    their own semantics) — the grader must grade the SAME pair sets the
    operators emit, so their SQL is embedded verbatim."""
    from ..operators.parity import sql_ratio
    from ..registry import ORACLES

    return f"""
    SELECT CAST(count(*) AS BIGINT) AS k_exact,
           CAST(count(a.va) AS BIGINT) AS n_hit,
           {sql_ratio("count(a.va)", "count(*)")} AS recall
    FROM ({ORACLES["sim_nearest_pairs"]}) e
    LEFT JOIN ({ORACLES["sim_nearest_pairs_ann"]}) a
      ON e.va = a.va AND e.vb = a.vb
    """


@register("sim_pairs_recall_eval", oracle=_pairs_recall_oracle())
def sim_pairs_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance gate for the ANN pair miner: recall of
    `sim_nearest_pairs_ann`'s top-20 against the exact `sim_nearest_pairs`
    top-20 — the `sim_ann_recall_eval` pattern applied to pair mining, so
    the O(N²)→sublinear swap ships with its quality metric attached.

    Pure composition of the two registered operators (not
    re-implementations); both sides are 20 rows, so the join is a
    broadcast over driver-free relations and the grader costs nothing
    next to the operators it grades."""
    exact = sim_nearest_pairs(spark, sf_dir).select("va", "vb")
    approx = sim_nearest_pairs_ann(spark, sf_dir).select(
        "va", "vb", F.lit(1).alias("hit")
    )
    return exact.join(F.broadcast(approx), ["va", "vb"], "left").agg(
        F.count("*").alias("k_exact"),
        F.count("hit").alias("n_hit"),
        ratio(F.count("hit"), F.count("*")).alias("recall"),
    )


@register(
    "sim_quantize_int8",
    oracle="""
    WITH t AS (
        SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, x, list_max(list_transform(x, v -> abs(v))) AS s
        FROM t
    )
    SELECT vec_id,
           round(s, 6) + 0.0 AS scale,
           round(list_max(list_transform(
               x, v -> abs(v - floor(v / s * 127 + 0.5) * s / 127))), 6)
               + 0.0 AS max_err
    FROM s
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the 4×
    memory/bandwidth compression every large-scale ANN store applies before
    indexing. Per vector: scale = max|x|, q_i = round(127·x_i/scale) (as
    floor(·+0.5) so both engines share one rounding rule), and the reported
    max reconstruction error, which is bounded by scale/254 — the guarantee
    asserted in tests. Pure JVM array expressions (`transform`/`array_max`/
    `zip_with`): one narrow map over the fact table, no shuffle, no Python."""
    e = table(spark, sf_dir, "embeddings")
    x = F.transform("embedding", lambda v: v.cast("double"))
    d = e.select("vec_id", x.alias("x")).select(
        "vec_id", "x", F.array_max(F.transform("x", F.abs)).alias("s")
    )
    dq = F.transform(
        "x",
        lambda v: F.floor(v / F.col("s") * 127 + F.lit(0.5)) * F.col("s") / 127,
    )
    err = F.array_max(
        F.zip_with("x", dq, lambda a, b: F.abs(a - b))
    )
    return d.select(
        "vec_id",
        (F.round("s", 6) + F.lit(0.0)).alias("scale"),
        (F.round(err, 6) + F.lit(0.0)).alias("max_err"),
    )


PCA_ITERS = 100
PCA_SCALE = 10_000  # dims quantized to integer ten-thousandths (IVF rule)


def _pca_round4(x: float) -> float:
    """Half-away-from-zero 4dp round — the same rule as DuckDB round(x,4)
    and Spark's BigDecimal round (python's round() is banker's and would
    diverge on .5 boundaries); `+ 0.0` folds any -0.0."""
    import math

    return math.copysign(math.floor(abs(x) * 1e4 + 0.5), x) / 1e4 + 0.0


def _pca_oracle() -> str:
    """DuckDB twin of the WHOLE pca pipeline: integer Gram/mean sums →
    covariance via one fixed expression → PCA_ITERS unrolled power-iteration
    rounds, every float fold evaluated in EXPLICIT ascending-index order
    (list_reduce left fold) so it is bit-identical to the pure-Python
    driver loop (SQL SUM order is unspecified; integer sums are the only
    aggregation used)."""
    dim = 64  # embeddings fixture dimensionality (asserted Spark-side)
    rounds = []
    for k in range(1, PCA_ITERS + 1):
        rounds.append(
            f""",
    v{k} AS MATERIALIZED (
        WITH w AS (
            SELECT t.i,
                   list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(range({dim}),
                                      j -> c.cov[t.i + 1][j + 1] * p.v[j + 1])),
                       (a, b) -> a + b) AS wi
            FROM range({dim}) t(i), covl c, v{k - 1} p
        ),
        nrm AS (
            SELECT sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform((SELECT list(wi ORDER BY i) FROM w),
                                      x -> x * x)),
                       (a, b) -> a + b)) AS s
        )
        SELECT (SELECT list(w.wi / nrm.s ORDER BY w.i) FROM w, nrm) AS v
    )"""
        )
    return (
        f"""
    WITH qd AS MATERIALIZED (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
               CAST(round(CAST(v AS DOUBLE) * {PCA_SCALE}) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM embeddings)
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
    g AS (
        SELECT a.dim AS i, b.dim AS j, CAST(sum(a.q * b.q) AS DOUBLE) AS s
        FROM qd a JOIN qd b USING (vec_id)
        GROUP BY a.dim, b.dim
    ),
    mu AS (SELECT dim AS i, CAST(sum(q) AS DOUBLE) AS m FROM qd GROUP BY dim),
    covc AS (
        SELECT g.i, g.j,
               (g.s / nn.n) / {float(PCA_SCALE * PCA_SCALE)!r}
               - ((ma.m / nn.n) / {float(PCA_SCALE)!r})
                 * ((mb.m / nn.n) / {float(PCA_SCALE)!r}) AS c
        FROM g, nn
        JOIN mu ma ON ma.i = g.i
        JOIN mu mb ON mb.i = g.j
    ),
    covr AS (SELECT i, list(c ORDER BY j) AS r FROM covc GROUP BY i),
    covl AS (SELECT list(r ORDER BY i) AS cov FROM covr),
    v0 AS (SELECT list_prepend(1.0::DOUBLE,
                  list_transform(range({dim} - 1), x -> 0.0::DOUBLE)) AS v)"""
        + "".join(rounds)
        + f""",
    fin AS (
        WITH w2 AS (
            SELECT t.i,
                   list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(range({dim}),
                                      j -> c.cov[t.i + 1][j + 1] * p.v[j + 1])),
                       (a, b) -> a + b) AS wi
            FROM range({dim}) t(i), covl c, v{PCA_ITERS} p
        )
        SELECT (SELECT list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(range({dim}),
                                   i -> p.v[i + 1] * wl.l[i + 1])),
                    (a, b) -> a + b)
                FROM v{PCA_ITERS} p,
                     (SELECT list(wi ORDER BY i) AS l FROM w2) wl) AS lam,
               (SELECT list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(range({dim}), i -> c.cov[i + 1][i + 1])),
                    (a, b) -> a + b)
                FROM covl c) AS trace,
               (SELECT list_position(av.a, list_aggregate(av.a, 'max')) - 1
                FROM (SELECT list_transform(p.v, x -> abs(x)) AS a
                      FROM v{PCA_ITERS} p) av) AS dd
    )
    SELECT round(lam, 4) + 0.0 AS top_eigenvalue,
           round(trace, 4) + 0.0 AS total_variance,
           round(lam / trace, 4) + 0.0 AS explained_ratio,
           CAST(dd AS INTEGER) AS dominant_dim
    FROM fin
    """
    )


@register("sim_pca_power", oracle=_pca_oracle())
def sim_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud: DISTRIBUTED
    covariance accumulation + driver-side power iteration — the
    dimensionality-reduction/whitening primitive for embedding pipelines
    (e.g. de-meaning + top-PC removal, the classic embedding
    post-processing step).

    Scale split: executors reduce the corpus to ONE dim×dim Gram matrix
    (per-row outer products exploded to (i, j, q_i·q_j) cells → a single
    map-side-combined hash agg on 64² keys — corpus-sized work, fixed-size
    output); the driver then runs 64×64 power iteration (fixed start
    vector, fixed {PCA_ITERS} steps) on data that no longer grows with N.

    EXACT-oracled since round 4 (was ROWS-ONLY "no SQL eigensolver"): dims
    quantize to the integer lattice so Gram/mean sums are exact int64
    (order-independent — the raw-double `sum(p)` this replaces was not),
    the covariance is one fixed double expression over those ints, and the
    power iteration runs as PURE-PYTHON ascending-index folds (no BLAS —
    numpy's dot order is unspecified) that DuckDB replays bit-for-bit as
    {PCA_ITERS} unrolled MATERIALIZED CTE rounds of list_reduce folds.
    Output: top eigenvalue, total variance (trace), explained ratio,
    dominant dimension; the eigenpair residual ‖Cv − λv‖ ≤ 1e-6·λ is
    pinned in tests."""
    import math

    e = table(spark, sf_dir, "embeddings")
    # spread the narrow source first: the outer-product fan-out below is
    # dim²× per row and would otherwise fuse into the single-row-group
    # scan task (guide §2.5)
    esp = spread(
        spark,
        e.select("vec_id", "embedding"),
        "vec_id",
        table_name="embeddings",
        sf_dir=sf_dir,
    )
    qarr = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * PCA_SCALE, 0).cast("long"),
    )
    qd = esp.select(
        "vec_id",
        F.posexplode(qarr).alias("dim", "q"),
    )
    # Gram cells as a MAP-SIDE outer product: each row emits its dim² q_i·q_j
    # products directly (flattened nested transform, cell ordinal k = i·dim+j)
    # — replacing the pre-r15 self-join on vec_id, which shuffled both
    # exploded legs (2 × N·dim rows) only to re-pair values that were
    # adjacent in the same array all along (guide §2.4: remove shuffles
    # outright). Same integer-lattice products, same decimal(38) sums.
    cells = esp.select(
        F.posexplode(
            F.flatten(
                F.transform(
                    qarr,
                    lambda qi: F.transform(qarr, lambda qj: qi * qj),
                )
            )
        ).alias("k", "p")
    )
    gsums = (
        cells.groupBy("k")
        # decimal(38) partial sums: exact at any N (int64 q·q ≤ 1e9/cell)
        .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    means = (
        qd.groupBy("dim")
        .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("m"))
        .collect()
    )
    dim = len(means)
    if not dim:
        raise ValueError("sim_pca_power: embeddings table is empty")
    if len(gsums) != dim * dim:
        raise ValueError(
            f"sim_pca_power: ragged embedding arrays — {len(gsums)} Gram "
            f"cells for dim {dim}"
        )
    n = float(e.count())
    m = [0.0] * dim
    for r in means:
        m[r.dim] = float(int(r.m))
    gram = [[0.0] * dim for _ in range(dim)]
    for r in gsums:
        gram[r.k // dim][r.k % dim] = float(int(r.s))
    sc, sc2 = float(PCA_SCALE), float(PCA_SCALE * PCA_SCALE)
    # the EXACT expression the oracle evaluates — same ops, same order
    cov = [
        [
            (gram[i][j] / n) / sc2 - ((m[i] / n) / sc) * ((m[j] / n) / sc)
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(PCA_ITERS):
        w = []
        for i in range(dim):
            acc = 0.0
            for j in range(dim):
                acc = acc + cov[i][j] * v[j]
            w.append(acc)
        nrm = 0.0
        for x in w:
            nrm = nrm + x * x
        nrm = math.sqrt(nrm)
        v = [x / nrm for x in w]
    w2 = []
    for i in range(dim):
        acc = 0.0
        for j in range(dim):
            acc = acc + cov[i][j] * v[j]
        w2.append(acc)
    lam = 0.0
    for i in range(dim):
        lam = lam + v[i] * w2[i]
    trace = 0.0
    for i in range(dim):
        trace = trace + cov[i][i]
    absv = [abs(x) for x in v]
    dominant = absv.index(max(absv))
    return spark.createDataFrame(
        [
            (
                _pca_round4(lam),
                _pca_round4(trace),
                _pca_round4(lam / trace),
                int(dominant),
            )
        ],
        "top_eigenvalue double, total_variance double, "
        "explained_ratio double, dominant_dim int",
    )


RP_DIM = 16  # Johnson-Lindenstrauss target dimensionality


@register(
    "sim_random_projection",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, unnest(range(len(embedding))) AS j,
               unnest(embedding) AS v
        FROM embeddings
    ),
    grid AS (
        SELECT x.vec_id, k.k, x.j,
               CAST(round(CAST(x.v AS DOUBLE) * 100000000, 0) AS BIGINT) AS sv,
               CASE WHEN ((k.k * 64 + x.j + 1) * 2654435761) % 4294967296
                         < 2147483648
                    THEN 1 ELSE -1 END AS s
        FROM x, (SELECT unnest(range({RP_DIM})) AS k) k
    )
    SELECT vec_id, CAST(k AS INTEGER) AS k,
           sum(sv * s) / 100000000.0 AS y
    FROM grid GROUP BY vec_id, k
    """,
)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 → 16 dims with a
    DETERMINISTIC hash-derived ±1 sign matrix (no RNG state — the matrix
    is a pure function of (k, j), so any executor, any engine, any rerun
    projects identically). The standard ANN pre-reduction: pairwise
    distances are preserved within (1±ε) whp, and downstream LSH/IVF run
    on 4× narrower vectors.

    Zero shuffle for the projection itself: each output coordinate is a
    JVM-side fold over the embedding array (values quantized to exact
    1e-8 bigints first — float→DECIMAL casts round differently across
    engines, integer sums cannot). Long output form (vec_id, k, y) keeps
    the driver gate scalar-typed.
    """
    sign = (
        "IF(pmod((({k} * 64 + j + 1) * 2654435761), 4294967296)"
        " < 2147483648, 1L, -1L)"
    )
    fold = (
        "aggregate(zip_with(embedding,"
        " transform(sequence(0, 63), j -> {sign}),"
        " (x, s) -> CAST(round(CAST(x AS DOUBLE) * 100000000, 0) AS BIGINT)"
        " * s), 0L, (a, b) -> a + b) / CAST(1e8 AS DOUBLE)"
    )
    e = table(spark, sf_dir, "embeddings")
    cols = [
        F.expr(fold.format(sign=sign.format(k=k))).alias(f"y{k}")
        for k in range(RP_DIM)
    ]
    wide = e.select("vec_id", *cols)
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("k"), F.col(f"y{k}").alias("y"))
            for k in range(RP_DIM)
        ]
    )
    return wide.select("vec_id", F.explode(pairs).alias("p")).select(
        "vec_id", F.col("p.k").alias("k"), F.col("p.y").alias("y")
    )


def _recall_oracle() -> str:
    """Compose the two registered top-k oracles (both EXACT) — evaluation
    queries must grade the SAME candidate sets the operators produce, so the
    oracle literally embeds their SQL as derived tables."""
    from ..registry import ORACLES

    return f"""
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS k_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           CAST(floor(CAST((count(a.neighbor_id)) * 20000 + (count(*)) AS DOUBLE) / (2 * (count(*)))) AS DOUBLE) / 10000.0 AS recall
    FROM ({ORACLES["sim_topk_search"]}) e
    LEFT JOIN ({ORACLES["sim_topk_lsh"]}) a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """


@register("sim_ann_recall_eval", oracle=_recall_oracle())
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: per-query recall@k of the LSH path
    (`sim_topk_lsh`) against the brute-force ground truth
    (`sim_topk_search`) — the acceptance metric every production ANN
    deployment tracks before trusting the approximate path.

    Pure composition: both sides are the registered operators themselves
    (not re-implementations), joined on (query, neighbor) and rolled up per
    query. Ground truth is queries-sized (k rows per query), so the join is
    a broadcast; at 100 TB the expensive parts are the operators being
    evaluated, not the grader."""
    exact = sim_topk_search(spark, sf_dir).select("query_id", "neighbor_id")
    approx = sim_topk_lsh(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k_exact"),
            F.count("hit").alias("n_hit"),
            ratio(F.count("hit"), F.count("*")).alias("recall"),
        )
    )


TRUNC_DIM = 16  # Matryoshka truncation: keep the first 16 of 64 dims


def _matryoshka_oracle() -> str:
    """Full-dim ground truth (the registered `sim_topk_search` oracle,
    embedded verbatim) vs a brute-force top-k over the FIRST {TRUNC_DIM}
    dims only — same rounded-cosine + vec_id ranking discipline."""
    from ..registry import ORACLES
    from ..operators.parity import sql_ratio

    trunc_cos = f"""
        SELECT va, vb,
               round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
                   + 0.0 AS cosine
        FROM (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   CAST(unnest(a.embedding[1:{TRUNC_DIM}]) AS DOUBLE) AS x,
                   CAST(unnest(b.embedding[1:{TRUNC_DIM}]) AS DOUBLE) AS y
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
        )
        GROUP BY va, vb
    """
    return f"""
    WITH tcos AS ({trunc_cos}),
    trunc AS (
        SELECT query_id, neighbor_id FROM (
            SELECT va AS query_id, vb AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY va ORDER BY cosine DESC, vb
                   ) AS rn
            FROM tcos
        ) WHERE rn <= {TOP_K}
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS k_full,
           CAST(count(t.neighbor_id) AS BIGINT) AS n_hit,
           {sql_ratio("count(t.neighbor_id)", "count(*)")} AS recall
    FROM ({ORACLES["sim_topk_search"]}) e
    LEFT JOIN trunc t
      ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
    GROUP BY e.query_id
    """


@register("sim_matryoshka_eval", oracle=_matryoshka_oracle())
def sim_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation acceptance gate (round 5): per-query recall@k
    of brute-force search over only the FIRST {TRUNC_DIM} embedding dims
    against the full-dim ground truth — the metric that decides whether an
    MRL-style truncated index (4× smaller vectors, 4× cheaper scans) is
    safe to deploy, exactly as `sim_ann_recall_eval` decides for LSH.

    Composition discipline: ground truth IS the registered
    `sim_topk_search` (its oracle embedded verbatim); the truncated side
    reuses the same broadcast × scan + rounded-cosine ranking shape on
    `slice(embedding, 1, {TRUNC_DIM})`. At scale the truncated pass scans
    1/4 of the vector bytes — the whole point being graded."""
    exact = sim_topk_search(spark, sf_dir).select("query_id", "neighbor_id")
    e = table(spark, sf_dir, "embeddings")
    te = F.slice("embedding", 1, TRUNC_DIM)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        te.alias("qe"),
        _norm(te).alias("qn"),
    )
    # candidate leg off the spread source (guide §2.5): the truncated-
    # cosine fan-out otherwise fuses into the one scan task
    c = _emb_spread(spark, sf_dir).where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        te.alias("ce"),
        _norm(te).alias("cn"),
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    trunc = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        exact.join(F.broadcast(trunc), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k_full"),
            F.count("hit").alias("n_hit"),
            ratio(F.count("hit"), F.count("*")).alias("recall"),
        )
    )


def _ivf_cell_stats_oracle() -> str:
    parts, prev = _ivf_train_parts()
    from ..operators.parity import sql_ratio

    return "".join(parts) + f""",
    a AS (
        SELECT vec_id, cell FROM (
            SELECT qv.vec_id, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell) AS rk
            FROM qv JOIN {prev} c USING (dim)
            GROUP BY qv.vec_id, c.cell
        ) WHERE rk = 1
    ),
    cnt AS (
        SELECT CAST(cell AS BIGINT) AS cell,
               CAST(count(*) AS BIGINT) AS n_vecs
        FROM a GROUP BY cell
    ),
    t AS (
        SELECT CAST(sum(n_vecs) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_cells
        FROM cnt
    )
    SELECT cell, n_vecs, t.total, t.n_cells,
           {sql_ratio('n_vecs', 'total')} AS share,
           {sql_ratio('n_vecs * n_cells', 'total')} AS load_x
    FROM cnt CROSS JOIN t
    """


@register("sim_ivf_cell_stats", oracle=_ivf_cell_stats_oracle())
def sim_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-build QA: the inverted-list balance report every ANN
    deployment checks before serving — per occupied cell its vector count,
    corpus share, and load factor (`load_x` = times the mean list length;
    a hot cell bounds probe latency the way a skewed join key bounds a
    shuffle — `diag_key_skew`'s metric applied to the index layout, and
    the number that decides re-training with more cells vs. splitting hot
    lists).

    Composes the registered `sim_topk_ivf` quantizer verbatim (same
    trained integer-lattice centroids, same argmin assignment), so the
    stats describe exactly the index that operator probes. Scale shape:
    assignment is map-side (broadcast k×dim centroid literal), then ONE
    hash agg keyed by cell (N_CELLS rows) and a 1-row totals broadcast —
    nothing here grows beyond the cell count. All-integer arithmetic with
    the boundary-proof quotient for the two ratios.
    """
    from ..operators.parity import ratio as _ratio

    cents = _train_ivf_centroids(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    a = e.select(
        _ivf_assign(_ivf_qvec("embedding"), cents).alias("cell")
    )
    cnt = a.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    t = cnt.agg(
        F.sum("n_vecs").cast("long").alias("total"),
        F.count("*").alias("n_cells"),
    )
    return cnt.crossJoin(F.broadcast(t)).select(
        F.col("cell").cast("bigint").alias("cell"),
        "n_vecs",
        "total",
        "n_cells",
        _ratio(F.col("n_vecs"), F.col("total")).alias("share"),
        _ratio(F.col("n_vecs") * F.col("n_cells"), F.col("total")).alias(
            "load_x"
        ),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the fourth ANN path next to brute / LSH / IVF.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim embeddings -> 8 x 8-dim subvectors)
PQ_K = 16  # codebook size per subspace (4-bit codes)
PQ_ITERS = 2  # Lloyd rounds, same discipline as the IVF coarse quantizer


def _pq_qe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded (vec_id, sub, dim, q) relation: embeddings quantized to the
    IVF integer lattice, each dim tagged with its subspace id
    sub = floor(dim * PQ_M / len) — a pure function of position, so both
    engines partition the vector identically at any dimensionality.

    Spread off the single-row-group scan first (guide §2.5): every
    consumer fans this relation out through a broadcast join + partial
    agg (PQ encode 8×, the exact ground truth N_QUERIES×) that would
    otherwise fuse into the one scan task."""
    e = spread(
        spark,
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
        table_name="embeddings",
        sf_dir=sf_dir,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("n"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * IVF_SCALE, 0).cast(
                    "long"
                ),
            )
        ).alias("dim", "q"),
    ).select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.floor((F.col("dim") * PQ_M).cast("double") / F.col("n"))
        .cast("int")
        .alias("sub"),
        "q",
    )


def _pq_centroid_df(spark: SparkSession, cents: dict) -> DataFrame:
    """Codebooks as a broadcast-sized (cell, dim, m) relation — at
    deployment this is PQ_M×PQ_K×subdim integers, a literal."""
    rows = [(c, d, int(m)) for (c, d), m in sorted(cents.items())]
    return spark.createDataFrame(rows, "cell int, dim int, m long")


def _pq_d2(qe: DataFrame, cdf: DataFrame) -> DataFrame:
    """Per-(vector, subspace, cell) integer L2 distance: join the exploded
    lattice relation against the broadcast codebook on dim; grouping by the
    vector's sub column restricts each sum to that subspace's dims (a
    centroid row's dim decides which subspace it scores). Integer addition
    is order-free, so this hash agg is bit-identical to the oracle's."""
    return (
        qe.join(F.broadcast(cdf), "dim")
        .groupBy("vec_id", "sub", "cell")
        .agg(
            F.sum((F.col("q") - F.col("m")) * (F.col("q") - F.col("m"))).alias(
                "d2"
            )
        )
    )


def _pq_argmin(d2: DataFrame) -> DataFrame:
    """Rank-1 cell per (vector, subspace), ties to the lowest cell id —
    the same (d2, cell) struct-min the IVF assignment uses.

    Since r16 this join/agg encoder is the REFERENCE path only (kept for
    the parity test pinning the map-side encoder below); the registered
    PQ ops encode map-side via `_pq_codes_arr`."""
    return (
        d2.groupBy("vec_id", "sub")
        .agg(F.min_by(F.struct("cell"), F.struct("d2", "cell")).alias("s"))
        .select("vec_id", "sub", F.col("s.cell").alias("cell"))
    )


def _pq_sub_dims(n_dims: int) -> list[list[int]]:
    """Dims of each PQ subspace under the sub = floor(dim·PQ_M / n) rule —
    contiguous runs, the same pure-position tagging `_pq_qe` and the
    oracles apply per row (fixture embeddings are uniform-width, so the
    plan-time split off the codebook's dim count is the per-row rule)."""
    return [
        [d for d in range(n_dims) if (d * PQ_M) // n_dims == s]
        for s in range(PQ_M)
    ]


def _pq_sub_d2_arrs(qv_col: Column, cents: dict) -> list[Column]:
    """PQ_M columns, each the array<long> of PQ_K squared subspace
    distances — `_ivf_dist2_arr`'s one-literal-plus-transform idiom applied
    per subspace off the driver-trained codebook (guide §8: the codebook is
    kilobytes of model artifact; shipping it as a literal makes ENCODING a
    pure map-side pass, where the r15 form exploded every vector to 64 dim
    rows, broadcast-joined the codebook ×PQ_K and re-assembled sums through
    two hash-agg exchanges). Same int64 (q−m)² arithmetic, order-free."""
    n_dims = 1 + max(d for (_, d) in cents)
    out = []
    for dims in _pq_sub_dims(n_dims):
        sub_c = F.lit(
            [[int(cents[(c, d)]) for d in dims] for c in range(PQ_K)]
        ).cast("array<array<bigint>>")
        sv = F.slice(qv_col, dims[0] + 1, len(dims))
        # NB: the lambda must stay single-parameter (PySpark derives the
        # HOF arity from the signature — a second bound param would turn
        # this into transform's (element, index) form); `sv` is resolved
        # eagerly because F.transform invokes the lambda right here.
        out.append(
            F.transform(
                sub_c,
                lambda m: F.aggregate(
                    F.zip_with(sv, m, lambda q, c: (q - c) * (q - c)),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                ),
            )
        )
    return out


def _pq_codes_arr(qv_col: Column, cents: dict) -> Column:
    """array<int> of the PQ_M nearest sub-cell ids, ties → lowest id
    (array_position returns the FIRST min — the oracle's ORDER BY d2,
    cell rank-1, exactly `_ivf_assign`'s rule per subspace)."""
    return F.array(
        *[
            (F.array_position(d2, F.array_min(d2)) - 1).cast("int")
            for d2 in _pq_sub_d2_arrs(qv_col, cents)
        ]
    )


def _query_qvecs(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[int]]]:
    """The N_QUERIES lattice-quantized query vectors, collected to the
    driver (guide §8 "decide with small rows": the query batch is the
    small side by definition — N_QUERIES rows — and every query-time
    decision, the ADC lookup table and the probe list, is a pure function
    of it plus the driver-trained model artifacts). Quantization stays
    the `_ivf_qvec` Spark expression so the lattice is bit-identical to
    every distributed path; sorted by vec_id for determinism."""
    rows = (
        table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", _ivf_qvec("embedding").alias("qv"))
        .collect()
    )
    return sorted((int(r.vec_id), [int(v) for v in r.qv]) for r in rows)


def _pq_query_lut(qvecs: list[tuple[int, list[int]]], cents: dict) -> list:
    """Per-query ADC lookup tables (PQ_M × PQ_K int64 d2 sums), exact
    Python-int twins of the oracle's `lut` CTE — N_QUERIES×PQ_M×PQ_K
    values, a few KB shipped as one literal."""
    n_dims = 1 + max(d for (_, d) in cents)
    subs = _pq_sub_dims(n_dims)
    return [
        [
            [
                sum((qv[d] - cents[(c, d)]) ** 2 for d in dims)
                for c in range(PQ_K)
            ]
            for dims in subs
        ]
        for _, qv in qvecs
    ]


def _ivf_probes_py(
    qvecs: list[tuple[int, list[int]]], icents: list[list[int]]
) -> list[list[int]]:
    """Per-query N_PROBE nearest coarse cells by (d2, cell) — exact
    Python-int twin of the probes window (`ORDER BY d2, cell` rank ≤
    N_PROBE over `_ivf_dist2_arr`), aligned with the qvecs order."""
    out = []
    for _, qv in qvecs:
        d2s = [
            (sum((q - m) ** 2 for q, m in zip(qv, cent)), cell)
            for cell, cent in enumerate(icents)
        ]
        out.append([cell for _, cell in sorted(d2s)[:N_PROBE]])
    return out


def _pq_qv_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-side (vec_id, qv) source: quantization stays the
    `_ivf_qvec` Spark expression (bit-identical lattice — the rounding
    caveat `_ivf_assign_np` documents never arises because numpy only
    ever sees the already-quantized integers), off the spread scan."""
    return _emb_spread(spark, sf_dir).where(
        F.col("vec_id") >= N_QUERIES
    ).select("vec_id", _ivf_qvec("embedding").alias("qv"))


def _adc_scored_np(
    e: DataFrame,
    qvecs: list[tuple[int, list[int]]],
    cents: dict,
    icents: list[list[int]] | None = None,
    probes: list[list[int]] | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, adc_d2) for every (query, candidate) pair
    that survives probe pruning, computed in ONE Arrow pass over the
    quantized candidates (guide §4.2: batch BLAS instead of ~4M
    interpreted HOF lambda evals — measured 1.5 s → 0.48 s for the encode
    leg alone at sf0.1): per batch, PQ codes (and the IVF coarse cell when
    probing) come from exact int64 matmuls with first-min argmin — the
    oracle's ORDER BY d2, cell rank-1 — and adc_d2 is the LUT gather.
    Each batch also prunes to its local top-K per query by (adc_d2,
    neighbor_id): the global top-K per query is contained in every
    batch-local top-K (fewer candidates can only rank a row higher), so
    the downstream window sees hundreds of rows instead of N×queries and
    the ranking is unchanged."""
    import numpy as np
    import pandas as pd

    n_dims = 1 + max(d for (_, d) in cents)
    subs = _pq_sub_dims(n_dims)
    cmats = [
        np.array(
            [[int(cents[(c, d)]) for d in dims] for c in range(PQ_K)],
            dtype=np.int64,
        )
        for dims in subs
    ]
    luts = np.array(_pq_query_lut(qvecs, cents), dtype=np.int64)
    qids = np.array([q for q, _ in qvecs], dtype=np.int64)
    imat = (
        np.array(icents, dtype=np.int64) if icents is not None else None
    )
    parr = (
        [np.array(p, dtype=np.int64) for p in probes]
        if probes is not None
        else None
    )
    sub_idx = np.arange(PQ_M)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf["qv"]), dtype=np.int64)
            nbr = pdf["vec_id"].to_numpy(dtype=np.int64)
            codes = np.empty((len(x), PQ_M), dtype=np.int64)
            for s, dims in enumerate(subs):
                xs, cs = x[:, dims], cmats[s]
                d2 = (
                    (xs * xs).sum(axis=1)[:, None]
                    + (cs * cs).sum(axis=1)[None, :]
                    - 2 * (xs @ cs.T)
                )
                codes[:, s] = d2.argmin(axis=1)  # first min = lowest cell
            if imat is not None:
                cd2 = (
                    (x * x).sum(axis=1)[:, None]
                    + (imat * imat).sum(axis=1)[None, :]
                    - 2 * (x @ imat.T)
                )
                cell = cd2.argmin(axis=1)
            out = []
            for qi in range(len(qids)):
                if parr is not None:
                    keep = np.isin(cell, parr[qi])
                    if not keep.any():
                        continue
                    n_k, c_k = nbr[keep], codes[keep]
                else:
                    n_k, c_k = nbr, codes
                adc = luts[qi][sub_idx, c_k].sum(axis=1)
                top = np.lexsort((n_k, adc))[:TOP_K]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": n_k[top],
                            "adc_d2": adc[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return e.mapInPandas(
        score, "query_id long, neighbor_id long, adc_d2 long"
    )


def _pq_rank_topk(scored: DataFrame) -> DataFrame:
    """Final per-query top-k ranking — the one exchange of the PQ search
    paths, identical (adc_d2, neighbor_id) order and rn semantics to the
    pre-r16 window."""
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "adc_d2", "rn")
    )


_PQ_EMPTY_SCHEMA = "query_id bigint, neighbor_id bigint, adc_d2 bigint, rn int"


_PQ_CODEBOOK_CACHE: dict[tuple[str, str], dict] = {}


def _train_pq_codebooks(spark: SparkSession, sf_dir: str) -> dict:
    """Per-subspace lattice k-means, PQ_ITERS Lloyd rounds, fully
    deterministic (the `_train_ivf_centroids` recipe applied per subspace):
    init = subvectors of the first PQ_K vectors; assignment = integer-L2
    argmin within each subspace (ties → lowest cell); new centroids
    re-rounded to the lattice (round-half-away of Σq/n — same rule both
    engines); a (cell, sub) pair that attracts no vectors carries its
    previous coordinates forward (matches the oracle's NOT EXISTS clause).

    SAMPLE-TRAINED AT THE DRIVER (round 7, same move as
    `_train_ivf_centroids`): two bounded collects (PQ_K init vectors +
    the TRAIN_CAP digest-capped sample) and numpy Lloyd rounds per
    subspace replace the distributed per-round join/agg/collect cycle
    whose cost was job latency, not data. The numpy arithmetic is
    bit-identical to both engines (int64 d2, first-min argmin, float64
    mean division, `_round_half_away`); the oracle replays the same
    sample via its `qs` CTE.

    The trained codebook (PQ_K×dim plain ints — kilobytes) is cached per
    (app, sf_dir): it is the staged model artifact a deployment trains
    once and ships to every encoder. Driver-side dict, bounded, evicted
    with the session."""
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PQ_CODEBOOK_CACHE.get(key)
    if cached is not None:
        return cached
    for k in list(_PQ_CODEBOOK_CACHE):
        if k[0] != key[0]:
            del _PQ_CODEBOOK_CACHE[k]
    e = table(spark, sf_dir, "embeddings")
    qv = e.select("vec_id", _ivf_qvec("embedding").alias("qv"))
    init = qv.where(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()
    if not init:
        raise ValueError("sim_topk_pq: embeddings table is empty")
    cents = np.array([list(r.qv) for r in init], dtype=np.int64)
    sample = qv.orderBy(_train_digest(), "vec_id").limit(TRAIN_CAP).collect()
    x = np.array([list(r.qv) for r in sample], dtype=np.int64)
    n_dims = cents.shape[1]
    # sub = floor(dim * PQ_M / n_dims) — the same pure-position rule
    # `_pq_qe` and the oracle tag dims with
    sub_of = (np.arange(n_dims) * PQ_M) // n_dims
    for _ in range(PQ_ITERS):
        new = cents.copy()
        for s in range(PQ_M):
            dims = np.where(sub_of == s)[0]
            xs, cs = x[:, dims], cents[:, dims]
            d2 = (
                (xs * xs).sum(axis=1)[:, None]
                + (cs * cs).sum(axis=1)[None, :]
                - 2 * (xs @ cs.T)
            )
            a = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = xs[a == c]
                if len(members):
                    mean = members.sum(
                        axis=0, dtype=np.int64
                    ) / np.float64(len(members))
                    new[c, dims] = _round_half_away(mean)
        cents = new
    out = {
        (c, d): int(cents[c, d])
        for c in range(cents.shape[0])
        for d in range(n_dims)
    }
    _PQ_CODEBOOK_CACHE[key] = out
    return out


def _pq_train_parts(p: str = "") -> tuple[list[str], str]:
    """Shared CTE prefix of the PQ oracles: quantize + subspace-tag →
    PQ_ITERS unrolled Lloyd rounds keyed by (sub, cell), empty (cell, sub)
    pairs carrying forward — the `_ivf_train_parts` pattern with the
    subspace key threaded through. ``p`` prefixes every CTE name so the
    IVFPQ composite can embed these rounds next to the IVF trainer's
    without alias collisions (empty prefix = the standalone PQ oracles,
    and the leading WITH, byte-identical to before)."""
    lead = "WITH " if not p else ""
    parts = [
        f"""
    {lead}{p}qv AS MATERIALIZED (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
               CAST(floor(CAST(dim * {PQ_M} AS DOUBLE) / n) AS INTEGER)
                   AS sub,
               CAST(round(CAST(v AS DOUBLE) * {IVF_SCALE}) AS BIGINT) AS q
        FROM (SELECT vec_id, len(embedding) AS n,
                     unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM embeddings)
    ),
    {p}c0 AS (SELECT vec_id AS cell, dim, sub, q AS m
           FROM {p}qv WHERE vec_id < {PQ_K}),
    -- the deterministic TRAIN_CAP-vector training sample (the Spark
    -- trainer's twin): Lloyd rounds iterate {p}qs, encoding scans {p}qv
    {p}qs AS MATERIALIZED (
        SELECT * FROM {p}qv WHERE vec_id IN ({_train_sample_ids_sql()}))"""
    ]
    prev = f"{p}c0"
    for k in range(1, PQ_ITERS + 1):
        parts.append(
            f""",
    {p}a{k} AS MATERIALIZED (
        SELECT vec_id, sub, cell FROM (
            SELECT qv.vec_id, qv.sub, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id, qv.sub
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell)
                       AS rk
            FROM {p}qs qv JOIN {prev} c USING (dim)
            GROUP BY qv.vec_id, qv.sub, c.cell
        ) WHERE rk = 1
    ),
    {p}cm{k} AS MATERIALIZED (
        SELECT a.cell, qv.dim, qv.sub,
               CAST(round(CAST(sum(qv.q) AS DOUBLE) / count(*)) AS BIGINT)
                   AS m
        FROM {p}a{k} a JOIN {p}qs qv
          ON qv.vec_id = a.vec_id AND qv.sub = a.sub
        GROUP BY a.cell, qv.dim, qv.sub
    ),
    {p}c{k} AS MATERIALIZED (
        SELECT * FROM {p}cm{k}
        UNION ALL
        SELECT pp.cell, pp.dim, pp.sub, pp.m FROM {prev} pp
        WHERE NOT EXISTS (SELECT 1 FROM {p}cm{k} x
                          WHERE x.cell = pp.cell AND x.sub = pp.sub)
    )"""
        )
        prev = f"{p}c{k}"
    return parts, prev


def _pq_oracle() -> str:
    parts, prev = _pq_train_parts()
    parts = list(parts)
    parts.append(
        f""",
    codes AS MATERIALIZED (
        SELECT vec_id, sub, cell FROM (
            SELECT qv.vec_id, qv.sub, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id, qv.sub
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell)
                       AS rk
            FROM qv JOIN {prev} c USING (dim)
            WHERE qv.vec_id >= {N_QUERIES}
            GROUP BY qv.vec_id, qv.sub, c.cell
        ) WHERE rk = 1
    ),
    lut AS MATERIALIZED (
        SELECT qv.vec_id AS query_id, qv.sub, c.cell,
               sum((qv.q - c.m) * (qv.q - c.m)) AS d2
        FROM qv JOIN {prev} c USING (dim)
        WHERE qv.vec_id < {N_QUERIES}
        GROUP BY qv.vec_id, qv.sub, c.cell
    ),
    adc AS (
        SELECT l.query_id, k.vec_id AS neighbor_id,
               CAST(sum(l.d2) AS BIGINT) AS adc_d2
        FROM codes k JOIN lut l ON l.sub = k.sub AND l.cell = k.cell
        GROUP BY l.query_id, k.vec_id
    )
    SELECT query_id, neighbor_id, adc_d2, rn FROM (
        SELECT query_id, neighbor_id, adc_d2,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_d2, neighbor_id) AS rn
        FROM adc
    ) WHERE rn <= {TOP_K}"""
    )
    return "".join(parts)


@register("sim_topk_pq", oracle=_pq_oracle())
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-k (Jégou et al., TPAMI 2011) — the
    fourth ANN path next to brute force / LSH / IVF, and the one that wins
    when the corpus no longer fits in memory uncompressed: each vector is
    coded as PQ_M sub-cell ids (here 4×3 bits vs 64×32-bit floats, a 64×
    memory cut), and a query scores a candidate by summing PQ_M lookups in
    a per-query distance table (ADC) instead of a 64-dim dot product.

    EXACT-oracled via the IVF trick: codebooks train per-subspace on the
    integer lattice (`_train_pq_codebooks`), so assignment, the ADC lookup
    table, and the summed distances are all integer arithmetic — DuckDB
    replays the identical Lloyd rounds as unrolled MATERIALIZED CTEs and
    the ranking ties break on (adc_d2, neighbor_id) in both engines.

    Scale shape (100 TB, restructured r16 per guide §8 "decide with small
    rows"): the trained codebook is a PQ_M×PQ_K×subdim integer literal, so
    ENCODING is pure map-side expression work (`_pq_codes_arr` — the r15
    form exploded every vector to 64 dim rows, broadcast-joined the
    codebook ×PQ_K and re-assembled the sums through two hash-agg
    exchanges); the per-query ADC lookup table is a pure function of the
    N_QUERIES collected query vectors + the codebook, computed at the
    driver and shipped as ONE literal — so ADC scoring is also map-side
    and the corpus crosses no exchange at all until the final top-k
    window. Recall vs the exact quantized-L2 ranking is measured by the
    registered `sim_pq_recall_eval` gate."""
    cents = _train_pq_codebooks(spark, sf_dir)
    qvecs = _query_qvecs(spark, sf_dir)
    if not qvecs:
        return spark.createDataFrame([], _PQ_EMPTY_SCHEMA)
    return _pq_rank_topk(
        _adc_scored_np(_pq_qv_src(spark, sf_dir), qvecs, cents)
    )


_LATTICE_EXACT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _lattice_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer-L2 top-k (query_id, neighbor_id) over the IVF
    lattice, memoize-persisted per (app, sf) — the SHARED ground truth
    grading both `sim_pq_recall_eval` and `sim_ivfpq_recall_eval`
    (round-9, closing the r8 ivfpq-eval drift: the two gates previously
    re-ran this identical queries×corpus hash-agg back to back — at
    cluster scale the ground-truth table is staged once per corpus and
    every eval reads it). Pin size is queries×TOP_K rows, trivially
    bounded."""
    from ..caching import memoized_persist

    def build() -> DataFrame:
        # r16: the queries are the decision-sized side (guide §8) — ship
        # them into ONE Arrow pass that computes each corpus row's exact
        # int64 lattice d2 to every query and prunes to the batch-local
        # top-K per query (provably contains the global top-K), instead
        # of exploding the corpus to dim rows and re-assembling sums
        # through a broadcast join + hash-agg exchange. Same (d2,
        # neighbor_id) rank — only the tiny final window shuffles.
        import numpy as np
        import pandas as pd

        qvecs = _query_qvecs(spark, sf_dir)
        if not qvecs:
            return spark.createDataFrame(
                [], "query_id bigint, neighbor_id bigint"
            )
        qmat = np.array([qv for _, qv in qvecs], dtype=np.int64)
        qids = np.array([q for q, _ in qvecs], dtype=np.int64)

        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.array(list(pdf["qv"]), dtype=np.int64)
                nbr = pdf["vec_id"].to_numpy(dtype=np.int64)
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    + (qmat * qmat).sum(axis=1)[None, :]
                    - 2 * (x @ qmat.T)
                )
                out = []
                for qi in range(len(qids)):
                    dq = d2[:, qi]
                    top = np.lexsort((nbr, dq))[:TOP_K]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": qids[qi],
                                "neighbor_id": nbr[top],
                                "d2": dq[top],
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        scored = _pq_qv_src(spark, sf_dir).mapInPandas(
            score, "query_id long, neighbor_id long, d2 long"
        )
        w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    return memoized_persist(_LATTICE_EXACT_CACHE, spark, sf_dir, build)


def _pq_recall_oracle() -> str:
    """Exact integer-L2 ground truth over the SAME lattice quantization vs
    the registered PQ oracle (embedded verbatim) — recall@k measures pure
    coding loss, not quantization-grid loss, which is the PQ acceptance
    number (Jégou's ADC-vs-exact curve)."""
    from ..operators.parity import sql_ratio

    return f"""
    WITH qx AS MATERIALIZED (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
               CAST(round(CAST(v AS DOUBLE) * {IVF_SCALE}) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM embeddings)
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY sum((a.q - b.q) * (a.q - b.q)), b.vec_id)
                       AS rn
            FROM qx a JOIN qx b USING (dim)
            WHERE a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
            GROUP BY a.vec_id, b.vec_id
        ) WHERE rn <= {TOP_K}
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS k_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           {sql_ratio("count(a.neighbor_id)", "count(*)")} AS recall
    FROM exact e
    LEFT JOIN ({_pq_oracle()}) a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """


@register("sim_pq_recall_eval", oracle=_pq_recall_oracle())
def sim_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ acceptance gate: per-query recall@k of `sim_topk_pq`'s ADC
    ranking against the EXACT integer-L2 top-k over the same lattice-
    quantized vectors (so the number isolates coding loss — the metric a
    deployment tunes PQ_M/PQ_K against). Same composition discipline as
    `sim_ann_recall_eval`: the approximate side IS the registered
    operator; the exact side is a brute-force integer-L2 ranking.

    Scale shape: ground truth is queries×corpus but integer hash-agg only
    (no floats to reduce), and it exists to GRADE the approximate path at
    validation scale — production serves from the PQ side alone."""
    exact = _lattice_exact_topk(spark, sf_dir)
    approx = sim_topk_pq(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k_exact"),
            F.count("hit").alias("n_hit"),
            ratio(F.count("hit"), F.count("*")).alias("recall"),
        )
    )


def _ivfpq_oracle() -> str:
    """DuckDB twin of the full IVFPQ index: the IVF trainer's unrolled
    Lloyd rounds (coarse cells) + the PQ trainer's (prefixed `z`) in ONE
    WITH chain, then probe→candidate pruning from IVF and ADC scoring
    from PQ — candidates outside the probed cells are never scored,
    exactly like the Spark side."""
    iparts, iprev = _ivf_train_parts()
    pparts, pprev = _pq_train_parts("z")
    tail = f""",
    probes AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT qv.vec_id, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell)
                       AS rk
            FROM qv JOIN {iprev} c USING (dim)
            WHERE qv.vec_id < {N_QUERIES}
            GROUP BY qv.vec_id, c.cell
        ) WHERE rk <= {N_PROBE}
    ),
    icand AS (
        SELECT vec_id AS neighbor_id, cell FROM (
            SELECT qv.vec_id, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell)
                       AS rk
            FROM qv JOIN {iprev} c USING (dim)
            WHERE qv.vec_id >= {N_QUERIES}
            GROUP BY qv.vec_id, c.cell
        ) WHERE rk = 1
    ),
    pcodes AS (
        SELECT vec_id, sub, cell FROM (
            SELECT qv.vec_id, qv.sub, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id, qv.sub
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell)
                       AS rk
            FROM zqv qv JOIN {pprev} c USING (dim)
            WHERE qv.vec_id >= {N_QUERIES}
            GROUP BY qv.vec_id, qv.sub, c.cell
        ) WHERE rk = 1
    ),
    plut AS (
        SELECT qv.vec_id AS query_id, qv.sub, c.cell,
               sum((qv.q - c.m) * (qv.q - c.m)) AS d2
        FROM zqv qv JOIN {pprev} c USING (dim)
        WHERE qv.vec_id < {N_QUERIES}
        GROUP BY qv.vec_id, qv.sub, c.cell
    ),
    ppairs AS (
        SELECT p.query_id, a.neighbor_id
        FROM probes p JOIN icand a USING (cell)
    ),
    adc AS (
        SELECT pr.query_id, pr.neighbor_id,
               CAST(sum(l.d2) AS BIGINT) AS adc_d2
        FROM ppairs pr
        JOIN pcodes k ON k.vec_id = pr.neighbor_id
        JOIN plut l ON l.query_id = pr.query_id
                   AND l.sub = k.sub AND l.cell = k.cell
        GROUP BY pr.query_id, pr.neighbor_id
    )
    SELECT query_id, neighbor_id, adc_d2, rn FROM (
        SELECT query_id, neighbor_id, adc_d2,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_d2, neighbor_id) AS rn
        FROM adc
    ) WHERE rn <= {TOP_K}"""
    return "".join(iparts) + "," + "".join(pparts) + tail


@register("sim_topk_ivfpq", oracle=_ivfpq_oracle())
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composite ANN index — the architecture billion-scale
    deployments actually serve (FAISS `IVFxx,PQyy`): the IVF coarse
    quantizer prunes each query to its N_PROBE nearest inverted lists,
    and candidates in those lists are scored by the PQ ADC lookup instead
    of a full-width distance — so query cost is (lists probed) ×
    (PQ_M table lookups per candidate), independent of both corpus size
    and embedding width.

    Pure composition of the two registered trainers (`sim_topk_ivf`'s
    lattice k-means and `sim_topk_pq`'s per-subspace codebooks, both
    cached per (app, sf)); the oracle chains both trainers' unrolled CTE
    rounds in one WITH (PQ's prefixed `z`) and prunes before scoring
    exactly as the engine does. All-integer arithmetic end to end —
    EXACT. Scale shape (restructured r16, guide §8/§2.4): the query-time
    decisions — each query's N_PROBE probe list AND its PQ_M×PQ_K ADC
    lookup table — are pure functions of the N_QUERIES collected query
    vectors plus the two driver-trained model artifacts, so both ship as
    literals, and the corpus makes ONE fused map-side pass (coarse
    assignment + PQ codes in the same projection — the r15 form ran two
    corpus passes, one per leg, and re-paired them through a
    neighbor_id join). Candidates outside a query's probed cells drop in
    a map-side filter; nothing shuffles until the final top-k window."""
    icents = _train_ivf_centroids(spark, sf_dir)
    pqc = _train_pq_codebooks(spark, sf_dir)
    qvecs = _query_qvecs(spark, sf_dir)
    if not qvecs:
        return spark.createDataFrame([], _PQ_EMPTY_SCHEMA)
    probes = _ivf_probes_py(qvecs, icents)
    return _pq_rank_topk(
        _adc_scored_np(
            _pq_qv_src(spark, sf_dir),
            qvecs,
            pqc,
            icents=icents,
            probes=probes,
        )
    )


def _ivfpq_recall_oracle() -> str:
    """Exact integer-L2 ground truth on the lattice vs the registered
    IVFPQ oracle embedded verbatim as a WITH-subquery — recall@k here
    bounds the COMBINED loss (coarse-probe pruning + PQ coding), the
    end-to-end number an `IVFx,PQy` deployment actually serves under."""
    from ..operators.parity import sql_ratio

    return f"""
    WITH qx AS MATERIALIZED (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
               CAST(round(CAST(v AS DOUBLE) * {IVF_SCALE}) AS BIGINT) AS q
        FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM embeddings)
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY sum((a.q - b.q) * (a.q - b.q)), b.vec_id)
                       AS rn
            FROM qx a JOIN qx b USING (dim)
            WHERE a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
            GROUP BY a.vec_id, b.vec_id
        ) WHERE rn <= {TOP_K}
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS k_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           {sql_ratio("count(a.neighbor_id)", "count(*)")} AS recall
    FROM exact e
    LEFT JOIN ({_ivfpq_oracle()}) a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """


@register("sim_ivfpq_recall_eval", oracle=_ivfpq_recall_oracle())
def sim_ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ acceptance gate: per-query recall@k of the composite index
    against the EXACT integer-L2 top-k over the same lattice — the
    end-to-end serving-quality number, bounding coarse-probe loss (a
    true neighbor living in an unprobed cell) PLUS coding loss (ADC
    misranking inside probed cells) together. Same composition
    discipline as `sim_pq_recall_eval`: the approximate side IS the
    registered `sim_topk_ivfpq`; the exact side is the brute-force
    integer-L2 ranking that exists only to grade it at validation scale.

    Scale shape: identical to the PQ gate — ground truth is the SHARED
    staged integer-L2 relation (`_lattice_exact_topk`, built once per
    (app, sf) and read by both PQ-family gates); everything downstream
    is a broadcast of the k-bounded approximate result."""
    exact = _lattice_exact_topk(spark, sf_dir)
    approx = sim_topk_ivfpq(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(F.broadcast(approx), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k_exact"),
            F.count("hit").alias("n_hit"),
            ratio(F.count("hit"), F.count("*")).alias("recall"),
        )
    )


MRL_CAND = 20  # truncated-stage candidates per query before full rescoring


def _matryoshka_topk_oracle() -> str:
    trunc_cos = f"""
        SELECT va, vb,
               round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
                   + 0.0 AS cosine
        FROM (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   CAST(unnest(a.embedding[1:{TRUNC_DIM}]) AS DOUBLE) AS x,
                   CAST(unnest(b.embedding[1:{TRUNC_DIM}]) AS DOUBLE) AS y
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
        )
        GROUP BY va, vb
    """
    return f"""
    WITH tcos AS ({trunc_cos}),
    cand AS (
        SELECT query_id, neighbor_id FROM (
            SELECT va AS query_id, vb AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY va ORDER BY cosine DESC, vb
                   ) AS rn
            FROM tcos
        ) WHERE rn <= {MRL_CAND}
    ),
    full_cos AS (
        SELECT query_id, neighbor_id,
               round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
                   + 0.0 AS cosine
        FROM (
            SELECT c.query_id, c.neighbor_id,
                   CAST(unnest(qa.embedding) AS DOUBLE) AS x,
                   CAST(unnest(qb.embedding) AS DOUBLE) AS y
            FROM cand c
            JOIN embeddings qa ON qa.vec_id = c.query_id
            JOIN embeddings qb ON qb.vec_id = c.neighbor_id
        )
        GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rn FROM (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS rn
        FROM full_cos
    ) WHERE rn <= {TOP_K}
    """


@register("sim_topk_matryoshka", oracle=_matryoshka_topk_oracle())
def sim_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage retrieval (Kusupati et al. 2022 MRL — the
    coarse-to-fine pattern production vector stores run): stage 1 ranks
    candidates with the FIRST {TRUNC_DIM} dims only (4× fewer vector
    bytes scanned — at deployment the truncated index is the one that
    fits in memory), keeping {MRL_CAND} per query; stage 2 rescores only
    those with the full {TRUNC_DIM}×4-dim exact cosine and emits top-k.
    The operator `sim_matryoshka_eval` gates is the search path itself:
    its measured truncation recall bounds this operator's recall, since
    stage 2 never resurrects a candidate stage 1 dropped.

    Scale shape: stage 1 is the broadcast-queries × truncated-scan shape
    of `sim_topk_search`; stage 2 touches MRL_CAND×queries rows — the
    full-dim relation is probed, never scanned. Both stages rank on the
    ROUNDED cosine with neighbor_id tiebreaks (cross-engine rank safety).
    """
    e = table(spark, sf_dir, "embeddings")
    te = F.slice("embedding", 1, TRUNC_DIM)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        te.alias("qe"),
        _norm(te).alias("qn"),
    )
    # candidate leg off the spread source (guide §2.5): the truncated-
    # cosine fan-out otherwise fuses into the one scan task
    c = _emb_spread(spark, sf_dir).where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        te.alias("ce"),
        _norm(te).alias("cn"),
    )
    tcos = _cosine_prenormed(
        F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("tcosine"), "neighbor_id"
    )
    cand = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "neighbor_id",
            (F.round(tcos, 4) + F.lit(0.0)).alias("tcosine"),
        )
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= MRL_CAND)
        .select("query_id", "neighbor_id")
    )
    # only vec_id < N_QUERIES rows can match cand's query_id — filter
    # BEFORE broadcasting so the stage-2 query side stays a bounded
    # N_QUERIES-row relation rather than an ungated corpus-sized broadcast
    qf = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm("embedding").alias("qn"),
    )
    cf = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm("embedding").alias("cn"),
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    rescored = (
        cand.join(F.broadcast(qf), "query_id")
        .join(cf, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), "neighbor_id"
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


RRF_K = 60  # Cormack et al.'s reciprocal-rank-fusion constant
RRF_SCALE = 100_000_000  # per-rank quotients on the 1e-8 integer lattice


def _hybrid_rrf_oracle() -> str:
    # importing the text search module first guarantees text_bm25's oracle
    # is registered even when a caller imports llm.* directly rather than
    # through registry.all_queries() (whose import order is text-first)
    from ..text import search as _search  # noqa: F401
    from ..registry import ORACLES

    def q(rank: str) -> str:
        # half-away-rounded 1/(K + rank) on the lattice — the boundary-proof
        # integer quotient both engines evaluate with identical int64 ops
        return (
            f"CASE WHEN {rank} IS NULL THEN 0 ELSE "
            f"CAST(floor((2 * {RRF_SCALE} + ({RRF_K} + {rank}))"
            f" / (2.0 * ({RRF_K} + {rank}))) AS BIGINT) END"
        )

    return f"""
    WITH bm AS ({ORACLES["text_bm25"]}),
    br AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25
        FROM bm
    ),
    vr AS (
        SELECT neighbor_id AS doc_id, rn AS r_vec
        FROM ({ORACLES["sim_topk_search"]}) WHERE query_id = 0
    ),
    fused AS (
        SELECT coalesce(br.doc_id, vr.doc_id) AS doc_id,
               br.r_bm25, vr.r_vec,
               {q("br.r_bm25")} + {q("vr.r_vec")} AS rrf_q8
        FROM br FULL OUTER JOIN vr ON br.doc_id = vr.doc_id
    )
    SELECT doc_id, r_bm25, r_vec, rrf_q8
    FROM fused ORDER BY rrf_q8 DESC, doc_id LIMIT 10
    """


@register("search_hybrid_rrf", oracle=_hybrid_rrf_oracle())
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher 2009 — the fusion rule production hybrid search runs):
    fuse the lexical BM25 top-10 (`text_bm25`, the reference's implied
    ranking consumer) with the vector top-k (`sim_topk_search`, query
    vector 0 standing for the query's embedding; vec_id ≡ doc_id on the
    fixture) by RRF score Σ 1/(K + rank), K={RRF_K} — the capstone of the
    search surface: the same index pipeline the reference attempted, plus
    the modern dense leg, joined at the rank level so neither side's
    score scale matters.

    Parity: ranks are row_numbers over each side's ROUNDED emitted
    ordering (deterministic cross-engine); each 1/(K+rank) quantizes to
    the 1e-8 lattice via the boundary-proof half-away integer quotient
    and the fused score is an exact INTEGER sum — no float accumulation.
    Scale shape: both legs are registered top-k relations (≤ k rows);
    the fusion is a k-row full outer join + TakeOrdered."""
    from ..text.search import bm25

    bm = bm25(spark, sf_dir)
    wb = Window.orderBy(F.desc("bm25"), "doc_id")
    br = bm.select(
        "doc_id", F.row_number().over(wb).cast("long").alias("r_bm25")
    )
    vr = (
        sim_topk_search(spark, sf_dir)
        .where(F.col("query_id") == 0)
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rn").cast("long").alias("r_vec"),
        )
    )

    def q(rank):
        return F.when(rank.isNull(), F.lit(0).cast("long")).otherwise(
            F.floor(
                (2 * RRF_SCALE + (RRF_K + rank))
                / (2.0 * (RRF_K + rank))
            ).cast("long")
        )

    fused = br.join(vr, "doc_id", "full").select(
        "doc_id",
        "r_bm25",
        "r_vec",
        (q(F.col("r_bm25")) + q(F.col("r_vec"))).alias("rrf_q8"),
    )
    return fused.orderBy(F.desc("rrf_q8"), "doc_id").limit(10)


RANGE_TAU = 0.3  # cosine radius for range search (bounded non-empty at
# every fixture SF: 20/18/66 matching pairs at sf0.001/0.01/0.1)


@register(
    "sim_range_search",
    oracle=f"""
    WITH cos AS (
        {_COS_SQL.format(pair_pred=f"a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}")}
    )
    SELECT va AS query_id, vb AS neighbor_id, cosine
    FROM cos WHERE cosine >= {RANGE_TAU}
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (threshold) search: ALL neighbors with cosine >= RANGE_TAU of
    each query — the other retrieval contract next to top-k (faiss
    ``range_search``; the shape blocklist screening and near-dup lookup
    actually need, where "how many are close" matters and k is unknowable
    in advance).

    Same execution skeleton as `sim_topk_search` (broadcast query set x
    candidate scan, prenormed JVM-side cosine) but the window/rank stage
    disappears entirely — the tau predicate is a plain vectorized filter,
    so the operator is one whole-stage-codegen scan with NO shuffle at
    all (top-k needs the per-query window exchange). At 100 TB the
    brute scan is the correctness baseline; the deployed path composes
    the same predicate over IVF-probed partitions
    (`sink_ivf_partitioned_ann` is that layout).

    Filtering happens on the ROUNDED cosine (the family's proven 4dp
    cross-engine form) so the tau boundary cannot drift between engines.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm("embedding").alias("qn"),
    )
    # NOT spread: this op's pinned contract (test_range_search_is_shuffle
    # _free) is the ZERO-shuffle broadcast-driven scan — the brute radius
    # baseline stays exchange-free by design; its tau tail has no window.
    c = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm("embedding").alias("cn"),
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "neighbor_id",
            (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
        )
        .where(F.col("cosine") >= RANGE_TAU)
    )


IVF_SINK_NAME = "ivf_ann"  # under the per-app sink root (session.app_sink_dir)


def _ivf_store_write(
    spark: SparkSession, sf_dir: str, cents: list[list[int]], out: str
) -> None:
    """Write the candidate corpus PARTITIONED BY its IVF home cell — the
    stored inverted-list layout shared by `sink_ivf_partitioned_ann`,
    `sink_ivf_range_lookup` and (incrementally) `sink_ivf_ann_append`.
    Assignment cost is paid once here; every reader prunes directories."""
    # spread before assigning (guide §2.5): the per-row centroid assignment
    # otherwise runs on the one scan task. The pre-write repartition("cell")
    # re-clusters rows by home cell so each directory still gets ONE file
    # per cell (guide §6 output sizing) instead of one per spread task.
    e = _emb_spread(spark, sf_dir)
    (
        e.where(F.col("vec_id") >= N_QUERIES)
        .select(
            "vec_id",
            "embedding",
            _ivf_assign(_ivf_qvec("embedding"), cents).alias("cell"),
        )
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out)
    )


def _ivf_probe_frame(
    spark: SparkSession, sf_dir: str, cents: list[list[int]]
) -> DataFrame:
    """(query_id, qe, qn, cell): each query replicated onto its N_PROBE
    nearest cells — the broadcast side of every stored-layout read."""
    e = table(spark, sf_dir, "embeddings")
    q_dists = _ivf_dist2_arr(_ivf_qvec("embedding"), cents)
    return (
        e.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            _norm("embedding").alias("qn"),
            F.posexplode(q_dists).alias("cell", "d2"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d2", "cell")
            ),
        )
        .where(F.col("rk") <= N_PROBE)
        .select("query_id", "qe", "qn", F.col("cell").cast("int").alias("cell"))
    )


def _ivf_stored_scores(
    spark: SparkSession, sf_dir: str, cents: list[list[int]], out: str
) -> DataFrame:
    """Probed cosine scores over the STORED layout: bounded probe-cell
    collect (<= N_QUERIES x N_PROBE values at any corpus size) becomes a
    static `cell IN (...)` predicate pruned at the directory level, then
    per-query restriction rides a broadcast join on `cell`. Shared tail of
    the stored top-k and stored radius contracts."""
    probes = _ivf_probe_frame(spark, sf_dir, cents)
    # bounded collect: the static pruning predicate (<= 10 cell values)
    cells = sorted(
        {r.cell for r in probes.select("cell").distinct().collect()}
    )
    stored = spark.read.parquet(out).where(F.col("cell").isin(cells)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm("embedding").alias("cn"),
        F.col("cell").cast("int").alias("cell"),
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    return F.broadcast(probes).join(stored, "cell").select(
        "query_id",
        "neighbor_id",
        (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
    )


@register("sink_ivf_partitioned_ann", oracle=_ivf_oracle())
def sink_ivf_partitioned_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED ANN index: embeddings written to parquet PARTITIONED BY
    their IVF cell, then probed with a partition-pruned read — the
    `sink_term_bucketed_lookup` story for vectors, and the layout every
    100 TB ANN deployment actually uses (faiss-on-object-store / LanceDB
    style: the inverted lists ARE the directory layout). `sim_topk_ivf`
    re-derives cell assignment per query; here assignment cost is paid
    ONCE at write time, and a query's N_PROBE cells become a static
    `cell IN (...)` predicate that prunes at the DIRECTORY level — the
    scan's PartitionFilters line (pinned in tests/test_plans.py) proves
    no byte outside the probed cells is read.

    The probe-cell list is a bounded driver collect (<= N_QUERIES x
    N_PROBE = 10 rows at ANY corpus size — the trainer-collect class);
    per-query restriction then rides a broadcast join on `cell`. Result
    contract and oracle are IDENTICAL to `sim_topk_ivf`, so the gate
    certifies the full store -> prune -> scan round trip against the
    same unrolled-Lloyd DuckDB twin."""
    out = app_sink_dir(spark, IVF_SINK_NAME, "SPARK_GRAFT_IVF_SINK_DIR")
    cents = _train_ivf_centroids(spark, sf_dir)
    _ivf_store_write(spark, sf_dir, cents, out)
    scored = _ivf_stored_scores(spark, sf_dir, cents, out)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def _range_ivf_oracle() -> str:
    """The shared probed-pair cosine prefix filtered at RANGE_TAU — the
    radius contract over the IVF-pruned candidate set."""
    return (
        _ivf_cos_prefix()
        + f"""
    SELECT va AS query_id, vb AS neighbor_id, cosine
    FROM cos WHERE cosine >= {RANGE_TAU}"""
    )


@register("sim_range_search_ivf", oracle=_range_ivf_oracle())
def sim_range_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search over the IVF-probed candidate set — the SCALE path for
    `sim_range_search` the way `sim_topk_ivf` is for `sim_topk_search`:
    each query's tau-ball is scanned only inside its N_PROBE nearest cells,
    so the per-query cost is the probed-list volume instead of the corpus.
    Measured caveat (sf3.0 study, BASELINE.md r14): THIS on-the-fly form
    re-derives every candidate's cell per invocation — O(corpus)
    assignment that loses to the brute scan at small query batches (9.2 s
    vs 1.2 s at 60k vectors / 5 queries); it is the right shape only when
    assignment is already materialized in-pipeline (the SemDeDup flows).
    The DEPLOYMENT radius path is `sink_ivf_range_lookup`, where
    assignment is paid once at write and the recurring pruned read
    measured 7x under this op. Approximate BY DESIGN:
    a tau-neighbor whose home cell isn't probed is missed — the recall
    honestly measured by `sim_range_recall_eval` (the family's gate
    discipline: every approximate path ships with its quality metric).

    Same candidate generation as `sim_topk_ivf` (broadcast probe list,
    home-cell equi-join, rounded 4dp cosine); only the contract tail
    differs — a vectorized tau filter instead of the per-query window, so
    like the brute radius scan it needs NO shuffle after the join."""
    cents = _train_ivf_centroids(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    qv = _ivf_qvec("embedding")
    # candidate leg off the spread source (guide §2.5): per-row centroid
    # assignment + the probe-join scoring folds otherwise fuse into the
    # one scan task
    cand = _emb_spread(spark, sf_dir).where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm("embedding").alias("cn"),
        _ivf_assign(qv, cents).alias("cell"),
    )
    q_dists = _ivf_dist2_arr(qv, cents)
    probes = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            _norm("embedding").alias("qn"),
            F.posexplode(q_dists).alias("cell", "d2"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d2", "cell")
            ),
        )
        .where(F.col("rk") <= N_PROBE)
        .select("query_id", "qe", "qn", "cell")
    )
    cos = _cosine_prenormed(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn"))
    return (
        F.broadcast(probes)
        .join(cand, "cell")
        .select(
            "query_id",
            "neighbor_id",
            (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
        )
        .where(F.col("cosine") >= RANGE_TAU)
    )


def _range_recall_oracle() -> str:
    """Compose the exact and IVF-pruned radius oracles (both EXACT for
    their own semantics) — the eval grades the SAME pair sets the
    operators emit."""
    from ..operators.parity import sql_ratio
    from ..registry import ORACLES

    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           {sql_ratio("count(a.neighbor_id)", "count(*)")} AS recall
    FROM ({ORACLES["sim_range_search"]}) e
    LEFT JOIN ({ORACLES["sim_range_search_ivf"]}) a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    """


@register("sim_range_recall_eval", oracle=_range_recall_oracle())
def sim_range_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance gate for the pruned radius search: share of the exact
    tau-ball mass (`sim_range_search`) reachable inside the probed cells
    (`sim_range_search_ivf`) — precision is 1 by construction (every
    emitted pair is cosine-verified), so recall is the ONLY number the
    approximation trades. Pure composition of the two registered
    operators; both sides are tau-ball-sized, broadcast join."""
    exact = sim_range_search(spark, sf_dir).select("query_id", "neighbor_id")
    pruned = sim_range_search_ivf(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return exact.join(
        F.broadcast(pruned), ["query_id", "neighbor_id"], "left"
    ).agg(
        F.count("*").alias("n_exact"),
        F.count("hit").alias("n_hit"),
        ratio(F.count("hit"), F.count("*")).alias("recall"),
    )


@register("sink_ivf_range_lookup", oracle=_range_ivf_oracle())
def sink_ivf_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search over the STORED partition-pruned ANN layout — the
    blocklist-screening deployment shape end-to-end (VERDICT r13 item 4):
    `sink_ivf_partitioned_ann`'s store -> directory-prune -> scan round
    trip composed with `sim_range_search_ivf`'s tau predicate. Assignment
    is paid once at write; the probe-cell list is the same bounded
    (<= N_QUERIES x N_PROBE) collect that becomes a static `cell IN (...)`
    PartitionFilters predicate (pinned in tests/test_plans.py); and the
    contract tail is a plain vectorized filter, so past the pruned read
    there is NO shuffle at all (top-k needs the per-query window).

    Result contract and oracle are IDENTICAL to `sim_range_search_ivf`,
    so the gate certifies that the physical route through the stored
    layout changes nothing about the tau-ball semantics."""
    out = app_sink_dir(spark, IVF_SINK_NAME, "SPARK_GRAFT_IVF_SINK_DIR")
    cents = _train_ivf_centroids(spark, sf_dir)
    _ivf_store_write(spark, sf_dir, cents, out)
    return _ivf_stored_scores(spark, sf_dir, cents, out).where(
        F.col("cosine") >= RANGE_TAU
    )


APPEND_BATCH = 6  # tail vec_ids appended incrementally (see op docstring)


def _ivf_append_oracle() -> str:
    """DuckDB twin of the post-append stored relation: the frozen-centroid
    assignment of EVERY candidate (base ∪ batch) — base and batch rows are
    assigned by the same trained quantizer, so the union read-back equals
    the full assignment relation (`cand`'s rk=1 rule over all vec_id >=
    N_QUERIES, cell surfaced)."""
    parts, prev = _ivf_train_parts()
    return "".join(parts) + f""",
    asg AS (
        SELECT vec_id, cell FROM (
            SELECT qv.vec_id, c.cell,
                   row_number() OVER (PARTITION BY qv.vec_id
                       ORDER BY sum((qv.q - c.m) * (qv.q - c.m)), c.cell) AS rk
            FROM qv JOIN {prev} c USING (dim)
            WHERE qv.vec_id >= {N_QUERIES}
            GROUP BY qv.vec_id, c.cell
        ) WHERE rk = 1
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM asg"""


def sink_ivf_ann_append_steps(
    spark: SparkSession,
    sf_dir: str,
    out: str,
    on_base_written=None,
) -> DataFrame:
    """Stepwise body of `sink_ivf_ann_append` with a post-base-write hook so
    tests can snapshot the untouched-cell files before the append runs."""
    cents = _train_ivf_centroids(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    assigned = e.where(F.col("vec_id") >= N_QUERIES).select(
        "vec_id",
        "embedding",
        _ivf_assign(_ivf_qvec("embedding"), cents).alias("cell"),
    )
    # deterministic "new arrivals" batch: the APPEND_BATCH highest vec_ids
    # (<= APPEND_BATCH cells touched, so untouched cells exist at any SF).
    max_id = e.agg(F.max("vec_id")).collect()[0][0]
    is_batch = F.col("vec_id") > F.lit(int(max_id) - APPEND_BATCH)
    assigned.where(~is_batch).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(out)
    if on_base_written is not None:
        on_base_written(out)
    batch = assigned.where(is_batch)
    # bounded collect: the touched-cell list (<= APPEND_BATCH values)
    touched = sorted(
        {r.cell for r in batch.select("cell").distinct().collect()}
    )
    # Restate ONLY the touched cells: existing rows recomputed from the
    # source relation (never read-modify-write the path being overwritten)
    # unioned with the batch, written with partitionOverwriteMode=dynamic —
    # untouched cell directories' files stay byte-identical (pinned in
    # tests/test_llm_ops.py).
    restated = assigned.where(
        F.col("cell").isin(touched) & ~is_batch
    ).unionByName(batch)
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(out)
    )
    return spark.read.parquet(out).select(
        "vec_id", F.col("cell").cast("bigint").alias("cell")
    )


@register("sink_ivf_ann_append", oracle=_ivf_append_oracle())
def sink_ivf_ann_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance for the stored ANN index (VERDICT r13 item
    5): a new embedding batch lands in the `partitionBy(cell)` layout
    WITHOUT retraining the quantizer and WITHOUT rewriting untouched
    inverted lists — the `text_index_incremental` story for vectors.

    Mechanics: assign the batch against the FROZEN centroids (the model
    artifact a cluster would broadcast; the trainer never sees the batch
    path at append time), derive the touched-cell list from the batch
    (bounded driver collect, <= batch-cell count values), then restate
    ONLY those cells via dynamic partition overwrite — the
    `sink_dynamic_overwrite` machinery, so concurrent appends to disjoint
    cells compose, and every untouched cell directory is byte-identical
    afterwards (pinned in tests). At 100 TB this is the difference between
    an O(batch) nightly index refresh and an O(corpus) rebuild.

    Oracle: the union read-back equals the frozen-quantizer assignment of
    ALL candidates, so the gate certifies the merged relation, not just
    the batch."""
    out = app_sink_dir(spark, "ivf_ann_append", "SPARK_GRAFT_IVF_APPEND_DIR")
    return sink_ivf_ann_append_steps(spark, sf_dir, out)


RNN_K = 5  # neighbor-list depth for reciprocal-NN mining


@register(
    "sim_reciprocal_nn_pairs",
    oracle=f"""
    WITH sym AS (
        {_COS_SQL.format(pair_pred="a.vec_id < b.vec_id")}
    ),
    dir AS (
        SELECT va AS src, vb AS dst, cosine FROM sym
        UNION ALL
        SELECT vb AS src, va AS dst, cosine FROM sym
    ),
    knn AS (
        SELECT src, dst, cosine,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cosine DESC, dst) AS rk
        FROM dir
    ),
    k AS (SELECT * FROM knn WHERE rk <= {RNN_K})
    SELECT f.src AS va, f.dst AS vb, f.cosine,
           CAST(f.rk AS BIGINT) AS rank_ab,
           CAST(g.rk AS BIGINT) AS rank_ba
    FROM k f JOIN k g ON f.src = g.dst AND f.dst = g.src
    WHERE f.src < f.dst
    """,
)
def sim_reciprocal_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN pair mining: pairs where EACH vector is in the other's
    top-{RNN_K} neighbor list — the strict symmetric-evidence criterion
    (reciprocal nearest neighbors — Qin et al. 2011 re-ranking, RNN-DBSCAN;
    public method) that cuts hub-induced false candidates one-sided kNN
    admits: a hub vector appears in everyone's list, but reciprocity
    requires the interest to be mutual. The dedup/matching review queue
    one notch stricter than `sim_nearest_pairs`' global top-20.

    Engine shape: the blocked all-pairs machinery (`blocked_pair_groups`,
    one BLAS matmul per block pair inside applyInPandas) emits per-group
    DIRECTED local top-{RNN_K} lists under the global (cosine DESC, dst)
    total order — taking a local top-k under the same total order
    preserves the global top-k, so the per-src re-rank window sees
    ≤ groups·k rows per src (bounded fan-in, never a corpus-wide sort);
    reciprocity is one self-equi-join on the reversed pair. Cosines are
    rounded to the oracle's 4-dp lattice inside the kernel (the
    `sim_nearest_pairs` parity discipline)."""
    import numpy as np
    import pandas as pd

    def knn_local(pdf: pd.DataFrame) -> pd.DataFrame:
        l, r = pdf[pdf["side"] == "L"], pdf[pdf["side"] == "R"]
        if l.empty or r.empty:
            return pd.DataFrame({"src": [], "dst": [], "cosine": []})
        lid = l["vec_id"].to_numpy(dtype=np.int64)
        rid = r["vec_id"].to_numpy(dtype=np.int64)
        lm = np.array(list(l["embedding"]), dtype=np.float64)
        rm = np.array(list(r["embedding"]), dtype=np.float64)
        nl = np.linalg.norm(lm, axis=1)
        nr = np.linalg.norm(rm, axis=1)
        sim = np.round((lm @ rm.T) / np.outer(nl, nr), 4)
        same = bool(pdf["same"].iloc[0])
        srcs, dsts, coss = [], [], []

        def emit_topk(src_ids, dst_ids, mat):
            # per row: top-K under (cosine DESC, dst ASC) — the global
            # total order, so local winners are global candidates
            for i in range(mat.shape[0]):
                row = mat[i]
                mask = np.ones(len(dst_ids), dtype=bool)
                if same:
                    mask = dst_ids != src_ids[i]
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                order = np.lexsort((dst_ids[idx], -row[idx]))[:RNN_K]
                pick = idx[order]
                srcs.extend([src_ids[i]] * len(pick))
                dsts.extend(dst_ids[pick])
                coss.extend(row[pick])

        emit_topk(lid, rid, sim)
        if not same:
            emit_topk(rid, lid, sim.T)
        return pd.DataFrame({"src": srcs, "dst": dsts, "cosine": coss})

    local = blocked_pair_groups(spark, sf_dir).groupBy("pair_id").applyInPandas(
        knn_local, "src long, dst long, cosine double"
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    knn = (
        local.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= RNN_K)
        .select("src", "dst", "cosine", F.col("rk").cast("long").alias("rk"))
    )
    g = knn.select(
        F.col("src").alias("dst"),
        F.col("dst").alias("src"),
        F.col("rk").alias("rank_ba"),
    )
    return (
        knn.join(g, ["src", "dst"])
        .where(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("va"),
            F.col("dst").alias("vb"),
            "cosine",
            F.col("rk").alias("rank_ab"),
            "rank_ba",
        )
    )
