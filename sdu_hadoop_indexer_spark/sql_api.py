"""Declarative SQL entry point (SURVEY.md §3.4 lifecycle #2).

The reference's only interface was a hand-assembled Hadoop Job
(App.scala:242-259). The new engine's second lifecycle is ``spark.sql`` over
registered views: base fixture tables (catalog.register_views) PLUS the
derived search relations (token stream, flat/nested index, doclen), so a
user can query the inverted index in pure SQL with the identical Catalyst
lifecycle the DataFrame API gets — same plans, same pushdown, same AQE.

Both queries below are authored as SQL TEXT, not DataFrame calls, to pin
that surface; their oracles are the same shape in DuckDB dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views
from .registry import register
from .text.indexer import TOK_SQL, doclen, index_flat, index_nested, tokenize


def register_search_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose base tables + derived search relations to spark.sql()."""
    register_views(spark, sf_dir)
    tokenize(spark, sf_dir).createOrReplaceTempView("doc_tokens")
    index_flat(spark, sf_dir).createOrReplaceTempView("text_index")
    index_nested(spark, sf_dir).createOrReplaceTempView("text_index_nested_v")
    doclen(spark, sf_dir).createOrReplaceTempView("doc_lengths")


@register(
    "sql_revenue_topn",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) + 0.0 AS revenue,
           c_mktsegment
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, c_mktsegment
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def sql_revenue_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + agg + top-n, authored as pure SQL text.

    Same lifecycle as the DataFrame API after parsing: the segment filter
    pushes into the customer scan, the dimension side broadcasts under AQE,
    and the top-n is TakeOrderedAndProject — nothing about using SQL text
    changes the physical plan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) + 0.0 AS revenue,
               c_mktsegment
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, c_mktsegment
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """
    )


@register(
    "sql_index_search",
    oracle=f"""
    WITH {TOK_SQL},
    flat AS (
        SELECT term, doc_id, list(pos ORDER BY pos) AS positions, count(*) AS tf
        FROM tok GROUP BY term, doc_id
    ),
    dls AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)
    SELECT f.doc_id, f.tf, d.dl,
           CAST(floor(CAST((f.tf) * 20000 + (d.dl) AS DOUBLE) / (2 * (d.dl))) AS DOUBLE) / 10000.0 AS norm_tf
    FROM flat f JOIN dls d USING (doc_id)
    WHERE f.term = 'join'
    ORDER BY norm_tf DESC, f.doc_id
    LIMIT 25
    """,
)
def sql_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL query over the DERIVED index views: length-normalized term
    frequency for one term, ranked — proves the inverted index is a
    first-class SQL relation, not only a Python-side DataFrame."""
    register_search_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT f.doc_id, f.tf, d.dl,
               CAST(floor(CAST(f.tf * 20000 + d.dl AS DOUBLE)
                          / (2 * d.dl)) AS DOUBLE) / 10000.0 AS norm_tf
        FROM text_index f JOIN doc_lengths d USING (doc_id)
        WHERE f.term = 'join'
        ORDER BY norm_tf DESC, f.doc_id
        LIMIT 25
        """
    )


_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("sql_local_supplier_volume", oracle=_Q5_SQL)
def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape as pure SQL text: revenue per nation where customer
    and supplier share the nation, region- and date-filtered — the widest
    join tree in the suite (6 tables). Catalyst broadcast-joins the four
    dimension tables, pushes the date range into the orders scan and the
    region filter through the nation→region chain; the only wide shuffles
    are the two fact-table joins and the final small agg. Identical SQL
    text runs on both engines (decimal-summed for order-independent
    parity)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)


# TPC-H Q4 shape adapted to the fixture schema (no l_commitdate /
# l_receiptdate columns): an order "shipped late" when SOME line item left
# more than 60 days after the order date. Same decisive features as Q4:
# EXISTS → semi join (each order counted ONCE however many lines are late),
# date-window fact filter, tiny grouped count.
_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_order_priority", oracle=_Q4_SQL)
def sql_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape as pure SQL text: late-shipment order counts per
    priority via a correlated EXISTS — the canonical semi-join-to-agg
    lifecycle the DataFrame surface covers with `join_semi`. Catalyst
    plans the EXISTS as a LeftSemi hash join keyed on l_orderkey (each
    order emitted once regardless of how many lines are late — a plain
    inner join would over-count), pushes the one-year window into the
    orders scan, and the final agg is priorities-sized. Identical SQL text
    runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


_RCTE_SQL = """
WITH RECURSIVE edges AS (
    SELECT DISTINCT a, b FROM (
        SELECT t.toks[{a_idx}] AS a, t.toks[{b_idx}] AS b
        FROM (
            SELECT {tok_expr} AS toks FROM documents
        ) t{lateral} {range_expr}
    ) WHERE a <> b
),
reach(term, hops) AS (
    SELECT 'spark', 0
    UNION ALL
    SELECT e.b, r.hops + 1
    FROM reach r JOIN edges e ON e.a = r.term
    WHERE r.hops < 2
)
SELECT term, CAST(min(hops) AS INTEGER) AS hops
FROM reach GROUP BY term
"""


@register(
    "sql_recursive_cte",
    oracle=_RCTE_SQL.format(
        tok_expr="list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')",
        lateral=",",
        range_expr="unnest(range(len(t.toks) - 1)) AS u(i)",
        a_idx="i + 1",
        b_idx="i + 2",
    ),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4): graph reachability — every term within two
    hops of 'spark' in the directed bigram co-occurrence graph, with its
    minimum hop count. The iterative-join recursion the engine previously
    only expressed imperatively (`dedup_minhash_cluster`,
    `text_pagerank_keywords`) now as declarative SQL text, identical shape
    on both engines. Bounded by `hops < 2` so the recursion depth (and the
    per-step shuffle count at scale) is explicit in the query."""
    register_views(spark, sf_dir)
    return spark.sql(
        _RCTE_SQL.format(
            tok_expr="filter(split(lower(text), '\\\\s+'), x -> x != '')",
            lateral=" ",
            range_expr="LATERAL VIEW posexplode(slice(t.toks, 1, greatest(size(t.toks) - 1, 0))) AS i, _tok",
            a_idx="i",
            b_idx="i + 1",
        )
    )


@register(
    "sql_pipe_topn",
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE),
                 2) + 0.0 AS rev,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity > 45
    GROUP BY l_returnflag
    ORDER BY rev DESC, l_returnflag
    """,
)
def sql_pipe_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX (Spark 4): the linear `FROM |> WHERE |> AGGREGATE |>
    ORDER BY` form of a filtered grouped rollup — same Catalyst plan as the
    nested ANSI form (the oracle), just authored in evaluation order."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 45
        |> AGGREGATE round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,4)))
                                AS DOUBLE), 2) + 0.0 AS rev,
                     count(*) AS n
           GROUP BY l_returnflag
        |> SELECT l_returnflag, rev, n
        |> ORDER BY rev DESC, l_returnflag
        """
    )


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, max(o_totalprice) AS max_price
    FROM orders
    WHERE o_totalprice < 150000.0 AND year(o_orderdate) = 1995
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 `spark.sql(query, args=...)`): named
    `:param` markers bound server-side — the injection-safe templating
    surface every SQL gateway needs (values are typed literals in the
    plan, so constant folding and pushdown see them exactly like inline
    constants).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n, max(o_totalprice) AS max_price
        FROM orders
        WHERE o_totalprice < :cap AND year(o_orderdate) = :yr
        GROUP BY o_orderpriority
        """,
        args={"cap": 150000.0, "yr": 1995},
    )


@register(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS yr,
           count(*) AS n, max(o_totalprice) AS max_price
    FROM orders
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` (Spark 4 + DuckDB shared syntax): every non-aggregate
    select item becomes a grouping key — kills the copy-the-select-list
    failure mode in wide rollups. Planner output is identical to the
    explicit form (one partial→final hash aggregate).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS yr,
               count(*) AS n, max(o_totalprice) AS max_price
        FROM orders
        GROUP BY ALL
        """
    )


def _q14_sql() -> str:
    from .operators.parity import sql_ratio

    return f"""
    WITH l AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4,
               p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    )
    SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev4 ELSE 0 END)
                AS BIGINT) AS promo_rev4,
           CAST(sum(rev4) AS BIGINT) AS total_rev4,
           {sql_ratio(
               "sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev4 ELSE 0 END)",
               "sum(rev4)",
           )} AS promo_share
    FROM l
    """


@register("sql_promo_revenue", oracle=_q14_sql())
def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion-revenue share) as pure SQL text, made
    EXACT by integer money: `price·(1−disc)` becomes
    `cents(price) · (100 − pct(disc))` — an int64 in 10⁻⁴-dollar units —
    so both engines sum integers and only the final share quantizes
    through the shared boundary-proof ratio (no float-sum ordering
    divergence, unlike the literal TPC-H text).

    Plan lifecycle: the one-month predicate pushes into the lineitem
    scan, `part` broadcasts under AQE (dimension-sized), and the whole
    query reduces map-side to one 2-long partial per task — the classic
    star-join probe at any scale. Identical SQL text runs on both
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(_q14_sql())


_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS total_rev4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev4
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev4 = (SELECT max(total_rev4) FROM revenue)
ORDER BY s_suppkey
"""


@register("sql_top_supplier", oracle=_Q15_SQL)
def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarter revenue, ALL ties kept
    via the scalar-subquery max — the part of Q15 that trips naive
    `LIMIT 1` rewrites) in exact integer money like `sql_promo_revenue`,
    so revenue equality — the tie predicate itself — is well-defined
    across engines, which a float sum cannot guarantee.

    Plan lifecycle: the quarter predicate pushes into the lineitem scan;
    the revenue CTE is one suppliers-sized hash agg; the scalar subquery
    reduces it to ONE long broadcast back as a filter; the supplier join
    broadcasts the surviving ≈1-row relation. Identical SQL text on both
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


_Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue4,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue4 DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("sql_shipping_priority", oracle=_Q3_SQL)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority: top-10 unshipped-revenue orders
    for one market segment) in exact integer money; the ORDER BY carries
    (o_orderdate, l_orderkey) tiebreaks so the LIMIT edge is
    deterministic across engines — the fixture has no o_shippriority
    column, so o_orderpriority rides along instead (same query shape:
    a carried non-aggregated dimension).

    Plan lifecycle: both date predicates push into their scans;
    `customer` filtered to one segment broadcasts into `orders`
    (dimension-sized), the orders→lineitem join shuffles on the orderkey
    it aggregates by next — ONE exchange serves both join and group-by
    (Catalyst reuses the child partitioning), then a 10-row TakeOrdered.
    The probe side never re-shuffles: the classic pushdown-star-probe
    shape at any SF. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


Q18_MIN_QTY = 300  # large-volume threshold (sum of line quantities per order)


_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {Q18_MIN_QTY}
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 100
"""


@register("sql_large_volume_customer", oracle=_Q18_SQL)
def sql_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers: orders whose summed line
    quantity clears {Q18_MIN_QTY}) — the canonical IN-subquery-on-an-
    aggregate pattern. Quantities are whole numbers in the fixture, so
    `round()·cast` makes both the HAVING threshold and the output sum
    exact int64s; money is exact cents; the LIMIT edge tiebreaks on
    o_orderkey.

    Plan lifecycle: the IN-subquery plans as a left-semi join against a
    lineitem self-aggregation whose survivors are FEW (heavy-hitter
    orders) — Catalyst broadcasts that tiny relation into the
    orders→lineitem join, so the corpus-sized side is scanned twice but
    shuffled on orderkey only once for the outer group-by; AQE shrinks
    the semi side at runtime. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


_Q13_SQL = """
WITH c_orders AS (
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("sql_customer_distribution", oracle=_Q13_SQL)
def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): how many
    customers placed exactly N orders, INCLUDING the zero-order
    customers the left outer join + `count(o_orderkey)` (null-skipping)
    preserves — the part an inner-join rewrite silently drops. The
    fixture has no o_comment column, so Q13's NOT LIKE filter is
    omitted; the double-aggregation-over-outer-join shape is the point.

    Plan lifecycle: one shuffle on custkey serves both the join and the
    first group-by (co-partitioned), the second agg is histogram-sized;
    all-integer counts. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q13_SQL)


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue4,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue4 DESC, c_custkey
LIMIT 20
"""


@register("sql_returned_items", oracle=_Q10_SQL)
def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting: top-20 customers by
    revenue lost to returns in one quarter) in exact integer money with
    a c_custkey tiebreak on the LIMIT edge.

    Plan lifecycle: the quarter predicate pushes into the orders scan
    and `l_returnflag = 'R'` into the lineitem scan; nation (25 rows)
    and the filtered orders relation broadcast under AQE; the one real
    shuffle is the custkey group-by; 20-row TakeOrdered, never a global
    sort. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(vol4) AS BIGINT) AS revenue4
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol4
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("sql_volume_shipping", oracle=_Q7_SQL)
def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations, by supplier
    nation x customer nation x ship year) in exact integer money — the
    largest join tree in the SQL surface (lineitem x orders x supplier x
    customer x nation x nation), the query class TPC-H uses to exercise
    join ORDER optimization.

    Plan lifecycle: the nation-pair disjunction prunes both 25-row
    nation branches before their joins; nation (twice), supplier and the
    filtered customer side all broadcast under AQE, so the only real
    shuffle is lineitem->orders; the outer agg is a handful of
    (nation, nation, year) groups reduced map-side. year() over a
    parquet TIMESTAMP evaluates identically in both engines. Identical
    SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


_Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


@register("sql_forecast_revenue", oracle=_Q6_SQL)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change: what a discount band was
    worth over one shipping year) in exact integer money. The discount
    band compares the INTEGER percent `round(l_discount*100)` — the
    literal TPC-H `BETWEEN 0.05 AND 0.07` over raw doubles is exactly the
    boundary-comparison class the parity rules exist to avoid.

    Plan lifecycle: every predicate pushes into the lineitem scan (the
    date range prunes row groups via parquet min/max stats), and the
    whole query is ONE map-side partial + 1-row final agg — zero
    shuffle beyond the 2-long exchange; the canonical full-scan
    filter-agg a 100 TB fact table is laid out for. Identical SQL text
    on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


def _q8_sql() -> str:
    from .operators.parity import sql_ratio

    share = sql_ratio(
        "sum(CASE WHEN nation = 'NATION_19' THEN vol4 ELSE 0 END)",
        "sum(vol4)",
    )
    return f"""
SELECT o_year, CAST(sum(vol4) AS BIGINT) AS volume4, {share} AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol4,
           n2.n_name AS nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND p_type = 'PROMO'
) all_sales
GROUP BY o_year
ORDER BY o_year
"""


@register("sql_market_share", oracle=_q8_sql())
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share: one supplier nation's share
    of PROMO-part volume sold into one region, by order year) — the
    8-relation star join (part, lineitem, supplier, orders, customer,
    nation ×2, region) that exercises join-order planning hardest.
    Exact integer money; the share itself goes through the boundary-proof
    integer ratio instead of the float division the literal benchmark
    text uses.

    Plan lifecycle: p_type and the region/date predicates all push into
    their scans; part, supplier, customer, both nation branches and
    region broadcast under AQE (dimension-sized), so the single real
    shuffle is the year group-by; the CASE-sum share needs no second
    pass. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_q8_sql())


_Q19_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("sql_discounted_revenue", oracle=_Q19_SQL)
def sql_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under three OR'd
    brand/size/quantity conjunctions) in exact integer money — the
    DISJUNCTIVE-predicate stress test: a naive planner evaluates the OR
    after the join, a good one pushes the union of each branch's
    single-table conjuncts into BOTH scans (`p_brand IN (...)`,
    `p_size <= 15`, quantity range ∪) and re-checks the full disjunction
    at the join. l_quantity bounds are integer-valued doubles in the
    fixture, so the raw comparisons are boundary-safe on both engines.

    Plan lifecycle: part is dimension-sized → broadcast under AQE; the
    residual OR is one vectorized predicate; the aggregate is a 2-long
    map-side partial. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)


_Q17_SQL = """
WITH pq AS (
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS price_sum_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part ON p_partkey = l.l_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE p_brand = 'Brand#1'
  AND 5 * CAST(round(l.l_quantity) AS BIGINT) * pq.n < pq.sq
"""


@register("sql_small_qty_revenue", oracle=_Q17_SQL)
def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue: lines of one brand
    whose quantity is below 20% of that part's average) — the
    correlated-aggregate-subquery class, planned here as its decorrelated
    form (per-part aggregate joined back). The threshold compare is
    INTEGER cross-multiplication: q < 0.2·(Σq/n) ⇔ 5·q·n < Σq — exact at
    every boundary where the literal fraction compare can flip between
    engines (quantities are integer-valued in the fixture).

    Plan lifecycle: the brand predicate pushes into the part scan and
    part broadcasts; the per-part aggregate is one map-side-combinable
    hash agg reused via the join (the decorrelation Spark's own optimizer
    performs on the literal subquery form); final agg is a 2-long
    map-side partial. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


_Q22_SQL = """
WITH pos AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s
    FROM customer WHERE c_acctbal > 0.0
)
SELECT substring(c_name, 1, 9) AS cntrycode_proxy,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS totacctbal_cents
FROM customer CROSS JOIN pos
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY substring(c_name, 1, 9)
ORDER BY cntrycode_proxy
"""


@register("sql_global_sales_opportunity", oracle=_Q22_SQL)
def sql_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity: above-average-balance
    customers with no RECENT order — the fixture's order coverage is
    near-total, so literal never-ordered would be empty below sf0.1; the
    recency predicate keeps the anti-join non-trivial at every SF) — the
    scalar-subquery-filter + anti-join class. The above-average compare
    is integer cross-multiplication (c·n > Σ over positive balances,
    exact at boundaries); the fixture has no phone column, so the name
    prefix stands in for Q22's country code grouping.

    Plan lifecycle: the 1-row positive-balance aggregate broadcasts as a
    scalar; NOT EXISTS plans as a left-anti join on o_custkey (orders
    projected to ONE column before the exchange); the group-by is
    prefix-keyed and tiny. Identical SQL text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)
