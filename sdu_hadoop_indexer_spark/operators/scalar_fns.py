"""Scalar function library (SURVEY.md §2.B-7): one query per family.

All JVM-side built-ins (whole-stage codegen) — no Python UDFs in any of
these paths. Cross-engine notes are inline where Spark and DuckDB dialects
diverge (dayofweek origin, regexp_replace global flag, int widths…).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import jsonify_complex, register
from .parity import SQL_EVENTS_US


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lo,
           upper(p_name) AS up,
           CAST(length(p_name) AS INTEGER) AS len,
           substr(p_name, 1, 4) AS sub,
           concat_ws('|', p_brand, p_name) AS cat,
           trim(p_name) AS trimmed,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS repl,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family. DuckDB regexp_replace needs the 'g' flag to match
    Spark's replace-all semantics."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_name").alias("up"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 1, 4).alias("sub"),
        F.concat_ws("|", "p_brand", "p_name").alias("cat"),
        F.trim("p_name").alias("trimmed"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("repl"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INTEGER)
               AS days_to_2000,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS epoch_s,
           CAST(o_orderdate AS DATE) AS d
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Origin parity: Spark dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday → Spark side subtracts 1."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_2000"
        ),
        F.date_add(F.to_date("o_orderdate"), 30).alias("plus30"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.to_date("o_orderdate").alias("d"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 4) + 0.0 AS sqrt_price,
           round(ln(l_extendedprice), 4) + 0.0 AS ln_price,
           round(log10(l_extendedprice), 4) + 0.0 AS log10_price,
           CAST(pow(l_quantity, 2) AS DOUBLE) AS qty_sq,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           abs(l_extendedprice - 50000) AS abs_dev,
           CAST(sign(l_extendedprice - 50000) AS INTEGER) AS sgn,
           ((l_orderkey % 7) + 7) % 7 AS pmod7,
           greatest(l_quantity, l_discount * 100) AS hi,
           least(l_quantity, l_discount * 100) AS lo
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Transcendentals (ln/log10/sqrt/pow) round(,4) — libm may
    differ by 1 ulp across engines; int-valued results cast to a common width."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(F.sqrt(price), 4) + F.lit(0.0)).alias("sqrt_price"),
        (F.round(F.log(price), 4) + F.lit(0.0)).alias("ln_price"),
        (F.round(F.log10(price), 4) + F.lit(0.0)).alias("log10_price"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.ceil(price).alias("ceil_price"),
        F.floor(price).alias("floor_price"),
        F.abs(price - 50000).alias("abs_dev"),
        F.signum(price - 50000).cast("int").alias("sgn"),
        F.pmod("l_orderkey", F.lit(7)).alias("pmod7"),
        F.greatest("l_quantity", F.col("l_discount") * 100).alias("hi"),
        F.least("l_quantity", F.col("l_discount") * 100).alias("lo"),
    )


@register(
    "fn_array",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           list_contains(toks, 'join') AS has_join,
           to_json(list_sort(toks))::VARCHAR AS sorted_toks,
           to_json(list_sort(list_distinct(toks)))::VARCHAR AS uniq_toks,
           to_json(flatten([toks[1:3], toks[4:6]]))::VARCHAR AS first6,
           len(list_intersect(toks, ['join', 'hash'])) > 0 AS overlaps_q,
           to_json(list_transform(toks[1:5], x -> upper(x)))::VARCHAR AS up5,
           to_json(list_filter(toks, x -> length(x) > 5))::VARCHAR AS long_toks,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           to_json(list_transform(range(1, 6), x -> CAST(x AS INTEGER)))::VARCHAR AS seq5
    FROM d
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/lambda family over token lists (generalized R11/R12).

    Order parity: array_distinct preserves first-occurrence order in Spark but
    not in DuckDB → always wrap in sort_array before comparing. Array outputs
    emitted as canonical JSON for the driver hash gate.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
        ).alias("toks"),
    )
    toks = F.col("toks")
    out = d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "join").alias("has_join"),
        F.sort_array(toks).alias("sorted_toks"),
        F.sort_array(F.array_distinct(toks)).alias("uniq_toks"),
        F.flatten(F.array(F.slice(toks, 1, 3), F.slice(toks, 4, 3))).alias("first6"),
        F.arrays_overlap(toks, F.array(F.lit("join"), F.lit("hash"))).alias("overlaps_q"),
        F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x)).alias("up5"),
        F.filter(toks, lambda x: F.length(x) > 5).alias("long_toks"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).alias(
            "total_chars"
        ),
        F.sequence(F.lit(1), F.lit(5)).alias("seq5"),
    )
    return jsonify_complex(out)


@register(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
           to_json(json_keys(props))::VARCHAR AS prop_keys,
           CAST(json_extract_string(props, '$.missing') AS INTEGER) AS k_missing
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction, schema-ful from_json, keys, missing-path
    null semantics. (Map-typed *outputs* are exercised in unit tests —
    DuckDB's MAP serialization differs by design, SURVEY §2.B-7.) prop_keys
    emitted as canonical JSON for the driver hash gate."""
    ev = table(spark, sf_dir, "events")
    return jsonify_complex(
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.from_json("props", "k INT").getField("k").alias("k_struct"),
            F.json_object_keys("props").alias("prop_keys"),
            F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
        )
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           coalesce(NULL, c_name) AS nvl_name
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.nvl(F.lit(None).cast("string"), F.col("c_name")).alias("nvl_name"),
    )


@register(
    "fn_conditional_nulls",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               nullif(o_custkey % 10, 4) AS a,
               nullif(o_custkey % 7, 0) AS b
        FROM orders
    )
    SELECT o_orderkey, a, b,
           coalesce(a, b, -1) AS first_non_null,
           CASE WHEN a IS NULL THEN 'null-a'
                WHEN a > 5 THEN 'big' ELSE 'small' END AS case_on_null,
           ifnull(a, -1) AS a_defaulted,
           a + b AS propagated,
           least(a, b) AS least_skipnull,
           CAST(a IS DISTINCT FROM b AS BOOLEAN) AS distinct_from
    FROM t
    """,
)
def fn_conditional_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional functions under NULL inputs (round-2 verdict item 9: the
    NULL-free fixtures left null semantics un-gated). Keys are NULLed
    in-query via nullif, then every null-handling construct is checked
    EXACTly on both engines: coalesce chains, CASE null-tests, ifnull
    defaults, arithmetic NULL propagation, least's skip-null rule, and
    three-valued IS DISTINCT FROM. Pure per-row projection — map-only at
    any scale."""
    o = table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.expr("nullif(o_custkey % 10, 4)").alias("a"),
        F.expr("nullif(o_custkey % 7, 0)").alias("b"),
    )
    return t.select(
        "o_orderkey",
        "a",
        "b",
        F.coalesce("a", "b", F.lit(-1)).alias("first_non_null"),
        F.when(F.col("a").isNull(), "null-a")
        .when(F.col("a") > 5, "big")
        .otherwise("small")
        .alias("case_on_null"),
        F.ifnull("a", F.lit(-1)).alias("a_defaulted"),
        (F.col("a") + F.col("b")).alias("propagated"),
        F.least("a", "b").alias("least_skipnull"),
        F.col("a").eqNullSafe(F.col("b")).__invert__().alias("distinct_from"),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           event_type AS t,
           round(value, 4) + 0.0 AS v,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): each event's fields are
    serialized into one nested JSON document, parsed into a VARIANT column,
    and read back through typed `variant_get` paths (including the nested
    `$.meta.k`). VARIANT stores a parsed binary form, so repeated path
    extraction skips re-parsing the JSON text — the 100 TB answer to
    schema-on-read event payloads (vs `get_json_object` re-parsing per
    call). The oracle extracts the same values directly: the query proves
    the VARIANT round-trip is lossless."""
    ev = table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.col("value").alias("v"),
            F.struct(
                F.get_json_object("props", "$.k").cast("int").alias("k")
            ).alias("meta"),
        )
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.t", "string").alias("t"),
        (F.round(F.variant_get(v, "$.v", "double"), 4) + F.lit(0.0)).alias("v"),
        F.variant_get(v, "$.meta.k", "int").alias("k"),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' ||
               CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&#]*)', 1) AS lang_param
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the web-corpus curation primitive (domain
    filtering, per-site dedup, quality lists all key on the host): Spark's
    built-in `parse_url` (HOST / PATH / per-key QUERY extraction, one JVM
    call each) over a URL synthesized from fixture columns; the oracle
    re-derives the same parts with explicit regexes. Stateless map — one
    scan, no shuffle."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "fn_try_safe",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS pri_num,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri_digit,
           CASE WHEN o_custkey % 10 = 0 THEN NULL
                ELSE CAST(floor(o_totalprice / (o_custkey % 10) * 10000)
                          AS BIGINT) END AS per_unit_e4
    FROM orders
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (`try_cast` / `try_divide`): malformed
    input and division-by-zero yield NULL instead of failing the job —
    the ingest-hardening mode for dirty corpora (one bad cell must not
    kill a 100 TB batch; pair with `sink_quarantine_split` to route the
    NULLs). Stays fully codegen'd: try_* are builtin expressions, not
    UDFs.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("pri_num"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "pri_digit"
        ),
        # floor of the 1e4-scaled quotient: IEEE divide/multiply/floor are
        # bit-identical across engines, unlike round() at .00005 ties
        F.floor(
            F.try_divide("o_totalprice", F.col("o_custkey") % 10) * 10000
        ).cast("bigint").alias("per_unit_e4"),
    )


@register(
    "fn_xml_parse",
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS k,
           o_orderpriority AS p,
           CAST(round(o_totalprice, 2) + 0.0 AS DOUBLE) AS price
    FROM orders
    """,
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest (`from_xml`, Spark 4): schema-directed parse of an XML
    string column into a typed struct — the third semi-structured format
    next to `scan_json_props` (JSON) and `fn_variant_json` (VARIANT).
    The XML here is synthesized from the fixture so the parse is
    round-trip verifiable: the oracle reads the same values straight from
    the source columns, proving lossless encode→parse.
    """
    o = table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey"),
        F.lit("</k><p>"),
        F.col("o_orderpriority"),
        F.lit("</p><price>"),
        F.round("o_totalprice", 2).cast("string"),
        F.lit("</price></o>"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_xml(xml, "k BIGINT, p STRING, price DOUBLE").alias("v"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("v.k").alias("k"),
        F.col("v.p").alias("p"),
        F.col("v.price").alias("price"),
    )


# time_bucket parameters: 15-minute buckets anchored at a 5-minute origin
# offset — deliberately NOT an hour multiple, which date_trunc can't express.
_TB_WIDTH_S = 900
_TB_ORIGIN_S = 300


@register(
    "fn_time_bucket",
    oracle=f"""
    WITH {SQL_EVENTS_US}, b AS (
        SELECT {_TB_ORIGIN_S} + (({{ep}} - {_TB_ORIGIN_S}) // {_TB_WIDTH_S})
               * {_TB_WIDTH_S} AS bucket_s,
               value
        FROM ev
    )
    SELECT bucket_s, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS sum_value
    FROM b GROUP BY bucket_s
    """.replace(
        "{ep}", "CAST(epoch(date_trunc('second', ts)) AS BIGINT)"
    ),
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-width, arbitrary-origin time bucketing (the TimescaleDB
    `time_bucket` primitive): 15-minute buckets anchored at :05 — widths
    and origins `date_trunc`/`window()` can't express directly.

    Pure int64 epoch arithmetic (`origin + (epoch - origin) DIV width ·
    width`) — exact on both engines at any bucket width, no calendar
    functions in the hot path, and trivially vectorized/codegen'd. The
    rollup after bucketing is one map-side-combinable hash agg; at 100 TB
    this is the same plan as any groupBy(hour) — bucketing adds zero
    shuffles. (Spark's streaming `window(ts, '15 minutes', startTime='5
    minutes')` plans the identical assignment; this is the batch form.)
    """
    ev = table(spark, sf_dir, "events")
    ep = F.unix_timestamp("ts")
    bucket = (
        F.lit(_TB_ORIGIN_S)
        + F.floor((ep - _TB_ORIGIN_S) / _TB_WIDTH_S) * _TB_WIDTH_S
    ).cast("long")
    return ev.groupBy(bucket.alias("bucket_s")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,4)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "fn_collation_ci",
    oracle="""
    WITH m AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                    ELSE event_type END AS mx
        FROM events
    )
    SELECT lower(mx) AS event_type_ci,
           count(*) AS n,
           CAST(count(DISTINCT mx) AS BIGINT) AS n_variants
    FROM m GROUP BY 1
    """,
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface (round 6): GROUP BY a `UTF8_LCASE`-collated
    key merges case variants engine-side — no lower() rewrite of the data,
    the collation is a property of the comparison. The fixture strings are
    single-case, so a deterministic mixed-case column is derived first
    (upper-cased on even event_ids); `n_variants` counts the distinct RAW
    spellings inside each collated group (binary collation inside the agg)
    proving the merge actually happened. The emitted key is `lower(k)` so
    the output is representative-independent (a collated group's raw
    representative is whichever spelling an executor saw first —
    nondeterministic by definition; never emit it). DuckDB twin groups by
    lower() — same partition of rows, same counts.

    Scale: one map-side-combinable hash agg; collation compares at the
    shuffle key, zero extra passes."""
    ev = table(spark, sf_dir, "events")
    mx = F.when(
        F.col("event_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    return (
        ev.select(mx.alias("mx"))
        .groupBy(F.collate("mx", "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(F.collate("mx", "UTF8_BINARY")).alias("n_variants"),
        )
        .select(F.lower("k").alias("event_type_ci"), "n", "n_variants")
    )


# --- JSON schema profiling (round 15) --------------------------------------
# The fixture's props column is uniformly {"k": int}, so the profiler gets
# a HETEROGENEOUS payload synthesized deterministically from event_id (the
# dedup_url_canonical "synthesize the column the fixture lacks" pattern):
# optional keys on residue classes, an int/float type drift on one key, a
# boolean key — identical concat text in both engines, so the JSON strings
# are byte-equal. Classification regexes are anchored and shared (Spark
# rlike == DuckDB regexp_matches on anchored patterns).
_JS_LANGS = ("en", "fr", "de", "zh")
_JS_KEYS = ("k", "lang", "score", "flag")
_JS_RE_INT = "^-?[0-9]+$"
_JS_RE_FLOAT = "^-?[0-9]+\\.[0-9]+$"
_JS_DOMINANT = (
    "CASE WHEN n_int >= n_float AND n_int >= n_bool AND n_int >= n_string"
    " THEN 'int'"
    " WHEN n_float >= n_bool AND n_float >= n_string THEN 'float'"
    " WHEN n_bool >= n_string THEN 'bool' ELSE 'string' END"
)


def _js_payload_sql() -> str:
    langs = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(_JS_LANGS))
    return f"""
        '{{"k": ' || json_extract_string(props, '$.k')
        || CASE WHEN event_id % 3 <> 0
                THEN ', "lang": "' || (CASE event_id % 4 {langs} END) || '"'
                ELSE '' END
        || CASE WHEN event_id % 5 = 0
                THEN ', "score": ' ||
                     (CASE WHEN event_id % 20 = 0
                           THEN CAST(event_id % 97 AS VARCHAR)
                           ELSE CAST(event_id % 97 AS VARCHAR) || '.' ||
                                CAST(event_id % 9 AS VARCHAR) || '5' END)
                ELSE '' END
        || CASE WHEN event_id % 7 = 0
                THEN ', "flag": ' ||
                     (CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END)
                ELSE '' END
        || '}}'
    """


def _js_profile_oracle() -> str:
    from .parity import sql_ratio

    keys_list = ", ".join(f"'{k}'" for k in _JS_KEYS)
    return f"""
    WITH p AS (
        SELECT event_id, ({_js_payload_sql()}) AS doc FROM events
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM p),
    kv AS (
        SELECT k.key, json_extract_string(p.doc, '$.' || k.key) AS v
        FROM p CROSS JOIN (SELECT unnest([{keys_list}]) AS key) k
    ),
    c AS (
        SELECT key,
               CAST(count(v) AS BIGINT) AS n_present,
               CAST(sum(CASE WHEN regexp_matches(v, '{_JS_RE_INT}')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
               CAST(sum(CASE WHEN regexp_matches(v, '{_JS_RE_FLOAT}')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_float,
               CAST(sum(CASE WHEN v IN ('true', 'false') THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bool
        FROM kv GROUP BY key
    )
    SELECT key, n_present,
           {sql_ratio("n_present", "total")} AS presence_share,
           n_int, n_float, n_bool,
           n_present - n_int - n_float - n_bool AS n_string,
           CASE WHEN n_int >= n_float AND n_int >= n_bool
                 AND n_int >= (n_present - n_int - n_float - n_bool)
                THEN 'int'
                WHEN n_float >= n_bool
                 AND n_float >= (n_present - n_int - n_float - n_bool)
                THEN 'float'
                WHEN n_bool >= (n_present - n_int - n_float - n_bool)
                THEN 'bool' ELSE 'string' END AS dominant_type
    FROM c CROSS JOIN tot
    """


@register("fn_json_schema_profile", oracle=_js_profile_oracle())
def fn_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload audit — the per-key schema profile every
    ingest pipeline runs before trusting a JSON column: for each key,
    presence count/share and a value-type census (int / float / bool /
    string by anchored regex over the extracted value) with the dominant
    type — surfacing optional keys and TYPE DRIFT (here the synthesized
    `score` key drifts int↔float on a residue class, the classic
    upstream-producer-changed failure). The profile's key set is the
    declared contract ({_JS_KEYS}); `fn_map_json`/`fn_variant_json` do
    path EXTRACTION, this op does schema OBSERVATION.

    Parity: the heterogeneous payload is synthesized with identical
    concat text from event_id residues (byte-equal JSON both engines);
    extraction via get_json_object == json_extract_string; anchored
    classification regexes shared; presence share is the boundary-proof
    `ratio`.

    Scale shape: map-side payload build + a |keys|× Generate feeding a
    partial-aggregable key-keyed hash agg (the bootstrap expansion
    shape) — shuffled rows = |keys| at any corpus size; one 1-row total
    broadcast for the share."""
    from .parity import ratio

    ev = table(spark, sf_dir, "events")
    langs = F.element_at(
        F.array(*[F.lit(v) for v in _JS_LANGS]),
        (F.col("event_id") % 4 + 1).cast("int"),
    )
    kpart = F.concat(F.lit('{"k": '), F.get_json_object("props", "$.k"))
    lang_part = F.when(
        F.col("event_id") % 3 != 0,
        F.concat(F.lit(', "lang": "'), langs, F.lit('"')),
    ).otherwise(F.lit(""))
    score_num = (F.col("event_id") % 97).cast("string")
    score_part = F.when(
        F.col("event_id") % 5 == 0,
        F.concat(
            F.lit(', "score": '),
            F.when(F.col("event_id") % 20 == 0, score_num).otherwise(
                F.concat(
                    score_num,
                    F.lit("."),
                    (F.col("event_id") % 9).cast("string"),
                    F.lit("5"),
                )
            ),
        ),
    ).otherwise(F.lit(""))
    flag_part = F.when(
        F.col("event_id") % 7 == 0,
        F.concat(
            F.lit(', "flag": '),
            F.when(F.col("event_id") % 2 == 0, F.lit("true")).otherwise(
                F.lit("false")
            ),
        ),
    ).otherwise(F.lit(""))
    doc = F.concat(kpart, lang_part, score_part, flag_part, F.lit("}"))
    p = ev.select("event_id", doc.alias("doc"))
    tot = p.agg(F.count("*").cast("long").alias("total"))
    kv = p.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("key"),
                        F.get_json_object("doc", f"$.{k}").alias("v"),
                    )
                    for k in _JS_KEYS
                ]
            )
        ).alias("e")
    ).select("e.key", "e.v")
    c = kv.groupBy("key").agg(
        F.count("v").cast("long").alias("n_present"),
        F.sum(F.when(F.col("v").rlike(_JS_RE_INT), 1).otherwise(0))
        .cast("long")
        .alias("n_int"),
        F.sum(F.when(F.col("v").rlike(_JS_RE_FLOAT), 1).otherwise(0))
        .cast("long")
        .alias("n_float"),
        F.sum(F.when(F.col("v").isin("true", "false"), 1).otherwise(0))
        .cast("long")
        .alias("n_bool"),
    )
    out = c.crossJoin(F.broadcast(tot)).withColumn(
        "n_string",
        F.col("n_present") - F.col("n_int") - F.col("n_float") - F.col("n_bool"),
    )
    return out.select(
        "key",
        "n_present",
        ratio(F.col("n_present"), F.col("total")).alias("presence_share"),
        "n_int",
        "n_float",
        "n_bool",
        "n_string",
        F.expr(_JS_DOMINANT).alias("dominant_type"),
    )
