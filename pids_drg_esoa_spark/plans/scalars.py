"""Scalar function surface (SURVEY.md §2.7), oracle-gated.

The reference's heart is a library of pure, row-local text/numeric
functions (F1-F38). The native tier lands here as Catalyst
expressions applied to the synthetic tables — whole-stage-codegen'd,
no Python in the hot path. (The Python-regex-fidelity tier — the big
extraction UDFs — lives in ``functions/`` with golden tests, since
Java/Python regex dialects must not silently diverge; SURVEY §7.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import table
from .catalog import register


@register(
    "f1_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9%/+. -]+', ' ', 'g'),
               ' +', ' ', 'g')) AS text_norm
    FROM documents
    """,
)
def f1_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize_text, native tier: lower → strip punctuation keeping
    the units/dose charset (%/+.-) → collapse whitespace → trim
    (reference text_utils.py:49-65 F1; accent-strip + typo table live
    in functions.text.normalize_text_py for byte-exact parity)."""
    d = table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9%/+. -]+", " "), " +", " "
        )
    )
    return d.select("doc_id", norm.alias("text_norm"))


@register(
    "f2_normalize_basic",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                               ' +', ' ', 'g')) AS text_basic
    FROM documents
    """,
)
def f2_normalize_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labs-style normalization: lower, non-alnum→space, collapse —
    the exact-match join key of the labs pipeline
    (match_labs.py:18-26 F2, _normalize_text_basic)."""
    d = table(spark, sf_dir, "documents")
    basic = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " +", " ")
    )
    return d.select("doc_id", basic.alias("text_basic"))


@register(
    "f3_normalize_compact",
    oracle="""
    SELECT doc_id, regexp_replace(lower(text), '[ -]+', '', 'g') AS text_compact
    FROM documents
    """,
)
def f3_normalize_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact form: normalization minus spaces/hyphens — used for
    space-insensitive matching (text_utils.py:117-119 F3)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.regexp_replace(F.lower("text"), "[ -]+", "").alias("text_compact")
    )


@register(
    "f9_regex_extract_struct",
    oracle="""
    SELECT event_id,
           coalesce(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS k_raw,
           CAST(json_extract_string(props, '$.k') AS BIGINT)       AS k_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END                          AS k_band
    FROM events
    """,
)
def f9_regex_extract_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-cascade field extraction + typed cast + banding — the
    dose-parse shape (dose.py:10-100 F9: regex bank → typed struct).
    Also covers the JSON path surface (semi-structured props)."""
    e = table(spark, sf_dir, "events")
    k_json = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        F.coalesce(F.regexp_extract("props", '"k": ([0-9]+)', 1), F.lit("")).alias("k_raw"),
        k_json.alias("k_val"),
        F.when(k_json >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "f10_unit_conversion",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CASE l_returnflag
                     WHEN 'A' THEN l_quantity * 1000.0
                     WHEN 'N' THEN l_quantity
                     ELSE l_quantity / 1000.0
                 END, 6) AS qty_mg
    FROM lineitem
    """,
)
def f10_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-factor normalization via a CASE/factor map — to_mg
    (dose.py:103-126 F10; factor table unified_constants.py:850-856)."""
    l = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.when(F.col("l_returnflag") == "A", qty * 1000.0)
            .when(F.col("l_returnflag") == "N", qty)
            .otherwise(qty / 1000.0),
            6,
        ).alias("qty_mg"),
    )


@register(
    "f11_safe_ratio",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(CASE WHEN l_quantity IS NULL OR l_quantity = 0 THEN NULL
                           ELSE l_extendedprice / l_quantity END * 1000000) AS BIGINT)
               AS unit_price_micros
    FROM lineitem
    """,
)
def f11_safe_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-guarded ratio — safe_ratio_mg_per_ml (dose.py:129-135 F11).
    Quotients of doubles are engine-identical (IEEE), but round() is
    not (BigDecimal vs scaled-double ties) — emit floor'd integral
    micro-units instead."""
    l = table(spark, sf_dir, "lineitem")
    ratio = F.when(
        F.col("l_quantity").isNull() | (F.col("l_quantity") == 0), F.lit(None)
    ).otherwise(F.col("l_extendedprice") / F.col("l_quantity"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(ratio * 1000000).cast("bigint").alias("unit_price_micros"),
    )


@register(
    "f38_safe_to_float",
    oracle="""
    SELECT p_partkey,
           round(CAST(regexp_replace(price_str, ',', '.', 'g') AS DOUBLE), 2) AS price_parsed
    FROM (SELECT p_partkey, regexp_replace(CAST(p_retailprice AS VARCHAR), '\\.', ',', 'g') AS price_str
          FROM part)
    """,
)
def f38_safe_to_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma-decimal tolerant float parse round-trip — safe_to_float
    (text_utils.py:132-141 F38). String⇄double casts must agree with
    the oracle engine's float formatting."""
    p = table(spark, sf_dir, "part")
    price_str = F.regexp_replace(F.col("p_retailprice").cast("string"), "\\.", ",")
    return p.select(
        "p_partkey",
        F.round(F.regexp_replace(price_str, ",", ".").cast("double"), 2).alias("price_parsed"),
    )


@register(
    "str_function_battery",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           CAST(length(c_name) AS BIGINT)                  AS name_len,
           substring(c_name, 10, 9)                        AS cust_num,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0')      AS nation_padded,
           concat_ws('::', c_mktsegment, c_name)           AS seg_name,
           replace(c_name, 'Customer', 'C')                AS name_short,
           CASE WHEN c_name LIKE '%0001%' THEN 1 ELSE 0 END AS has_0001
    FROM customer
    """,
)
def str_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String primitive battery: upper/length/substring/lpad/concat_ws/
    replace/LIKE — the building blocks of every reference normalizer
    (§2.7). All JVM-native, codegen'd."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.concat_ws("::", "c_mktsegment", "c_name").alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("name_short"),
        F.when(F.col("c_name").like("%0001%"), 1).otherwise(0).alias("has_0001"),
    )


@register(
    "arr_function_battery",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)                    AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)     AS n_unique,
           list_sort(string_split(text, ' '))[1]                           AS first_token,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab
    FROM documents
    """,
)
def arr_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array primitive battery: split/size/distinct/sort/element/join —
    the pipe-delimited-multivalue idiom done as first-class arrays
    (SURVEY §1.2: ArrayType replaces 'A|B|C' string encoding)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        F.element_at(F.array_sort(toks), 1).alias("first_token"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab"),
    )


@register(
    "math_function_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6)             AS qty_sqrt,
           round(ln(l_quantity), 6)               AS qty_ln,
           round(pow(l_discount, 2), 6)           AS disc_sq,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           abs(l_quantity - 25)                   AS qty_dev,
           CAST(l_linenumber % 3 AS INTEGER)      AS line_mod
    FROM lineitem
    """,
)
def math_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math primitive battery: sqrt/ln/pow/ceil/floor/abs/mod (§2.7
    numeric tier; dose math F14 uses exactly these shapes)."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_quantity"), 6).alias("qty_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        (F.col("l_linenumber") % 3).cast("int").alias("line_mod"),
    )


@register(
    "date_function_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)    AS order_year,
           CAST(month(o_orderdate) AS BIGINT)   AS order_month,
           CAST(day(o_orderdate) AS BIGINT)     AS order_day,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
           strftime(o_orderdate, '%Y-%m')       AS order_ym,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch0
    FROM orders
    """,
)
def date_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime primitive battery: year/month/day/dow/format/diff.
    The reference has no temporal logic beyond file-date stamps
    (SURVEY §1.2) — this is required engine surface. DuckDB
    dayofweek = Sunday 0; Spark dayofweek = Sunday 1 → align with -1."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("order_dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch0"),
    )


@register(
    "hash_function_battery",
    oracle="""
    SELECT doc_id,
           md5(text)                                  AS text_md5,
           substring(md5(concat(lang, '|', text)), 1, 16) AS salted_prefix
    FROM documents
    """,
)
def hash_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content hashing (md5) — the portable fingerprint
    primitive used by the dedup/fingerprint operators. Engine-portable
    unlike xxhash64/hash()."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.substring(F.md5(F.concat_ws("|", "lang", "text")), 1, 16).alias("salted_prefix"),
    )
