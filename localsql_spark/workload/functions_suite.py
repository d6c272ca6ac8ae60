"""Scalar-function coverage (SURVEY.md §2B "Scalar functions"): string, math,
date/time, null/conditional, json, LIKE/GLOB — each family as one row-wise
query whose values are bit-identical across Spark and the DuckDB oracle
(no aggregation, so no float-order concerns; libm-backed functions get a
defensive round since exp/ln/trig are not correctly-rounded across runtimes).

The reference reaches all of these through SQLite via
localsql/localsql.py:230; Spark-side everything is a built-in
``pyspark.sql.functions`` expression (JVM codegen, no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.functions.sqlite_compat import glob
from localsql_spark.workload import load, query


@query("fn_string_suite", oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_name, 1, 5) AS name_head,
       length(p_name) AS name_len,
       replace(p_type, ' ', '_') AS type_snake,
       trim(concat('  ', p_name, '  ')) AS name_trimmed,
       instr(p_name, 'a') AS first_a,
       reverse(p_brand) AS brand_rev,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
""")
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir)["part"]
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"))


@query("fn_like_glob", oracle="""
SELECT p_partkey, p_name,
       (p_name LIKE '%green%') AS has_green,
       (p_name GLOB '*re*') AS glob_re,
       (p_brand GLOB 'Brand[12]*') AS glob_brand12
FROM part
WHERE p_name LIKE '%a%'
""")
def fn_like_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE natively; SQLite GLOB via glob_to_regex -> rlike
    (localsql_spark.functions.sqlite_compat — the one real dialect gap)."""
    part = load(spark, sf_dir)["part"]
    return (part.filter(F.col("p_name").like("%a%"))
            .select(
                "p_partkey", "p_name",
                F.col("p_name").like("%green%").alias("has_green"),
                glob("p_name", "*re*").alias("glob_re"),
                glob("p_brand", "Brand[12]*").alias("glob_brand12")))


@query("fn_math_suite", oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000) AS abs_diff,
       round(p_retailprice, 1) AS price_r1,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(p_size % 7 AS INT) AS size_mod7,
       CAST(sign(p_retailprice - 1200.0) AS INT) AS price_sign,
       CAST(p_size AS DOUBLE) * p_size AS size_sq,
       sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt
FROM part
""")
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/ceil/floor/mod/sign/sqrt — all IEEE-deterministic (sqrt is
    correctly rounded by spec, unlike exp/ln below).

    Types pinned on BOTH sides (round-1 driver hash failure): Spark floor/ceil
    return LONG while DuckDB's return DOUBLE, and Spark signum returns DOUBLE
    while DuckDB sign() returns TINYINT — numerically equal values hash
    differently, so floor/ceil are CAST AS BIGINT and sign AS INT in the
    oracle, matched by .cast() here."""
    part = load(spark, sf_dir)["part"]
    return part.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("abs_diff"),
        F.round("p_retailprice", 1).alias("price_r1"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        (F.col("p_size") % 7).cast("int").alias("size_mod7"),
        F.signum(F.col("p_retailprice") - 1200.0).cast("int").alias("price_sign"),
        (F.col("p_size").cast("double") * F.col("p_size")).alias("size_sq"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"))


@query("fn_transcendental", oracle="""
SELECT p_partkey,
       round(exp(CAST(p_size AS DOUBLE) / 100), 9) AS exp_v,
       round(ln(CAST(p_size AS DOUBLE) + 1), 9) AS ln_v,
       round(log10(CAST(p_retailprice AS DOUBLE)), 9) AS log10_v,
       round(sin(CAST(p_size AS DOUBLE)), 9) AS sin_v,
       round(cos(CAST(p_size AS DOUBLE)), 9) AS cos_v,
       round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS pow_v,
       round(pi(), 9) AS pi_v
FROM part
""")
def fn_transcendental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exp/ln/log10/sin/cos/pow (SQLite >=3.35 math functions): not
    correctly-rounded across runtimes (JVM StrictMath vs C libm), so both
    sides round — a 1-ulp divergence cannot survive round-to-9 at these
    magnitudes."""
    part = load(spark, sf_dir)["part"]
    size_d = F.col("p_size").cast("double")
    return part.select(
        "p_partkey",
        F.round(F.exp(size_d / 100), 9).alias("exp_v"),
        F.round(F.log(size_d + 1), 9).alias("ln_v"),
        F.round(F.log10(F.col("p_retailprice").cast("double")), 9).alias("log10_v"),
        F.round(F.sin(size_d), 9).alias("sin_v"),
        F.round(F.cos(size_d), 9).alias("cos_v"),
        F.round(F.pow(size_d, 2.0), 6).alias("pow_v"),
        F.round(F.lit(3.141592653589793), 9).alias("pi_v"))


@query("fn_datetime_suite", oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95,
       epoch_us(o_orderdate) AS epoch_micro,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
FROM orders WHERE o_orderkey < 300
""")
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time capability parity (SURVEY §2B: Spark-native date functions,
    not SQLite's modifier-string grammar).  dow alignment: DuckDB dayofweek
    is 0=Sunday..6; Spark dayofweek is 1=Sunday..7 — shifted to match."""
    orders = load(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 300)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).cast("long").alias("days_since_95"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_micro"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("formatted"))


@query("fn_null_conditional", oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal = 0 THEN 'zero'
            ELSE 'credit' END AS bal_class,
       ifnull(nullif(c_nationkey, 0), -1) AS natkey_nz,
       (c_acctbal IS NULL) AS bal_is_null,
       (nullif(c_acctbal, 0) IS NOT NULL) AS bal_nonzero
FROM customer
""")
def fn_null_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir)["customer"]
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_or_other"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") == 0, "zero")
        .otherwise("credit").alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias("natkey_nz"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.nullif(F.col("c_acctbal"), F.lit(0)).isNotNull().alias("bal_nonzero"))


@query("fn_json_suite", oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       json_array_length('[1,2,3]') AS arr_len,
       json_extract_string('{"a": {"b": "deep"}}', '$.a.b') AS deep
FROM events WHERE event_id < 100
""")
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json1-extension parity (SURVEY §2B): the reference's only path to
    nested data in default mode is json_extract over stringified cells —
    Spark's get_json_object covers it (structs stay native elsewhere)."""
    events = load(spark, sf_dir)["events"].filter(F.col("event_id") < 100)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.json_array_length(F.lit("[1,2,3]")).cast("long").alias("arr_len"),
        F.get_json_object(F.lit('{"a": {"b": "deep"}}'), "$.a.b").alias("deep"))


@query("fn_cast_typeconv", oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) AS qty_int,
       CAST(l_quantity AS VARCHAR) AS qty_str,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
       CAST(l_linenumber AS DOUBLE) AS ln_dbl,
       (l_quantity > 25) AS qty_big,
       CAST((l_quantity > 25) AS INT) AS qty_big_int
FROM lineitem WHERE l_orderkey < 100
""")
def fn_cast_typeconv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_quantity").cast("decimal(18,1)").cast("double").cast("string").alias("qty_str"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string").alias("price_dec_str"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        (F.col("l_quantity") > 25).alias("qty_big"),
        (F.col("l_quantity") > 25).cast("int").alias("qty_big_int"))


@query("fn_string_suite2", oracle="""
SELECT p_partkey,
       ltrim(concat('  ', p_name)) AS ltrim_v,
       rtrim(concat(p_name, '  ')) AS rtrim_v,
       printf('%s-%03d', p_brand, p_size) AS fmt_v,
       hex(p_brand) AS hex_v,
       chr(65 + p_size % 26) AS chr_v,
       ascii(substring(p_name, 1, 1)) AS ascii_v,
       p_size % 7 AS mod_v,
       round(tan(CAST(p_size AS DOUBLE) / 10), 9) AS tan_v
FROM part
""")
def fn_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining SQLite core scalar names (SURVEY §2B list): ltrim/rtrim,
    printf -> format_string, hex, char -> chr, unicode -> ascii, mod, tan.
    All row-local codegen'd expressions."""
    part = load(spark, sf_dir)["part"]
    return part.select(
        "p_partkey",
        F.ltrim(F.concat(F.lit("  "), F.col("p_name"))).alias("ltrim_v"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("  "))).alias("rtrim_v"),
        F.format_string("%s-%03d", F.col("p_brand"), F.col("p_size"))
         .alias("fmt_v"),
        F.hex(F.col("p_brand")).alias("hex_v"),
        F.chr(65 + F.col("p_size") % 26).alias("chr_v"),
        F.ascii(F.substring("p_name", 1, 1)).alias("ascii_v"),
        (F.col("p_size") % 7).alias("mod_v"),
        F.round(F.tan(F.col("p_size").cast("double") / 10), 9).alias("tan_v"))


@query("fn_strftime_modifiers", oracle="""
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate + INTERVAL 1 MONTH),
                '%Y-%m-%d') AS next_month_start,
       strftime(o_orderdate + INTERVAL 3 DAY - INTERVAL 2 HOUR,
                '%Y-%m-%d %H:%M:%S') AS plus3d_minus2h,
       strftime(o_orderdate
                + ((1 - dayofweek(o_orderdate) + 7) % 7) * INTERVAL 1 DAY,
                '%Y-%m-%d') AS next_monday,
       CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR) AS epoch_s,
       strftime(o_orderdate, 'day %j of %Y') AS doy_text
FROM orders WHERE o_orderkey < 500
""")
def fn_strftime_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite strftime modifier grammar ('+N units', 'start of month',
    'weekday N') — the dialect corner flagged as a round-1 gap, closed by
    functions.sqlite_compat.strftime: modifiers compile to interval/trunc
    COLUMN expressions at plan time (no runtime Python), format codes to a
    date_format pattern with literal text quoted."""
    from localsql_spark.functions.sqlite_compat import strftime

    orders = load(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        strftime("%Y-%m-%d", "o_orderdate", "+1 month", "start of month")
        .alias("next_month_start"),
        strftime("%Y-%m-%d %H:%M:%S", "o_orderdate", "+3 days", "-2 hours")
        .alias("plus3d_minus2h"),
        strftime("%Y-%m-%d", "o_orderdate", "weekday 1").alias("next_monday"),
        strftime("%s", "o_orderdate").alias("epoch_s"),
        strftime("day %j of %Y", "o_orderdate").alias("doy_text"))
