"""SURVEY.md §2B relational operator surface, one registry entry per operator
family, each paired with its DuckDB oracle SQL.

The reference exposes this whole surface by delegating to SQLite
(reference: localsql/localsql.py:230); here each family is expressed
Spark-first (DataFrame API or spark.sql) and Catalyst picks the physical plan.

Determinism notes (driver hash-compares values):
- SUM/AVG over doubles go through DECIMAL casts so aggregation order cannot
  change low bits (row-level doubles are bit-identical across engines; only
  reduction order varies).
- Window aggregates also use DECIMAL (DuckDB's segment-tree evaluation
  associates differently than Spark's running frame).
- Timestamps are surfaced via identical string formats on both sides.
- Every LIMIT/top-k breaks ties on a unique key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.workload import load, query


def dsum(col: str | Column, scale: str = "decimal(18,2)") -> Column:
    """Order-insensitive exact sum of a double column via decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def davg(col: str | Column, scale: str = "decimal(18,2)") -> Column:
    """Deterministic average: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double") / F.count(c)


# ---------------------------------------------------------------------------
# Aggregation: GROUP BY + sum/avg/min/max/count (TPC-H Q1 shape) — flagship
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,2)) * CAST(1 + l_tax AS DECIMAL(9,2))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → hash-aggregate → (sort). Catalyst does partial (map-
    side) aggregation before the shuffle; at 100 TB the shuffle carries only
    |groups|×|partitions| rows (4 groups here)."""
    li = load(spark, sf_dir)["lineitem"]
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,2)")
    tax1 = (F.lit(1) + F.col("l_tax")).cast("decimal(9,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(price * disc1).cast("double").alias("sum_disc_price"),
            F.sum(price * disc1 * tax1).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", "decimal(9,2)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins: multi-way equi-join + group + top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

@query("q3_top_orders", oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer scales WITH the data (no broadcast hint — Catalyst/AQE
    broadcasts while it fits and falls back to shuffle join beyond that);
    lineitem⋈orders shuffles on orderkey. Top-k compiles to
    TakeOrderedAndProject (no global sort)."""
    t = load(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,2)")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * disc1).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Multi-way join over the full star (TPC-H Q5 shape) — broadcast small dims
# ---------------------------------------------------------------------------

@query("q5_nation_revenue", oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""")
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join. Broadcast hints ONLY on the fixed-cardinality dims
    (nation=25, region=5 rows at every scale factor); customer/supplier grow
    with the data, so their join strategy is left to Catalyst/AQE — broadcast
    while small, shuffle join at scale. Region filter prunes before joining."""
    t = load(spark, sf_dir)
    region = t["region"].filter(F.col("r_name").isin("ASIA", "EUROPE"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,2)")
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"],
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(price * disc1).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Filter + global aggregate, no grouping (TPC-H Q6 shape)
# ---------------------------------------------------------------------------

@query("q6_forecast_revenue", oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All predicates push to the parquet scan (PushedFilters); single
    partial+final agg, no shuffle of data rows."""
    li = load(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 25))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                  * F.col("l_discount").cast("decimal(9,2)"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Outer joins: LEFT JOIN null-extension (reference golden README.md:65-71)
# ---------------------------------------------------------------------------

@query("left_join_order_counts", oracle="""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS order_cnt,
       CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""")
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeps customers with zero orders (COUNT(col) skips the
    null-extended rows — the reference demos the same null extension at
    README.md:65-71)."""
    t = load(spark, sf_dir)
    return (
        t["customer"].join(t["orders"],
                           F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_cnt"),
             F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0)).cast("decimal(18,2)"))
             .cast("double").alias("total_spend"))
    )


@query("right_full_outer_join", oracle="""
SELECT COALESCE(n_nationkey, -1) AS nationkey,
       n_name,
       COUNT(s_suppkey) AS supplier_cnt
FROM supplier FULL OUTER JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
""")
def right_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (dialect contract includes RIGHT/FULL on modern SQLite,
    reference README.md:40); nations with no suppliers survive null-extended."""
    t = load(spark, sf_dir)
    return (
        t["supplier"].join(t["nation"],
                           F.col("s_nationkey") == F.col("n_nationkey"), "full")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("supplier_cnt"))
        .select(F.coalesce(F.col("n_nationkey"), F.lit(-1)).alias("nationkey"),
                "n_name", "supplier_cnt")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (reference reaches these via IN / NOT EXISTS subqueries)
# ---------------------------------------------------------------------------

@query("anti_join_customers_without_orders", oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return (t["customer"]
            .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .select("c_custkey", "c_name"))


@query("semi_join_parts_ordered", oracle="""
SELECT p_partkey, p_name FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
""")
def semi_join_parts_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_quantity") >= 49)
    return (t["part"]
            .join(li, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
            .select("p_partkey", "p_name"))


# ---------------------------------------------------------------------------
# Cross join
# ---------------------------------------------------------------------------

@query("cross_join_region_pairs", oracle="""
SELECT a.r_name AS from_region, b.r_name AS to_region
FROM region a CROSS JOIN region b
WHERE a.r_name <> b.r_name
""")
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    a = t["region"].select(F.col("r_name").alias("from_region"))
    b = t["region"].select(F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("from_region") != F.col("to_region"))


# ---------------------------------------------------------------------------
# Theta (non-equi) join
# ---------------------------------------------------------------------------

@query("theta_join_price_band", oracle="""
SELECT s_suppkey, COUNT(*) AS richer_nations
FROM supplier JOIN nation ON s_nationkey <> n_nationkey
GROUP BY s_suppkey
""")
def theta_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi condition → Spark picks BroadcastNestedLoopJoin (nation
    is tiny); the reference's SQLite runs the same shape as a nested loop."""
    t = load(spark, sf_dir)
    return (t["supplier"]
            .join(F.broadcast(t["nation"]), F.col("s_nationkey") != F.col("n_nationkey"))
            .groupBy("s_suppkey")
            .agg(F.count(F.lit(1)).alias("richer_nations")))


# ---------------------------------------------------------------------------
# group_concat / HAVING / COUNT(DISTINCT)
# ---------------------------------------------------------------------------

@query("group_concat_suppliers", oracle="""
SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""")
def group_concat_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite group_concat ≈ concat_ws ∘ sort_array ∘ collect_list (sorted to
    pin the nondeterministic collect order)."""
    t = load(spark, sf_dir)
    return (t["supplier"]
            .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.concat_ws(",", F.sort_array(F.collect_list("s_name")))
                 .alias("suppliers")))


@query("having_count_distinct", oracle="""
SELECT l_suppkey,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(DISTINCT l_partkey) > 50
""")
def having_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir)["lineitem"]
    return (li.groupBy("l_suppkey")
            .agg(F.countDistinct("l_partkey").alias("distinct_parts"),
                 F.count(F.lit(1)).alias("n_items"))
            .filter(F.col("distinct_parts") > 50))


# ---------------------------------------------------------------------------
# Projection / CASE / DISTINCT
# ---------------------------------------------------------------------------

@query("distinct_case_projection", oracle="""
SELECT DISTINCT p_brand,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END AS size_class
FROM part
""")
def distinct_case_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir)["part"]
    return (part.select(
        "p_brand",
        F.when(F.col("p_size") < 10, "small")
         .when(F.col("p_size") < 30, "medium")
         .otherwise("large").alias("size_class"))
        .distinct())


# ---------------------------------------------------------------------------
# ORDER BY NULLS LAST + LIMIT/OFFSET (reference golden README.md:75-78)
# ---------------------------------------------------------------------------

@query("order_nulls_limit_offset", oracle="""
SELECT c_custkey, c_name,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
FROM customer
ORDER BY bal DESC NULLS LAST, c_custkey
LIMIT 20 OFFSET 5
""")
def order_nulls_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering (reference demos ORDER BY 1 ASC NULLS LAST at
    README.md:75); LIMIT+OFFSET via Spark SQL (3.4+). Unique-key tiebreak
    keeps the row set deterministic."""
    load(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
        ORDER BY bal DESC NULLS LAST, c_custkey
        LIMIT 20 OFFSET 5
    """)


# ---------------------------------------------------------------------------
# Ordinal GROUP BY / ORDER BY (reference golden README.md:75)
# ---------------------------------------------------------------------------

@query("ordinal_group_order", oracle="""
SELECT o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY 1
ORDER BY 1
""")
def ordinal_group_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1")


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@query("setop_union_distinct", oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""")
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return (t["customer"].select(F.col("c_nationkey").alias("nationkey"))
            .union(t["supplier"].select("s_nationkey"))
            .distinct())


@query("setop_union_all_counts", oracle="""
SELECT nationkey, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) u GROUP BY nationkey
""")
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return (t["customer"].select(F.col("c_nationkey").alias("nationkey"))
            .union(t["supplier"].select("s_nationkey"))
            .groupBy("nationkey").agg(F.count(F.lit(1)).alias("cnt")))


@query("setop_intersect", oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return (t["customer"].select(F.col("c_nationkey").alias("nationkey"))
            .intersect(t["supplier"].select("s_nationkey")))


@query("setop_except", oracle="""
SELECT n_nationkey AS nationkey FROM nation
EXCEPT
SELECT s_nationkey FROM supplier
""")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    # subtract() IS SQL EXCEPT (set semantics: drop any row present on the
    # right, regardless of left multiplicity) — exceptAll().distinct() keeps
    # a row whenever left multiplicity exceeds right, which diverges on
    # duplicated left keys
    return (t["nation"].select(F.col("n_nationkey").alias("nationkey"))
            .subtract(t["supplier"].select("s_nationkey")))


# ---------------------------------------------------------------------------
# Window functions: ranking / analytic / frames
# ---------------------------------------------------------------------------

@query("window_rank_top3_orders", oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK()       OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
         DENSE_RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS drnk
  FROM orders) x
WHERE rn <= 3
""")
def window_rank_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the distributed top-k idiom (one
    shuffle on the partition key, no global sort)."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (orders.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"))
        .filter(F.col("rn") <= 3))


@query("window_lag_lead_events", oracle="""
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       LAG(event_type)  OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       FIRST_VALUE(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS first_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(wf).alias("first_type"))


@query("window_running_sum", oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
""")
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregate (ROWS BETWEEN); decimal inside the frame so DuckDB's
    segment-tree association matches Spark's running accumulation exactly."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir)["orders"]
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double").alias("running_spend"))


@query("window_ntile_percentile", oracle="""
SELECT c_custkey,
       NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
       CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS pct_rank,
       CAST(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS cume
FROM customer
""")
def window_ntile_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load(spark, sf_dir)["customer"]
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"))


# ---------------------------------------------------------------------------
# Subqueries: scalar / correlated / IN — and CTEs
# ---------------------------------------------------------------------------

@query("scalar_subquery_above_avg", oracle="""
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > 2 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM orders)
""")
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 2 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders)
    """)


@query("correlated_subquery_above_nation_avg", oracle="""
SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
""")
def correlated_subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join; the deterministic-avg comparison keeps boundary rows
    identical across engines."""
    load(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    """)


@query("in_subquery_parts", oracle="""
SELECT p_partkey, p_retailprice FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
""")
def in_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
    """)


@query("cte_two_level", oracle="""
WITH nation_cust AS (
  SELECT n_name, c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
), nation_orders AS (
  SELECT nc.n_name, COUNT(o.o_orderkey) AS n_orders
  FROM nation_cust nc LEFT JOIN orders o ON o.o_custkey = nc.c_custkey
  GROUP BY nc.n_name
)
SELECT n_name, n_orders FROM nation_orders WHERE n_orders > 0
""")
def cte_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir)
    return spark.sql("""
        WITH nation_cust AS (
          SELECT n_name, c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
        ), nation_orders AS (
          SELECT nc.n_name, COUNT(o.o_orderkey) AS n_orders
          FROM nation_cust nc LEFT JOIN orders o ON o.o_custkey = nc.c_custkey
          GROUP BY nc.n_name
        )
        SELECT n_name, n_orders FROM nation_orders WHERE n_orders > 0
    """)


@query("derived_table_exists", oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""")
def derived_table_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → Catalyst turns it into a left-semi
    join on orderkey."""
    load(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """)


# ---------------------------------------------------------------------------
# GROUPING SETS / ROLLUP / CUBE (Spark extension beyond SQLite surface)
# ---------------------------------------------------------------------------

@query("rollup_region_nation", oracle="""
SELECT r_name, n_name, COUNT(*) AS cnt
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
""")
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return (t["nation"]
            .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
            .rollup("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("cnt")))


@query("cube_status_priority", oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""")
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir)["orders"]
    return (orders.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# Pivot (manual CASE aggregation in the oracle)
# ---------------------------------------------------------------------------

@query("pivot_returnflag_by_status", oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_A,
       CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_N,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_R
FROM lineitem
GROUP BY l_linestatus
""")
def pivot_returnflag_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir)["lineitem"]
    pivoted = (li.groupBy("l_linestatus")
               .pivot("l_returnflag", ["A", "N", "R"])
               .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")))
    return pivoted.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"))


# ---------------------------------------------------------------------------
# explode / unnest over the array column
# ---------------------------------------------------------------------------

@query("explode_embedding_positions", oracle="""
SELECT vec_id, ord - 1 AS pos, CAST(e AS DOUBLE) AS val
FROM (SELECT vec_id,
             unnest(embedding) AS e,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings WHERE vec_id < 5) u
""")
def explode_embedding_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir)["embeddings"]
    return (emb.filter(F.col("vec_id") < 5)
            .select("vec_id", F.posexplode("embedding").alias("pos", "e"))
            .select("vec_id", "pos", F.col("e").cast("double").alias("val")))


# ---------------------------------------------------------------------------
# Recursive CTE (Spark >= 4.0 closes the SQLite-dialect gap noted in
# SURVEY.md §2B) — month series expanded recursively, joined to orders
# ---------------------------------------------------------------------------

@query("recursive_cte_monthly_orders", oracle="""
WITH RECURSIVE months(m) AS (
  SELECT DATE '1996-01-01' AS m
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1997-12-01')
SELECT strftime(m, '%Y-%m') AS month, count(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM months LEFT JOIN orders
  ON date_trunc('month', o_orderdate) = CAST(m AS TIMESTAMP)
GROUP BY m
""")
def recursive_cte_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month-series generation (24 iterations driver-side plan
    expansion, each a trivial row) left-joined to orders — the recursion is
    O(iterations) plan steps, the heavy side stays one distributed join."""
    load(spark, sf_dir)
    return spark.sql("""
WITH RECURSIVE months(m) AS (
  SELECT DATE '1996-01-01' AS m
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1997-12-01')
SELECT date_format(m, 'yyyy-MM') AS month, count(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM months LEFT JOIN orders
  ON date_trunc('month', o_orderdate) = CAST(m AS TIMESTAMP)
GROUP BY m
""")


# ---------------------------------------------------------------------------
# Analytic window functions: first/last/nth value + lead with default
# ---------------------------------------------------------------------------

@query("window_analytic_first_last_nth", oracle="""
SELECT user_id, event_id,
  first_value(value) OVER w AS first_v,
  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
  nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_v,
  lead(value, 2, -1.0) OVER w AS lead2_v
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def window_analytic_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with explicit full-partition
    frames + lead with default — one shuffle on user_id shared by all four
    (single Window operator; reference surface: SQLite analytic fns)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id", "event_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(wfull).alias("last_v"),
        F.nth_value("value", 3).over(wfull).alias("third_v"),
        F.lead("value", 2, -1.0).over(w).alias("lead2_v"))


# ---------------------------------------------------------------------------
# RANGE frame windows (value-based, vs the ROWS frames used elsewhere)
# ---------------------------------------------------------------------------

@query("window_range_frame_value", oracle="""
SELECT o_orderkey, o_custkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
         AS n_within_1k,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
            AS DOUBLE) AS sum_within_1k
FROM orders
""")
def window_range_frame_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (orders within +/-1000 of each row's price,
    same customer) — the frame type ROWS can't express; one shuffle on the
    partition key shared by both window aggregates."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir)["orders"]
    w = (Window.partitionBy("o_custkey").orderBy("o_totalprice")
         .rangeBetween(-1000, 1000))
    return orders.select(
        "o_orderkey", "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
         .cast("double").alias("sum_within_1k"))


@query("window_exclude_emulated", oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                    EXCLUDE CURRENT ROW) AS DOUBLE) AS s_excl_current,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
              OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    EXCLUDE GROUP) AS DOUBLE) AS s_excl_group,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
              OVER (PARTITION BY user_id ORDER BY CAST(ts AS DATE)
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    EXCLUDE TIES) AS DOUBLE) AS s_excl_ties
FROM events WHERE user_id < 50
""")
def window_exclude_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame EXCLUDE clause (SQLite >= 3.28, the one window feature
    Spark lacks — flagged as a gap in round 1), emulated exactly with frame
    arithmetic over the SAME single shuffle per partition key:

    - EXCLUDE CURRENT ROW = frame_sum - current value (NULL when the frame
      holds nothing else, matching the standard's empty-frame semantics);
    - EXCLUDE GROUP = cumulative_sum - peer_group_sum (peers = RANGE
      CURRENT ROW AND CURRENT ROW);
    - EXCLUDE TIES = that + the current value (the current row stays).

    Decimal sums keep both engines bit-identical; the oracle uses DuckDB's
    NATIVE EXCLUDE so the emulation is checked against the real semantics.
    """
    from pyspark.sql import Window

    ev = (load(spark, sf_dir)["events"].filter(F.col("user_id") < 50)
          .select("event_id", "user_id", "ts",
                  F.col("value").cast("decimal(18,2)").alias("v"),
                  F.col("ts").cast("date").alias("d")))
    w_rows = (Window.partitionBy("user_id").orderBy("ts", "event_id")
              .rowsBetween(-3, 3))
    w_cum = (Window.partitionBy("user_id").orderBy("d")
             .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    w_peer = (Window.partitionBy("user_id").orderBy("d")
              .rangeBetween(Window.currentRow, Window.currentRow))
    # NULL fidelity: native EXCLUDE sums ignore NULLs and yield NULL only
    # when the remaining frame has NO non-null value — so the emulation
    # subtracts coalesced sums and gates on NON-NULL counts (F.count of the
    # value column), not row counts.  F.sum already skips NULLs.
    zero = F.lit(0).cast("decimal(18,2)")
    v, vc = F.col("v"), F.coalesce(F.col("v"), F.lit(0)).cast("decimal(18,2)")
    own = v.isNotNull().cast("long")
    frame_sum = F.coalesce(F.sum("v").over(w_rows), zero)
    frame_nn = F.count("v").over(w_rows)  # non-null values in the frame
    cum_sum = F.coalesce(F.sum("v").over(w_cum), zero)
    peer_sum = F.coalesce(F.sum("v").over(w_peer), zero)
    cum_nn, peer_nn = F.count("v").over(w_cum), F.count("v").over(w_peer)
    return ev.select(
        "event_id", "user_id",
        F.when(frame_nn - own > 0, (frame_sum - vc).cast("double"))
         .alias("s_excl_current"),
        F.when(cum_nn - peer_nn > 0, (cum_sum - peer_sum).cast("double"))
         .alias("s_excl_group"),
        F.when(cum_nn - peer_nn + own > 0,
               (cum_sum - peer_sum + vc).cast("double"))
         .alias("s_excl_ties"))


@query("unpivot_metrics", oracle="""
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
FROM part WHERE p_partkey < 200
UNION ALL
SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
FROM part WHERE p_partkey < 200
""")
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide -> long): the inverse of pivot, native in Spark
    via ``DataFrame.unpivot`` (Expand node — row-local, zero shuffle)."""
    part = load(spark, sf_dir)["part"].filter(F.col("p_partkey") < 200)
    wide = part.select("p_partkey",
                       F.col("p_size").cast("double").alias("p_size"),
                       F.col("p_retailprice").cast("double")
                       .alias("p_retailprice"))
    return wide.unpivot(["p_partkey"], ["p_size", "p_retailprice"],
                        "metric", "value")


@query("lateral_topk_per_nation", oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
""")
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with per-key ORDER BY + LIMIT (top-2
    customers by balance per nation).  Catalyst decorrelates this into a
    join + per-key WindowGroupLimit rather than running the subquery per
    outer row; ties break on c_name so the result is deterministic."""
    load(spark, sf_dir)
    return spark.sql("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n JOIN LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """)


# ---------------------------------------------------------------------------
# QUALIFY / GROUPING SETS / statistical aggregates / array functions
# ---------------------------------------------------------------------------

@query("qualify_top_suppliers", oracle="""
SELECT s_nationkey, s_suppkey, s_name, s_acctbal
FROM supplier
QUALIFY ROW_NUMBER() OVER (PARTITION BY s_nationkey
                           ORDER BY s_acctbal DESC, s_suppkey) <= 3
""")
def qualify_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY clause (filter on a window function without a subquery) —
    DuckDB has it natively; Spark expresses the same plan as window +
    filter + drop.  Catalyst turns the rn<=3 filter into WindowGroupLimit,
    so each shuffle partition keeps only 3 rows per key before the window
    sort — the scale-correct per-group top-k."""
    from pyspark.sql.window import Window

    sup = load(spark, sf_dir)["supplier"]
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (sup.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 3)
            .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal"))


@query("grouping_sets_orders", oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""")
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube) with the
    grouping_id disambiguator.  Spark's grouping_id() bit order (first
    grouping column = MSB) matches DuckDB's GROUPING(a, b).  Physical plan
    is one Expand (row replicated per grouping set, row-local) + one hash
    aggregate — the same single shuffle a plain GROUP BY costs."""
    orders = load(spark, sf_dir)["orders"]
    return (orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"),
             F.count("*").alias("n_orders"),
             dsum("o_totalprice").alias("sum_price")))


@query("fn_stats_suite", oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       (sxy - sx * sy / n) / n                   AS covar_pop_qty_price,
       (sxy - sx * sy / n) / (n - 1)             AS covar_samp_qty_price,
       (sxy - sx * sy / n)
         / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
                                                 AS corr_qty_price,
       sqrt((sxx - sx * sx / n) / n)             AS stddev_pop_qty,
       sqrt((sxx - sx * sx / n) / (n - 1))       AS stddev_samp_qty,
       (syy - sy * sy / n) / (n - 1)             AS var_samp_price
FROM m
""")
def fn_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: corr / covar / stddev / variance.  Native
    F.corr etc. merge per-partition co-moments, so their low bits depend on
    partition merge order; instead both engines derive the statistics from
    EXACT decimal power sums with an identical double expression tree —
    bit-deterministic at any partitioning, and still one shuffle (the sums
    are ordinary partial-aggregable SUMs).  Reference surface: SQLite math
    via delegated aggregate queries (localsql/localsql.py:230)."""
    li = load(spark, sf_dir)["lineitem"]
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = sxy - sx * sy / n
    vx, vy = sxx - sx * sx / n, syy - sy * sy / n
    return m.select(
        "l_returnflag", "n",
        (cov / n).alias("covar_pop_qty_price"),
        (cov / (n - F.lit(1))).alias("covar_samp_qty_price"),
        (cov / F.sqrt(vx * vy)).alias("corr_qty_price"),
        F.sqrt(vx / n).alias("stddev_pop_qty"),
        F.sqrt(vx / (n - F.lit(1))).alias("stddev_samp_qty"),
        (vy / (n - F.lit(1))).alias("var_samp_price"))


@query("fn_array_suite", oracle="""
SELECT vec_id,
       len(embedding)                                        AS arr_len,
       CAST(list_max(embedding) AS DOUBLE)                   AS max_val,
       CAST(list_min(embedding) AS DOUBLE)                   AS min_val,
       list_position(embedding, list_max(embedding))         AS max_pos,
       len(list_filter(embedding, x -> x > 0))               AS n_pos,
       CAST(CAST(embedding[1] AS DOUBLE)
            + CAST(embedding[2] AS DOUBLE)
            + CAST(embedding[3] AS DOUBLE) AS DOUBLE)        AS first3_sum,
       CAST(list_sort(embedding)[1] AS DOUBLE)               AS sorted_head,
       list_contains(embedding, list_max(embedding))         AS has_max
FROM embeddings
WHERE vec_id < 500
""")
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/list function surface over the embedding column: size, min/max,
    position, lambda filter, element access, sort, membership — all
    row-local Catalyst expressions (zero shuffle, WholeStageCodegen).
    Scalars only in the output: float32 elements cast to double bit-exactly
    on both engines, and the 3-element sum is a FIXED evaluation order on
    both sides so no decimal detour is needed."""
    emb = load(spark, sf_dir)["embeddings"].filter(F.col("vec_id") < 500)
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("arr_len"),
        F.array_max(e).cast("double").alias("max_val"),
        F.array_min(e).cast("double").alias("min_val"),
        F.array_position(e, F.array_max(e)).alias("max_pos"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        (F.element_at(e, 1).cast("double")
         + F.element_at(e, 2).cast("double")
         + F.element_at(e, 3).cast("double")).alias("first3_sum"),
        F.element_at(F.array_sort(e), 1).cast("double").alias("sorted_head"),
        F.array_contains(e, F.array_max(e)).alias("has_max"))


@query("q18_large_volume_orders", oracle="""
SELECT c_name, c_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_date,
       o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""")
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery on the fact table
    itself — Catalyst decorrelates it into an aggregate + semi join, and
    the 3-way join + re-aggregate sits above it; ORDER BY+LIMIT compiles
    to top-k.  Decimal quantity sums keep the HAVING boundary identical
    across engines; ties break on the unique o_orderkey."""
    load(spark, sf_dir)
    return spark.sql("""
        SELECT c_name, c_custkey, o_orderkey,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_date, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
                                    > 200)
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """)


@query("q21_sole_return_supplier", oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""")
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (receipt-lateness swapped for the returnflag the
    testdata carries): per finalized multi-supplier order, the supplier
    who was the ONLY one with a returned line.  Exercises DOUBLE
    correlation on aliases of the same fact table — the EXISTS
    decorrelates to a left-semi join, the NOT EXISTS to a left-anti join,
    both on l_orderkey with an extra non-equi conjunct; no cartesian
    product anywhere (plan-asserted)."""
    load(spark, sf_dir)
    return spark.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)


# ---------------------------------------------------------------------------
# Correlated scalar MIN subquery (TPC-H Q2 shape)
# ---------------------------------------------------------------------------

_Q2_SQL = """
SELECT DISTINCT p_partkey, p_name, s_name, n_name,
       l_extendedprice AS min_price
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_size <= 15
  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                         FROM lineitem l2
                         JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
                         JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                         JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                         WHERE l2.l_partkey = p_partkey
                           AND r2.r_name = 'EUROPE')
ORDER BY min_price, p_partkey, s_name
LIMIT 100
"""


@query("q2_min_price_supplier", oracle=_Q2_SQL)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (supplycost swapped for the lineitem price the
    testdata carries): per European part, the supplier(s) matching the
    region-wide MINIMUM price — a correlated scalar-aggregate subquery
    over the same join tree as the outer query.  Catalyst decorrelates it
    into a per-part min aggregate joined back on (partkey, price); the
    dims (supplier/nation/region) broadcast, so the only wide exchanges
    are the two partkey-keyed aggregates/joins on the fact table — the
    plan a hand-written "window min + filter" would also reach, written
    declaratively.  Double equality is exact: both sides compare the same
    stored parquet values, no arithmetic.  Ties deterministic: the
    DISTINCT triple (price, partkey, s_name) is unique."""
    load(spark, sf_dir)
    return spark.sql(_Q2_SQL)


# ---------------------------------------------------------------------------
# EXISTS with outer-column predicate (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

@query("q4_order_priority", oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (commit/receipt lateness swapped for ship-after-order,
    the columns the testdata carries): order-priority histogram of one
    quarter's orders having at least one late line.  The correlated EXISTS
    carries a NON-equi conjunct on the outer column (l_shipdate >
    o_orderdate) — expressed directly as a LEFT SEMI join with a compound
    condition, the exact operator EXISTS decorrelates to.  Semi-join
    short-circuits per order (no fact-side aggregation), then the
    5-row-group aggregate is map-side partial."""
    t = load(spark, sf_dir)
    q = t["orders"].filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date")))
    late = q.join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


# ---------------------------------------------------------------------------
# Multi-join volume by year between two nation sets (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

@query("q7_volume_shipping", oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(9,2)) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year.  Five-way join where BOTH nation aliases broadcast (25 rows) and
    the disjunctive nation-pair predicate sits above them; the only wide
    shuffles are lineitem⋈orders on orderkey and orders⋈customer on
    custkey.  The year extraction is a scalar expression feeding the
    group-by — partial aggregation collapses to |pairs|×|years| rows
    map-side.  Decimal volume keeps the sums order-insensitive."""
    t = load(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("cust_nation"))
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(9,2)"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (t["supplier"]
            .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
            .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
            .join(n1, F.col("s_nationkey") == F.col("n1_key"))
            .join(n2, F.col("c_nationkey") == F.col("n2_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(vol).cast("double").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


# ---------------------------------------------------------------------------
# Group aggregate filtered by a GLOBAL scalar-aggregate threshold (Q11 shape)
# ---------------------------------------------------------------------------

@query("q11_important_parts", oracle="""
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey)
SELECT l_partkey, value
FROM pv
WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
ORDER BY value DESC, l_partkey
""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (supplycost×availqty swapped for discounted price):
    parts whose one-nation shipped value exceeds 0.1% of that nation's
    total — a grouped aggregate filtered by a GLOBAL scalar aggregate of
    itself.  The CTE computes per-part values once; the scalar total is a
    single-row broadcast reused over the filter (Spark plans the CTE body
    twice unless cached — at this shape both branches are the same partial
    agg, and the threshold side collapses to one row before the join, so
    the rewrite stays cheap).  Threshold arithmetic is double-on-exact-
    decimal-sums: identical on both engines."""
    load(spark, sf_dir)
    return spark.sql("""
        WITH pv AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE)
                   AS value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_5'
          GROUP BY l_partkey)
        SELECT l_partkey, value
        FROM pv
        WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
        ORDER BY value DESC, l_partkey
    """)


# ---------------------------------------------------------------------------
# Nested IN + correlated aggregate in HAVING (TPC-H Q20 shape)
# ---------------------------------------------------------------------------

_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l1.l_suppkey FROM lineitem l1
  WHERE l1.l_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'red%')
  GROUP BY l1.l_partkey, l1.l_suppkey
  HAVING SUM(CAST(l1.l_quantity AS DECIMAL(18,2))) >
         0.1 * (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
ORDER BY s_suppkey
"""


@query("q20_dominant_part_suppliers", oracle=_Q20_SQL)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty swapped for shipped-quantity share):
    suppliers who shipped >10% of some red part's total volume — a
    three-deep nesting: IN over a grouped fact subquery whose HAVING
    compares against a CORRELATED scalar aggregate of the same fact table
    keyed by the group column.  Catalyst decorrelates the inner scalar
    into a per-part total aggregate joined back on partkey, and the outer
    IN into a semi join on suppkey; the part-name IN prunes the fact scan
    before either aggregate.  Decimal sums keep the 10% boundary identical
    across engines."""
    load(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# ---------------------------------------------------------------------------
# Returned-item top customers (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

@query("q10_returned_items", oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE)
         AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window.  The date filter prunes orders BEFORE the fact join,
    the returnflag filter prunes lineitem at the scan (PushedFilters), the
    25-row nation dim broadcasts, and the top-20 compiles to
    TakeOrderedAndProject above a partial-aggregated groupBy — no global
    sort, no full materialization of the grouped set."""
    load(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE)
                 AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """)


# ---------------------------------------------------------------------------
# Conditional-count pivot after join (TPC-H Q12 shape)
# ---------------------------------------------------------------------------

@query("q12_priority_by_returnflag", oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode swapped for the returnflag the testdata
    carries): per line category, how many of the year's lines belong to
    urgent/high-priority orders vs the rest — conditional-sum pivot above
    a fact-fact join.  The CASE expressions fold into the partial
    aggregation (map-side: 3 groups × 2 counters cross the exchange); the
    year filter reaches the lineitem scan."""
    t = load(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (t["orders"].join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("l_returnflag"))


# ---------------------------------------------------------------------------
# Conditional-revenue ratio (TPC-H Q14 shape)
# ---------------------------------------------------------------------------

@query("q14_promo_revenue_pct", oracle="""
SELECT CAST(100.0 * SUM(CASE WHEN p_type LIKE 'SMALL%'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                  * CAST(1 - l_discount AS DECIMAL(9,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE)
         AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
""")
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (the 'SMALL' p_type family stands in for 'PROMO%'): the month's revenue share of one part family — a
    single-row conditional-aggregate ratio over lineitem⋈part.  Both sums
    travel in ONE partial aggregation (no second pass, no self-join); the
    division is one double op on exact decimal sums, so the ratio is
    bit-identical across engines."""
    t = load(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(9,2)"))
    promo = F.when(F.col("p_type").like("SMALL%"), rev) \
             .otherwise(F.lit(0).cast("decimal(18,2)"))
    return (li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
            .agg(((F.lit(100.0) * F.sum(promo).cast("double"))
                  / F.sum(rev).cast("double")).alias("promo_pct")))


# ---------------------------------------------------------------------------
# Disjunctive multi-attribute predicate (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'BRAND#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'BRAND#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 40)
   OR (p_brand = 'BRAND#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 50)
"""


@query("q19_disjunctive_revenue", oracle=_Q19_SQL)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-way DISJUNCTION of conjunct
    groups that each mix part attributes and lineitem attributes.
    Catalyst factors the per-side parts of the OR below the join (the
    part scan gets `p_brand IN (...)` + size bounds, the lineitem scan
    gets the quantity envelope — visible as PushedFilters) and evaluates
    the full disjunction above it; the naive plan would scan everything
    and filter last.  One conditional aggregation, single row out."""
    load(spark, sf_dir)
    return spark.sql(_Q19_SQL)


# ---------------------------------------------------------------------------
# Count-of-counts histogram over a filtered LEFT JOIN (TPC-H Q13 shape)
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... qualifying
    orders — a two-level aggregation where the FIRST group-by runs over a
    LEFT JOIN whose extra predicate lives INSIDE the join condition (a
    WHERE would turn it inner and silently drop the zero-order customers
    that are the point of the query).  COUNT(o_orderkey) counts non-null
    matches only; the second aggregate is tiny (distinct count values)."""
    load(spark, sf_dir)
    return spark.sql(_Q13_SQL)


# ---------------------------------------------------------------------------
# Max over a grouped-aggregate view (TPC-H Q15 shape)
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(9,2))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top-revenue supplier(s) — a CTE
    "view" referenced twice (once joined, once under MAX), the classic
    aggregate-of-aggregate.  The scalar MAX collapses to a one-row
    broadcast; both CTE references share the same partial-aggregated
    shape.  Revenue is an exact decimal sum cast to double, so the
    equality against MAX compares identical stored doubles on both
    engines (no arithmetic on the comparison path)."""
    load(spark, sf_dir)
    return spark.sql(_Q15_SQL)


# ---------------------------------------------------------------------------
# Correlated per-group average threshold (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

_Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'BRAND#1'
  AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity
                                              AS DECIMAL(18,2)))
                                       AS DOUBLE) / COUNT(l2.l_quantity))
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


@query("q17_small_quantity_revenue", oracle=_Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of the part's own
    average quantity — a correlated scalar-AVG subquery against the same
    fact table.  Catalyst decorrelates to a per-part aggregate joined back
    on partkey (one extra shuffle, no per-row re-scan); the brand filter
    prunes BOTH the outer fact scan and, post-decorrelation, flows into
    the join.  The average is an exact decimal sum with ONE double
    division, so the 0.2x threshold lands identically on both engines."""
    load(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# ---------------------------------------------------------------------------
# Anti-join + global-average filter by code (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

_Q22_SQL = """
WITH cust AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 5 AS cntrycode
  FROM customer WHERE c_nationkey % 5 IN (0, 2, 4))
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM cust c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                               AS DOUBLE) / COUNT(c2.c_acctbal)
                   FROM cust c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND CAST(o.o_orderdate AS DATE) >= DATE '2000-07-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q22_global_sales_opportunity", oracle=_Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone country code swapped for a nationkey
    residue): well-funded customers in target codes who never ordered —
    an uncorrelated scalar-AVG threshold (one-row broadcast) combined
    with a NOT EXISTS anti join against the orders fact (customers with
    no RECENT order — every customer here has some historical one), then
    a tiny group-by.  The anti join is the only wide operation; the CTE is
    referenced twice with the same scan shape."""
    load(spark, sf_dir)
    return spark.sql(_Q22_SQL)


# ---------------------------------------------------------------------------
# Market-share ratio by year (TPC-H Q8 shape)
# ---------------------------------------------------------------------------

_Q8_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(9,2)) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'SMALL'
        AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1998-01-01') all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's market
    for one part type, by order year — an 8-table join tree where every
    dimension (part filter, both nation aliases, region) broadcasts and
    only the three fact-side joins shuffle, topped by a conditional-sum
    ratio whose numerator and denominator travel in ONE partial
    aggregation.  The CASE arm types are pinned to the volume's decimal
    so the sums stay exact before the single double division."""
    load(spark, sf_dir)
    return spark.sql(_Q8_SQL)


# ---------------------------------------------------------------------------
# Profit by nation and year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

_Q9_SQL = """
SELECT nation, o_year,
       CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (SELECT n_name AS nation,
             EXTRACT(YEAR FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(9,2))
             - CAST(p_retailprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))
               * CAST(0.1 AS DECIMAL(4,2)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_product_profit", oracle=_Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supplycost swapped for a retail-price cost proxy —
    the testdata has no partsupp table): profit on one part family by
    supplier nation and order year.  The substring part filter prunes the
    part scan before the fact joins; amount is a pure decimal expression
    (products and the subtraction), summed exactly and emitted as one
    double, so grouping/reduction order cannot drift the result."""
    load(spark, sf_dir)
    return spark.sql(_Q9_SQL)


# ---------------------------------------------------------------------------
# Distinct-supplier count with NOT IN exclusion (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'BRAND#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_supplier_cnt_by_part", oracle=_Q16_SQL)
def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp; the complaint
    filter becomes negative account balance): distinct suppliers per part
    (brand, type, size) bucket, excluding a NOT IN subquery of suppliers.
    NOT IN over a non-nullable key plans as a null-aware anti join that
    degenerates to a plain anti join; COUNT(DISTINCT) expands to a
    two-level aggregate (distinct pairs, then count) — both shuffles are
    on narrow key tuples, and the IN-list size filter prunes the part
    scan."""
    load(spark, sf_dir)
    return spark.sql(_Q16_SQL)


@query("window_groups_frame_emulated", oracle="""
WITH ranked AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         DENSE_RANK() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE)) AS dr
  FROM orders)
SELECT o_orderkey, o_custkey,
       CAST(SUM(p) OVER (PARTITION BY o_custkey ORDER BY dr
                         RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
            AS DOUBLE) AS s_groups,
       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY dr
                           RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
            AS BIGINT) AS n_groups
FROM ranked
""")
def window_groups_frame_emulated(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """SQL:2011 GROUPS frame mode, which Spark lacks, emulated exactly:
    GROUPS counts PEER GROUPS (distinct ORDER BY values), not rows — so
    ``GROUPS 1 PRECEDING AND 1 FOLLOWING`` over the order DATE is a
    RANGE frame of width 1 over the key's DENSE_RANK (each distinct
    date maps to one consecutive rank, so rank distance == group
    distance; the peer group's rows all share the rank and enter the
    frame together).  Two window passes — dense_rank, then the
    rank-keyed RANGE aggregate — both on the same partition key, ONE
    shuffle (Catalyst collapses same-key windows).  DuckDB has not
    implemented GROUPS mode either, so the oracle replays the
    rank-range construction independently — a cross-engine check of
    the emulation's arithmetic (the peer-group semantics themselves
    are pinned by the unit test's hand-checked tie groups)."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir)["orders"]
    w_rank = (Window.partitionBy("o_custkey")
              .orderBy(F.col("o_orderdate").cast("date")))
    ranked = orders.select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        F.dense_rank().over(w_rank).alias("_dr"))
    w_grp = (Window.partitionBy("o_custkey").orderBy("_dr")
             .rangeBetween(-1, 1))
    return ranked.select(
        "o_orderkey", "o_custkey",
        F.sum("p").over(w_grp).cast("double").alias("s_groups"),
        F.count(F.lit(1)).over(w_grp).cast("long").alias("n_groups"))


@query("window_count_distinct_emulated", oracle="""
SELECT event_id, user_id,
       count(DISTINCT event_type) OVER (PARTITION BY user_id)
         AS n_types,
       count(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS n_types_so_far
FROM events
""")
def window_count_distinct_emulated(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """DISTINCT window aggregates — a real dialect gap (Spark 4 raises
    DISTINCT_WINDOW_FUNCTION_UNSUPPORTED; SQLite and DuckDB both accept
    `COUNT(DISTINCT x) OVER`): emulated as ``size(collect_set(x) OVER
    w)`` — JVM-side, same single Window exchange, works for the
    whole-partition AND the running ROWS frame.  The oracle is DuckDB's
    NATIVE distinct window aggregate, so the emulation is checked
    against the actual semantics, not a restatement (the same
    discipline as window_exclude_emulated).  At scale: one shuffle on
    the partition key; the per-row set is bounded by the column's
    per-partition cardinality — fine for categorical columns, use HLL
    for unbounded ones."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir)["events"]
    w_all = Window.partitionBy("user_id")
    w_run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.size(F.collect_set("event_type").over(w_all))
        .cast("long").alias("n_types"),
        F.size(F.collect_set("event_type").over(w_run))
        .cast("long").alias("n_types_so_far"))


@query("fn_median_mode", oracle="""
WITH m AS (SELECT event_type, round(median(CAST(value AS DOUBLE)), 9)
                    AS median_value
           FROM events GROUP BY event_type),
counts AS (SELECT event_type, user_id % 10 AS bucket, count(*) AS c
           FROM events GROUP BY 1, 2),
md AS (SELECT event_type, bucket AS mode_bucket
       FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                          ORDER BY c DESC, bucket) AS rn
             FROM counts) r WHERE rn = 1)
SELECT m.event_type, m.median_value, md.mode_bucket
FROM m JOIN md ON m.event_type = md.event_type
""")
def fn_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median() (Spark 3.4+ native, interpolated — matches DuckDB's
    numeric median on identical doubles) and a DETERMINISTIC mode:
    Spark's and DuckDB's builtin mode() are both tie-arbitrary, so the
    portable form is the rank-by-(count DESC, value) construction both
    engines replay identically — the same pin-the-tie discipline as
    every sampling key in this repo.  One groupBy for the medians, one
    two-level count+window for the mode."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir)["events"]
    med = (ev.groupBy("event_type")
           .agg(F.round(F.median(F.col("value").cast("double")), 9)
                .alias("median_value")))
    counts = (ev.groupBy("event_type",
                         (F.col("user_id") % 10).alias("bucket"))
              .agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy("event_type")
         .orderBy(F.col("c").desc(), F.col("bucket")))
    md = (counts.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") == 1)
          .select("event_type", F.col("bucket").alias("mode_bucket")))
    return med.join(md, "event_type")
