"""Event-time workload: tumbling / sliding / session windows + as-of join
over the driver's ``events`` table (north-star extension — the reference has
no time-series surface at all, SURVEY.md §2B).

Determinism: window bounds surface as epoch microseconds (BIGINT on both
sides), value sums go through DECIMAL(18,2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators import events as E
from localsql_spark.workload import load, query

def _us(c):
    """Epoch microseconds of an NTZ timestamp (session TZ pinned UTC, so the
    NTZ->LTZ cast is an identity relabel; matches DuckDB epoch_us)."""
    return F.unix_micros(F.col(c).cast("timestamp"))


def _val_sum():
    # the determinism-critical decimal-routed sum idiom lives in ONE place
    from localsql_spark.workload.relational import dsum
    return dsum("value")


@query("events_tumbling_hourly", oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""")
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type: one shuffle
    (hash-partial then exchange on (window, type)); streaming-capable as-is
    (operators.events.tumbling_agg)."""
    ev = load(spark, sf_dir)["events"]
    out = E.tumbling_agg(ev, "1 hour", group_cols=["event_type"],
                         aggs=[F.count("*").alias("n"),
                               _val_sum().alias("sum_value")])
    return out.select(_us("w_start").alias("w_start_us"),
                      "event_type", "n", "sum_value")


@query("events_sliding_1h_30m", oracle="""
WITH e AS (SELECT event_type, value,
                  CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS b
           FROM events),
w AS (SELECT event_type, value, (b - 1800 * i) AS ws
      FROM e CROSS JOIN UNNEST([0, 1]) u(i))
SELECT ws * 1000000 AS w_start_us, event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM w GROUP BY 1, 2
""")
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30m slide): each event expands into
    duration/slide = 2 windows before the single grouping shuffle
    (operators.events.sliding_agg)."""
    ev = load(spark, sf_dir)["events"]
    out = E.sliding_agg(ev, "1 hour", "30 minutes", group_cols=["event_type"],
                        aggs=[F.count("*").alias("n"),
                              _val_sum().alias("sum_value")])
    return out.select(_us("w_start").alias("w_start_us"),
                      "event_type", "n", "sum_value")


@query("events_session_30m", oracle="""
WITH o AS (SELECT user_id, ts, event_id, value,
                  lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pts
           FROM events),
m AS (SELECT *, CASE WHEN pts IS NULL
                      OR epoch_us(ts) - epoch_us(pts) > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM o),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
SELECT user_id, epoch_us(min(ts)) AS s_start_us,
       epoch_us(max(ts)) + 1800000000 AS s_end_us,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
""")
def events_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap) via the native
    ``F.session_window`` grouping — batch now, streaming-capable unchanged.
    Oracle is the classic gaps-and-islands rewrite; session end = last event
    + gap on both sides (operators.events.session_agg)."""
    ev = load(spark, sf_dir)["events"]
    out = E.session_agg(ev, "30 minutes", key_cols=["user_id"],
                        aggs=[F.count("*").alias("n_events"),
                              _val_sum().alias("sum_value")])
    return out.select("user_id",
                      _us("s_start").alias("s_start_us"),
                      _us("s_end").alias("s_end_us"),
                      "n_events", "sum_value")


@query("asof_join_purchase_click", oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
      FROM events WHERE event_type = 'click'),
j AS (SELECT p.event_id, p.user_id, p.ts, c.ts AS cts,
             c.click_id, c.click_value,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.click_id DESC) AS rn
      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
       epoch_us(cts) AS click_us, click_id, click_value
FROM j WHERE rn = 1
""")
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase matched to the user's most recent
    click at-or-before it. Union-tag + running last(ignorenulls) — ONE
    shuffle on user_id, no correlated probe, both sides scale freely
    (operators.events.asof_join)."""
    ev = load(spark, sf_dir)["events"]
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("event_id", "user_id", "ts"))
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", "ts",
                 F.col("event_id").alias("click_id"),
                 F.col("value").alias("click_value")))
    j = E.asof_join(p, c, on=["user_id"], left_ts="ts", right_ts="ts",
                    right_cols=["click_id", "click_value"],
                    tiebreak="click_id")
    return j.select("event_id", "user_id",
                    _us("ts").alias("purchase_us"),
                    _us("ts_asof").alias("click_us"),
                    F.col("click_id_asof").alias("click_id"),
                    F.col("click_value_asof").alias("click_value"))


@query("salted_agg_event_type", oracle="""
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY 1
""")
def salted_agg_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase aggregation: groupBy (key, salt) spreads hot keys
    over 16 reducers, then a tiny final groupBy(key) recombines — result
    bit-identical to the direct groupBy (decimal partials), which is exactly
    what the oracle checks (operators.skew.salted_agg)."""
    from localsql_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir)["events"]
    out = salted_agg(
        ev, ["event_type"],
        {"n": F.count(F.lit(1)),
         "sum_value": F.sum(F.col("value").cast("decimal(18,2)")),
         "min_v": F.min("value"),
         "max_v": F.max("value")},
        n_salts=16)
    return out.select("event_type", "n",
                      F.col("sum_value").cast("double").alias("sum_value"),
                      "min_v", "max_v")


@query("range_join_purchase_error_5m", oracle="""
WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS pts FROM events
           WHERE event_type = 'purchase'),
e AS (SELECT user_id, event_id AS error_id, ts AS ets FROM events
      WHERE event_type = 'error')
SELECT p.user_id, purchase_id, error_id,
       epoch_us(pts) AS purchase_us, epoch_us(ets) AS error_us
FROM p JOIN e ON p.user_id = e.user_id
WHERE epoch_us(ets) - epoch_us(pts) BETWEEN 0 AND 300000000
""")
def range_join_purchase_error_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (errors within 5 minutes AFTER a purchase, same user)
    via bucketed candidate generation — an equi-join on (user, time-bucket)
    plus exact filter, never a per-key cross product
    (operators.events.range_join)."""
    ev = load(spark, sf_dir)["events"]
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("pts")))
    e = (ev.filter(F.col("event_type") == "error")
         .select("user_id", F.col("event_id").alias("error_id"),
                 F.col("ts").alias("ets")))
    j = E.range_join(p, e, on=["user_id"], left_ts="pts", right_ts="ets",
                     lower_s=0.0, upper_s=300.0)
    return j.select("user_id", "purchase_id", "error_id",
                    _us("pts").alias("purchase_us"),
                    _us("ets").alias("error_us"))


@query("streaming_tumbling_hourly", oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""")
def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling aggregation as a REAL Structured Streaming query:
    file stream -> watermark -> windowed agg -> memory sink (availableNow),
    result checked against the same batch oracle
    (streaming.stream_agg.tumbling_stream)."""
    from localsql_spark.streaming.stream_agg import tumbling_stream

    load(spark, sf_dir)
    return tumbling_stream(spark, sf_dir)


@query("streaming_stateful_user_stats", oracle="""
SELECT user_id, count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
""")
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running totals in the keyed state store; drained final state equals the
    batch aggregate exactly (integer-cents accumulation)
    (streaming.stream_agg.stateful_user_stats)."""
    from localsql_spark.streaming.stream_agg import stateful_user_stats

    load(spark, sf_dir)
    return stateful_user_stats(spark, sf_dir)


@query("grouped_zscore_pandas", oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mu,
         count(*) AS n,
         CAST(SUM(CAST(round(value * value, 4) AS DECIMAL(28,4))) AS DOUBLE)
           AS ss
  FROM events GROUP BY 1)
SELECT e.event_id, e.event_type,
       round((e.value - mu) / sqrt(ss / n - mu * mu), 6) AS zscore
FROM events e JOIN stats USING (event_type)
""")
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas transform (applyInPandas): per-event_type z-score
    computed inside an Arrow batch per group. The Python stage mirrors the
    decimal-exact moment computation so the result is bit-comparable to the
    SQL oracle. Plan shape: one shuffle on the grouping key, then a narrow
    vectorized map per group — the canonical per-group normalization at
    scale (operators: pyspark applyInPandas)."""
    from decimal import Decimal

    def zscore(pdf):
        import pandas as pd

        n = len(pdf)
        v = pdf["value"]
        mu = float(sum(Decimal(f"{x:.2f}") for x in v)) / n
        ss = float(sum(Decimal(f"{round(x * x, 4):.4f}") for x in v))
        sd = (ss / n - mu * mu) ** 0.5
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": ((v - mu) / sd).round(6),
        })

    ev = load(spark, sf_dir)["events"]
    return (ev.select("event_id", "event_type", "value")
            .groupBy("event_type")
            .applyInPandas(zscore,
                           "event_id long, event_type string, zscore double"))


@query("events_props_json", oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
FROM events
""")
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over a real string column (events.props) — the json1
    capability the reference reaches via SQLite (SURVEY.md §2B json1):
    get_json_object stays row-local/codegen'd; at scale prefer one from_json
    with an explicit schema when extracting many keys."""
    ev = load(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_bucket"))


@query("cogroup_user_activity", oracle="""
WITH e AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
o AS (SELECT o_custkey AS user_id, count(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_order_price
      FROM orders GROUP BY 1)
SELECT COALESCE(e.user_id, o.user_id) AS user_id,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(n_orders, 0) AS n_orders,
       sum_order_price
FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
""")
def cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map Pandas (groupBy.cogroup.applyInPandas): per-key merge of
    two tables' groups in one Arrow-batched Python stage — the API for
    custom two-sided per-key logic that SQL can't express. One shuffle per
    side on the key; the oracle is the degenerate (aggregate-only) case."""
    from decimal import Decimal

    def merge(key, ev_pdf, ord_pdf):
        import pandas as pd

        total = (float(sum(Decimal(f"{x:.2f}") for x in ord_pdf["o_totalprice"]))
                 if len(ord_pdf) else None)
        return pd.DataFrame({
            "user_id": [key[0]], "n_events": [len(ev_pdf)],
            "n_orders": [len(ord_pdf)], "sum_order_price": [total]})

    t = load(spark, sf_dir)
    ev = t["events"].select("user_id", "event_id")
    orders = t["orders"].select(F.col("o_custkey").alias("user_id"),
                                "o_totalprice")
    return (ev.groupBy("user_id").cogroup(orders.groupBy("user_id"))
            .applyInPandas(merge, "user_id long, n_events long, "
                                  "n_orders long, sum_order_price double"))


@query("streaming_dedup_events", oracle="""
SELECT event_id, user_id, event_type, value FROM events
""")
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark) over a source
    that delivers every event TWICE (two files): bounded keyed state drops
    the duplicates, output equals the plain table
    (streaming.stream_agg.streaming_dedup)."""
    from localsql_spark.streaming.stream_agg import streaming_dedup

    load(spark, sf_dir)
    return streaming_dedup(spark, sf_dir)


@query("streaming_session_30m", oracle="""
WITH o AS (SELECT user_id, ts, event_id, value,
                  lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pts
           FROM events),
m AS (SELECT *, CASE WHEN pts IS NULL
                      OR epoch_us(ts) - epoch_us(pts) > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM o),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
SELECT user_id, epoch_us(min(ts)) AS s_start_us,
       epoch_us(max(ts)) + 1800000000 AS s_end_us,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
""")
def streaming_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as a REAL streaming query: session_window + watermark
    with merging keyed state, drained to completion — equals the batch
    gaps-and-islands result (streaming.stream_agg.session_stream)."""
    from localsql_spark.streaming.stream_agg import session_stream

    load(spark, sf_dir)
    return session_stream(spark, sf_dir)


def _hll_oracle() -> str:
    from localsql_spark.operators.sketches import HLL_ALPHA, HLL_B, HLL_M

    m, w = HLL_M, 32 - HLL_B
    return f"""
WITH h AS (SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS h
           FROM events WHERE user_id IS NOT NULL),
r AS (SELECT h % {m} AS bucket,
             CASE WHEN (h >> {HLL_B}) = 0 THEN {w + 1}
                  ELSE {w} - CAST(floor(log2(CAST(h >> {HLL_B} AS DOUBLE)))
                                  AS INT) END AS rank
      FROM h),
regs AS (SELECT bucket, max(rank) AS m_rank FROM r GROUP BY bucket),
agg AS (SELECT count(*) AS seen, SUM(pow(2.0, -m_rank)) AS present_sum
        FROM regs)
SELECT CAST(seen AS BIGINT) AS n_buckets_seen,
       round(CASE WHEN ({HLL_ALPHA * m * m!r} / (present_sum + ({m} - seen)))
                       <= {2.5 * m}
                   AND ({m} - seen) > 0
                  THEN {m} * ln({float(m)!r} / ({m} - seen))
                  ELSE {HLL_ALPHA * m * m!r} / (present_sum + ({m} - seen))
             END, 6) AS estimate
FROM agg
"""


@query("hll_distinct_users", oracle=_hll_oracle())
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-count of events.user_id: md5-derived
    bucket+rank registers, linear-counting small-range correction — the
    sketch and estimate are bit-reproducible in any engine (unlike the
    builtin HLL++), so the oracle checks the real algorithm. Narrow map ->
    fixed-fan-in groupBy(bucket) -> single-row aggregate; merges across
    datasets by per-bucket max (operators.sketches)."""
    from localsql_spark.operators.sketches import hll_estimate

    ev = load(spark, sf_dir)["events"]
    return hll_estimate(ev, "user_id")


@query("percentiles_by_event_type", oracle="""
SELECT event_type,
       round(quantile_cont(CAST(value AS DOUBLE), 0.25), 9) AS p25,
       round(quantile_cont(CAST(value AS DOUBLE), 0.5), 9) AS p50,
       round(quantile_cont(CAST(value AS DOUBLE), 0.75), 9) AS p75
FROM events GROUP BY 1
""")
def percentiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics). Exact percentiles need a per-group
    sort; at 100 TB swap in `percentile_approx` (t-digest-style mergeable
    sketch) when rank error is acceptable."""
    ev = load(spark, sf_dir)["events"]
    return (ev.groupBy("event_type")
            .agg(F.round(F.percentile("value", F.lit(0.25)), 9).alias("p25"),
                 F.round(F.percentile("value", F.lit(0.5)), 9).alias("p50"),
                 F.round(F.percentile("value", F.lit(0.75)), 9).alias("p75")))


@query("histogram_order_totals", oracle="""
SELECT CAST(least(floor(o_totalprice / 30000), 19) AS BIGINT) AS bin,
       count(*) AS n,
       round(min(o_totalprice), 2) AS bin_min,
       round(max(o_totalprice), 2) AS bin_max
FROM orders GROUP BY 1
""")
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 bins of 30k, last bin open-ended) via pure
    bucket arithmetic — a single partial-aggregated groupBy whose fan-in is
    the bin count, independent of data size."""
    orders = load(spark, sf_dir)["orders"]
    bin_ = F.least(F.floor(F.col("o_totalprice") / 30000), F.lit(19)) \
            .cast("long")
    return (orders.groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("bin_min"),
                 F.round(F.max("o_totalprice"), 2).alias("bin_max")))


@query("events_props_variant", oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
""")
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data via Spark 4 VARIANT: parse_json once into the
    binary variant encoding, then typed path extraction — the modern
    (shreddable, columnar) path for JSON at scale, vs per-access string
    re-parsing with get_json_object."""
    ev = load(spark, sf_dir)["events"]
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (ev.select("event_id", k.alias("k"))
            .filter(F.col("k") >= 50))


@query("streaming_join_attribution", oracle="""
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
""")
def streaming_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase<-click attribution within 30
    minutes) as a REAL two-stream Structured Streaming join with watermarks
    on both sides — bounded state, availableNow drain; equals the batch
    interval join exactly (streaming.stream_agg.stream_stream_attribution)."""
    from localsql_spark.streaming.stream_agg import stream_stream_attribution

    load(spark, sf_dir)
    return stream_stream_attribution(spark, sf_dir)


@query("salted_join_user_tags", oracle="""
WITH dim AS (SELECT DISTINCT user_id,
                    concat('u', CAST(user_id AS VARCHAR)) AS tag
             FROM events)
SELECT e.event_id, e.user_id, d.tag
FROM events e JOIN dim d ON e.user_id = d.user_id
WHERE e.event_type = 'purchase'
""")
def salted_join_user_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-resilient equi-join via salting (operators.skew.salted_join):
    the small side replicates n_salts times, the big side salts uniformly at
    random, and the salt is dropped after the join — the RESULT is invariant
    to the salt layout (what the oracle checks: it equals the plain join),
    while every hot user spreads over n_salts reducers instead of one."""
    from localsql_spark.operators.skew import salted_join

    ev = (load(spark, sf_dir)["events"]
          .filter(F.col("event_type") == "purchase")
          .select("event_id", "user_id"))
    dim = (load(spark, sf_dir)["events"].select("user_id").distinct()
           .withColumn("tag", F.concat(F.lit("u"),
                                       F.col("user_id").cast("string"))))
    return salted_join(ev, dim, on=["user_id"], n_salts=8)


@query("streaming_enrich_static", oracle="""
SELECT c_mktsegment, event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
""")
def streaming_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment as a REAL streaming query (file
    stream joined to the batch customer dim, no join state, aggregate-only
    state, availableNow drain) — equals the batch join+aggregate exactly
    (streaming.stream_agg.enrich_static_stream)."""
    from localsql_spark.streaming.stream_agg import enrich_static_stream

    load(spark, sf_dir)
    return enrich_static_stream(spark, sf_dir)


@query("events_retention_cohorts", oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
       count(*) AS n_users
FROM active a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
""")
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted in every
    subsequent active week (the product-analytics staple).  Two aggregates
    sharing the user_id shuffle key + one equi-join on user_id — at scale
    the first-seen table is |users| rows and co-partitioned with the
    distinct-activity table, so the join is shuffle-free after the aggs.
    Week offsets are exact (both sides are week-truncated, so the day diff
    is always a multiple of 7)."""
    ev = load(spark, sf_dir)["events"]
    first_seen = (ev.groupBy("user_id")
                  .agg(F.date_trunc("week", F.min("ts")).alias("cohort")))
    active = (ev.select("user_id",
                        F.date_trunc("week", F.col("ts")).alias("wk"))
              .distinct())
    return (active.join(first_seen, "user_id")
            .groupBy(F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
                     (F.datediff(F.col("wk"), F.col("cohort")) / 7)
                     .cast("long").alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


@query("streaming_late_data", oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""")
def streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data drop, proven with an exact oracle: the source
    re-delivers the ENTIRE events file in a final micro-batch after a
    clock-advancer pushed the watermark 46h past every real event, so each
    late row must be discarded and each closed window must appear exactly
    once.  The oracle is the plain batch hourly aggregation — counts would
    be doubled if late data leaked, and the advancer's open window must be
    absent (streaming.stream_agg.late_data_stream)."""
    from localsql_spark.streaming.stream_agg import late_data_stream

    load(spark, sf_dir)
    return late_data_stream(spark, sf_dir)


def _hll_by_type_oracle() -> str:
    from localsql_spark.operators.sketches import HLL_ALPHA, HLL_B, HLL_M

    m, w = HLL_M, 32 - HLL_B
    return f"""
WITH h AS (SELECT event_type,
                  CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS h
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
r AS (SELECT event_type, h % {m} AS bucket,
             CASE WHEN (h >> {HLL_B}) = 0 THEN {w + 1}
                  ELSE {w} - CAST(floor(log2(CAST(h >> {HLL_B} AS DOUBLE)))
                                  AS INT) END AS rank
      FROM h),
regs AS (SELECT event_type, bucket, max(rank) AS m_rank
         FROM r GROUP BY event_type, bucket),
agg AS (SELECT event_type, count(*) AS seen,
               SUM(pow(2.0, -m_rank)) AS present_sum
        FROM regs GROUP BY event_type)
SELECT event_type, CAST(seen AS BIGINT) AS n_buckets_seen,
       round(CASE WHEN ({HLL_ALPHA * m * m!r} / (present_sum + ({m} - seen)))
                       <= {2.5 * m}
                   AND ({m} - seen) > 0
                  THEN {m} * ln({float(m)!r} / ({m} - seen))
                  ELSE {HLL_ALPHA * m * m!r} / (present_sum + ({m} - seen))
             END, 6) AS estimate
FROM agg
"""


@query("hll_distinct_users_by_type", oracle=_hll_by_type_oracle())
def hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped portable HLL (operators.sketches.hll_estimate_by): per-
    event_type distinct-user estimates from md5-derived registers — the
    per-source cardinality monitoring a pipeline dashboards at 100 TB.
    Two fixed-fan-in shuffles (types x 256 register rows, then types);
    sketches merge across days/datasets by per-bucket max within a group."""
    from localsql_spark.operators.sketches import hll_estimate_by

    ev = load(spark, sf_dir)["events"]
    return hll_estimate_by(ev, "user_id", "event_type")


@query("streaming_upsert_latest_event", oracle="""
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC)
           AS rn
  FROM events) r
WHERE rn = 1
""")
def streaming_upsert_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch upsert sink driven end-to-end as a driver-gated
    query: the events backlog streams into a keyed parquet table
    (streaming.foreach_upsert.stream_upsert_parquet) with key=user_id and
    version=event_id, so the drained table holds each user's latest event
    exactly — the checkpointed, crash-safe "mutable table over parquet"
    a pipeline keeps per-entity state in.  version=event_id is unique per
    key, so the deterministic-hash tiebreak never fires and the result is
    oracle-exact (latest-event-per-user in SQL)."""
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR, _normalize_nanos
    from localsql_spark.streaming.foreach_upsert import (read_table,
                                                         stream_upsert_parquet)

    load(spark, sf_dir)
    path = _normalize_nanos(Path(f"{sf_dir}/events.parquet"))
    src_dir = (_CACHE_DIR.parent / "stream"
               / Path(sf_dir.rstrip("/")).name / "__stream_events")
    src_dir.mkdir(parents=True, exist_ok=True)
    link = src_dir / path.name
    if not link.exists():
        link.symlink_to(path.resolve())
    schema = spark.read.parquet(str(path)).schema  # StructType: DDL-safe
    out_dir = tempfile.mkdtemp(prefix="upsert_out_")
    ck = tempfile.mkdtemp(prefix="upsert_ck_")
    stream_upsert_parquet(spark, source_dir=str(src_dir),
                          schema=schema, key="user_id", version="event_id",
                          out_dir=out_dir, checkpoint_dir=ck)
    return (read_table(spark, out_dir)
            .select("user_id", "event_id", "event_type", "value"))


@query("rollup_incremental_hourly", oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket_ts,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
""")
def rollup_incremental_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained hourly rollup (sinks.rollup): the events
    table is split into a bulk load plus an ingest batch (hash-mod on
    event_id; the multi-batch chain is tested in tests/test_rollup.py),
    each folded into the persisted rollup by maintain_rollup —
    which aggregates ONLY the batch and rewrites ONLY the touched
    event_date partitions (manifest-committed swap, crash-safe).  The
    oracle recomputes the rollup from the full table, proving incremental
    maintenance == full recompute for the algebraic stats; avg derives at
    read time as sum/count.  Job cost tracks ingest-batch size, not stored
    table size — the continuous-aggregate shape a 100 TB event store needs."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup

    ev = load(spark, sf_dir)["events"]
    scratch = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "rollup_hourly" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(scratch.parent / f".{scratch.name}.staging",
                  ignore_errors=True)
    m = F.pmod(hash32(F.col("event_id")), F.lit(13))
    for batch in (ev.filter(m >= 1), ev.filter(m == 0)):
        maintain_rollup(spark, str(scratch), batch, grain="hour")
    r = read_rollup(spark, str(scratch))
    return r.select(
        "bucket_ts", F.col("key").alias("event_type"), "n_events",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        "min_value", "max_value",
        F.round(F.col("sum_value").cast("double") / F.col("n_events"), 6)
        .alias("avg_value"))


@query("rollup_steady_state_hourly", oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket_ts,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
""")
def rollup_steady_state_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEADY-STATE incremental rollup maintenance: the number a capacity
    planner needs.  ``rollup_incremental_hourly`` (above) rebuilds its
    store from scratch every call for oracle checkability, so its bench
    time measures TWO full maintenance cycles plus teardown; this variant
    builds the bulk-loaded base store ONCE per sf_dir (cached on disk,
    reused across runs), then each call clones the base via a filesystem
    copy and folds in only the ingest batch (hash-mod == 0, ~1/13 of
    events) — so the timed work is one batch-sized aggregation + the
    touched event_date partition swap + the rollup read, exactly the
    per-batch cost of a long-lived continuous aggregate.  Same full-table
    oracle: steady-state maintenance == full recompute."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup

    ev = load(spark, sf_dir)["events"]
    m = F.pmod(hash32(F.col("event_id")), F.lit(13))
    base = (Path(__file__).resolve().parent.parent.parent / ".cache"
            / "rollup_steady_base" / Path(sf_dir.rstrip("/")).name)
    if not (base / "_BASE_READY").exists():
        shutil.rmtree(base, ignore_errors=True)
        base.parent.mkdir(parents=True, exist_ok=True)
        tmp = Path(tempfile.mkdtemp(prefix=f".{base.name}.build_",
                                    dir=base.parent))
        build = tmp / "store"  # must NOT pre-exist: maintain_rollup
        # treats an existing dir as an existing store and tries to read it
        maintain_rollup(spark, str(build), ev.filter(m >= 1), grain="hour")
        (build / "_BASE_READY").touch()
        try:
            build.rename(base)
        except OSError:  # lost the build race — another run committed
            pass
        shutil.rmtree(tmp, ignore_errors=True)
    work = tempfile.mkdtemp(prefix="rollup_steady_")
    shutil.rmtree(work)
    shutil.copytree(base, work)
    (Path(work) / "_BASE_READY").unlink()
    maintain_rollup(spark, work, ev.filter(m == 0), grain="hour")
    r = read_rollup(spark, str(work))
    out = r.select(
        "bucket_ts", F.col("key").alias("event_type"), "n_events",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        "min_value", "max_value",
        F.round(F.col("sum_value").cast("double") / F.col("n_events"), 6)
        .alias("avg_value")).localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


@query("streaming_rollup_hourly", oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket_ts,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
""")
def streaming_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming continuous aggregate, driver-gated end-to-end
    (streaming.stream_rollup): events arrive as three micro-batches
    (hash-mod split, mtime-ordered, maxFilesPerTrigger=1); each lands in
    an idempotent per-batch dir (exactly-once landing), then folds
    incrementally into the persisted rollup store — one batch-sized
    aggregation + touched event_date partition swap per fold, marker-
    committed.  Algebraic aggregates are batching-independent, so the
    whole-table batch SQL is an EXACT oracle for the streamed store:
    streaming ingest == full recompute, the invariance a continuous
    aggregate must prove."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.rollup import read_rollup
    from localsql_spark.streaming.stream_rollup import stream_rollup

    ev = load(spark, sf_dir)["events"]
    src_dir = (_CACHE_DIR.parent / "stream_rollup_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="rsplit_")
            (ev.filter(hash32(F.col("event_id")) % 3 == i).coalesce(1)
             .write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="stream_rollup_"))
    land = scratch / "land"
    rollup = scratch / "rollup"
    ck = scratch / "ck"
    stream_rollup(spark, source_dir=str(src_dir), schema=schema,
                  land_dir=str(land), rollup_dir=str(rollup),
                  checkpoint_dir=str(ck), grain="hour")
    r = read_rollup(spark, str(rollup))
    out = r.select(
        "bucket_ts", F.col("key").alias("event_type"), "n_events",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        "min_value", "max_value",
        F.round(F.col("sum_value").cast("double") / F.col("n_events"), 6)
        .alias("avg_value")).localCheckpoint(eager=True)
    shutil.rmtree(scratch, ignore_errors=True)
    return out


# NOTE: the transformWithStateInPandas twin of streaming_stateful_user_stats
# (streaming.stream_agg.stateful_user_stats_tws) is NOT registered as a
# driver query: the TWS state channel hard-requires google.protobuf, absent
# in this environment (stream_agg.tws_available).  It stays implemented and
# gate-tested (tests/test_streaming.py) so environments that have protobuf
# get the modern typed-state path with the same exact-oracle contract.


def _pagerank_oracle(n_iter: int = 6) -> str:
    """Unroll the fixed-iteration PageRank recurrence into chained CTEs —
    exact parity with operators.graph.pagerank including the dangling-mass
    term (all arithmetic forced to DOUBLE so both engines run the same
    IEEE ops)."""
    parts = ["""
WITH seq AS (SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
             FROM events),
e AS (SELECT event_type AS src, nxt AS dst, CAST(count(*) AS DOUBLE) AS w
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
outw AS (SELECT src, sum(w) AS tw FROM e GROUP BY 1),
ne AS (SELECT e.src, e.dst, e.w / outw.tw AS p
       FROM e JOIN outw ON e.src = outw.src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn)"""]
    for k in range(1, n_iter + 1):
        parts.append(f""",
d{k} AS (SELECT coalesce(sum(rank), CAST(0 AS DOUBLE)) AS dang
         FROM r{k - 1} WHERE node NOT IN (SELECT src FROM outw)),
c{k} AS (SELECT ne.dst AS node, sum(r.rank * ne.p) AS s
         FROM ne JOIN r{k - 1} r ON r.node = ne.src GROUP BY 1),
r{k} AS (SELECT nodes.node,
         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
           + CAST(0.85 AS DOUBLE)
             * (coalesce(c{k}.s, CAST(0 AS DOUBLE)) + d{k}.dang / nn.n)
           AS rank
         FROM nodes CROSS JOIN nn CROSS JOIN d{k}
         LEFT JOIN c{k} ON c{k}.node = nodes.node)""")
    parts.append(f"""
SELECT node, round(rank, 6) AS rank FROM r{n_iter}""")
    return "".join(parts)


@query("pagerank_event_transitions", oracle=_pagerank_oracle(6))
def pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (operators.graph.pagerank) over the event-type
    transition graph: edges = (type, next type per user in time order),
    weight = transition count; 6 fixed iterations, d=0.85, dangling mass
    redistributed uniformly.  The iterative operator the reference family
    lacks entirely — each round is one co-partitioned join + one groupBy,
    rank state is node-sized, and only the dangling scalar reaches the
    driver.  The oracle unrolls the same recurrence as chained CTEs, so
    the fixed-point arithmetic is checked bit-for-bit (to the 6-decimal
    output rounding)."""
    from pyspark.sql.window import Window

    from localsql_spark.operators.graph import pagerank

    ev = load(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lead("event_type").over(w).alias("nxt"))
    edges = (seq.filter(F.col("nxt").isNotNull())
             .groupBy(F.col("event_type").alias("src"),
                      F.col("nxt").alias("dst"))
             .agg(F.count(F.lit(1)).cast("double").alias("w")))
    pr = pagerank(edges, damping=0.85, n_iter=6)
    return pr.select("node", F.round("rank", 6).alias("rank"))


@query("user_event_sequences", oracle="""
SELECT user_id,
       count(*) AS n_events,
       md5(string_agg(event_type, '>' ORDER BY ts, event_id)) AS seq_hash,
       substr(string_agg(event_type, '>' ORDER BY ts, event_id), 1, 40)
         AS seq_head
FROM events
GROUP BY user_id
""")
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized training-example construction: each user's full
    time-ordered event-type sequence as one training row — the
    behavioral-sequence corpus shape (next-event prediction, journey
    embedding).  One groupBy(user) with sort_array over (ts, event_id,
    type) structs (event_id uniqueness makes the order total, so the
    sequence is engine-deterministic); the md5 compares the ENTIRE
    sequence against the oracle's ordered string_agg while keeping the
    result row narrow.  One user-key shuffle, collect_list bounded by
    per-user event counts — the same per-key-bounded contract as the
    session operators."""
    ev = load(spark, sf_dir)["events"]
    seq = F.concat_ws(">", F.transform(
        F.sort_array(F.collect_list(
            F.struct("ts", "event_id", "event_type"))),
        lambda s: s["event_type"]))
    return (ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.md5(seq).alias("seq_hash"),
                 F.substring(seq, 1, 40).alias("seq_head")))


@query("events_anomaly_hours", oracle="""
WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')
             AS bucket_ts, event_type, count(*) AS n_events
           FROM events GROUP BY 1, 2),
st AS (SELECT event_type,
              CAST(SUM(CAST(n_events AS DECIMAL(38,12))) AS DOUBLE)
                / COUNT(*) AS mu,
              CAST(SUM(CAST(n_events * n_events AS DECIMAL(38,12)))
                   AS DOUBLE) / COUNT(*) AS m2
       FROM h GROUP BY 1)
SELECT bucket_ts, h.event_type, n_events,
       round(CASE WHEN sqrt(greatest(m2 - mu * mu, 0.0)) > 0
                  THEN (n_events - mu) / sqrt(greatest(m2 - mu * mu, 0.0))
             END, 6) AS z
FROM h JOIN st ON st.event_type = h.event_type
WHERE CASE WHEN sqrt(greatest(m2 - mu * mu, 0.0)) > 0
           THEN abs(n_events - mu) / sqrt(greatest(m2 - mu * mu, 0.0))
      END > 3.0
""")
def events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly detection: hours whose per-type event count
    z-scores beyond |3| against that type's own hourly distribution — the
    monitoring alarm a continuous aggregate exists to feed (traffic
    spikes, ingest stalls).  Decimal-sum moments (same discipline as the
    embedding outlier gate) so the oracle replays the rollup AND the
    stats bit-for-bit; the stats table is |event_types| rows, broadcast
    back onto the hourly rollup — nothing beyond the one rollup shuffle
    moves."""
    ev = load(spark, sf_dir)["events"]
    h = (ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts").cast("timestamp")),
                      "yyyy-MM-dd HH:00:00").alias("bucket_ts"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False))

    def dec_mean(c):
        return (F.sum(F.round(c, 12).cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)))

    st = (h.groupBy("event_type")
          .agg(dec_mean(F.col("n_events")).alias("mu"),
               dec_mean(F.col("n_events") * F.col("n_events")).alias("m2")))
    std = F.sqrt(F.greatest(F.col("m2") - F.col("mu") * F.col("mu"),
                            F.lit(0.0)))
    zraw = F.when(std > 0, (F.col("n_events") - F.col("mu")) / std)
    return (h.join(F.broadcast(st), "event_type")
            .filter(F.abs(zraw) > 3.0)
            .select("bucket_ts", "event_type", "n_events",
                    F.round(zraw, 6).alias("z")))


@query("streaming_interval_join_5m", oracle="""
WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS pts FROM events
           WHERE event_type = 'purchase'),
e AS (SELECT user_id, event_id AS error_id, ts AS ets FROM events
      WHERE event_type = 'error')
SELECT p.user_id, purchase_id, error_id,
       epoch_us(pts) AS purchase_us, epoch_us(ets) AS error_us
FROM p JOIN e ON p.user_id = e.user_id
WHERE epoch_us(ets) - epoch_us(pts) BETWEEN 0 AND 300000000
""")
def streaming_interval_join_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range join as a REAL stream-stream join
    (streaming.stream_join.interval_join_stream): purchases and errors as
    two watermarked live streams, inner-joined on user plus a bounded
    event-time distance — Spark's StreamingSymmetricHashJoin buffers each
    side only until the opposite watermark clears its match window, so
    state is (join-window x rate)-bounded, never history-sized.  Draining
    with availableNow makes the result equal the batch range join, so it
    shares that exact oracle."""
    from localsql_spark.streaming.stream_join import interval_join_stream

    load(spark, sf_dir)
    return interval_join_stream(spark, sf_dir)


@query("rollup_backfill_hourly", oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket_ts,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS sum_value
FROM events
GROUP BY 1, 2
""")
def rollup_backfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill as repair, driver-gated (sinks.rollup.backfill_rollup):
    the rollup is first built WRONG on purpose — the bulk fold drops a
    slice of rows from the two earliest days (late data that missed its
    batch) — then those dates are backfilled from the source table:
    force-recomputed and swapped wholesale (idempotent, untouched dates
    keep their files).  The read-back must equal the full-table oracle,
    proving the heal is exact — the forward fold (maintain_rollup) plus
    the backward heal (backfill_rollup) are the complete
    continuous-aggregate maintenance story."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.rollup import (backfill_rollup,
                                             maintain_rollup, read_rollup)

    ev = load(spark, sf_dir)["events"]
    day = F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
    bad_days = [r[0] for r in
                ev.select(day.alias("d")).distinct().orderBy("d").limit(2)
                .collect()]
    # simulate late data: the initial load misses 1/5 of those days' rows
    late = (day.isin(bad_days)
            & (F.pmod(hash32(F.col("event_id")), F.lit(5)) == 0))
    scratch = Path(tempfile.mkdtemp(prefix="rollup_bf_"))
    store = str(scratch / "rollup")
    maintain_rollup(spark, store, ev.filter(~late), grain="hour")
    backfill_rollup(spark, store, ev, bad_days, grain="hour")
    r = read_rollup(spark, store)
    out = (r.select("bucket_ts", F.col("key").alias("event_type"),
                    "n_events",
                    F.round(F.col("sum_value").cast("double"), 6)
                    .alias("sum_value"))
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("events_multi_touch_attribution", oracle="""
WITH conv AS (SELECT event_id AS conv_id, user_id, ts AS cts
              FROM events WHERE event_type = 'purchase'),
touch AS (SELECT event_id AS touch_id, event_type AS channel, user_id,
                 ts AS tts
          FROM events WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT c.conv_id, t.channel,
         CAST(epoch_us(c.cts) - epoch_us(t.tts) AS DOUBLE) / 1e6 AS delta
  FROM touch t JOIN conv c ON t.user_id = c.user_id
  WHERE epoch_us(c.cts) >= epoch_us(t.tts)
    AND CAST(epoch_us(c.cts) - epoch_us(t.tts) AS DOUBLE) / 1e6
        <= 604800.0),
scored AS (
  SELECT conv_id, channel,
         CAST(round(pow(2.0, -delta / 86400.0), 9) AS DECIMAL(28,9)) AS w9,
         count(*) OVER (PARTITION BY conv_id) AS n,
         SUM(CAST(round(pow(2.0, -delta / 86400.0), 9) AS DECIMAL(28,9)))
           OVER (PARTITION BY conv_id) AS sumw
  FROM pairs)
SELECT channel,
       count(DISTINCT conv_id) AS n_conversions,
       round(CAST(SUM(CAST(round(1.0 / n, 9) AS DECIMAL(28,9)))
                  AS DOUBLE), 6) AS linear_credit,
       round(CAST(SUM(CAST(round(CAST(w9 AS DOUBLE) / CAST(sumw AS DOUBLE),
                                 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
         AS decay_credit
FROM scored
GROUP BY channel
""")
def events_multi_touch_attribution(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Multi-touch attribution (operators.events.multi_touch_attribution):
    each purchase's credit splits across the user's click/view touches in
    a 7-day lookback, under the linear and time-decay (1-day halflife)
    models — per-channel credit totals.  Pairing is the bucketed range
    join (never a per-user cross product); per-conversion normalizers are
    window aggregates; weights and credits are 9-rounded decimal sums so
    no aggregation order can perturb them."""
    from localsql_spark.operators.events import multi_touch_attribution

    ev = load(spark, sf_dir)["events"]
    return multi_touch_attribution(ev)


@query("events_rfm_segments", oracle="""
WITH rfm AS (
  SELECT user_id,
         max(ts) AS last_ts,
         count(*) AS frequency,
         CAST(SUM(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
           AS monetary
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id),
q AS (
  SELECT user_id,
         NTILE(5) OVER (ORDER BY last_ts DESC, user_id) AS r_q,
         NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_q,
         NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_q
  FROM rfm)
SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
       CAST(m_q AS INT) AS m_q, count(*) AS n_users
FROM q
GROUP BY 1, 2, 3
""")
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per purchasing user, recency (last purchase),
    frequency (purchase count) and monetary (decimal-summed spend)
    quintiles — the classic customer-value grid, here as segment
    occupancy counts.  Each NTILE orders with a user_id tiebreak so the
    quintile boundaries are engine-exact; monetary goes through DECIMAL
    so partial-aggregation order cannot move a user across a boundary.
    One user-key aggregate + three windows over the (bounded) user set +
    a 125-row-max segment count."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir)["events"]
    rfm = (ev.filter(F.col("event_type") == "purchase")
           .groupBy("user_id")
           .agg(F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("frequency"),
                F.sum(F.round("value", 6).cast("decimal(28,6)"))
                .cast("double").alias("monetary")))
    q = rfm.select(
        "user_id",
        F.ntile(5).over(Window.orderBy(F.col("last_ts").desc(), "user_id"))
        .alias("r_q"),
        F.ntile(5).over(Window.orderBy(F.col("frequency").desc(), "user_id"))
        .alias("f_q"),
        F.ntile(5).over(Window.orderBy(F.col("monetary").desc(), "user_id"))
        .alias("m_q"))
    return (q.groupBy("r_q", "f_q", "m_q")
            .agg(F.count(F.lit(1)).alias("n_users")))


@query("events_km_survival", oracle="""
WITH per_user AS (
  SELECT user_id, epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us
  FROM events GROUP BY user_id),
co AS (SELECT max(last_us) AS cutoff_us FROM per_user),
u AS (
  SELECT user_id,
         last_us < cutoff_us - 1209600000000 AS churned,
         CAST(floor((last_us - first_us) / 86400000000.0) AS BIGINT) AS day
  FROM per_user CROSS JOIN co),
days AS (
  SELECT day,
         SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS n_churned,
         SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS n_censored
  FROM u GROUP BY day),
tot AS (SELECT count(*) AS total FROM u),
risk AS (
  SELECT day, n_churned, n_censored,
         total - COALESCE(SUM(n_churned + n_censored)
                          OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS n_at_risk
  FROM days CROSS JOIN tot),
scored AS (
  SELECT day, n_at_risk, n_churned, n_censored,
         SUM(CAST(round(log10(greatest(
               1.0 - CAST(n_churned AS DOUBLE) / n_at_risk, 1e-12)), 9)
             AS DECIMAL(28,9)))
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum
  FROM risk)
SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(n_churned AS BIGINT) AS n_churned,
       CAST(n_censored AS BIGINT) AS n_censored,
       round(pow(10.0, CAST(cum AS DOUBLE)), 6) AS survival
FROM scored
""")
def events_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn curve (operators.events.km_survival, Kaplan &
    Meier JASA 1958): user lifetimes from first to last activity, a
    14-day silence before the observation cutoff marking churn, everyone
    else CENSORED at their LAST OBSERVED activity (standard KM
    right-censoring — round-9 review fix: censoring at the cutoff kept
    users in the risk set through days nobody observed them, biasing
    survival upward) — the bias-correct estimate a naive churn query
    cannot produce.  Two corpus shuffles (per-user agg, day agg); the KM
    product is a cumulative decimal sum of 9-rounded log factors,
    engine-exact."""
    from localsql_spark.operators.events import km_survival

    ev = load(spark, sf_dir)["events"]
    return km_survival(ev, churn_gap_s=14 * 86400.0)


@query("rollup_with_retention", oracle="""
WITH mx AS (SELECT max(CAST(ts AS DATE)) AS m FROM events)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket_ts,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS sum_value
FROM events, mx
WHERE CAST(ts AS DATE) >= m - 7
GROUP BY 1, 2
""")
def rollup_with_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate WITH a retention policy
    (sinks.rollup.maintain_rollup retain_from= — the TimescaleDB
    pattern: a rolling window of hourly stats, old days dropped by the
    maintenance loop itself): two ingest folds under a max_date-7
    cutoff, where the expiry is METADATA-ONLY (expire_partitions — no
    partition read, survivors byte-stable) and batch stragglers below
    the cutoff are dropped BEFORE the fold so an expired date can never
    resurrect for a cycle.  The oracle recomputes the retained window
    from the base table — incremental-with-retention == full recompute
    over exactly the window."""
    import datetime
    import shutil
    import tempfile

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup

    ev = load(spark, sf_dir)["events"]
    mx = ev.agg(F.max(F.to_date("ts"))).first()[0]
    cutoff = (mx - datetime.timedelta(days=7)).isoformat()
    scratch = tempfile.mkdtemp(prefix="rollup_ret_")
    try:
        m = F.pmod(hash32(F.col("event_id")), F.lit(13))
        for batch in (ev.filter(m >= 1), ev.filter(m == 0)):
            maintain_rollup(spark, scratch, batch, grain="hour",
                            retain_from=cutoff)
        r = read_rollup(spark, scratch)
        return (r.select(
            "bucket_ts", F.col("key").alias("event_type"), "n_events",
            F.round(F.col("sum_value").cast("double"), 6)
            .alias("sum_value"))
            .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
