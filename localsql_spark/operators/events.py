"""Event-time operators: tumbling / sliding / session windows and as-of joins.

The reference has no time-series surface at all (SURVEY.md §2B "Streaming —
none anywhere in the reference"); these are the north-star extensions over the
driver's ``events`` table. Everything here is built from native Spark
primitives (``F.window``, ``F.session_window``, window functions, one shuffle
per operator) and works unchanged under Structured Streaming where noted.

Scale notes
-----------
- ``F.window`` / ``F.session_window`` are plain grouping expressions: the agg
  is a single hash-partial + shuffle-on-key exchange, identical to any
  groupBy. No driver-side materialization anywhere.
- ``asof_join`` uses the union-tag + running ``last(ignorenulls)`` pattern:
  ONE shuffle on the join key, no correlated per-row probing and no broadcast
  requirement, so it survives arbitrarily large both sides. This is the same
  strategy Flink/Kafka-streams use for temporal joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, duration: str, ts_col: str = "ts",
                 group_cols: list[str] | None = None,
                 aggs: list[Column] | None = None) -> DataFrame:
    """Fixed, non-overlapping event-time windows via ``F.window``.

    Works identically in batch and Structured Streaming (add a watermark for
    the streaming case — see streaming/stream_agg.py).
    """
    group_cols = list(group_cols) if group_cols is not None else []
    aggs = list(aggs) if aggs is not None else [F.count("*").alias("n")]
    agged = (events
             .groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
             .agg(*aggs))
    return agged.select(F.col("w.start").alias("w_start"),
                        F.col("w.end").alias("w_end"),
                        *group_cols,
                        *_agg_out_names(agged, group_cols))


def sliding_agg(events: DataFrame, duration: str, slide: str,
                ts_col: str = "ts", group_cols: list[str] | None = None,
                aggs: list[Column] | None = None) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    group_cols = list(group_cols) if group_cols is not None else []
    aggs = list(aggs) if aggs is not None else [F.count("*").alias("n")]
    agged = (events
             .groupBy(F.window(ts_col, duration, slide).alias("w"), *group_cols)
             .agg(*aggs))
    return agged.select(F.col("w.start").alias("w_start"),
                        F.col("w.end").alias("w_end"),
                        *group_cols,
                        *_agg_out_names(agged, group_cols))


def session_agg(events: DataFrame, gap: str, ts_col: str = "ts",
                key_cols: list[str] | None = None,
                aggs: list[Column] | None = None) -> DataFrame:
    """Session windows (merge events closer than ``gap``) via the native
    ``F.session_window`` grouping expression — batch and streaming capable.

    Window end = last event + gap (Spark semantics; the SQL-oracle mirror is
    the classic gaps-and-islands rewrite)."""
    key_cols = list(key_cols) if key_cols is not None else []
    aggs = list(aggs) if aggs is not None else [F.count("*").alias("n")]
    agged = (events
             .groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
             .agg(*aggs))
    return agged.select(F.col("w.start").alias("s_start"),
                        F.col("w.end").alias("s_end"),
                        *key_cols,
                        *_agg_out_names(agged, key_cols))


def asof_join(left: DataFrame, right: DataFrame, *, on: list[str],
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              tiebreak: str | None = None,
              direction: str = "backward",
              tolerance_s: float | None = None,
              suffix: str = "_asof") -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (``direction="backward"``, default) or the
    earliest right row with ``right_ts >= left_ts`` (``"forward"``),
    with equal keys.

    Implementation: tag both sides, union, ONE shuffle on ``on``, then a
    running ``last(..., ignorenulls=True)`` over (ts, side) picks the most
    recent right payload at or before each left row. At equal timestamps the
    right row sorts first (side 0 < 1), so "at or before" includes ties;
    among equal-ts right rows the largest ``tiebreak`` wins (deterministic).

    Left rows with no prior right row keep NULL payloads (left-outer
    semantics). Cost: one shuffle + one window pass, both sides arbitrarily
    large — never a broadcast or a per-row probe.
    """
    if right_cols is None:  # explicit [] = timestamp-only as-of, respect it
        right_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    payload = F.struct(F.col(right_ts).alias("__rts"),
                       *[F.col(c).alias(c) for c in right_cols])

    # NULL right timestamps can never satisfy the as-of predicate, but an
    # ascending sort puts NULLs FIRST — an unfiltered dirty row would be
    # carried as the "most recent prior" match for every left row
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(*on,
                     F.col(right_ts).alias("__ts"),
                     F.lit(0).alias("__side"),
                     tb.alias("__tb"),
                     payload.alias("__payload"),
                     *[F.lit(None).alias(f"__l_{i}")
                       for i in range(len(left.columns))])
    lcols = left.columns
    l = left.select(*on,
                    F.col(left_ts).alias("__ts"),
                    F.lit(1).alias("__side"),
                    F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
                    F.lit(None).cast(r.schema["__payload"].dataType)
                        .alias("__payload"),
                    *[F.col(c).alias(f"__l_{i}") for i, c in enumerate(lcols)])

    if direction == "backward":
        # ascending traversal; at equal ts the right row precedes the left
        # (side 0 < 1) so "at or before" is inclusive; among equal-ts right
        # rows the LAST seen (largest tiebreak) wins
        order = [F.col("__ts").asc(), F.col("__side").asc(),
                 F.col("__tb").asc_nulls_first()]
    elif direction == "forward":
        # descending traversal; right still precedes left at equal ts, and
        # the last seen right row is the SMALLEST tiebreak (desc order)
        order = [F.col("__ts").desc(), F.col("__side").asc(),
                 F.col("__tb").desc_nulls_first()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (Window.partitionBy(*on)
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r.unionByName(l)
               .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1)
               # a LEFT row with a NULL timestamp can never satisfy the
               # as-of predicate either; in forward mode the desc sort
               # puts it after every right row and the running carry
               # would hand it the earliest right payload — keep the
               # left-outer NULL instead (backward already behaves so)
               .withColumn("__m", F.when(F.col("__ts").isNotNull(),
                                         F.col("__m"))))
    if tolerance_s is not None:
        # drop matches further than tolerance from the left timestamp
        gap = F.abs(F.unix_micros(F.col("__ts").cast("timestamp"))
                    - F.unix_micros(F.col("__m.__rts").cast("timestamp")))
        matched = matched.withColumn(
            "__m", F.when(gap <= int(tolerance_s * 1e6), F.col("__m")))
    return matched.select(
        *[F.col(f"__l_{i}").alias(c) for i, c in enumerate(lcols)],
        F.col(f"__m.__rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols])


def range_join(left: DataFrame, right: DataFrame, *, on: list[str],
               left_ts: str, right_ts: str, lower_s: float,
               upper_s: float) -> DataFrame:
    """Interval join: pairs with ``right_ts - left_ts`` in [lower_s, upper_s]
    seconds (plus equal keys), via BUCKETED candidate generation.

    A naive theta join is a per-key cross product. Instead each side is
    bucketed to ``ceil(span)``-second buckets and the left side expands to
    the (at most 2-3) buckets its window can reach, so the join is a plain
    equi-join on (keys, bucket) — shuffle-partitionable, skew-handled by AQE
    — followed by the exact range filter. This is the standard scale pattern
    for range/interval joins (same shape Databricks' range-join optimization
    produces).
    """
    if left_ts == right_ts:
        # the joined frame would carry two identically-named ts columns and
        # the range filter could not disambiguate them
        raise ValueError(
            "range_join needs distinct timestamp column names; alias one "
            f"side (both are {left_ts!r})")
    span = max(upper_s - lower_s, 1e-9)
    bucket_s = int(span) + 1
    lts = F.col(left_ts).cast("timestamp")
    rts = F.col(right_ts).cast("timestamp")
    n_buckets = int(span // bucket_s) + 2  # window spans <= 2 buckets + slack

    l = left.withColumn(
        "__b0", F.floor((F.unix_micros(lts) / 1e6 + lower_s) / bucket_s))
    l = l.withColumn("__b", F.explode(F.array(
        *[F.col("__b0") + i for i in range(n_buckets)]))).drop("__b0")
    r = right.withColumn(
        "__b", F.floor(F.unix_micros(rts) / 1e6 / bucket_s))

    delta = (F.unix_micros(rts) - F.unix_micros(lts)) / 1e6
    return (l.join(r, on=[*on, "__b"])
            .filter((delta >= lower_s) & (delta <= upper_s))
            .drop("__b"))


def _agg_out_names(agged: DataFrame, group_cols: list[str]) -> list[Column]:
    """Aggregate output columns = everything the groupBy produced except the
    window struct and the grouping keys (robust to unaliased aggregates and
    casts — no expression-string parsing)."""
    skip = {"w", *group_cols}
    return [F.col(f"`{c}`") for c in agged.columns if c not in skip]


def multi_touch_attribution(events: DataFrame, *,
                            conversion_type: str = "purchase",
                            touch_types: tuple = ("click", "view"),
                            window_s: float = 7 * 86400.0,
                            halflife_s: float = 86400.0,
                            ts_col: str = "ts",
                            user_col: str = "user_id",
                            id_col: str = "event_id",
                            type_col: str = "event_type") -> DataFrame:
    """Multi-touch attribution: split each conversion's credit across the
    user's preceding touch events inside the lookback window, under both
    the LINEAR model (1/n to each touch) and the TIME-DECAY model
    (weight 2^(-age/halflife), normalized per conversion) — the standard
    marketing-analytics pair, aggregated to per-channel credit.

    Output: ``channel, n_conversions, linear_credit, decay_credit`` —
    n_conversions counts conversions the channel touched; the credit
    columns each sum to the number of attributed conversions across
    channels.

    Scale shape: the conversion-touch pairing is :func:`range_join`'s
    bucketed candidate generation (equi-join on (user, time-bucket) +
    exact filter — never a per-user cross product); per-conversion
    normalizers are window aggregates over the pair set (one shuffle on
    the conversion id); the final per-channel aggregate is
    channel-bounded.  Determinism: weights and credit fractions round to
    9 decimals and sum as DECIMAL(28,9); the normalizer division runs on
    the exact decimal values' doubles, so no engine's aggregation order
    can perturb a credit."""
    from pyspark.sql.window import Window

    dec = "decimal(28,9)"
    conv = (events.filter(F.col(type_col) == conversion_type)
            .select(F.col(id_col).alias("conv_id"), user_col,
                    F.col(ts_col).alias("cts")))
    touch = (events.filter(F.col(type_col).isin(*touch_types))
             .select(F.col(id_col).alias("touch_id"),
                     F.col(type_col).alias("channel"), user_col,
                     F.col(ts_col).alias("tts")))
    pairs = range_join(touch, conv, on=[user_col], left_ts="tts",
                       right_ts="cts", lower_s=0.0, upper_s=window_s)
    delta = ((F.unix_micros(F.col("cts").cast("timestamp"))
              - F.unix_micros(F.col("tts").cast("timestamp"))) / 1e6)
    w9 = F.round(F.pow(F.lit(2.0), -delta / halflife_s), 9).cast(dec)
    wc = Window.partitionBy("conv_id")
    scored = (pairs.select("conv_id", "channel", w9.alias("w9"))
              .withColumn("n", F.count(F.lit(1)).over(wc))
              .withColumn("sumw", F.sum("w9").over(wc)))
    linear9 = F.round(F.lit(1.0) / F.col("n"), 9).cast(dec)
    # a conversion whose every touch weight rounds to 0 (delta/halflife
    # beyond ~31, e.g. hour-halflife against the 7-day window) has
    # sumw = 0: a bare division raises DIVIDE_BY_ZERO under ANSI mode —
    # fall back to the equal split so the conversion's credit still
    # sums to 1 (the limit of the decay model as all weights vanish
    # together)
    decay9 = F.when(F.col("sumw") == 0, linear9).otherwise(
        F.round(F.col("w9").cast("double")
                / F.col("sumw").cast("double"), 9).cast(dec))
    return (scored.groupBy("channel")
            .agg(F.countDistinct("conv_id").alias("n_conversions"),
                 F.round(F.sum(linear9).cast("double"), 6)
                 .alias("linear_credit"),
                 F.round(F.sum(decay9).cast("double"), 6)
                 .alias("decay_credit")))


def km_survival(events: DataFrame, *, churn_gap_s: float = 14 * 86400.0,
                ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime (Kaplan & Meier,
    JASA 1958 — the standard censoring-aware churn curve): each user's
    lifetime runs from first to last activity; a user whose last
    activity is more than ``churn_gap_s`` before the observation cutoff
    (the global max timestamp) is CHURNED at that lifetime, anyone still
    active near the cutoff is CENSORED — their lifetime is a lower
    bound, and discarding or death-counting them (what a naive churn
    query does) biases the curve, which is the whole reason KM exists.

    S(d) = prod over days d' <= d of (1 - deaths(d') / at_risk(d')),
    with censored users leaving the risk set silently at their bound.

    Output: one row per observed lifetime day —
    ``day, n_at_risk, n_churned, n_censored, survival`` (day ascending).

    Scale shape: one user-key aggregate (first/last activity), row-local
    duration/censor arithmetic, a day-key aggregate (bounded by the
    observation span), and two window passes over that bounded day table
    — corpus-sized work is exactly two shuffles.  Determinism: the KM
    product runs as a cumulative DECIMAL sum of 9-rounded log10 factors
    (partial-aggregation order cannot perturb it), exponentiated once
    per row and rounded to 6.
    """
    from pyspark.sql.window import Window

    dec = "decimal(28,9)"
    ts = F.col(ts_col).cast("timestamp")
    per_user = (events.groupBy(user_col)
                .agg(F.min(F.unix_micros(ts)).alias("first_us"),
                     F.max(F.unix_micros(ts)).alias("last_us")))
    cutoff = per_user.agg(F.max("last_us").alias("cutoff_us"))
    gap_us = int(churn_gap_s * 1e6)
    # BOTH outcomes end observation at the user's LAST ACTIVITY: a
    # churned user died there, a censored user was last OBSERVED alive
    # there.  (Censoring at the cutoff — the round-8 behavior — kept
    # censored users in the risk set for up to churn_gap_s days nobody
    # observed them, deflating the hazard and biasing survival upward;
    # standard KM right-censors at the last observation time.)
    u = (per_user.crossJoin(F.broadcast(cutoff))
         .withColumn("churned",
                     F.col("last_us") < F.col("cutoff_us") - gap_us)
         .withColumn("day",
                     F.floor((F.col("last_us") - F.col("first_us"))
                             / (86400 * 1_000_000)).cast("long")))
    days = (u.groupBy("day")
            .agg(F.sum(F.col("churned").cast("long")).alias("n_churned"),
                 F.sum((~F.col("churned")).cast("long")).alias("n_censored")))
    w_all = (Window.orderBy("day")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_prev = (Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, -1))
    # the user total derives from the day table itself (every user exits
    # on exactly one day) — an eager u.count() here used to recompute
    # the whole per-user aggregation as a second corpus job
    w_full = (Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    total = F.sum(F.col("n_churned") + F.col("n_censored")).over(w_full)
    left_before = F.coalesce(
        F.sum(F.col("n_churned") + F.col("n_censored")).over(w_prev),
        F.lit(0))
    at_risk = total - left_before
    # a day where every at-risk user churns drives the factor to 0 and
    # log10 to -inf; clamp at 1e-12 (rounds to 0.000000 survival, and the
    # cumulative sum keeps the curve at zero thereafter) — same clamp in
    # the oracle, so both engines agree exactly
    log_factor = F.round(
        F.log10(F.greatest(F.lit(1.0)
                           - F.col("n_churned").cast("double")
                           / F.col("n_at_risk"), F.lit(1e-12))), 9).cast(dec)
    scored = (days.withColumn("n_at_risk", at_risk)
              .withColumn("_lf", log_factor)
              .withColumn("_cum", F.sum("_lf").over(w_all)))
    return (scored.select(
        "day", "n_at_risk", "n_churned", "n_censored",
        F.round(F.pow(F.lit(10.0), F.col("_cum").cast("double")), 6)
        .alias("survival"))
        .orderBy("day"))
