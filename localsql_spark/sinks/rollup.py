"""Incrementally-maintained aggregate rollups: a persisted hourly (or
daily) summary of an append-only event stream, updated per ingest batch by
touching only the date partitions the batch lands in — the
hypertable-continuous-aggregate / incremental-view-maintenance shape.

Why this matters at 100 TB: the raw events table grows without bound, but
dashboards and monitors read the same GROUP BY hour/type aggregate every
time.  Recomputing it is a full scan per refresh; maintaining it costs one
aggregation OVER THE NEW BATCH plus a rewrite of the touched date
partitions — job cost tracks ingest rate, not table size.

Correctness rests on the rollup carrying only ALGEBRAIC (mergeable)
aggregates — count, sum, min, max — so merging a batch delta into the
stored state is itself a groupBy over (stored ∪ delta).  Averages and
ratios derive at READ time (sum/count); percentiles need a mergeable
sketch (operators.sketches.quantile_sketch) rather than a stored scalar.
The registered query's oracle recomputes the rollup from the FULL event
table, proving incremental maintenance ≡ full recompute.

Crash safety reuses the merge sink's staged-write + manifest-rename
machinery (sinks.merge): the swap set commits atomically via one rename,
and a crashed maintenance heals on the next write or
``recover_pending_merge`` call.

The reference has no persistence at all (table lifetime = process,
reference: localsql/localsql.py:31); this is a pure scale extension.

Determinism: sums go through DECIMAL(28,6) so partial-aggregation order
cannot perturb low bits; the bucket timestamp surfaces as a formatted
string (portable across engines).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.sinks.locks import locked_by

from localsql_spark.sinks.merge import (_apply_manifest, _manifest_path,
                                        read_base_partitions,
                                        recover_pending_merge)

_GRAINS = {"hour": "yyyy-MM-dd HH:00:00", "day": "yyyy-MM-dd 00:00:00"}


def rollup_events(events: DataFrame, grain: str = "hour",
                  ts_col: str = "ts", key_col: str = "event_type",
                  value_col: str = "value") -> DataFrame:
    """Aggregate an event frame to the rollup grain: one row per
    (bucket_ts, key) carrying the four algebraic stats plus the
    ``event_date`` partition column.  One key shuffle with map-side
    combine; output cardinality is buckets x keys, corpus-independent."""
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {sorted(_GRAINS)}")
    bucket = F.date_trunc(grain, F.col(ts_col))
    return (events
            .groupBy(F.date_format(bucket, _GRAINS[grain]).alias("bucket_ts"),
                     F.col(key_col).alias("key"),
                     F.date_format(bucket, "yyyy-MM-dd").alias("event_date"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round(F.col(value_col), 6).cast("decimal(28,6)"))
                 .alias("sum_value"),
                 F.min(value_col).alias("min_value"),
                 F.max(value_col).alias("max_value")))


def merge_rollup(stored: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Combine stored rollup rows with a batch delta: groupBy the bucket
    key re-applying the algebraic merges (sum+sum, min-of-min, max-of-max).
    Exactly the partial-aggregate combine Spark itself runs map-side, which
    is WHY incremental == full recompute."""
    both = delta if stored is None else stored.unionByName(delta)
    return (both.groupBy("bucket_ts", "key", "event_date")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").cast("decimal(28,6)").alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))


@locked_by("rollup_dir")
def maintain_rollup(spark: SparkSession, rollup_dir: str,
                    new_events: DataFrame, grain: str = "hour",
                    ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value",
                    retain_from: str | None = None) -> list:
    """Fold a new event batch into the persisted rollup at ``rollup_dir``
    (created on first call).  Returns the rewritten ``event_date``
    partition values.

    Plan shape: aggregate the BATCH (one shuffle over batch-sized data),
    collect only its bounded date fan-out, partition-prune the stored
    rollup read to those dates, merge, and stage-swap just those
    partitions via the manifest commit.  Nothing scales with the stored
    table except the touched-partition read — whose size is bounded by
    buckets x keys per date, not by event count.

    ``retain_from`` ('YYYY-MM-DD') wires RETENTION into the maintenance
    loop — the continuous-aggregate + TTL pattern (TimescaleDB's
    retention policy on a continuous aggregate, public): after the fold
    commits, ``event_date`` partitions strictly below the cutoff drop
    via the metadata-only :func:`sinks.merge.expire_partitions` (no
    partition read, survivors byte-stable).  Incoming batch rows below
    the cutoff are dropped BEFORE the fold — folding them would
    resurrect an expired date for one cycle.  Same single-writer
    contract as the fold itself."""
    from localsql_spark.sinks.merge import commit_staged_partitions

    recover_pending_merge(rollup_dir)
    if retain_from is not None:
        # expired rows must not fold: a batch straggler below the cutoff
        # would re-create a dropped partition for one cycle
        new_events = new_events.filter(
            F.to_date(F.col(ts_col)) >= F.lit(retain_from).cast("date"))
    # localCheckpoint: the delta is consumed twice (date collect + merge
    # write); a source that re-evaluates differently between the two
    # could otherwise stage a date absent from the collected list, whose
    # stored rows would then be replaced unmerged (and the batch
    # aggregation runs once instead of twice)
    delta = (_validate_write(
        rollup_events(new_events, grain, ts_col, key_col, value_col),
        rollup_dir, "event_date")
             .localCheckpoint(eager=True))
    dates = [r[0] for r in delta.select("event_date").distinct().collect()]
    if not dates:
        # an all-expired (or empty) batch still enforces retention —
        # the expiry is this cycle's obligation, not the fold's
        if retain_from is not None:
            from localsql_spark.sinks.merge import expire_partitions
            expire_partitions(rollup_dir, "event_date", retain_from)
        return []
    # NULL timestamps roll up to a NULL event_date, which isin()-based
    # pruning can never read back — the staged __HIVE_DEFAULT_PARTITION__
    # dir would REPLACE the stored one instead of merging (silent count
    # loss).  Same up-front rejection as the merge sink's NULL-partition
    # guard: filter or backfill the timestamp first.
    if any(d is None for d in dates):
        raise ValueError(
            f"events carry NULL {ts_col!r} values — a NULL event_date "
            "cannot be maintained safely (isin-based partition pruning "
            "skips it); filter or backfill the timestamp column first")
    stored = read_base_partitions(spark, rollup_dir, "event_date", dates,
                                  mode="write")
    merged = _validate_write(merge_rollup(stored, delta), rollup_dir,
                             "event_date")

    base = Path(rollup_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    # explicit width = the touched-date fan-out: a bare repartition(col)
    # is an AQE-coalescible exchange, and the tiny merged frame collapses
    # to ONE task that writes every date dir sequentially (r14 profile:
    # 0.7s single-task write stages); user-specified N is exempt from
    # coalescing, keeps the same clustered one-file-per-partition layout,
    # and caps at the useful write parallelism (one task per date)
    (merged.repartition(max(1, len(dates)), F.col("event_date"))
     .write.mode("overwrite").partitionBy("event_date")
     .parquet(str(staging)))
    commit_staged_partitions(rollup_dir, "event_date")
    if retain_from is not None:
        from localsql_spark.sinks.merge import expire_partitions
        expire_partitions(rollup_dir, "event_date", retain_from)
    return dates


@locked_by("rollup_dir")
def erase_from_rollup(spark: SparkSession, rollup_dir: str,
                      events: DataFrame, keys: DataFrame, subject_col: str,
                      grain: str = "hour", ts_col: str = "ts",
                      key_col: str = "event_type",
                      value_col: str = "value") -> list:
    """Right-to-be-forgotten RETRACTION from the maintained rollup: remove
    the erased subjects' contribution from every (bucket_ts, key) group —
    the aggregate store half of the erasure surface (the rollup carries
    no subject column, but a subject's events still live INSIDE its
    counts/sums, so erasing only the row stores leaves their data
    aggregated here).  Returns the rewritten ``event_date`` partitions.

    ``events`` is the PRE-ERASE event source (erase the primary store
    AFTER this — the subjects' rows must still be readable to compute
    their delta; same ordering contract as the inverted-index erase in
    :func:`localsql_spark.sinks.erase.erase_everywhere`).

    Mechanics — the Gupta-Mumick negative delta, specialized per
    aggregate class:

    - ``n_events`` / ``sum_value`` are group-invertible: subtract the
      subjects' batch aggregate (decimal sums, so retraction is exact
      and incremental-erase == full recompute bit-for-bit).
    - ``min_value`` / ``max_value`` are NOT invertible (an erased min
      cannot be un-minned).  They are healed by RECOMPUTE, but only for
      the groups whose stored extreme the subjects actually attained
      (``sub_min <= min_value OR sub_max >= max_value``) — for every
      other touched group the stored extreme provably stands.  The heal
      scan reads kept events pruned to the touched dates (partition-
      pruned at scale) and broadcast-semi-joined down to the heal groups
      before aggregating.

    Cost tracks the REQUEST: one batch-sized aggregate over the
    subjects' rows, a touched-date-pruned stored read, the heal scan
    above, and a manifest-committed swap of only the touched dates.  A
    group retracted to zero rows leaves the rollup; a date emptied
    entirely commits as an explicit partition removal.  Idempotent:
    re-running the request retracts nothing (the subjects' rows are
    gone from ``events`` after the primary erase) only if the primary
    was erased first — run this FIRST, once, per request."""
    from localsql_spark.sinks.erase import normalize_erase_keys
    from localsql_spark.sinks.merge import commit_staged_partitions

    recover_pending_merge(rollup_dir)
    k = normalize_erase_keys(keys)
    subjects = events.join(F.broadcast(k),
                           F.col(subject_col) == F.col("_erase_key"),
                           "left_semi")
    # localCheckpoint: the delta is consumed twice (date collect + the
    # merged write), same rationale as maintain_rollup
    neg = (rollup_events(subjects, grain, ts_col, key_col, value_col)
           .select("bucket_ts", "key", "event_date",
                   F.col("n_events").alias("__sub_n"),
                   F.col("sum_value").alias("__sub_sum"),
                   F.col("min_value").alias("__sub_min"),
                   F.col("max_value").alias("__sub_max"))
           .localCheckpoint(eager=True))
    dates = [r[0] for r in neg.select("event_date").distinct().collect()]
    if not dates:
        return []
    stored = read_base_partitions(spark, rollup_dir, "event_date", dates,
                                  mode="write")
    if stored is None:
        return []

    j = stored.join(neg, ["bucket_ts", "key", "event_date"], "left")
    retained = (j.withColumn(
        "n_events",
        F.col("n_events") - F.coalesce(F.col("__sub_n"), F.lit(0)))
        .filter(F.col("n_events") > 0)
        .withColumn(
            "sum_value",
            (F.col("sum_value")
             - F.coalesce(F.col("__sub_sum"),
                          F.lit(0).cast("decimal(28,6)")))
            .cast("decimal(28,6)"))
        .withColumn(
            "__heal",
            F.col("__sub_n").isNotNull()
            & ((F.col("__sub_min") <= F.col("min_value"))
               | (F.col("__sub_max") >= F.col("max_value")))))
    # heal-group list: bounded by the touched groups whose extreme the
    # subjects attained — collected implicitly via the broadcast below
    heal_groups = (retained.filter(F.col("__heal"))
                   .select(F.col("bucket_ts").alias("__h_bts"),
                           F.col("key").alias("__h_key"))
                   .localCheckpoint(eager=True))

    kept = events.join(F.broadcast(k),
                       F.col(subject_col) == F.col("_erase_key"),
                       "left_anti")
    bucket = F.date_trunc(grain, F.col(ts_col))
    # prune the heal scan BEFORE the aggregate: touched dates (partition-
    # prunable at scale), then broadcast semi join to the heal groups
    kept_scoped = (kept
                   .filter(F.date_format(bucket, "yyyy-MM-dd").isin(dates))
                   .join(F.broadcast(heal_groups),
                         (F.date_format(bucket, _GRAINS[grain])
                          == F.col("__h_bts"))
                         & (F.col(key_col) == F.col("__h_key")),
                         "left_semi"))
    heal = (rollup_events(kept_scoped, grain, ts_col, key_col, value_col)
            .select("bucket_ts", "key", "event_date",
                    F.col("min_value").alias("__heal_min"),
                    F.col("max_value").alias("__heal_max")))

    merged = (retained.join(heal, ["bucket_ts", "key", "event_date"],
                            "left")
              .select("bucket_ts", "key", "event_date", "n_events",
                      "sum_value",
                      F.when(F.col("__heal"), F.col("__heal_min"))
                      .otherwise(F.col("min_value")).alias("min_value"),
                      F.when(F.col("__heal"), F.col("__heal_max"))
                      .otherwise(F.col("max_value")).alias("max_value")))
    merged = _validate_write(merged, rollup_dir, "event_date")

    base = Path(rollup_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    # explicit width: see maintain_rollup's staged write
    (merged.repartition(max(1, len(dates)), F.col("event_date"))
     .write.mode("overwrite").partitionBy("event_date")
     .parquet(str(staging)))
    # a date whose every group retracted to zero writes no staged dir —
    # committed as an explicit removal (dates are path-safe strings)
    commit_staged_partitions(rollup_dir, "event_date",
                             [f"event_date={d}" for d in dates])
    return sorted(dates)


def _validate_write(df: DataFrame, store_dir: str,
                    partition_col: str) -> DataFrame:
    """The shared strict fold write gate — see
    :func:`~localsql_spark.sinks.schema_evolution.gate_fold_write`."""
    from localsql_spark.sinks.schema_evolution import gate_fold_write
    return gate_fold_write(df, store_dir, partition_col)


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Read the maintained rollup; filters on ``event_date`` prune whole
    partitions, and ``avg`` derives as sum/count at read time.  A
    schema-registered rollup (sinks/schema_evolution.py) reconciles
    every partition vintage to the registry's current contract —
    partitions written before an evolution read back with nulls/read-
    defaults in the added columns."""
    from localsql_spark.sinks.schema_evolution import (evolved_read_schema,
                                                       read_registry,
                                                       reconcile_frame,
                                                       registered_partition)
    recover_pending_merge(rollup_dir)
    if read_registry(rollup_dir) is None:
        return spark.read.option("basePath", rollup_dir).parquet(rollup_dir)
    # register rollup stores with partition=("event_date", "string"):
    # the fold frames carry event_date as the string rollup_events
    # formats, and the explicit scan schema must agree so stored-vs-
    # delta unions and isin pruning stay type-stable (an unregistered
    # read leaves Spark's partition-type inference as before)
    part = registered_partition(rollup_dir) or ("event_date", "string")
    ddl = evolved_read_schema(rollup_dir, extra={part[0]: part[1]})
    df = (spark.read.schema(ddl).option("basePath", rollup_dir)
          .parquet(rollup_dir))
    return reconcile_frame(df, rollup_dir, keep_extra=[part[0]])


@locked_by("rollup_dir")
def backfill_rollup(spark: SparkSession, rollup_dir: str,
                    events: DataFrame, dates: list[str],
                    grain: str = "hour", ts_col: str = "ts",
                    key_col: str = "event_type",
                    value_col: str = "value") -> list:
    """Heal BACKWARD: force-recompute the named ``event_date`` partitions
    from the source table and swap them in — the repair operation for
    data that arrived after its batch was folded (beyond any watermark),
    a miscounted fold, or an upstream correction.  ``maintain_rollup``
    folds forward (merge batch INTO stored state, additive); backfill
    REPLACES the named dates wholesale, so it is idempotent and safe to
    re-run — the two together are the complete continuous-aggregate
    maintenance story.

    Scale shape: the source read is filtered to the backfill dates
    (pushed to the scan — at 100 TB the events table is itself
    date-partitioned and this prunes), one batch-sized aggregation, and
    the manifest-committed swap of exactly ``len(dates)`` partitions.
    Untouched dates keep their files byte-for-byte.
    """
    if not dates:
        return []
    recover_pending_merge(rollup_dir)
    bucket = F.date_trunc(grain, F.col(ts_col))
    scoped = events.filter(
        F.date_format(bucket, "yyyy-MM-dd").isin(list(dates)))
    fresh = _validate_write(
        rollup_events(scoped, grain, ts_col, key_col, value_col),
        rollup_dir, "event_date")

    base = Path(rollup_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    # explicit width: see maintain_rollup's staged write
    (fresh.repartition(max(1, len(dates)), F.col("event_date"))
     .write.mode("overwrite").partitionBy("event_date")
     .parquet(str(staging)))
    # a backfill date with NO source rows must still swap (to empty) —
    # its stale stored rows are exactly what the repair removes
    for d in dates:
        (staging / f"event_date={d}").mkdir(parents=True, exist_ok=True)
    base.mkdir(parents=True, exist_ok=True)
    pnames = sorted(p.name for p in staging.glob("event_date=*"))
    manifest = _manifest_path(base)
    tmp = manifest.with_suffix(".json.tmp")
    tmp.write_text(json.dumps({"staging": staging.name,
                               "partitions": pnames}))
    os.rename(tmp, manifest)  # COMMIT POINT — one rename
    _apply_manifest(base, manifest)
    return sorted(dates)
