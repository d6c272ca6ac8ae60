"""Incremental view maintenance (IVM) for a JOIN-aggregate: a persisted
``SELECT g, count(*), sum(v) FROM fact JOIN dim GROUP BY g`` view kept in
sync as fact batches arrive, without ever re-scanning the fact history.

Why this matters at 100 TB: ``sinks.rollup`` maintains single-table
aggregates, but the views analysts actually read aggregate a FACT table
through a JOIN to a dimension (revenue by nation = orders ⋈ customer ⋈
nation).  Recomputing that join-aggregate re-shuffles the whole fact
table per refresh; maintaining it folds only Δfact ⋈ dim — the classic
delta rule for joins (ΔQ = Δfact ⋈ dim when only the fact side changes),
see e.g. Gupta & Mumick, "Maintenance of Materialized Views: Problems,
Techniques, and Applications", IEEE Data Eng. Bull. 1995 (public).  Job
cost tracks ingest-batch size; the dim-side join cost is the batch's —
co-locate it with ``sinks.bucketing`` at scale.

Scope: APPEND-ONLY fact, slowly-changing dim handled by re-basing (a dim
change invalidates affected groups; re-derive them from the fact store —
the standard trade, documented rather than hidden).  Aggregates must be
algebraic (count/sum/min/max) so merging is itself a groupBy, exactly as
in ``sinks.rollup``.

State layout: the view is hive-partitioned by ``grp_bucket =
pmod(hash32(group), n_buckets)`` so a delta touching few groups rewrites
few partitions (partition-pruned read + staged swap of only the touched
buckets, manifest-committed via the shared ``sinks.merge`` machinery).
With high-cardinality groups the bucket count bounds both the touched-
partition read and the swap, independent of view size.

Determinism: sums go through DECIMAL(28,6) (order-insensitive); the
registered query's oracle recomputes the view from the full fact table,
proving incremental maintenance == full recompute.

The reference has no persistence at all (table lifetime = process,
reference: localsql/localsql.py:31); this is a pure scale extension.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.sinks.locks import locked_by, store_lock

from localsql_spark.operators import hash32
from localsql_spark.sinks.merge import (_apply_manifest, _manifest_path,
                                        read_base_partitions,
                                        recover_pending_merge)


def join_rollup(fact: DataFrame, dim: DataFrame, fact_key: str,
                dim_key: str, group_col: str, value_col: str,
                n_buckets: int = 8) -> DataFrame:
    """Aggregate one fact batch through the dim join: one row per group
    carrying (n_rows, sum_value) plus the ``grp_bucket`` partition
    column.  The join's left side is batch-sized; the aggregate is one
    group-key shuffle with map-side combine, output cardinality = groups
    touched by the batch."""
    joined = fact.join(dim.select(dim_key, group_col),
                       fact[fact_key] == dim[dim_key])
    return (joined
            .groupBy(F.col(group_col).alias("grp"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.round(F.col(value_col), 6).cast("decimal(28,6)"))
                 .alias("sum_value"))
            .withColumn("grp_bucket",
                        # a NULL group hashes to NULL, which isin()-based
                        # partition pruning can never read back — the
                        # staged __HIVE_DEFAULT_PARTITION__ dir would then
                        # REPLACE the stored one instead of merging
                        # (silent count/sum loss); NULL groups get the
                        # reserved bucket n_buckets instead
                        F.coalesce(
                            F.pmod(hash32(F.col("grp").cast("string")),
                                   F.lit(n_buckets)),
                            F.lit(n_buckets))))


def merge_join_rollup(stored: DataFrame | None,
                      delta: DataFrame) -> DataFrame:
    """Fold a batch delta into stored view rows: groupBy the group key
    re-applying the algebraic merges — the same partial-aggregate combine
    Spark runs map-side, which is why incremental == full recompute."""
    both = delta if stored is None else stored.unionByName(delta)
    return (both.groupBy("grp", "grp_bucket")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("sum_value").cast("decimal(28,6)")
                 .alias("sum_value")))


def _check_bucket_meta(view_dir: str, n_buckets: int) -> None:
    """Pin the view's bucket count on first write and reject maintenance
    with a different one: grp_bucket is a pure function of (grp,
    n_buckets), so a mismatched fold would land a group's delta in a
    DIFFERENT partition than its stored rows and the merge would keep
    both — silent double rows.  Same meta discipline as the banded dedup
    index's bucket_cap."""
    base = Path(view_dir)
    meta = base.parent / f".{base.name}.meta.json"
    if meta.exists():
        stored = json.loads(meta.read_text()).get("n_buckets")
        if stored != n_buckets:
            raise ValueError(
                f"view at {view_dir} was built with n_buckets={stored}; "
                f"refusing to fold with n_buckets={n_buckets} (grp_bucket "
                "assignments would diverge and duplicate groups)")
        return
    # the meta lives BESIDE the view dir — do not create the (empty) view
    # dir itself here, or the first fold's base read would try to scan it
    meta.parent.mkdir(parents=True, exist_ok=True)
    tmp = meta.with_suffix(".json.tmp")
    tmp.write_text(json.dumps({"n_buckets": n_buckets}))
    os.rename(tmp, meta)


def maintain_join_view(spark: SparkSession, view_dir: str,
                       fact_batch: DataFrame, dim: DataFrame,
                       fact_key: str, dim_key: str, group_col: str,
                       value_col: str, n_buckets: int = 8) -> list:
    """Fold a new fact batch into the persisted join view at ``view_dir``
    (created on first call).  Returns the rewritten ``grp_bucket``
    partition values.

    Plan shape: Δfact ⋈ dim + one batch-sized aggregate, collect only the
    touched buckets (bounded by n_buckets), partition-prune the stored
    view read to those buckets, merge, and stage-swap just those
    partitions via the manifest commit (crash-safe: a torn run heals on
    the next call's ``recover_pending_merge``)."""
    # heal + meta-check run UNDER the store lock: recover_pending_merge
    # replays a torn manifest (a store WRITE) and must not interleave
    # with a concurrent fold's own manifest application (review round
    # 13); the lock is reentrant, so _fold_delta's acquisition nests
    with store_lock(view_dir):
        recover_pending_merge(view_dir)
        _check_bucket_meta(view_dir, n_buckets)
    delta = join_rollup(fact_batch, dim, fact_key, dim_key, group_col,
                        value_col, n_buckets)
    return _fold_delta(spark, view_dir, delta)


@locked_by("view_dir")
def _fold_delta(spark: SparkSession, view_dir: str,
                delta: DataFrame, marker: str | None = None) -> list:
    """Shared fold tail: collect the delta's touched buckets (bounded by
    n_buckets), partition-prune the stored read to them, merge, drop
    groups whose row count reached zero (a retraction emptied them), and
    stage-swap just those partitions via the manifest commit."""
    from localsql_spark.sinks.merge import commit_staged_partitions

    # validate the fold output BEFORE the stored union: on an evolved
    # registry this raises the clear strict message instead of a union
    # shape error
    from localsql_spark.sinks.schema_evolution import gate_fold_write
    delta = gate_fold_write(delta, view_dir, "grp_bucket")
    delta = delta.localCheckpoint(eager=True)  # bucket collect + merge
    buckets = [r[0] for r in
               delta.select("grp_bucket").distinct().collect()]
    if not buckets:
        return []
    stored = read_base_partitions(spark, view_dir, "grp_bucket", buckets,
                                  mode="write")
    merged = merge_join_rollup(stored, delta).filter(F.col("n_rows") != 0)
    # the same strict write gate on the merged output (stored rows can
    # carry evolved columns the delta-side gate never saw)
    merged = gate_fold_write(merged, view_dir, "grp_bucket")

    base = Path(view_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    # explicit width = touched-bucket fan-out (AQE would coalesce the
    # bare repartition(col) to one task writing every bucket dir
    # sequentially; N is exempt and the clustered layout is unchanged)
    (merged.repartition(max(1, len(buckets)), F.col("grp_bucket"))
     .write.mode("overwrite").partitionBy("grp_bucket")
     .parquet(str(staging)))
    # schema sidecar (once): lets read_join_view return an EMPTY frame
    # after every group has been retracted (the removal commit can leave
    # the dir with no parquet files, which schema inference cannot read)
    schema_file = base.parent / f".{base.name}.schema.json"
    if not schema_file.exists():
        tmp = Path(str(schema_file) + ".tmp")
        tmp.write_text(merged.schema.json())
        os.rename(tmp, schema_file)
    # a touched bucket with no staged dir was emptied by the merge (every
    # group retracted to zero) — committed as an explicit removal, or the
    # old partition would survive the swap (grp_bucket is an int value,
    # so Python and Spark path-encode the name identically)
    commit_staged_partitions(view_dir, "grp_bucket",
                             [f"grp_bucket={b}" for b in buckets],
                             marker=marker)
    return sorted(buckets)


def apply_dim_change(spark: SparkSession, view_dir: str, fact: DataFrame,
                     old_dim_rows: DataFrame, new_dim_rows: DataFrame,
                     fact_key: str, dim_key: str, group_col: str,
                     value_col: str, n_buckets: int = 8,
                     marker: str | None = None) -> list:
    """Maintain the view through a DIMENSION change — the counting-
    algorithm dim-side delta rule (Gupta & Mumick 1995): for the changed
    dim keys only, RETRACT their facts' contribution from the old groups
    and RE-ADD it to the new groups:

        ΔQ = -(fact_changed ⋈ old_dim_rows) + (fact_changed ⋈ new_dim_rows)

    ``old_dim_rows`` / ``new_dim_rows`` are the changed subset (before /
    after images — :func:`operators.diff.table_diff` produces exactly
    this); keys present only in one side handle dim inserts/deletes.
    Cost tracks the CHANGED KEYS' fact rows, not view or fact-history
    size: the fact scan is semi-joined down to changed keys first (a
    broadcast when the change set is dimension-sized, which it is by
    construction — a full-dim rebase should rebuild instead), and the
    fold rewrites only touched grp_bucket partitions.  A group whose
    count retracts to zero leaves the view.  Sums are algebraic
    (DECIMAL), so retraction is exact, and incremental == full recompute
    against the new dim — which is what the registered oracle checks.
    """
    # heal + meta-check run UNDER the store lock: recover_pending_merge
    # replays a torn manifest (a store WRITE) and must not interleave
    # with a concurrent fold's own manifest application (review round
    # 13); the lock is reentrant, so _fold_delta's acquisition nests
    with store_lock(view_dir):
        recover_pending_merge(view_dir)
        _check_bucket_meta(view_dir, n_buckets)
    keys = (old_dim_rows.select(dim_key)
            .unionByName(new_dim_rows.select(dim_key)).distinct())
    changed_fact = fact.join(F.broadcast(keys),
                             fact[fact_key] == keys[dim_key], "left_semi")
    minus = (join_rollup(changed_fact, old_dim_rows, fact_key, dim_key,
                         group_col, value_col, n_buckets)
             .select("grp", (-F.col("n_rows")).alias("n_rows"),
                     (-F.col("sum_value")).cast("decimal(28,6)")
                     .alias("sum_value"), "grp_bucket"))
    plus = join_rollup(changed_fact, new_dim_rows, fact_key, dim_key,
                       group_col, value_col, n_buckets)
    return _fold_delta(spark, view_dir, minus.unionByName(plus),
                       marker=marker)


def erase_from_view(spark: SparkSession, view_dir: str, fact: DataFrame,
                    keys: DataFrame, subject_col: str, dim: DataFrame,
                    fact_key: str, dim_key: str, group_col: str,
                    value_col: str, n_buckets: int = 8,
                    marker: str | None = None) -> list:
    """Right-to-be-forgotten RETRACTION from the maintained join view:
    remove the erased subjects' fact rows' contribution from every group
    — the join-aggregate half of the erasure surface (the view carries
    no subject column, but a subject's facts still live inside its
    counts/sums).  Returns the rewritten ``grp_bucket`` partitions.

    The view's aggregates are count/sum only — both group-invertible —
    so this is the pure Gupta-Mumick negative delta (the retract half of
    :func:`apply_dim_change`, against an unchanged dim):

        ΔQ = -(fact_subjects ⋈ dim)

    folded through the shared :func:`_fold_delta` tail, which already
    drops groups retracted to zero and commits emptied buckets as
    partition removals.  Decimal sums make the retraction exact:
    post-erase view == a view that never folded the subjects' rows,
    bit-for-bit — which is what the registered probe's from-scratch
    oracle checks.

    ``fact`` is the PRE-ERASE fact source (same ordering contract as
    :func:`localsql_spark.sinks.rollup.erase_from_rollup`: run before
    the primary erase).  ``subject_col`` names the fact column matched
    against the deletion request — ``fact_key`` itself when erasing a
    dimension entity (a customer and all their orders).  Cost tracks
    the request: one batch-sized Δ ⋈ dim aggregate over the subjects'
    rows, a bucket-pruned stored read, and the staged swap of only the
    touched ``grp_bucket`` partitions."""
    from localsql_spark.sinks.erase import normalize_erase_keys

    # heal + meta-check run UNDER the store lock: recover_pending_merge
    # replays a torn manifest (a store WRITE) and must not interleave
    # with a concurrent fold's own manifest application (review round
    # 13); the lock is reentrant, so _fold_delta's acquisition nests
    with store_lock(view_dir):
        recover_pending_merge(view_dir)
        _check_bucket_meta(view_dir, n_buckets)
    k = normalize_erase_keys(keys)
    subjects = fact.join(F.broadcast(k),
                         fact[subject_col] == F.col("_erase_key"),
                         "left_semi")
    neg = (join_rollup(subjects, dim, fact_key, dim_key, group_col,
                       value_col, n_buckets)
           .select("grp", (-F.col("n_rows")).alias("n_rows"),
                   (-F.col("sum_value")).cast("decimal(28,6)")
                   .alias("sum_value"), "grp_bucket"))
    return _fold_delta(spark, view_dir, neg, marker=marker)


def read_join_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """Read the maintained join view; filters on ``grp_bucket`` prune
    whole partitions, and averages derive as sum/count at read time.
    A view whose every group has been retracted (no parquet files left
    after the removal commits) reads as an EMPTY frame with the schema
    the folds recorded, not a schema-inference crash.  A
    schema-registered view (sinks/schema_evolution.py) reconciles every
    partition vintage to the registry's current contract."""
    from localsql_spark.sinks.schema_evolution import (evolved_read_schema,
                                                       read_registry,
                                                       reconcile_frame,
                                                       registered_partition)
    recover_pending_merge(view_dir)
    base = Path(view_dir)
    if not any(base.rglob("*.parquet")):
        schema_file = base.parent / f".{base.name}.schema.json"
        if schema_file.exists():
            from pyspark.sql.types import StructType
            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_file.read_text())))
    if read_registry(view_dir) is None:
        return spark.read.option("basePath", view_dir).parquet(view_dir)
    part = registered_partition(view_dir) or ("grp_bucket", "int")
    ddl = evolved_read_schema(view_dir, extra={part[0]: part[1]})
    df = (spark.read.schema(ddl).option("basePath", view_dir)
          .parquet(view_dir))
    return reconcile_frame(df, view_dir, keep_extra=[part[0]])
