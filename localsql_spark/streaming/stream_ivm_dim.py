"""Streaming DIM-SIDE maintenance of the join-aggregate view (sinks.ivm):
dimension-change micro-batches (SCD-feed shaped: one row per changed key
carrying its NEW attribute value) land in idempotent per-batch dirs, then
fold through the Gupta-Mumick retract+re-add delta
(:func:`sinks.ivm.apply_dim_change`) into the persisted view — completing
the maintenance pair: ``stream_ivm_ingest`` handles fact appends, this
module handles dimension changes, so a view under BOTH a fact stream and
a slowly-changing dimension stays correct without rebuilds.

The dim-side delta needs each changed key's OLD attribute value, so the
module maintains a CURRENT-DIM SNAPSHOT next to the view (generation dir +
pointer file, the ``foreach_upsert`` poor-man's-transaction shape, seeded
once from the initial dimension).  Per landed batch, in order:

1. old rows = snapshot ⋈ batch keys (broadcast — the change set is
   dimension-change-sized by construction);
2. ``apply_dim_change`` retracts the changed keys' facts from their old
   groups and re-adds them to the new ones (manifest-committed
   touched-bucket swap, cost tracks the changed keys' fact rows);
3. the snapshot advances to a new generation (write-then-pointer-flip).

Crash windows: the view commit precedes the snapshot flip, so a replay
after the flip recomputes old == new and folds a NET-ZERO delta (no-op).
The window BETWEEN the view's manifest commit and the snapshot flip is
closed by an applied-batch marker that rides in the same manifest commit
(:func:`sinks.merge.commit_staged_partitions` ``marker=``): a replay
that finds the marker skips the fold (whose recomputed delta against
the unadvanced snapshot would NOT be net-zero — it would double-apply)
and goes straight to the snapshot advance.

The reference has no streaming surface (reference: localsql/localsql.py:31);
scale extension.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from localsql_spark.sinks.ivm import apply_dim_change
from localsql_spark.streaming.stream_rollup import stream_land_batches


def init_dim_snapshot(dim: DataFrame, dim_dir: str) -> None:
    """Seed the current-dim snapshot (idempotent: an existing pointer is
    left alone, so a replayed setup never regresses an advanced dim)."""
    pointer = Path(dim_dir) / "_CURRENT"
    if pointer.exists():
        return
    gen = Path(dim_dir) / "gen_init"
    dim.write.mode("overwrite").parquet(str(gen))
    tmp = Path(dim_dir) / "_CURRENT.tmp"
    tmp.write_text("gen_init")
    os.replace(tmp, pointer)


def read_dim_snapshot(spark: SparkSession, dim_dir: str) -> DataFrame:
    """The dimension as of the last applied change batch."""
    pointer = Path(dim_dir) / "_CURRENT"
    gen = Path(dim_dir) / pointer.read_text().strip()
    return spark.read.parquet(str(gen))


def _advance_snapshot(snapshot: DataFrame, dim_dir: str,
                      batch_id: int) -> None:
    """Write-then-flip, keeping only the new generation.  Re-advancing to
    an already-current generation is a no-op (replay guard)."""
    pointer = Path(dim_dir) / "_CURRENT"
    new_gen = f"gen_{batch_id}"
    old = pointer.read_text().strip()
    if old == new_gen:
        return
    snapshot.write.mode("overwrite").parquet(str(Path(dim_dir) / new_gen))
    tmp = Path(dim_dir) / "_CURRENT.tmp"
    tmp.write_text(new_gen)
    os.replace(tmp, pointer)
    shutil.rmtree(Path(dim_dir) / old, ignore_errors=True)


def apply_dim_batch(spark: SparkSession, view_dir: str, dim_dir: str,
                    fact: DataFrame, batch: DataFrame, batch_id: int, *,
                    dim_key: str, group_col: str, fact_key: str,
                    value_col: str, n_buckets: int = 8) -> list:
    """Fold ONE dim-change batch: view delta first (manifest-committed,
    carrying an applied-batch marker), snapshot advance second, marker
    cleanup last.  A replayed batch whose snapshot already advanced
    computes old == new and the delta nets to zero (no-op); a replayed
    batch that crashed BETWEEN the view commit and the snapshot advance
    finds the marker and skips the fold — re-folding against the
    unadvanced snapshot would double-apply the retract+re-add delta
    (advisor r9)."""
    from localsql_spark.sinks.merge import recover_pending_merge

    marker = (Path(view_dir).parent /
              f".{Path(view_dir).name}.dim_applied_{batch_id}")
    # settle any pending commit first: a crash mid-apply leaves the
    # manifest, and the replayed apply writes the marker too
    recover_pending_merge(view_dir)
    # one row per changed key, deterministically (latest-wins needs a
    # version column the SCD feed shape doesn't carry; full-row hash is
    # stable across replays, same rule as merge_upsert's in-batch ties)
    w = Window.partitionBy(dim_key).orderBy(
        F.xxhash64(*[F.col(c) for c in batch.columns]))
    new_rows = (batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn")
                .select(dim_key, group_col)
                .localCheckpoint(eager=True))
    cur = read_dim_snapshot(spark, dim_dir).select(dim_key, group_col)
    if marker.exists():
        touched: list = []  # view already carries this batch's delta
    else:
        old_rows = cur.join(F.broadcast(new_rows.select(dim_key)),
                            dim_key, "semi")
        touched = apply_dim_change(
            spark, view_dir, fact, old_dim_rows=old_rows,
            new_dim_rows=new_rows, fact_key=fact_key, dim_key=dim_key,
            group_col=group_col, value_col=value_col,
            n_buckets=n_buckets, marker=marker.name)
    advanced = (cur.join(F.broadcast(new_rows.select(dim_key)), dim_key,
                         "left_anti").unionByName(new_rows))
    _advance_snapshot(advanced, dim_dir, batch_id)
    # crash between the advance and this unlink: the replay sees the
    # marker, skips the fold, re-advances (no-op) and cleans up
    marker.unlink(missing_ok=True)
    return touched


def stream_ivm_dim_ingest(spark: SparkSession, *, source_dir: str, schema,
                          land_dir: str, view_dir: str, dim_dir: str,
                          checkpoint_dir: str, fact: DataFrame,
                          dim_key: str, group_col: str, fact_key: str,
                          value_col: str, n_buckets: int = 8,
                          max_files_per_trigger: int = 1) -> int:
    """Land + fold in one call: drain the dim-change file stream into
    per-batch landing dirs, then fold every unapplied batch through the
    retract+re-add delta into the persisted view (and advance the dim
    snapshot).  ``init_dim_snapshot`` must have seeded ``dim_dir``.
    Returns the number of batches folded."""
    stream_land_batches(spark, source_dir=source_dir, schema=schema,
                        land_dir=land_dir, checkpoint_dir=checkpoint_dir,
                        max_files_per_trigger=max_files_per_trigger)
    from localsql_spark.streaming.stream_rollup import fold_landed_with
    return fold_landed_with(
        spark, land_dir, view_dir,
        lambda df, bid: apply_dim_batch(
            spark, view_dir, dim_dir, fact, df, bid, dim_key=dim_key,
            group_col=group_col, fact_key=fact_key, value_col=value_col,
            n_buckets=n_buckets),
        pass_batch_id=True)
