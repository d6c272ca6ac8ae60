"""Streaming continuous aggregate: micro-batches land in idempotent
per-batch directories, then fold incrementally into the persisted rollup
store (sinks.rollup) — the streaming front end of the continuous-aggregate
family (rollup_incremental_hourly / rollup_steady_state_hourly).

The reference has no streaming surface (reference: localsql/localsql.py:31);
scale extension.

Two-stage design, deliberately: the rollup store is a MERGE (re-applying a
batch double-counts), so exactly-once cannot ride the per-batch-overwrite
contract the append-style sinks use.  Instead:

1. **Landing** (inside the stream): ``foreachBatch`` writes each
   micro-batch to ``land_dir/batch_<id>`` with overwrite semantics — a
   checkpoint redelivery rewrites the same directory byte-for-byte, so the
   landed set is effectively-exactly-once, same contract as
   stream_dedup_ingest.
2. **Folding** (after the drain, or on any cadence): each landed batch not
   yet marked applied folds into the rollup via ``maintain_rollup``
   (manifest-committed touched-partition swap), then an ``applied_<id>``
   marker commits via tmp+rename.  A crash between the partition swap and
   the marker rename would re-fold that one batch on recovery — the same
   single-rename-wide exposure documented for the merge sink itself
   (sinks/merge.py:30); an operator who needs exactness after such a
   crash rebuilds the store from the landed dirs (they are the durable
   exactly-once record — delete the rollup dir + markers and re-fold).

At 100 TB: landing is append-only sequential parquet writes; each fold
aggregates ONE batch and rewrites only its touched event_date partitions,
so maintenance cost tracks ingest rate, not accumulated history.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.sinks.rollup import maintain_rollup


def stream_land_batches(spark: SparkSession, *, source_dir: str, schema,
                        land_dir: str, checkpoint_dir: str,
                        max_files_per_trigger: int = 1) -> None:
    """Drain a file stream into idempotent per-batch landing dirs
    (availableNow trigger: process the backlog in order, then stop)."""
    Path(land_dir).mkdir(parents=True, exist_ok=True)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(str(Path(land_dir) / f"batch_{batch_id}")))

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(source_dir)
         .writeStream.foreachBatch(land)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def _applied_marker(rollup_dir: str, batch_id: int) -> Path:
    return Path(rollup_dir).parent / f".{Path(rollup_dir).name}.applied_{batch_id}"


def _watermark_file(rollup_dir: str) -> Path:
    return Path(rollup_dir).parent / f".{Path(rollup_dir).name}.applied_through"


def _applied_through(rollup_dir: str) -> int:
    """Every batch id <= this watermark is applied (its per-batch marker
    may have been pruned along with its landing dir).  -1 if never set."""
    f = _watermark_file(rollup_dir)
    try:
        return int(f.read_text())
    except (OSError, ValueError):
        return -1


def fold_landed_with(spark: SparkSession, land_dir: str, store_dir: str,
                     apply_fn, pass_batch_id: bool = False) -> int:
    """Generic land-then-fold loop: fold every landed batch not yet
    marked applied into the store at ``store_dir`` (whose maintenance
    function is ``apply_fn(batch_df)`` — or ``apply_fn(batch_df,
    batch_id)`` with ``pass_batch_id``, for stores whose per-batch state
    is id-keyed like the IVM dim snapshot), in batch-id order.  Returns
    how many batches were folded this call.  Re-invocation after
    completion is a no-op (markers); re-invocation after a crash resumes
    from the first unmarked batch.  Shared by every MERGE-style persisted
    store whose per-batch apply is NOT naturally idempotent (rollup, IVM
    join view) — the marker, not the store write, carries exactly-once.
    A torn landing dir blocking two consecutive calls raises a
    ``RuntimeWarning`` (:func:`batch_dirs.note_blocker`) so a dead
    stream's wedge is surfaced, not silently rotting."""
    from localsql_spark.streaming.batch_dirs import note_blocker

    n = 0
    blocker: int | None = None
    wm = _applied_through(store_dir)
    for b in sorted(Path(land_dir).glob("batch_*"),
                    key=lambda p: int(p.name.split("_")[1])):
        bid = int(b.name.split("_")[1])
        if bid <= wm:
            continue  # applied before its marker was pruned (watermark)
        marker = _applied_marker(store_dir, bid)
        if marker.exists():
            continue
        if not (b / "_SUCCESS").exists():
            # partial landing (the stream will rewrite it): STOP, don't
            # skip — folding a later batch first would apply batches out
            # of id order, which corrupts order-sensitive appliers (the
            # IVM dim fold computes old rows from a snapshot that must
            # reflect every PRIOR batch) and silently reorders the rest
            blocker = bid
            break
        if pass_batch_id:
            apply_fn(spark.read.parquet(str(b)), bid)
        else:
            apply_fn(spark.read.parquet(str(b)))
        # append to the FULL marker name — with_suffix would strip the
        # batch id and collapse every batch's tmp file onto one path,
        # racing concurrent folders onto each other's commit files
        tmp = Path(str(marker) + ".tmp")
        tmp.write_text("applied")
        os.rename(tmp, marker)  # commit point for this batch's fold
        n += 1
    note_blocker(Path(store_dir).parent /
                 f".{Path(store_dir).name}.blocked_fold",
                 blocker, f"fold_landed_with({land_dir})")
    return n


def fold_landed(spark: SparkSession, land_dir: str, rollup_dir: str,
                grain: str = "hour") -> int:
    """Fold every landed batch not yet marked applied into the rollup —
    :func:`fold_landed_with` specialized to ``sinks.rollup``."""
    return fold_landed_with(
        spark, land_dir, rollup_dir,
        lambda df: maintain_rollup(spark, rollup_dir, df, grain=grain))


def prune_landed(land_dir: str, rollup_dir: str, keep_last: int = 1) -> int:
    """Retention for the landing dirs: delete applied batch dirs strictly
    below the newest applied batch (keeping the newest ``keep_last``
    applied dirs for inspection/rebuild headroom), advancing the
    applied-through watermark FIRST so replay safety survives the prune.

    Commit order makes every crash point safe: (1) the watermark file
    commits via tmp+rename covering every id about to be pruned — from
    that instant :func:`fold_landed` skips those ids whether or not their
    markers or dirs still exist; (2) per-batch markers at or below the
    watermark are deleted; (3) the batch dirs are deleted.  A checkpoint
    redelivery of a pruned batch re-lands its dir, and the fold skips it
    by watermark — it is never double-applied.

    Only batches forming a contiguous applied prefix are pruned: the
    watermark asserts "everything at or below me is applied", so an
    unapplied gap batch blocks pruning above it.  Contiguity is checked
    on batch IDS, not just on the dirs that happen to exist: a wholly
    missing intermediate id (dir lost externally, or a sink that skips
    a batch) counts as applied only if it is <= the watermark or has an
    applied marker — otherwise it blocks the walk, so a later redelivery
    of that id is still folded rather than skipped by an over-advanced
    watermark.

    Trade documented in the module docstring: landed dirs are the durable
    record for a from-scratch rollup rebuild; pruning bounds that rebuild
    to the retained tail.  Returns the number of batch dirs deleted."""
    import os as _os

    wm = _applied_through(rollup_dir)
    landed = sorted(Path(land_dir).glob("batch_*"),
                    key=lambda p: int(p.name.split("_")[1]))
    def _is_applied(i: int) -> bool:
        return i <= wm or _applied_marker(rollup_dir, i).exists()

    from localsql_spark.streaming.batch_dirs import note_blocker

    applied = []
    prev = wm  # ids <= wm are applied by definition
    blocker = None
    for b in landed:
        bid = int(b.name.split("_")[1])
        if bid <= wm:
            applied.append(b)
            continue
        # gap ids with no landing dir must each prove applied-ness
        gap = [g for g in range(max(prev, wm) + 1, bid)
               if not _is_applied(g)]
        if gap:
            blocker = gap[0]
            break  # unapplied gap id: nothing above it may prune
        if not _is_applied(bid):
            blocker = bid
            break  # unapplied gap: nothing above it may prune
        applied.append(b)
        prev = bid
    note_blocker(Path(rollup_dir).parent /
                 f".{Path(rollup_dir).name}.blocked_prune",
                 blocker, f"prune_landed({land_dir})")
    prune = applied[:-keep_last] if keep_last > 0 else applied
    if not prune:
        return 0
    new_wm = max(wm, int(prune[-1].name.split("_")[1]))
    wmf = _watermark_file(rollup_dir)
    tmp = Path(str(wmf) + ".tmp")
    tmp.write_text(str(new_wm))
    _os.rename(tmp, wmf)  # commit point: ids <= new_wm are applied forever
    for b in prune:
        bid = int(b.name.split("_")[1])
        _applied_marker(rollup_dir, bid).unlink(missing_ok=True)
        shutil.rmtree(b, ignore_errors=True)
    return len(prune)


def stream_rollup(spark: SparkSession, *, source_dir: str, schema,
                  land_dir: str, rollup_dir: str, checkpoint_dir: str,
                  grain: str = "hour",
                  max_files_per_trigger: int = 1) -> int:
    """Land + fold in one call: the periodic-maintenance entry point.
    Returns the number of batches folded."""
    stream_land_batches(spark, source_dir=source_dir, schema=schema,
                        land_dir=land_dir, checkpoint_dir=checkpoint_dir,
                        max_files_per_trigger=max_files_per_trigger)
    return fold_landed(spark, land_dir, rollup_dir, grain=grain)
