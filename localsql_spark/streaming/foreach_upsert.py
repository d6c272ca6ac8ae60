"""foreachBatch upsert sink: merge each micro-batch into a keyed parquet
table (latest version per key wins).

``foreachBatch`` is the Structured Streaming escape hatch for sinks Spark
has no connector for — here a merge/upsert, which plain file sinks can't do.
Checkpointing still applies: a restart re-delivers only uncommitted batches,
and the merge is idempotent (same key+version -> same result), giving
effectively-exactly-once end-to-end.

Crash-safety: each batch writes the merged table to a NEW directory and
flips a pointer file afterwards, so a failure mid-write leaves the previous
table generation intact (plain-parquet poor-man's transaction). A table
format with transactional MERGE (Delta/Iceberg) replaces all of this with a
metadata swap — the foreachBatch shape is identical, only the write inside
changes.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from localsql_spark.sinks.locks import locked_by


def merge_upsert(existing: DataFrame | None, batch: DataFrame, *,
                 key: str, version: str,
                 op_col: str | None = None) -> DataFrame:
    """Latest-version-per-key merge of a batch into the existing table.

    Ties on (key, version) resolve in two layers: an incoming row that
    only TIES the stored version LOSES — the stored row is untouched, which
    is exactly what :func:`localsql_spark.sinks.merge.change_feed` asserts
    when it emits nothing for same-version rows (a hash tie-break here
    could silently replace the stored row's payload while the feed stayed
    empty, diverging CDC subscribers from the store).  WITHIN a batch,
    same-(key, version) rows break on a deterministic hash of the full
    row, so the survivor is stable across runs (idempotency the module
    docstring promises).

    ``op_col`` (optional) enables TOMBSTONES — the MERGE ... WHEN MATCHED
    DELETE half of CDC: batch rows whose ``op_col`` is ``'delete'`` compete
    in the same latest-version resolution, and a winning tombstone REMOVES
    the key (a later-versioned upsert re-inserts it; a stale tombstone
    loses and changes nothing).  Existing rows count as upserts; the op
    column never reaches the stored table.
    """
    if op_col is not None and existing is not None:
        existing = existing.withColumn(op_col, F.lit("upsert"))
    if existing is None:
        merged = batch.withColumn("__stored", F.lit(0))
    else:
        merged = (existing.withColumn("__stored", F.lit(1))
                  .unionByName(batch.withColumn("__stored", F.lit(0))))
    # hash over SORTED column names: xxhash64 is argument-order-sensitive,
    # and change_feed breaks the same in-batch ties — hashing each side's
    # natural column order would let the stored winner and the feed's
    # reported winner diverge whenever the two frames order columns
    # differently (e.g. op_col appended last here)
    data_cols = sorted(c for c in merged.columns if c != "__stored")
    w = (Window.partitionBy(key)
         .orderBy(F.col(version).desc(), F.col("__stored").desc(),
                  F.xxhash64(*[F.col(c) for c in data_cols])))
    out = (merged.withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") == 1).drop("__rn", "__stored"))
    if op_col is not None:
        out = out.filter(F.col(op_col) != "delete").drop(op_col)
    return out


def _current_generation(out_dir: str) -> Path | None:
    pointer = Path(out_dir) / "_CURRENT"
    if not pointer.exists():
        return None
    gen = Path(out_dir) / pointer.read_text().strip()
    return gen if gen.exists() else None


def read_table(spark: SparkSession, out_dir: str,
               mode: str = "read") -> DataFrame | None:
    """Read the current generation of an upsert table (None if empty).
    A schema-registered table reconciles a generation written before an
    evolution to the current contract (added columns null/default).
    ``mode="write"`` is for reads that feed the NEXT generation's
    rewrite (:func:`apply_batch`): it skips the read-default coalesce
    so carried rows' explicit NULLs are not baked over with defaults
    in the rewritten bytes (advisor r12)."""
    gen = _current_generation(out_dir)
    if gen is None:
        return None
    from localsql_spark.sinks.schema_evolution import (evolved_read_schema,
                                                       reconcile_frame)
    ddl = evolved_read_schema(out_dir)
    if ddl is None:
        return spark.read.parquet(str(gen))
    return reconcile_frame(spark.read.schema(ddl).parquet(str(gen)),
                           out_dir, mode=mode)


def apply_batch(batch_df: DataFrame, batch_id: int, *, key: str,
                version: str, out_dir: str) -> bool:
    """Merge ONE micro-batch into the generation-pointer table. Returns True
    if applied, False if skipped as an already-applied redelivery.

    Crash-recovery contract: if a failure lands after the _CURRENT pointer
    flipped to ``gen_{batch_id}`` but before the streaming checkpoint
    committed, restart re-delivers the same batch_id; re-running the merge
    would make ``read_table`` read the very gen directory the overwrite
    targets. The batch is already fully applied at that point (the pointer
    only flips after a successful write), so the redelivery is skipped.
    """
    spark = batch_df.sparkSession
    new_gen = f"gen_{batch_id}"
    old = _current_generation(out_dir)
    if old is not None and old.name == new_gen:
        return False
    # schema-registered table: conform the micro-batch (pads columns an
    # old producer doesn't send, rejects unregistered ones) so the merge
    # union is well-formed across the evolution boundary
    from localsql_spark.sinks.schema_evolution import (read_registry,
                                                       reconcile_frame)
    if read_registry(out_dir) is not None:
        batch_df = reconcile_frame(batch_df, out_dir, mode="write")
    # existence is checked explicitly — any OTHER read failure must
    # propagate, not silently restart the table from this batch.
    # mode='write': this frame is rewritten into the new generation
    existing = read_table(spark, out_dir, mode="write")
    result = merge_upsert(existing, batch_df, key=key, version=version)
    # write the new generation FIRST, then flip the pointer atomically
    # (temp + rename): a failure mid-write leaves the previous generation
    # untouched, and the pointer can never be observed half-written
    result.write.mode("overwrite").parquet(str(Path(out_dir) / new_gen))
    tmp = Path(out_dir) / "_CURRENT.tmp"
    tmp.write_text(new_gen)
    os.replace(tmp, Path(out_dir) / "_CURRENT")
    if old is not None and old.name != new_gen:
        shutil.rmtree(old, ignore_errors=True)
    return True


def stream_upsert_parquet(spark: SparkSession, *, source_dir: str,
                          schema, key: str, version: str,
                          out_dir: str, checkpoint_dir: str) -> None:
    """Drain a file stream into a keyed parquet table via foreachBatch
    upserts (availableNow trigger: process backlog, then stop).
    ``schema`` is a DDL string or a StructType."""
    Path(out_dir).mkdir(parents=True, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(batch_df, batch_id, key=key, version=version,
                    out_dir=out_dir)

    q = (spark.readStream.schema(schema).parquet(source_dir)
         .writeStream.foreachBatch(upsert)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def apply_batch_with_feed(batch_df: DataFrame, batch_id: int, *, key: str,
                          version: str, out_dir: str,
                          feed_dir: str) -> bool:
    """:func:`apply_batch` that also PERSISTS the change data feed — the
    durable CDC producer: before merging, the batch's applied changes
    (sinks.merge.change_feed against the current generation) write to
    ``feed_dir/batch_<id>``; subscribers tail those directories.

    Crash-safety: a feed batch dir is WRITE-ONCE (a completed
    ``batch_<id>`` is never recomputed — foreachBatch's stable-batch-id
    contract keys it).  The feed writes FIRST, against the same
    generation the merge will read: if the process dies before the feed
    dir completes, redelivery recomputes against the UNCHANGED
    generation (the pointer has not flipped) and lands the same bytes;
    once the dir is complete it stands, so a FRESH-CHECKPOINT full
    replay — whose redelivered batches would otherwise recompute
    against the FINAL generation and emit garbage — leaves every feed
    batch byte-stable.
    """
    from localsql_spark.sinks.merge import change_feed
    from localsql_spark.sinks.schema_evolution import (read_registry,
                                                       reconcile_frame)

    spark = batch_df.sparkSession
    if read_registry(out_dir) is not None:
        # conform BEFORE the feed computation so the change rows carry
        # the evolved shape the moment the table does (feed dirs written
        # before the evolution reconcile at read via the feed registry)
        batch_df = reconcile_frame(batch_df, out_dir, mode="write")
    old = _current_generation(out_dir)
    if old is not None and old.name == f"gen_{batch_id}":
        return False  # already applied; its feed dir already stands
    fdir = Path(feed_dir) / f"batch_{batch_id}"
    # write-once, and NEVER below the retention watermark: a pruned id
    # redelivered by a fresh checkpoint would recompute against the final
    # generation and fabricate history (the merge below still applies)
    if batch_id > _pruned_through(feed_dir) \
            and not (fdir / "_SUCCESS").exists():
        # mode='write': the feed is a DURABLE record — old_* images must
        # carry the stored bytes' canonical values (explicit NULLs), not
        # read-defaults that a later default change would invalidate
        existing = read_table(spark, out_dir, mode="write")
        feed = change_feed(existing, batch_df, key=key, version=version)
        feed.write.mode("overwrite").parquet(str(fdir))
    return apply_batch(batch_df, batch_id, key=key, version=version,
                       out_dir=out_dir)


def stream_upsert_with_feed(spark: SparkSession, *, source_dir: str,
                            schema, key: str, version: str, out_dir: str,
                            feed_dir: str, checkpoint_dir: str,
                            max_files_per_trigger: int = 1) -> None:
    """Drain a file stream into the keyed upsert table while emitting the
    durable per-batch change feed (availableNow trigger)."""
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    Path(feed_dir).mkdir(parents=True, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_with_feed(batch_df, batch_id, key=key, version=version,
                              out_dir=out_dir, feed_dir=feed_dir)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(source_dir)
         .writeStream.foreachBatch(upsert)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def read_feed(spark: SparkSession, feed_dir: str) -> DataFrame | None:
    """Read the accumulated change feed (all COMMITTED batch dirs), with
    the batch id recovered from the directory name.  A dir without
    _SUCCESS is a crashed mid-write landing — not yet committed (the
    producer gates on _SUCCESS at :func:`apply_batch_with_feed` and will
    rewrite it on restart), so subscribers must not read its partial rows
    as applied changes; skipping mirrors fold_landed_with's
    partial-landing check.  A pending subject-erase rewrite
    (:func:`erase_from_feed`) is healed first, so readers never see a
    half-applied erase."""
    recover_feed_erase(feed_dir)
    dirs = sorted((p for p in Path(feed_dir).glob("batch_*")
                   if (p / "_SUCCESS").exists()),
                  key=lambda p: int(p.name.split("_")[1]))
    if not dirs:
        return None
    return _read_feed_dirs(spark, dirs)


def _read_feed_dirs(spark: SparkSession, dirs: list[Path]) -> DataFrame:
    """ONE multi-path scan over committed batch dirs with ``batch_id``
    recovered from each row's file path — not a per-dir union, whose
    plan grows one scan node per batch dir (an unconsumed feed
    accumulates thousands; planning cost then scales with feed AGE
    rather than with the data read).  Column pruning still reaches the
    parquet scan; input_file_name is row metadata, not a read.

    A schema-registered feed (sinks/schema_evolution.py registry at the
    feed dir) reconciles batches across the evolution boundary: dirs
    written before an evolution read back with nulls/defaults in the
    added columns, so every reader — tail, as-of prefix, time-travel
    replay — sees one stable frame shape."""
    from localsql_spark.sinks.schema_evolution import (evolved_read_schema,
                                                       reconcile_frame)

    feed_dir = str(dirs[0].parent)
    ddl = evolved_read_schema(feed_dir)
    if ddl is None:
        df = spark.read.parquet(*[str(d) for d in dirs])
    else:  # explicit evolved schema: O(1) metadata, no footer sweep
        df = (spark.read.schema(ddl).parquet(*[str(d) for d in dirs]))
        df = reconcile_frame(df, feed_dir)
    return df.withColumn(
        "batch_id",
        F.regexp_extract(F.input_file_name(), r"batch_(\d+)/", 1)
        .cast("long"))


def feed_watermark(feed_dir: str, consumer: str) -> int:
    """The named consumer's committed offset: every feed batch id <= this
    has been durably consumed (-1 if never set).  One file per consumer
    under ``<feed>/_consumers/`` — the Kafka-style group-offset shape,
    minus the broker."""
    f = Path(feed_dir) / "_consumers" / consumer
    try:
        return int(f.read_text())
    except (OSError, ValueError):
        return -1


def commit_feed_offset(feed_dir: str, consumer: str, batch_id: int) -> None:
    """Commit the consumer's offset via tmp+rename (never moves backward:
    an at-least-once consumer re-committing an older offset after a
    restart must not resurrect retention eligibility it already ceded)."""
    d = Path(feed_dir) / "_consumers"
    d.mkdir(parents=True, exist_ok=True)
    cur = feed_watermark(feed_dir, consumer)
    if batch_id <= cur:
        return
    tmp = d / f"{consumer}.tmp.{os.getpid()}"
    tmp.write_text(str(batch_id))
    os.replace(tmp, d / consumer)


def _feed_erase_manifest(feed_dir: str) -> Path:
    return Path(feed_dir) / "_erase_commit.json"


def _apply_feed_erase(feed_dir: str, manifest: Path) -> None:
    """Replay a committed feed-erase swap set.  Same idempotent rename
    dance as the partitioned stores' ``_apply_manifest``: an already-
    swapped batch is skipped (its staged dir is gone), a crash between
    the two renames restores from the ``.old`` backup, and re-running
    after a crash at ANY point completes the remaining swaps."""
    import json

    spec = json.loads(manifest.read_text())
    staging = Path(feed_dir) / spec["staging"]
    for name in spec["batches"]:
        staged = staging / name
        target = Path(feed_dir) / name
        old = Path(feed_dir) / f".{name}.old"
        if staged.exists():
            shutil.rmtree(old, ignore_errors=True)
            if target.exists():
                target.rename(old)
            staged.rename(target)
        elif not target.exists() and old.exists():
            old.rename(target)
        shutil.rmtree(old, ignore_errors=True)
    manifest.unlink()
    shutil.rmtree(staging, ignore_errors=True)


def recover_feed_erase(feed_dir: str) -> bool:
    """Complete a subject erase whose process died after the manifest
    commit but before all batch swaps landed.  No-op without a pending
    manifest; every feed reader calls it first, so a crashed erase heals
    on the next read.  Returns True if a pending erase was applied."""
    m = _feed_erase_manifest(feed_dir)
    if not m.exists():
        return False
    _apply_feed_erase(feed_dir, m)
    return True


@locked_by("feed_dir")
def erase_from_feed(spark: SparkSession, feed_dir: str, keys,
                    key_col: str) -> list:
    """Subject erasure from the DURABLE change feed — the compliance gap
    retention alone cannot close: a feed batch persists erased subjects'
    pre-images (old_* columns) and new-images indefinitely, so a
    consumer replaying the feed after an erase would re-learn exactly
    the data the erasure removed; :func:`prune_feed` is retention-gated
    (consumer-offset watermark), not subject-addressable.

    Rewrites ONLY the batch dirs containing erased keys: one
    column-pruned scan of the committed feed names the touched batch
    ids, each touched batch anti-joins the broadcast key set into a
    staging tree, and a write-ahead manifest (tmp+rename — the COMMIT
    POINT) makes the multi-dir swap atomic-or-healable
    (:func:`recover_feed_erase` replays it from any crash point, and
    every feed reader heals first).  Untouched batch dirs are never
    opened or rewritten — byte-stable, pinned by test.  Batch ids,
    per-batch ``_SUCCESS`` markers (Spark re-emits one in each staged
    rewrite), consumer offsets, and the ``_pruned_through`` watermark
    all survive: a fully-erased batch becomes an EMPTY committed batch
    (Spark writes a schema-bearing empty part file), not a missing id,
    so replay and offset arithmetic are unchanged.

    Idempotent (re-erasing finds no touched batches).  Single-writer
    maintenance: do not run concurrently with :func:`prune_feed` (a
    prune could delete a touched batch between staging and swap).
    Post-erase, replaying the feed equals replaying one produced by a
    store that never saw the subjects — change_feed emits rows per-key,
    so removing a subject's rows never perturbs another key's rows —
    which is what the registered probe's oracle states from scratch.
    Returns the rewritten batch ids."""
    import json

    from localsql_spark.sinks.erase import normalize_erase_keys

    recover_feed_erase(feed_dir)
    k = normalize_erase_keys(keys)
    feed = read_feed(spark, feed_dir)
    if feed is None:
        return []
    touched = sorted(
        r[0] for r in feed.join(F.broadcast(k),
                                feed[key_col] == F.col("_erase_key"),
                                "left_semi")
        .select("batch_id").distinct().collect())
    if not touched:
        return []
    staging = Path(feed_dir) / "_erase_staging"
    shutil.rmtree(staging, ignore_errors=True)
    for bid in touched:
        src = Path(feed_dir) / f"batch_{bid}"
        kept = (spark.read.parquet(str(src))
                .join(F.broadcast(k),
                      F.col(key_col) == F.col("_erase_key"), "left_anti"))
        # batch-sized data: one file per rewritten batch keeps the feed's
        # per-dir open cost flat across repeated erases
        (kept.coalesce(1).write.mode("overwrite")
         .parquet(str(staging / f"batch_{bid}")))
    manifest = _feed_erase_manifest(feed_dir)
    tmp = Path(str(manifest) + ".tmp")
    tmp.write_text(json.dumps({"staging": staging.name,
                               "batches": [f"batch_{b}" for b in touched]}))
    os.replace(tmp, manifest)  # COMMIT POINT — one rename
    _apply_feed_erase(feed_dir, manifest)
    return touched


def _pruned_through(feed_dir: str) -> int:
    """Highest batch id removed by retention (-1 if none): a pruned id
    must never be REWRITTEN — a fresh-checkpoint full replay would
    recompute its change_feed against the FINAL table generation and
    land fabricated rows in the durable record."""
    f = Path(feed_dir) / "_pruned_through"
    try:
        return int(f.read_text())
    except (OSError, ValueError):
        return -1


@locked_by("feed_dir")
def prune_feed(feed_dir: str, keep_last: int = 1) -> int:
    """Retention for the durable change feed: delete batch dirs every
    registered consumer has consumed (id <= min over consumer offsets),
    keeping the newest ``keep_last`` eligible dirs for inspection.  With
    NO registered consumers nothing is eligible — an unconsumed feed is
    the durable CDC record and must not silently rot.

    Crash-safe by construction: feed dirs are write-once (the producer
    never recomputes a committed dir), each consumer's offset file is its
    own commit, and deletion is idempotent.  Before any dir is deleted, a
    ``_pruned_through`` watermark commits (tmp+rename) covering the
    pruned ids: :func:`apply_batch_with_feed` refuses to (re)write a feed
    dir at or below it, so a FRESH-CHECKPOINT full replay — whose
    redelivered batches would recompute against the final table
    generation and emit garbage — cannot resurrect a pruned id with
    fabricated content; the merge itself still applies (idempotent).
    Returns the number of dirs deleted."""
    cons_dir = Path(feed_dir) / "_consumers"
    offsets = [feed_watermark(feed_dir, f.name)
               for f in cons_dir.glob("*")
               if f.is_file() and not f.name.endswith(".tmp")
               and ".tmp." not in f.name]
    if not offsets:
        return 0
    upto = min(offsets)
    eligible = sorted((p for p in Path(feed_dir).glob("batch_*")
                       if int(p.name.split("_")[1]) <= upto),
                      key=lambda p: int(p.name.split("_")[1]))
    prune = eligible[:-keep_last] if keep_last > 0 else eligible
    if not prune:
        return 0
    new_wm = max(_pruned_through(feed_dir),
                 int(prune[-1].name.split("_")[1]))
    tmp = Path(feed_dir) / "_pruned_through.tmp"
    tmp.write_text(str(new_wm))
    os.replace(tmp, Path(feed_dir) / "_pruned_through")  # commit FIRST
    for p in prune:
        shutil.rmtree(p, ignore_errors=True)
    return len(prune)


def read_feed_as_of(spark: SparkSession, feed_dir: str,
                    batch_id: int) -> DataFrame | None:
    """The feed PREFIX through ``batch_id`` inclusive — the time-travel
    read (Delta's ``versionAsOf`` is the table-format incarnation): only
    committed batch dirs with id <= the cutoff are opened, a driver-side
    name filter (no job, no scan of later batches).  None when no batch
    qualifies.  Note :func:`prune_feed` bounds how far back a feed can
    travel — a consumer that needs deep history must retain it
    (``keep_last``) or snapshot downstream."""
    recover_feed_erase(feed_dir)
    dirs = sorted((p for p in Path(feed_dir).glob("batch_*")
                   if (p / "_SUCCESS").exists()
                   and int(p.name.split("_")[1]) <= batch_id),
                  key=lambda p: int(p.name.split("_")[1]))
    if not dirs:
        return None
    return _read_feed_dirs(spark, dirs)


def table_as_of(spark: SparkSession, feed_dir: str, *, key: str,
                batch_id: int) -> DataFrame | None:
    """Reconstruct the upserted TABLE as of a feed batch — the
    reproducibility primitive a training pipeline needs ("the corpus
    exactly as run 2024-03-07 saw it"): replay the change feed through
    ``batch_id`` and keep each key's LAST applied image.  The feed emits
    one row per affected key per batch (stale/no-op rows emit nothing),
    so the latest (batch_id) row per key IS the stored row at that
    point; a final tombstone drops the key.  One key-partitioned window
    over the read prefix — at scale the cost is the replayed prefix,
    which is why long-lived feeds compact downstream snapshots and
    travel from the nearest one.  Returns ``key`` + the value columns
    (``new_`` prefix stripped) + ``_as_of_batch``, or None for an empty
    prefix.  A subject erased via :func:`erase_from_feed` is absent from
    every reconstruction — time travel cannot resurrect erased data.
    A feed PRUNED by :func:`prune_feed` raises instead of silently
    reconstructing from an incomplete prefix (keys last touched in the
    pruned batches would simply vanish — fabricated history, the exact
    failure the producer's ``_pruned_through`` write gate exists to
    prevent): travel from a downstream snapshot once retention has
    discarded the prefix."""
    from pyspark.sql.window import Window

    pruned = _pruned_through(feed_dir)
    if pruned >= 0:
        raise ValueError(
            f"feed pruned through batch {pruned}: the replay prefix is "
            f"incomplete — reconstruct from a downstream snapshot instead")
    feed = read_feed_as_of(spark, feed_dir, batch_id)
    if feed is None:
        return None
    w = (Window.partitionBy(key)
         .orderBy(F.col("batch_id").desc()))
    last = (feed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .filter(F.col("op") != "delete"))
    vals = [c for c in feed.columns if c.startswith("new_")]
    return last.select(
        F.col(key), *[F.col(c).alias(c[len("new_"):]) for c in vals],
        F.col("batch_id").alias("_as_of_batch"))


def read_feed_since(spark: SparkSession, feed_dir: str,
                    consumer: str) -> DataFrame | None:
    """The named consumer's UNCONSUMED feed tail: committed batch dirs
    with id strictly above the consumer's offset (None if fully caught
    up).  The consuming loop is read -> apply downstream -> commit the
    max batch_id via :func:`commit_feed_offset`; a crash before the
    offset commit re-reads the same tail, so the downstream apply must
    be idempotent (same contract as every feed subscriber)."""
    recover_feed_erase(feed_dir)
    wm = feed_watermark(feed_dir, consumer)
    dirs = sorted((p for p in Path(feed_dir).glob("batch_*")
                   if (p / "_SUCCESS").exists()
                   and int(p.name.split("_")[1]) > wm),
                  key=lambda p: int(p.name.split("_")[1]))
    if not dirs:
        return None
    return _read_feed_dirs(spark, dirs)
