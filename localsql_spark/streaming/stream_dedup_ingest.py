"""Streaming dedup-on-ingest: every micro-batch is near-dup-checked against
the persisted minhash signature store, survivors are committed to the
accepted corpus AND their signatures appended to the store — the
continuously-running form of the daily incremental-dedup loop
(operators/dedup.py: write/append/read_signature_store,
pairs_touching_new).

The reference has no streaming surface at all (its tables live and die in
one process, reference: localsql/localsql.py:31); this is the north-star
ingest shape of a training-data pipeline: documents arrive continuously,
each batch pays O(batch×bands) probe work against the corpus index — never
a corpus-vs-corpus recompare — and the accepted corpus + index grow only by
the keepers.

Batch semantics (greedy, order-deterministic):

- a batch doc that collides with any KEPT corpus doc is dropped (whatever
  the id order — the corpus doc was accepted first);
- within a batch, the LOWER doc_id of a colliding pair survives (drops are
  decided against the full pre-drop pair set in one pass — no transitive
  re-chaining inside a batch, which keeps the decision a pure function of
  the pair set and therefore oracle-expressible);
- docs dropped in an earlier batch do NOT block later docs (only keepers
  enter the store).

Idempotency/crash-safety: each batch writes its keepers and signatures to
``batch_<id>`` subdirectories with overwrite semantics, so a checkpoint
redelivery rewrites the same directories byte-for-byte instead of
double-appending.  A crash mid-batch re-runs the whole batch: the probe is
unaffected by the batch's own half-written signatures (self-pairs are
id-excluded), so the recomputed keepers — and the directories they
overwrite — are identical.  Combined with Structured Streaming's
checkpointing this is effectively-exactly-once into both sinks.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators import cleanup, track_persist
from localsql_spark.operators.dedup import (N_BANDS, N_MINHASH,
                                            compute_signatures,
                                            pairs_touching_new,
                                            read_signature_store)
from localsql_spark.streaming.batch_dirs import (compact_batches,
                                                 fold_cutoff, read_batches,
                                                 superseded)

_SIG_SCHEMA = "doc_id long, sig array<bigint>"


def dedup_ingest_batch(batch: DataFrame, batch_id: int, *, store_dir: str,
                       out_dir: str, text_col: str = "text",
                       id_col: str = "doc_id", threshold: float = 0.5,
                       n: int = N_MINHASH, bands: int = N_BANDS,
                       erase_ledger: str | None = None) -> int:
    """Apply ONE micro-batch: probe → drop → commit keepers to the corpus
    and their signatures to the store.  Returns the number of keepers.
    Doc ids must be unique across the stream (standard ingest contract;
    the id is the dedup identity).

    ``erase_ledger`` (optional) names the persisted erase ledger the
    paired erase stream maintains (``sinks.erase.erase_ledger_append``):
    the batch anti-joins it FIRST, so a subject erased while this batch
    sat landed-but-unapplied is dropped at ingest instead of being
    re-ingested post-erasure — the ledger half of the
    erase-vs-late-landing-batch contract (see stream_erase_ingest).
    The filter runs before the superseded gate's replay decision never
    matters for it: a replayed superseded batch returns without writing,
    and a replayed NON-superseded batch re-filters against the
    now-larger ledger, which can only drop more — the rewrite stays a
    subset, never a resurrection."""
    spark = batch.sparkSession
    store = Path(store_dir)
    if superseded(out_dir, batch_id) or superseded(store_dir, batch_id):
        # checkpoint replay across a compaction: this batch's keepers and
        # signatures are already durable inside a generation dir —
        # recreating batch_<id> would double-read them, and recomputing
        # drops against the NOW-larger store would change the keeper set
        return 0
    if erase_ledger is not None:
        from localsql_spark.sinks.erase import filter_erased
        batch = filter_erased(batch, erase_ledger, id_col)
    try:
        return _apply(spark, batch, batch_id, store, out_dir, text_col,
                      id_col, threshold, n, bands)
    finally:
        # release this batch's operator-persisted intermediates (signature
        # tables) — a long-running stream must not accumulate cache
        cleanup()


def _apply(spark: SparkSession, batch: DataFrame, batch_id: int, store: Path,
           out_dir: str, text_col: str, id_col: str, threshold: float,
           n: int, bands: int) -> int:
    # signatures computed ONCE per batch — shared by the probe and the
    # store append (text is never re-shingled)
    sig_new = track_persist(compute_signatures(batch, text_col, id_col, n))
    if any(store.glob("batch_*")) or any(store.glob("*.parquet")) \
            or any(store.glob("upto_*")):
        sig_corpus = read_signature_store(spark, str(store)) \
            .select("doc_id", "sig")
    else:
        sig_corpus = spark.createDataFrame([], _SIG_SCHEMA)
    pairs = pairs_touching_new(sig_corpus, sig_new,
                               threshold=threshold, n=n, bands=bands)
    # classify each pair side as batch/corpus and pick the drop victim:
    # both in batch -> greater id (doc_b, since doc_a < doc_b); exactly one
    # in batch -> the batch side.  The batch-id list is batch-bounded and
    # broadcasts.
    bi = sig_new.select(id_col)
    flags = (pairs
             .join(F.broadcast(bi.select(F.col(id_col).alias("doc_a"),
                                         F.lit(True).alias("a_in"))),
                   "doc_a", "left")
             .join(F.broadcast(bi.select(F.col(id_col).alias("doc_b"),
                                         F.lit(True).alias("b_in"))),
                   "doc_b", "left"))
    drops = (flags.select(
        F.when(F.col("a_in") & F.col("b_in"), F.col("doc_b"))
        .when(F.col("a_in"), F.col("doc_a"))
        .otherwise(F.col("doc_b")).alias(id_col))
        .distinct())
    keepers = batch.join(drops, id_col, "left_anti")
    # idempotent commit: per-batch subdirectories, overwrite mode — a
    # redelivered batch rewrites the same dirs instead of double-appending
    (keepers.write.mode("overwrite")
     .parquet(str(Path(out_dir) / f"batch_{batch_id}")))
    kept_sigs = sig_new.join(drops, id_col, "left_anti")
    # the store append holds the store's maintenance lock (advice r13):
    # the stream is the one genuinely concurrent producer, and an
    # unlocked write could land a batch dir between
    # compact_signature_store's read and its generation flip — the
    # displaced generation then carries the only copy of rows the
    # checkpoint already marked delivered.  Contention raises
    # MaintenanceBusy into the stream: the query fails, the checkpoint
    # has NOT advanced past this batch, and the restart redelivers and
    # rewrites the same dirs idempotently — rows are never lost.
    from localsql_spark.sinks.locks import store_lock
    with store_lock(str(store)):
        (kept_sigs.write.mode("overwrite")
         .parquet(str(store / f"batch_{batch_id}")))
    return keepers.count()


def stream_dedup_ingest(spark: SparkSession, *, source_dir: str, schema,
                        store_dir: str, out_dir: str, checkpoint_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5,
                        erase_ledger: str | None = None,
                        max_files_per_trigger: int = 1) -> None:
    """Drain a document file stream through the dedup-on-ingest sink
    (availableNow trigger: process the backlog in order, then stop).
    ``erase_ledger`` — see :func:`dedup_ingest_batch`."""
    Path(store_dir).mkdir(parents=True, exist_ok=True)
    Path(out_dir).mkdir(parents=True, exist_ok=True)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        dedup_ingest_batch(batch_df, batch_id, store_dir=store_dir,
                           out_dir=out_dir, text_col=text_col,
                           id_col=id_col, threshold=threshold,
                           erase_ledger=erase_ledger)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(source_dir)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def read_accepted(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accepted (deduplicated) corpus across all committed batches:
    newest compacted generation + non-superseded batch dirs (crash-safe
    against a compaction that committed but hasn't cleaned up yet)."""
    return read_batches(spark, out_dir)


def compact_ingest(spark: SparkSession, *, out_dir: str, store_dir: str,
                   keep_last: int = 1, target_files: int = 4) -> int:
    """Retention for the dedup-ingest sink: fold old ``batch_<id>`` dirs
    of the accepted corpus AND the signature store into one generation
    dir each, at one SHARED cutoff (min of what either dir could fold) so
    the replay no-op gate in :func:`dedup_ingest_batch` stays consistent
    across both sinks.  Single-writer maintenance step between drains —
    run it only after a CLEAN drain (a crash mid-batch must be redelivered
    and rewritten before its dirs are folded).  Returns batch dirs folded
    across both."""
    cutoff = min(fold_cutoff(out_dir, keep_last),
                 fold_cutoff(store_dir, keep_last))
    if cutoff < 0:
        return 0
    n = compact_batches(spark, out_dir, keep_last=0,
                        target_files=target_files, max_upto=cutoff)
    n += compact_batches(spark, store_dir, keep_last=0,
                         target_files=target_files, max_upto=cutoff)
    return n
