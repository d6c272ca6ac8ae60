"""Streaming validate-on-ingest: every micro-batch runs the declarative
constraint gate (operators.quality.validate_and_split) and routes rows —
passers to the accepted corpus, violators to a quarantine (dead-letter)
sink tagged with their failed-rule list.  The continuously-running form
of the batch `quarantine_orders_rows` gate, and the third member of the
ingest family next to stream_dedup_ingest (near-dup gate) and
foreach_upsert (latest-version merge).

The reference has no streaming or validation surface (reference:
localsql/localsql.py:31); scale extension.

Semantics note: only ROW-LOCAL rules (not_null / between / accepted /
matches) are batching-independent — a `unique` or `refers_to` rule would
see one micro-batch at a time, so cross-batch duplicate detection
belongs to the signature/content-hash store path
(streaming.stream_dedup_ingest), not this gate.  ``validate_ingest_batch``
rejects non-row-local rules for exactly that reason.

Idempotency/crash-safety: per-batch subdirectories with overwrite
semantics (same contract as stream_dedup_ingest) — a checkpoint
redelivery rewrites the same directories byte-for-byte, so both sinks
are effectively-exactly-once.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators.quality import Rule, validate_and_split
from localsql_spark.streaming.batch_dirs import (compact_batches,
                                                 fold_cutoff, read_batches,
                                                 superseded)

_ROW_LOCAL = ("not_null", "between", "accepted", "matches")


def validate_ingest_batch(batch: DataFrame, batch_id: int, *,
                          rules: list[Rule], out_dir: str,
                          quarantine_dir: str,
                          erase_ledger: str | None = None,
                          subject_col: str | None = None) -> tuple[int, int]:
    """Route ONE micro-batch; returns (n_passed, n_quarantined).
    ``erase_ledger`` + ``subject_col`` (optional, together) drop erased
    subjects' late-arriving rows before routing — BOTH routes, since the
    quarantine is a persisted store too (sinks.erase.filter_erased; see
    stream_erase_ingest for the contract)."""
    bad = [r.kind for r in rules if r.kind not in _ROW_LOCAL]
    if bad:
        raise ValueError(
            f"streaming gate takes row-local rules only, got {bad}; "
            "cross-batch uniqueness belongs to the dedup-ingest store")
    if superseded(out_dir, batch_id) or superseded(quarantine_dir, batch_id):
        # checkpoint replay across a compaction: both routes of this
        # batch are already durable inside a generation dir — recreating
        # batch_<id> would double-read them
        return 0, 0
    if erase_ledger is not None and subject_col is not None:
        from localsql_spark.sinks.erase import filter_erased
        batch = filter_erased(batch, erase_ledger, subject_col)
    passed, quarantined = validate_and_split(batch, rules)
    (passed.write.mode("overwrite")
     .parquet(str(Path(out_dir) / f"batch_{batch_id}")))
    q = quarantined.withColumn(
        "failed", F.array_join("failed_rules", ",")).drop("failed_rules")
    (q.write.mode("overwrite")
     .parquet(str(Path(quarantine_dir) / f"batch_{batch_id}")))
    return passed.count(), q.count()


def stream_validate_ingest(spark: SparkSession, *, source_dir: str, schema,
                           rules: list[Rule], out_dir: str,
                           quarantine_dir: str, checkpoint_dir: str,
                           erase_ledger: str | None = None,
                           subject_col: str | None = None,
                           max_files_per_trigger: int = 1) -> None:
    """Drain a file stream through the validation gate (availableNow
    trigger: process the backlog in order, then stop).
    ``erase_ledger``/``subject_col`` — see :func:`validate_ingest_batch`."""
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    Path(quarantine_dir).mkdir(parents=True, exist_ok=True)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        validate_ingest_batch(batch_df, batch_id, rules=rules,
                              out_dir=out_dir, quarantine_dir=quarantine_dir,
                              erase_ledger=erase_ledger,
                              subject_col=subject_col)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(source_dir)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def read_routed(spark: SparkSession, dir_: str) -> DataFrame:
    """Rows committed across all batches of either sink: newest compacted
    generation + non-superseded batch dirs."""
    return read_batches(spark, dir_)


def compact_routed(spark: SparkSession, *, out_dir: str, quarantine_dir: str,
                   keep_last: int = 1, target_files: int = 4) -> int:
    """Retention for the validation gate's two routes, at one SHARED
    cutoff so the replay no-op gate in :func:`validate_ingest_batch`
    stays consistent.  Single-writer maintenance between clean drains.
    Returns batch dirs folded across both."""
    cutoff = min(fold_cutoff(out_dir, keep_last),
                 fold_cutoff(quarantine_dir, keep_last))
    if cutoff < 0:
        return 0
    n = compact_batches(spark, out_dir, keep_last=0,
                        target_files=target_files, max_upto=cutoff)
    n += compact_batches(spark, quarantine_dir, keep_last=0,
                         target_files=target_files, max_upto=cutoff)
    return n
