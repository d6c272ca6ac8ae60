"""Streaming CDC ingest into the persisted SCD2 store: each micro-batch
of dimension updates applies as one store batch — the continuously-running
form of the batch `scd2_store_history` maintenance, and the fourth member
of the ingest family next to stream_dedup_ingest (near-dup gate),
stream_validate_ingest (quality gate) and stream_rollup (continuous
aggregate).

The reference has no streaming or dimension surface (reference:
localsql/localsql.py:31); scale extension.

Exactly-once composition: Structured Streaming's checkpoint gives
at-least-once foreachBatch delivery with STABLE batch ids, and
sinks.scd2_store.apply_batch is replay-idempotent BY batch id (a
redelivered batch rebuilds from the predecessor snapshot and rewrites
identical directories, out-of-order older ids are rejected) — so the
composition is effectively-exactly-once with no extra bookkeeping: the
stream's batch id IS the store's batch id (offset by one past the init
snapshot's batch 0).

Event-time discipline: the version timestamp for batch N comes from a
caller-supplied ``ts_for_batch`` (deterministic, monotone), not wall
clock — replay must produce byte-identical history, and validity
intervals belong to the DATA, not to when the executor happened to run.

At 100 TB: each micro-batch joins only the dimension-sized open slice
(the store's core property), so ingest cost tracks update rate; the
closed history grows append-only and compacts offline
(compact_scd2_store).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.sinks.scd2_store import apply_batch


def stream_scd2_ingest(spark: SparkSession, *, source_dir: str, schema,
                       store_dir: str, key_cols: list[str],
                       attr_cols: list[str],
                       ts_for_batch: Callable[[int], int],
                       checkpoint_dir: str,
                       max_files_per_trigger: int = 1) -> None:
    """Drain a file stream of dimension-update batches into the SCD2
    store (availableNow trigger: process the backlog in order, then
    stop).  ``init_store`` must have run first (batch 0)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_batch(spark, store_dir,
                    batch_df.select(*key_cols, *attr_cols),
                    key_cols, attr_cols,
                    ts_for_batch(batch_id), batch_id=batch_id + 1)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(source_dir)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
