"""Streaming embedding ingest into the incrementally-maintained
covariance store — the streaming twin of `sinks/cov_store.py`, keeping
the one-twin-per-persisted-store invariant: every store the engine
persists can be maintained by a continuously-running pipeline with the
same exactly-once guarantees its batch loop has.

Exactly-once composition: Structured Streaming's checkpoint gives
at-least-once foreachBatch delivery with STABLE batch ids, and
cov_store_fold is replay-idempotent BY batch id — the batch's
sufficient statistics are a deterministic function of its rows, so a
redelivered batch rewrites its own ``batch_<id>`` dir byte-for-byte
instead of double-counting; a redelivery that arrives AFTER compaction
folded the id into an ``upto_<B>`` generation is skipped by the
``superseded`` gate.  The derived matrix is therefore a pure function
of the delivered row SET, whatever the delivery schedule — which is
what the registered probe proves by sharing the one-shot covariance
oracle.

The erase-ledger contract holds on the streaming path too: a deletion
request ledgered before a late data batch folds keeps the subjects'
contribution out of the second-moment state (cov_store_fold
anti-joins every batch against the ledger).

The reference has no streaming or vector surface; scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.sinks.cov_store import cov_store_fold


def cov_ingest_batch(batch: DataFrame, batch_id: int, *,
                     store_dir: str, vec_col: str = "embedding",
                     erase_ledger: str | None = None,
                     key_col: str = "vec_id") -> bool:
    """Apply ONE micro-batch: land its exact decimal partials as
    ``batch_<id>`` (False for a replay already folded into a compacted
    generation)."""
    return cov_store_fold(batch.sparkSession, store_dir, batch, batch_id,
                          vec_col=vec_col, ledger_dir=erase_ledger,
                          key_col=key_col)


def stream_cov_ingest(spark: SparkSession, *, source_dir: str, schema,
                      store_dir: str, checkpoint_dir: str,
                      vec_col: str = "embedding",
                      erase_ledger: str | None = None,
                      key_col: str = "vec_id",
                      max_files_per_trigger: int = 1) -> None:
    """Drain a file stream of embedding batches into the covariance
    store (availableNow trigger: process the backlog in order, then
    stop)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cov_ingest_batch(batch_df, batch_id, store_dir=store_dir,
                         vec_col=vec_col, erase_ledger=erase_ledger,
                         key_col=key_col)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(source_dir)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
