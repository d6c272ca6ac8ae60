"""Streaming embedding ingest into the persisted IVF index: each
micro-batch of new vectors folds in via operators.similarity.
append_ivf_index — the continuously-running form of the batch
`knn_ivf_index_append_top5` maintenance, and the fifth member of the
ingest family next to stream_dedup_ingest (near-dup gate),
stream_validate_ingest (quality gate), stream_rollup (continuous
aggregate) and stream_scd2_ingest (dimension history).  With it, every
persisted store in the engine has a streaming twin.

The reference has no streaming or vector surface (reference:
localsql/localsql.py:31); scale extension.

Exactly-once composition: Structured Streaming's checkpoint gives
at-least-once foreachBatch delivery with STABLE batch ids, and
append_ivf_index is replay-idempotent BY batch id — assignment against
the (frozen) centroid table is deterministic, so a redelivered batch
rewrites its own ``delta/batch_<id>`` directory byte-for-byte instead of
double-appending.  A redelivery that arrives AFTER a compaction folded
the batch into a ``cells_upto_<B>`` generation is skipped outright
(batch_id <= B means the rows are already durable in the base; rewriting
the delta dir would only leave a superseded dir for the next compaction
to sweep).

At 100 TB: per-batch cost is one broadcast centroid assignment over the
BATCH — never the accumulated corpus — and landed deltas are
cell-partitioned so probes keep partition pruning; compaction
(compact_ivf_index) runs offline between query batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.operators.similarity import _ivf_base, append_ivf_index


def ivf_ingest_batch(batch: DataFrame, batch_id: int, *,
                     index_path: str, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     erase_ledger: str | None = None) -> int:
    """Apply ONE micro-batch: assign against the existing centroids and
    land as ``delta/batch_<id>``.  Returns vectors appended (0 for a
    replay already folded into a compacted generation).
    ``erase_ledger`` (optional) drops erased subjects' late-arriving
    vectors before they land — this index stores RAW embeddings, so a
    late re-ingest is the personal data itself coming back
    (sinks.erase.filter_erased; a ledger-filtered redelivery rewrites
    its delta dir as a SUBSET, never a resurrection)."""
    _, upto = _ivf_base(index_path)
    if batch_id <= upto:
        return 0
    if erase_ledger is not None:
        from localsql_spark.sinks.erase import filter_erased
        batch = filter_erased(batch, erase_ledger, id_col)
    return append_ivf_index(batch.sparkSession, index_path, batch,
                            batch_id, id_col=id_col, vec_col=vec_col)


def stream_ivf_ingest(spark: SparkSession, *, source_dir: str, schema,
                      index_path: str, checkpoint_dir: str,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      erase_ledger: str | None = None,
                      max_files_per_trigger: int = 1) -> None:
    """Drain a file stream of embedding batches into the persisted IVF
    index (availableNow trigger: process the backlog in order, then
    stop).  ``write_ivf_index`` must have built the base (and its
    centroid table) first; stream batch N lands as store batch N+1 so
    the base keeps id 0."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf_ingest_batch(batch_df, batch_id + 1, index_path=index_path,
                         id_col=id_col, vec_col=vec_col,
                         erase_ledger=erase_ledger)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(source_dir)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
