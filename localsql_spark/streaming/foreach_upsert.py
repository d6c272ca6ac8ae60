"""foreachBatch upsert sink: merge each micro-batch into a keyed parquet
table (latest version per key wins).

``foreachBatch`` is the Structured Streaming escape hatch for sinks Spark
has no connector for — here a merge/upsert, which plain file sinks can't do.
Checkpointing still applies: a restart re-delivers only uncommitted batches,
and the merge is idempotent (same key+version -> same result), giving
effectively-exactly-once end-to-end.

Production note: rewriting the whole table per batch is the plain-parquet
cost of updates; a table format with transactional MERGE (Delta/Iceberg)
replaces the rewrite with a metadata swap — the foreachBatch shape is
identical, only the write inside changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_upsert(existing: DataFrame | None, batch: DataFrame, *,
                 key: str, version: str) -> DataFrame:
    """Latest-version-per-key merge of a batch into the existing table."""
    merged = batch if existing is None else existing.unionByName(batch)
    w = (Window.partitionBy(key)
         .orderBy(F.col(version).desc(), F.col(key)))
    return (merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def stream_upsert_parquet(spark: SparkSession, *, source_dir: str,
                          schema: str, key: str, version: str,
                          out_dir: str, checkpoint_dir: str) -> None:
    """Drain a file stream into a keyed parquet table via foreachBatch
    upserts (availableNow trigger: process backlog, then stop)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        try:
            existing = spark.read.parquet(out_dir)
            existing.cache().count()  # break lineage before overwriting source
        except Exception:  # first batch: nothing to merge yet
            existing = None
        result = merge_upsert(existing, batch_df, key=key, version=version)
        result.write.mode("overwrite").parquet(out_dir)
        if existing is not None:
            existing.unpersist()

    q = (spark.readStream.schema(schema).parquet(source_dir)
         .writeStream.foreachBatch(upsert)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
