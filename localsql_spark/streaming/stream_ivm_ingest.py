"""Streaming maintenance of the JOIN-aggregate view (sinks.ivm): fact
micro-batches land in idempotent per-batch directories, then fold through
the dimension join into the persisted view — the streaming front end of
the materialized-view family, completing one streaming twin per persisted
store (rollup, SCD2, dedup, validate, IVF, and now the join view).

Same two-stage design (and shared machinery) as stream_rollup, for the
same reason: the view fold is a MERGE — re-applying a batch double-counts
— so exactly-once cannot ride per-batch-overwrite alone.  Landing is
effectively-exactly-once via foreachBatch's stable batch ids + overwrite;
the fold applies each landed batch once under an ``applied_<id>`` marker
(:func:`stream_rollup.fold_landed_with`), and landed-dir retention is
:func:`stream_rollup.prune_landed` against the view dir.

At 100 TB: each fold is Δfact ⋈ dim + one batch-sized aggregate +
touched-bucket partition swap (see sinks/ivm.py) — maintenance cost
tracks ingest rate, never fact history, which is the entire point of an
incrementally-maintained view under a stream.

The reference has no streaming surface (reference: localsql/localsql.py:31);
scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.sinks.ivm import maintain_join_view
from localsql_spark.streaming.stream_rollup import (fold_landed_with,
                                                    stream_land_batches)


def stream_ivm_ingest(spark: SparkSession, *, source_dir: str, schema,
                      land_dir: str, view_dir: str, checkpoint_dir: str,
                      dim: DataFrame, fact_key: str, dim_key: str,
                      group_col: str, value_col: str, n_buckets: int = 8,
                      max_files_per_trigger: int = 1) -> int:
    """Land + fold in one call: drain the fact file stream into per-batch
    landing dirs, then fold every unapplied batch through the dim join
    into the persisted view.  Returns the number of batches folded."""
    stream_land_batches(spark, source_dir=source_dir, schema=schema,
                        land_dir=land_dir, checkpoint_dir=checkpoint_dir,
                        max_files_per_trigger=max_files_per_trigger)
    return fold_landed_with(
        spark, land_dir, view_dir,
        lambda df: maintain_join_view(
            spark, view_dir, df, dim, fact_key=fact_key, dim_key=dim_key,
            group_col=group_col, value_col=value_col, n_buckets=n_buckets))
