"""Streaming maintenance of the sketch-valued diversity view
(sinks.sketch_view): document micro-batches land in idempotent per-batch
directories, then fold their per-group HLL registers and totals into the
persisted view — the eighth streaming twin, one per persisted store
(rollup, SCD2, dedup, validate, IVF, join view, NB model, and now the
sketch view).

Same two-stage design (and shared machinery) as stream_rollup: the
register merge (per-bucket max) is idempotent, but the totals row is
ADDITIVE — re-applying a batch double-counts total_ngrams/n_docs — so
exactly-once rides the ``applied_<id>`` marker
(:func:`stream_rollup.fold_landed_with`), not the store write.  Landing
retention is :func:`stream_rollup.prune_landed` against the view dir.

The streamed registers are bit-identical to a single full-corpus sketch
(deterministic portable HLL, order-free max merge), so the registered
query shares the batch view's exact full-corpus oracle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from localsql_spark.sinks.sketch_view import sketch_view_update
from localsql_spark.streaming.stream_rollup import (fold_landed_with,
                                                    stream_land_batches)


def stream_sketch_ingest(spark: SparkSession, *, source_dir: str, schema,
                         land_dir: str, view_dir: str, checkpoint_dir: str,
                         n: int = 2, group_col: str = "source",
                         text_col: str = "text",
                         max_files_per_trigger: int = 1) -> int:
    """Land + fold in one call: drain the document file stream into
    per-batch landing dirs, then fold every unapplied batch's registers
    and totals into the persisted view.  Returns the number of batches
    folded."""
    stream_land_batches(spark, source_dir=source_dir, schema=schema,
                        land_dir=land_dir, checkpoint_dir=checkpoint_dir,
                        max_files_per_trigger=max_files_per_trigger)
    return fold_landed_with(
        spark, land_dir, view_dir,
        lambda df: sketch_view_update(spark, view_dir, df, n=n,
                                      group_col=group_col,
                                      text_col=text_col))
