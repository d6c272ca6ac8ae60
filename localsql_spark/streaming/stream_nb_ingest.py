"""Streaming maintenance of the persisted NB quality model
(operators.selection.nb_model_update): labeled document micro-batches
land in idempotent per-batch directories, then fold their ADDITIVE token
counts into the count store — the seventh streaming twin, one per
persisted store (rollup, SCD2, dedup, validate, IVF, join view, and now
the quality model).

Same two-stage design (and shared machinery) as stream_rollup, for the
same reason: the model fold is additive — re-applying a batch
double-counts every token — so exactly-once cannot ride
per-batch-overwrite alone.  Landing is effectively-exactly-once via
foreachBatch's stable batch ids + overwrite; the fold applies each
landed batch once under an ``applied_<id>`` marker
(:func:`stream_rollup.fold_landed_with`), and landed-dir retention is
:func:`stream_rollup.prune_landed` against the model dir.

Why stream-train a quality filter at all: the filter gates ingest, and a
filter trained once on January's crawl drifts against July's — streaming
the count folds keeps the model current at batch-tokenization cost, and
because the folds are EXACT (no decay, no approximation), the streamed
model is bit-identical to a full retrain over everything landed — which
is precisely what the registered query's shared oracle checks.

The reference has no streaming surface (reference:
localsql/localsql.py:31); scale extension.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession

from localsql_spark.operators.selection import nb_model_update
from localsql_spark.streaming.stream_rollup import (fold_landed_with,
                                                    stream_land_batches)


def stream_nb_ingest(spark: SparkSession, *, source_dir: str, schema,
                     land_dir: str, model_dir: str, checkpoint_dir: str,
                     positive: Column, n_buckets: int = 16,
                     doc_id_col: str = "doc_id", text_col: str = "text",
                     erase_ledger: str | None = None,
                     max_files_per_trigger: int = 1) -> int:
    """Land + fold in one call: drain the document file stream into
    per-batch landing dirs, then fold every unapplied batch's token
    counts into the persisted model.  Returns the number of batches
    folded.  ``erase_ledger`` (optional) keeps erased subjects' late-
    arriving documents out of the additive counts — the model is
    NON-retractable, so a subject trained in by a late batch could only
    leave via a full retrain (sinks.erase.rebuild_nonretractable);
    dropping at ingest is the cheap half of that contract
    (sinks.erase.filter_erased; see stream_erase_ingest)."""
    from localsql_spark.sinks.erase import filter_erased

    stream_land_batches(spark, source_dir=source_dir, schema=schema,
                        land_dir=land_dir, checkpoint_dir=checkpoint_dir,
                        max_files_per_trigger=max_files_per_trigger)
    return fold_landed_with(
        spark, land_dir, model_dir,
        lambda df: nb_model_update(
            spark, model_dir, filter_erased(df, erase_ledger, doc_id_col),
            positive, n_buckets=n_buckets, doc_id_col=doc_id_col,
            text_col=text_col))
