"""Streaming maintenance of the persisted inverted index
(sinks.inverted_index): document micro-batches land in idempotent
per-batch directories, then fold their postings and stats into the index
— the ninth streaming twin, one per persisted store (rollup, SCD2,
dedup, validate, IVF, join view, NB model, sketch view, and now the
inverted index): a live search tier indexes the crawl as it lands.

Same two-stage design (and shared machinery) as stream_rollup: posting
tf sums and the stats counter are ADDITIVE — re-applying a batch
double-counts — so exactly-once rides the ``applied_<id>`` marker
(:func:`stream_rollup.fold_landed_with`), not the store write.  Landing
retention is :func:`stream_rollup.prune_landed` against the index dir.

Streamed folds == one-shot build == from-scratch scorer (the batch
parity test pins the first equality; the registered query's shared
oracle pins the rest).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from localsql_spark.sinks.inverted_index import index_add_documents
from localsql_spark.streaming.stream_rollup import (fold_landed_with,
                                                    stream_land_batches)


def stream_index_ingest(spark: SparkSession, *, source_dir: str, schema,
                        land_dir: str, index_dir: str, checkpoint_dir: str,
                        n_buckets: int = 16, doc_id_col: str = "doc_id",
                        text_col: str = "text",
                        erase_ledger: str | None = None,
                        max_files_per_trigger: int = 1) -> int:
    """Land + fold in one call: drain the document file stream into
    per-batch landing dirs, then fold every unapplied batch's postings
    into the persisted index.  Returns the number of batches folded.
    ``erase_ledger`` (optional) drops erased subjects' late-arriving
    documents before they index — the ledger half of the
    erase-vs-late-landing-batch contract (sinks.erase.filter_erased;
    see stream_erase_ingest)."""
    from localsql_spark.sinks.erase import filter_erased

    stream_land_batches(spark, source_dir=source_dir, schema=schema,
                        land_dir=land_dir, checkpoint_dir=checkpoint_dir,
                        max_files_per_trigger=max_files_per_trigger)
    return fold_landed_with(
        spark, land_dir, index_dir,
        lambda df: index_add_documents(
            spark, index_dir, filter_erased(df, erase_ledger, doc_id_col),
            n_buckets=n_buckets, doc_id_col=doc_id_col,
            text_col=text_col))
