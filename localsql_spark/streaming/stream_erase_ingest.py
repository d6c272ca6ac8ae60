"""Streaming right-to-be-forgotten queue: deletion-request micro-batches
land in idempotent per-batch dirs, then fold through
:func:`sinks.erase.erase_keys` into the key-bucketed primary store — the
compliance-queue shape (requests arrive continuously; each folds with
cost bounded by ITS key count, touched buckets only).

Reuses the marker-committed landing loop every MERGE-style twin shares
(streaming/stream_rollup.fold_landed_with).  Erasure is additionally
idempotent per batch (erasing absent keys is a no-op rewrite), so the one
crash window the loop documents — store committed but marker not yet
written — is a harmless re-erase here, strictly safer than the rollup/IVM
folds.

Derived-store propagation (inverted index, signature store, IVFPQ codes,
SCD2 history) composes by passing :func:`sinks.erase.erase_everywhere`
store configs through ``derived``; the batch twin
``erase_users_everywhere`` is the oracle-gated proof of that composition
— this twin keeps the per-batch fold primary-store-shaped so the queue's
steady-state cost stays request-bounded.

The reference has no streaming surface (reference: localsql/localsql.py:31);
scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.sinks.erase import erase_everywhere, erase_keys
from localsql_spark.streaming.stream_rollup import (fold_landed_with,
                                                    stream_land_batches)


def stream_erase_ingest(spark: SparkSession, *, source_dir: str, schema,
                        land_dir: str, store_dir: str, checkpoint_dir: str,
                        key_col: str, n_buckets: int = 32,
                        derived: dict | None = None,
                        ledger_dir: str | None = None,
                        max_files_per_trigger: int = 1) -> int:
    """Land + fold in one call: drain the deletion-request file stream
    into per-batch landing dirs, then erase every landed batch's keys
    from the bucketed store at ``store_dir`` (and, with ``derived``, the
    configured derived stores via erase_everywhere).  Returns the number
    of request batches folded.

    ``ledger_dir`` (optional but recommended when a DATA ingest stream
    feeds the same corpus) records each request batch's keys in the
    persisted erase ledger BEFORE any store is touched — closing the
    erase-vs-late-landing-batch window: a data batch containing the
    subject that was landed-but-unapplied when the erase folded would
    otherwise re-ingest the subject post-erasure; with the ledger, the
    data fold (``sinks.erase.filter_erased`` — wired into
    ``stream_dedup_ingest``) drops those rows at ingest.  Commit order
    makes every crash point safe: ledger append (idempotent per-batch
    overwrite) -> store erase (idempotent) -> applied marker; a crash
    between any two re-runs the rest, and the subject is blocked from
    the instant the ledger dir commits."""
    from localsql_spark.sinks.erase import erase_ledger_append

    stream_land_batches(spark, source_dir=source_dir, schema=schema,
                        land_dir=land_dir, checkpoint_dir=checkpoint_dir,
                        max_files_per_trigger=max_files_per_trigger)

    def _fold(df: DataFrame, batch_id: int) -> None:
        if ledger_dir is not None:
            erase_ledger_append(df, ledger_dir, batch_id)
        if derived:
            erase_everywhere(
                spark, df,
                primary={"base_dir": store_dir, "key_col": key_col,
                         "n_buckets": n_buckets}, **derived)
        else:
            erase_keys(spark, store_dir, df, key_col, n_buckets=n_buckets)

    return fold_landed_with(spark, land_dir, store_dir, _fold,
                            pass_batch_id=True)
