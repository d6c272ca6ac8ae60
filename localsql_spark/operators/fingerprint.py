"""Distributed table fingerprints and cross-snapshot drift detection.

How you verify a 100 TB copy/migration — or detect WHAT changed between two
corpus versions — without moving data: both sides compute a fixed number of
(bucket, row count, order-insensitive content-hash sum) rows; equal
fingerprints mean equal content with overwhelming probability, and a
mismatched bucket pinpoints WHERE to drill down (recurse into that bucket
with a finer fingerprint).

Portable arithmetic throughout (md5-derived 32-bit hashes, decimal(38)
sums) so an independent engine — DuckDB in the correctness gate, or the
OTHER SIDE of a real migration — reproduces the fingerprint bit-for-bit.
The reference has no persistence and therefore no notion of snapshots
(table lifetime = process, reference: localsql/localsql.py:31); this is
pipeline-extension territory.

Scale shape: row-local hash expressions + one fixed-fan-in shuffle per
snapshot (``buckets`` rows out, whatever the input size); the diff joins
two <= ``buckets``-row frames — driver never sees row-level data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from localsql_spark.operators import hash32

N_BUCKETS = 64


def table_fingerprint(df: DataFrame, key_col: str, payload: Column,
                      buckets: int = N_BUCKETS) -> DataFrame:
    """(bucket, n_rows, hash_sum) per hash bucket of ``key_col``.

    Row hash = first 8 md5 hex digits of "key:md5(payload)" — the payload
    is pre-hashed so arbitrarily wide content contributes a fixed-width
    term.  The commutative decimal SUM makes the fingerprint partition-
    order invariant; it surfaces as VARCHAR because a 38-digit decimal
    exceeds both engines' 64-bit integer output paths.
    """
    key = F.col(key_col)
    # NULL-safety (non-NULL rows hash identically to before, so the
    # oracles stay exact): a NULL key used to land in bucket NULL —
    # invisible to fingerprint_diff's equi-join, so IDENTICAL tables
    # containing one reported spurious diffs — and a NULL payload nulled
    # the whole row_hash, hiding key differences among such rows.  NULL
    # keys take the reserved bucket ``buckets``; NULL components hash as
    # sentinel strings (distinct from any real value's md5 path).
    row_hash = F.conv(
        F.substring(F.md5(F.concat(
            F.coalesce(key.cast("string"), F.lit("\x00null-key")),
            F.lit(":"),
            F.coalesce(F.md5(payload), F.lit("\x00null-payload")))), 1, 8),
        16, 10).cast("long")
    return (df.groupBy(F.coalesce(hash32(key) % buckets,
                                  F.lit(buckets)).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(row_hash.cast("decimal(38,0)")).cast("string")
                 .alias("hash_sum")))


def fingerprint_diff(fa: DataFrame, fb: DataFrame) -> DataFrame:
    """Buckets whose (count, hash-sum) differ between two fingerprints:
    (bucket, n_rows_a, n_rows_b, hash_a, hash_b).  A bucket absent from one
    side reports 0 rows / '0'.  Equal tables -> empty result."""
    a = fa.select("bucket", F.col("n_rows").alias("n_rows_a"),
                  F.col("hash_sum").alias("hash_a"))
    b = fb.select("bucket", F.col("n_rows").alias("n_rows_b"),
                  F.col("hash_sum").alias("hash_b"))
    return (a.join(b, "bucket", "full_outer")
            .filter(~F.col("n_rows_a").eqNullSafe(F.col("n_rows_b"))
                    | ~F.col("hash_a").eqNullSafe(F.col("hash_b")))
            .select("bucket",
                    F.coalesce("n_rows_a", F.lit(0)).alias("n_rows_a"),
                    F.coalesce("n_rows_b", F.lit(0)).alias("n_rows_b"),
                    F.coalesce("hash_a", F.lit("0")).alias("hash_a"),
                    F.coalesce("hash_b", F.lit("0")).alias("hash_b")))
