"""Batch MERGE/upsert into a partitioned parquet table.

The reference has no persistence at all — a table's lifetime is the process
(reference: localsql/localsql.py:31) and its only write path exports the
last result.  A real training-data pipeline re-ingests corrections daily,
so this module adds the batch twin of ``streaming/foreach_upsert.py``:
merge an updates DataFrame into a hive-partitioned parquet table, keeping
the latest version per key, rewriting ONLY the partitions the updates
touch.

Scale design (the whole point vs. a naive full-table rewrite):

- The touched-partition list is the only thing collected to the driver —
  bounded by the number of distinct partition values in the batch, never by
  row count.
- The base read is filtered to touched partitions, so partition pruning
  keeps the job proportional to the update footprint, not the table size
  (a daily correction batch touching 3 of 10,000 date partitions reads 3).
- Conflict resolution is one latest-version-per-key window INSIDE each
  partition's data — the shuffle key is the merge key, and rows never cross
  partitions (see the stable-partition contract below).
- The write stages every merged partition in a scratch directory, then
  swaps partition directories into place one rename apiece — the same
  commit primitive Hive-style dynamic partition overwrite uses.  A crash
  mid-write leaves the base table fully intact; a crash mid-swap leaves
  whole-partition granularity (some partitions new, some old), which is the
  known non-transactional-parquet bound — a table format with transactional
  MERGE (Delta/Iceberg) replaces the swap with a metadata commit and the
  rest of this shape is unchanged.

Contract: the partition value of a key must be stable across versions
(partition by a key-derived or immutable attribute — lang, ingest date of
first arrival, hash bucket).  If an update could move a key between
partitions, the stale row in the old partition would survive; this is the
standard constraint for partition-keyed upserts outside transactional
table formats, and ``merge_into_partitioned`` raises if it detects a
violation among the keys it can see (same batch carrying two partition
values for one key).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.streaming.foreach_upsert import merge_upsert


def read_base_partitions(spark: SparkSession, base_dir: str,
                         partition_col: str, values: list) -> DataFrame | None:
    """Read only the named partitions of a hive-partitioned parquet table
    (None if the table doesn't exist yet).  The isin filter reaches the
    scan as a partition filter — touched-partition I/O only."""
    if not Path(base_dir).exists():
        return None
    df = spark.read.option("basePath", base_dir).parquet(base_dir)
    return df.filter(F.col(partition_col).isin(values))


def merge_into_partitioned(spark: SparkSession, base_dir: str,
                           updates: DataFrame, *, key: str, version: str,
                           partition_col: str) -> list:
    """MERGE ``updates`` into the partitioned parquet table at ``base_dir``
    (latest ``version`` per ``key`` wins; new keys insert).  Returns the
    list of partition values that were rewritten.

    Ties on (key, version) resolve by a deterministic full-row hash (same
    rule as the streaming upsert sink), so re-running the same batch is
    idempotent.
    """
    # 1. touched partitions — the ONLY driver-side materialization, bounded
    #    by the batch's partition fan-out
    parts = [r[0] for r in
             updates.select(partition_col).distinct().collect()]
    if not parts:
        return []
    # NULL partition values are rejected up front: the isin() base-read
    # filter below can never match NULL, so a NULL-keyed update would stage
    # a __HIVE_DEFAULT_PARTITION__ directory holding ONLY the update rows
    # and the swap would silently drop the base rows of that partition.
    # (Same free probe as the fan-out collect — NULL surfaces as None in
    # ``parts``, no extra job.)
    if any(p is None for p in parts):
        raise ValueError(
            f"updates carry NULL {partition_col!r} values — NULL partitions "
            f"cannot be merged safely (isin-based partition pruning skips "
            f"them); filter or backfill the partition column first")
    # stable-partition contract check over the visible keys: one partition
    # value per key within the batch (cheap — update-batch sized)
    bad = (updates.groupBy(key)
           .agg(F.countDistinct(partition_col).alias("np"))
           .filter(F.col("np") > 1))
    if not bad.isEmpty():
        raise ValueError(
            f"updates carry multiple {partition_col!r} values for one "
            f"{key!r} — partition value must be stable per key")

    # 2. prune the base read to touched partitions
    existing = read_base_partitions(spark, base_dir, partition_col, parts)

    # 3. latest-version-per-key resolution (shared with the streaming sink)
    merged = merge_upsert(existing, updates, key=key, version=version)

    # 4. stage the merged partitions, then swap each partition directory
    #    into place — rename-based commit, touched partitions only
    base = Path(base_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    (merged.write.mode("overwrite").partitionBy(partition_col)
     .parquet(str(staging)))
    base.mkdir(parents=True, exist_ok=True)
    for pdir in sorted(staging.glob(f"{partition_col}=*")):
        target = base / pdir.name
        old = base / f".{pdir.name}.old"
        shutil.rmtree(old, ignore_errors=True)
        if target.exists():
            target.rename(old)
        pdir.rename(target)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return parts
