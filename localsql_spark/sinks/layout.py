"""Data-layout sinks: hive-partitioned writes and small-file compaction.

The two layout levers that dominate 100 TB scan cost:

- **Partition pruning**: a ``partitionBy`` write lays data out as
  ``col=value/`` directories; a filter on the partition column prunes whole
  directories at PLANNING time (the plan shows ``PartitionFilters``, and the
  scan never opens the pruned files).  Orders of magnitude cheaper than
  row-level predicate pushdown for low-cardinality scan keys (date, source,
  language, split).
- **File sizing**: streaming ingestion and fine-grained partitioning leave
  thousands of KB-scale files; each costs an open + footer parse + task
  schedule.  Compaction rewrites a directory into ~``target_mb`` files.

The reference has no persistence at all (its tables live in process memory,
localsql/localsql.py:230); both are pure scale extensions.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str | Path,
                      partition_cols: list[str],
                      sort_cols: list[str] | None = None,
                      fmt: str = "parquet") -> None:
    """Hive-style partitioned write.  ``sort_cols`` sorts WITHIN each output
    file (no global shuffle) so parquet min/max row-group stats become
    selective for range predicates on those columns — the poor man's
    Z-order, free at write time.

    Partition-column cardinality discipline is the caller's job: every
    distinct combination becomes a directory, so partition on
    low-cardinality scan keys and rely on row-group stats within them.
    """
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (out.write.mode("overwrite").format(fmt)
     .partitionBy(*partition_cols).save(str(path)))


def read_partitioned(spark: SparkSession, path: str | Path,
                     fmt: str = "parquet") -> DataFrame:
    """Read a partitioned layout back; partition columns are recovered from
    the directory structure and filters on them prune at planning time."""
    return spark.read.format(fmt).load(str(path))


def dir_bytes(path: str | Path) -> int:
    return sum(p.stat().st_size for p in Path(path).rglob("*")
               if p.is_file() and not p.name.startswith(("_", ".")))


def compact_parquet(spark: SparkSession, path: str | Path,
                    target_mb: int = 128) -> int:
    """Rewrite a parquet directory into ceil(bytes / target_mb) files;
    returns the new file count.  The data is never at risk: the rewrite
    lands in a staging dir, the live dir moves aside, staging moves in, and
    only then is the old data deleted.  The two renames are not one atomic
    operation, so a crash can leave the table momentarily absent — the
    recovery pass at the top of the NEXT run heals every intermediate state
    (restores the old generation if the swap died mid-way, clears stale
    staging), which is the contract a scheduled maintenance job needs.  On a
    cluster this runs after streaming ingestion; coalesce (not repartition)
    keeps the rewrite shuffle-free."""
    import shutil

    path = Path(path)
    staging = path.with_name(path.name + "__compacting")
    old = path.with_name(path.name + "__old")
    # ---- recovery from a previous crashed run --------------------------
    if old.exists() and not path.exists():
        old.rename(path)            # died between the two renames
    if staging.exists():
        shutil.rmtree(staging)      # incomplete rewrite: discard
    if old.exists():
        shutil.rmtree(old)          # swap finished, cleanup didn't
    # ---- rewrite + swap ------------------------------------------------
    n_files = max(1, math.ceil(dir_bytes(path) / (target_mb * (1 << 20))))
    df = spark.read.parquet(str(path))
    df.coalesce(n_files).write.mode("overwrite").parquet(str(staging))
    path.rename(old)
    staging.rename(path)
    shutil.rmtree(old)
    return len([p for p in path.glob("*.parquet")])
