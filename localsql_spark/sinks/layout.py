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
    returns the new file count.  The rewrite lands in a staging dir and
    commits READER-atomically (``sinks.generations``: one symlink-pointer
    flip, with the displaced generation kept until the next swap for
    in-flight scans) — a crash never leaves the table absent, and a
    concurrent lock-free reader sees old or new, never missing.  Legacy
    leftovers from the pre-generation protocol are healed on entry.  On a
    cluster this runs after streaming ingestion; coalesce (not
    repartition) keeps the rewrite shuffle-free."""
    import shutil

    from localsql_spark.sinks.generations import commit_store_swap

    path = Path(path)
    staging = path.with_name(path.name + "__compacting")
    old = path.with_name(path.name + "__old")
    # ---- recovery from the PRE-generation protocol's crash states ------
    if old.exists() and not path.exists():
        old.rename(path)            # died between the old two renames
    if staging.exists():
        shutil.rmtree(staging)      # incomplete rewrite: discard
    if old.exists():
        shutil.rmtree(old)          # old-protocol swap finished mid-cleanup
    # ---- rewrite + atomic commit ---------------------------------------
    n_files = max(1, math.ceil(dir_bytes(path) / (target_mb * (1 << 20))))
    df = spark.read.parquet(str(path))
    df.coalesce(n_files).write.mode("overwrite").parquet(str(staging))
    commit_store_swap(path, staging)
    return len([p for p in path.glob("*.parquet")])


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering
# ---------------------------------------------------------------------------

ZORDER_BITS = 8  # 256 cells per dimension — matches parquet row-group grain


def zvalue(x, y, x_min, x_max, y_min, y_max, bits: int = ZORDER_BITS):
    """Morton-interleaved z-value of two numeric columns, each min-max
    quantized to ``bits`` bits.  Pure closed-form column arithmetic
    (quantize -> unrolled bit interleave), identical in any engine — the
    DuckDB oracle reproduces it bit-for-bit.

    ``x_min``..``y_max`` are plain Python numbers (one tiny pre-aggregate
    supplies them), so the expression stays literal and codegen-friendly —
    no join against a stats frame in the hot path."""
    from pyspark.sql import functions as F

    def quant(c, lo, hi):
        span = (hi - lo) + 1e-9
        return F.least(
            F.floor((c.cast("double") - float(lo)) * (1 << bits) / span),
            F.lit((1 << bits) - 1)).cast("long")

    qx, qy = quant(x, x_min, x_max), quant(y, y_min, y_max)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(qx, i).bitwiseAND(1), 2 * i)
             + F.shiftleft(F.shiftright(qy, i).bitwiseAND(1), 2 * i + 1))
    return z


def write_zordered(df: DataFrame, path: str | Path, x_col: str, y_col: str,
                   n_files: int = 8, bits: int = ZORDER_BITS) -> None:
    """Z-order-clustered parquet write: rows are range-partitioned and
    sorted by the Morton interleave of (x_col, y_col), so parquet min/max
    stats become selective for range predicates on EITHER column — the
    multi-dimensional generalization of ``sort_cols`` clustering that
    single-column sorting cannot give (sorting by x leaves y scattered
    across every file).

    At 100 TB this is the layout lever for tables scanned by two
    independent keys (user x time, part x price): one repartitionByRange
    shuffle at write time buys planning-time file skipping on both
    dimensions forever after.  The quantization stats come from one tiny
    agg on the write path — at scale, substitute known domain bounds to
    skip even that."""
    from pyspark.sql import functions as F

    stats = df.agg(F.min(x_col).alias("x0"), F.max(x_col).alias("x1"),
                   F.min(y_col).alias("y0"), F.max(y_col).alias("y1")
                   ).collect()[0]
    z = zvalue(F.col(x_col), F.col(y_col), stats.x0, stats.x1,
               stats.y0, stats.y1, bits)
    (df.withColumn("__z", z)
     .repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(str(path)))


def file_skip_ratio(path: str | Path, col: str, lo, hi) -> tuple[int, int]:
    """(files that a [lo, hi] range predicate on ``col`` must read, total
    files) according to parquet footer min/max — the planning-time skipping
    a stats-aware reader achieves on this layout.  Footer-only inspection
    (pyarrow), no data pages touched."""
    import pyarrow.parquet as pq

    total = read = 0
    for p in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(p).metadata
        idx = md.schema.names.index(col)
        f_lo = min(md.row_group(g).column(idx).statistics.min
                   for g in range(md.num_row_groups))
        f_hi = max(md.row_group(g).column(idx).statistics.max
                   for g in range(md.num_row_groups))
        total += 1
        if not (f_hi < lo or f_lo > hi):
            read += 1
    return read, total
