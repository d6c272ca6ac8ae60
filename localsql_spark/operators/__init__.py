"""Scale operators beyond the reference's surface: dedup, similarity,
text analysis, event-time, multimodal."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Ensure enough partitions for CPU-bound per-row work.

    Small local files arrive as a single input split, which serializes every
    downstream expression/UDF on one core (observed 3-8x wall-time loss on
    the doc/embedding operators).  Repartition to the default parallelism
    when the input has fewer than ``min_fraction`` x that many partitions;
    at real scale inputs already have >= cores splits and this is a no-op —
    the shuffle is only paid exactly when the cluster would otherwise idle.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2.0, target * min_fraction):
        return df.repartition(target)
    return df
