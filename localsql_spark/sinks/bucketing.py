"""Bucketed persistent tables: shuffle-free co-located joins and aggs.

At 100 TB the single biggest repeated cost in a star-schema workload is
re-shuffling fact tables on the same join key query after query. Bucketing
pays that shuffle ONCE at write time: both sides of a same-key join read
pre-hash-partitioned buckets and Catalyst plans a sort-merge join with NO
Exchange on either side (verified by tests/test_bucketing.py against the
physical plan). The reference has no persistence at all, so this is a pure
scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, bucket_cols: list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    parquet table in the session warehouse. Same-key joins/aggregations over
    tables bucketed with the same (cols, n) skip their Exchange."""
    writer = (df.write.mode("overwrite").format("parquet")
              .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def cobucket_join(spark: SparkSession, left_name: str, right_name: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables by name — plans without shuffles when both
    were written via ``write_bucketed`` with identical bucketing."""
    return spark.table(left_name).join(spark.table(right_name), on, how)
