"""Portable sketches: a HyperLogLog built from md5-derived hashes.

Spark's builtin ``approx_count_distinct`` is the production path, but its
HLL++ implementation is engine-specific, so its output can only be checked
loosely. This HLL uses portable arithmetic (md5 -> 32-bit hash -> bucket +
leading-zero rank) so an independent engine reproduces the sketch and the
estimate EXACTLY — the correctness gate then verifies the real algorithm,
and the same property means sketches can be exchanged across systems.

Scale shape: one narrow map (hash/bucket/rank per row), one groupBy on the
bucket id (fixed fan-in: m buckets regardless of input size), one single-row
final aggregate. Sketch merge across partitions/datasets = max per bucket —
the standard distributed-HLL property.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_B = 8            # bucket bits
HLL_M = 1 << HLL_B   # 256 buckets
# standard alpha_m for m >= 128
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hash32(col: Column) -> Column:
    from localsql_spark.operators import hash32

    return hash32(col)


def hll_buckets(df: DataFrame, col: str) -> DataFrame:
    """Per-bucket max rank: the HLL register table (m rows max).

    NULLs are dropped first (SQL COUNT DISTINCT semantics): md5(NULL) is
    NULL and would otherwise create a phantom NULL register that biases the
    estimate."""
    df = df.filter(F.col(col).isNotNull())
    h = _hash32(F.col(col))
    bucket = (h % HLL_M).alias("bucket")
    # rank = 1 + leading zeros of the remaining 24 bits (position of the
    # first 1-bit); portable via floor(log2) on the suffix
    suffix = F.shiftright(h, HLL_B)  # upper 24 bits (portable: >> on both engines)
    width = 32 - HLL_B
    rank = F.when(suffix == 0, width + 1).otherwise(
        width - F.floor(F.log2(suffix.cast("double"))).cast("int"))
    return (df.select(bucket, rank.cast("int").alias("rank"))
            .groupBy("bucket").agg(F.max("rank").alias("m_rank")))


def hll_estimate(df: DataFrame, col: str) -> DataFrame:
    """Single-row DataFrame (n_buckets_seen, estimate) for distinct(col).

    Raw estimate = alpha*m^2 / (sum 2^-M_j), empty buckets contributing
    2^0; small-range correction (linear counting) below 2.5m — both plain
    arithmetic, identical in any engine.
    """
    regs = hll_buckets(df, col)
    agg = regs.agg(
        F.count(F.lit(1)).alias("seen"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("present_sum"))
    m = float(HLL_M)
    seen = F.col("seen").cast("double")
    denom = F.col("present_sum") + (F.lit(m) - seen)  # empty buckets -> 2^0
    raw = F.lit(HLL_ALPHA * m * m) / denom
    zeros = F.lit(m) - seen
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(m) * F.log(F.lit(m) / zeros)).otherwise(raw)
    # empty input -> zero registers -> NULL sums; the distinct count of an
    # empty set is 0, not NULL
    return agg.select(F.col("seen").cast("long").alias("n_buckets_seen"),
                      F.coalesce(F.round(est, 6), F.lit(0.0))
                      .alias("estimate"))


def hll_error_bound(confidence_sigmas: float = 3.0) -> float:
    """Relative standard error of HLL with m buckets is ~1.04/sqrt(m)."""
    return confidence_sigmas * 1.04 / math.sqrt(HLL_M)
