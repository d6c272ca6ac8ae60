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


# ---------------------------------------------------------------------------
# Portable Bloom filter
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 16    # filter bits
BLOOM_K = 4          # hash functions = disjoint 8-hex-digit md5 slices

# Spark's builtin BloomFilter (DataFrame.stat.bloomFilter / the AQE runtime
# bloom join) is the production fast path, but its bit layout is JVM-
# internal.  This one derives its K hashes from fixed md5 hex slices so an
# independent engine reproduces the EXACT bit set — same portability
# rationale as the HLL above, and the filter itself is exchangeable
# (ship the bit table, not a JVM object).


def _bloom_positions(col: Column, m: int = BLOOM_M) -> list[Column]:
    """K bit positions for a key: md5 hex chars [1-8],[9-16],[17-24],[25-32],
    each taken base-16 mod ``m``.  Identical expression in the DuckDB
    oracles.  ``m`` must match between build and probe; size it to the
    expected key count (FP rate ~ (1 - e^(-K*n/m))^K)."""
    md = F.md5(col.cast("string"))
    return [(F.conv(F.substring(md, 1 + 8 * j, 8), 16, 10).cast("long")
             % m).alias(f"bit{j}") for j in range(BLOOM_K)]


def bloom_build(df: DataFrame, col: str, m: int = BLOOM_M) -> DataFrame:
    """The filter as a DataFrame of DISTINCT set bit positions (<= min(K*n,
    m) rows — bounded regardless of input size, so it broadcasts at any
    scale).  Distributed build: row-local position expressions, one distinct
    shuffle whose output is capped at m rows.  Merging two filters is
    UNION DISTINCT of their bit tables."""
    keys = df.filter(F.col(col).isNotNull())
    pos = keys.select(F.explode(F.array(*_bloom_positions(F.col(col), m)))
                      .alias("bit"))
    return pos.distinct()


def bloom_probe(bits: DataFrame, probes: DataFrame, col: str,
                m: int = BLOOM_M) -> DataFrame:
    """Rows of ``probes`` (all columns, duplicates preserved) whose key MAY
    be in the filter (all K bits set); NULL keys never match (a Bloom filter
    holds no NULL, mirroring ``IN`` semantics).  The bit table is broadcast
    (<= min(K*n, m) rows); probe side stays distributed — distinct keys
    explode to (key, bit), broadcast-join, keys with K matched positions
    semi-join the input back.  No false negatives, bounded false
    positives."""
    keys = probes.select(col).distinct()
    pos = keys.select(
        F.col(col), F.explode(F.array(*_bloom_positions(F.col(col), m)))
        .alias("bit"))
    hits = pos.join(F.broadcast(bits), "bit")
    matched = (hits.groupBy(col)
               .agg(F.count(F.lit(1)).alias("_n_set"))
               .filter(F.col("_n_set") == BLOOM_K)
               .select(col))
    return probes.join(matched, col, "left_semi")


# ---------------------------------------------------------------------------
# Portable quantile sketch (bottom-k hash-rank sample, KMV-style)
# ---------------------------------------------------------------------------

QUANTILE_K = 1024  # sample size: rank stderr ~ sqrt(q(1-q)/k) < 1.6%

# Spark's builtin approx_percentile (Greenwald-Khanna) and DataSketches KLL
# are the production fast paths, but their summaries are engine-internal, so
# an independent engine can't verify them bit-for-bit.  This sketch keeps
# the k rows with the SMALLEST md5-derived hash of a unique key — a
# deterministic uniform sample (the hash order is a fixed random permutation
# of the rows), which is the portable analog of the random sampling KLL's
# upper compactor levels perform:
#
# - bounded: <= k rows whatever the input size (broadcastable summary);
# - mergeable: sketch(A union B) == bottom-k(sketch(A) union sketch(B)) —
#   the same associative-merge property HLL registers have;
# - deterministic + portable: any engine with md5 reproduces the EXACT
#   sample, so the DuckDB oracle checks the real algorithm;
# - distributed build: per-partition bottom-k, then merge
#   (TakeOrderedAndProject — no full sort, no full shuffle).
#
# Quantile estimate: the sample's empirical quantile; rank error is
# O(1/sqrt(k)) uniformly over q.  (True KLL reaches the same guarantee with
# less memory via compactor levels, but its randomized compaction can't be
# reproduced engine-independently; at k=1024 the sample IS small enough to
# broadcast, so the extra machinery buys nothing here.)


QUANTILE_SALT = "qsk:"  # see quantile_sketch docstring


def _qrank(key_col: str) -> Column:
    """Salted hash rank.  The salt makes the sampling hash an INDEPENDENT
    family from any hash the data itself was derived with: measured on the
    synthetic events table, the UNSALTED md5(event_id) prefix correlates
    with `value` (corr +0.033, sample mean 42.5 vs true 49.6 — every
    quantile biased ~2-5pp low) because the generator evidently used the
    same md5-prefix construction; salting restores the uniform-sample
    guarantee on exactly that kind of data.  Oracles prepend the same
    literal."""
    return _hash32(F.concat(F.lit(QUANTILE_SALT),
                            F.col(key_col).cast("string")))


def quantile_sketch(df: DataFrame, value_col: str, key_col: str,
                    k: int = QUANTILE_K) -> DataFrame:
    """The sketch: k (v, rk) rows with the smallest salted hash rank over
    distinct keys.  NULL values are excluded (quantiles of the non-null
    domain, matching SQL percentile semantics)."""
    rk = _qrank(key_col)
    # (rk, v) tiebreak: a 32-bit hash collision straddling the k boundary is
    # rare but possible (birthday bound ~100k rows); without the secondary
    # key the retained row would be engine/run-dependent, breaking the
    # bit-reproducibility/mergeability contract above.  The oracle orders
    # the same way.
    return (df.filter(F.col(value_col).isNotNull())
            .select(F.col(value_col).cast("double").alias("v"),
                    rk.alias("rk"))
            .orderBy("rk", "v").limit(k))


def quantile_estimates(sketch: DataFrame,
                       qs: tuple[float, ...] = (0.01, 0.25, 0.5, 0.75,
                                                0.9, 0.99)) -> DataFrame:
    """(q, estimate) per requested quantile: the sample value at 1-based
    index floor(q*(n-1))+1 in (v, rk) order.  Runs entirely on the bounded
    sketch (<= k rows), so the single-partition window and the tiny
    broadcast cross-join are free by construction."""
    from pyspark.sql import Window

    w = Window.orderBy("v", "rk")
    ranked = (sketch.select(
        "v", "rk", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))).alias("n")))
    spark = sketch.sparkSession
    # quantile list as a plan-side literal array (no driver createDataFrame
    # round-trip, no ExistingRDD scan in the plan)
    qdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q"))
    return (ranked.crossJoin(F.broadcast(qdf))
            .filter(F.col("rn")
                    == F.floor(F.col("q") * (F.col("n") - 1)) + 1)
            .select("q", F.col("v").alias("estimate")))


def hll_estimate_by(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """Grouped HLL: one (n_buckets_seen, estimate) row PER GROUP — the
    per-source/per-day distinct-count monitoring shape.  Same portable
    registers as :func:`hll_estimate`, keyed by (group, bucket): two
    fixed-fan-in shuffles (groups x m rows, then groups), merge across
    datasets stays per-bucket max within each group."""
    df = df.filter(F.col(col).isNotNull() & F.col(group_col).isNotNull())
    h = _hash32(F.col(col))
    bucket = (h % HLL_M).alias("bucket")
    suffix = F.shiftright(h, HLL_B)
    width = 32 - HLL_B
    rank = F.when(suffix == 0, width + 1).otherwise(
        width - F.floor(F.log2(suffix.cast("double"))).cast("int"))
    regs = (df.select(F.col(group_col), bucket, rank.cast("int").alias("rank"))
            .groupBy(group_col, "bucket").agg(F.max("rank").alias("m_rank")))
    agg = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("seen"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("present_sum"))
    m = float(HLL_M)
    seen = F.col("seen").cast("double")
    denom = F.col("present_sum") + (F.lit(m) - seen)
    raw = F.lit(HLL_ALPHA * m * m) / denom
    zeros = F.lit(m) - seen
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(m) * F.log(F.lit(m) / zeros)).otherwise(raw)
    return agg.select(F.col(group_col),
                      F.col("seen").cast("long").alias("n_buckets_seen"),
                      F.round(est, 6).alias("estimate"))


def quantile_sketch_by(df: DataFrame, value_col: str, key_col: str,
                       group_col: str, k: int = QUANTILE_K) -> DataFrame:
    """Grouped portable quantile sketch: the k smallest-hash-rank (v, rk)
    rows PER GROUP — per-source/per-type distribution monitoring with the
    same bounded/mergeable/bit-reproducible contract as
    :func:`quantile_sketch`.  The rank filter compiles to WindowGroupLimit,
    so each shuffle partition keeps only k rows per group before the
    window sort — per-group work bounded, not corpus-bound (same plan
    shape as sample_per_lang_topk, plan-asserted there)."""
    from pyspark.sql import Window

    rk = _qrank(key_col)
    w = Window.partitionBy("grp").orderBy("rk", "v")
    return (df.filter(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    F.col(value_col).cast("double").alias("v"),
                    rk.alias("rk"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def quantile_estimates_by(sketch: DataFrame,
                          qs: tuple[float, ...] = (0.25, 0.5, 0.75,
                                                   0.99)) -> DataFrame:
    """(grp, q, estimate) per group: the group sample's value at 1-based
    index floor(q*(n-1))+1 in (v, rk) order.  Runs on the bounded sketch
    (<= k rows per group)."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("v", "rk")
    ranked = (sketch.select(
        "grp", "v", "rk", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n")))
    spark = sketch.sparkSession
    qdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q"))
    return (ranked.crossJoin(F.broadcast(qdf))
            .filter(F.col("rn")
                    == F.floor(F.col("q") * (F.col("n") - 1)) + 1)
            .select("grp", "q", F.col("v").alias("estimate")))


# ---------------------------------------------------------------------------
# HLL set algebra (union / intersection over register tables)
# ---------------------------------------------------------------------------

def _estimate_from_regs(regs: DataFrame) -> DataFrame:
    """One-row (n_buckets_seen, estimate) from a register table — the same
    alpha*m^2 / sum(2^-M_j) arithmetic as :func:`hll_estimate`, factored so
    merged (union) register tables can be estimated too."""
    agg = regs.agg(
        F.count(F.lit(1)).alias("seen"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_rank"))).alias("present_sum"))
    m = float(HLL_M)
    seen = F.col("seen").cast("double")
    denom = F.col("present_sum") + (F.lit(m) - seen)
    raw = F.lit(HLL_ALPHA * m * m) / denom
    zeros = F.lit(m) - seen
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(m) * F.log(F.lit(m) / zeros)).otherwise(raw)
    return agg.select(F.col("seen").cast("long").alias("n_buckets_seen"),
                      F.coalesce(F.round(est, 6), F.lit(0.0))
                      .alias("estimate"))


def hll_set_estimates(df: DataFrame, col: str, group_col: str,
                      group_a: str, group_b: str) -> DataFrame:
    """Distinct-count set algebra WITHOUT touching raw data twice: build
    per-group HLL registers once, then |A|, |B|, |A ∪ B| (per-bucket max of
    the two register tables — the standard HLL merge), and |A ∩ B| by
    inclusion-exclusion.  This is how a pipeline answers "how many users
    overlap between source A and source B?" at 100 TB: the registers are
    256 rows per group whatever the input size, so the entire set algebra
    runs on broadcast-size state after one scan + one fixed-fan-in shuffle.

    Output: one row — ``est_a, est_b, est_union, est_intersect`` (the
    intersection clamped at >= 0; inclusion-exclusion on estimates can go
    marginally negative for near-disjoint sets).
    """
    df = df.filter(F.col(col).isNotNull()
                   & F.col(group_col).isin(group_a, group_b))
    h = _hash32(F.col(col))
    bucket = (h % HLL_M).alias("bucket")
    suffix = F.shiftright(h, HLL_B)
    width = 32 - HLL_B
    rank = F.when(suffix == 0, width + 1).otherwise(
        width - F.floor(F.log2(suffix.cast("double"))).cast("int"))
    regs = (df.select(F.col(group_col).alias("grp"), bucket,
                      rank.cast("int").alias("rank"))
            .groupBy("grp", "bucket").agg(F.max("rank").alias("m_rank")))
    from localsql_spark.operators import track_persist

    # tracked so operators.cleanup() can release it — a bare persist()
    # accumulated unreleasable cached register tables per call in
    # long-lived sessions (code-review r9)
    regs = track_persist(regs)
    est_a = _estimate_from_regs(regs.filter(F.col("grp") == group_a)) \
        .select(F.col("estimate").alias("est_a"))
    est_b = _estimate_from_regs(regs.filter(F.col("grp") == group_b)) \
        .select(F.col("estimate").alias("est_b"))
    merged = (regs.groupBy("bucket").agg(F.max("m_rank").alias("m_rank")))
    est_u = _estimate_from_regs(merged) \
        .select(F.col("estimate").alias("est_union"))
    out = (est_a.crossJoin(est_b).crossJoin(est_u)
           .select("est_a", "est_b", "est_union",
                   F.round(F.greatest(
                       F.col("est_a") + F.col("est_b") - F.col("est_union"),
                       F.lit(0.0)), 6).alias("est_intersect")))
    return out


def equidepth_histogram(df: DataFrame, value_col: str, key_col: str,
                        n_buckets: int = 8,
                        k: int = QUANTILE_K) -> DataFrame:
    """Equi-depth histogram: bucket edges from the portable quantile
    sketch, then one row-local assignment + one groupBy over the full
    table -> ``(bucket, n, min_v, max_v)``.

    Scale shape: the edge table is ≤ n_buckets-1 rows (folded to ONE
    array row and broadcast), so the assignment is a row-local fold on
    the scan — the only shuffle is the n_buckets-row final groupBy.
    Values equal to an edge land in the lower bucket (strict ``v > e``
    comparison), deterministically on both engines.
    """
    sketch = quantile_sketch(df, value_col, key_col, k)
    qs = tuple(i / n_buckets for i in range(1, n_buckets))
    edges = (quantile_estimates(sketch, qs=qs)
             .agg(F.sort_array(F.collect_list("estimate")).alias("edges")))
    v = F.col(value_col).cast("double")
    bucket = F.aggregate(
        "edges", F.lit(0),
        lambda acc, e: acc + F.when(v > e, 1).otherwise(0))
    return (df.filter(v.isNotNull())
            .crossJoin(F.broadcast(edges))
            .select(bucket.alias("bucket"), v.alias("v"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("v").alias("min_v"), F.max("v").alias("max_v")))


def psi_drift(reference: DataFrame, current: DataFrame, value_col: str,
              key_col: str, n_buckets: int = 10,
              k: int = QUANTILE_K) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution — the standard production drift monitor (credit-risk
    lineage, public: PSI = sum over buckets of
    ``(p_cur - p_ref) * ln(p_cur / p_ref)``; rule of thumb < 0.1
    stable, 0.1-0.25 drifting, > 0.25 shifted).  Complements the
    engine's EXACT drift tools (fingerprint_diff localizes which rows
    changed) with the DISTRIBUTIONAL question: has the population
    moved, even if no individual row is wrong?

    Bucket edges come from the REFERENCE side's portable bottom-k
    quantile sketch (deciles by default) — the reference defines the
    binning, as PSI prescribes — then ONE row-local assignment + one
    n_buckets-row groupBy per side.  Proportions are clamped at 1e-6
    before the log (the standard empty-bucket guard, deterministic on
    both engines); per-bucket terms round to 12 and decimal-sum into
    the total, so the index is bit-reproducible cross-engine.

    Returns one row per bucket ``(bucket, p_ref, p_cur, psi_term)``
    plus the same ``psi_total`` on every row (one broadcast scalar —
    callers read it off any row; the per-bucket terms are the
    diagnosis: WHICH quantiles moved).  Scale shape: two scans, two
    bounded shuffles, never a reference-vs-current join."""
    sketch = quantile_sketch(reference, value_col, key_col, k)
    qs = tuple(i / n_buckets for i in range(1, n_buckets))
    edges = (quantile_estimates(sketch, qs=qs)
             .agg(F.sort_array(F.collect_list("estimate")).alias("edges")))
    v = F.col(value_col).cast("double")
    bucket = F.aggregate(
        "edges", F.lit(0),
        lambda acc, e: acc + F.when(v > e, 1).otherwise(0))

    def props(df: DataFrame, name: str) -> DataFrame:
        counts = (df.filter(v.isNotNull())
                  .crossJoin(F.broadcast(edges))
                  .select(bucket.alias("bucket"))
                  .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
        total = counts.agg(F.sum("n").alias("tot"))
        return (counts.crossJoin(F.broadcast(total))
                .select("bucket",
                        F.greatest(F.col("n").cast("double")
                                   / F.col("tot").cast("double"),
                                   F.lit(1e-6)).alias(name)))
    spark = reference.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    joined = (all_buckets
              .join(props(reference, "p_ref"), "bucket", "left")
              .join(props(current, "p_cur"), "bucket", "left")
              .fillna(1e-6, subset=["p_ref", "p_cur"]))
    term = F.round((F.col("p_cur") - F.col("p_ref"))
                   * F.log(F.col("p_cur") / F.col("p_ref")), 12)
    with_terms = joined.select(
        "bucket", F.round("p_ref", 12).alias("p_ref"),
        F.round("p_cur", 12).alias("p_cur"), term.alias("psi_term"))
    total = with_terms.agg(
        F.round(F.sum(F.col("psi_term").cast("decimal(28,12)"))
                .cast("double"), 6).alias("psi_total"))
    return with_terms.crossJoin(F.broadcast(total))
