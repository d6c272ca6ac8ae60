"""Sketch-valued incremental view: per-group corpus n-gram diversity
maintained as mergeable HLL registers — the Druid/Pinot pattern of
storing a SKETCH as view state where the exact aggregate is not
algebraic.

Why: ``corpus_bigram_diversity``'s distinct-n-gram count is NOT
mergeable (count-distinct over a fold needs the full value set), so the
exact audit cannot ride the incremental-rollup machinery — every refresh
re-reads the corpus.  The portable HLL's register table IS mergeable
(per-bucket max), so the approximate audit folds forward per batch:
state per group is <= HLL_M register rows + one counter row, and fold
cost tracks the batch, never corpus history.  Because the HLL here is
deterministic portable arithmetic (operators.sketches), the folded
sketch — and therefore the estimate — is BIT-IDENTICAL to a single
full-corpus sketch, which is exactly what the registered query's
full-corpus oracle checks: an *exact* gate on an *approximate* view.

State layout: hive-partitioned parquet ``gb=<hash bucket>`` (the
group's 16-way portable hash; NULL groups take the reserved bucket 16)
with rows ``(grp, bucket, m_rank, total_ngrams, n_docs)`` — register
rows carry ``bucket >= 0`` and ``m_rank`` (merge = max, idempotent);
the single counter row per group carries ``bucket = -1`` with the
additive totals (merge = sum, NOT idempotent — exactly-once is the
caller's contract, same as every additive fold here; drive from a
marker-committed landing loop when the source can redeliver).  Commits
are the shared staged-write + manifest-rename protocol (sinks.merge)
so a crashed fold heals on the next call.

Partitioning on the HASH of the group rather than the group value
itself (round-9 review fix) closes two hive-partition-value hazards at
once: a NULL group's partition could never be read back by the isin()
prune (the staged dir then REPLACED the stored one — registers and
counters silently reset every batch), and numeric-looking group names
('1.50', '001') round-trip through hive partition-type inference as
numbers, forking one group across two partitions.  An int bucket
column has neither problem, and ``grp`` survives as an ordinary typed
data column.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.sinks.locks import locked_by

from localsql_spark.operators.sketches import HLL_ALPHA, HLL_B, HLL_M


def _group_registers(grams: DataFrame, group_col: str = "source") \
        -> DataFrame:
    """Per-group HLL register rows ``(grp, bucket, m_rank)`` over the
    n-gram stream — operators.sketches.hll_buckets, grouped."""
    from localsql_spark.operators import hash32

    h = hash32(F.col("g"))
    width = 32 - HLL_B
    suffix = F.shiftright(h, HLL_B)
    rank = F.when(suffix == 0, width + 1).otherwise(
        width - F.floor(F.log2(suffix.cast("double"))).cast("int"))
    return (grams.select(F.col(group_col).alias("grp"),
                         (h % HLL_M).cast("int").alias("bucket"),
                         rank.cast("int").alias("rank"))
            .groupBy("grp", "bucket").agg(F.max("rank").alias("m_rank")))


@locked_by("view_dir")
def sketch_view_update(spark: SparkSession, view_dir: str,
                       new_docs: DataFrame, n: int = 2,
                       group_col: str = "source",
                       text_col: str = "text") -> list:
    """Fold a document batch into the persisted diversity view.  Returns
    the rewritten ``gb`` (group hash-bucket) partition values.  Fold cost
    = batch n-gram stream + a (groups x <= HLL_M)-row merge; history
    contributes only its bounded register table."""
    from localsql_spark.operators.corpus import ngram_stream
    from localsql_spark.sinks.merge import (read_base_partitions,
                                            recover_pending_merge)

    recover_pending_merge(view_dir)
    grams = ngram_stream(new_docs, n=n, group_col=group_col,
                         text_col=text_col)
    regs = (_group_registers(grams, group_col)
            .select("grp", "bucket", "m_rank",
                    F.lit(None).cast("long").alias("total_ngrams"),
                    F.lit(None).cast("long").alias("n_docs")))
    nd = (new_docs.groupBy(F.col(group_col).alias("grp"))
          .agg(F.count(F.lit(1)).alias("n_docs")))
    tg = (grams.groupBy(F.col(group_col).alias("_g2"))
          .agg(F.count(F.lit(1)).alias("total_ngrams")))
    # eqNullSafe: a NULL group is a legitimate aggregation key, and a
    # plain equi-join would silently zero its n-gram totals every fold
    counters = (nd.join(tg, nd["grp"].eqNullSafe(tg["_g2"]), "left")
                .select("grp", F.lit(-1).cast("int").alias("bucket"),
                        F.lit(None).cast("int").alias("m_rank"),
                        F.coalesce("total_ngrams", F.lit(0))
                        .alias("total_ngrams"), "n_docs"))
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.merge import commit_staged_partitions

    gb = F.coalesce(F.pmod(hash32(F.col("grp").cast("string")), F.lit(16)),
                    F.lit(16)).cast("int")
    # localCheckpoint: the delta is consumed twice (bucket collect +
    # merge write) — a re-evaluating source could otherwise stage a
    # bucket absent from the collected list, replacing its stored rows
    # unmerged; and the n-gram explode+aggregate runs once, not twice
    delta = regs.unionByName(counters).withColumn("gb", gb)
    # validate BEFORE the stored union (clear strict message on an
    # evolved registry instead of a union shape error)
    from localsql_spark.sinks.schema_evolution import gate_fold_write
    delta = gate_fold_write(delta, view_dir, "gb")
    delta = delta.localCheckpoint(eager=True)
    parts = [r[0] for r in delta.select("gb").distinct().collect()]
    stored = read_base_partitions(spark, view_dir, "gb", parts,
                                  mode="write")
    both = delta if stored is None else stored.unionByName(delta)
    merged = (both.groupBy("grp", "gb", "bucket")
              .agg(F.max("m_rank").alias("m_rank"),
                   F.sum("total_ngrams").alias("total_ngrams"),
                   F.sum("n_docs").alias("n_docs")))
    # schema-registered view: the same strict fold write gate as
    # rollup/IVM/inverted-index (a fold output missing an evolved
    # column raises instead of NULL-overwriting stored values)
    merged = gate_fold_write(merged, view_dir, "gb")

    base = Path(view_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    (merged.repartition(F.col("gb"))
     .write.mode("overwrite").partitionBy("gb")
     .parquet(str(staging)))
    commit_staged_partitions(view_dir, "gb")
    return parts


def sketch_view_read(spark: SparkSession, view_dir: str,
                     group_col: str = "source") -> DataFrame:
    """Per-group diversity estimate from the persisted registers:
    ``(group_col, n_docs, total_ngrams, n_buckets_seen, approx_distinct,
    ttr_approx)``.  The estimate arithmetic is the portable HLL formula
    (linear-counting small-range correction), identical in the DuckDB
    oracle.  Heals any crashed fold first."""
    from localsql_spark.sinks.merge import recover_pending_merge
    from localsql_spark.sinks.schema_evolution import (evolved_read_schema,
                                                       read_registry,
                                                       reconcile_frame,
                                                       registered_partition)

    recover_pending_merge(view_dir)
    if read_registry(view_dir) is None:
        df = spark.read.option("basePath", view_dir).parquet(view_dir)
    else:  # registered view: reconcile every partition vintage
        part = registered_partition(view_dir) or ("gb", "int")
        ddl = evolved_read_schema(view_dir, extra={part[0]: part[1]})
        df = reconcile_frame(
            spark.read.schema(ddl).option("basePath", view_dir)
            .parquet(view_dir), view_dir, keep_extra=[part[0]])
    regs = df.filter(F.col("bucket") >= 0)
    counters = (df.filter(F.col("bucket") == -1)
                .select("grp", "total_ngrams", "n_docs"))
    m = float(HLL_M)
    agg = (regs.groupBy("grp")
           .agg(F.count(F.lit(1)).alias("seen"),
                F.sum(F.pow(F.lit(2.0), -F.col("m_rank")))
                .alias("present_sum")))
    seen = F.col("seen").cast("double")
    raw = F.lit(HLL_ALPHA * m * m) / (F.col("present_sum") + (F.lit(m) - seen))
    zeros = F.lit(m) - seen
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(m) * F.log(F.lit(m) / zeros)).otherwise(raw)
    est6 = F.coalesce(F.round(est, 6), F.lit(0.0))
    agg = agg.withColumnRenamed("grp", "_g2")
    # eqNullSafe: the NULL group's registers must join its counter row
    out = (counters.join(agg, counters["grp"].eqNullSafe(agg["_g2"]),
                         "left")
           .select(F.col("grp").alias(group_col),
                   "n_docs", "total_ngrams",
                   F.coalesce(F.col("seen"), F.lit(0)).cast("long")
                   .alias("n_buckets_seen"),
                   est6.alias("approx_distinct"),
                   F.round(F.when(F.col("total_ngrams") > 0,
                                  est6 / F.col("total_ngrams"))
                           .otherwise(F.lit(0.0)), 9).alias("ttr_approx")))
    return out
