"""Deterministic training-shard export: the last hop of a training-data
pipeline — turn a cleaned corpus into N content-addressed shards whose
assignment, internal order, and manifest are bit-reproducible across runs
and cluster sizes.

Why deterministic: training jobs consume shards round-robin across data-
parallel workers; a re-export after a pipeline fix must produce the SAME
document->shard mapping and order, or the training run's data order (and
any resume-from-step state) silently changes.  Spark's default write order
is nondeterministic (task scheduling), so both the shard id and the
within-shard order come from the portable content hash, never from
partition layout or ``rand()``.

The reference has no persistence at all (table lifetime = process,
reference: localsql/localsql.py:31); this is a pure scale extension, the
export twin of :mod:`localsql_spark.sinks.layout`.

Scale shape: one hash-key shuffle (``repartition(n_shards, shard_id)``) +
an in-partition sort — exactly the cost of any bucketed write.  The global
"shuffle" of the corpus (in the training-data sense: decorrelate adjacent
documents) is free: the shard hash and the order hash are independent of
source layout, so consecutive source documents scatter across shards and
positions.  The manifest is one bounded aggregation (n_shards rows).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators import hash32


def shard_assignment(df: DataFrame, n_shards: int, *,
                     id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Add ``shard_id`` (hash-mod bucket of ``id || seed``) and ``ord_key``
    (an independent hash) — the deterministic global-shuffle coordinates.
    Changing ``seed`` re-deals both wholesale; no RNG state anywhere."""
    sid = F.concat(F.col(id_col).cast("string"), F.lit(f"#s{seed}"))
    oid = F.concat(F.col(id_col).cast("string"), F.lit(f"#o{seed}"))
    return (df.withColumn("shard_id",
                          F.pmod(hash32(sid), F.lit(n_shards)).cast("int"))
            .withColumn("ord_key", hash32(oid)))


def write_training_shards(df: DataFrame, path: str | Path, n_shards: int, *,
                          id_col: str = "doc_id", seed: int = 0) -> None:
    """Write ``shard_id=K/`` parquet directories, one file per shard, rows
    in ``(ord_key, id)`` order — the deterministic training-ready layout.

    ``repartition(n_shards, shard_id)`` co-locates each shard's rows, the
    within-partition sort fixes file order, and ``partitionBy`` names the
    directories.  On a 1000-executor cluster each shard is one task; skew
    is impossible by construction (hash-uniform assignment).
    """
    out = shard_assignment(df, n_shards, id_col=id_col, seed=seed)
    (out.repartition(n_shards, F.col("shard_id"))
     .sortWithinPartitions("shard_id", "ord_key", id_col)
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(str(path)))


def shard_manifest(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-shard manifest over a sharded frame (either pre-write or read
    back from :func:`write_training_shards` output): row count, token
    count, and an order-insensitive content hash (DECIMAL sum of per-row
    ``hash32(id || md5(text))`` — overflow-proof, mergeable across partial
    aggregates; surfaced as VARCHAR because a 38-digit decimal exceeds both
    engines' 64-bit integer output paths, same as operators.fingerprint).

    Re-running the export and diffing manifests is the cheap "did anything
    change" audit: n_shards rows regardless of corpus size.
    """
    row_h = hash32(F.concat(F.col(id_col).cast("string"), F.lit("|"),
                            F.md5(F.col(text_col))))
    return (df.groupBy(F.col("shard_id").cast("int").alias("shard_id"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.size(F.split(F.col(text_col), r"\s+")))
                 .alias("n_tokens"),
                 F.sum(row_h.cast("decimal(38,0)")).cast("string")
                 .alias("content_hash")))


def read_training_shards(spark: SparkSession, path: str | Path) -> DataFrame:
    """Read a sharded export back; ``shard_id`` is recovered from the
    directory layout and filters on it prune whole shards at planning
    time (one shard = one partition directory)."""
    return spark.read.parquet(str(path))


def curriculum_shard_assignment(df: DataFrame, n_shards: int, *,
                                score_col: str = "score",
                                id_col: str = "doc_id") -> DataFrame:
    """Curriculum sharding: exact rank-based buckets over a difficulty /
    quality score — shard 0 holds the lowest-scored ~N/n docs, shard n-1
    the highest, sizes exact to +-1 (a true ntile, not a sampled
    repartitionByRange whose boundaries change run to run).

    Scale shape — exact global rank WITHOUT a corpus-sized window: the
    sort key is (score, tie, id) with tie = hash32(id || '#c') so equal
    scores spread uniformly; ranks come from a two-level scheme:

    1. count rows per (score, coarse 2^16 tie bucket) — a bounded
       aggregate (<= distinct_scores x 65536 rows, corpus-INDEPENDENT);
    2. one window cumsum over that bounded table -> each group's rank
       offset (driver never sees it; it broadcasts back);
    3. row_number within each (score, bucket) group ordered by (tie, id)
       — groups are ~N/(scores x 65536), balanced by hash uniformity, so
       no skewed window partition at any corpus size.

    global_rank = offset + within_rank; shard = floor((rank-1)*n/N).
    Deterministic end-to-end; the DuckDB oracle replays it as a plain
    row_number() ntile, proving the bounded two-level rank == the global
    sort rank.  Returns (id, score, shard_id)."""
    from pyspark.sql import Window

    tie = hash32(F.concat(F.col(id_col).cast("string"), F.lit("#c")))
    keyed = df.select(F.col(id_col), F.col(score_col).alias("score"),
                      tie.alias("tie"),
                      F.shiftright(tie, 16).cast("int").alias("tb"))
    counts = keyed.groupBy("score", "tb").agg(
        F.count(F.lit(1)).alias("cnt"))
    w_cum = (Window.orderBy("score", "tb")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "score", "tb",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("offset"),
        F.sum("cnt").over(Window.partitionBy()).alias("n_total"))
    w_in = Window.partitionBy("score", "tb").orderBy("tie", id_col)
    ranked = (keyed.join(F.broadcast(offsets), ["score", "tb"])
              .withColumn("rnk",
                          F.col("offset") + F.row_number().over(w_in)))
    # integer division, not floor(double): exact at any N
    shard = F.expr(f"CAST(((rnk - 1) * {n_shards}) DIV n_total AS INT)")
    return ranked.select(id_col, "score", shard.alias("shard_id"))


def write_curriculum_shards(df: DataFrame, path: str | Path,
                            n_shards: int, *, score_col: str = "score",
                            id_col: str = "doc_id") -> None:
    """Materialize the curriculum layout: ``shard_id=K/`` directories in
    ascending difficulty, rows inside each shard in (score, tie, id)
    order — a training loop reading shards 0..n-1 sequentially gets the
    easy-to-hard curriculum; one hash-key shuffle + in-partition sort,
    same write cost as write_training_shards."""
    assigned = curriculum_shard_assignment(df, n_shards,
                                           score_col=score_col,
                                           id_col=id_col)
    out = df.join(assigned.select(id_col, "shard_id"), id_col)
    tie = hash32(F.concat(F.col(id_col).cast("string"), F.lit("#c")))
    (out.withColumn("_tie", tie)
     .repartition(n_shards, F.col("shard_id"))
     .sortWithinPartitions("shard_id", score_col, "_tie", id_col)
     .drop("_tie")
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(str(path)))
