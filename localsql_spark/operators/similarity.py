"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; sign-bucket LSH as the scale
path.  Beyond the reference's surface (it has no vector operations at all);
part of the training-data-pipeline extension set.

Scale design:
- queries are broadcast (small side), the corpus is never collected;
- the dot product is a row-local ``zip_with``+``aggregate`` higher-order
  expression — JVM-side, no Python, no shuffle;
- top-k per query is a windowed row_number over a shuffle on query_id (k
  rows per query per partition survive the partial TakeOrdered);
- the LSH variant buckets both sides by the sign pattern of the leading
  components (axis-aligned random-hyperplane LSH) so each query only scans
  its bucket — the join is equi on the bucket key and Catalyst shuffles
  corpus-side once, instead of a full cross product.

Determinism (for the DuckDB oracle): per-element products are rounded to 12
decimals and summed as DECIMAL, so reduction order cannot change the result;
the final cosine is one double division, rounded to 9.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from localsql_spark.operators import spread

_DEC = "decimal(28,12)"


def _dec_sum(arr: Column) -> Column:
    """Exact (order-insensitive) sum of an array<double>: round each element
    to 12 decimals, accumulate as decimal, emit double.  The post-add cast
    pins the accumulator type (Spark widens decimal addition to (38,11),
    which would drift the lambda's type); values here are <<1e15 so the
    recast is lossless."""
    return F.aggregate(
        arr,
        F.lit(0).cast(_DEC),
        lambda acc, x: (acc + F.round(x, 12).cast(_DEC)).cast(_DEC),
    ).cast("double")


def dot(a: Column, b: Column) -> Column:
    return _dec_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_dec_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), 9)


def sign_bucket(a: Column, bits: int = 8) -> Column:
    """Axis-aligned LSH bucket: sign pattern of the first ``bits`` components
    packed into an int.  Deterministic and oracle-expressible."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(a, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out.cast("int")


def knn_brute_force(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast queries x scan corpus -> window top-k.
    Returns (query_id, neighbor_id, cos_sim) excluding self-matches."""
    from pyspark.sql.window import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rn"))


def knn_lsh_bucketed(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     bits: int = 8) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.
    Same output shape as knn_brute_force; recall trades off with ``bits``."""
    from pyspark.sql.window import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       sign_bucket(F.col(vec_col), bits).alias("bucket"))
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                                sign_bucket(F.col(vec_col), bits).alias("bucket"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rn"))


def knn_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_cells: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF (inverted-file) approximate kNN: coarse-quantize the corpus into
    ``n_cells`` cells, probe the ``n_probe`` cells nearest each query.

    Index build = one pass assigning every vector to its nearest centroid
    (broadcast centroids); search = probe-cell equi-join instead of a full
    scan, so each query touches ~n_probe/n_cells of the corpus. Centroids
    here are deterministic seed vectors (vec_id < n_cells) rather than
    k-means iterates, keeping the whole structure oracle-expressible; on a
    real deployment swap in trained centroids — the plan shape is identical.
    """
    from pyspark.sql.window import Window

    cents = (corpus.filter(F.col(id_col) < n_cells)
             .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cent")))

    def nearest_cells(df: DataFrame, side_id: str, vec: str, n: int) -> DataFrame:
        """Attach the n nearest cell ids (by cosine to centroid)."""
        w = Window.partitionBy(side_id).orderBy(
            F.col("__csim").desc(), F.col("cell"))
        return (df.crossJoin(F.broadcast(cents))
                .withColumn("__csim", cosine(F.col(vec), F.col("cent")))
                .withColumn("__crn", F.row_number().over(w))
                .filter(F.col("__crn") <= n)
                .drop("cent", "__csim", "__crn"))

    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                              F.col(vec_col).alias("cv"))
    c_cells = nearest_cells(c, "neighbor_id", "cv", 1)  # index: 1 cell/vector
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    q_cells = nearest_cells(q, "query_id", "qv", n_probe)

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (c_cells.join(F.broadcast(q_cells), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id",
                    cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rn"))


def embedding_near_dup_pairs(corpus: DataFrame, threshold: float = 0.9,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             bits: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-bucket blocking:
    pairs within a bucket with cosine >= threshold.  High-cosine pairs agree
    on leading signs with high probability, so the bucket join replaces the
    O(n²) cross product. Returns (vec_a, vec_b, cos_sim)."""
    corpus = spread(corpus)
    c1 = corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
                       sign_bucket(F.col(vec_col), bits).alias("bucket"))
    c2 = corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
                       sign_bucket(F.col(vec_col), bits).alias("bucket"))
    return (c1.join(c2, "bucket")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))
