"""Persisted inverted index with incremental maintenance — BM25 serving
where query cost tracks the QUERY, not the corpus.

``operators.text.bm25_scores`` builds its inverted index per call: one
full tokenize + aggregate over the corpus for every query bag.  That is
the right shape for ad-hoc analysis and the wrong one for serving — a
search tier answers thousands of queries against the same corpus.  This
module persists the index once and prices each query as a
PARTITION-PRUNED read of the probed terms' posting lists:

- ``postings``: hive-partitioned parquet ``tb = hash32(term) % n``
  carrying ``(term, doc_id, tf, dl)`` — document length DENORMALIZED
  into the posting row (the classic posting-list layout), so scoring
  never joins a corpus-sized side table.
- corpus stats (n_docs, total token length) ride as an additive counter
  row under the reserved partition ``tb = n_buckets`` (term
  ``'<STATS>'`` — tokens are lowercased, the sentinel cannot collide),
  committing atomically with the postings they describe.
- incremental maintenance (``index_add_documents``) folds a NEW batch's
  postings in: tokenize the batch only, merge by (term, doc) into the
  touched buckets via the shared staged-write + manifest-rename commit.
  Posting rows are per-(term, doc) facts, so folding new documents is
  exact; re-ingesting the same document double-counts — exactly-once is
  the caller's contract (drive from the marker-committed landing loop
  when the source can redeliver), same as every additive fold here.
- ``bm25_from_index`` reads ONLY the query terms' buckets
  (PartitionFilters) and reproduces bm25_scores' arithmetic bit-for-bit
  (exact integer tf/df/dl, one double idf expression, 12-rounded decimal
  contribution sum, decimal-rounded final score) — the registered query
  shares the from-scratch oracle, proving index-served == recomputed.

Tokenization parity trap: bm25_scores' doclen counts EVERY split token
including the empty token an empty document normalizes to — dl here is
``size(split(normalize_text(text)))`` for exactly that reason; a
"cleaner" empty-filtered count would silently shift every score.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.sinks.locks import locked_by

from localsql_spark.operators import hash32
from localsql_spark.operators.text import normalize_text

_STATS = "<STATS>"


def _validate_write(df: DataFrame, index_dir: str) -> DataFrame:
    """The shared strict fold write gate — see
    :func:`~localsql_spark.sinks.schema_evolution.gate_fold_write`."""
    from localsql_spark.sinks.schema_evolution import gate_fold_write
    return gate_fold_write(df, index_dir, "tb")


def _registered_reader(spark: SparkSession, index_dir: str) -> DataFrame:
    """The scan for a (possibly registered) index read: explicit evolved
    schema + reconcile when a registry exists (bucket vintages written
    before an evolution read back with nulls/read-defaults in the added
    columns), plain inference otherwise."""
    from localsql_spark.sinks.schema_evolution import (evolved_read_schema,
                                                       read_registry,
                                                       reconcile_frame)
    if read_registry(index_dir) is None:
        return spark.read.option("basePath", index_dir).parquet(index_dir)
    ddl = evolved_read_schema(index_dir, extra={"tb": "int"})
    df = (spark.read.schema(ddl).option("basePath", index_dir)
          .parquet(index_dir))
    return reconcile_frame(df, index_dir, keep_extra=["tb"])


def _batch_postings(docs: DataFrame, n_buckets: int, doc_id_col: str,
                    text_col: str) -> DataFrame:
    """Posting + counter rows for one document batch."""
    from localsql_spark.operators import spread

    toks_arr = F.split(normalize_text(F.col(text_col)), " ")
    base = spread(docs).select(F.col(doc_id_col).alias("doc_id"),
                               toks_arr.alias("_toks"),
                               F.size(toks_arr).alias("dl"))
    postings = (base.select("doc_id", "dl",
                            F.explode("_toks").alias("term"))
                .groupBy("term", "doc_id")
                .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
                .select("term", "doc_id", "tf", "dl",
                        F.pmod(hash32(F.col("term")), F.lit(n_buckets))
                        .cast("int").alias("tb")))
    counters = base.agg(
        F.lit(_STATS).alias("term"),
        F.lit(-1).cast("long").alias("doc_id"),
        F.count(F.lit(1)).alias("tf"),          # tf slot: n_docs delta
        F.sum("dl").alias("dl"),                # dl slot: total-length delta
        F.lit(int(n_buckets)).cast("int").alias("tb"))
    return postings.unionByName(counters)


@locked_by("index_dir")
def index_add_documents(spark: SparkSession, index_dir: str,
                        new_docs: DataFrame, n_buckets: int = 16,
                        doc_id_col: str = "doc_id",
                        text_col: str = "text") -> list:
    """Fold a NEW document batch into the persisted index.  Returns the
    rewritten ``tb`` partition values.  Cost = batch tokenization + a
    merge bounded by the touched buckets' posting lists."""
    from localsql_spark.sinks.merge import (commit_staged_partitions,
                                            read_base_partitions,
                                            recover_pending_merge)

    recover_pending_merge(index_dir)
    # validate the fold output BEFORE the stored union: on an evolved
    # registry this raises the clear strict message instead of a union
    # shape error
    delta = _validate_write(
        _batch_postings(new_docs, n_buckets, doc_id_col, text_col),
        index_dir)
    parts = [r[0] for r in delta.select("tb").distinct().collect()]
    stored = read_base_partitions(spark, index_dir, "tb", parts,
                                  mode="write")
    both = delta if stored is None else stored.unionByName(delta)
    # dl merges differently per row kind: a posting's dl is a PROPERTY of
    # the document (any fold carries the same value -> max), the STATS
    # row's dl is the ADDITIVE total-length counter (-> sum).  Using max
    # for both silently halved avgdl after the second fold.
    merged = (both.groupBy("term", "doc_id", "tb")
              .agg(F.sum("tf").alias("tf"),
                   F.max("dl").alias("_dlmax"),
                   F.sum("dl").alias("_dlsum"))
              .select("term", "doc_id",
                      F.col("tf"),
                      F.when(F.col("term") == _STATS, F.col("_dlsum"))
                      .otherwise(F.col("_dlmax")).alias("dl"),
                      "tb"))
    merged = _validate_write(merged, index_dir)

    base = Path(index_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    (merged.repartition(F.col("tb"))
     .write.mode("overwrite").partitionBy("tb")
     .parquet(str(staging)))
    commit_staged_partitions(index_dir, "tb")
    return sorted(parts)


def bm25_from_index(spark: SparkSession, index_dir: str, terms: list[str],
                    *, k1: float = 1.2, b: float = 0.75,
                    n_buckets: int = 16) -> DataFrame:
    """BM25 scores served from the persisted index: reads the STATS
    partition plus only the query terms' buckets (PartitionFilters —
    the corpus's other posting lists are never touched), then reproduces
    operators.text.bm25_scores' arithmetic exactly.  Returns
    ``(doc_id, score)`` for documents matching at least one term."""
    from localsql_spark.sinks.merge import recover_pending_merge

    recover_pending_merge(index_dir)
    df = _registered_reader(spark, index_dir)
    # term -> bucket is driver-side arithmetic over the (tiny) query bag;
    # the isin filter reaches the scan as a partition filter
    import hashlib
    tbs = sorted({int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                  % n_buckets for t in terms})
    stats_row = (df.filter(F.col("tb") == n_buckets)
                 .agg(F.sum("tf").alias("n_docs"),
                      (F.sum("dl").cast("double")
                       / F.sum("tf")).alias("avgdl")))
    tf = (df.filter(F.col("tb").isin(tbs) & F.col("term").isin(terms))
          .select("term", "doc_id", "tf", "dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = F.col("n_docs").cast("double")
    idf = F.log((n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = (idf * F.col("tf") * (k1 + 1)
               / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                      / F.col("avgdl"))))
    return (tf.join(F.broadcast(df_), "term")
            .crossJoin(F.broadcast(stats_row))
            .groupBy("doc_id")
            .agg(F.round(F.sum(F.round(contrib, 12).cast("decimal(28,12)")),
                         9).cast("double").alias("score")))


@locked_by("index_dir")
def index_erase_documents(spark: SparkSession, index_dir: str,
                          keys: DataFrame, n_buckets: int = 16,
                          docs: DataFrame | None = None,
                          doc_id_col: str = "doc_id",
                          text_col: str = "text") -> list:
    """Right-to-be-forgotten PROPAGATION into the inverted index: remove
    every posting of the erased documents and decrement the corpus
    counters, so a post-erasure :func:`bm25_from_index` probe is
    bit-identical to an index built from scratch on the erased corpus
    (erasing the primary store alone would leave the subjects' content
    fully reconstructible from their posting lists).

    ``keys`` is a one-column DataFrame of erased doc ids.  ``docs``
    (optional) carries the erased documents' TEXT — when the erasure
    request still has it (the normal flow: propagate BEFORE erasing the
    primary store), the touched term buckets are computed from the
    documents' own tokens and the read is partition-pruned to them; a
    text-less request (store already erased) must pass over all buckets,
    still one pruned-width columnar pass of postings, never a corpus
    re-tokenize.

    Counter handling: the STATS partition rewrites with n_docs and
    total-length decremented by the erased documents actually PRESENT in
    the index (absent keys contribute nothing — idempotent re-runs are
    no-ops).  Commit is the shared staged-write + manifest protocol; a
    bucket whose every posting was erased is committed as an explicit
    removal.  Returns the rewritten ``tb`` values (stats bucket
    included)."""
    from localsql_spark.sinks.merge import (commit_staged_partitions,
                                            read_base_partitions,
                                            recover_pending_merge)

    recover_pending_merge(index_dir)
    from localsql_spark.sinks.erase import normalize_erase_keys
    k = normalize_erase_keys(keys)
    if docs is not None:
        touched = sorted({r[0] for r in (
            docs.join(F.broadcast(k),
                      F.col(doc_id_col) == F.col("_erase_key"), "semi")
            .select(F.explode(F.split(normalize_text(F.col(text_col)),
                                      " ")).alias("term"))
            .select(F.pmod(hash32(F.col("term")), F.lit(n_buckets))
                    .cast("int").alias("tb")).distinct().collect())})
    else:
        touched = list(range(n_buckets))
    touched = touched + [n_buckets]  # counters always rewrite with postings
    stored = read_base_partitions(spark, index_dir, "tb", touched,
                                  mode="write")
    if stored is None:
        return []
    stats = stored.filter(F.col("tb") == n_buckets)
    posts = stored.filter(F.col("tb") != n_buckets)
    # per-doc length of the erased docs that are ACTUALLY in the index
    # (dl is a per-doc property denormalized onto each posting -> max);
    # two scalars, collected once
    gone = (posts.join(F.broadcast(k),
                       F.col("doc_id") == F.col("_erase_key"), "semi")
            .groupBy("doc_id").agg(F.max("dl").alias("dl"))
            .agg(F.count(F.lit(1)).alias("nd"),
                 F.coalesce(F.sum("dl"), F.lit(0)).alias("dlsum"))
            .first())
    kept_posts = posts.join(F.broadcast(k),
                            F.col("doc_id") == F.col("_erase_key"),
                            "left_anti")
    new_stats = stats.agg(
        F.lit(_STATS).alias("term"),
        F.lit(-1).cast("long").alias("doc_id"),
        (F.sum("tf") - F.lit(int(gone["nd"]))).alias("tf"),
        (F.sum("dl") - F.lit(int(gone["dlsum"]))).alias("dl"),
        F.lit(int(n_buckets)).cast("int").alias("tb"))
    # allowMissingColumns: on an evolved registered index kept_posts
    # carries the evolved columns and the 5-column stats aggregate pads
    # NULL — erasure must work across the boundary, not raise a raw
    # union shape error (review round 13); _validate_write then
    # conforms/validates the merged frame
    merged = _validate_write(
        kept_posts.unionByName(new_stats, allowMissingColumns=True),
        index_dir)

    base = Path(index_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    (merged.repartition(F.col("tb"))
     .write.mode("overwrite").partitionBy("tb")
     .parquet(str(staging)))
    # tb is an int partition value — Python and Spark path-encode it
    # identically, so emptied buckets commit as removals by name
    commit_staged_partitions(index_dir, "tb",
                             [f"tb={t}" for t in touched])
    return sorted(touched)
