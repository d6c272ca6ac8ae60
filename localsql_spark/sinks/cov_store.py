"""Incrementally-maintained covariance store for an embedding corpus.

PCA's input — the dim x dim covariance — decomposes into PURELY ADDITIVE
sufficient statistics: n, per-dimension sums, and per-pair product sums.
Stored as exact DECIMALs (each product rounded to 12 decimals first, the
package-wide portable-float discipline), the partials of two batches ADD
to the partials of their union bit-for-bit — so the daily loop never
re-reads the corpus: fold today's batch (one batch-sized pass), re-derive
the matrix from model-sized state, re-run power iteration.  This is the
Gupta-Mumick view-maintenance idea applied to second-moment state, the
same contract as the NB model store's additive counts
(`operators/selection.py:nb_model_update`).

Layout rides `streaming/batch_dirs.py`: each fold lands
``<store>/batch_<id>`` (overwrite-idempotent — checkpoint redelivery
rewrites the same bytes; a batch already folded into a compacted
generation is skipped by the ``superseded`` gate), and
:func:`localsql_spark.streaming.batch_dirs.compact_batches` bounds the
dir count.  Compaction is CONTENT-PRESERVING (rows concatenate); the
read side sums partials anyway, so fold order, compaction timing, and
crash replay can never change the derived matrix.  RTBF retractions
land in a separate ``erase_<request_id>`` namespace (first write wins)
so no ingest batch id can ever collide with — and overwrite — a
retraction.

Row encoding (one narrow table): ``(j, k, s)`` with
``j >= 0, k >= 0`` = pair product sums; ``k = -1`` = per-dimension sums;
``j = -1, k = -1`` = the row count.  dim^2 + dim + 1 rows per batch —
model-sized whatever the corpus.

At 100 TB: per-day cost is the new batch's dim^2-per-row expand (the
same map-side-combined fold `covariance_matrix` does, batch-sized), a
model-sized append, and a model-sized read — the full-corpus recompute
is gone, and the incremental == full identity is EXACT, not approximate
(proven by the shared oracle in the registered probe).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEC = "decimal(38,12)"


def cov_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One batch's sufficient statistics as the narrow (j, k, s) table.
    Same product-rounding points as
    :func:`localsql_spark.operators.similarity.covariance_matrix`, but
    the sums STAY decimal — exactness across folds is the whole point.

    Since optimization round 14 the fold is
    :func:`localsql_spark.operators.similarity.cov_sums_exact_arrow`
    (bit-identical integer fixed-point image, one batch pass instead of
    three); the relational expand survives below as
    :func:`cov_partials_relational` for the equivalence test."""
    from localsql_spark.operators.similarity import cov_sums_exact_arrow

    return cov_sums_exact_arrow(df, vec_col, dec=_DEC)


def cov_partials_relational(df: DataFrame,
                            vec_col: str = "embedding") -> DataFrame:
    """The original in-plan dim^2-per-row expand — the equivalence
    reference the Arrow integer fold must match bit-for-bit."""
    from localsql_spark.operators import spread

    df = spread(df)
    e1 = df.select(F.col(vec_col).alias("__v"),
                   F.posexplode(F.col(vec_col)).alias("j", "x"))
    pair_sums = (e1.select("j", F.col("x").cast("double").alias("x"),
                           F.posexplode(F.col("__v")).alias("k", "y"))
                 .groupBy("j", "k")
                 .agg(F.sum(F.round(F.col("x") * F.col("y").cast("double"),
                                    12).cast(_DEC)).cast(_DEC).alias("s")))
    dim_sums = (e1.groupBy("j")
                .agg(F.sum(F.round(F.col("x").cast("double"), 12)
                           .cast(_DEC)).cast(_DEC).alias("s"))
                .select("j", F.lit(-1).alias("k"), "s"))
    n_row = df.agg(F.count(F.lit(1)).cast(_DEC).alias("s")).select(
        F.lit(-1).alias("j"), F.lit(-1).alias("k"), "s")
    return pair_sums.unionByName(dim_sums).unionByName(n_row)


def cov_store_fold(spark: SparkSession, store_dir: str, batch: DataFrame,
                   batch_id: int, vec_col: str = "embedding",
                   ledger_dir: str | None = None,
                   key_col: str = "vec_id") -> bool:
    """Fold one ingest batch's partials into the store.  Idempotent
    per-batch overwrite dir; a batch already inside a compacted
    generation is skipped (``superseded``).  ``ledger_dir`` applies the
    erase-ledger contract before anything is summed — a late-landing
    batch can never fold an erased subject's contribution in.  Returns
    False when the batch id was superseded (nothing written)."""
    from localsql_spark.sinks.erase import filter_erased
    from localsql_spark.streaming.batch_dirs import superseded

    root = Path(store_dir)
    if root.exists() and superseded(store_dir, batch_id):
        return False
    root.mkdir(parents=True, exist_ok=True)
    batch = filter_erased(batch, ledger_dir, key_col)
    (cov_partials(batch, vec_col).coalesce(1)
     .write.mode("overwrite").parquet(str(root / f"batch_{batch_id}")))
    return True


def cov_from_store(spark: SparkSession,
                   store_dir: str) -> DataFrame | None:
    """Re-derive the (j, k, cov) matrix from the summed partials —
    bit-identical to
    :func:`localsql_spark.operators.similarity.covariance_matrix` over
    the union of all folded batches (exact decimal addition is
    associative and commutative; the double casts and 12-decimal
    roundings happen HERE, at the same points the one-shot operator
    applies them).  Model-sized read: dim^2 + dim + 1 rows per live
    part.  Returns None for an absent or empty store (nothing folded
    yet) instead of an unreadable-path error — the read_erase_ledger
    contract."""
    from localsql_spark.streaming.batch_dirs import _live_parts, read_batches

    root = Path(store_dir)
    if not root.exists():
        return None
    gen, batches = _live_parts(store_dir)
    if gen is None and not any((b / "_SUCCESS").exists() for b in batches):
        return None
    parts = read_batches(spark, store_dir)
    # retractions live in their own erase_<id> namespace (see
    # cov_store_erase) — summed alongside, never compacted over
    erases = sorted(p for p in root.glob("erase_*")
                    if (p / "_SUCCESS").exists())
    if erases:
        parts = parts.unionByName(
            spark.read.parquet(*[str(p) for p in erases]))
    tot = (parts.groupBy("j", "k")
           .agg(F.sum(F.col("s").cast(_DEC)).cast(_DEC).alias("s")))
    n_val = F.col("n_s").cast("double")
    # a fully-retracted store sums n to 0: the matrix is undefined over
    # zero rows — emit NO rows rather than raise DIVIDE_BY_ZERO under
    # Spark 4's default ANSI mode
    n_row = (tot.filter((F.col("j") == -1) & (F.col("k") == -1))
             .select(F.col("s").alias("n_s"))
             .filter(F.col("n_s") != 0))
    means = (tot.filter((F.col("k") == -1) & (F.col("j") >= 0))
             .crossJoin(F.broadcast(n_row))
             .select("j", F.round(F.col("s").cast("double") / n_val, 12)
                     .alias("mean")))
    pairs = (tot.filter(F.col("k") >= 0)
             .crossJoin(F.broadcast(n_row))
             .select("j", "k",
                     (F.col("s").cast("double")).alias("sxy"), "n_s"))
    mj = means.select(F.col("j"), F.col("mean").alias("mean_j"))
    mk = means.select(F.col("j").alias("k"), F.col("mean").alias("mean_k"))
    return (pairs.join(mj, "j").join(mk, "k")
            .select("j", "k",
                    F.round(F.round(F.col("sxy") / F.col("n_s")
                                    .cast("double"), 12)
                            - F.col("mean_j") * F.col("mean_k"), 12)
                    .alias("cov")))


def cov_store_erase(spark: SparkSession, store_dir: str,
                    subject_rows: DataFrame, batch_id: int,
                    vec_col: str = "embedding") -> bool:
    """Right-to-be-forgotten retraction: fold the subjects' NEGATIVE
    partials (second-moment sums are exactly invertible — the same
    Gupta-Mumick negative delta `erase_from_rollup` applies to
    decimal sums, unlike the NB counts' retrain-only policy).
    ``subject_rows`` is the subjects' vectors read PRE-erase from the
    primary store (the rollup-erase contract: retract before the
    source rows disappear).  Post-retraction,
    :func:`cov_from_store` == a store that never saw the subjects,
    bit-for-bit.

    Retractions land in their OWN ``erase_<id>`` namespace, NOT the
    ingest stream's ``batch_<id>`` space: sharing it would let a later
    stream micro-batch with the same id overwrite the retraction (the
    batch dirs are overwrite-idempotent by design), silently
    resurrecting the subjects' contributions — and a compaction could
    mark the id superseded and drop the retraction outright.
    ``batch_id`` here is the DELETION REQUEST's id.  A request id that
    already landed is SKIPPED, never rewritten (first write wins):
    recomputing it after the primary erase would find no subjects and
    overwrite the real retraction with zeros — the rollup-erase
    re-run hazard, enforced structurally here.  Returns False if the
    request had already landed."""
    root = Path(store_dir)
    edir = root / f"erase_{batch_id}"
    if (edir / "_SUCCESS").exists():
        return False  # request already applied; inputs may have changed
    root.mkdir(parents=True, exist_ok=True)
    neg = cov_partials(subject_rows, vec_col) \
        .select("j", "k", (-F.col("s")).cast(_DEC).alias("s"))
    neg.coalesce(1).write.mode("overwrite").parquet(str(edir))
    return True
