"""Key erasure from a hash-bucketed parquet store — the
right-to-be-forgotten operation a data platform must run against every
persisted table, shaped so its cost tracks the DELETION REQUEST, not the
store.

The store partitions on ``kb = pmod(hash32(key), n_buckets)`` (the same
portable hash the rest of the engine uses), which is what makes erasure
scale: the touched-partition set is computed FROM THE KEYS ALONE — one
tiny aggregate over the deletion request, never a scan of the store —
and only those buckets are read (partition-pruned), anti-joined against
the broadcast key set, and rewritten through the shared staged-write +
manifest-rename commit (sinks.merge): one rename is the commit point, a
crashed erase heals on the next call, and at every crash point a reader
sees either the full old state or the full new state of each bucket.

Contrast with the transactional-format alternative (Delta/Iceberg
deletion vectors): those defer the rewrite by masking row ids at read
time; this module is the eager rewrite — simpler invariants (the bytes
are GONE at commit, which is what an erasure obligation usually means),
same touched-partition cost bound.

At 100 TB: a deletion request of K keys touches at most min(K, n_buckets)
partitions; each rewrite is one bucket's rows anti-joined against a
broadcast key set (the request is always broadcastable).  A store
partitioned by something else (date, source) cannot bound erasure below
a full scan — which is exactly why user-keyed stores bucket on the user.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators import hash32


def normalize_erase_keys(keys: DataFrame) -> DataFrame:
    """Canonical deletion-request frame shared by every erase path: the
    FIRST column of ``keys``, null-dropped and distinct, as
    ``_erase_key``.  Idempotent (normalizing an already-normalized frame
    is a no-op plan), so composed flows can normalize once and pass the
    result through."""
    return (keys.select(F.col(keys.columns[0]).alias("_erase_key"))
            .filter(F.col("_erase_key").isNotNull()).distinct())


def bucket_of(key_col, n_buckets: int):
    """The store's bucket expression — shared by writer and eraser so the
    two can never disagree about where a key lives."""
    return F.pmod(hash32(key_col), F.lit(n_buckets)).cast("int")


def write_bucketed_store(df: DataFrame, base_dir: str, key_col: str,
                         n_buckets: int = 32) -> None:
    """Materialize a key-bucketed store: hive-partitioned on
    ``kb = hash(key) % n_buckets``.  One shuffle on the bucket key —
    the explicit repartition matters: partitionBy alone leaves every
    upstream task writing a sliver into every bucket (files-per-bucket
    = writer parallelism), and the per-file open cost then makes a
    request-pruned erase scale with the CLUSTER, not the request."""
    (df.withColumn("kb", bucket_of(F.col(key_col), n_buckets))
     .repartition(F.col("kb"))
     .write.mode("overwrite").partitionBy("kb").parquet(base_dir))


def erase_keys(spark: SparkSession, base_dir: str, keys: DataFrame,
               key_col: str, n_buckets: int = 32) -> list:
    """Erase every row whose ``key_col`` appears in ``keys`` (a one-column
    DataFrame).  Returns the rewritten bucket values.

    Touched buckets come from hashing the KEYS (bounded by the request),
    the store read is partition-pruned to them, the anti join broadcasts
    the key set, and the rewrite commits via the manifest protocol.
    Erasing absent keys is a no-op rewrite of their buckets (idempotent
    — re-running a deletion request is safe)."""
    from localsql_spark.sinks.merge import (_apply_manifest, _manifest_path,
                                            read_base_partitions,
                                            recover_pending_merge)

    recover_pending_merge(base_dir)
    k = normalize_erase_keys(keys)
    touched = [r[0] for r in
               k.select(bucket_of(F.col("_erase_key"), n_buckets)
                        .alias("kb")).distinct().collect()]
    if not touched:
        return []
    stored = read_base_partitions(spark, base_dir, "kb", touched)
    if stored is None:
        return []
    kept = stored.join(F.broadcast(k),
                       F.col(key_col) == F.col("_erase_key"),
                       "left_anti")

    base = Path(base_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    # re-cluster on kb before the staged write: without it every reading
    # task writes a sliver into every touched bucket and the store's
    # files-per-bucket compounds across erases (same rationale as
    # write_bucketed_store)
    (kept.repartition(F.col("kb"))
     .write.mode("overwrite").partitionBy("kb").parquet(str(staging)))
    # a bucket whose every row was erased writes no partition dir — it is
    # committed as an explicit manifest removal (kb is an int partition
    # value, so Python and Spark path-encode it identically)
    from localsql_spark.sinks.merge import commit_staged_partitions
    commit_staged_partitions(base_dir, "kb",
                             [f"kb={kb}" for kb in touched])
    return sorted(touched)


def read_bucketed_store(spark: SparkSession, base_dir: str) -> DataFrame:
    """Read the store back (healing any crashed erase first); filters on
    the bucket column prune whole partitions."""
    from localsql_spark.sinks.merge import recover_pending_merge

    recover_pending_merge(base_dir)
    return spark.read.option("basePath", base_dir).parquet(base_dir)


# ---------------------------------------------------------------------------
# Pseudonymization vault
# ---------------------------------------------------------------------------

def pseudonymize(df: DataFrame, key_col: str, salt: str,
                 token_col: str = "token") -> tuple[DataFrame, DataFrame]:
    """Split a table into an analytics copy carrying only a salted token
    in place of the identifier, plus a VAULT mapping ``(token, key)`` for
    authorized re-identification — pseudonymization, the standard
    pattern for sharing event data with analysts while keeping the raw
    identifier in a separately-governed (and separately-erasable) table.

    Token = md5(salt || key): deterministic (the same key tokenizes
    identically across tables and runs, so joins on the token still
    work), portable (the oracle replays it), and one-way WITHOUT the
    vault only to the extent the key space is large — the salt's real
    job is to break cross-dataset linkage by anyone holding a different
    salt, and rotation = re-pseudonymize with a new salt.  Erasing a
    subject afterwards = delete their vault row AND
    :func:`erase_keys` on the token-keyed analytics store — at which
    point the token is an unlinkable random string.

    Both outputs are row-local projections (zero shuffles beyond the
    vault's distinct); the vault is |distinct keys| rows.
    """
    token = F.md5(F.concat(F.lit(salt),
                           F.col(key_col).cast("string"))).alias(token_col)
    anon = df.select(token, *[c for c in df.columns if c != key_col])
    vault = (df.select(token, F.col(key_col))
             .filter(F.col(key_col).isNotNull()).distinct())
    return anon, vault


def k_anonymity_audit(df: DataFrame, qi_cols: list[str],
                      k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney,
    IJUFKS 2002 — public notion): every row whose QI equivalence class
    has fewer than ``k`` members is re-identifiable by linkage on those
    columns; a release is k-anonymous iff no such class exists.  Run
    BEFORE sharing an "anonymized" extract — pseudonymization alone does
    not help when the quasi-identifiers themselves single a subject out.

    Output: one row per equivalence class —
    ``*qi_cols, class_size, at_risk`` (at_risk = size < k) — small
    classes first.  One groupBy over the QI key with map-side combine;
    output is bounded by the class count, so the audit of a 100 TB
    release is one shuffle and a class-sized result.
    """
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .withColumn("at_risk", F.col("class_size") < k))


def erase_everywhere(spark: SparkSession, keys: DataFrame, *,
                     primary: dict | None = None,
                     inverted_index: dict | None = None,
                     signature_store: dict | None = None,
                     ivfpq_index: dict | None = None,
                     ivf_index: dict | None = None,
                     scd2: dict | None = None) -> DataFrame:
    """Right-to-be-forgotten across the WHOLE persistence surface: erase
    the subjects from the primary store and PROPAGATE through every
    derived store that retains their content — inverted-index postings
    (text reconstructible per term), minhash signatures + banded sidecar
    (content fingerprints keep the subject linkable), IVFPQ codes
    (quantized embeddings), SCD2 history (old versions survive by
    design).  Erasing only the primary leaves all four fully populated.

    Store configs (pass only what exists; each is that store's kwargs):
    ``primary={'base_dir', 'key_col', 'n_buckets'}``,
    ``inverted_index={'index_dir', 'n_buckets', 'doc_id_col',
    'text_col'}``, ``signature_store={'store_path', 'index_path'}``,
    ``ivfpq_index={'index_path'}``, ``scd2={'store_dir', 'key_col'}``.

    Ordering: the inverted-index pass runs FIRST, fed the erased
    documents' text read from the still-intact primary store, so its
    touched-bucket set is pruned to the documents' own terms; the
    primary erase follows; fingerprint/code/history stores are
    key-addressable and run in any order.  Non-retractable aggregates
    (NB counts, HLL registers, trained IVFPQ model tables) are erased by
    RETRAINING from the post-erase corpus — run
    :func:`rebuild_nonretractable` after this returns (see
    :func:`localsql_spark.operators.similarity.ivfpq_erase_vectors` for
    why that state class cannot retract row-by-row).

    Returns a per-store AUDIT: ``(store, rows_after, erased_refs)``
    where ``erased_refs`` recounts rows still referencing an erased key
    in the actual post-erase bytes — the verifiable claim is that every
    entry is 0.  Each erase is idempotent; re-running a request is safe
    at every store."""
    k = normalize_erase_keys(keys).localCheckpoint(eager=True)

    audits: list[DataFrame] = []

    def _audit(name: str, df: DataFrame, ref_col: str, rows: list) -> None:
        # the left join against the distinct key set preserves row count
        # (<=1 match per row), so rows_after and erased_refs come out of
        # a single aggregate; the per-store aggregates are DEFERRED and
        # unioned into ONE job at the end — five stores' audits cost one
        # Spark job's overhead, not five (``rows`` kept for signature
        # parity; the union result is authoritative)
        audits.append(
            df.join(F.broadcast(k),
                    F.col(ref_col) == F.col("_erase_key"), "left")
            .agg(F.lit(name).alias("store"),
                 F.count(F.lit(1)).alias("rows_after"),
                 F.count("_erase_key").alias("erased_refs")))

    rows: list = []
    if inverted_index is not None:
        from localsql_spark.sinks.inverted_index import index_erase_documents
        cfg = dict(inverted_index)
        nb = cfg.pop("n_buckets", 16)
        idx_dir = cfg.pop("index_dir")
        docs = None
        if primary is not None:  # text for bucket pruning, pre-erase
            store = read_bucketed_store(spark, primary["base_dir"])
            docs = store.join(
                F.broadcast(k),
                F.col(primary["key_col"]) == F.col("_erase_key"), "semi")
        index_erase_documents(spark, idx_dir, k, n_buckets=nb, docs=docs,
                              **cfg)
        post = (spark.read.option("basePath", idx_dir).parquet(idx_dir)
                .filter(F.col("tb") != nb))
        _audit("inverted_index", post, "doc_id", rows)
    if primary is not None:
        erase_keys(spark, primary["base_dir"], k, primary["key_col"],
                   n_buckets=primary.get("n_buckets", 32))
        _audit("primary", read_bucketed_store(spark, primary["base_dir"]),
               primary["key_col"], rows)
    if signature_store is not None:
        from localsql_spark.operators.dedup import (
            erase_from_signature_store, read_signature_store)
        erase_from_signature_store(spark, signature_store["store_path"], k,
                                   index_path=signature_store.get(
                                       "index_path"))
        _audit("signature_store",
               read_signature_store(spark, signature_store["store_path"]),
               "doc_id", rows)
        idx = (signature_store.get("index_path")
               or f"{signature_store['store_path'].rstrip('/')}_banded")
        if Path(idx).exists():
            _audit("banded_index", spark.read.parquet(idx), "doc_id", rows)
    if ivfpq_index is not None:
        from localsql_spark.operators.similarity import ivfpq_erase_vectors
        ivfpq_erase_vectors(spark, ivfpq_index["index_path"], k)
        _audit("ivfpq_codes",
               spark.read.parquet(f"{ivfpq_index['index_path']}/codes"),
               "neighbor_id", rows)
    if ivf_index is not None:
        from localsql_spark.operators.similarity import (_ivf_slices,
                                                         ivf_erase_vectors)
        ivf_erase_vectors(spark, ivf_index["index_path"], k)
        _audit("ivf_cells", _ivf_slices(spark, ivf_index["index_path"]),
               "neighbor_id", rows)
    if scd2 is not None:
        from localsql_spark.sinks.scd2_store import (read_history,
                                                     scd2_erase_keys)
        scd2_erase_keys(spark, scd2["store_dir"], k, scd2["key_col"])
        _audit("scd2_history", read_history(spark, scd2["store_dir"]),
               scd2["key_col"], rows)
    if not audits:
        return spark.createDataFrame(
            [], "store string, rows_after long, erased_refs long")
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    # one collect = one job for all five stores' post-erase recounts
    return spark.createDataFrame(
        [(r["store"], r["rows_after"], r["erased_refs"])
         for r in out.collect()],
        "store string, rows_after long, erased_refs long")


# ---------------------------------------------------------------------------
# Rebuild policy for non-retractable aggregates
# ---------------------------------------------------------------------------

def _swap_rebuilt(dst: Path, built: Path) -> None:
    """Swap a freshly-built store into place: park the old generation,
    rename the new one in (commit), drop the old.  A crash between the
    two renames leaves the store parked under ``.<name>.pre_rebuild`` —
    re-running the rebuild is the recovery (the trainers are
    deterministic, so the re-run reproduces the same bytes); the next
    rebuild also sweeps any parked leftover."""
    old = dst.parent / f".{dst.name}.pre_rebuild"
    shutil.rmtree(old, ignore_errors=True)
    if dst.exists():
        os.rename(dst, old)
    os.rename(built, dst)  # commit
    shutil.rmtree(old, ignore_errors=True)


def rebuild_nonretractable(spark: SparkSession, *,
                           nb_model: dict | None = None,
                           sketch_view: dict | None = None,
                           ivfpq_index: dict | None = None,
                           ivf_index: dict | None = None) -> DataFrame:
    """The REBUILD half of the right-to-be-forgotten story: trained
    aggregates whose per-subject contribution is not retractable
    row-by-row — NB additive token counts, HLL registers (a register max
    cannot be un-maxed), trained IVFPQ model tables (centroids/codebooks
    absorb every training vector's residual) — are erased by RETRAINING
    from the post-erase corpus.  :func:`erase_everywhere` handles the
    row-addressable stores; this operator completes the surface, turning
    the "periodic retrain" docstring policy into runnable maintenance.

    Each config names the store and carries its POST-ERASE training
    input (the caller erased the primary first, so these frames no
    longer contain the subjects):

    - ``nb_model={'model_dir', 'docs', 'positive', ['n_buckets',
      'doc_id_col', 'text_col']}`` — one from-scratch
      :func:`~localsql_spark.operators.selection.nb_model_update` fold
      (additive counts: one fold over the corpus == the full train).
    - ``sketch_view={'view_dir', 'docs', ['n', 'group_col',
      'text_col']}`` — one from-scratch
      :func:`~localsql_spark.sinks.sketch_view.sketch_view_update` fold
      (register maxes: same single-fold identity).
    - ``ivfpq_index={'index_path', 'corpus', ['n_cells', 'm', 'k_codes',
      'n_iter', 'id_col', 'vec_col']}`` —
      :func:`~localsql_spark.operators.similarity.write_ivfpq_index`
      retrains coarse centroids + codebooks AND re-encodes the codes, so
      the erased vectors' influence leaves the quantizers too.
    - ``ivf_index={'index_path', 'corpus', ['n_cells', 'id_col',
      'vec_col']}`` —
      :func:`~localsql_spark.operators.similarity.write_ivf_index`
      rebuilds the full-vector IVF index INCLUDING its centroid table,
      which stores seed subjects' vectors verbatim.

    Each rebuild trains into a sibling staging dir and swaps in with a
    rename pair (:func:`_swap_rebuilt`) — readers never see a
    half-trained store, and a mid-build crash leaves the old generation
    serving.  Single-writer maintenance, same contract as the other
    store compactions.  Deliberately a FULL retrain, not incremental:
    that is the definition of this state class, and the cost is
    model-table-bounded per store (one training pass over the kept
    corpus) on whatever cadence the compliance policy sets.

    Returns an audit frame ``(store, rows_after)`` counting the rebuilt
    state rows (NB word rows, HLL register rows, PQ code rows) read back
    from the post-swap bytes."""
    rows: list = []
    if nb_model is not None:
        from localsql_spark.operators.selection import (nb_model_read,
                                                        nb_model_update)
        cfg = dict(nb_model)
        dst = Path(cfg.pop("model_dir"))
        docs, positive = cfg.pop("docs"), cfg.pop("positive")
        built = dst.parent / f".{dst.name}.rebuild"
        shutil.rmtree(built, ignore_errors=True)
        nb_model_update(spark, str(built), docs, positive, **cfg)
        _swap_rebuilt(dst, built)
        model, _ = nb_model_read(spark, str(dst),
                                 n_buckets=cfg.get("n_buckets", 16))
        rows.append(("nb_model", model.count()))
    if sketch_view is not None:
        from localsql_spark.sinks.sketch_view import sketch_view_update
        cfg = dict(sketch_view)
        dst = Path(cfg.pop("view_dir"))
        docs = cfg.pop("docs")
        built = dst.parent / f".{dst.name}.rebuild"
        shutil.rmtree(built, ignore_errors=True)
        sketch_view_update(spark, str(built), docs, **cfg)
        _swap_rebuilt(dst, built)
        regs = (spark.read.option("basePath", str(dst)).parquet(str(dst))
                .filter(F.col("bucket") >= 0))
        rows.append(("sketch_view", regs.count()))
    if ivfpq_index is not None:
        from localsql_spark.operators.similarity import write_ivfpq_index
        cfg = dict(ivfpq_index)
        dst = Path(cfg.pop("index_path"))
        corpus = cfg.pop("corpus")
        built = dst.parent / f".{dst.name}.rebuild"
        shutil.rmtree(built, ignore_errors=True)
        write_ivfpq_index(corpus, str(built), **cfg)
        _swap_rebuilt(dst, built)
        rows.append(("ivfpq_index",
                     spark.read.parquet(str(dst / "codes")).count()))
    if ivf_index is not None:
        # the IVF centroid table stores seed subjects' vectors VERBATIM
        # (deterministic-seed variant), so an erased seed's embedding
        # survives in the model until this retrain
        from localsql_spark.operators.similarity import (_ivf_slices,
                                                         write_ivf_index)
        cfg = dict(ivf_index)
        dst = Path(cfg.pop("index_path"))
        corpus = cfg.pop("corpus")
        built = dst.parent / f".{dst.name}.rebuild"
        shutil.rmtree(built, ignore_errors=True)
        write_ivf_index(corpus, str(built), **cfg)
        _swap_rebuilt(dst, built)
        rows.append(("ivf_index",
                     _ivf_slices(spark, str(dst)).count()))
    return spark.createDataFrame(rows, "store string, rows_after long")
