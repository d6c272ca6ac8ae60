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
    — re-running a deletion request is safe).  Single-writer: holds the
    store's maintenance lock (reentrant under erase_everywhere /
    maintain_everywhere)."""
    from localsql_spark.sinks.locks import store_lock
    with store_lock(base_dir):
        return _erase_keys_locked(spark, base_dir, keys, key_col, n_buckets)


def _erase_keys_locked(spark: SparkSession, base_dir: str, keys: DataFrame,
                       key_col: str, n_buckets: int) -> list:
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
    # mode='write': the kept rows are REWRITTEN — a read-default
    # coalesce here would bake defaults into carried rows' bytes
    stored = read_base_partitions(spark, base_dir, "kb", touched,
                                  mode="write")
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
    the bucket column prune whole partitions.  A schema-registered store
    (sinks/schema_evolution.py) reconciles every partition to the
    registry's current contract — buckets written before an evolution
    read back with nulls/defaults in the added columns."""
    from localsql_spark.sinks.merge import recover_pending_merge
    from localsql_spark.sinks.schema_evolution import (read_registry,
                                                       reconcile_frame)

    from localsql_spark.sinks.schema_evolution import evolved_read_schema

    recover_pending_merge(base_dir)
    if read_registry(base_dir) is None:
        return spark.read.option("basePath", base_dir).parquet(base_dir)
    # bucketed stores partition on kb int by construction, so the scan
    # always gets the explicit evolved schema (no footer sweep)
    ddl = evolved_read_schema(base_dir, extra={"kb": "int"})
    df = (spark.read.schema(ddl).option("basePath", base_dir)
          .parquet(base_dir))
    return reconcile_frame(df, base_dir, keep_extra=["kb"])


# ---------------------------------------------------------------------------
# Erase ledger: closing the erase-vs-late-landing-batch window
# ---------------------------------------------------------------------------
#
# THE WINDOW: with a data-ingest stream and an erase-request stream over
# the same corpus, a deletion request can fold while an earlier data
# batch containing the subject sits landed-but-unapplied; if that data
# batch folds AFTER the erase, the subject is re-ingested post-erasure —
# the erase ran against a store that had never seen the rows it was
# supposed to remove.  Watermark sequencing alone cannot close this (a
# checkpoint redelivery can re-land a pruned batch), so the fix is a
# persisted LEDGER of erased keys that every data fold consults: a
# subject's late-arriving rows are dropped at ingest no matter when the
# batch lands.  Either the data landed before the erase fold (the erase
# removes it from the store) or after (the ledger drops it) — with folds
# of the two queues serialized at batch granularity (the single-writer
# maintenance contract every fold in this package already has), there is
# no third interleaving.  This is the streaming analogue of tombstone
# retention in compacted logs: the ledger must be retained at least as
# long as any in-flight batch could arrive.

def erase_ledger_append(keys: DataFrame, ledger_dir: str,
                        batch_id: int) -> None:
    """Record one erase-request batch's keys in the ledger — called by
    the erase fold BEFORE it touches any store, so a crash between the
    two leaves the key ledgered (late data already blocked) and the
    idempotent erase simply re-runs.  Per-batch overwrite dirs: a
    checkpoint redelivery rewrites the same dir byte-for-byte; a batch
    already folded into a compacted generation is skipped (superseded
    gate, same as every landing sink)."""
    from localsql_spark.streaming.batch_dirs import superseded

    if Path(ledger_dir).exists() and superseded(ledger_dir, batch_id):
        return
    Path(ledger_dir).mkdir(parents=True, exist_ok=True)
    (normalize_erase_keys(keys).coalesce(1).write.mode("overwrite")
     .parquet(str(Path(ledger_dir) / f"batch_{batch_id}")))


def read_erase_ledger(spark: SparkSession,
                      ledger_dir: str) -> DataFrame | None:
    """Every erased key recorded so far (distinct ``_erase_key``), or
    None for an absent/empty ledger.  Reads committed batch dirs plus
    any compacted generation (``batch_dirs.read_batches`` semantics —
    a torn dir is excluded until its writer rewrites it)."""
    from localsql_spark.streaming.batch_dirs import _live_parts, read_batches

    root = Path(ledger_dir)
    if not root.exists():
        return None
    gen, batches = _live_parts(str(root))
    if gen is None and not any((b / "_SUCCESS").exists() for b in batches):
        return None
    return read_batches(spark, str(root)).select("_erase_key").distinct()


def filter_erased(batch: DataFrame, ledger_dir: str | None,
                  key_col: str) -> DataFrame:
    """Drop rows whose ``key_col`` appears in the erase ledger — the
    ingest-side half of the ledger contract.  Every data fold that can
    land subject-keyed rows calls this on its batch first; a None/absent
    ledger passes the batch through.  One broadcast anti-join against a
    request-sized key set — batch-priced at any corpus scale."""
    if ledger_dir is None:
        return batch
    led = read_erase_ledger(batch.sparkSession, ledger_dir)
    if led is None:
        return batch
    return batch.join(F.broadcast(led),
                      F.col(key_col) == F.col("_erase_key"), "left_anti")


def compact_erase_ledger(spark: SparkSession, ledger_dir: str,
                         keep_last: int = 1) -> int:
    """Ledger retention: fold old per-request batch dirs into one
    generation (``batch_dirs.compact_batches`` — same crash-safe rename
    commit).  The ledger stays request-sized; compaction only bounds the
    directory count.  NEVER delete ledger content while any batch that
    could carry a ledgered subject is still in flight — the retention
    window is the ingest pipeline's maximum landing delay."""
    from localsql_spark.streaming.batch_dirs import compact_batches

    return compact_batches(spark, ledger_dir, keep_last=keep_last,
                           target_files=1)


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


def _laplace_noise(group_cols: list[str], seed: str, b: float,
                   mechanism: str = ""):
    """The seeded Laplace draw both DP releases share: uniform from
    hash32(seed || mechanism || group key) at 1e6 resolution through
    the inverse CDF — ONE definition so the tail-truncation and
    null-key encoding can never drift between the counts and sums
    surfaces (their oracles replay this exact expression).

    ``mechanism`` DOMAIN-SEPARATES the draw per release surface and
    parameterization (e.g. ``"counts|eps=1"`` vs ``"sums|eps=1|
    clip=100"``).  Without it, releasing counts AND sums over the same
    group columns under one seed would draw the SAME u per group, and
    ``noisy_sum - clip * noisy_n`` would cancel the noise exactly —
    the combined release would reveal ``true_sum - clip * true_n``
    noise-free, which is not epsilon-DP at any epsilon.  With the
    domain in the hash key the two draws are independent and the
    composition degrades gracefully (sequential composition spends
    both epsilons; it never cancels)."""
    key = F.concat_ws(
        "\x1f", F.lit(seed), F.lit(mechanism),
        *[F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
          for c in group_cols])
    u = ((hash32(key) % 1_000_000).cast("double") + 0.5) / 1_000_000.0 - 0.5
    return (-b) * F.signum(u) * F.log(1 - 2 * F.abs(u))


def dp_noisy_counts(df: DataFrame, group_cols: list[str],
                    epsilon: float = 1.0, min_class: int = 0,
                    seed: str = "dp") -> DataFrame:
    """Laplace-mechanism noisy counts for a RELEASED group-by — the
    standard output-perturbation step (Dwork et al., "Calibrating Noise
    to Sensitivity in Private Data Analysis", TCC 2006 — public) that
    completes the governance trio next to :func:`pseudonymize` and
    :func:`k_anonymity_audit`: pseudonymization breaks direct
    identifiers, k-anonymity flags re-identifiable classes, and noisy
    counts bound what the released AGGREGATES themselves reveal about
    any one subject.

    A count's sensitivity under add/remove-one-row is 1, so noise is
    Laplace(1/epsilon): inverse-CDF transform of a uniform draw,
    ``-b * sign(u) * ln(1 - 2|u|)`` for u in (-0.5, 0.5).  The draw is
    DETERMINISTIC — hash32(seed || group key) — which makes the release
    reproducible, oracle-checkable, and stable across re-runs (releasing
    twice with the same seed reveals nothing new; releasing with a FRESH
    seed per release is the caller's epsilon-budget decision).  This is
    the honest trade to state: true DP requires fresh randomness per
    release; the mechanism and its calibration are exactly the Laplace
    mechanism, and a production deployment swaps the seeded draw for a
    secure one without touching the plan shape.

    The draw is domain-separated per mechanism and parameterization
    (``counts|eps=...`` inside the hash key), so a counts release and a
    sums release over the same groups under the same seed draw
    INDEPENDENT noise — without that, ``noisy_sum - clip * noisy_n``
    would cancel the shared draw exactly and the combined release would
    not be DP at all (see :func:`_laplace_noise`).

    ``min_class`` > 0 additionally SUPPRESSES groups smaller than it
    (the k-anonymity composition: tiny classes are both re-identifiable
    and the ones noise distorts most, so standard releases drop them).

    The draw's 1e6-step resolution truncates the Laplace tail at
    ``|noise| <= b * ln(1e6)`` (~13.8/epsilon) — negligible mass
    (~1e-6) and the direction that UNDER-perturbs, stated for honesty.

    Plan shape: one groupBy with map-side combine, then row-local noise
    — no second shuffle; output is class-count-sized at any corpus
    scale.  Returns ``(*group_cols, noisy_n)`` with noisy_n rounded to
    6 decimals (portable float)."""
    counted = (df.groupBy(*group_cols)
               .agg(F.count(F.lit(1)).alias("__true_n")))
    if min_class > 0:
        counted = counted.filter(F.col("__true_n") >= min_class)
    noise = _laplace_noise(group_cols, seed, 1.0 / epsilon,
                           mechanism=f"counts|eps={epsilon:g}")
    return counted.select(
        *group_cols,
        F.round(F.col("__true_n") + noise, 6).alias("noisy_n"))


def dp_noisy_sums(df: DataFrame, group_cols: list[str], value_col: str,
                  epsilon: float = 1.0, clip: float = 100.0,
                  min_class: int = 0, seed: str = "dp") -> DataFrame:
    """Laplace-mechanism noisy SUMS — the second half of the DP release
    surface (:func:`dp_noisy_counts` releases how many, this releases
    how much).  A sum's sensitivity is unbounded until each row's
    CONTRIBUTION is bounded, so values clip to ``[0, clip]`` first (the
    standard contribution-bounding step — Dwork et al. TCC 2006; clip
    choice is the caller's bias/noise trade: too low biases the total,
    too high inflates noise); sensitivity under add/remove-one-row is
    then ``clip`` and the noise is Laplace(clip/epsilon).

    Same determinism contract as the counts: the draw is
    hash32(seed || "sums|eps=..|clip=.." || group key) through the
    inverse CDF — domain-separated from the counts draw so the two
    releases never share noise (see :func:`_laplace_noise`) —
    reproducible,
    oracle-checkable, tail truncated at ~13.8*clip/epsilon (negligible
    mass, under-perturbing direction); swap in secure randomness per
    release in production without touching the plan.  The clipped sum
    itself is a DECIMAL fold (exact, order-insensitive) so the released
    value differs from truth by exactly the noise, never by float
    reduction order.  ``min_class`` suppresses small groups (count via
    the same aggregate — no second shuffle).

    Plan: ONE map-side-combined groupBy, then row-local noise; output is
    class-count-sized at any corpus scale.  Returns ``(*group_cols,
    noisy_sum)`` rounded to 6 decimals."""
    clipped = F.round(
        F.least(F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
                F.lit(float(clip))), 12).cast("decimal(28,12)")
    agg = (df.groupBy(*group_cols)
           .agg(F.sum(clipped).cast("double").alias("__sum"),
                F.count(F.lit(1)).alias("__n")))
    if min_class > 0:
        agg = agg.filter(F.col("__n") >= min_class)
    noise = _laplace_noise(group_cols, seed, float(clip) / epsilon,
                           mechanism=f"sums|eps={epsilon:g}|clip={clip:g}")
    return agg.select(
        *group_cols,
        F.round(F.col("__sum") + noise, 6).alias("noisy_sum"))


def export_subject(spark: SparkSession, keys: DataFrame, *,
                   primary: dict | None = None,
                   inverted_index: dict | None = None,
                   signature_store: dict | None = None,
                   ivf_index: dict | None = None,
                   ivfpq_index: dict | None = None,
                   scd2: dict | None = None,
                   feed: dict | None = None,
                   ledger: dict | None = None,
                   rollup: dict | None = None,
                   ivm_view: dict | None = None,
                   cov_store: dict | None = None,
                   nb_model: dict | None = None,
                   sketch_view: dict | None = None) -> dict[str, DataFrame]:
    """Subject ACCESS request across the persistence surface — the read
    half of the compliance pair whose write half is
    :func:`erase_everywhere` (GDPR Art. 15 right of access / Art. 20
    data portability, both public law): gather every stored row that
    references the subjects, from every store that holds one.  An
    access response that misses a derived store under-discloses exactly
    the way an erase that misses one under-deletes, so the store map
    and, critically, the PRUNED READS are shared with the erase path —
    an access request costs what the request touches, never a
    full-surface scan:

    - ``primary`` (``base_dir``, ``key_col``, ``n_buckets``): buckets
      hashed FROM THE KEYS prune the partition read (same bound as
      :func:`erase_keys` — at most min(K, n_buckets) partitions).
    - ``inverted_index`` (``index_dir``, ``n_buckets``, ``doc_id_col``,
      ``text_col``, optional ``docs``): with ``docs`` (the subjects'
      text, readable pre-response from the primary), the read prunes to
      the term buckets the subjects' own tokens hash into; without it,
      one full-width but column-pruned posting pass.  Postings are
      part of the subject's stored footprint — their content is
      reconstructible from them, which is why both halves must cover
      the index.
    - ``signature_store`` (``store_path``): narrow (doc_id, sig) scan
      filtered to the subjects (the store is content-hash-keyed, not
      subject-bucketed, so the scan is store-wide but two columns).
    - ``ivf_index`` (``index_path``): the subjects' FULL stored
      embedding vectors — raw personal data the same way text is.  A
      narrow (neighbor_id, cell) locate names the touched cells, then
      only those partitions are read wide (same two-phase bound as
      :func:`operators.similarity.ivf_erase_vectors`).
    - ``ivfpq_index`` (``index_path``): the subjects' PQ code rows —
      codes reconstruct the embedding to within quantization error, so
      they are disclosable state too.  The codes table IS the compact
      m-bytes-per-vector representation, so the semi-joined pass is
      index-sized, never corpus-sized.
    - ``scd2`` (``store_dir``, ``key_col``): the FULL version history —
      an access response must disclose old versions for the same
      reason the erase must remove them.
    - ``feed`` (``feed_dir``, ``key_col``): one column-pruned scan
      names the batch dirs holding subject rows (the locator
      :func:`streaming.foreach_upsert.erase_from_feed` uses); only
      those dirs are then read in full.
    - ``ledger`` (``ledger_dir``): prior DELETION requests naming the
      subjects — processing history is itself disclosable.

    The AGGREGATE stores (rollup, IVM view, covariance partials) remain
    NOT row-export surfaces: no subject-addressable row survives in a
    count/sum — what an aggregate reveals about one subject is the
    differential-privacy question, answered by the
    :func:`dp_noisy_counts` / :func:`dp_noisy_sums` release path, not
    by row export.  The response can still cheaply NAME them: the
    optional ``rollup`` / ``ivm_view`` / ``cov_store`` configs add an
    AGGREGATE FOOTPRINT — per subject, WHICH groups of each aggregate
    store hold their contributions and how many rows they contributed
    — computed from the subjects' own rows in the store's source
    (exactly the touched-group lists the erase retractions derive, per
    subject instead of pooled), never from the aggregate bytes:

    - ``rollup={'events', 'subject_col', ['grain', 'ts_col',
      'key_col']}`` -> ``rollup_footprint`` frame
      ``(subject_col, bucket_ts, key, n_contributed)``.
    - ``ivm_view={'fact', 'subject_col', 'dim', 'fact_key', 'dim_key',
      'group_col'}`` -> ``ivm_footprint``
      ``(subject_col, grp, n_contributed)``.
    - ``cov_store={'vectors', 'subject_col'}`` -> ``cov_footprint``
      ``(subject_col, n_vectors)`` (every folded vector contributes to
      every covariance cell, so the group list degenerates to a count).
    - ``nb_model={'docs', 'subject_col', ['text_col']}`` ->
      ``nb_footprint`` ``(subject_col, word, n_contributed)`` — which
      WORD rows of the persisted NB count model hold the subject's
      token contributions, computed with the trainer's OWN tokenizer
      (``_nb_words``: normalize_text split, empties removed), so the
      disclosed word set can never drift from what ``nb_model_update``
      folded.
    - ``sketch_view={'docs', 'subject_col', ['group_col', 'text_col',
      'n']}`` -> ``sketch_footprint`` ``(subject_col, grp,
      n_docs_contributed, n_ngrams_contributed)`` — which GROUP rows of
      the diversity sketch view hold the subject's contributions, with
      the n-gram count matching ``ngram_stream``'s emission exactly
      (grams per doc = max(tokens - (n-1), 0) over the shared
      tokenizer) — the total_ngrams counter's per-subject share.
    Like the erase path, NB counts and HLL registers are NOT
    row-retractable — the footprint names the touched state the
    rebuild (:func:`rebuild_nonretractable`) would retrain away.

    Returns ``{store_name: DataFrame}`` of the subjects' rows per
    configured store (empty frames for stores holding nothing).  Feed
    frames carry ``batch_id``; every frame still contains the store's
    own key column.  Fold into one auditable frame with
    :func:`access_manifest`.  The returned frames are LAZY reads —
    consume them before running maintenance (prune_feed, compaction,
    an erase) on the same stores, the package-wide single-writer
    contract; the frames themselves never take locks."""
    k = normalize_erase_keys(keys).localCheckpoint(eager=True)
    out: dict[str, DataFrame] = {}

    def _match(df: DataFrame, ref_col: str) -> DataFrame:
        return df.join(F.broadcast(k),
                       F.col(ref_col) == F.col("_erase_key"), "left_semi")

    if primary is not None:
        from localsql_spark.sinks.merge import (read_base_partitions,
                                                recover_pending_merge)
        n_buckets = primary.get("n_buckets", 32)
        touched = [r[0] for r in
                   k.select(bucket_of(F.col("_erase_key"), n_buckets)
                            .alias("kb")).distinct().collect()]
        recover_pending_merge(primary["base_dir"])
        stored = read_base_partitions(spark, primary["base_dir"], "kb",
                                      touched) if touched else None
        if stored is None:
            # empty request, keys hash to absent buckets, or the store
            # itself is emptied/absent (read_base_partitions' None case)
            # — probe the bytes: a present store yields its TRUE schema
            # via a limit(0) read, so an empty export frame always
            # carries the store's own columns.
            bp = Path(primary["base_dir"])
            if bp.exists() and any(bp.rglob("*.parquet")):
                stored = read_bucketed_store(
                    spark, primary["base_dir"]).limit(0)
            elif "empty_schema" in primary:
                # caller supplied the store's schema (DDL string incl.
                # the kb column) for the absent-store case — the only
                # way to keep the every-frame-has-the-store's-columns
                # manifest shape when no bytes exist to infer from
                stored = spark.createDataFrame([], primary["empty_schema"])
            else:
                raise ValueError(
                    f"export_subject: primary store "
                    f"{primary['base_dir']!r} holds no parquet — the "
                    f"store's columns cannot be inferred, so an empty "
                    f"export frame would carry a fabricated schema and "
                    f"its manifest digest would differ from a present-"
                    f"but-empty store's.  Pass primary['empty_schema'] "
                    f"(DDL) to export against an absent store, the same "
                    f"contract read_bucketed_store enforces by raising.")
        out["primary"] = _match(stored, primary["key_col"]).drop("kb")

    if inverted_index is not None:
        from localsql_spark.operators.text import normalize_text
        from localsql_spark.sinks.merge import (read_base_partitions,
                                                recover_pending_merge)
        idx = inverted_index
        nb = idx.get("n_buckets", 16)
        recover_pending_merge(idx["index_dir"])
        docs = idx.get("docs")
        if docs is not None:
            touched = sorted({r[0] for r in (
                _match(docs, idx.get("doc_id_col", "doc_id"))
                .select(F.explode(F.split(
                    normalize_text(F.col(idx.get("text_col", "text"))),
                    " ")).alias("term"))
                .select(F.pmod(hash32(F.col("term")), F.lit(nb))
                        .cast("int").alias("tb")).distinct().collect())})
        else:
            touched = list(range(nb))
        stored = read_base_partitions(spark, idx["index_dir"], "tb",
                                      touched) if touched else None
        if stored is None:
            out["inverted_index"] = spark.createDataFrame(
                [], "term string, doc_id long")
        else:
            out["inverted_index"] = _match(
                stored.filter(F.col("tb") != nb), "doc_id").drop("tb")

    if signature_store is not None:
        from localsql_spark.operators.dedup import read_signature_store
        sigs = read_signature_store(spark, signature_store["store_path"])
        out["signature_store"] = _match(sigs, "doc_id")

    if ivf_index is not None:
        from localsql_spark.operators.similarity import _ivf_base, _ivf_slices
        base, _ = _ivf_base(ivf_index["index_path"])
        bp = Path(base)
        has_deltas = any(
            Path(ivf_index["index_path"]).glob("delta/batch_*"))
        if (not bp.exists() or not any(bp.rglob("*.parquet"))) \
                and not has_deltas:
            out["ivf_index"] = spark.createDataFrame(
                [], "neighbor_id long, cell int")
        else:
            narrow = _ivf_slices(spark, ivf_index["index_path"]) \
                .select("neighbor_id", "cell")
            touched = sorted({r[0] for r in _match(narrow, "neighbor_id")
                              .select("cell").distinct().collect()})
            wide = _ivf_slices(spark, ivf_index["index_path"])
            if not touched:
                out["ivf_index"] = wide.limit(0)
            else:  # isin on the partition column prunes base AND deltas
                out["ivf_index"] = _match(
                    wide.filter(F.col("cell").isin(touched)), "neighbor_id")

    if ivfpq_index is not None:
        from localsql_spark.sinks.merge import recover_pending_merge
        codes_dir = f"{ivfpq_index['index_path']}/codes"
        recover_pending_merge(codes_dir)
        cp = Path(codes_dir)
        if not cp.exists() or not any(cp.rglob("*.parquet")):
            out["ivfpq_index"] = spark.createDataFrame(
                [], "neighbor_id long, cell int")  # absent/emptied index
        else:
            codes = spark.read.option("basePath", codes_dir) \
                .parquet(codes_dir)
            out["ivfpq_index"] = _match(codes, "neighbor_id")

    if scd2 is not None:
        from localsql_spark.sinks.scd2_store import read_history
        hist = read_history(spark, scd2["store_dir"])
        out["scd2"] = _match(hist, scd2["key_col"])

    if feed is not None:
        from localsql_spark.streaming.foreach_upsert import (
            _read_feed_dirs, read_feed)
        f = read_feed(spark, feed["feed_dir"])
        if f is None:  # keep the documented every-frame-has-its-key contract
            out["feed"] = spark.createDataFrame(
                [], f"batch_id long, {feed['key_col']} string")
        else:
            touched = sorted(
                r[0] for r in _match(f, feed["key_col"])
                .select("batch_id").distinct().collect())
            if not touched:
                out["feed"] = f.limit(0)
            else:
                dirs = [Path(feed["feed_dir"]) / f"batch_{b}"
                        for b in touched]
                out["feed"] = _match(_read_feed_dirs(spark, dirs),
                                     feed["key_col"])

    if ledger is not None:
        led = read_erase_ledger(spark, ledger["ledger_dir"])
        if led is None:
            out["ledger"] = spark.createDataFrame([], "erased_key string")
        else:  # rename: the request frame also carries _erase_key
            out["ledger"] = _match(
                led.withColumnRenamed("_erase_key", "erased_key"),
                "erased_key")

    # aggregate FOOTPRINTS (docstring): which groups hold the subjects'
    # contributions, from the subjects' own source rows — one broadcast
    # semi-join + one batch-sized groupBy each, never an aggregate-store
    # read (the stores hold no subject-addressable row to read)
    if rollup is not None:
        from localsql_spark.sinks.rollup import _GRAINS
        scol = rollup["subject_col"]
        subj_ev = _match(rollup["events"], scol)
        grain = rollup.get("grain", "hour")
        ts_col = rollup.get("ts_col", "ts")
        key_col = rollup.get("key_col", "event_type")
        # the rollup's OWN bucket expression (rollup_events), so the
        # disclosed group ids can never drift from the store's
        bucket = F.date_format(F.date_trunc(grain, F.col(ts_col)),
                               _GRAINS[grain])
        out["rollup_footprint"] = (
            subj_ev.groupBy(F.col(scol), bucket.alias("bucket_ts"),
                            F.col(key_col).alias("key"))
            .agg(F.count(F.lit(1)).alias("n_contributed")))
    if ivm_view is not None:
        scol = ivm_view["subject_col"]
        subj_fact = _match(ivm_view["fact"], scol)
        dim = ivm_view["dim"].select(
            F.col(ivm_view["dim_key"]).alias("__dk"),
            F.col(ivm_view["group_col"]).alias("grp"))
        out["ivm_footprint"] = (
            subj_fact.join(F.broadcast(dim),
                           F.col(ivm_view["fact_key"]) == F.col("__dk"))
            .groupBy(F.col(scol), "grp")
            .agg(F.count(F.lit(1)).alias("n_contributed")))
    if cov_store is not None:
        scol = cov_store["subject_col"]
        out["cov_footprint"] = (
            _match(cov_store["vectors"], scol)
            .groupBy(F.col(scol))
            .agg(F.count(F.lit(1)).alias("n_vectors")))
    if nb_model is not None:
        from localsql_spark.operators.selection import _nb_words
        scol = nb_model["subject_col"]
        subj_docs = _match(nb_model["docs"], scol)
        # the trainer's own tokenizer; the label is irrelevant to WHICH
        # word rows hold contributions, so a constant stands in
        _, words = _nb_words(subj_docs, F.lit(True), scol,
                             nb_model.get("text_col", "text"))
        out["nb_footprint"] = (
            words.groupBy(F.col("doc_id").alias(scol), "word")
            .agg(F.count(F.lit(1)).alias("n_contributed")))
    if sketch_view is not None:
        from localsql_spark.operators.corpus import _tokens
        scol = sketch_view["subject_col"]
        gcol = sketch_view.get("group_col", "source")
        tcol = sketch_view.get("text_col", "text")
        n_ = sketch_view.get("n", 2)
        subj_docs = _match(sketch_view["docs"], scol)
        # gram count per doc matches ngram_stream's emission exactly:
        # slice-after-zip yields max(tokens - (n-1), 0) grams
        toks = F.array_remove(_tokens(F.col(tcol)), "")
        n_grams = F.greatest(F.size(toks) - F.lit(n_ - 1), F.lit(0))
        out["sketch_footprint"] = (
            subj_docs.select(F.col(scol), F.col(gcol).alias("grp"),
                             n_grams.alias("__ng"))
            .groupBy(scol, "grp")
            .agg(F.count(F.lit(1)).alias("n_docs_contributed"),
                 F.sum("__ng").alias("n_ngrams_contributed")))

    return out


def access_manifest(exports: dict[str, DataFrame],
                    key_cols: dict[str, str],
                    record_cols: dict[str, list[str]] | None = None
                    ) -> DataFrame:
    """Fold :func:`export_subject`'s per-store frames into ONE auditable
    manifest: ``(store, subject_key, record_md5)``, one row per stored
    record, where ``record_md5`` hashes the record's columns in
    column-NAME-sorted order with nulls encoded as ``<null>`` — a
    deterministic, cross-engine-replayable digest (the registered probe's
    DuckDB oracle recomputes it from the base tables, so the manifest is
    hash-verified end-to-end, not just counted).  ``key_cols`` names each
    store's subject-key column; ``record_cols`` optionally restricts a
    store's digest to listed columns (callers digest e.g. ``md5(text)``
    instead of megabyte blobs by pre-shaping the frame).  All stores'
    rows union into a single frame — the access response is one job, not
    one per store.  Columns whose string cast is engine-dependent
    (floats, arrays, structs) should be pre-cast by the caller."""
    if not exports:
        raise ValueError("access_manifest needs at least one store frame")
    parts = []
    for store, df in exports.items():
        cols = (record_cols or {}).get(store) or sorted(df.columns)
        digest = F.md5(F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                      for c in cols]))
        parts.append(df.select(
            F.lit(store).alias("store"),
            F.col(key_cols[store]).cast("string").alias("subject_key"),
            digest.alias("record_md5")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def erase_everywhere(spark: SparkSession, keys: DataFrame, *,
                     primary: dict | None = None,
                     inverted_index: dict | None = None,
                     signature_store: dict | None = None,
                     ivfpq_index: dict | None = None,
                     ivf_index: dict | None = None,
                     scd2: dict | None = None,
                     rollup: dict | None = None,
                     ivm_view: dict | None = None,
                     cov_store: dict | None = None,
                     feed: dict | None = None,
                     ledger: dict | None = None) -> DataFrame:
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
    ``ivfpq_index={'index_path'}``, ``scd2={'store_dir', 'key_col'}``,
    ``rollup={'rollup_dir', 'events', 'subject_col', ['grain',
    'ts_col', 'key_col', 'value_col']}`` (``events`` = the PRE-erase
    event source), ``ivm_view={'view_dir', 'fact', 'subject_col',
    'dim', 'fact_key', 'dim_key', 'group_col', 'value_col',
    ['n_buckets']}`` (``fact`` = the PRE-erase fact source),
    ``cov_store={'store_dir', 'vectors', 'batch_id', ['subject_col',
    'vec_col']}`` (``vectors`` = the PRE-erase embedding source; the
    retraction folds the subjects' NEGATIVE partials as that batch id.
    CONTRACT: ``vectors`` must equal the union of ALL rows the store
    folded for the subjects — i.e. the store ingested an append-only
    source.  If the store folded multiple versions of a subject's row
    (re-ingest/upsert source), retracting only the current vector
    under-retracts; the divergence audit below is the detection signal
    — it recomputes from scratch and flags the residual, and the fix is
    a store rebuild, not a second retraction),
    ``feed={'feed_dir', 'key_col'}``, ``ledger={'ledger_dir',
    'batch_id'}`` (record the request in the erase LEDGER before any
    store is touched, so in-flight ingest batches carrying the subjects
    are dropped at their own fold time — the batch flow's half of the
    late-landing contract the streaming queue already has).

    Ordering: the LEDGER append runs before everything (its commit is
    what blocks late re-ingestion); the inverted-index pass runs next,
    fed the erased
    documents' text read from the still-intact primary store, so its
    touched-bucket set is pruned to the documents' own terms; the
    AGGREGATE retractions (rollup, IVM view) run next — their negative
    deltas are computed from the subjects' rows in the PRE-erase
    ``events``/``fact`` frames, which must still be readable; the
    primary erase follows; fingerprint/code/history stores and the
    durable CDC feed are key-addressable and run in any order.
    Non-retractable aggregates (NB counts, HLL registers, trained IVFPQ
    model tables) are erased by RETRAINING from the post-erase corpus —
    run :func:`rebuild_nonretractable` after this returns (see
    :func:`localsql_spark.operators.similarity.ivfpq_erase_vectors` for
    why that state class cannot retract row-by-row).

    Returns a per-store AUDIT: ``(store, rows_after, erased_refs)``
    where ``erased_refs`` recounts rows still referencing an erased key
    in the actual post-erase bytes — the verifiable claim is that every
    entry is 0.  For the AGGREGATE stores (no subject column survives in
    a count/sum row), ``erased_refs`` instead counts stored rows that
    DIVERGE from a from-scratch recompute on the kept rows — the same
    "equals a store that never saw the subjects" claim, checked against
    the actual post-erase bytes.  Each erase is idempotent; re-running a
    request is safe at every store (the aggregate retractions become
    no-ops because the subjects' rows are gone from the primary-derived
    sources after the first pass — when their source frames read a
    separate immutable table, do not re-run the request against an
    already-retracted rollup/view).

    Single-writer contract — enforced (round 13): entry acquires every
    configured store's maintenance lock (``sinks.locks.farm_locks``,
    shared with ``maintain_everywhere`` and the merge-family fold entry
    points), so a concurrent fold/maintenance/erase pass raises
    :class:`~localsql_spark.sinks.locks.MaintenanceBusy` instead of
    interleaving with the rewrites here."""
    from localsql_spark.sinks.locks import (configured_store_paths,
                                            farm_locks)
    cfgs = {"primary": primary, "inverted_index": inverted_index,
            "signature_store": signature_store,
            "ivfpq_index": ivfpq_index, "ivf_index": ivf_index,
            "scd2": scd2, "rollup": rollup, "ivm_view": ivm_view,
            "cov_store": cov_store, "feed": feed, "ledger": ledger}
    with farm_locks(configured_store_paths(cfgs)):
        return _erase_pass(spark, keys, primary, inverted_index,
                           signature_store, ivfpq_index, ivf_index, scd2,
                           rollup, ivm_view, cov_store, feed, ledger)


def _erase_pass(spark: SparkSession, keys: DataFrame, primary,
                inverted_index, signature_store, ivfpq_index, ivf_index,
                scd2, rollup, ivm_view, cov_store, feed,
                ledger) -> DataFrame:
    k = normalize_erase_keys(keys).localCheckpoint(eager=True)

    def _audit(name: str, df: DataFrame, ref_col: str) -> DataFrame:
        # the left join against the distinct key set preserves row count
        # (<=1 match per row), so rows_after and erased_refs come out of
        # a single aggregate; the per-store aggregates are DEFERRED and
        # unioned into ONE job at the end — five stores' audits cost one
        # Spark job's overhead, not five
        return (
            df.join(F.broadcast(k),
                    F.col(ref_col) == F.col("_erase_key"), "left")
            .agg(F.lit(name).alias("store"),
                 F.count(F.lit(1)).alias("rows_after"),
                 F.count("_erase_key").alias("erased_refs")))

    def _audit_divergence(name: str, got: DataFrame, exp: DataFrame,
                          join_cols: list[str],
                          val_cols: list[str]) -> tuple:
        # aggregate-store audit: full-outer join the post-erase bytes
        # against the from-scratch recompute on kept rows; a row is
        # DIVERGENT when present on one side only or any value differs
        # (null-safe equality — and the join itself is null-safe so a
        # NULL group compares rather than double-counting).  Evaluated
        # EAGERLY, before the primary erase runs: the kept-rows
        # recompute reads the caller's events/fact frame, and when that
        # frame reads FROM the primary store being erased (a legitimate
        # composition — the test pins it), a deferred evaluation would
        # run against the store's pre-erase FILE LISTING after the
        # rewrite replaced those files (FAILED_READ_FILE, or worse,
        # stale bytes).  Cost: one extra aggregate job per aggregate
        # store; the key-recount audits keep their fused single job.
        g = got.select(*[F.col(c).alias(f"__jg_{c}") for c in join_cols],
                       *[F.col(c).alias(f"__g_{c}") for c in val_cols],
                       F.lit(1).alias("__in_g"))
        e = exp.select(*[F.col(c).alias(f"__je_{c}") for c in join_cols],
                       *[F.col(c).alias(f"__e_{c}") for c in val_cols],
                       F.lit(1).alias("__in_e"))
        cond = F.lit(True)
        for c in join_cols:
            cond = cond & F.col(f"__jg_{c}").eqNullSafe(F.col(f"__je_{c}"))
        same = F.col("__in_g").isNotNull() & F.col("__in_e").isNotNull()
        for c in val_cols:
            same = same & F.col(f"__g_{c}").eqNullSafe(F.col(f"__e_{c}"))
        row = (g.join(e, cond, "full_outer")
               .agg(F.lit(name).alias("store"),
                    F.count("__in_g").alias("rows_after"),
                    F.count(F.when(~same, 1)).alias("erased_refs"))
               .collect()[0])
        return (row["store"], row["rows_after"], row["erased_refs"])

    if ledger is not None:
        # the ledger append runs FIRST and alone: its commit is what
        # blocks late re-ingestion, so no store may be touched before it
        erase_ledger_append(k, ledger["ledger_dir"],
                            ledger.get("batch_id", 0))

    # Independent store erases run OVERLAPPED on delegate threads
    # (sinks.overlap, guide §2.6) instead of serializing each store's
    # chain of small jobs and driver-side commits.  The ordering
    # contract survives as ONE sequential chain: inverted index and the
    # aggregate retractions read pre-erase state (primary bytes, or the
    # caller's events/fact frames which may read FROM the primary
    # store), so they precede the primary rewrite within their chain;
    # the key-addressable stores are documented any-order and get their
    # own chains.  Each task returns (deferred audit frames, eager
    # audit tuples); assembly below reproduces the sequential pass's
    # audit order exactly.
    def _chain_primary_path() -> tuple[list, list]:
        deferred: list[DataFrame] = []
        eager: list[tuple] = []
        if inverted_index is not None:
            from localsql_spark.sinks.inverted_index import (
                index_erase_documents)
            cfg = dict(inverted_index)
            nb = cfg.pop("n_buckets", 16)
            idx_dir = cfg.pop("index_dir")
            docs = None
            if primary is not None:  # text for bucket pruning, pre-erase
                store = read_bucketed_store(spark, primary["base_dir"])
                docs = store.join(
                    F.broadcast(k),
                    F.col(primary["key_col"]) == F.col("_erase_key"),
                    "semi")
            index_erase_documents(spark, idx_dir, k, n_buckets=nb,
                                  docs=docs, **cfg)
            post = (spark.read.option("basePath", idx_dir).parquet(idx_dir)
                    .filter(F.col("tb") != nb))
            deferred.append(_audit("inverted_index", post, "doc_id"))
        if rollup is not None:
            from localsql_spark.sinks.rollup import (erase_from_rollup,
                                                     read_rollup,
                                                     rollup_events)
            cfg = dict(rollup)
            rdir = cfg.pop("rollup_dir")
            events = cfg.pop("events")
            subject_col = cfg.pop("subject_col")
            erase_from_rollup(spark, rdir, events, k, subject_col, **cfg)
            kept_ev = events.join(F.broadcast(k),
                                  F.col(subject_col) == F.col("_erase_key"),
                                  "left_anti")
            eager.append(_audit_divergence(
                "rollup", read_rollup(spark, rdir),
                rollup_events(kept_ev, **cfg),
                ["bucket_ts", "key", "event_date"],
                ["n_events", "sum_value", "min_value", "max_value"]))
        if ivm_view is not None:
            from localsql_spark.sinks.ivm import (erase_from_view,
                                                  join_rollup,
                                                  read_join_view)
            cfg = dict(ivm_view)
            vdir = cfg.pop("view_dir")
            fact = cfg.pop("fact")
            subject_col = cfg.pop("subject_col", cfg["fact_key"])
            erase_from_view(spark, vdir, fact, k, subject_col, **cfg)
            kept_fact = fact.join(F.broadcast(k),
                                  F.col(subject_col) == F.col("_erase_key"),
                                  "left_anti")
            eager.append(_audit_divergence(
                "ivm_view", read_join_view(spark, vdir),
                join_rollup(kept_fact, cfg["dim"], cfg["fact_key"],
                            cfg["dim_key"], cfg["group_col"],
                            cfg["value_col"], cfg.get("n_buckets", 8)),
                ["grp", "grp_bucket"], ["n_rows", "sum_value"]))
        if cov_store is not None:
            from localsql_spark.operators.similarity import covariance_matrix
            from localsql_spark.sinks.cov_store import (cov_from_store,
                                                        cov_store_erase)
            cfg = dict(cov_store)
            cdir = cfg.pop("store_dir")
            vectors = cfg.pop("vectors")
            subject_col = cfg.pop("subject_col", "vec_id")
            vec_col = cfg.get("vec_col", "embedding")
            subjects = vectors.join(
                F.broadcast(k), F.col(subject_col) == F.col("_erase_key"),
                "left_semi")
            cov_store_erase(spark, cdir, subjects,
                            batch_id=cfg.pop("batch_id"), vec_col=vec_col)
            kept_vecs = vectors.join(
                F.broadcast(k), F.col(subject_col) == F.col("_erase_key"),
                "left_anti")
            eager.append(_audit_divergence(
                "cov_store", cov_from_store(spark, cdir),
                covariance_matrix(kept_vecs, vec_col),
                ["j", "k"], ["cov"]))
        if primary is not None:
            erase_keys(spark, primary["base_dir"], k, primary["key_col"],
                       n_buckets=primary.get("n_buckets", 32))
            deferred.append(_audit(
                "primary", read_bucketed_store(spark, primary["base_dir"]),
                primary["key_col"]))
        return deferred, eager

    def _chain_signature_store() -> tuple[list, list]:
        from localsql_spark.operators.dedup import (
            erase_from_signature_store, read_signature_store)
        erase_from_signature_store(spark, signature_store["store_path"], k,
                                   index_path=signature_store.get(
                                       "index_path"))
        deferred = [_audit(
            "signature_store",
            read_signature_store(spark, signature_store["store_path"]),
            "doc_id")]
        idx = (signature_store.get("index_path")
               or f"{signature_store['store_path'].rstrip('/')}_banded")
        if Path(idx).exists():
            deferred.append(_audit("banded_index", spark.read.parquet(idx),
                                   "doc_id"))
        return deferred, []

    def _chain_ivfpq() -> tuple[list, list]:
        from localsql_spark.operators.similarity import ivfpq_erase_vectors
        ivfpq_erase_vectors(spark, ivfpq_index["index_path"], k)
        return [_audit(
            "ivfpq_codes",
            spark.read.parquet(f"{ivfpq_index['index_path']}/codes"),
            "neighbor_id")], []

    def _chain_ivf() -> tuple[list, list]:
        from localsql_spark.operators.similarity import (_ivf_slices,
                                                         ivf_erase_vectors)
        ivf_erase_vectors(spark, ivf_index["index_path"], k)
        return [_audit("ivf_cells",
                       _ivf_slices(spark, ivf_index["index_path"]),
                       "neighbor_id")], []

    def _chain_scd2() -> tuple[list, list]:
        from localsql_spark.sinks.scd2_store import (read_history,
                                                     scd2_erase_keys)
        scd2_erase_keys(spark, scd2["store_dir"], k, scd2["key_col"])
        return [_audit("scd2_history", read_history(spark, scd2["store_dir"]),
                       scd2["key_col"])], []

    def _chain_feed() -> tuple[list, list]:
        from localsql_spark.streaming.foreach_upsert import (erase_from_feed,
                                                             read_feed)
        erase_from_feed(spark, feed["feed_dir"], k, feed["key_col"])
        post_feed = read_feed(spark, feed["feed_dir"])
        if post_feed is not None:
            return [_audit("change_feed", post_feed, feed["key_col"])], []
        return [], []

    from localsql_spark.sinks.locks import delegated_locks
    from localsql_spark.sinks.overlap import run_overlapped

    primary_path_stores = [cfg[key] for cfg, key in (
        (inverted_index, "index_dir"), (rollup, "rollup_dir"),
        (ivm_view, "view_dir"), (cov_store, "store_dir"),
        (primary, "base_dir")) if cfg is not None]
    chains: list[tuple[str, object, list[str]]] = []
    if primary_path_stores:
        chains.append(("primary_path", _chain_primary_path,
                       primary_path_stores))
    for name, fn, cfg, key in (
            ("signature_store", _chain_signature_store, signature_store,
             "store_path"),
            ("ivfpq", _chain_ivfpq, ivfpq_index, "index_path"),
            ("ivf", _chain_ivf, ivf_index, "index_path"),
            ("scd2", _chain_scd2, scd2, "store_dir"),
            ("feed", _chain_feed, feed, "feed_dir")):
        if cfg is not None:
            chains.append((name, fn, [cfg[key]]))

    def _delegated(fn, store_dirs):
        def run():
            with delegated_locks(store_dirs):
                return fn()
        return run

    results = run_overlapped(
        [(name, _delegated(fn, dirs)) for name, fn, dirs in chains],
        spark=spark)
    # canonical audit order == the old sequential pass: eager aggregate
    # audits first (rollup, ivm, cov — primary-path chain order), then
    # the deferred key-recount audits (inv, primary, sigs, banded,
    # ivfpq, ivf, scd2, feed)
    audits = [d for name, _, _ in chains for d in results[name][0]]
    eager_audits = [e for name, _, _ in chains for e in results[name][1]]

    if not audits and not eager_audits:
        return spark.createDataFrame(
            [], "store string, rows_after long, erased_refs long")
    collected = list(eager_audits)
    if audits:
        out = audits[0]
        for a in audits[1:]:
            out = out.unionByName(a)
        # one collect = one job for all key-recount audits (the eager
        # aggregate-store audits above already collected)
        collected += [(r["store"], r["rows_after"], r["erased_refs"])
                      for r in out.collect()]
    return spark.createDataFrame(
        collected, "store string, rows_after long, erased_refs long")


# ---------------------------------------------------------------------------
# Rebuild policy for non-retractable aggregates
# ---------------------------------------------------------------------------

def _swap_rebuilt(dst: Path, built: Path) -> None:
    """Swap a freshly-built store into place — READER-atomically: the
    store path is (or becomes, on first swap) a symlink to a sibling
    generation dir, and the commit is one atomic rename of a fresh
    symlink over the pointer (``sinks.generations``), so a concurrent
    lock-free reader resolves either the old or the new generation,
    never a missing store (r13 verdict task 1: the previous rename pair
    left a store-missing window between its two renames).  The
    displaced generation survives until the NEXT swap, so in-flight
    scans finish on intact files.  A crash before the flip leaves the
    old generation serving and an orphan dir the next commit prunes.
    The schema-evolution registry lives INSIDE the store dir and rides
    into the replacement (same whole-dir-swap obligation as the
    signature-store compactor); callers hold the destination's
    maintenance lock.  Legacy leftovers from the old protocol are swept
    here."""
    from localsql_spark.sinks.generations import commit_store_swap
    from localsql_spark.sinks.schema_evolution import carry_registry

    if dst.exists():
        carry_registry(dst, built)
    shutil.rmtree(dst.parent / f".{dst.name}.pre_rebuild",
                  ignore_errors=True)
    # retain_displaced=False: this is the right-to-be-forgotten swap
    # pattern — the displaced generation holds the PRE-retrain bytes
    # (erased subjects' influence) and must not linger
    commit_store_swap(dst, built, retain_displaced=False)


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
      'n_iter', 'id_col', 'vec_col', 'rotate']}`` —
      :func:`~localsql_spark.operators.similarity.write_ivfpq_index`
      retrains coarse centroids + codebooks AND re-encodes the codes, so
      the erased vectors' influence leaves the quantizers too.  Pass the
      SAME ``rotate`` the index was built with: the retrain recomputes
      the OPQ rotation from the post-erase residuals (stale ``_rotation``
      state is removed on an unrotated retrain).
    - ``ivf_index={'index_path', 'corpus', ['n_cells', 'id_col',
      'vec_col']}`` —
      :func:`~localsql_spark.operators.similarity.write_ivf_index`
      rebuilds the full-vector IVF index INCLUDING its centroid table,
      which stores seed subjects' vectors verbatim.

    Each rebuild trains into a sibling staging dir and commits with ONE
    atomic pointer flip (:func:`_swap_rebuilt` via
    ``sinks.generations``) — readers never see a half-trained OR
    missing store, and a mid-build crash leaves the old generation
    serving.  Single-writer maintenance ENFORCED: each leg holds the
    destination store's maintenance lock (``sinks.locks``) for its
    build+swap, so a concurrent fold on the live store gets
    MaintenanceBusy instead of losing its commit to the swap; a
    schema-registered store's registry is pre-seeded into the staging
    dir (the trainer's own strict write gate then validates the rebuilt
    frame against the evolved contract) and rides through the swap.
    Deliberately a FULL retrain, not incremental:
    that is the definition of this state class, and the cost is
    model-table-bounded per store (one training pass over the kept
    corpus) on whatever cadence the compliance policy sets.

    Returns an audit frame ``(store, rows_after)`` counting the rebuilt
    state rows (NB word rows, HLL register rows, PQ code rows) read back
    from the post-swap bytes."""
    from localsql_spark.sinks.locks import store_lock
    from localsql_spark.sinks.schema_evolution import carry_registry

    rows: list = []
    if nb_model is not None:
        from localsql_spark.operators.selection import (nb_model_read,
                                                        nb_model_update)
        cfg = dict(nb_model)
        dst = Path(cfg.pop("model_dir"))
        docs, positive = cfg.pop("docs"), cfg.pop("positive")
        built = dst.parent / f".{dst.name}.rebuild"
        with store_lock(str(dst)):
            shutil.rmtree(built, ignore_errors=True)
            if dst.exists():
                carry_registry(dst, built)
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
        with store_lock(str(dst)):
            shutil.rmtree(built, ignore_errors=True)
            if dst.exists():
                carry_registry(dst, built)
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
        # write_ivfpq_index is itself atomic (stages into .<name>.build
        # and swaps — the same rename-pair discipline), so the rebuild
        # calls it on the destination directly instead of wrapping a
        # second redundant staging layer; the lock is held here and
        # reentrant under the writer's own acquisition
        with store_lock(str(dst)):
            write_ivfpq_index(corpus, str(dst), **cfg)
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
        with store_lock(str(dst)):
            shutil.rmtree(built, ignore_errors=True)
            write_ivf_index(corpus, str(built), **cfg)
            _swap_rebuilt(dst, built)
        rows.append(("ivf_index",
                     _ivf_slices(spark, str(dst)).count()))
    return spark.createDataFrame(rows, "store string, rows_after long")
