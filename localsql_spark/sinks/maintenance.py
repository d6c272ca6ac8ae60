"""Composed store maintenance — the nightly pass an operator of this
engine actually runs.

Every persisted store in the package has grown its own maintenance entry
points: crash-heal (`sinks.merge.recover_pending_merge`, the SCD2
orphaned-swap sweep, `streaming.foreach_upsert.recover_feed_erase`),
small-files compaction (`sinks.merge.compact_partitions`,
`operators.dedup.compact_signature_store`,
`sinks.scd2_store.compact_scd2_store`,
`operators.similarity.compact_ivf_index`,
`streaming.batch_dirs.compact_batches`), retention
(`sinks.merge.expire_partitions`, `streaming.foreach_upsert.prune_feed`,
`sinks.erase.compact_erase_ledger`), and sidecar sync
(`operators.dedup.ensure_banded_index`).  What was missing — the
round-11 review's top gap — is the single pass that runs them all under
one audit, symmetric to :func:`localsql_spark.sinks.erase.
erase_everywhere` composing the erases: a fleet operator does not script
eleven store-specific calls nightly, they run ONE maintenance job and
read ONE audit frame.

:func:`maintain_everywhere` walks the same store map as
``erase_everywhere`` and applies, per store, the fixed discipline
**heal → retain → compact → sync**:

- **heal** first: a crashed predecessor's committed-but-unapplied
  manifest (or orphaned swap backup) must be rolled forward before any
  rewrite, or the compaction would rebuild from a torn view.  Every
  heal here is the store's own idempotent recovery entry point.
- **retain** second: enforce the store's retention policy — the
  metadata-only :func:`~localsql_spark.sinks.merge.expire_partitions`
  for date-partitioned stores, the consumer-watermark-gated
  :func:`~localsql_spark.streaming.foreach_upsert.prune_feed` for the
  CDC feed, generation-folding for the erase ledger.  Retention runs
  BEFORE compaction so a partition about to expire is never first
  rewritten and then deleted — aged partitions are where sliver debris
  accumulates, and the metadata-only expiry makes their debris vanish
  for free (review round 12: the original compact-first order paid a
  staged rewrite per expiring over-limit partition, pure wasted I/O).
- **compact** third: fold small-files debris (sliver part files from
  pre-clustered writes, per-micro-batch landing dirs, IVF delta dirs)
  down to the store's steady-state layout.  Compactions are gated on a
  DEBRIS CENSUS (a driver-side directory walk, no Spark job): a clean
  store is never read, so the pass over a quiet store costs directory
  listings only — cost tracks debris, not store size (SCALE.md row).
- **sync** last: bring derived sidecars up to date with the store the
  earlier steps may have rewritten (the banded LSH index's
  :func:`~localsql_spark.operators.dedup.ensure_banded_index`; a store
  compaction rewrites the file listing, so the sync after one is a full
  sidecar rebuild — the documented policy that also clears any
  duplicate rows a crashed append left behind).

Single-writer contract — ENFORCED, not documented (round 13): the pass
CANNOT run concurrently with the merge-family folds, an erase pass, or
another maintenance pass on the same stores.  Entry acquires every
configured store's advisory maintenance lock (``sinks.locks.farm_locks``
— sorted acquisition, all-or-nothing, stale-break after 1h), the same
locks ``erase_everywhere`` and the merge-family fold entry points
(``merge_into_partitioned``, ``erase_keys``, ``compact_partitions``,
``expire_partitions``) take; a concurrent caller gets
:class:`~localsql_spark.sinks.locks.MaintenanceBusy` instead of an
interleaved rewrite.  Locks are per-process reentrant, which is how
this pass composes the individually-locked entry points without
deadlocking itself.  Stores the
pass finds clean are untouched byte-for-byte (pinned by test), and the
namespaces the entry points deliberately never fold (the cov store's
``erase_<id>`` retraction dirs, unconsumed feed batches, the newest
``keep_last`` landing dirs) stay untouched here too.

Returns one audit frame ``(store, action, units)`` — one row per
applicable action per configured store, ``units`` = work actually done
(partitions rewritten, dirs folded, partitions expired, pending
recoveries applied; 0 = store was already clean).  The audit is built
from the entry points' own driver-side return values: reading it costs
no Spark job.

At 100 TB: every compaction here reads only its debris (over-limit
partitions, the un-folded batch tail, non-superseded deltas), every
retention step is metadata-only or watermark-bounded, and every heal is
a rename replay — the nightly pass over a petabyte store farm is
bounded by one day's ingest debris, which is the property that makes
running it nightly affordable at all.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = ["maintain_everywhere"]


def _flat_parquet_count(path: Path) -> int:
    return sum(1 for _ in path.glob("*.parquet"))


def maintain_everywhere(spark: SparkSession, *,
                        primary: dict | None = None,
                        inverted_index: dict | None = None,
                        signature_store: dict | None = None,
                        scd2: dict | None = None,
                        rollup: dict | None = None,
                        ivm_view: dict | None = None,
                        cov_store: dict | None = None,
                        ivf_index: dict | None = None,
                        ivfpq_index: dict | None = None,
                        feed: dict | None = None,
                        ledger: dict | None = None,
                        nb_model: dict | None = None,
                        sketch_view: dict | None = None) -> DataFrame:
    """One composed heal → retain → compact → sync pass over every
    configured store (module docstring has the discipline and the
    scale argument).  Entry acquires every configured store's
    maintenance lock — a concurrent fold/erase/maintenance pass on any
    of them raises :class:`~localsql_spark.sinks.locks.MaintenanceBusy`
    instead of interleaving.  Store configs mirror
    ``erase_everywhere``'s map; pass only what exists:

    - ``primary={'base_dir', ['partition_col'='kb'], ['max_files'=1],
      ['retention': {'cutoff', ['partition_col'], ['parse']}]}`` — any
      hive-partitioned merge-sink store.  ``retention`` drops whole
      partitions below ``cutoff`` (only meaningful when the store
      partitions on a retention-ordered column; a key-bucketed store
      omits it).
    - ``inverted_index={'index_dir', ['max_files'=1]}`` — term-bucket
      (tb) partitions, including the stats row's bucket.
    - ``signature_store={'store_path', ['index_path'], ['max_files'=8],
      ['n', 'bands', 'bucket_cap']}`` — heal the whole-store swap,
      compact per-batch landing dirs / sliver files into flat parquet
      (gated: the whole-store rewrite runs only when the census finds
      batch dirs, a generation layout, or more than ``max_files`` flat
      files), then ``ensure_banded_index`` syncs the banded sidecar
      when ``index_path`` is given (units: 0 = fresh, 1 = appended or
      rebuilt).
    - ``scd2={'store_dir', ['target_files'=4]}`` — orphaned-swap sweep,
      then fold committed closed dirs below the latest open batch.
    - ``rollup={'rollup_dir', ['max_files'=1], ['retain_from']}`` —
      event_date partitions; ``retain_from`` ('YYYY-MM-DD') applies the
      TTL via the metadata-only expiry.
    - ``ivm_view={'view_dir', ['max_files'=1]}`` — grp_bucket
      partitions.
    - ``cov_store={'store_dir', ['keep_last'=1], ['target_files'=1]}``
      — fold ``batch_<id>`` partial dirs into a generation; the
      ``erase_<id>`` retraction namespace is NEVER folded (first-write-
      wins retractions must survive every compaction — see
      ``cov_store_erase``).
    - ``ivf_index={'index_path'}`` — fold delta batches into a new base
      generation (``compact_ivf_index``).
    - ``ivfpq_index={'index_path', ['max_files'=1]}`` — heal + compact
      the cell-partitioned codes table (model tables are tiny,
      single-file, and rewritten only by retrain).
    - ``feed={'feed_dir', ['keep_last'=1]}`` — heal a torn feed erase,
      then prune batches every registered consumer has consumed.
    - ``ledger={'ledger_dir', ['keep_last'=1]}`` — fold old request
      dirs into one generation (content is never deleted; see
      ``compact_erase_ledger``'s retention-window warning).
    - ``nb_model={'model_dir', ['max_files'=1]}`` — the NB count
      model's wb partitions (incl. the reserved doc-count bucket).
    - ``sketch_view={'view_dir', ['max_files'=1]}`` — the diversity
      sketch view's gb partitions.

    Returns ``(store, action, units)`` with actions drawn from
    ``heal | compact | retain | sync``.
    """
    from localsql_spark.sinks.locks import (configured_store_paths,
                                            farm_locks)
    cfgs = {"primary": primary, "inverted_index": inverted_index,
            "signature_store": signature_store, "scd2": scd2,
            "rollup": rollup, "ivm_view": ivm_view,
            "cov_store": cov_store, "ivf_index": ivf_index,
            "ivfpq_index": ivfpq_index, "feed": feed, "ledger": ledger,
            "nb_model": nb_model, "sketch_view": sketch_view}
    with farm_locks(configured_store_paths(cfgs)):
        return _maintain_pass(spark, primary, inverted_index,
                              signature_store, scd2, rollup, ivm_view,
                              cov_store, ivf_index, ivfpq_index, feed,
                              ledger, nb_model, sketch_view)


def _maintain_pass(spark: SparkSession, primary, inverted_index,
                   signature_store, scd2, rollup, ivm_view, cov_store,
                   ivf_index, ivfpq_index, feed, ledger, nb_model,
                   sketch_view) -> DataFrame:
    # Each store's heal -> retain -> compact -> sync chain is independent
    # of every other store's (each touches only its own dirs), so the
    # chains run OVERLAPPED on delegate threads (sinks.overlap, guide
    # §2.6) instead of serializing N chains of small jobs and their
    # driver-side planning/commit work.  Audit rows are assembled in the
    # same canonical store order as the old sequential pass, so the
    # returned frame is identical row-for-row.
    from localsql_spark.sinks.locks import delegated_locks
    from localsql_spark.sinks.overlap import run_overlapped

    def _primary() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.merge import (compact_partitions,
                                                expire_partitions,
                                                recover_pending_merge)
        rows: list[tuple[str, str, int]] = []
        pcol = primary.get("partition_col", "kb")
        rows.append(("primary", "heal",
                     int(recover_pending_merge(primary["base_dir"]))))
        ret = primary.get("retention")
        if ret is not None:  # retain BEFORE compact (module docstring)
            rows.append(("primary", "retain", len(expire_partitions(
                primary["base_dir"], ret.get("partition_col", pcol),
                ret["cutoff"], parse=ret.get("parse")))))
        rows.append(("primary", "compact", len(compact_partitions(
            spark, primary["base_dir"], pcol,
            max_files=primary.get("max_files", 1)))))
        return rows

    def _inverted_index() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.merge import (compact_partitions,
                                                recover_pending_merge)
        rows = [("inverted_index", "heal",
                 int(recover_pending_merge(inverted_index["index_dir"])))]
        rows.append(("inverted_index", "compact", len(compact_partitions(
            spark, inverted_index["index_dir"], "tb",
            max_files=inverted_index.get("max_files", 1)))))
        return rows

    def _signature_store() -> list[tuple[str, str, int]]:
        from localsql_spark.operators.dedup import (_heal_store_swap,
                                                    compact_signature_store,
                                                    ensure_banded_index)
        rows: list[tuple[str, str, int]] = []
        sp = Path(signature_store["store_path"])
        existed = sp.exists()
        _heal_store_swap(str(sp))
        healed = int(sp.exists() and not existed)
        # a COMPLETED erase/compaction swap that crashed before its final
        # cleanup leaves .NAME.old holding the full PRE-swap store —
        # after an erase that is the erased subjects' data, which must
        # not survive the nightly pass (_heal_store_swap deliberately
        # no-ops when the store exists: rolling BACK would undo the
        # committed swap; the leftover is cleanup debris, not state)
        stale_old = sp.parent / f".{sp.name}.old"
        if sp.exists() and stale_old.exists():
            import shutil as _sh
            _sh.rmtree(stale_old, ignore_errors=True)
            healed += 1
        # generation-layout debris: a commit that renamed its build into
        # a generation dir but crashed before the pointer flip leaves an
        # orphan the next swap would prune — the nightly pass sweeps it
        # now (the lock this pass holds excludes a live committer)
        from localsql_spark.sinks.generations import prune_generations
        healed += prune_generations(str(sp))
        rows.append(("signature_store", "heal", healed))
        # debris census: per-batch landing dirs, a generation layout
        # (mixed read path), or more flat files than steady state —
        # only then is the whole-store compaction swap worth its read
        debris = (any(sp.glob("batch_*")) or any(sp.glob("upto_*"))
                  or _flat_parquet_count(sp)
                  > signature_store.get("max_files", 8)) if sp.exists() \
            else False
        if debris:
            # coalesce to the census threshold so the compacted layout
            # passes the same census next pass (idempotence)
            compact_signature_store(
                spark, str(sp),
                target_files=signature_store.get("max_files", 8))
        rows.append(("signature_store", "compact", int(debris)))
        if signature_store.get("index_path"):
            kw = {k: signature_store[k] for k in ("n", "bands", "bucket_cap")
                  if k in signature_store}
            state = ensure_banded_index(spark, str(sp),
                                        signature_store["index_path"], **kw)
            rows.append(("signature_store", "sync",
                         int(state != "fresh")))
        return rows

    def _scd2() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.scd2_store import (_recover_orphaned_swaps,
                                                     compact_scd2_store)
        store = Path(scd2["store_dir"])
        orphans = len(list(store.glob("*/.*.old")))
        _recover_orphaned_swaps(store)
        rows = [("scd2", "heal", orphans)]
        rows.append(("scd2", "compact", compact_scd2_store(
            spark, scd2["store_dir"],
            target_files=scd2.get("target_files", 4))))
        return rows

    def _rollup() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.merge import (compact_partitions,
                                                expire_partitions,
                                                recover_pending_merge)
        rows = [("rollup", "heal",
                 int(recover_pending_merge(rollup["rollup_dir"])))]
        if rollup.get("retain_from") is not None:
            # retain BEFORE compact: expiring event_date partitions are
            # exactly where sliver debris ages — drop them metadata-only
            # instead of rewriting them first (module docstring)
            rows.append(("rollup", "retain", len(expire_partitions(
                rollup["rollup_dir"], "event_date",
                rollup["retain_from"]))))
        rows.append(("rollup", "compact", len(compact_partitions(
            spark, rollup["rollup_dir"], "event_date",
            max_files=rollup.get("max_files", 1)))))
        return rows

    def _ivm_view() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.merge import (compact_partitions,
                                                recover_pending_merge)
        rows = [("ivm_view", "heal",
                 int(recover_pending_merge(ivm_view["view_dir"])))]
        rows.append(("ivm_view", "compact", len(compact_partitions(
            spark, ivm_view["view_dir"], "grp_bucket",
            max_files=ivm_view.get("max_files", 1)))))
        return rows

    def _cov_store() -> list[tuple[str, str, int]]:
        from localsql_spark.streaming.batch_dirs import compact_batches
        return [("cov_store", "compact", compact_batches(
            spark, cov_store["store_dir"],
            keep_last=cov_store.get("keep_last", 1),
            target_files=cov_store.get("target_files", 1)))]

    def _ivf_index() -> list[tuple[str, str, int]]:
        from localsql_spark.operators.similarity import compact_ivf_index
        return [("ivf_index", "compact",
                 compact_ivf_index(spark, ivf_index["index_path"]))]

    def _ivfpq_index() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.merge import (compact_partitions,
                                                recover_pending_merge)
        codes = f"{ivfpq_index['index_path'].rstrip('/')}/codes"
        rows = [("ivfpq_index", "heal",
                 int(recover_pending_merge(codes)))]
        rows.append(("ivfpq_index", "compact", len(compact_partitions(
            spark, codes, "cell",
            max_files=ivfpq_index.get("max_files", 1)))))
        return rows

    def _feed() -> list[tuple[str, str, int]]:
        from localsql_spark.streaming.foreach_upsert import (
            prune_feed, recover_feed_erase)
        rows = [("feed", "heal",
                 int(recover_feed_erase(feed["feed_dir"])))]
        rows.append(("feed", "retain", prune_feed(
            feed["feed_dir"], keep_last=feed.get("keep_last", 1))))
        return rows

    def _ledger() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.erase import compact_erase_ledger
        return [("ledger", "retain", compact_erase_ledger(
            spark, ledger["ledger_dir"],
            keep_last=ledger.get("keep_last", 1)))]

    def _nb_model() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.merge import (compact_partitions,
                                                recover_pending_merge)
        rows = [("nb_model", "heal",
                 int(recover_pending_merge(nb_model["model_dir"])))]
        rows.append(("nb_model", "compact", len(compact_partitions(
            spark, nb_model["model_dir"], "wb",
            max_files=nb_model.get("max_files", 1)))))
        return rows

    def _sketch_view() -> list[tuple[str, str, int]]:
        from localsql_spark.sinks.merge import (compact_partitions,
                                                recover_pending_merge)
        rows = [("sketch_view", "heal",
                 int(recover_pending_merge(sketch_view["view_dir"])))]
        rows.append(("sketch_view", "compact", len(compact_partitions(
            spark, sketch_view["view_dir"], "gb",
            max_files=sketch_view.get("max_files", 1)))))
        return rows

    # canonical order == the old sequential pass's audit order
    chains: list[tuple[str, object, str]] = [
        (name, fn, cfg[path_key]) for name, fn, cfg, path_key in (
            ("primary", _primary, primary, "base_dir"),
            ("inverted_index", _inverted_index, inverted_index,
             "index_dir"),
            ("signature_store", _signature_store, signature_store,
             "store_path"),
            ("scd2", _scd2, scd2, "store_dir"),
            ("rollup", _rollup, rollup, "rollup_dir"),
            ("ivm_view", _ivm_view, ivm_view, "view_dir"),
            ("cov_store", _cov_store, cov_store, "store_dir"),
            ("ivf_index", _ivf_index, ivf_index, "index_path"),
            ("ivfpq_index", _ivfpq_index, ivfpq_index, "index_path"),
            ("feed", _feed, feed, "feed_dir"),
            ("ledger", _ledger, ledger, "ledger_dir"),
            ("nb_model", _nb_model, nb_model, "model_dir"),
            ("sketch_view", _sketch_view, sketch_view, "view_dir"),
        ) if cfg is not None]

    def _delegated(fn, store_dir):
        def run():
            with delegated_locks([store_dir]):
                return fn()
        return run

    results = run_overlapped(
        [(name, _delegated(fn, store_dir))
         for name, fn, store_dir in chains], spark=spark)
    rows = [row for name, _, _ in chains for row in results[name]]

    if not rows:
        return spark.createDataFrame(
            [], "store string, action string, units long")
    return spark.createDataFrame(
        [(s, a, int(u)) for s, a, u in rows],
        "store string, action string, units long")
