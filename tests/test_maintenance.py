"""maintain_everywhere — the composed heal/compact/retain/sync pass
(sinks/maintenance.py), symmetric to erase_everywhere: content
preserved on every store it touches, layout goals met, protected
namespaces and clean stores byte-stable, and a second pass is a no-op.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import functions as F


def _docs(spark, n=40):
    rows = [(i, f"doc {i} body " + " ".join(
        f"w{(i * 7 + j) % 23}" for j in range(12)) +
        (" table join" if i % 3 == 0 else " window hash"))
        for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tree_digest(root: Path) -> dict[str, str]:
    """Relative path -> content md5 for every file under root."""
    out = {}
    for p in sorted(root.rglob("*")):
        if p.is_file():
            out[str(p.relative_to(root))] = hashlib.md5(
                p.read_bytes()).hexdigest()
    return out


def test_maintain_everywhere_full_surface(spark, tmp_path):
    from localsql_spark.operators.dedup import (compute_signatures,
                                                read_signature_store,
                                                write_signature_store)
    from localsql_spark.operators.similarity import (_ivf_slices,
                                                     append_ivf_index,
                                                     write_ivf_index)
    from localsql_spark.sinks.cov_store import (cov_from_store,
                                                cov_store_erase,
                                                cov_store_fold)
    from localsql_spark.sinks.erase import bucket_of, erase_ledger_append
    from localsql_spark.sinks.inverted_index import index_add_documents
    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view
    from localsql_spark.sinks.maintenance import maintain_everywhere
    from localsql_spark.sinks.rollup import (maintain_rollup, read_rollup,
                                             rollup_events)
    from localsql_spark.sinks.scd2_store import (apply_batch, init_store,
                                                 read_history)
    from localsql_spark.streaming.batch_dirs import read_batches
    from localsql_spark.streaming.foreach_upsert import commit_feed_offset

    docs = _docs(spark)

    # primary: sliver-filed kb store (the pre-round-10 layout)
    base = tmp_path / "primary"
    (docs.withColumn("kb", bucket_of(F.col("doc_id"), 8))
     .repartition(16).write.partitionBy("kb").parquet(str(base)))
    assert any(len(list(d.glob("*.parquet"))) > 1
               for d in base.glob("kb=*"))

    # inverted index: two adds -> >=2 files in shared tb partitions
    idx = tmp_path / "inv"
    index_add_documents(spark, str(idx), docs.filter("doc_id < 20"))
    index_add_documents(spark, str(idx), docs.filter("doc_id >= 20"))
    # the clustered folds write one file per partition — split one
    # partition's file to simulate an external writer's sliver debris
    import shutil as _sh
    d0 = sorted(idx.glob("tb=*"))[0]
    split_rows = spark.read.parquet(str(d0))
    split_tmp = tmp_path / "split"
    split_rows.repartition(2).write.parquet(str(split_tmp))
    for f in d0.glob("*.parquet"):
        f.unlink()
    for i, f in enumerate(sorted(split_tmp.glob("*.parquet"))):
        _sh.copy(f, d0 / f"part-split-{i}.parquet")
    pre_postings = {(r.term, r.doc_id, r.tf) for r in
                    spark.read.option("basePath", str(idx))
                    .parquet(str(idx)).filter(F.col("tb") != 16)
                    .select("term", "doc_id", "tf").collect()}

    # signature store: 3 flat files + stale banded sidecar
    sig = tmp_path / "sigs"
    write_signature_store(docs.filter("doc_id < 15"), str(sig))
    write_signature_store(docs.filter("doc_id >= 15 and doc_id < 30"),
                          str(sig), mode="append")
    write_signature_store(docs.filter("doc_id >= 30"), str(sig),
                          mode="append")
    banded = tmp_path / "sigs_banded"
    from localsql_spark.operators.dedup import ensure_banded_index
    assert ensure_banded_index(spark, str(sig), str(banded)) == "rebuilt"

    # scd2: init + two batches -> foldable closed dirs
    scd2 = tmp_path / "scd2"
    dim = docs.select("doc_id", F.substring("text", 1, 8).alias("attr"))
    init_store(dim, str(scd2), ["doc_id"], ["attr"], 1_000_000)
    apply_batch(spark, str(scd2),
                docs.filter("doc_id % 2 = 0")
                .select("doc_id", F.lit("V2").alias("attr")),
                ["doc_id"], ["attr"], 2_000_000, batch_id=1)
    apply_batch(spark, str(scd2),
                docs.filter("doc_id % 4 = 0")
                .select("doc_id", F.lit("V3").alias("attr")),
                ["doc_id"], ["attr"], 3_000_000, batch_id=2)
    apply_batch(spark, str(scd2),
                docs.filter("doc_id % 8 = 0")
                .select("doc_id", F.lit("V4").alias("attr")),
                ["doc_id"], ["attr"], 4_000_000, batch_id=3)
    pre_hist = {tuple(r) for r in read_history(spark, str(scd2)).collect()}

    # rollup over 3 dates; retention drops the oldest
    ev = spark.createDataFrame(
        [(i, f"t{i % 3}", float(i),
          f"2024-01-0{1 + i % 3} 0{i % 9}:30:00") for i in range(60)],
        "eid long, event_type string, value double, ts_s string") \
        .select("eid", "event_type", "value",
                F.col("ts_s").cast("timestamp").alias("ts"))
    roll = tmp_path / "roll"
    maintain_rollup(spark, str(roll), ev, grain="hour")

    # ivm view: CLEAN store -> byte-stability pin
    view = tmp_path / "view"
    dimtab = spark.createDataFrame([(i, f"g{i % 4}") for i in range(10)],
                                   "dk long, grp string")
    fact = spark.createDataFrame(
        [(i, i % 10, float(i)) for i in range(50)],
        "fid long, dk long, v double")
    maintain_join_view(spark, str(view), fact, dimtab, "dk", "dk",
                       "grp", "v", n_buckets=4)
    pre_view = {tuple(r) for r in read_join_view(spark, str(view)).collect()}

    # cov store: 3 batch dirs + one retraction (protected namespace)
    emb = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 7) for j in range(4)])
         for i in range(30)], "vec_id long, embedding array<double>")
    cov = tmp_path / "cov"
    for b in range(3):
        cov_store_fold(spark, str(cov),
                       emb.filter(F.col("vec_id") % 3 == b), b)
    cov_store_erase(spark, str(cov),
                    emb.filter("vec_id = 29"), batch_id=0)
    pre_cov = {(r.j, r.k, r.cov)
               for r in cov_from_store(spark, str(cov)).collect()}

    # ivf index: base + one delta
    ivf = tmp_path / "ivf"
    write_ivf_index(emb.filter("vec_id < 24"), str(ivf), n_cells=4)
    append_ivf_index(spark, str(ivf), emb.filter("vec_id >= 24"),
                     batch_id=1)
    pre_ivf = {(r.neighbor_id, r.cell) for r in
               _ivf_slices(spark, str(ivf))
               .select("neighbor_id", "cell").collect()}

    # feed: 3 write-once batch dirs, consumer caught up through id 2
    feed = tmp_path / "feed"
    for b in range(3):
        (docs.filter(F.col("doc_id") % 3 == b)
         .withColumn("op", F.lit("upsert"))
         .write.parquet(str(feed / f"batch_{b}")))
    commit_feed_offset(str(feed), "etl", 2)

    # NB model + sketch view: CLEAN merge-protocol stores (clustered
    # folds) -> byte-stability legs of the pass
    from localsql_spark.operators.selection import nb_model_update
    from localsql_spark.sinks.sketch_view import (sketch_view_read,
                                                  sketch_view_update)
    nb = tmp_path / "nb"
    nb_model_update(spark, str(nb), docs.select(
        "doc_id", "text", (F.col("doc_id") % 2 == 0).alias("pos")),
        F.col("pos"), n_buckets=4)
    sk = tmp_path / "sketch"
    sketch_view_update(spark, str(sk),
                       docs.withColumn("source",
                                       (F.col("doc_id") % 3).cast("string")))
    pre_sketch = {tuple(r) for r in
                  sketch_view_read(spark, str(sk)).collect()}

    # ledger: 3 request dirs
    led = tmp_path / "ledger"
    for b in range(3):
        erase_ledger_append(
            spark.createDataFrame([(100 + b,)], "doc_id long"),
            str(led), b)
    pre_ledger = {tuple(r) for r in
                  read_batches(spark, str(led)).collect()}

    audit = maintain_everywhere(
        spark,
        primary={"base_dir": str(base)},
        inverted_index={"index_dir": str(idx)},
        signature_store={"store_path": str(sig), "index_path": str(banded),
                         "max_files": 2},
        scd2={"store_dir": str(scd2)},
        rollup={"rollup_dir": str(roll), "retain_from": "2024-01-02"},
        ivm_view={"view_dir": str(view)},
        cov_store={"store_dir": str(cov)},
        ivf_index={"index_path": str(ivf)},
        feed={"feed_dir": str(feed)},
        ledger={"ledger_dir": str(led)},
        nb_model={"model_dir": str(nb)},
        sketch_view={"view_dir": str(sk)},
    )
    a = {(r.store, r.action): r.units for r in audit.collect()}

    # work happened where debris existed
    assert a[("primary", "compact")] > 0
    assert a[("inverted_index", "compact")] > 0
    assert a[("signature_store", "compact")] == 1
    assert a[("signature_store", "sync")] == 1  # rebuilt after compaction
    assert a[("scd2", "compact")] >= 2
    assert a[("rollup", "retain")] == 1  # 2024-01-01 expired
    assert a[("ivm_view", "compact")] == 0  # clean store untouched
    assert a[("nb_model", "compact")] == 0
    assert a[("sketch_view", "compact")] == 0
    assert a[("cov_store", "compact")] == 2  # batches 0,1 folded
    assert a[("ivf_index", "compact")] == 1
    assert a[("feed", "retain")] == 2  # batches 0,1 pruned
    assert a[("ledger", "retain")] == 2

    # layout goals
    assert all(len(list(d.glob("*.parquet"))) <= 1
               for d in base.glob("kb=*"))
    assert all(len(list(d.glob("*.parquet"))) <= 1
               for d in idx.glob("tb=*"))
    assert not any(sig.glob("batch_*")) and not any(sig.glob("upto_*"))

    # content preserved / retention applied
    got_docs = {(r.doc_id, r.text) for r in
                spark.read.option("basePath", str(base)).parquet(str(base))
                .select("doc_id", "text").collect()}
    assert got_docs == {(r.doc_id, r.text) for r in docs.collect()}
    post_postings = {(r.term, r.doc_id, r.tf) for r in
                     spark.read.option("basePath", str(idx))
                     .parquet(str(idx)).filter(F.col("tb") != 16)
                     .select("term", "doc_id", "tf").collect()}
    assert post_postings == pre_postings
    got_sigs = {(r.doc_id, tuple(r.sig)) for r in
                read_signature_store(spark, str(sig)).collect()}
    want_sigs = {(r.doc_id, tuple(r.sig)) for r in
                 compute_signatures(docs).collect()}
    assert got_sigs == want_sigs
    assert {tuple(r) for r in
            read_history(spark, str(scd2)).collect()} == pre_hist
    roll_cols = ["bucket_ts", "key", "n_events", "sum_value",
                 "min_value", "max_value"]
    got_roll = {tuple(r) for r in read_rollup(spark, str(roll))
                .select(*roll_cols,
                        F.col("event_date").cast("string")).collect()}
    want_roll = {tuple(r) for r in rollup_events(
        ev.filter(F.to_date("ts") >= F.lit("2024-01-02")))
        .select(*[F.col(c).cast("decimal(28,6)") if c == "sum_value"
                  else F.col(c) for c in roll_cols],
                F.col("event_date").cast("string")).collect()}
    assert got_roll == want_roll
    assert {tuple(r) for r in
            read_join_view(spark, str(view)).collect()} == pre_view
    assert {(r.j, r.k, r.cov) for r in
            cov_from_store(spark, str(cov)).collect()} == pre_cov
    assert {(r.neighbor_id, r.cell) for r in
            _ivf_slices(spark, str(ivf))
            .select("neighbor_id", "cell").collect()} == pre_ivf
    assert {tuple(r) for r in
            read_batches(spark, str(led)).collect()} == pre_ledger
    assert {tuple(r) for r in
            sketch_view_read(spark, str(sk)).collect()} == pre_sketch

    # protected namespaces survived: the retraction dir and the newest
    # feed batch are byte-identical, pruned feed batches are gone
    assert (cov / "erase_0" / "_SUCCESS").exists()
    assert not (feed / "batch_0").exists()
    assert not (feed / "batch_1").exists()
    assert (feed / "batch_2").exists()

    # idempotence: a second pass does nothing and moves no byte
    before = _tree_digest(tmp_path)
    audit2 = maintain_everywhere(
        spark,
        primary={"base_dir": str(base)},
        inverted_index={"index_dir": str(idx)},
        signature_store={"store_path": str(sig), "index_path": str(banded),
                         "max_files": 2},
        scd2={"store_dir": str(scd2)},
        rollup={"rollup_dir": str(roll), "retain_from": "2024-01-02"},
        ivm_view={"view_dir": str(view)},
        cov_store={"store_dir": str(cov)},
        ivf_index={"index_path": str(ivf)},
        feed={"feed_dir": str(feed)},
        ledger={"ledger_dir": str(led)},
        nb_model={"model_dir": str(nb)},
        sketch_view={"view_dir": str(sk)},
    )
    assert all(r.units == 0 for r in audit2.collect())
    assert _tree_digest(tmp_path) == before


def test_maintain_clears_completed_swap_backup(spark, tmp_path):
    """A COMPLETED signature-store swap that crashed before its final
    cleanup leaves .NAME.old holding the full PRE-swap store — after an
    erase, the erased subjects' data.  The nightly pass's heal leg must
    clear it (review round 12: _heal_store_swap deliberately no-ops
    when the store exists, so nothing else ever removed it)."""
    from localsql_spark.operators.dedup import (read_signature_store,
                                                write_signature_store)
    from localsql_spark.sinks.maintenance import maintain_everywhere

    docs = _docs(spark, 12)
    sig = tmp_path / "sigs"
    write_signature_store(docs.filter("doc_id >= 4"), str(sig))
    # simulate the crash leftover: pre-erase backup next to the store
    import shutil
    old = tmp_path / ".sigs.old"
    shutil.copytree(sig, old)
    pre = {r.doc_id for r in read_signature_store(spark, str(sig)).collect()}

    audit = maintain_everywhere(
        spark, signature_store={"store_path": str(sig)})
    a = {(r.store, r.action): r.units for r in audit.collect()}
    assert a[("signature_store", "heal")] == 1
    assert not old.exists()
    assert {r.doc_id for r in
            read_signature_store(spark, str(sig)).collect()} == pre
    # second pass: nothing left to heal
    audit2 = maintain_everywhere(
        spark, signature_store={"store_path": str(sig)})
    a2 = {(r.store, r.action): r.units for r in audit2.collect()}
    assert a2[("signature_store", "heal")] == 0


def test_maintain_everywhere_heals_crashed_merge(spark, tmp_path):
    """A committed-but-unapplied merge manifest (crash after the
    manifest rename, before the partition swaps) rolls FORWARD before
    compaction — the maintained store shows the staged content."""
    import json

    from localsql_spark.sinks.erase import write_bucketed_store
    from localsql_spark.sinks.maintenance import maintain_everywhere

    docs = _docs(spark, 20)
    base = tmp_path / "store"
    write_bucketed_store(docs, str(base), "doc_id", n_buckets=4)

    # build the crash state by hand: a staged rewrite of kb=0 with
    # prefixed text, plus the committed manifest — exactly what a crash
    # between commit_staged_partitions' rename and the swaps leaves
    pre = spark.read.option("basePath", str(base)).parquet(str(base))
    kb0 = pre.filter(F.col("kb") == 0).withColumn(
        "text", F.concat(F.lit("NEW "), F.col("text")))
    n0 = kb0.count()
    assert n0 > 0
    staging = base.parent / f".{base.name}.staging"
    (kb0.repartition(F.col("kb")).write.mode("overwrite")
     .partitionBy("kb").parquet(str(staging)))
    (base.parent / f".{base.name}.commit.json").write_text(json.dumps(
        {"staging": staging.name, "partitions": ["kb=0"], "removed": []}))

    audit = maintain_everywhere(spark, primary={"base_dir": str(base)})
    a = {(r.store, r.action): r.units for r in audit.collect()}
    assert a[("primary", "heal")] == 1
    got = spark.read.option("basePath", str(base)).parquet(str(base))
    assert got.count() == 20
    assert got.filter(F.col("text").startswith("NEW ")).count() == n0
    assert not (base.parent / f".{base.name}.commit.json").exists()


def test_single_writer_lock_enforced(spark, tmp_path):
    """Verdict r13 task 3: the single-writer contract is a LOCK, not a
    docstring.  A held lock makes the composed passes and every
    merge-family fold entry point raise MaintenanceBusy (never
    interleave); acquisition is all-or-nothing across a farm; a stale
    lock (crashed holder) is broken and the pass proceeds; the passes
    re-enter their own locks when composing the fold entry points."""
    import os
    import time

    import pytest
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import (bucket_of, erase_everywhere,
                                            erase_keys,
                                            write_bucketed_store)
    from localsql_spark.sinks.locks import (MaintenanceBusy, lock_path_for,
                                            store_lock)
    from localsql_spark.sinks.maintenance import maintain_everywhere
    from localsql_spark.sinks.merge import (compact_partitions,
                                            expire_partitions,
                                            merge_into_partitioned)

    docs = spark.createDataFrame(
        [(i, f"t{i}", 1) for i in range(8)],
        "doc_id long, text string, version long")
    base = str(tmp_path / "store")
    write_bucketed_store(docs, base, "doc_id", n_buckets=2)

    # simulate another live process holding the store's lock
    lock = lock_path_for(base)
    lock.parent.mkdir(parents=True, exist_ok=True)
    lock.write_text("pid=99999\n")

    keys = spark.createDataFrame([(1,)], "doc_id long")
    upd = (docs.filter("doc_id = 1")
           .withColumn("version", F.lit(2))
           .withColumn("kb", bucket_of(F.col("doc_id"), 2)))
    with pytest.raises(MaintenanceBusy):
        maintain_everywhere(spark, primary={"base_dir": base})
    with pytest.raises(MaintenanceBusy):
        erase_everywhere(spark, keys,
                         primary={"base_dir": base, "key_col": "doc_id",
                                  "n_buckets": 2})
    with pytest.raises(MaintenanceBusy):
        merge_into_partitioned(spark, base, upd, key="doc_id",
                               version="version", partition_col="kb")
    with pytest.raises(MaintenanceBusy):
        compact_partitions(spark, base, "kb")
    with pytest.raises(MaintenanceBusy):
        expire_partitions(base, "kb", 99, parse=int)
    with pytest.raises(MaintenanceBusy):
        erase_keys(spark, base, keys, "doc_id", n_buckets=2)

    # all-or-nothing farm acquisition: only the SECOND store is locked;
    # after the Busy, the first store's lock must not linger
    other = str(tmp_path / "rollup")
    os.makedirs(other)
    # farm_locks sorts paths; ensure 'other' sorts after 'store' or
    # before — either way the unlocked one's lock must be released
    with pytest.raises(MaintenanceBusy):
        maintain_everywhere(spark, primary={"base_dir": other},
                            ivm_view={"view_dir": base})
    assert not lock_path_for(other).exists()

    # release -> the pass proceeds and composes the (reentrant) locked
    # fold entry points without deadlocking
    lock.unlink()
    audit = {(r.store, r.action): r.units
             for r in maintain_everywhere(
                 spark, primary={"base_dir": base}).collect()}
    assert ("primary", "compact") in audit
    assert not lock.exists()  # released on exit

    # stale lock (crashed holder): broken after the threshold, pass runs
    lock.write_text("pid=99999\n")
    old = time.time() - 7200
    os.utime(lock, (old, old))
    audit = maintain_everywhere(spark, primary={"base_dir": base})
    assert audit.count() >= 1
    assert not lock.exists()

    # reentrancy: a caller already holding the lock can run the locked
    # entry points (the composed-pass shape) in-process
    with store_lock(base):
        with store_lock(base):
            assert compact_partitions(spark, base, "kb") == []
    assert not lock.exists()


def test_lock_not_reentrant_across_threads(spark, tmp_path):
    """Reentrancy is per (thread, lock): a sibling thread in the same
    driver process is a genuinely concurrent writer and gets
    MaintenanceBusy while the first thread holds the store lock
    (review round 13 — a process-global refcount would have waved it
    through into the shared staging dir)."""
    import threading

    import pytest

    from localsql_spark.sinks.locks import MaintenanceBusy, store_lock

    base = str(tmp_path / "store")
    result: dict = {}

    def other_thread():
        try:
            with store_lock(base):
                result["acquired"] = True
        except MaintenanceBusy:
            result["busy"] = True

    with store_lock(base):
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
    assert result == {"busy": True}
    # released: the sibling thread can acquire now
    result.clear()
    t = threading.Thread(target=other_thread)
    t.start()
    t.join()
    assert result == {"acquired": True}


def test_fold_entry_points_respect_store_lock(spark, tmp_path):
    """Every fold that touches a store's shared staging dir raises
    MaintenanceBusy while another process holds the store's lock —
    the round-13 review found only the merge-family four were
    instrumented while the docstrings claimed full coverage."""
    import pytest
    from pyspark.sql import functions as F

    from localsql_spark.sinks.locks import MaintenanceBusy, lock_path_for

    ev = spark.createDataFrame(
        [(1, "click", 1.0, "2024-01-01 10:00:00")],
        "event_id long, event_type string, value double, ts_s string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    docs = spark.createDataFrame([(1, "srcA", "alpha beta")],
                                 "doc_id long, source string, text string")

    cases = []
    from localsql_spark.sinks.rollup import maintain_rollup
    cases.append(("rollup", lambda d: maintain_rollup(spark, d, ev)))
    from localsql_spark.sinks.ivm import maintain_join_view
    dim = spark.createDataFrame([(1, "g0")], "dk long, grp_name string")
    fact = spark.createDataFrame([(1, 1, 2.0)],
                                 "id long, fk long, value double")
    cases.append(("ivm", lambda d: maintain_join_view(
        spark, d, fact, dim, "fk", "dk", "grp_name", "value")))
    from localsql_spark.sinks.inverted_index import index_add_documents
    cases.append(("invidx", lambda d: index_add_documents(spark, d, docs)))
    from localsql_spark.sinks.sketch_view import sketch_view_update
    cases.append(("sketch", lambda d: sketch_view_update(spark, d, docs)))
    from localsql_spark.operators.selection import nb_model_update
    cases.append(("nb", lambda d: nb_model_update(
        spark, d, docs, F.lit(True))))
    from localsql_spark.sinks.scd2_store import init_store
    cases.append(("scd2", lambda d: init_store(
        docs.select("doc_id", "source"), d, ["doc_id"], ["source"], 1)))
    from localsql_spark.operators.dedup import (compact_signature_store,
                                                erase_from_signature_store,
                                                write_signature_store)
    cases.append(("sigs", lambda d: write_signature_store(docs, d)))

    for name, fn in cases:
        d = str(tmp_path / name)
        lock = lock_path_for(d)
        lock.parent.mkdir(parents=True, exist_ok=True)
        lock.write_text("pid=99999\n")
        with pytest.raises(MaintenanceBusy):
            fn(d)
        lock.unlink()
        fn(d)  # released -> the fold proceeds

    # the signature store's whole-dir swappers hold the same lock (a
    # maintenance compaction and an erase_from_signature_store could
    # otherwise interleave their .compact/.erasing swaps).  The "sigs"
    # store written by the loop above is the fixture.
    d = str(tmp_path / "sigs")
    keys = spark.createDataFrame([(999,)], "doc_id long")  # not in store
    lock = lock_path_for(d)
    lock.write_text("pid=99999\n")
    with pytest.raises(MaintenanceBusy):
        compact_signature_store(spark, d, target_files=1)
    with pytest.raises(MaintenanceBusy):
        erase_from_signature_store(spark, d, keys)
    lock.unlink()
    # released: both swappers run (and their internal lock round-trips
    # don't self-deadlock); compact returns the store's row count
    erase_from_signature_store(spark, d, keys)
    assert compact_signature_store(spark, d, target_files=1) == docs.count()

    # rebuild_nonretractable's whole-store swap holds the destination's
    # lock too (an unlocked swap could drop a concurrent fold's commit)
    from localsql_spark.sinks.erase import rebuild_nonretractable
    model = str(tmp_path / "nbm")
    nb_model_update(spark, model, docs, F.lit(True))
    lock = lock_path_for(model)
    lock.write_text("pid=99999\n")
    with pytest.raises(MaintenanceBusy):
        rebuild_nonretractable(spark, nb_model={
            "model_dir": model, "docs": docs, "positive": F.lit(True)})
    lock.unlink()
    rebuild_nonretractable(spark, nb_model={
        "model_dir": model, "docs": docs, "positive": F.lit(True)})


def test_lock_release_is_ownership_verified(tmp_path):
    """A holder whose lock file was broken and re-claimed by another
    process must NOT unlink the new holder's lock on release (review
    round 13: the unconditional unlink cascaded a stale-break into a
    THIRD concurrent writer).  Also pins the heartbeat registry: a held
    lock is registered for mtime refresh, and deregistered on release."""
    from localsql_spark.sinks import locks as L

    d = str(tmp_path / "store")
    lock = L.lock_path_for(d)
    with L.store_lock(d):
        assert str(lock) in L._LIVE  # heartbeat will refresh this path
        # simulate: a breaker decided we were dead; a new holder owns it
        lock.write_text("pid=4242 token=deadbeef\n")
    assert lock.exists()  # release left the new holder's lock alone
    assert lock.read_text() == "pid=4242 token=deadbeef\n"
    assert str(lock) not in L._LIVE
    lock.unlink()

    # normal case: our own token -> release unlinks
    with L.store_lock(d):
        assert lock.read_text() in L._LIVE.values()
    assert not lock.exists()


def test_index_and_feed_entry_points_respect_store_lock(spark, tmp_path):
    """The ANN index writers/erasers and the CDC feed's whole-dir
    maintenance ops hold the same per-store lock as the fold entry
    points (review round 13: a direct per-store call could interleave
    with a locked composed pass — e.g. an ivfpq_erase_vectors committing
    into the old generation mid-rebuild, its retraction then discarded
    by the swap)."""
    import pytest

    from localsql_spark.operators.similarity import (
        append_ivf_index, compact_ivf_index, ivf_erase_vectors,
        ivfpq_erase_vectors, write_ivf_index, write_ivfpq_index)
    from localsql_spark.sinks.locks import MaintenanceBusy, lock_path_for
    from localsql_spark.streaming.foreach_upsert import (erase_from_feed,
                                                         prune_feed)

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0, 0.0]) for i in range(12)],
        "vec_id long, embedding array<double>")
    keys = spark.createDataFrame([(1,)], "vec_id long")

    cases = [
        lambda d: write_ivf_index(emb, d, n_cells=2),
        lambda d: append_ivf_index(spark, d, emb, batch_id=1),
        lambda d: compact_ivf_index(spark, d),
        lambda d: ivf_erase_vectors(spark, d, keys),
        lambda d: write_ivfpq_index(emb, d, n_cells=2, m=2, k_codes=4),
        lambda d: ivfpq_erase_vectors(spark, d, keys),
        lambda d: erase_from_feed(spark, d, keys, "vec_id"),
        lambda d: prune_feed(d),
    ]
    d = str(tmp_path / "idx")
    lock = lock_path_for(d)
    lock.parent.mkdir(parents=True, exist_ok=True)
    lock.write_text("pid=99999\n")
    for fn in cases:
        with pytest.raises(MaintenanceBusy):
            fn(d)
    lock.unlink()
    # released: the writers proceed end-to-end (and their internal lock
    # round-trips don't self-deadlock)
    write_ivf_index(emb, d, n_cells=2)
    ivf_erase_vectors(spark, d, keys)
