"""Right-to-be-forgotten propagation through the DERIVED stores: erased
subjects must vanish from inverted-index postings (+stats), minhash
signature store + banded sidecar, IVFPQ codes, and SCD2 history — and a
post-erasure probe must equal one against a store built from scratch on
the erased corpus (reference has no persistence at all; this is the
engine's own extension surface, sinks/erase.py)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=40):
    rows = [(i, f"doc {i} body " + " ".join(
        f"w{(i * 7 + j) % 23}" for j in range(12)) +
        (" table join" if i % 3 == 0 else " window hash"))
        for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index_erase_equals_fresh_build(spark, tmp_path):
    """Post-erasure BM25 probe == probe of an index built from scratch on
    the erased corpus (postings gone AND stats decremented)."""
    from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                     index_add_documents,
                                                     index_erase_documents)

    docs = _docs(spark)
    erased = docs.filter(F.col("doc_id") % 5 == 0)
    keys = erased.select("doc_id")
    terms = ["table", "join", "window", "hash"]

    full = str(tmp_path / "idx_full")
    index_add_documents(spark, full, docs)
    # pruned path: the erased docs' text names the touched buckets
    index_erase_documents(spark, full, keys, docs=erased)

    fresh = str(tmp_path / "idx_fresh")
    index_add_documents(spark, fresh, docs.filter(F.col("doc_id") % 5 != 0))

    got = sorted((r.doc_id, r.score) for r in
                 bm25_from_index(spark, full, terms).collect())
    want = sorted((r.doc_id, r.score) for r in
                  bm25_from_index(spark, fresh, terms).collect())
    assert got == want and len(got) > 0

    # idempotent: erasing the same (now absent) keys changes nothing
    index_erase_documents(spark, full, keys)  # text-less path this time
    got2 = sorted((r.doc_id, r.score) for r in
                  bm25_from_index(spark, full, terms).collect())
    assert got2 == got


def test_signature_store_erase_probe_equals_fresh_store(spark, tmp_path):
    """Post-erasure LSH probe (store + banded sidecar) == probe of a store
    written from the erased corpus; the sidecar stays FRESH (no rebuild)."""
    from localsql_spark.operators import dedup as D

    docs = _docs(spark, 30).withColumn(
        "text", F.when(F.col("doc_id") % 10 < 2,
                       F.lit("exact same duplicated body of text here"))
        .otherwise(F.col("text")))
    corpus = docs.filter(F.col("doc_id") % 9 != 0)
    batch = docs.filter(F.col("doc_id") % 9 == 0)
    erased = corpus.filter(F.col("doc_id") % 4 == 0).select("doc_id")

    store = str(tmp_path / "sigs")
    D.write_signature_store(corpus, store)
    D.ensure_banded_index(spark, store, f"{store}_banded")
    res = D.erase_from_signature_store(spark, store, erased)
    assert res["erased"] > 0

    # the updated index serves WITHOUT a rebuild
    assert D.ensure_banded_index(spark, store, f"{store}_banded") == "fresh"
    got = sorted((r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs_from_store(
        spark, store, batch, threshold=0.5).collect())

    fresh = str(tmp_path / "sigs_fresh")
    D.write_signature_store(
        corpus.join(erased.withColumnRenamed("doc_id", "e"),
                    F.col("doc_id") == F.col("e"), "left_anti"), fresh)
    want = sorted((r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs_from_store(
        spark, fresh, batch, threshold=0.5).collect())
    assert got == want
    # no erased id survives in store or sidecar
    ids = {r[0] for r in spark.read.parquet(store).select("doc_id")
           .distinct().collect()}
    idx_ids = {r[0] for r in spark.read.parquet(f"{store}_banded")
               .select("doc_id").distinct().collect()}
    gone = {r[0] for r in erased.collect()}
    assert not (ids & gone) and not (idx_ids & gone)


def test_ivfpq_erase_removes_codes_and_prunes_cells(spark, tmp_path):
    from localsql_spark.operators.similarity import (ivfpq_erase_vectors,
                                                     knn_ivfpq_from_index,
                                                     write_ivfpq_index)

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    index = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8)
    before = spark.read.parquet(f"{index}/codes").count()

    gone = spark.createDataFrame([(i,) for i in range(10, 40, 3)],
                                 "vec_id long")
    touched = ivfpq_erase_vectors(spark, index, gone)
    assert touched  # erased vectors lived somewhere
    codes = spark.read.parquet(f"{index}/codes")
    n_gone = gone.count()
    assert codes.count() == before - 2 * n_gone  # m rows per vector
    assert codes.join(gone.withColumnRenamed("vec_id", "neighbor_id"),
                      "neighbor_id", "semi").count() == 0
    # probes never return an erased id
    out = knn_ivfpq_from_index(spark, index,
                               emb.filter(F.col("vec_id") < 3), k=5)
    bad = {r[0] for r in gone.collect()}
    assert not any(r.neighbor_id in bad for r in out.collect())
    # idempotent
    assert ivfpq_erase_vectors(spark, index, gone) == []


def test_scd2_erase_removes_full_version_chain(spark, tmp_path):
    from localsql_spark.sinks.scd2_store import (apply_batch, init_store,
                                                 read_history,
                                                 scd2_erase_keys)

    dim = spark.createDataFrame([(i, f"seg{i % 3}") for i in range(12)],
                                "k long, seg string")
    store = str(tmp_path / "scd2")
    init_store(dim, store, ["k"], ["seg"], 1_000_000)
    upd = spark.createDataFrame([(i, "MOVED") for i in range(0, 12, 2)],
                                "k long, seg string")
    apply_batch(spark, store, upd, ["k"], ["seg"], 2_000_000, batch_id=1)

    keys = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    removed = scd2_erase_keys(spark, store, keys, "k")
    # latest open: k=2,4 MOVED + k=3 original (3); closed batch_1: k=2,4
    # pre-update versions (2); PLUS the replay-kept predecessor snapshot
    # batch_0 also holds k=2,3,4 (3) — erasure must reach it too, or a
    # batch-1 replay would resurrect the subjects
    assert removed == 3 + 2 + 3
    hist = read_history(spark, store)
    assert hist.filter(F.col("k").isin([2, 3, 4])).count() == 0
    # untouched keys keep their full chain
    assert hist.filter(F.col("k") == 0).count() == 2
    # idempotent
    assert scd2_erase_keys(spark, store, keys, "k") == 0


def test_erase_everywhere_audit_has_zero_erased_refs(spark, tmp_path):
    from localsql_spark.operators import dedup as D
    from localsql_spark.operators.similarity import write_ivfpq_index
    from localsql_spark.sinks.erase import (erase_everywhere,
                                            write_bucketed_store)
    from localsql_spark.sinks.inverted_index import index_add_documents
    from localsql_spark.sinks.scd2_store import init_store

    docs = _docs(spark, 30)
    primary = str(tmp_path / "primary")
    write_bucketed_store(docs, primary, "doc_id", n_buckets=8)
    idx = str(tmp_path / "inv")
    index_add_documents(spark, idx, docs, n_buckets=8)
    sigs = str(tmp_path / "sigs")
    D.write_signature_store(docs, sigs)
    D.ensure_banded_index(spark, sigs, f"{sigs}_banded")
    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(30)], "doc_id long, embedding array<double>")
    pq = str(tmp_path / "pq")
    write_ivfpq_index(emb, pq, n_cells=4, m=2, k_codes=8, id_col="doc_id")
    scd2 = str(tmp_path / "scd2")
    init_store(docs.select("doc_id", F.substring("text", 1, 6).alias("s")),
               scd2, ["doc_id"], ["s"], 1_000_000)

    keys = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    audit = erase_everywhere(
        spark, keys,
        primary={"base_dir": primary, "key_col": "doc_id", "n_buckets": 8},
        inverted_index={"index_dir": idx, "n_buckets": 8},
        signature_store={"store_path": sigs},
        ivfpq_index={"index_path": pq},
        scd2={"store_dir": scd2, "key_col": "doc_id"})
    rows = {r.store: (r.rows_after, r.erased_refs)
            for r in audit.collect()}
    assert set(rows) == {"inverted_index", "primary", "signature_store",
                         "banded_index", "ivfpq_codes", "scd2_history"}
    assert all(refs == 0 for _, refs in rows.values())
    assert rows["primary"][0] == 24
    assert rows["signature_store"][0] == 24
    assert rows["banded_index"][0] == 24 * D.N_BANDS
    assert rows["ivfpq_codes"][0] == 24 * 2
    assert rows["scd2_history"][0] == 24


def _files_snapshot(root, sub=""):
    base = Path(root) / sub if sub else Path(root)
    return {(str(f.relative_to(base)), f.stat().st_mtime_ns)
            for f in base.rglob("*.parquet")}


def test_signature_erase_rewrites_only_touched_prefixes(spark, tmp_path):
    """The banded-sidecar update is PRUNED: partitions outside the erased
    docs' band-key prefixes keep byte-identical files (the filesystem is
    the proof the plan's PartitionFilters actually held)."""
    from localsql_spark.operators import dedup as D

    docs = _docs(spark, 40)
    store = str(tmp_path / "sigs")
    D.write_signature_store(docs, store)
    D.ensure_banded_index(spark, store, f"{store}_banded")
    erased = spark.createDataFrame([(4,), (8,)], "doc_id long")

    before = {p.name: _files_snapshot(p)
              for p in Path(f"{store}_banded").glob("bk_prefix=*")}
    res = D.erase_from_signature_store(spark, store, erased)
    touched = {f"bk_prefix={x}" for x in res["index_prefixes"]}
    assert touched  # the erased docs had band keys
    after_names = {p.name for p in Path(f"{store}_banded").glob("bk_prefix=*")}
    for name in after_names - touched:
        assert _files_snapshot(Path(f"{store}_banded") / name) == \
            before[name], f"untouched partition {name} was rewritten"


def test_ivfpq_erase_rewrites_only_touched_cells(spark, tmp_path):
    from localsql_spark.operators.similarity import (ivfpq_erase_vectors,
                                                     write_ivfpq_index)

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    index = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8)
    codes = Path(index) / "codes"
    before = {p.name: _files_snapshot(p) for p in codes.glob("cell=*")}
    gone = spark.createDataFrame([(11,), (12,)], "vec_id long")
    touched = {f"cell={c}" for c in ivfpq_erase_vectors(spark, index, gone)}
    assert touched
    for p in codes.glob("cell=*"):
        if p.name not in touched:
            assert _files_snapshot(p) == before[p.name], \
                f"untouched cell {p.name} was rewritten"
    # model tables untouched by design (documented rebuild policy)
    assert _files_snapshot(index, "_centroids")


def test_scd2_erase_mid_swap_crash_heals_on_rerun(spark, tmp_path):
    """Crash between an erase swap's two renames leaves the dir only at
    its hidden .old backup; re-running the request must restore it first
    and then complete (code-review r9 — the backup used to be orphaned
    forever)."""
    import shutil

    from localsql_spark.sinks.scd2_store import (init_store, read_history,
                                                 scd2_erase_keys)

    dim = spark.createDataFrame([(i, f"s{i % 2}") for i in range(8)],
                                "k long, seg string")
    store = tmp_path / "scd2"
    init_store(dim, str(store), ["k"], ["seg"], 1_000_000)
    # simulate the crash window: open/batch_0 renamed away, swap not done
    d = store / "open" / "batch_0"
    d.rename(store / "open" / ".batch_0.old")
    keys = spark.createDataFrame([(1,)], "k long")
    removed = scd2_erase_keys(spark, str(store), keys, "k")
    assert removed == 1
    hist = read_history(spark, str(store))
    assert hist.count() == 7 and hist.filter(F.col("k") == 1).count() == 0
    # a completed swap's leftover backup is cleared, not restored
    (store / "open" / ".batch_0.old").mkdir()
    scd2_erase_keys(spark, str(store), keys, "k")
    assert not (store / "open" / ".batch_0.old").exists()


def test_index_rebuild_clears_pending_erase_manifest(spark, tmp_path):
    """A pending partial-erase manifest must not survive a full index
    rebuild — recover_pending_merge would replay stale pre-rebuild
    partitions over the fresh index (code-review r9)."""
    import json

    from localsql_spark.operators import dedup as D

    docs = _docs(spark, 20)
    store = str(tmp_path / "sigs")
    idx = tmp_path / "sigs_banded"
    D.write_signature_store(docs, store)
    D.ensure_banded_index(spark, store, str(idx))
    # plant a fake pending manifest + stale staged partition
    staging = tmp_path / ".sigs_banded.staging"
    bogus = staging / "bk_prefix=zz"
    bogus.mkdir(parents=True)
    spark.createDataFrame([(999999, 0, "zz")],
                          "doc_id long, band_id int, band_key string") \
        .write.mode("overwrite").parquet(str(bogus))
    manifest = tmp_path / ".sigs_banded.commit.json"
    manifest.write_text(json.dumps({"staging": staging.name,
                                    "partitions": ["bk_prefix=zz"],
                                    "removed": []}))
    # force a rebuild (store compaction changes the file listing)
    D.compact_signature_store(spark, store)
    assert D.ensure_banded_index(spark, store, str(idx)) == "rebuilt"
    assert not manifest.exists()
    assert not (idx / "bk_prefix=zz").exists()
    # and a subsequent erase (which calls recover_pending_merge) is safe
    D.erase_from_signature_store(
        spark, store, spark.createDataFrame([(1,)], "doc_id long"))
    assert not (idx / "bk_prefix=zz").exists()


def test_store_swap_crash_heals_forward_and_back(spark, tmp_path):
    """_heal_store_swap: a complete .erasing replacement rolls FORWARD, a
    backup without a complete replacement rolls BACK — either way the
    next erase/compaction finds a readable store (code-review r9)."""
    from localsql_spark.operators import dedup as D

    docs = _docs(spark, 12)
    store = tmp_path / "sigs"
    D.write_signature_store(docs, str(store))

    # roll-forward: store renamed away, complete replacement present
    replacement = tmp_path / ".sigs.erasing"
    store.rename(tmp_path / ".sigs.old")
    D.write_signature_store(docs.filter(F.col("doc_id") >= 6),
                            str(replacement))
    D._heal_store_swap(str(store))
    assert store.exists() and not (tmp_path / ".sigs.old").exists()
    assert spark.read.parquet(str(store)).count() == 6

    # roll-back: no replacement, only the backup
    store.rename(tmp_path / ".sigs.old")
    D._heal_store_swap(str(store))
    assert store.exists()
    assert spark.read.parquet(str(store)).count() == 6


def test_ivfpq_crashed_erase_heals_on_probe_and_retrain(spark, tmp_path,
                                                        monkeypatch):
    """A crashed ivfpq_erase_vectors (died between manifest commit and the
    partition swaps) has COMMITTED the erasure: a probe must complete it
    before reading codes, and a retrain must APPLY it — not discard the
    manifest — so a retrain that itself crashes before rewriting codes
    cannot resurrect erased PQ codes (advisor r9, RTBF path)."""
    from localsql_spark.operators import similarity as S
    from localsql_spark.sinks import merge as M

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    index = str(tmp_path / "ivfpq")
    S.write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8)
    gone = spark.createDataFrame([(i,) for i in range(10, 40, 3)],
                                 "vec_id long")
    bad = {r[0] for r in gone.collect()}

    # crash injection: the manifest rename lands, the swaps never run
    monkeypatch.setattr(M, "_apply_manifest", lambda *a, **k: None)
    S.ivfpq_erase_vectors(spark, index, gone)
    monkeypatch.undo()
    manifest = M._manifest_path(Path(index) / "codes")
    assert manifest.exists()  # committed, unapplied
    # the stale store still serves erased codes — that's the hazard
    assert spark.read.parquet(f"{index}/codes").join(
        gone.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id", "semi").count() > 0

    # probe heals: completes the committed erase before scoring
    out = S.knn_ivfpq_from_index(spark, index,
                                 emb.filter(F.col("vec_id") < 3), k=5)
    assert not any(r.neighbor_id in bad for r in out.collect())
    assert not manifest.exists()
    assert spark.read.parquet(f"{index}/codes").join(
        gone.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id", "semi").count() == 0

    # retrain-crash scenario: re-create the crashed-erase state, then run
    # a retrain that dies right after its recovery preamble — the
    # committed erasure must already be applied on disk (not discarded)
    monkeypatch.setattr(M, "_apply_manifest", lambda *a, **k: None)
    S.write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8)  # reset
    # (reset ran with apply disabled — codes wrote via plain overwrite, no
    # manifest involved, so the reset itself is unaffected)
    S.ivfpq_erase_vectors(spark, index, gone)
    monkeypatch.undo()
    assert manifest.exists()

    def _boom(*a, **k):
        raise RuntimeError("injected retrain crash")
    monkeypatch.setattr(S, "_coarse_cells", _boom)
    with pytest.raises(RuntimeError, match="injected retrain crash"):
        S.write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8)
    monkeypatch.undo()
    assert not manifest.exists()  # applied, not discarded
    assert spark.read.parquet(f"{index}/codes").join(
        gone.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id", "semi").count() == 0


def _docs40(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 8}",
          " ".join(f"w{(i * 7 + j * 3) % 23}" for j in range(12)))
         for i in range(40)], "doc_id long, source string, text string")


def test_rebuild_nonretractable_equals_from_scratch(spark, tmp_path):
    """The documented rebuild policy as an operator: after erasure, a
    rebuilt NB model / HLL sketch view / IVFPQ index must be
    BIT-IDENTICAL to one trained on a corpus that never contained the
    erased subjects — the same discipline the erase probes established."""
    from localsql_spark.operators.selection import nb_model_update
    from localsql_spark.operators.similarity import write_ivfpq_index
    from localsql_spark.sinks.erase import rebuild_nonretractable
    from localsql_spark.sinks.sketch_view import sketch_view_update

    docs = _docs40(spark)
    kept = docs.filter(F.col("doc_id") % 5 != 0)
    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    kept_emb = emb.filter((F.col("vec_id") % 5 != 0)
                          | (F.col("vec_id") < 10))
    is_pos = F.substring("source", 4, 10).cast("int") < 4

    # full-corpus stores, then rebuild from the kept corpus
    model = str(tmp_path / "model")
    view = str(tmp_path / "view")
    index = str(tmp_path / "ivfpq")
    nb_model_update(spark, model, docs, is_pos)
    sketch_view_update(spark, view, docs)
    write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8)
    from localsql_spark.operators.similarity import write_ivf_index
    ivf = str(tmp_path / "ivf")
    write_ivf_index(emb, ivf, n_cells=4)
    audit = rebuild_nonretractable(
        spark,
        nb_model={"model_dir": model, "docs": kept, "positive": is_pos},
        sketch_view={"view_dir": view, "docs": kept},
        ivfpq_index={"index_path": index, "corpus": kept_emb,
                     "n_cells": 4, "m": 2, "k_codes": 8},
        ivf_index={"index_path": ivf, "corpus": kept_emb, "n_cells": 4})
    assert {r.store for r in audit.collect()} == {
        "nb_model", "sketch_view", "ivfpq_index", "ivf_index"}

    # from-scratch twins on the kept corpus
    nb_model_update(spark, str(tmp_path / "model2"), kept, is_pos)
    sketch_view_update(spark, str(tmp_path / "view2"), kept)
    write_ivfpq_index(kept_emb, str(tmp_path / "ivfpq2"),
                      n_cells=4, m=2, k_codes=8)

    def rows(path, drop=()):
        df = spark.read.parquet(path)
        cols = [c for c in sorted(df.columns) if c not in drop]
        return sorted(map(tuple, df.select(cols).collect()),
                      key=lambda t: tuple(str(x) for x in t))

    assert rows(model) == rows(str(tmp_path / "model2"))
    assert rows(view) == rows(str(tmp_path / "view2"))
    for part in ("codes", "_centroids", "_codebooks"):
        assert rows(f"{index}/{part}") == \
            rows(str(tmp_path / "ivfpq2" / part)), part
    write_ivf_index(kept_emb, str(tmp_path / "ivf2"), n_cells=4)
    for part in ("cells", "_centroids"):
        assert rows(f"{ivf}/{part}") == \
            rows(str(tmp_path / "ivf2" / part)), part
    # no parked generation or staging left behind
    leftovers = [p.name for p in tmp_path.iterdir()
                 if ".pre_rebuild" in p.name or ".rebuild" in p.name]
    assert leftovers == []


def test_rebuild_crash_mid_build_leaves_old_generation(spark, tmp_path,
                                                       monkeypatch):
    """A crash DURING the retrain must leave the old store serving (the
    swap only happens after the build completes), and the re-run heals
    the staging leftover."""
    from localsql_spark.operators import selection as SEL
    from localsql_spark.operators.selection import (nb_model_read,
                                                    nb_model_update)
    from localsql_spark.sinks import erase as E

    docs = _docs40(spark)
    kept = docs.filter(F.col("doc_id") % 5 != 0)
    is_pos = F.substring("source", 4, 10).cast("int") < 4
    model = str(tmp_path / "model")
    nb_model_update(spark, model, docs, is_pos)
    before = sorted(map(tuple, spark.read.parquet(model).collect()))

    real = SEL.nb_model_update

    def boom(spark_, dir_, *a, **k):
        real(spark_, dir_, *a, **k)  # build completes...
        raise RuntimeError("injected crash before swap")
    monkeypatch.setattr(E, "nb_model_update", boom, raising=False)
    # rebuild_nonretractable imports inside the function body — patch the
    # source module it imports from
    monkeypatch.setattr(SEL, "nb_model_update", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        E.rebuild_nonretractable(spark, nb_model={
            "model_dir": model, "docs": kept, "positive": is_pos})
    # old generation still serving, byte-identical
    assert sorted(map(tuple, spark.read.parquet(model).collect())) == before
    monkeypatch.setattr(SEL, "nb_model_update", real)
    E.rebuild_nonretractable(spark, nb_model={
        "model_dir": model, "docs": kept, "positive": is_pos})
    model2, _ = nb_model_read(spark, model)
    fresh = str(tmp_path / "fresh")
    nb_model_update(spark, fresh, kept, is_pos)
    assert sorted(map(tuple, spark.read.parquet(model).collect())) == \
        sorted(map(tuple, spark.read.parquet(fresh).collect()))


def test_erase_through_hardlink_farm_never_mutates_fixture(spark, tmp_path):
    """The bench fixture contract behind erase_users_everywhere's
    hardlink farm: every store mutation is staged-write + rename (new
    inodes), so erasing a hardlink COPY of a store can never write
    through a link into the fixture's bytes."""
    import hashlib
    import os
    import shutil

    from localsql_spark.operators import dedup as D
    from localsql_spark.sinks.erase import erase_keys, write_bucketed_store

    def tree_hash(root):
        h = hashlib.sha256()
        for p in sorted(Path(root).rglob("*")):
            if p.is_file():
                h.update(str(p.relative_to(root)).encode())
                h.update(p.read_bytes())
        return h.hexdigest()

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 19}" for j in range(10)))
         for i in range(200)], "doc_id long, text string")
    fixture = tmp_path / "fixture"
    write_bucketed_store(docs, str(fixture / "primary"), "doc_id",
                         n_buckets=8)
    D.write_signature_store(docs, str(fixture / "sigs"))
    D.ensure_banded_index(spark, str(fixture / "sigs"),
                          str(fixture / "sigs_banded"))
    before = tree_hash(fixture)

    keys = spark.createDataFrame([(i,) for i in range(0, 200, 9)],
                                 "doc_id long")
    for rep in range(2):
        scratch = tmp_path / f"scratch_{rep}"
        for store in ("primary", "sigs", "sigs_banded"):
            shutil.copytree(fixture / store, scratch / store,
                            copy_function=os.link)
        erase_keys(spark, str(scratch / "primary"), keys, "doc_id",
                   n_buckets=8)
        D.erase_from_signature_store(
            spark, str(scratch / "sigs"), keys,
            index_path=str(scratch / "sigs_banded"))
        assert tree_hash(fixture) == before, f"fixture mutated on rep {rep}"


def test_ivf_erase_removes_full_vectors_across_base_and_deltas(
        spark, tmp_path):
    """The persisted IVF index stores FULL vectors — erase must reach
    them wherever they live (base cells AND appended delta batches, via
    the compact-first fold), prune to touched cells, and be idempotent."""
    from localsql_spark.operators.similarity import (append_ivf_index,
                                                     ivf_erase_vectors,
                                                     knn_ivf_from_index,
                                                     write_ivf_index)

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(60)], "vec_id long, embedding array<double>")
    index = str(tmp_path / "ivf")
    write_ivf_index(emb.filter(F.col("vec_id") < 40), index, n_cells=4)
    append_ivf_index(spark, index,
                     emb.filter(F.col("vec_id") >= 40), batch_id=1)

    gone = spark.createDataFrame(
        [(i,) for i in range(10, 60, 7)], "vec_id long")  # base AND delta
    touched = ivf_erase_vectors(spark, index, gone)
    assert touched
    from localsql_spark.operators.similarity import _ivf_slices
    left = _ivf_slices(spark, index)
    assert left.join(gone.withColumnRenamed("vec_id", "neighbor_id"),
                     "neighbor_id", "semi").count() == 0
    assert left.count() == 60 - gone.count()
    out = knn_ivf_from_index(spark, index,
                             emb.filter(F.col("vec_id") < 3), k=5)
    bad = {r[0] for r in gone.collect()}
    assert not any(r.neighbor_id in bad for r in out.collect())
    # idempotent
    assert ivf_erase_vectors(spark, index, gone) == []


def test_ivf_crashed_erase_heals_on_probe(spark, tmp_path, monkeypatch):
    """A crash between the erase's manifest commit and the partition
    swaps must not leave erased full vectors servable: the probe path
    recovers the committed manifest before reading."""
    from localsql_spark.operators.similarity import (_ivf_slices,
                                                     ivf_erase_vectors,
                                                     write_ivf_index)
    from localsql_spark.sinks import merge as M

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    index = str(tmp_path / "ivf")
    write_ivf_index(emb, index, n_cells=4)
    gone = spark.createDataFrame([(i,) for i in range(10, 40, 5)],
                                 "vec_id long")

    real_apply = M._apply_manifest
    calls = {"n": 0}

    def crash_on_apply(base, manifest):
        calls["n"] += 1
        raise RuntimeError("injected crash after manifest commit")
    monkeypatch.setattr(M, "_apply_manifest", crash_on_apply)
    with pytest.raises(RuntimeError, match="injected crash"):
        ivf_erase_vectors(spark, index, gone)
    assert calls["n"] == 1
    monkeypatch.setattr(M, "_apply_manifest", real_apply)

    # the probe read heals the committed erase before serving
    left = _ivf_slices(spark, index)
    assert left.join(gone.withColumnRenamed("vec_id", "neighbor_id"),
                     "neighbor_id", "semi").count() == 0


# ---------------------------------------------------------------------------
# Aggregate stores: rollup + IVM join view (round 11)
# ---------------------------------------------------------------------------

def _events(spark):
    """Synthetic events engineered so the erased subject (user 99):
    - holds the group MIN in (d1 00h, A) and the group MAX in (d1 00h, B)
      -> extreme-heal path fires;
    - is the ENTIRE group (d1 01h, B) -> group retracts to zero;
    - owns EVERY event of date d2 -> the whole partition is removed."""
    rows = [
        # (event_id, user_id, event_type, value, ts)
        (1, 1, "A", 5.0, "2024-01-01 00:10:00"),
        (2, 2, "A", 7.0, "2024-01-01 00:20:00"),
        (3, 99, "A", 1.0, "2024-01-01 00:30:00"),   # group min
        (4, 1, "B", 2.0, "2024-01-01 00:40:00"),
        (5, 99, "B", 9.0, "2024-01-01 00:50:00"),   # group max
        (6, 99, "B", 4.0, "2024-01-01 01:00:00"),   # sole member
        (7, 2, "A", 3.0, "2024-01-01 01:10:00"),
        (8, 99, "A", 6.0, "2024-01-02 00:00:00"),   # whole date d2
        (9, 99, "B", 8.0, "2024-01-02 01:00:00"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "value double, ts_s string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def test_rollup_erase_equals_fresh_rollup(spark, tmp_path):
    """Post-erase rollup == a rollup maintained from scratch on the kept
    events, covering all three retraction classes: invertible count/sum,
    non-invertible min/max (healed only where the subject attained the
    extreme), group-retracts-to-zero, and date-partition removal."""
    from localsql_spark.sinks.rollup import (erase_from_rollup,
                                             maintain_rollup, read_rollup)

    ev = _events(spark)
    keys = spark.createDataFrame([(99,)], "user_id long")

    store = str(tmp_path / "roll")
    maintain_rollup(spark, store, ev, grain="hour")
    dates = erase_from_rollup(spark, store, ev, keys, "user_id",
                              grain="hour")
    assert dates == ["2024-01-01", "2024-01-02"]

    fresh = str(tmp_path / "fresh")
    maintain_rollup(spark, fresh, ev.filter(F.col("user_id") != 99),
                    grain="hour")

    def rows(d):
        return sorted(map(tuple, read_rollup(spark, d)
                          .select("bucket_ts", "key", "n_events",
                                  "sum_value", "min_value", "max_value",
                                  "event_date").collect()))

    got, want = rows(store), rows(fresh)
    assert got == want and len(got) == 3
    # the healed extremes specifically: (d1 00h, A) min was 1.0 -> 5.0,
    # (d1 00h, B) max was 9.0 -> 2.0 (only kept row)
    by_grp = {(r[0], r[1]): r for r in got}
    assert by_grp[("2024-01-01 00:00:00", "A")][4] == 5.0
    assert by_grp[("2024-01-01 00:00:00", "B")][5] == 2.0
    # emptied date partition is GONE from disk, not just empty
    assert not (tmp_path / "roll" / "event_date=2024-01-02").exists()
    # idempotent against the post-erase source (the production re-run
    # shape: the primary was erased first, so the subjects match nothing)
    again = erase_from_rollup(spark, store,
                              ev.filter(F.col("user_id") != 99), keys,
                              "user_id", grain="hour")
    assert again == [] and rows(store) == want


def test_rollup_erase_rewrites_only_touched_dates(spark, tmp_path):
    """Request-bounded cost: a subject whose events all land in one date
    leaves every other date partition's bytes untouched."""
    from localsql_spark.sinks.rollup import erase_from_rollup, maintain_rollup

    ev = _events(spark)
    store = str(tmp_path / "roll")
    maintain_rollup(spark, store, ev, grain="hour")
    d1 = tmp_path / "roll" / "event_date=2024-01-01"
    before = sorted((p.name, p.stat().st_mtime_ns, p.stat().st_ino)
                    for p in d1.rglob("*.parquet"))

    # user 3 exists only in d2 after we add one event there
    extra = spark.createDataFrame(
        [(10, 3, "A", 2.5, "2024-01-02 05:00:00")],
        "event_id long, user_id long, event_type string, value double, "
        "ts_s string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    maintain_rollup(spark, store, extra, grain="hour")
    before = sorted((p.name, p.stat().st_mtime_ns, p.stat().st_ino)
                    for p in d1.rglob("*.parquet"))

    keys = spark.createDataFrame([(3,)], "user_id long")
    dates = erase_from_rollup(spark, store, ev.unionByName(extra), keys,
                              "user_id", grain="hour")
    assert dates == ["2024-01-02"]
    after = sorted((p.name, p.stat().st_mtime_ns, p.stat().st_ino)
                   for p in d1.rglob("*.parquet"))
    assert after == before, "untouched date partition was rewritten"


def test_ivm_erase_equals_fresh_view_and_drops_zero_groups(spark, tmp_path):
    """Post-erase join view == a view folded from scratch on the kept
    fact rows; a group whose every fact row belonged to subjects leaves
    the view entirely."""
    from localsql_spark.sinks.ivm import (erase_from_view,
                                          maintain_join_view,
                                          read_join_view)

    dim = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (3, "g2"), (4, "g3")],
        "k long, grp_name string")
    fact = spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 3, 2.0), (13, 3, 4.0),
         (14, 4, 9.0), (15, 4, 1.0)],
        "fid long, k long, v double")

    view = str(tmp_path / "view")
    maintain_join_view(spark, view, fact, dim, fact_key="k", dim_key="k",
                       group_col="grp_name", value_col="v", n_buckets=4)
    # erase customer 4 (sole contributor to g3) and 1 (partial g1)
    keys = spark.createDataFrame([(4,), (1,)], "k long")
    erase_from_view(spark, view, fact, keys, "k", dim,
                    fact_key="k", dim_key="k", group_col="grp_name",
                    value_col="v", n_buckets=4)

    fresh = str(tmp_path / "fresh")
    kept = fact.filter(~F.col("k").isin(1, 4))
    maintain_join_view(spark, fresh, kept, dim, fact_key="k", dim_key="k",
                       group_col="grp_name", value_col="v", n_buckets=4)

    def rows(d):
        return sorted(map(tuple, read_join_view(spark, d)
                          .select("grp", "n_rows", "sum_value",
                                  "grp_bucket").collect()))

    got, want = rows(view), rows(fresh)
    assert got == want
    assert {r[0] for r in got} == {"g1", "g2"}  # g3 retracted away


def test_ivm_erase_rewrites_only_touched_buckets(spark, tmp_path):
    """Request-bounded cost: buckets holding no touched group keep their
    bytes (mtime+inode stable across the erase)."""
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.ivm import erase_from_view, maintain_join_view

    n_groups, n_buckets = 12, 8
    dim = spark.createDataFrame([(i, f"g{i % n_groups}")
                                 for i in range(48)],
                                "k long, grp_name string")
    fact = spark.createDataFrame([(100 + i, i % 48, float(i))
                                  for i in range(96)],
                                 "fid long, k long, v double")
    view = str(tmp_path / "view")
    maintain_join_view(spark, view, fact, dim, fact_key="k", dim_key="k",
                       group_col="grp_name", value_col="v",
                       n_buckets=n_buckets)
    keys = spark.createDataFrame([(5,)], "k long")  # one dim entity
    # the subject's only group is g5 -> exactly one touched bucket
    touched = erase_from_view(spark, view, fact, keys, "k", dim,
                              fact_key="k", dim_key="k",
                              group_col="grp_name", value_col="v",
                              n_buckets=n_buckets)
    assert len(touched) == 1
    # can't snapshot before the call without knowing the bucket; redo:
    # rebuild, snapshot all buckets, erase, compare the untouched ones
    import shutil
    shutil.rmtree(view)
    (Path(str(tmp_path)) / ".view.meta.json").unlink(missing_ok=True)
    (Path(str(tmp_path)) / ".view.schema.json").unlink(missing_ok=True)
    maintain_join_view(spark, view, fact, dim, fact_key="k", dim_key="k",
                       group_col="grp_name", value_col="v",
                       n_buckets=n_buckets)
    snap = {d.name: sorted((p.name, p.stat().st_mtime_ns, p.stat().st_ino)
                           for p in d.rglob("*.parquet"))
            for d in Path(view).glob("grp_bucket=*")}
    touched2 = erase_from_view(spark, view, fact, keys, "k", dim,
                               fact_key="k", dim_key="k",
                               group_col="grp_name", value_col="v",
                               n_buckets=n_buckets)
    assert touched2 == touched
    tname = {f"grp_bucket={b}" for b in touched2}
    for name, files in snap.items():
        if name in tname:
            continue
        now = sorted((p.name, p.stat().st_mtime_ns, p.stat().st_ino)
                     for p in (Path(view) / name).rglob("*.parquet"))
        assert now == files, f"untouched bucket {name} was rewritten"


# ---------------------------------------------------------------------------
# Durable CDC feed erasure (round 11)
# ---------------------------------------------------------------------------

def _feed_batches(spark):
    b0 = spark.createDataFrame([(i, 1, f"t{i}") for i in range(1, 7)],
                               "k long, v int, payload string")
    b1 = spark.createDataFrame([(i, 2, f"u{i}") for i in range(1, 4)],
                               "k long, v int, payload string")
    b2 = spark.createDataFrame([(i, 1, f"w{i}") for i in (100, 101)],
                               "k long, v int, payload string")
    return [b0, b1, b2]


def _produce_feed(spark, root, batches):
    from localsql_spark.streaming.foreach_upsert import apply_batch_with_feed

    out, feed = root / "table", root / "feed"
    out.mkdir(parents=True, exist_ok=True)
    feed.mkdir(parents=True, exist_ok=True)
    for i, b in enumerate(batches):
        apply_batch_with_feed(b, i, key="k", version="v",
                              out_dir=str(out), feed_dir=str(feed))
    return str(feed)


def test_feed_erase_equals_never_saw_feed(spark, tmp_path):
    """Post-erase feed replay == the feed a store that never saw the
    subjects would have produced (same batches minus subject rows);
    untouched batch dirs byte-identical; consumer offsets and batch ids
    survive; idempotent."""
    from localsql_spark.streaming.foreach_upsert import (commit_feed_offset,
                                                         erase_from_feed,
                                                         feed_watermark,
                                                         read_feed)

    batches = _feed_batches(spark)
    feed = _produce_feed(spark, tmp_path / "a", batches)
    commit_feed_offset(feed, "c1", 1)

    keys = spark.createDataFrame([(2,), (3,)], "k long")
    import hashlib

    def tree_hash(d):
        h = hashlib.md5()
        for p in sorted(Path(d).rglob("*")):
            if p.is_file():
                h.update(p.name.encode())
                h.update(p.read_bytes())
        return h.hexdigest()

    b2_before = tree_hash(Path(feed) / "batch_2")
    touched = erase_from_feed(spark, feed, keys, "k")
    assert touched == [0, 1]
    assert tree_hash(Path(feed) / "batch_2") == b2_before
    assert feed_watermark(feed, "c1") == 1

    # never-saw twin: produce the feed from batches minus the subjects
    never = _produce_feed(spark, tmp_path / "b",
                          [b.filter(~F.col("k").isin(2, 3))
                           for b in batches])

    def rows(d):
        return sorted(map(tuple, read_feed(spark, d)
                          .select("k", "op", "new_v", "old_v", "batch_id")
                          .collect()))

    assert rows(feed) == rows(never)
    assert erase_from_feed(spark, feed, keys, "k") == []  # idempotent


def test_feed_erase_crash_after_commit_heals_on_read(spark, tmp_path,
                                                     monkeypatch):
    """A crash between the manifest commit and the batch swaps must heal
    on the next feed read — the manifest is the commit point."""
    from localsql_spark.streaming import foreach_upsert as FU

    feed = _produce_feed(spark, tmp_path, _feed_batches(spark))
    keys = spark.createDataFrame([(2,), (3,)], "k long")

    real_apply = FU._apply_feed_erase
    calls = {"n": 0}

    def crashing(feed_dir, manifest):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash after manifest commit")
        return real_apply(feed_dir, manifest)

    monkeypatch.setattr(FU, "_apply_feed_erase", crashing)
    with pytest.raises(OSError, match="simulated crash"):
        FU.erase_from_feed(spark, feed, keys, "k")
    assert FU._feed_erase_manifest(feed).exists()

    # next reader heals: no subject rows, every batch id still present
    got = FU.read_feed(spark, feed)
    ks = {r["k"] for r in got.collect()}
    assert ks.isdisjoint({2, 3}) and len(ks) > 0
    assert not FU._feed_erase_manifest(feed).exists()
    assert sorted(int(p.name.split("_")[1])
                  for p in Path(feed).glob("batch_*")) == [0, 1, 2]


def test_feed_fully_erased_batch_stays_committed_and_empty(spark, tmp_path):
    """Erasing every key of a batch leaves an EMPTY committed batch dir
    (id survives for offset arithmetic), not a missing one."""
    from localsql_spark.streaming.foreach_upsert import (erase_from_feed,
                                                         read_feed)

    feed = _produce_feed(spark, tmp_path, _feed_batches(spark))
    # batch_2's only keys are 100/101 — erase both
    erase_from_feed(spark, feed,
                    spark.createDataFrame([(100,), (101,)], "k long"), "k")
    b2 = Path(feed) / "batch_2"
    assert (b2 / "_SUCCESS").exists()
    got = read_feed(spark, feed)
    assert got.filter(F.col("batch_id") == 2).count() == 0
    assert got.filter(F.col("batch_id") < 2).count() > 0


def test_erase_everywhere_covers_aggregate_stores_and_feed(spark, tmp_path):
    """The composed flow with rollup + IVM + feed configs: one call, all
    three audits at zero divergence/refs."""
    from localsql_spark.sinks.erase import erase_everywhere
    from localsql_spark.sinks.ivm import maintain_join_view
    from localsql_spark.sinks.rollup import maintain_rollup

    ev = _events(spark)
    dim = spark.createDataFrame([(1, "g1"), (2, "g1"), (99, "g9")],
                                "k long, grp_name string")
    fact = ev.select(F.col("event_id").alias("fid"),
                     F.col("user_id").alias("k"), F.col("value").alias("v"))
    roll = str(tmp_path / "roll")
    view = str(tmp_path / "view")
    maintain_rollup(spark, roll, ev, grain="hour")
    maintain_join_view(spark, view, fact, dim, fact_key="k", dim_key="k",
                       group_col="grp_name", value_col="v", n_buckets=4)
    feed = _produce_feed(spark, tmp_path, [
        ev.select("event_id", F.col("user_id").alias("k"),
                  F.lit(1).alias("v"))])

    keys = spark.createDataFrame([(99,)], "user_id long")
    audit = erase_everywhere(
        spark, keys,
        ledger={"ledger_dir": str(tmp_path / "ledger"), "batch_id": 0},
        rollup={"rollup_dir": roll, "events": ev,
                "subject_col": "user_id", "grain": "hour"},
        ivm_view={"view_dir": view, "fact": fact, "subject_col": "k",
                  "dim": dim, "fact_key": "k", "dim_key": "k",
                  "group_col": "grp_name", "value_col": "v",
                  "n_buckets": 4},
        feed={"feed_dir": feed, "key_col": "k"})
    rows = {r["store"]: r for r in audit.collect()}
    assert set(rows) == {"rollup", "ivm_view", "change_feed"}
    for name, r in rows.items():
        assert r["erased_refs"] == 0, (name, r)
    assert rows["rollup"]["rows_after"] == 3
    assert rows["ivm_view"]["rows_after"] == 1  # g9 retracted, g1 stays
    # the batch flow recorded the request in the erase ledger too
    from localsql_spark.sinks.erase import read_erase_ledger
    led = read_erase_ledger(spark, str(tmp_path / "ledger"))
    assert sorted(r[0] for r in led.collect()) == [99]


def test_rollup_and_ivm_erase_crash_after_commit_heals_on_read(
        spark, tmp_path, monkeypatch):
    """A crash between the erase's manifest commit and the partition
    swaps heals on the next read for BOTH aggregate stores — the shared
    commit_staged_partitions machinery, pinned at these two new call
    sites."""
    from localsql_spark.sinks import merge as M
    from localsql_spark.sinks.ivm import (erase_from_view,
                                          maintain_join_view,
                                          read_join_view)
    from localsql_spark.sinks.rollup import (erase_from_rollup,
                                             maintain_rollup, read_rollup)

    ev = _events(spark)
    keys = spark.createDataFrame([(99,)], "user_id long")
    store = str(tmp_path / "roll")
    maintain_rollup(spark, store, ev, grain="hour")

    real_apply = M._apply_manifest
    crashes = {"arm": False}

    def crashing(base, manifest):
        if crashes["arm"]:
            crashes["arm"] = False
            raise OSError("simulated crash after manifest commit")
        return real_apply(base, manifest)

    monkeypatch.setattr(M, "_apply_manifest", crashing)
    crashes["arm"] = True
    with pytest.raises(OSError, match="simulated crash"):
        erase_from_rollup(spark, store, ev, keys, "user_id", grain="hour")
    # manifest stands; the next read heals and serves the erased state
    assert M._manifest_path(Path(store)).exists()
    got = read_rollup(spark, store)
    fresh = str(tmp_path / "fresh")
    maintain_rollup(spark, fresh, ev.filter(F.col("user_id") != 99),
                    grain="hour")
    cols = ["bucket_ts", "key", "n_events", "sum_value",
            "min_value", "max_value", "event_date"]
    assert sorted(map(tuple, got.select(*cols).collect())) \
        == sorted(map(tuple,
                      read_rollup(spark, fresh).select(*cols).collect()))

    # IVM twin
    dim = spark.createDataFrame([(1, "g1"), (2, "g1"), (99, "g9")],
                                "k long, grp_name string")
    fact = ev.select(F.col("event_id").alias("fid"),
                     F.col("user_id").alias("k"),
                     F.col("value").alias("v"))
    view = str(tmp_path / "view")
    maintain_join_view(spark, view, fact, dim, fact_key="k", dim_key="k",
                       group_col="grp_name", value_col="v", n_buckets=4)
    crashes["arm"] = True
    with pytest.raises(OSError, match="simulated crash"):
        erase_from_view(spark, view, fact, keys, "k", dim, fact_key="k",
                        dim_key="k", group_col="grp_name", value_col="v",
                        n_buckets=4)
    assert M._manifest_path(Path(view)).exists()
    v = read_join_view(spark, view)
    assert {r["grp"] for r in v.collect()} == {"g1"}  # g9 retracted away


def test_erase_everywhere_rollup_before_primary_ordering(spark, tmp_path):
    """The ordering contract: when the rollup's ``events`` frame READS
    FROM the primary store being erased, the composed flow must still
    retract correctly — the aggregate retraction runs BEFORE the primary
    erase (subjects' rows still readable for the negative delta), and
    the deferred audit's kept-rows recompute stays correct because the
    anti-join of already-erased rows is a no-op."""
    from localsql_spark.sinks.erase import (erase_everywhere,
                                            read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup

    ev = _events(spark)
    primary = str(tmp_path / "primary")
    write_bucketed_store(
        ev.select("event_id", "user_id", "event_type", "value", "ts"),
        primary, "event_id", n_buckets=8)
    events_from_primary = read_bucketed_store(spark, primary).drop("kb")

    roll = str(tmp_path / "roll")
    maintain_rollup(spark, roll, events_from_primary, grain="hour")

    # erase by event_id (the primary's key): user 99's events
    keys = (ev.filter(F.col("user_id") == 99).select("event_id"))
    audit = erase_everywhere(
        spark, keys,
        primary={"base_dir": primary, "key_col": "event_id",
                 "n_buckets": 8},
        rollup={"rollup_dir": roll, "events": events_from_primary,
                "subject_col": "event_id", "grain": "hour"})
    rows = {r["store"]: r for r in audit.collect()}
    assert rows["primary"]["erased_refs"] == 0
    assert rows["rollup"]["erased_refs"] == 0

    fresh = str(tmp_path / "fresh")
    maintain_rollup(spark, fresh, ev.filter(F.col("user_id") != 99),
                    grain="hour")
    cols = ["bucket_ts", "key", "n_events", "sum_value",
            "min_value", "max_value", "event_date"]
    assert sorted(map(tuple, read_rollup(spark, roll)
                      .select(*cols).collect())) \
        == sorted(map(tuple, read_rollup(spark, fresh)
                      .select(*cols).collect()))


# ---------------------------------------------------------------------------
# incrementally-maintained covariance store (sinks/cov_store.py)
# ---------------------------------------------------------------------------

def _vecs(spark, n=30, dim=5, skip=None):
    rows = [(i, [float(((i * 13 + j * 7) % 11) - 5) for j in range(dim)])
            for i in range(n) if skip is None or not skip(i)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cov_store_incremental_equals_full_and_erases(spark, tmp_path):
    """fold(b0);fold(b1) == one-shot covariance_matrix bit-for-bit;
    a negative-partial erase makes the store equal one that never saw
    the subjects; redelivery of a folded batch is byte-idempotent;
    compaction preserves the derived matrix."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import covariance_matrix
    from localsql_spark.sinks.cov_store import (cov_from_store,
                                                cov_store_erase,
                                                cov_store_fold)
    from localsql_spark.streaming.batch_dirs import compact_batches

    all_ = _vecs(spark)
    store = str(tmp_path / "cov")
    cov_store_fold(spark, store, all_.filter(F.col("vec_id") % 2 == 0), 0)
    cov_store_fold(spark, store, all_.filter(F.col("vec_id") % 2 == 1), 1)

    def mat(df):
        return {(r.j, r.k): r.cov for r in df.collect()}

    assert mat(cov_from_store(spark, store)) == mat(covariance_matrix(all_))

    # redelivery: re-folding batch 1 rewrites the same bytes, matrix fixed
    cov_store_fold(spark, store, all_.filter(F.col("vec_id") % 2 == 1), 1)
    assert mat(cov_from_store(spark, store)) == mat(covariance_matrix(all_))

    # erase: retract vec_id % 7 == 0 via negative partials
    subjects = all_.filter(F.col("vec_id") % 7 == 0)
    cov_store_erase(spark, store, subjects, batch_id=2)
    kept = _vecs(spark, skip=lambda i: i % 7 == 0)
    assert mat(cov_from_store(spark, store)) == mat(covariance_matrix(kept))

    # compaction: content-preserving fold of old batch dirs
    compact_batches(spark, store)
    assert mat(cov_from_store(spark, store)) == mat(covariance_matrix(kept))
    # superseded redelivery after compaction is skipped
    assert cov_store_fold(
        spark, store, all_.filter(F.col("vec_id") % 2 == 0), 0) is False


def test_cov_store_ledger_blocks_late_subjects(spark, tmp_path):
    """A deletion request ledgered BEFORE a late data batch folds keeps
    the subjects' contribution out of the covariance state."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import covariance_matrix
    from localsql_spark.sinks.cov_store import cov_from_store, cov_store_fold
    from localsql_spark.sinks.erase import erase_ledger_append

    all_ = _vecs(spark)
    ledger = str(tmp_path / "ledger")
    erase_ledger_append(
        all_.filter(F.col("vec_id") % 7 == 0).select("vec_id"), ledger, 0)
    store = str(tmp_path / "cov")
    cov_store_fold(spark, store, all_, 0, ledger_dir=ledger)
    kept = _vecs(spark, skip=lambda i: i % 7 == 0)
    got = {(r.j, r.k): r.cov for r in cov_from_store(spark, store).collect()}
    want = {(r.j, r.k): r.cov for r in covariance_matrix(kept).collect()}
    assert got == want


def test_erase_everywhere_covers_cov_store(spark, tmp_path):
    """erase_everywhere's cov_store config retracts and the divergence
    audit (post-erase bytes vs recompute on kept vectors) reads zero."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.cov_store import cov_store_fold
    from localsql_spark.sinks.erase import erase_everywhere

    vecs = _vecs(spark)
    store = str(tmp_path / "cov")
    cov_store_fold(spark, store, vecs, 0)
    keys = vecs.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    audit = erase_everywhere(
        spark, keys,
        cov_store={"store_dir": store, "vectors": vecs, "batch_id": 1})
    rows = {r.store: (r.rows_after, r.erased_refs)
            for r in audit.collect()}
    assert rows["cov_store"][1] == 0  # zero divergent matrix entries
    assert rows["cov_store"][0] > 0


def test_cov_store_empty_reads_none(spark, tmp_path):
    from localsql_spark.sinks.cov_store import cov_from_store

    assert cov_from_store(spark, str(tmp_path / "absent")) is None
    empty = tmp_path / "empty"
    empty.mkdir()
    assert cov_from_store(spark, str(empty)) is None


def test_ivfpq_retrain_crash_leaves_consistent_live_index(spark, tmp_path,
                                                          monkeypatch):
    """Advisor r12: write_ivfpq_index over a LIVE index must commit model
    state atomically — a retrain that dies after writing some model
    tables but before the codes must leave the OLD generation serving in
    ONE consistent basis (rotation + codebooks + codes all from the same
    train), never a mixed state whose ADC distances compute in the wrong
    basis.  The staged-build + whole-index swap is the mechanism."""
    from localsql_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    index = str(tmp_path / "ivfpq")
    S.write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8, rotate=True)
    q = emb.filter(F.col("vec_id") < 3)
    before = sorted((r.query_id, r.rn, r.neighbor_id, r.adc_dist)
                    for r in S.knn_ivfpq_from_index(spark, index, q,
                                                    k=5).collect())
    pre_bytes = {str(p): p.stat().st_size
                 for p in Path(index).rglob("*.parquet")}

    # crash injection: rotation/centroids already trained, codebook
    # training dies — the exact window the non-atomic write left open
    def _boom(*a, **k):
        raise RuntimeError("injected codebook-train crash")
    monkeypatch.setattr(S, "pq_train", _boom)
    with pytest.raises(RuntimeError, match="injected codebook-train"):
        S.write_ivfpq_index(emb.filter(F.col("vec_id") != 7), index,
                            n_cells=4, m=2, k_codes=8, rotate=True)
    monkeypatch.undo()

    # live index: byte-identical file set, identical serving results
    post_bytes = {str(p): p.stat().st_size
                  for p in Path(index).rglob("*.parquet")}
    assert post_bytes == pre_bytes
    after = sorted((r.query_id, r.rn, r.neighbor_id, r.adc_dist)
                   for r in S.knn_ivfpq_from_index(spark, index, q,
                                                   k=5).collect())
    assert after == before

    # a subsequent clean retrain sweeps the dead staging dir and commits
    S.write_ivfpq_index(emb, index, n_cells=4, m=2, k_codes=8, rotate=True)
    assert not (Path(index).parent / f".{Path(index).name}.build").exists()
    again = sorted((r.query_id, r.rn, r.neighbor_id, r.adc_dist)
                   for r in S.knn_ivfpq_from_index(spark, index, q,
                                                   k=5).collect())
    assert again == before  # deterministic trainer: same corpus, same index
