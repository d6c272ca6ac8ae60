"""Subject ACCESS export (the read half of the compliance pair),
partition-grained retention expiry, and feed time travel — extension
surface (sinks/erase.py export_subject, sinks/merge.py
expire_partitions, streaming/foreach_upsert.py table_as_of); the
reference has no persistence at all."""

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


# ---------------------------------------------------------------------------
# export_subject
# ---------------------------------------------------------------------------

def test_export_primary_matches_filter_and_prunes(spark, tmp_path):
    """Primary export == direct filter; the read is partition-pruned to
    the subjects' buckets (proven by corrupting every OTHER bucket:
    a non-pruned read would fail)."""
    from localsql_spark.sinks.erase import (bucket_of, export_subject,
                                            write_bucketed_store)

    docs = _docs(spark)
    base = str(tmp_path / "store")
    write_bucketed_store(docs, base, "doc_id", n_buckets=8)
    keys = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    touched = {r[0] for r in keys.select(
        bucket_of(F.col("doc_id"), 8).alias("kb")).distinct().collect()}
    # corrupt untouched buckets: pruning means they are never opened
    for d in Path(base).glob("kb=*"):
        if int(d.name.split("=")[1]) not in touched:
            for f in d.glob("*.parquet"):
                f.write_bytes(b"not parquet")
    got = export_subject(
        spark, keys,
        primary={"base_dir": base, "key_col": "doc_id", "n_buckets": 8})
    rows = sorted((r.doc_id, r.text) for r in got["primary"].collect())
    want = sorted((r.doc_id, r.text) for r in
                  docs.filter(F.col("doc_id") % 10 == 0).collect())
    assert rows == want and len(rows) == 4


def test_export_primary_absent_store_contract(spark, tmp_path):
    """An ABSENT primary store raises (no bytes to infer the store's
    columns from — a fabricated schema would give the manifest a
    different digest shape than a present-but-empty store); passing
    empty_schema opts into an empty frame with the caller's columns."""
    import pytest

    from localsql_spark.sinks.erase import export_subject

    keys = spark.createDataFrame([(1,)], "doc_id long")
    absent = {"base_dir": str(tmp_path / "nope"), "key_col": "doc_id",
              "n_buckets": 8}
    with pytest.raises(ValueError, match="empty_schema"):
        export_subject(spark, keys, primary=absent)
    got = export_subject(
        spark, keys,
        primary={**absent,
                 "empty_schema": "doc_id long, text string, kb int"})
    assert got["primary"].columns == ["doc_id", "text"]
    assert got["primary"].count() == 0


def test_export_aggregate_footprints(spark):
    """The aggregate-footprint section: per-subject touched-group lists
    for rollup / IVM view / cov store, derived from the subjects' own
    source rows and matching a direct recompute."""
    from localsql_spark.sinks.erase import export_subject

    ev = spark.createDataFrame(
        [(i, i % 5, f"t{i % 2}", float(i),
          f"2024-01-01 0{i % 3}:15:00") for i in range(40)],
        "eid long, user_id long, event_type string, value double, "
        "ts_s string").select(
        "eid", "user_id", "event_type", "value",
        F.col("ts_s").cast("timestamp").alias("ts"))
    fact = spark.createDataFrame(
        [(i, i % 5, i % 3) for i in range(30)],
        "fid long, user_id long, dk long")
    dim = spark.createDataFrame([(d, f"g{d}") for d in range(3)],
                                "dk long, grp string")
    vecs = spark.createDataFrame(
        [(i, i % 5, [float(i), 1.0]) for i in range(20)],
        "vid long, user_id long, embedding array<double>")
    keys = spark.createDataFrame([(1,), (3,)], "user_id long")

    exp = export_subject(
        spark, keys,
        rollup={"events": ev, "subject_col": "user_id"},
        ivm_view={"fact": fact, "subject_col": "user_id", "dim": dim,
                  "fact_key": "dk", "dim_key": "dk", "group_col": "grp"},
        cov_store={"vectors": vecs, "subject_col": "user_id"})

    roll = {(r.user_id, r.bucket_ts, r.key): r.n_contributed
            for r in exp["rollup_footprint"].collect()}
    want = {(r.user_id, r.b, r.event_type): r.n for r in
            ev.filter(F.col("user_id").isin([1, 3]))
            .groupBy("user_id",
                     F.date_format(F.date_trunc("hour", "ts"),
                                   "yyyy-MM-dd HH:00:00").alias("b"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert roll == want and roll

    ivm = {(r.user_id, r.grp): r.n_contributed
           for r in exp["ivm_footprint"].collect()}
    want_ivm = {(r.user_id, r.grp): r.n for r in
                fact.filter(F.col("user_id").isin([1, 3])).join(dim, "dk")
                .groupBy("user_id", "grp")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert ivm == want_ivm and ivm

    cov = {r.user_id: r.n_vectors for r in exp["cov_footprint"].collect()}
    assert cov == {1: 4, 3: 4}


def test_export_derived_stores_match_direct(spark, tmp_path):
    """Inverted-index postings (term-bucket-pruned via the subjects'
    text), signature rows, and SCD2 history all export exactly the
    subjects' stored rows."""
    from localsql_spark.operators.dedup import (compute_signatures,
                                                write_signature_store)
    from localsql_spark.sinks.erase import export_subject
    from localsql_spark.sinks.inverted_index import index_add_documents
    from localsql_spark.sinks.scd2_store import (apply_batch, init_store,
                                                 read_history)

    docs = _docs(spark)
    subjects = docs.filter(F.col("doc_id") % 7 == 0)
    keys = subjects.select("doc_id")

    idx = str(tmp_path / "idx")
    index_add_documents(spark, idx, docs)

    sig_store = str(tmp_path / "sigs")
    write_signature_store(docs, sig_store)
    sigs = compute_signatures(docs)

    scd2 = str(tmp_path / "scd2")
    dim = docs.select("doc_id", F.substring("text", 1, 8).alias("attr"))
    init_store(dim, scd2, ["doc_id"], ["attr"], 1_000_000)
    upd = (docs.filter(F.col("doc_id") % 2 == 0)
           .select("doc_id", F.lit("CHANGED").alias("attr")))
    apply_batch(spark, scd2, upd, ["doc_id"], ["attr"], 2_000_000,
                batch_id=1)

    got = export_subject(
        spark, keys,
        inverted_index={"index_dir": idx, "n_buckets": 16,
                        "doc_id_col": "doc_id", "text_col": "text",
                        "docs": subjects},
        signature_store={"store_path": sig_store},
        scd2={"store_dir": scd2, "key_col": "doc_id"})

    subj_ids = {r.doc_id for r in keys.collect()}
    post = got["inverted_index"].collect()
    assert post and all(r.doc_id in subj_ids for r in post)
    # postings complete: every subject term posting present
    from localsql_spark.sinks.merge import read_base_partitions
    all_posts = read_base_partitions(spark, idx, "tb", list(range(16)))
    want_posts = {(r.term, r.doc_id, r.tf) for r in all_posts.collect()
                  if r.doc_id in subj_ids}
    assert {(r.term, r.doc_id, r.tf) for r in post} == want_posts

    got_sigs = {(r.doc_id, tuple(r.sig)) for r in
                got["signature_store"].collect()}
    want_sigs = {(r.doc_id, tuple(r.sig)) for r in sigs.collect()
                 if r.doc_id in subj_ids}
    assert got_sigs == want_sigs and got_sigs

    hist = {(r.doc_id, r.attr, r.valid_from_us, r.valid_to_us)
            for r in got["scd2"].collect()}
    want_hist = {(r.doc_id, r.attr, r.valid_from_us, r.valid_to_us)
                 for r in read_history(spark, scd2).collect()
                 if r.doc_id in subj_ids}
    assert hist == want_hist
    # %14 keys have two versions (init + CHANGED)
    assert any(r.doc_id % 14 == 0 for r in got["scd2"].collect())


def test_export_feed_ledger_and_manifest(spark, tmp_path):
    """Feed export reads ONLY touched batch dirs; ledger export names
    prior deletion requests; access_manifest folds all stores into one
    (store, subject_key, record_md5) frame with correct digests."""
    from localsql_spark.sinks.erase import (access_manifest,
                                            erase_ledger_append,
                                            export_subject)
    from localsql_spark.streaming.foreach_upsert import apply_batch_with_feed

    docs = _docs(spark, n=20)
    out_dir = str(tmp_path / "table")
    feed_dir = str(tmp_path / "feed")
    b0 = docs.withColumn("version", F.lit(1))
    b1 = (docs.filter(F.col("doc_id") % 2 == 0)
          .withColumn("version", F.lit(2)))
    apply_batch_with_feed(b0, 0, key="doc_id", version="version",
                          out_dir=out_dir, feed_dir=feed_dir)
    apply_batch_with_feed(b1, 1, key="doc_id", version="version",
                          out_dir=out_dir, feed_dir=feed_dir)

    ledger_dir = str(tmp_path / "ledger")
    erase_ledger_append(
        spark.createDataFrame([(3,), (6,)], "doc_id long"),
        ledger_dir, batch_id=0)

    # subject 3: odd -> only feed batch 0; in the ledger
    keys = spark.createDataFrame([(3,)], "doc_id long")
    got = export_subject(spark, keys,
                         feed={"feed_dir": feed_dir, "key_col": "doc_id"},
                         ledger={"ledger_dir": ledger_dir})
    feed_rows = got["feed"].collect()
    assert [(r.doc_id, r.op, r.batch_id) for r in feed_rows] == \
        [(3, "insert", 0)]
    assert [r.erased_key for r in got["ledger"].collect()] == [3]

    shaped = {
        "feed": got["feed"].select("doc_id", "op", "batch_id",
                                   "new_version"),
        "ledger": got["ledger"],
    }
    man = access_manifest(
        shaped, key_cols={"feed": "doc_id", "ledger": "erased_key"})
    rows = man.collect()
    assert sorted(r.store for r in rows) == ["feed", "ledger"]
    assert all(r.subject_key == "3" for r in rows)
    # digest replayable: batch_id, doc_id, new_version, op sorted by name
    import hashlib
    want = hashlib.md5("\x1f".join(["0", "3", "1", "insert"])
                       .encode()).hexdigest()
    assert [r.record_md5 for r in rows if r.store == "feed"] == [want]


def test_access_erase_coherence(spark, tmp_path):
    """After erase_everywhere, the same access request returns ZERO rows
    from every store — the two halves agree on the surface."""
    from localsql_spark.sinks.erase import (erase_everywhere, export_subject,
                                            write_bucketed_store)

    docs = _docs(spark)
    base = str(tmp_path / "store")
    write_bucketed_store(docs, base, "doc_id", n_buckets=8)
    keys = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    cfg = {"base_dir": base, "key_col": "doc_id", "n_buckets": 8}
    before = export_subject(spark, keys, primary=cfg)["primary"].count()
    assert before == 4
    erase_everywhere(spark, keys, primary=cfg)
    after = export_subject(spark, keys, primary=cfg)["primary"].count()
    assert after == 0


# ---------------------------------------------------------------------------
# expire_partitions
# ---------------------------------------------------------------------------

def _dated_store(spark, tmp_path, name="dated"):
    rows = [(i, f"2024-01-{(i % 9) + 1:02d}", i * 10) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, d string, v long")
    base = str(tmp_path / name)
    (df.repartition(F.col("d")).write.mode("overwrite")
     .partitionBy("d").parquet(base))
    return base, df


def test_expire_partitions_drops_old_keeps_new_bytes(spark, tmp_path):
    from localsql_spark.sinks.merge import expire_partitions

    base, df = _dated_store(spark, tmp_path)
    kept_files = {
        str(f): f.read_bytes()
        for d in Path(base).glob("d=*") if d.name >= "d=2024-01-04"
        for f in d.rglob("*.parquet")}
    removed = expire_partitions(base, "d", "2024-01-04")
    assert removed == [f"d=2024-01-0{i}" for i in (1, 2, 3)]
    got = sorted(r.id for r in spark.read.parquet(base).collect())
    want = sorted(r.id for r in df.filter(F.col("d") >= "2024-01-04")
                  .collect())
    assert got == want
    # survivors byte-identical (never opened, never rewritten)
    for path, bytes_ in kept_files.items():
        assert Path(path).read_bytes() == bytes_
    # idempotent
    assert expire_partitions(base, "d", "2024-01-04") == []


def test_expire_partitions_int_parse_and_empty(spark, tmp_path):
    from localsql_spark.sinks.merge import expire_partitions

    rows = [(i, i % 12) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, kb int")
    base = str(tmp_path / "intstore")
    df.write.mode("overwrite").partitionBy("kb").parquet(base)
    # lexical would drop kb=10,11 below cutoff "2"; int parse must not
    removed = expire_partitions(base, "kb", 2, parse=int)
    assert removed == ["kb=0", "kb=1"]
    assert spark.read.parquet(base).count() == 50
    # expiring everything leaves an empty-but-healable store
    expire_partitions(base, "kb", 99, parse=int)
    assert not any(Path(base).rglob("*.parquet"))
    assert expire_partitions(str(tmp_path / "absent"), "kb", 1) == []


# ---------------------------------------------------------------------------
# feed time travel
# ---------------------------------------------------------------------------

def test_table_as_of_reconstructs_each_state(spark, tmp_path):
    from localsql_spark.streaming.foreach_upsert import (
        apply_batch_with_feed, read_table, table_as_of)

    docs = _docs(spark, n=12).select("doc_id", "text")
    out_dir = str(tmp_path / "table")
    feed_dir = str(tmp_path / "feed")
    b0 = docs.withColumn("version", F.lit(1))
    b1 = (docs.filter(F.col("doc_id") % 2 == 0)
          .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
          .withColumn("version", F.lit(2)))
    b2 = (docs.filter(F.col("doc_id") % 3 == 0)
          .withColumn("text", F.concat(F.lit("v3 "), F.col("text")))
          .withColumn("version", F.lit(3)))
    for i, b in enumerate((b0, b1, b2)):
        apply_batch_with_feed(b, i, key="doc_id", version="version",
                              out_dir=out_dir, feed_dir=feed_dir)

    as_of_0 = table_as_of(spark, feed_dir, key="doc_id", batch_id=0)
    assert sorted((r.doc_id, r.version) for r in as_of_0.collect()) == \
        [(i, 1) for i in range(12)]

    as_of_1 = {r.doc_id: (r.version, r.text)
               for r in table_as_of(spark, feed_dir, key="doc_id",
                                    batch_id=1).collect()}
    assert as_of_1[4] == (2, "v2 " + "doc 4 body " + " ".join(
        f"w{(4 * 7 + j) % 23}" for j in range(12)) + " window hash")
    assert as_of_1[5][0] == 1

    # as-of the last batch == the stored table, exactly
    final = table_as_of(spark, feed_dir, key="doc_id", batch_id=2)
    want = {(r.doc_id, r.version, r.text)
            for r in read_table(spark, out_dir).collect()}
    assert {(r.doc_id, r.version, r.text)
            for r in final.collect()} == want


def test_table_as_of_tombstone_and_bounds(spark, tmp_path):
    """A delete row drops the key from later reconstructions; an
    out-of-range as-of returns None; later batches are never opened
    (corrupting them does not break an earlier as-of)."""
    from localsql_spark.streaming.foreach_upsert import (
        apply_batch_with_feed, table_as_of)

    docs = _docs(spark, n=6).select("doc_id", "text")
    out_dir = str(tmp_path / "table")
    feed_dir = str(tmp_path / "feed")
    apply_batch_with_feed(docs.withColumn("version", F.lit(1)), 0,
                          key="doc_id", version="version",
                          out_dir=out_dir, feed_dir=feed_dir)
    # hand-written tombstone batch (the producer path has no op_col yet)
    feed0 = spark.read.parquet(str(Path(feed_dir) / "batch_0"))
    tomb = (feed0.filter(F.col("doc_id") == 2)
            .withColumn("op", F.lit("delete"))
            .withColumn("new_version", F.lit(2)))
    tomb.write.mode("overwrite").parquet(str(Path(feed_dir) / "batch_1"))

    assert table_as_of(spark, feed_dir, key="doc_id",
                       batch_id=-1) is None
    ids_0 = {r.doc_id for r in table_as_of(
        spark, feed_dir, key="doc_id", batch_id=0).collect()}
    assert ids_0 == set(range(6))

    # corrupt a LATER batch: as-of 0 must not open it
    for f in (Path(feed_dir) / "batch_1").glob("*.parquet"):
        f.write_bytes(b"junk")
    assert {r.doc_id for r in table_as_of(
        spark, feed_dir, key="doc_id", batch_id=0).collect()} == \
        set(range(6))


def test_table_as_of_tombstone_drop(spark, tmp_path):
    from localsql_spark.sinks.merge import change_feed
    from localsql_spark.streaming.foreach_upsert import table_as_of

    rows = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, val string, version int")
    feed_dir = tmp_path / "feed"
    f0 = change_feed(None, rows, key="k", version="version")
    f0.write.mode("overwrite").parquet(str(feed_dir / "batch_0"))
    upd = spark.createDataFrame(
        [(1, "a2", 2, "upsert"), (2, "b", 2, "delete")],
        "k long, val string, version int, op string")
    f1 = change_feed(rows, upd, key="k", version="version", op_col="op")
    f1.write.mode("overwrite").parquet(str(feed_dir / "batch_1"))

    got = table_as_of(spark, str(feed_dir), key="k", batch_id=1)
    assert [(r.k, r.val, r.version) for r in got.collect()] == \
        [(1, "a2", 2)]


def test_export_vector_stores_match_direct(spark, tmp_path):
    """IVF (full vectors, cell-pruned two-phase read) and IVFPQ (code
    rows) exports return exactly the subjects' stored rows; after the
    matching erase both exports are empty (access/erase coherence on
    the vector surface)."""
    from localsql_spark.operators.similarity import (ivf_erase_vectors,
                                                     ivfpq_erase_vectors,
                                                     write_ivf_index,
                                                     write_ivfpq_index)
    from localsql_spark.sinks.erase import export_subject

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + j * 7) % 11) for j in range(16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    ivf = str(tmp_path / "ivf")
    pq = str(tmp_path / "ivfpq")
    write_ivf_index(emb, ivf, n_cells=4)
    write_ivfpq_index(emb, pq, n_cells=4, m=2, k_codes=8)

    keys = spark.createDataFrame([(i,) for i in range(0, 40, 7)],
                                 "vec_id long")
    subj = {r[0] for r in keys.collect()}
    got = export_subject(spark, keys,
                         ivf_index={"index_path": ivf},
                         ivfpq_index={"index_path": pq})
    ivf_rows = got["ivf_index"].collect()
    assert {r.neighbor_id for r in ivf_rows} == subj
    # the full embedding is disclosed
    assert all(len(r.cv) == 16 for r in ivf_rows)
    pq_rows = got["ivfpq_index"].collect()
    assert {r.neighbor_id for r in pq_rows} == subj
    assert len(pq_rows) == 2 * len(subj)  # m rows per vector

    ivf_erase_vectors(spark, ivf, keys)
    ivfpq_erase_vectors(spark, pq, keys)
    after = export_subject(spark, keys,
                           ivf_index={"index_path": ivf},
                           ivfpq_index={"index_path": pq})
    assert after["ivf_index"].count() == 0
    assert after["ivfpq_index"].count() == 0


def test_model_store_footprints(spark):
    """NB / sketch-view / cov-store footprints (verdict r12 task 6): the
    non-row-exportable model stores are NAMED in the access response —
    word rows, group rows, vector counts — computed from the subjects'
    own source rows with each store's own expressions."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import export_subject

    docs = spark.createDataFrame(
        [(1, "srcA", "alpha beta alpha"),
         (2, "srcA", "gamma"),
         (3, "srcB", "delta epsilon zeta eta"),
         (4, "srcB", "")],
        "doc_id long, source string, text string")
    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(6)],
        "vec_id long, embedding array<double>")

    exp = export_subject(
        spark, spark.createDataFrame([(1,), (3,), (4,)], "doc_id long"),
        nb_model={"docs": docs, "subject_col": "doc_id"},
        sketch_view={"docs": docs, "subject_col": "doc_id",
                     "group_col": "source"})
    nb = {(r.doc_id, r.word): r.n_contributed
          for r in exp["nb_footprint"].collect()}
    # doc 2 is not a subject; doc 1's repeated token counts twice
    assert nb == {(1, "alpha"): 2, (1, "beta"): 1,
                  (3, "delta"): 1, (3, "epsilon"): 1,
                  (3, "zeta"): 1, (3, "eta"): 1}
    sk = {(r.doc_id, r.grp): (r.n_docs_contributed, r.n_ngrams_contributed)
          for r in exp["sketch_footprint"].collect()}
    # bigram counts = max(tokens-1, 0): doc1 3 toks -> 2 grams,
    # doc3 4 -> 3, doc4 empty -> 0 grams but still 1 contributed doc
    assert sk == {(1, "srcA"): (1, 2), (3, "srcB"): (1, 3),
                  (4, "srcB"): (1, 0)}

    expv = export_subject(
        spark, spark.createDataFrame([(0,), (5,)], "vec_id long"),
        cov_store={"vectors": emb, "subject_col": "vec_id"})
    cov = {r.vec_id: r.n_vectors for r in expv["cov_footprint"].collect()}
    assert cov == {0: 1, 5: 1}
