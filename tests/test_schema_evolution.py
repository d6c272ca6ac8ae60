"""Additive schema evolution (sinks/schema_evolution.py): registry
mechanics, reconciled reads across the evolution boundary on the
bucketed store / generation table / CDC feed, time travel across the
boundary, and erase/access schema-version-safety."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=24):
    return spark.createDataFrame(
        [(i, f"text {i}", 1) for i in range(n)],
        "doc_id long, text string, version long")


# ---------------------------------------------------------------------------
# registry mechanics
# ---------------------------------------------------------------------------

def test_registry_mechanics(tmp_path):
    from localsql_spark.sinks.schema_evolution import (current_columns,
                                                       evolve_schema,
                                                       init_schema,
                                                       schema_version)

    store = str(tmp_path / "s")
    assert schema_version(store) == 0
    with pytest.raises(ValueError, match="init_schema"):
        evolve_schema(store, {"q": "double"})
    assert init_schema(store, {"doc_id": "bigint", "text": "string"}) == 1
    # idempotent re-init with the same base schema
    assert init_schema(store, {"doc_id": "bigint", "text": "string"}) == 1
    with pytest.raises(ValueError, match="different schema"):
        init_schema(store, {"doc_id": "bigint"})
    assert evolve_schema(store, {"q": "double"},
                         defaults={"q": 0.5}) == 2
    with pytest.raises(ValueError, match="additive"):
        evolve_schema(store, {"q": "string"})  # type change in disguise
    with pytest.raises(ValueError, match="nothing to add"):
        evolve_schema(store, {})
    with pytest.raises(ValueError, match="defaults name columns"):
        evolve_schema(store, {"r": "int"}, defaults={"zz": 1})
    cols, defaults = current_columns(store)
    assert list(cols) == ["doc_id", "text", "q"]
    assert defaults == {"q": 0.5}
    assert schema_version(store) == 2
    # idempotent re-init accepts the CURRENT (evolved) contract too —
    # a setup script naturally re-registers with what the store now is
    assert init_schema(store, {"doc_id": "bigint", "text": "string",
                               "q": "double"}) == 2
    with pytest.raises(ValueError, match="different schema"):
        init_schema(store, {"doc_id": "bigint", "q": "double"})


# ---------------------------------------------------------------------------
# bucketed store: merge + erase + access across the boundary
# ---------------------------------------------------------------------------

def test_bucketed_store_evolution_merge_erase_access(spark, tmp_path):
    from localsql_spark.sinks.erase import (erase_keys, export_subject,
                                            read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.sinks.merge import merge_into_partitioned
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    docs = _docs(spark)
    base = str(tmp_path / "store")
    write_bucketed_store(docs, base, "doc_id", n_buckets=4)
    init_schema(base, {"doc_id": "bigint", "text": "string",
                       "version": "bigint"}, partition=("kb", "int"))
    evolve_schema(base, {"quality": "double"}, defaults={"quality": 0.5})

    # pin untouched partitions: the evolution itself moves no byte
    pre = {str(p): hashlib.md5(p.read_bytes()).hexdigest()
           for p in Path(base).rglob("*.parquet")}

    # merge a v2 batch carrying the new column for doc_id % 4 == 1
    upd = (docs.filter("doc_id % 4 = 1")
           .select("doc_id", F.concat(F.lit("NEW "), "text").alias("text"),
                   F.lit(2).alias("version"),
                   (F.col("doc_id") / 10.0).alias("quality")))
    from localsql_spark.sinks.erase import bucket_of
    upd = upd.withColumn("kb", bucket_of(F.col("doc_id"), 4))
    merge_into_partitioned(spark, base, upd, key="doc_id",
                           version="version", partition_col="kb")

    got = {r.doc_id: (r.text, r.version, r.quality)
           for r in read_bucketed_store(spark, base).collect()}
    assert len(got) == 24
    for i in range(24):
        if i % 4 == 1:
            assert got[i] == (f"NEW text {i}", 2, i / 10.0)
        else:
            # pre-evolution rows read back with the declared default
            assert got[i] == (f"text {i}", 1, 0.5)
    # partitions the merge didn't touch are byte-stable (evolution +
    # reconciled read never rewrite old bytes)
    touched_kb = {r[0] for r in upd.select("kb").distinct().collect()}
    for p, h in pre.items():
        kb = int(Path(p).parent.name.split("=")[1])
        if kb not in touched_kb:
            assert hashlib.md5(Path(p).read_bytes()).hexdigest() == h

    # unregistered column rejected: evolve first, then ingest
    bad = upd.withColumn("rogue", F.lit(1))
    with pytest.raises(ValueError, match="unregistered columns.*rogue"):
        merge_into_partitioned(spark, base, bad, key="doc_id",
                               version="version", partition_col="kb")

    # erase across the boundary: keys in touched AND untouched buckets
    keys = spark.createDataFrame([(1,), (2,)], "doc_id long")
    erase_keys(spark, base, keys, "doc_id", n_buckets=4)
    post = {r.doc_id: (r.text, r.version, r.quality)
            for r in read_bucketed_store(spark, base).collect()}
    assert set(post) == set(range(24)) - {1, 2}
    assert post[5] == ("NEW text 5", 2, 0.5)  # rewritten bucket, default
    assert post[0] == ("text 0", 1, 0.5)

    # access export sees the evolved shape from any bucket vintage
    exp = export_subject(
        spark, spark.createDataFrame([(0,), (5,)], "doc_id long"),
        primary={"base_dir": base, "key_col": "doc_id", "n_buckets": 4})
    rows = {r.doc_id: r.quality for r in exp["primary"].collect()}
    assert rows == {0: 0.5, 5: 0.5}
    assert "quality" in exp["primary"].columns


# ---------------------------------------------------------------------------
# generation table + CDC feed: streaming twin, time travel across boundary
# ---------------------------------------------------------------------------

def test_feed_and_table_evolution_time_travel(spark, tmp_path):
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)
    from localsql_spark.streaming.foreach_upsert import (apply_batch_with_feed,
                                                         read_feed,
                                                         read_table,
                                                         table_as_of)

    out = str(tmp_path / "table")
    feed = str(tmp_path / "feed")
    Path(out).mkdir()
    Path(feed).mkdir()
    init_schema(out, {"doc_id": "bigint", "text": "string",
                      "version": "bigint"})
    init_schema(feed, {"doc_id": "bigint", "op": "string",
                       "new_text": "string", "new_version": "bigint",
                       "old_text": "string", "old_version": "bigint"})

    b0 = spark.createDataFrame(
        [(i, f"t{i}", 1) for i in range(6)],
        "doc_id long, text string, version long")
    apply_batch_with_feed(b0, 0, key="doc_id", version="version",
                          out_dir=out, feed_dir=feed)
    b1 = spark.createDataFrame(
        [(i, f"u{i}", 2) for i in range(0, 6, 2)],
        "doc_id long, text string, version long")
    apply_batch_with_feed(b1, 1, key="doc_id", version="version",
                          out_dir=out, feed_dir=feed)

    # EVOLVE table + feed, then land a post-boundary batch with the column
    evolve_schema(out, {"quality": "double"}, defaults={"quality": 0.9})
    evolve_schema(feed, {"new_quality": "double",
                         "old_quality": "double"})
    b2 = spark.createDataFrame(
        [(1, "w1", 3, 0.7), (7, "w7", 3, 0.2)],
        "doc_id long, text string, version long, quality double")
    apply_batch_with_feed(b2, 2, key="doc_id", version="version",
                          out_dir=out, feed_dir=feed)

    # current table: evolved shape, pre-boundary rows get the default
    cur = {r.doc_id: (r.text, r.quality)
           for r in read_table(spark, out).collect()}
    assert cur[1] == ("w1", 0.7) and cur[7] == ("w7", 0.2)
    assert cur[0] == ("u0", 0.9) and cur[3] == ("t3", 0.9)

    # feed read spans the boundary with one stable shape
    f = read_feed(spark, feed)
    assert "new_quality" in f.columns
    by_batch = {(r.batch_id, r.doc_id): r.new_quality for r in f.collect()}
    assert by_batch[(2, 1)] == 0.7
    assert by_batch[(0, 1)] is None  # pre-boundary feed rows: null

    # TIME TRAVEL across the boundary: as-of batch 1 (pre-evolution
    # history) reconstructs under the CURRENT contract — quality null
    # (feed registry declares no default), doc set exactly mid-history
    t1 = {r.doc_id: (r.text, r.version, r.quality)
          for r in table_as_of(spark, feed, key="doc_id",
                               batch_id=1).collect()}
    assert set(t1) == set(range(6))
    assert t1[0] == ("u0", 2, None) and t1[1] == ("t1", 1, None)
    t2 = {r.doc_id: (r.text, r.version, r.quality)
          for r in table_as_of(spark, feed, key="doc_id",
                               batch_id=2).collect()}
    assert t2[1] == ("w1", 3, 0.7) and t2[7] == ("w7", 3, 0.2)
    assert t2[0] == ("u0", 2, None)

    # old producer keeps working post-evolution: batch WITHOUT the new
    # column pads (default applies at the table)
    b3 = spark.createDataFrame([(2, "x2", 4)],
                               "doc_id long, text string, version long")
    apply_batch_with_feed(b3, 3, key="doc_id", version="version",
                          out_dir=out, feed_dir=feed)
    cur = {r.doc_id: (r.text, r.quality)
           for r in read_table(spark, out).collect()}
    assert cur[2] == ("x2", 0.9)

    # unregistered column raises at the streaming sink too
    b4 = spark.createDataFrame([(3, "y3", 5, "zzz")],
                               "doc_id long, text string, version long, "
                               "rogue string")
    with pytest.raises(ValueError, match="unregistered columns"):
        apply_batch_with_feed(b4, 4, key="doc_id", version="version",
                              out_dir=out, feed_dir=feed)


def test_feed_erase_schema_version_safe(spark, tmp_path):
    """erase_from_feed across the boundary: each touched dir rewrites
    from its OWN per-dir read, so an old-schema dir keeps its shape and
    a new-schema dir keeps its added column — no cross-contamination."""
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)
    from localsql_spark.streaming.foreach_upsert import (erase_from_feed,
                                                         read_feed)

    feed = str(tmp_path / "feed")
    init_schema(feed, {"doc_id": "bigint", "op": "string",
                       "new_text": "string"})
    spark.createDataFrame([(i, "insert", f"t{i}") for i in range(4)],
                          "doc_id long, op string, new_text string") \
        .coalesce(1).write.parquet(str(Path(feed) / "batch_0"))
    evolve_schema(feed, {"new_quality": "double"})
    spark.createDataFrame([(i, "update", f"u{i}", 0.1 * i)
                           for i in range(4)],
                          "doc_id long, op string, new_text string, "
                          "new_quality double") \
        .coalesce(1).write.parquet(str(Path(feed) / "batch_1"))

    touched = erase_from_feed(
        spark, feed, spark.createDataFrame([(2,)], "doc_id long"),
        "doc_id")
    assert touched == [0, 1]
    rows = {(r.batch_id, r.doc_id): (r.new_text, r.new_quality)
            for r in read_feed(spark, feed).collect()}
    assert (0, 2) not in rows and (1, 2) not in rows
    assert rows[(1, 3)] == ("u3", pytest.approx(0.3))
    assert rows[(0, 3)] == ("t3", None)
    # the rewritten old-schema dir kept its historical shape on disk
    raw0 = spark.read.parquet(str(Path(feed) / "batch_0"))
    assert "new_quality" not in raw0.columns


def test_write_mode_preserves_explicit_null_in_bytes(spark, tmp_path):
    """The mode-split default contract (review round 12): a
    post-evolution producer's explicit NULL is STORED as NULL (write
    reconciliation never coalesces a present column), so the bytes stay
    canonical; a declared default is a READ-TIME null-fill — it applies
    at read (documented: plain parquet cannot distinguish pre-evolution
    absence from explicit NULL at frame level), and a column WITHOUT a
    declared default round-trips NULL exactly."""
    from localsql_spark.sinks.erase import (read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.sinks.merge import merge_into_partitioned
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    docs = _docs(spark, 8)
    base = str(tmp_path / "store")
    write_bucketed_store(docs, base, "doc_id", n_buckets=2)
    init_schema(base, {"doc_id": "bigint", "text": "string",
                       "version": "bigint"}, partition=("kb", "int"))
    evolve_schema(base, {"quality": "double"}, defaults={"quality": 0.5})
    evolve_schema(base, {"note": "string"})  # no default

    from localsql_spark.sinks.erase import bucket_of
    upd = spark.createDataFrame(
        [(0, "t0", 2, None, None), (1, "t1", 2, 0.7, "kept")],
        "doc_id long, text string, version long, quality double, "
        "note string").withColumn("kb", bucket_of(F.col("doc_id"), 2))
    merge_into_partitioned(spark, base, upd, key="doc_id",
                           version="version", partition_col="kb")

    # RAW bytes of the touched partitions: explicit NULL stored as NULL
    raw = {r.doc_id: (r.quality, r.note) for r in
           spark.read.option("basePath", base).parquet(base)
           .filter("version = 2").collect()}
    assert raw[0] == (None, None)
    assert raw[1] == (0.7, "kept")
    # registry read: declared default fills quality's nulls (documented
    # whole-column read-time semantics); no-default note stays NULL
    got = {r.doc_id: (r.quality, r.note) for r in
           read_bucketed_store(spark, base).collect()}
    assert got[0] == (0.5, None)
    assert got[1] == (0.7, "kept")
    assert got[2] == (0.5, None)  # pre-evolution row


def test_rewrite_does_not_bake_defaults_into_carried_rows(spark, tmp_path):
    """Advisor r12: reads that FEED A REWRITE must reconcile in write
    mode.  A carried base row's post-evolution explicit NULL (and a
    pre-evolution row's absent value) must stay NULL in the rewritten
    partition bytes after a later merge or erase touches its partition —
    the read-default is read-time only, never baked into storage."""
    from localsql_spark.sinks.erase import (bucket_of, erase_keys,
                                            read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.sinks.merge import merge_into_partitioned
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    docs = _docs(spark, 8)
    base = str(tmp_path / "store")
    write_bucketed_store(docs, base, "doc_id", n_buckets=2)
    init_schema(base, {"doc_id": "bigint", "text": "string",
                       "version": "bigint"}, partition=("kb", "int"))
    evolve_schema(base, {"quality": "double"}, defaults={"quality": 0.5})

    # batch 1: doc 0 stores an EXPLICIT NULL quality (canonical bytes)
    upd1 = spark.createDataFrame(
        [(0, "t0", 2, None)],
        "doc_id long, text string, version long, quality double") \
        .withColumn("kb", bucket_of(F.col("doc_id"), 2))
    merge_into_partitioned(spark, base, upd1, key="doc_id",
                           version="version", partition_col="kb")

    # pick two other keys that share doc 0's bucket, so batch 2 and the
    # erase both REWRITE the partition holding doc 0's explicit NULL
    kbs = {r.doc_id: r.kb for r in
           docs.withColumn("kb", bucket_of(F.col("doc_id"), 2)).collect()}
    same = [i for i in range(1, 8) if kbs[i] == kbs[0]]
    key2, ekey = same[0], same[1]

    # batch 2 touches the SAME partition via a different key: doc 0 and
    # the pre-evolution rows are CARRIED rows in the rewrite
    upd2 = spark.createDataFrame(
        [(key2, "t2", 2, 0.9)],
        "doc_id long, text string, version long, quality double") \
        .withColumn("kb", bucket_of(F.col("doc_id"), 2))
    merge_into_partitioned(spark, base, upd2, key="doc_id",
                           version="version", partition_col="kb")

    raw = {r.doc_id: r.quality for r in
           spark.read.option("basePath", base).parquet(base).collect()}
    assert raw[0] is None, "explicit NULL baked over by merge rewrite"
    assert raw[key2] == 0.9
    # pre-evolution carried rows also store NULL, not the default
    pre_ev = [r.quality for r in
              spark.read.option("basePath", base).parquet(base)
              .filter("version = 1").collect()]
    assert all(q is None for q in pre_ev)

    # erase is a rewrite too: erasing another key in the same bucket
    # must not bake defaults into the kept rows' bytes
    erase_keys(spark, base,
               spark.createDataFrame([(ekey,)], "doc_id long"),
               "doc_id", n_buckets=2)
    raw = {r.doc_id: r.quality for r in
           spark.read.option("basePath", base).parquet(base).collect()}
    assert ekey not in raw
    assert raw[0] is None, "explicit NULL baked over by erase rewrite"
    # the READ surface still applies the declared default
    got = {r.doc_id: r.quality
           for r in read_bucketed_store(spark, base).collect()}
    assert got[0] == 0.5 and got[key2] == 0.9


def test_generation_rewrite_keeps_explicit_null(spark, tmp_path):
    """Same advisor-r12 contract on the generation-pointer table: the
    next apply_batch rewrites EVERY carried row into the new generation;
    explicit NULLs must survive in the new generation's bytes."""
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)
    from localsql_spark.streaming.foreach_upsert import (_current_generation,
                                                         apply_batch,
                                                         read_table)

    out = str(tmp_path / "table")
    Path(out).mkdir()
    init_schema(out, {"doc_id": "bigint", "text": "string",
                      "version": "bigint"})
    apply_batch(spark.createDataFrame(
        [(0, "t0", 1), (1, "t1", 1)],
        "doc_id long, text string, version long"),
        0, key="doc_id", version="version", out_dir=out)
    evolve_schema(out, {"quality": "double"}, defaults={"quality": 0.9})
    # explicit NULL for doc 0 post-evolution
    apply_batch(spark.createDataFrame(
        [(0, "u0", 2, None)],
        "doc_id long, text string, version long, quality double"),
        1, key="doc_id", version="version", out_dir=out)
    # a third batch carries doc 0 and 1 forward into gen_2's bytes
    apply_batch(spark.createDataFrame(
        [(2, "t2", 1, 0.3)],
        "doc_id long, text string, version long, quality double"),
        2, key="doc_id", version="version", out_dir=out)

    gen = _current_generation(out)
    raw = {r.doc_id: r.quality
           for r in spark.read.parquet(str(gen)).collect()}
    assert raw[0] is None, "explicit NULL baked over by generation rewrite"
    assert raw[1] is None  # pre-evolution carried row: canonical NULL
    assert raw[2] == 0.3
    got = {r.doc_id: r.quality for r in read_table(spark, out).collect()}
    assert got == {0: 0.9, 1: 0.9, 2: 0.3}  # read-time default intact


def test_compact_preserves_evolved_columns_across_vintages(spark, tmp_path):
    """Advisor r12: compact_partitions on a schema-registered store whose
    fat partition spans evolution vintages must supply the registry's
    evolved schema to the compaction read — a raw read infers from one
    arbitrary file, and a pre-evolution file there silently DROPS the
    evolved column's data from newer files."""
    from localsql_spark.sinks.erase import (read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.sinks.merge import compact_partitions
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    docs = _docs(spark, 6)
    base = str(tmp_path / "store")
    write_bucketed_store(docs.coalesce(1), base, "doc_id", n_buckets=1)
    init_schema(base, {"doc_id": "bigint", "text": "string",
                       "version": "bigint"}, partition=("kb", "int"))
    evolve_schema(base, {"quality": "double"})

    # an external/sliver writer lands a SECOND file in the same
    # partition dir carrying the evolved column
    pdir = Path(base) / "kb=0"
    extra = spark.createDataFrame(
        [(100, "x100", 1, 0.7), (101, "x101", 1, 0.2)],
        "doc_id long, text string, version long, quality double") \
        .withColumn("kb", F.lit(0))
    scratch = tmp_path / "scratch"
    (extra.coalesce(1).write.mode("overwrite").partitionBy("kb")
     .parquet(str(scratch)))
    import shutil
    src = next((scratch / "kb=0").glob("*.parquet"))
    shutil.copy(src, pdir / f"part-extra-{src.name}")
    assert len(list(pdir.glob("*.parquet"))) == 2

    rewritten = compact_partitions(spark, base, "kb")
    assert rewritten == ["kb=0"]
    assert len(list(pdir.glob("*.parquet"))) == 1
    got = {r.doc_id: r.quality
           for r in read_bucketed_store(spark, base).collect()}
    assert got[100] == 0.7 and got[101] == 0.2, \
        "evolved column data lost in compaction rewrite"
    assert got[0] is None  # pre-evolution rows: NULL, never fabricated


def test_write_mode_rejects_uncastable_values(spark, tmp_path):
    """Advisor r12: write-mode reconciliation validates the cast — a
    producer value the registry type cannot represent raises at write
    instead of being silently stored as NULL (schema corruption); a
    genuinely castable representation still flows."""
    from localsql_spark.sinks.schema_evolution import (init_schema,
                                                       reconcile_frame)

    store = str(tmp_path / "s")
    init_schema(store, {"doc_id": "bigint", "quality": "double"})

    ok = spark.createDataFrame([(1, "0.75")],
                               "doc_id long, quality string")
    got = reconcile_frame(ok, store, mode="write").collect()
    assert got[0].quality == 0.75

    bad = spark.createDataFrame([(1, "0.5"), (2, "abc")],
                                "doc_id long, quality string")
    with pytest.raises(Exception, match="does not cast"):
        reconcile_frame(bad, store, mode="write").collect()

    # a NULL in a mistyped column is still a NULL, not an error
    nullish = spark.createDataFrame([(3, None)],
                                    "doc_id long, quality string")
    assert reconcile_frame(nullish, store,
                           mode="write").first().quality is None


# ---------------------------------------------------------------------------
# round 13: registry extended to the fold stores + signature store
# ---------------------------------------------------------------------------

def test_rollup_registry_read_and_strict_fold_gate(spark, tmp_path):
    """A registered rollup reconciles mixed partition vintages at read,
    and the STRICT write gate refuses a fold whose output lacks an
    evolved column (a group-projecting rewrite would overwrite stored
    values with NULL) — evolve registry + extend fold code together."""
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    ev = spark.createDataFrame(
        [(i, "click", float(i), f"2024-01-0{1 + i % 2} 10:{i % 60:02d}:00")
         for i in range(20)],
        "event_id long, event_type string, value double, ts_s string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    rdir = str(tmp_path / "rollup")
    maintain_rollup(spark, rdir, ev)
    init_schema(rdir, {"bucket_ts": "string", "key": "string",
                       "n_events": "bigint",
                       "sum_value": "decimal(28,6)",
                       "min_value": "double", "max_value": "double"},
                partition=("event_date", "string"))
    # registered, unevolved: fold + read still work, values unchanged
    maintain_rollup(spark, rdir, ev)
    got = {(r.bucket_ts, r.key): r.n_events
           for r in read_rollup(spark, rdir).collect()}
    assert sum(got.values()) == 40 and len(got) == 2  # two folds of 20

    evolve_schema(rdir, {"sum_sq": "decimal(28,6)"})
    # read reconciles: old partitions yield NULL for the evolved column
    rows = read_rollup(spark, rdir).collect()
    assert all(r.sum_sq is None for r in rows)
    # the fold code does not compute sum_sq -> strict gate raises
    with pytest.raises(ValueError, match="missing registered columns"):
        maintain_rollup(spark, rdir, ev)


def test_ivm_registry_read_and_strict_fold_gate(spark, tmp_path):
    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    fact = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(20)],
        "id long, fk long, value double")
    dim = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(4)], "dk long, grp_name string")
    vdir = str(tmp_path / "view")
    maintain_join_view(spark, vdir, fact, dim, "fk", "dk", "grp_name",
                       "value", n_buckets=4)
    init_schema(vdir, {"grp": "string", "n_rows": "bigint",
                       "sum_value": "decimal(28,6)"},
                partition=("grp_bucket", "int"))
    maintain_join_view(spark, vdir, fact, dim, "fk", "dk", "grp_name",
                       "value", n_buckets=4)
    got = {r.grp: r.n_rows for r in read_join_view(spark, vdir).collect()}
    assert got == {"g0": 20, "g1": 20}

    evolve_schema(vdir, {"min_value": "double"})
    assert all(r.min_value is None
               for r in read_join_view(spark, vdir).collect())
    with pytest.raises(ValueError, match="missing registered columns"):
        maintain_join_view(spark, vdir, fact, dim, "fk", "dk", "grp_name",
                           "value", n_buckets=4)


def test_inverted_index_registry_and_strict_gate(spark, tmp_path):
    from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                     index_add_documents)
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(10)],
        "doc_id long, text string")
    idx = str(tmp_path / "idx")
    index_add_documents(spark, idx, docs, n_buckets=4)
    before = {r.doc_id: r.score
              for r in bm25_from_index(spark, idx, ["alpha"],
                                       n_buckets=4).collect()}
    init_schema(idx, {"term": "string", "doc_id": "bigint",
                      "tf": "bigint", "dl": "bigint"},
                partition=("tb", "int"))
    # registered read serves identical scores (explicit-schema scan)
    after = {r.doc_id: r.score
             for r in bm25_from_index(spark, idx, ["alpha"],
                                      n_buckets=4).collect()}
    assert after == before
    # registered fold still works pre-evolution
    more = spark.createDataFrame([(100, "alpha gamma")],
                                 "doc_id long, text string")
    index_add_documents(spark, idx, more, n_buckets=4)
    assert 100 in {r.doc_id
                   for r in bm25_from_index(spark, idx, ["alpha"],
                                            n_buckets=4).collect()}
    evolve_schema(idx, {"field": "string"})
    with pytest.raises(ValueError, match="missing registered columns"):
        index_add_documents(spark, idx, more, n_buckets=4)
    # erasure must WORK across the boundary (the stats aggregate pads
    # the evolved column instead of raising a union shape error)
    from localsql_spark.sinks.inverted_index import index_erase_documents
    index_erase_documents(spark, idx,
                          spark.createDataFrame([(100,)], "doc_id long"),
                          n_buckets=4)
    assert 100 not in {r.doc_id
                       for r in bm25_from_index(spark, idx, ["alpha"],
                                                n_buckets=4).collect()}


def test_signature_store_registry_ingest_evolution(spark, tmp_path):
    """The signature store takes INGEST semantics (rows are independent
    per-doc facts): after an evolution, an old producer's append pads
    the new column NULL in its own bytes, a new producer stores values,
    and the registered read returns one stable evolved shape across
    vintages; compaction preserves every vintage's values."""
    from localsql_spark.operators.dedup import (append_signature_store,
                                                compact_signature_store,
                                                compute_signatures,
                                                read_signature_store,
                                                write_signature_store)
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
         for i in range(10)], "doc_id long, text string")
    store = str(tmp_path / "sigs")
    write_signature_store(docs, store)
    init_schema(store, {"doc_id": "bigint", "sig": "array<bigint>"})
    # unevolved registered read == the narrow contract
    assert read_signature_store(spark, store).columns == ["doc_id", "sig"]

    evolve_schema(store, {"lang": "string"})
    # old producer keeps appending (pads NULL in its bytes)
    more = spark.createDataFrame(
        [(100, "x y z a b c d e f g h i")], "doc_id long, text string")
    append_signature_store(more, store)
    # new producer writes the evolved column directly
    sigs2 = compute_signatures(
        spark.createDataFrame([(200, "p q r s t u v w x y z a")],
                              "doc_id long, text string")) \
        .withColumn("lang", F.lit("en"))
    from localsql_spark.sinks.schema_evolution import reconcile_frame
    reconcile_frame(sigs2, store, mode="write") \
        .write.mode("append").parquet(store)

    got = {r.doc_id: r.lang
           for r in read_signature_store(spark, store).collect()}
    assert len(got) == 12
    assert got[200] == "en" and got[100] is None and got[0] is None

    compact_signature_store(spark, store, target_files=2)
    got2 = {r.doc_id: r.lang
            for r in read_signature_store(spark, store).collect()}
    assert got2 == got, "compaction lost evolved-column values"

    # the LSH probe paths narrow to (doc_id, sig) and keep working over
    # the evolved store (review round 13: the wide registered read must
    # not break the union with compute_signatures' narrow frame)
    from localsql_spark.operators.dedup import minhash_lsh_pairs_from_store
    new_batch = spark.createDataFrame(
        [(300, " ".join(f"w{(7 + j) % 23}" for j in range(12)))],
        "doc_id long, text string")
    pairs = minhash_lsh_pairs_from_store(spark, store, new_batch,
                                         threshold=0.0)
    assert {c for c in ("doc_a", "doc_b")} <= set(pairs.columns)
    pairs.collect()  # must not raise on the evolved store


def test_nb_and_sketch_registry_read_and_strict_gate(spark, tmp_path):
    """NB count model and diversity sketch view complete the fold-store
    registry symmetry (round 13 follow-up): registered reads reconcile
    partition vintages; the strict fold write gate refuses output
    missing an evolved column."""
    from localsql_spark.operators.selection import (nb_model_read,
                                                    nb_model_update)
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)
    from localsql_spark.sinks.sketch_view import (sketch_view_read,
                                                  sketch_view_update)

    docs = spark.createDataFrame(
        [(i, f"src{i % 2}", f"alpha beta w{i}") for i in range(8)],
        "doc_id long, source string, text string")

    mdir = str(tmp_path / "nb")
    nb_model_update(spark, mdir, docs, F.col("doc_id") % 2 == 0)
    init_schema(mdir, {"word": "string", "cp": "bigint", "cn": "bigint"},
                partition=("wb", "int"))
    nb_model_update(spark, mdir, docs, F.col("doc_id") % 2 == 0)
    model, dc = nb_model_read(spark, mdir)
    assert {r.word: r.cp for r in model.collect()}["alpha"] == 8
    assert dc.first()["np_docs"] == 8
    evolve_schema(mdir, {"cneutral": "bigint"})
    # the reader keeps its narrow (word, cp, cn) consumer contract but
    # now scans under the evolved schema — counts survive the boundary
    model2, _ = nb_model_read(spark, mdir)
    assert {r.word: r.cp for r in model2.collect()}["alpha"] == 8
    with pytest.raises(ValueError, match="missing registered columns"):
        nb_model_update(spark, mdir, docs, F.col("doc_id") % 2 == 0)

    vdir = str(tmp_path / "view")
    sketch_view_update(spark, vdir, docs)
    init_schema(vdir, {"grp": "string", "bucket": "int", "m_rank": "int",
                       "total_ngrams": "bigint", "n_docs": "bigint"},
                partition=("gb", "int"))
    sketch_view_update(spark, vdir, docs)
    got = {r.source: r.n_docs
           for r in sketch_view_read(spark, vdir).collect()}
    assert got == {"src0": 8, "src1": 8}
    evolve_schema(vdir, {"n_chars": "bigint"})
    # registered read still serves the estimate columns post-evolution
    assert set(got) == {r.source for r in
                        sketch_view_read(spark, vdir).collect()}
    with pytest.raises(ValueError, match="missing registered columns"):
        sketch_view_update(spark, vdir, docs)


def test_rebuild_nonretractable_carries_registry_and_gates(spark, tmp_path):
    """The compliance rebuild's whole-store swap must carry the schema
    registry into the replacement (review round 13: the swap otherwise
    silently de-registered a freshly registry-enabled store, and —
    because the staging dir trained unregistered — the rebuild also
    bypassed the strict fold write gate).  The registry is pre-seeded
    into the staging dir, so an EVOLVED registry the trainer cannot
    satisfy refuses the rebuild with the same strict message as a live
    fold."""
    from localsql_spark.operators.selection import (nb_model_read,
                                                    nb_model_update)
    from localsql_spark.sinks.erase import rebuild_nonretractable
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema,
                                                       schema_version)

    docs = spark.createDataFrame(
        [(i, f"src{i % 2}", f"alpha beta w{i}") for i in range(8)],
        "doc_id long, source string, text string")
    is_pos = F.col("doc_id") % 2 == 0

    mdir = str(tmp_path / "nb")
    nb_model_update(spark, mdir, docs, is_pos)
    init_schema(mdir, {"word": "string", "cp": "bigint", "cn": "bigint"},
                partition=("wb", "int"))
    assert schema_version(mdir) == 1

    kept = docs.filter(F.col("doc_id") != 3)
    rebuild_nonretractable(spark, nb_model={
        "model_dir": mdir, "docs": kept, "positive": is_pos})
    # the swap carried the registry: still registered, same version,
    # and the registered read serves the rebuilt counts
    assert schema_version(mdir) == 1
    model, _ = nb_model_read(spark, mdir)
    assert {r.word: r.cp for r in model.collect()}["alpha"] == 4

    # an evolution the trainer does not compute refuses the rebuild
    # (trainer output is gated against the PRE-SEEDED registry) and
    # leaves the old generation serving, still registered
    evolve_schema(mdir, {"cneutral": "bigint"})
    with pytest.raises(ValueError, match="missing registered columns"):
        rebuild_nonretractable(spark, nb_model={
            "model_dir": mdir, "docs": kept, "positive": is_pos})
    assert schema_version(mdir) == 2
    model2, _ = nb_model_read(spark, mdir)
    assert {r.word: r.cp for r in model2.collect()}["alpha"] == 4


def test_reconcile_keep_extra_overlapping_registry_column(spark, tmp_path):
    """A keep_extra (partition) column the registry ALSO declares must
    be emitted once, not twice (review round 13: the duplicate produced
    an ambiguous-reference frame downstream of every fold gate when a
    user registered the partition column inside the contract)."""
    from localsql_spark.sinks.schema_evolution import (gate_fold_write,
                                                       init_schema)

    d = str(tmp_path / "store")
    init_schema(d, {"k": "bigint", "v": "double", "pt": "string"})
    df = spark.createDataFrame([(1, 2.0, "a")],
                               "k long, v double, pt string")
    out = gate_fold_write(df, d, "pt")
    assert out.columns == ["k", "v", "pt"]
    # the de-duplicated column is selectable (previously ambiguous)
    assert out.select("pt").distinct().count() == 1


def test_registry_writes_respect_store_lock(tmp_path):
    """init_schema/evolve_schema are read-modify-writes of the version
    list: they hold the store's maintenance lock (a concurrent evolution
    was a lost-update race, and an evolution mid-fold could slip between
    a fold's write gate and its commit)."""
    import pytest

    from localsql_spark.sinks.locks import MaintenanceBusy, lock_path_for
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema,
                                                       schema_version)

    d = str(tmp_path / "store")
    lock = lock_path_for(d)
    lock.parent.mkdir(parents=True, exist_ok=True)
    lock.write_text("pid=99999\n")
    with pytest.raises(MaintenanceBusy):
        init_schema(d, {"k": "bigint"})
    lock.unlink()
    init_schema(d, {"k": "bigint"})
    lock.write_text("pid=99999\n")
    # the IDEMPOTENT re-init is a pure read: it stays available during
    # a maintenance window (no lock taken on the fast path)
    assert init_schema(d, {"k": "bigint"}) == 1
    with pytest.raises(MaintenanceBusy):
        evolve_schema(d, {"v2": "double"})
    lock.unlink()
    assert evolve_schema(d, {"v2": "double"}) == 2
    assert schema_version(d) == 2
    # idempotent re-init with the CURRENT evolved contract, also lock-free
    lock.write_text("pid=99999\n")
    assert init_schema(d, {"k": "bigint", "v2": "double"}) == 2
    lock.unlink()
