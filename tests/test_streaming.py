"""Structured Streaming semantics: checkpointed exactly-once resume across
restarts (the property that makes the streaming path production-usable), and
batch-equivalence of the windowed aggregation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def landing(tmp_path, spark):
    """A landing directory that receives files over time + fixed checkpoint
    and output locations."""
    d = tmp_path / "landing"
    d.mkdir()
    return {"src": d, "ck": str(tmp_path / "ck"), "out": str(tmp_path / "out")}


def _write_batch(spark, landing, start, n):
    (spark.range(start, start + n)
     .select(F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id"))
     .coalesce(1).write.mode("append").parquet(str(landing["src"])))


def _drain(spark, landing):
    schema = "event_id long, user_id long"
    stream = spark.readStream.schema(schema).parquet(str(landing["src"]))
    q = (stream.writeStream.format("parquet")
         .option("path", landing["out"])
         .option("checkpointLocation", landing["ck"])
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def test_checkpoint_resume_is_exactly_once(spark, landing):
    _write_batch(spark, landing, 0, 100)
    _drain(spark, landing)
    assert spark.read.parquet(landing["out"]).count() == 100

    # restart with MORE data in the source: only the delta may be processed
    _write_batch(spark, landing, 100, 50)
    _drain(spark, landing)
    out = spark.read.parquet(landing["out"])
    assert out.count() == 150, "restart must not reprocess committed files"
    assert out.select("event_id").distinct().count() == 150


def test_streaming_tumbling_equals_batch(spark):
    """The streaming windowed agg must equal the batch computation exactly
    (same oracle in the driver gate; pinned here as a direct comparison)."""
    from localsql_spark.streaming.stream_agg import tumbling_stream
    from localsql_spark.workload import load

    sf = "/root/testdata/sf0.001"
    load(spark, sf)
    streamed = {tuple(r) for r in tumbling_stream(spark, sf).collect()}
    ev = load(spark, sf)["events"]
    batch = {tuple(r) for r in
             (ev.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour")
                         .alias("w"), "event_type")
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                    .cast("double").alias("sum_value"))
              .select(F.unix_micros(F.col("w.start").cast("timestamp"))
                      .alias("w_start_us"),
                      "event_type", "n", "sum_value")).collect()}
    assert streamed == batch


def test_foreachbatch_upsert_latest_version_wins(spark, tmp_path):
    from localsql_spark.streaming.foreach_upsert import stream_upsert_parquet

    src = tmp_path / "src"
    src.mkdir()
    out, ck = str(tmp_path / "table"), str(tmp_path / "ck")
    schema = "k long, v long, ver long"

    (spark.range(0, 100).select(F.col("id").alias("k"),
                                F.lit(1).alias("v"), F.lit(1).alias("ver"))
     .coalesce(1).write.mode("append").parquet(str(src)))
    stream_upsert_parquet(spark, source_dir=str(src), schema=schema,
                          key="k", version="ver", out_dir=out,
                          checkpoint_dir=ck)
    from localsql_spark.streaming.foreach_upsert import read_table
    assert read_table(spark, out).count() == 100

    # overlapping second delivery with a newer version for keys 50-149
    (spark.range(50, 150).select(F.col("id").alias("k"),
                                 F.lit(2).alias("v"), F.lit(2).alias("ver"))
     .coalesce(1).write.mode("append").parquet(str(src)))
    stream_upsert_parquet(spark, source_dir=str(src), schema=schema,
                          key="k", version="ver", out_dir=out,
                          checkpoint_dir=ck)
    table = read_table(spark, out)
    assert table.count() == 150, "upsert must not duplicate keys"
    assert table.filter((F.col("k") == 75) & (F.col("v") == 2)).count() == 1
    assert table.filter((F.col("k") == 25) & (F.col("v") == 1)).count() == 1


def test_upsert_redelivery_after_pointer_flip_is_skipped(spark, tmp_path):
    """Crash window: pointer flipped to gen_N but the streaming checkpoint
    didn't commit -> restart re-delivers batch N. The re-applied batch must
    be skipped (already merged), not overwrite the directory being read
    (ADVICE r1, medium)."""
    from localsql_spark.streaming.foreach_upsert import apply_batch, read_table

    out = str(tmp_path / "table")
    (tmp_path / "table").mkdir()
    batch = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(1).alias("v"), F.lit(1).alias("ver"))

    assert apply_batch(batch, 0, key="k", version="ver", out_dir=out) is True
    assert read_table(spark, out).count() == 50

    # same batch_id again == checkpoint redelivery: must be a no-op
    assert apply_batch(batch, 0, key="k", version="ver", out_dir=out) is False
    table = read_table(spark, out)
    assert table.count() == 50
    assert table.filter(F.col("v") == 1).count() == 50

    # and the NEXT batch still applies normally on top
    batch2 = spark.range(25, 75).select(
        F.col("id").alias("k"), F.lit(2).alias("v"), F.lit(2).alias("ver"))
    assert apply_batch(batch2, 1, key="k", version="ver", out_dir=out) is True
    table = read_table(spark, out)
    assert table.count() == 75
    assert table.filter((F.col("k") == 30) & (F.col("v") == 2)).count() == 1


def test_xlsx_streaming_source_picks_up_new_workbooks(spark, tmp_path):
    """spark.readStream.format('xlsx') over a landing dir: each micro-batch
    reads only workbooks that appeared since the last offset, executor-side,
    one partition per new file."""
    import shutil
    from tests.test_ingestion import _write_xlsx
    from localsql_spark.sources.xlsx_datasource import register
    register(spark)

    land = tmp_path / "land"
    land.mkdir()
    _write_xlsx(land / "a.xlsx", ["id", "v"], [[1, 10], [2, 20]])

    out = str(tmp_path / "out")
    q = (spark.readStream.format("xlsx").load(str(land))
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        q.processAllAvailable()
        assert spark.read.parquet(out).count() == 2

        _write_xlsx(land / "b.xlsx", ["id", "v"], [[3, 30]])
        q.processAllAvailable()
        got = spark.read.parquet(out)
        assert got.count() == 3, "second batch must add only the new workbook"
        assert sorted(map(tuple, got.collect())) == [(1, 10), (2, 20), (3, 30)]
    finally:
        q.stop()


def test_stateful_recombination_survives_multi_batch_negatives(spark, tmp_path):
    """Force a TWO-micro-batch backlog (maxFilesPerTrigger=1) whose second
    batch carries negative values: the final per-user total must come from
    the LAST emission (max_by pairing), not an independent max — an
    intermediate running total exceeds the final one here (ADVICE r1)."""
    import tempfile
    from pyspark.sql.streaming.state import GroupStateTimeout
    from localsql_spark.streaming.stream_agg import (recombine_final_emissions,
                                                     user_stats_update)

    land = tmp_path / "land"
    land.mkdir()
    (spark.createDataFrame([(7, 5.0), (7, 5.0)], "user_id long, value double")
     .coalesce(1).write.parquet(str(land / "f1.parquet")))
    (spark.createDataFrame([(7, -20.0)], "user_id long, value double")
     .coalesce(1).write.parquet(str(land / "f2.parquet")))

    stream = (spark.readStream.schema("user_id long, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(land) + "/*"))
    out = (stream.groupBy("user_id")
           .applyInPandasWithState(
               user_stats_update,
               outputStructType="user_id long, n_events long, sum_value double",
               stateStructType="n long, cents long",
               outputMode="update",
               timeoutConf=GroupStateTimeout.NoTimeout))
    q = (out.writeStream.format("memory").queryName("multi_batch_state")
         .outputMode("update")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_mb_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    drained = spark.table("multi_batch_state")
    assert drained.count() >= 2, "backlog must split into multiple batches"
    row = recombine_final_emissions(drained).collect()[0]
    assert (row["user_id"], row["n_events"], row["sum_value"]) == (7, 3, -10.0)


def test_watermark_drops_late_rows_exactly_once(spark, tmp_path):
    """Late-data contract, minimal synthetic case: a re-delivered file whose
    rows are all below the operative watermark contributes NOTHING — each
    window appears exactly once with its on-time count.  The advancer needs
    a buffer batch behind it: Spark filters late input with the PREVIOUS
    batch's watermark and evicts with the current one (see
    stream_agg.late_data_stream)."""
    import datetime as dt
    import os
    import shutil
    import tempfile

    from pathlib import Path

    d = tmp_path / "landing"
    d.mkdir()

    def write_one(name, rows, order):
        tmp = tempfile.mkdtemp()
        (spark.createDataFrame(rows, "k int, ts timestamp")
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        p = next(Path(tmp).glob("part-*.parquet"))
        shutil.move(str(p), d / name)
        os.utime(d / name, (1_000_000 + order * 100,) * 2)

    T = dt.datetime(2024, 1, 1)
    H = dt.timedelta(hours=1)
    write_one("a.parquet", [(1, T), (2, T + H)], 0)          # on-time
    write_one("b.parquet", [(9, T + 100 * H)], 1)            # advancer
    write_one("c.parquet", [(9, T + 101 * H)], 2)            # buffer batch
    write_one("d.parquet", [(1, T), (2, T + H)], 3)          # late redelivery

    stream = (spark.readStream.schema("k int, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    agg = (stream.withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n")))
    q = (agg.writeStream.format("memory").queryName("late_drop_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r.w.start, r.n)
                 for r in spark.table("late_drop_sink").collect())
    assert got == [(T, 1), (T + H, 1)], got
    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])
    assert dropped == 2, "both late rows must be dropped by the watermark"


def test_stream_upsert_replay_after_restart_is_exactly_once(spark, tmp_path):
    """End-to-end foreachBatch replay: drain, then RESTART the same stream
    (same checkpoint) with more source files — committed batches must not
    re-apply, new data must merge, and the keyed table must equal the
    latest-version-per-key truth."""
    from localsql_spark.streaming.foreach_upsert import (read_table,
                                                         stream_upsert_parquet)

    src = tmp_path / "src"
    src.mkdir()
    out, ck = str(tmp_path / "table"), str(tmp_path / "ck")

    def land(rows, name):
        (spark.createDataFrame(rows, "k long, v string, ver int")
         .coalesce(1).write.mode("append").parquet(str(src)))

    land([(1, "one", 1), (2, "two", 1)], "f1")
    stream_upsert_parquet(spark, source_dir=str(src),
                          schema="k long, v string, ver int", key="k",
                          version="ver", out_dir=out, checkpoint_dir=ck)
    assert {(r.k, r.v, r.ver) for r in read_table(spark, out).collect()} \
        == {(1, "one", 1), (2, "two", 1)}

    # restart with a correction + an insert in the source backlog
    land([(1, "one-v2", 2), (3, "three", 1)], "f2")
    stream_upsert_parquet(spark, source_dir=str(src),
                          schema="k long, v string, ver int", key="k",
                          version="ver", out_dir=out, checkpoint_dir=ck)
    got = {(r.k, r.v, r.ver) for r in read_table(spark, out).collect()}
    assert got == {(1, "one-v2", 2), (2, "two", 1), (3, "three", 1)}

    # idle restart: nothing new -> nothing changes (no double-apply)
    stream_upsert_parquet(spark, source_dir=str(src),
                          schema="k long, v string, ver int", key="k",
                          version="ver", out_dir=out, checkpoint_dir=ck)
    assert {(r.k, r.v, r.ver) for r in read_table(spark, out).collect()} \
        == got


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_ingest_batch_semantics_and_redelivery(spark, tmp_path):
    """One batch: corpus collisions drop the batch doc, intra-batch
    collisions drop the greater id; a redelivered batch rewrites the same
    per-batch dirs instead of double-appending (idempotency)."""
    from localsql_spark.operators.dedup import write_signature_store
    from localsql_spark.streaming.stream_dedup_ingest import (
        dedup_ingest_batch, read_accepted)

    store = tmp_path / "store"
    out = tmp_path / "out"
    store.mkdir(), out.mkdir()
    corpus = _mk_docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely unrelated corpus text about spark and parquet")])
    write_signature_store(corpus, str(store))

    batch = _mk_docs(spark, [
        # near-exact copy of corpus doc 1 -> dropped (corpus rule)
        (10, "the quick brown fox jumps over the lazy dog again and again"),
        # fresh doc, duplicated inside the batch -> 20 kept, 21 dropped
        (20, "brand new document with words never seen before in store"),
        (21, "brand new document with words never seen before in store"),
        # unique -> kept
        (30, "another singleton text with its own vocabulary entirely")])
    n = dedup_ingest_batch(batch, 0, store_dir=str(store), out_dir=str(out))
    assert n == 2
    kept = sorted(r.doc_id for r in read_accepted(spark, str(out)).collect())
    assert kept == [20, 30]
    # store grew by exactly the keepers
    from localsql_spark.operators.dedup import read_signature_store
    ids = sorted(r.doc_id for r in
                 read_signature_store(spark, str(store)).collect())
    assert ids == [1, 2, 20, 30]

    # redelivery of the same batch id: same result, no double rows
    n2 = dedup_ingest_batch(batch, 0, store_dir=str(store), out_dir=str(out))
    assert n2 == 2
    assert sorted(r.doc_id for r in
                  read_accepted(spark, str(out)).collect()) == [20, 30]
    assert sorted(r.doc_id for r in
                  read_signature_store(spark, str(store)).collect()) \
        == [1, 2, 20, 30]


def test_dedup_ingest_crash_midbatch_heals_on_rerun(spark, tmp_path):
    """Simulated crash AFTER the keeper write but BEFORE the signature
    append (and vice versa): re-running the batch overwrites both dirs to
    the identical committed state — the probe is immune to the batch's own
    half-written signatures."""
    import shutil

    from localsql_spark.operators.dedup import read_signature_store
    from localsql_spark.streaming.stream_dedup_ingest import (
        dedup_ingest_batch, read_accepted)

    store = tmp_path / "store"
    out = tmp_path / "out"
    store.mkdir(), out.mkdir()
    batch = _mk_docs(spark, [
        (5, "some document text that is long enough to shingle properly ok"),
        (6, "some document text that is long enough to shingle properly ok"),
        (7, "a different text altogether with nothing shared at all here")])
    dedup_ingest_batch(batch, 0, store_dir=str(store), out_dir=str(out))
    # crash state A: signatures committed, keepers lost
    shutil.rmtree(out / "batch_0")
    dedup_ingest_batch(batch, 0, store_dir=str(store), out_dir=str(out))
    assert sorted(r.doc_id for r in
                  read_accepted(spark, str(out)).collect()) == [5, 7]
    assert sorted(r.doc_id for r in
                  read_signature_store(spark, str(store)).collect()) == [5, 7]
    # crash state B: keepers committed, signatures lost
    shutil.rmtree(store / "batch_0")
    dedup_ingest_batch(batch, 0, store_dir=str(store), out_dir=str(out))
    assert sorted(r.doc_id for r in
                  read_accepted(spark, str(out)).collect()) == [5, 7]
    assert sorted(r.doc_id for r in
                  read_signature_store(spark, str(store)).collect()) == [5, 7]


def test_stream_dedup_ingest_restart_is_exactly_once(spark, tmp_path):
    """Restarting the drained stream with the same checkpoint re-delivers
    nothing; adding a file afterwards processes ONLY the new batch against
    the grown store."""
    from localsql_spark.streaming.stream_dedup_ingest import (
        read_accepted, stream_dedup_ingest)

    src = tmp_path / "src"
    src.mkdir()
    store, out, ck = (str(tmp_path / d) for d in ("store", "out", "ck"))
    _mk_docs(spark, [
        (1, "first unique document with plenty of distinct words inside"),
        (2, "first unique document with plenty of distinct words inside"),
    ]).coalesce(1).write.mode("append").parquet(str(src))
    schema = "doc_id long, text string"
    stream_dedup_ingest(spark, source_dir=str(src), schema=schema,
                        store_dir=store, out_dir=out, checkpoint_dir=ck)
    assert sorted(r.doc_id for r in
                  read_accepted(spark, out).collect()) == [1]
    # restart without new data: nothing changes
    stream_dedup_ingest(spark, source_dir=str(src), schema=schema,
                        store_dir=store, out_dir=out, checkpoint_dir=ck)
    assert sorted(r.doc_id for r in
                  read_accepted(spark, out).collect()) == [1]
    # new file: dup of kept doc 1 dropped, fresh doc kept
    _mk_docs(spark, [
        (8, "first unique document with plenty of distinct words inside"),
        (9, "second era document sharing no vocabulary with the first"),
    ]).coalesce(1).write.mode("append").parquet(str(src))
    stream_dedup_ingest(spark, source_dir=str(src), schema=schema,
                        store_dir=store, out_dir=out, checkpoint_dir=ck)
    assert sorted(r.doc_id for r in
                  read_accepted(spark, out).collect()) == [1, 9]


def test_tws_gate_and_path(spark):
    """transformWithStateInPandas twin: runs end-to-end when protobuf is
    available; otherwise the gate must fail fast with a clear message
    (never crash the TWS driver worker mid-query)."""
    import pytest

    from localsql_spark.streaming.stream_agg import (
        stateful_user_stats_tws, tws_available)

    if not tws_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            stateful_user_stats_tws(spark, "/root/testdata/sf0.001")
        return
    out = stateful_user_stats_tws(spark, "/root/testdata/sf0.001")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert out.count() == batch.select("user_id").distinct().count()


def test_stream_validate_ingest_routes_and_replays(spark, tmp_path):
    """Every row lands in exactly one sink; a checkpoint replay (restart
    with no new files) changes nothing; non-row-local rules rejected."""
    import pytest

    from localsql_spark.operators import quality as Q
    from localsql_spark.streaming.stream_validate_ingest import (
        read_routed, stream_validate_ingest, validate_ingest_batch)

    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(
        [(1, 5.0, "ok"), (2, -1.0, "ok"), (3, 7.0, "bad"), (4, None, "ok")],
        "k long, v double, s string")
    df.coalesce(1).write.mode("append").parquet(str(src))
    out, quar, ck = (str(tmp_path / d) for d in ("out", "quar", "ck"))
    rules = [Q.between("v", 0.0, 10.0), Q.accepted("s", ["ok"])]
    schema = "k long, v double, s string"
    stream_validate_ingest(spark, source_dir=str(src), schema=schema,
                           rules=rules, out_dir=out, quarantine_dir=quar,
                           checkpoint_dir=ck)
    assert sorted(r.k for r in read_routed(spark, out).collect()) == [1]
    bad = {r.k: r.failed for r in read_routed(spark, quar).collect()}
    assert bad == {2: "between(v,0.0,10.0)", 3: "accepted(s)",
                   4: "between(v,0.0,10.0)"}  # null v violates between
    # replay: restart without new data is a no-op
    stream_validate_ingest(spark, source_dir=str(src), schema=schema,
                           rules=rules, out_dir=out, quarantine_dir=quar,
                           checkpoint_dir=ck)
    assert sorted(r.k for r in read_routed(spark, out).collect()) == [1]
    assert len(read_routed(spark, quar).collect()) == 3
    with pytest.raises(ValueError, match="row-local"):
        validate_ingest_batch(df, 0, rules=[Q.unique("k")], out_dir=out,
                              quarantine_dir=quar)


def test_dedup_ingest_compaction_and_replay_noop(spark, tmp_path):
    """compact_ingest folds old accepted/signature batch dirs into one
    generation each at a shared cutoff; read_accepted and the signature
    store read identically before/after (including the crash window where
    folded dirs linger on disk); a redelivered superseded batch no-ops
    instead of recreating its dirs."""
    import shutil

    from localsql_spark.operators.dedup import read_signature_store
    from localsql_spark.streaming.stream_dedup_ingest import (
        compact_ingest, dedup_ingest_batch, read_accepted)

    store, out = tmp_path / "store", tmp_path / "out"
    store.mkdir(), out.mkdir()
    batches = [
        _mk_docs(spark, [(1, "alpha unique text one two three four"),
                         (2, "beta wholly different content five six")]),
        _mk_docs(spark, [(10, "alpha unique text one two three four"),
                         (11, "gamma fresh vocabulary seven eight nine")]),
        _mk_docs(spark, [(20, "delta final batch words ten eleven twelve")]),
    ]
    for bid, b in enumerate(batches):
        dedup_ingest_batch(b, bid, store_dir=str(store), out_dir=str(out))
    accepted = sorted(r.doc_id
                      for r in read_accepted(spark, str(out)).collect())
    assert accepted == [1, 2, 11, 20]  # 10 dropped vs batch-0 keeper 1
    sigs = sorted(r.doc_id for r in
                  read_signature_store(spark, str(store)).collect())
    assert sigs == accepted

    # snapshot pre-compaction dirs for the crash-window simulation
    shutil.copytree(out / "batch_0", tmp_path / "out0_bak")
    folded = compact_ingest(spark, out_dir=str(out), store_dir=str(store))
    assert folded == 4  # batches 0+1 in each of the two dirs
    assert (out / "upto_1").exists() and (store / "upto_1").exists()
    assert not (out / "batch_0").exists()
    assert sorted(r.doc_id
                  for r in read_accepted(spark, str(out)).collect()) \
        == accepted
    assert sorted(r.doc_id for r in
                  read_signature_store(spark, str(store)).collect()) == sigs

    # crash window: a folded dir lingers — readers must not double-count
    shutil.copytree(tmp_path / "out0_bak", out / "batch_0")
    got = [r.doc_id for r in read_accepted(spark, str(out)).collect()]
    assert sorted(got) == accepted and len(got) == len(accepted)
    shutil.rmtree(out / "batch_0")

    # redelivery of a superseded batch id: full no-op, no dirs recreated
    assert dedup_ingest_batch(batches[0], 0, store_dir=str(store),
                              out_dir=str(out)) == 0
    assert not (out / "batch_0").exists()
    assert not (store / "batch_0").exists()

    # the sink keeps working after compaction: new batch probes the
    # generation store (11's text collides -> dropped)
    b3 = _mk_docs(spark, [(30, "gamma fresh vocabulary seven eight nine"),
                          (31, "epsilon novel closing words thirteen")])
    assert dedup_ingest_batch(b3, 3, store_dir=str(store),
                              out_dir=str(out)) == 1
    assert sorted(r.doc_id
                  for r in read_accepted(spark, str(out)).collect()) \
        == accepted + [31]


def test_validate_ingest_compaction_and_replay_noop(spark, tmp_path):
    """compact_routed folds both routes at a shared cutoff; reads are
    unchanged; a redelivered superseded batch no-ops."""
    from localsql_spark.operators import quality as Q
    from localsql_spark.streaming.stream_validate_ingest import (
        compact_routed, read_routed, validate_ingest_batch)

    out, quar = tmp_path / "out", tmp_path / "quar"
    rules = [Q.between("v", 0.0, 10.0)]
    for bid in range(3):
        df = spark.createDataFrame(
            [(bid * 10 + 1, 5.0), (bid * 10 + 2, -1.0)], "k long, v double")
        validate_ingest_batch(df, bid, rules=rules, out_dir=str(out),
                              quarantine_dir=str(quar))
    ok = sorted(r.k for r in read_routed(spark, str(out)).collect())
    bad = sorted(r.k for r in read_routed(spark, str(quar)).collect())
    assert ok == [1, 11, 21] and bad == [2, 12, 22]

    assert compact_routed(spark, out_dir=str(out),
                          quarantine_dir=str(quar)) == 4
    assert (out / "upto_1").exists() and not (out / "batch_0").exists()
    assert sorted(r.k
                  for r in read_routed(spark, str(out)).collect()) == ok
    assert sorted(r.k
                  for r in read_routed(spark, str(quar)).collect()) == bad

    # superseded replay: no-op, nothing recreated
    df0 = spark.createDataFrame([(1, 5.0), (2, -1.0)], "k long, v double")
    assert validate_ingest_batch(df0, 0, rules=rules, out_dir=str(out),
                                 quarantine_dir=str(quar)) == (0, 0)
    assert not (out / "batch_0").exists()
    assert sorted(r.k
                  for r in read_routed(spark, str(out)).collect()) == ok


def test_stream_ivf_ingest_restart_and_compacted_replay(spark, tmp_path):
    """Streamed embedding batches fold into the persisted IVF index as
    idempotent deltas: a checkpoint-wiped re-drain (full redelivery)
    leaves probe results identical (no double-count — duplicated
    neighbor rows would crowd the row_number top-k), and a redelivery of
    a batch already folded into a compacted generation is skipped
    outright instead of resurrecting a superseded delta dir."""
    import random
    import shutil

    from localsql_spark.operators.similarity import (compact_ivf_index,
                                                     knn_ivf_from_index,
                                                     write_ivf_index)
    from localsql_spark.streaming.stream_ivf_ingest import (
        ivf_ingest_batch, stream_ivf_ingest)

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(90)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivf")
    write_ivf_index(df.filter("vec_id < 60"), idx, n_cells=4)

    src = tmp_path / "src"
    src.mkdir()
    for lo, hi, name in ((60, 75, "a_b1.parquet"), (75, 90, "b_b2.parquet")):
        tmp = tmp_path / f"split_{lo}"
        df.filter(f"vec_id >= {lo} and vec_id < {hi}") \
          .coalesce(1).write.mode("overwrite").parquet(str(tmp))
        next(tmp.glob("part-*.parquet")).rename(src / name)
    schema = "vec_id long, embedding array<float>"

    def probe():
        return sorted(
            (r.query_id, r.neighbor_id, round(r.cos_sim, 9), r.rn)
            for r in knn_ivf_from_index(spark, idx,
                                        df.filter("vec_id < 3"),
                                        k=5, n_probe=4).collect())

    stream_ivf_ingest(spark, source_dir=str(src), schema=schema,
                      index_path=idx, checkpoint_dir=str(tmp_path / "ck1"))
    after = probe()
    deltas = sorted(p.name for p in (tmp_path / "ivf" / "delta").iterdir())
    assert deltas == ["batch_1", "batch_2"]
    # streamed vectors are reachable pre-compaction
    assert {n for _, n, _, _ in after} & set(range(60, 90))

    # restart with a wiped checkpoint: every batch redelivers; the
    # per-batch dirs rewrite byte-identically, probes unchanged
    stream_ivf_ingest(spark, source_dir=str(src), schema=schema,
                      index_path=idx, checkpoint_dir=str(tmp_path / "ck2"))
    assert probe() == after

    assert compact_ivf_index(spark, idx) == 2
    assert probe() == after

    # redelivery AFTER compaction: batch id <= compacted-through — skip,
    # do not resurrect a superseded delta dir
    replay = spark.read.parquet(str(src / "a_b1.parquet"))
    assert ivf_ingest_batch(replay, 1, index_path=idx) == 0
    assert not (tmp_path / "ivf" / "delta" / "batch_1").exists()
    assert probe() == after


def test_stream_interval_join_equals_batch_range_join(spark):
    """The stream-stream interval join (two watermarked streams through
    StreamingSymmetricHashJoin) drains to exactly the batch range join's
    pairs, and its state metrics show BOTH sides buffered then cleared."""
    from localsql_spark.operators import events as E
    from localsql_spark.streaming.stream_join import interval_join_stream

    sf = "/root/testdata/sf0.001"
    # sf0.001 has no purchase->error pair inside 5 minutes; widen to an
    # hour so the assertion exercises non-empty join state
    got = sorted((r.user_id, r.purchase_id, r.error_id)
                 for r in interval_join_stream(spark, sf,
                                               upper_s=3600).collect())

    ev = (spark.read.parquet(f"{sf}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("pts")))
    e = (ev.filter(F.col("event_type") == "error")
         .select("user_id", F.col("event_id").alias("error_id"),
                 F.col("ts").alias("ets")))
    j = E.range_join(p, e, on=["user_id"], left_ts="pts", right_ts="ets",
                     lower_s=0.0, upper_s=3600.0)
    want = sorted((r.user_id, r.purchase_id, r.error_id)
                  for r in j.select("user_id", "purchase_id",
                                    "error_id").collect())
    assert got == want and len(got) > 0

    # the drain must have run a REAL stream-stream join state operator
    from localsql_spark.streaming import stream_agg
    ops = (stream_agg.last_progress or {}).get("stateOperators", [])
    assert any(o.get("operatorName") == "symmetricHashJoin" for o in ops)


def test_stream_nb_ingest_exactly_once_and_replay(spark, tmp_path):
    """The streamed NB model scores bit-identically to a single
    full-train pass, re-running the whole land+fold is a no-op
    (markers), and a deleted checkpoint's full redelivery never
    double-counts a token (idempotent landing + markers — the additive
    fold makes double-apply observable as doubled counts)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from localsql_spark.operators.selection import (nb_model_read,
                                                    nb_score_with_model,
                                                    nb_seed_scores)
    from localsql_spark.streaming.stream_nb_ingest import stream_nb_ingest

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} alpha beta" if i % 2 else "gamma delta qorx",
          "en") for i in range(30)],
        "doc_id long, text string, lang string")
    is_pos = F.col("doc_id") < 12
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        d = tmp_path / f"b{i}"
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.parquet(str(d))
        part = next(d.glob("part-*.parquet"))
        part.rename(src / f"f{i}.parquet")
        os.utime(src / f"f{i}.parquet", (1000 + i, 1000 + i))

    kw = dict(source_dir=str(src), schema=docs.schema,
              land_dir=str(tmp_path / "land"),
              model_dir=str(tmp_path / "model"),
              checkpoint_dir=str(tmp_path / "ck"),
              positive=is_pos, n_buckets=4)
    assert stream_nb_ingest(spark, **kw) == 3

    def scores():
        model, dc = nb_model_read(spark, str(tmp_path / "model"),
                                  n_buckets=4)
        return {tuple(r) for r in
                nb_score_with_model(docs, model, dc, is_pos).collect()}

    want = {tuple(r) for r in nb_seed_scores(docs, is_pos).collect()}
    assert scores() == want
    # replay: nothing new to fold
    assert stream_nb_ingest(spark, **kw) == 0
    assert scores() == want
    # full redelivery (fresh checkpoint): landing overwrites
    # byte-identically, markers skip every fold
    shutil.rmtree(tmp_path / "ck")
    assert stream_nb_ingest(spark, **kw) == 0
    assert scores() == want


def test_stream_sketch_ingest_exactly_once_and_replay(spark, tmp_path):
    """The streamed sketch view equals a single batch fold over
    everything, re-running the whole land+fold is a no-op (markers), and
    a deleted checkpoint's full redelivery never double-counts totals
    (idempotent landing + markers — registers would survive a
    double-apply, the additive totals row would not)."""
    import os
    import shutil

    from localsql_spark.sinks.sketch_view import (sketch_view_read,
                                                  sketch_view_update)
    from localsql_spark.streaming.stream_sketch_ingest import \
        stream_sketch_ingest

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 13 + j) % 31}" for j in range(10)),
          f"s{i % 2}") for i in range(24)],
        "doc_id long, text string, source string")
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        d = tmp_path / f"b{i}"
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.parquet(str(d))
        part = next(d.glob("part-*.parquet"))
        part.rename(src / f"f{i}.parquet")
        os.utime(src / f"f{i}.parquet", (1000 + i, 1000 + i))

    kw = dict(source_dir=str(src), schema=docs.schema,
              land_dir=str(tmp_path / "land"),
              view_dir=str(tmp_path / "view"),
              checkpoint_dir=str(tmp_path / "ck"))
    assert stream_sketch_ingest(spark, **kw) == 3

    full = tmp_path / "full"
    sketch_view_update(spark, str(full), docs)

    def view(d):
        return {tuple(r) for r in sketch_view_read(spark, str(d)).collect()}
    want = view(full)
    assert view(tmp_path / "view") == want
    # replay: nothing new to fold
    assert stream_sketch_ingest(spark, **kw) == 0
    assert view(tmp_path / "view") == want
    # full redelivery (fresh checkpoint)
    shutil.rmtree(tmp_path / "ck")
    assert stream_sketch_ingest(spark, **kw) == 0
    assert view(tmp_path / "view") == want


def test_stream_index_ingest_exactly_once_and_replay(spark, tmp_path):
    """The streamed inverted index serves scores bit-identical to a
    one-shot build; re-running the land+fold is a no-op, and a fresh
    checkpoint's full redelivery never double-counts a posting."""
    import os
    import shutil

    from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                     index_add_documents)
    from localsql_spark.streaming.stream_index_ingest import \
        stream_index_ingest

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5}" if i % 2 else f"beta w{i % 3} gamma")
         for i in range(24)], "doc_id long, text string")
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        d = tmp_path / f"b{i}"
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.parquet(str(d))
        part = next(d.glob("part-*.parquet"))
        part.rename(src / f"f{i}.parquet")
        os.utime(src / f"f{i}.parquet", (1000 + i, 1000 + i))

    kw = dict(source_dir=str(src), schema=docs.schema,
              land_dir=str(tmp_path / "land"),
              index_dir=str(tmp_path / "index"),
              checkpoint_dir=str(tmp_path / "ck"), n_buckets=4)
    assert stream_index_ingest(spark, **kw) == 3

    one = str(tmp_path / "one")
    index_add_documents(spark, one, docs, n_buckets=4)

    def served(d):
        return {tuple(r) for r in
                bm25_from_index(spark, d, ["alpha", "beta"],
                                n_buckets=4).collect()}
    want = served(one)
    assert served(str(tmp_path / "index")) == want
    assert stream_index_ingest(spark, **kw) == 0
    assert served(str(tmp_path / "index")) == want
    shutil.rmtree(tmp_path / "ck")
    assert stream_index_ingest(spark, **kw) == 0
    assert served(str(tmp_path / "index")) == want


def test_stream_upsert_feed_is_replay_stable(spark, tmp_path):
    """The durable feed: redelivery with a fresh checkpoint leaves every
    feed batch byte-stable (same rows) and the table unchanged; feed
    contents equal what change_feed computes per generation."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from localsql_spark.streaming.foreach_upsert import (
        read_feed, read_table, stream_upsert_with_feed)

    docs = spark.createDataFrame(
        [(i, f"t{i}", 1) for i in range(9)] +
        [(i, f"u{i}", 2) for i in range(6)],   # updates for 0-5 in batch 2
        "k long, v string, version int")
    src = tmp_path / "src"
    src.mkdir()
    b0 = docs.filter("version = 1")
    b1 = docs.filter("version = 2")
    for i, b in enumerate((b0, b1)):
        d = tmp_path / f"b{i}"
        b.coalesce(1).write.parquet(str(d))
        part = next(d.glob("part-*.parquet"))
        part.rename(src / f"f{i}.parquet")
        os.utime(src / f"f{i}.parquet", (1000 + i, 1000 + i))

    kw = dict(source_dir=str(src), schema=docs.schema, key="k",
              version="version", out_dir=str(tmp_path / "t"),
              feed_dir=str(tmp_path / "feed"),
              checkpoint_dir=str(tmp_path / "ck"))
    stream_upsert_with_feed(spark, **kw)

    feed = read_feed(spark, str(tmp_path / "feed"))
    rows = {(r.k, r.batch_id): r.op for r in feed.collect()}
    assert all(op == "insert" for (k, b), op in rows.items() if b == 0)
    assert {op for (k, b), op in rows.items() if b == 1} == {"update"}
    assert sum(1 for (k, b) in rows if b == 1) == 6
    table = {r.k: r.v for r in read_table(spark, str(tmp_path / "t"))
             .collect()}
    assert table == {**{i: f"t{i}" for i in range(6, 9)},
                     **{i: f"u{i}" for i in range(6)}}

    # fresh-checkpoint redelivery: feed and table byte-stable
    before = {tuple(r) for r in feed.collect()}
    shutil.rmtree(tmp_path / "ck")
    stream_upsert_with_feed(spark, **kw)
    after = {tuple(r) for r in
             read_feed(spark, str(tmp_path / "feed")).collect()}
    assert after == before
    assert {r.k: r.v for r in read_table(spark, str(tmp_path / "t"))
            .collect()} == table


def test_read_feed_skips_uncommitted_batch_dirs(spark, tmp_path):
    """A feed batch dir without _SUCCESS is a crashed mid-write landing —
    subscribers must not read its partial rows as committed changes
    (code-review r9); the producer rewrites it on restart."""
    from localsql_spark.streaming.foreach_upsert import read_feed

    feed_dir = tmp_path / "feed"
    ok = spark.createDataFrame([(1, "insert")], "k long, op string")
    ok.write.parquet(str(feed_dir / "batch_0"))
    partial = feed_dir / "batch_1"
    ok.write.parquet(str(partial))
    (partial / "_SUCCESS").unlink()  # simulate the crash window
    got = read_feed(spark, str(feed_dir))
    assert [r.batch_id for r in got.collect()] == [0]
    # nothing committed at all -> None, not a partial read
    (feed_dir / "batch_0" / "_SUCCESS").unlink()
    assert read_feed(spark, str(feed_dir)) is None


def test_stream_ivm_dim_replay_and_snapshot_advance(spark, tmp_path):
    """The dim-side IVM twin: dim-change batches fold retract+re-add into
    the view via the marker-committed loop; a full re-run (fresh
    checkpoint, same source) is a no-op, and a replayed batch AFTER its
    snapshot advanced nets a zero delta (the crash-window guarantee)."""
    import os
    from pathlib import Path

    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view
    from localsql_spark.streaming.stream_ivm_dim import (
        apply_dim_batch, init_dim_snapshot, read_dim_snapshot,
        stream_ivm_dim_ingest)

    fact = spark.createDataFrame(
        [(i, i % 6, float(10 + i)) for i in range(60)],
        "o_id long, custkey long, price double")
    dim = spark.createDataFrame([(k, k % 3) for k in range(6)],
                                "custkey long, nation long")
    scratch = tmp_path
    view = str(scratch / "view")
    maintain_join_view(spark, view, fact, dim, fact_key="custkey",
                       dim_key="custkey", group_col="nation",
                       value_col="price", n_buckets=4)
    init_dim_snapshot(dim, str(scratch / "dim"))

    # three dim-change files: keys 0,1 move to nation 9; key 2 to 7
    src = scratch / "src"
    src.mkdir()
    batches = [[(0, 9)], [(1, 9)], [(2, 7)]]
    for i, rows in enumerate(batches):
        d = str(scratch / f"b{i}")
        spark.createDataFrame(rows, "custkey long, nation long") \
            .coalesce(1).write.mode("overwrite").parquet(d)
        part = next(Path(d).glob("part-*.parquet"))
        part.rename(src / f"{chr(97 + i)}_batch{i}.parquet")
        os.utime(src / f"{chr(97 + i)}_batch{i}.parquet",
                 (1000000 + i * 100, 1000000 + i * 100))
    schema = "custkey long, nation long"

    n = stream_ivm_dim_ingest(
        spark, source_dir=str(src), schema=schema,
        land_dir=str(scratch / "land"), view_dir=view,
        dim_dir=str(scratch / "dim"), checkpoint_dir=str(scratch / "ck"),
        fact=fact, dim_key="custkey", group_col="nation",
        fact_key="custkey", value_col="price", n_buckets=4)
    assert n == 3
    moved = {k: v for k, v in [(0, 9), (1, 9), (2, 7)]}
    expect = {}
    for i in range(60):
        g = moved.get(i % 6, (i % 6) % 3)
        c, s = expect.get(g, (0, 0.0))
        expect[g] = (c + 1, s + 10 + i)
    got = {r.grp: (r.n_rows, float(r.sum_value))
           for r in read_join_view(spark, view).collect()}
    assert got == expect
    # the snapshot advanced to the post-change dimension
    snap = {r.custkey: r.nation
            for r in read_dim_snapshot(spark, str(scratch / "dim"))
            .collect()}
    assert snap[0] == 9 and snap[2] == 7 and snap[3] == 0

    # fresh-checkpoint re-run: markers make every batch a no-op
    n2 = stream_ivm_dim_ingest(
        spark, source_dir=str(src), schema=schema,
        land_dir=str(scratch / "land"), view_dir=view,
        dim_dir=str(scratch / "dim"), checkpoint_dir=str(scratch / "ck2"),
        fact=fact, dim_key="custkey", group_col="nation",
        fact_key="custkey", value_col="price", n_buckets=4)
    assert n2 == 0
    assert {r.grp: (r.n_rows, float(r.sum_value))
            for r in read_join_view(spark, view).collect()} == expect

    # crash-window replay: re-applying batch 2 directly after its
    # snapshot advance folds a net-zero delta (view unchanged)
    apply_dim_batch(spark, view, str(scratch / "dim"), fact,
                    spark.createDataFrame([(2, 7)],
                                          "custkey long, nation long"),
                    2, dim_key="custkey", group_col="nation",
                    fact_key="custkey", value_col="price", n_buckets=4)
    assert {r.grp: (r.n_rows, float(r.sum_value))
            for r in read_join_view(spark, view).collect()} == expect


def test_stream_ivm_dim_crash_before_advance_no_double_apply(
        spark, tmp_path, monkeypatch):
    """The remaining r8 crash window, now closed (advisor r9): a crash
    BETWEEN the view's manifest commit and the snapshot advance used to
    replay the batch against the OLD snapshot and double-apply the
    retract+re-add delta.  The applied-batch marker rides in the view's
    manifest commit, so the replay detects it, skips the fold, and only
    advances the snapshot."""
    from pathlib import Path

    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view
    from localsql_spark.streaming import stream_ivm_dim as SID

    fact = spark.createDataFrame(
        [(i, i % 6, float(10 + i)) for i in range(60)],
        "o_id long, custkey long, price double")
    dim = spark.createDataFrame([(k, k % 3) for k in range(6)],
                                "custkey long, nation long")
    view = str(tmp_path / "view")
    dim_dir = str(tmp_path / "dim")
    maintain_join_view(spark, view, fact, dim, fact_key="custkey",
                       dim_key="custkey", group_col="nation",
                       value_col="price", n_buckets=4)
    SID.init_dim_snapshot(dim, dim_dir)

    batch = spark.createDataFrame([(0, 9)], "custkey long, nation long")

    def _boom(*a, **k):
        raise RuntimeError("injected crash before snapshot advance")
    monkeypatch.setattr(SID, "_advance_snapshot", _boom)
    import pytest as _pt
    with _pt.raises(RuntimeError, match="injected crash"):
        SID.apply_dim_batch(spark, view, dim_dir, fact, batch, 1,
                            dim_key="custkey", group_col="nation",
                            fact_key="custkey", value_col="price",
                            n_buckets=4)
    monkeypatch.undo()
    # the view committed (key 0's facts moved to nation 9), the marker
    # is down, the snapshot did NOT advance
    marker = (Path(view).parent / f".{Path(view).name}.dim_applied_1")
    assert marker.exists()
    assert {r.custkey: r.nation
            for r in SID.read_dim_snapshot(spark, dim_dir).collect()}[0] == 0

    # replay the SAME batch: must not fold the delta again
    SID.apply_dim_batch(spark, view, dim_dir, fact, batch, 1,
                        dim_key="custkey", group_col="nation",
                        fact_key="custkey", value_col="price",
                        n_buckets=4)
    assert not marker.exists()
    assert {r.custkey: r.nation
            for r in SID.read_dim_snapshot(spark, dim_dir).collect()}[0] == 9
    expect = {}
    for i in range(60):
        g = 9 if i % 6 == 0 else (i % 6) % 3
        c, s = expect.get(g, (0, 0.0))
        expect[g] = (c + 1, s + 10 + i)
    got = {r.grp: (r.n_rows, float(r.sum_value))
           for r in read_join_view(spark, view).collect()}
    assert got == expect


def test_feed_offsets_and_retention(spark, tmp_path):
    """CDC feed retention: a consumer tails the feed with committed
    offsets (monotone, crash = re-read the same tail), and prune_feed
    deletes only batches EVERY registered consumer has consumed —
    an unconsumed feed never rots."""
    from localsql_spark.streaming.foreach_upsert import (
        commit_feed_offset, feed_watermark, prune_feed, read_feed,
        read_feed_since)

    feed = tmp_path / "feed"
    for i in range(4):
        spark.createDataFrame([(i, "insert")], "k long, op string") \
            .write.parquet(str(feed / f"batch_{i}"))

    # no consumers registered: nothing is eligible
    assert prune_feed(str(feed)) == 0
    assert read_feed(spark, str(feed)).count() == 4

    # consumer A reads the tail, applies, commits through batch 2
    tail = read_feed_since(spark, str(feed), "a")
    assert sorted(r.batch_id for r in tail.collect()) == [0, 1, 2, 3]
    commit_feed_offset(str(feed), "a", 2)
    assert feed_watermark(str(feed), "a") == 2
    # offsets never move backward
    commit_feed_offset(str(feed), "a", 1)
    assert feed_watermark(str(feed), "a") == 2
    assert [r.batch_id for r in
            read_feed_since(spark, str(feed), "a").collect()] == [3]

    # consumer B lags at 0: min offset rules retention
    commit_feed_offset(str(feed), "b", 0)
    assert prune_feed(str(feed), keep_last=0) == 1  # only batch_0 goes
    assert sorted(int(p.name.split("_")[1])
                  for p in feed.glob("batch_*")) == [1, 2, 3]
    # B catches up; keep_last retains the newest eligible dir
    commit_feed_offset(str(feed), "b", 3)
    commit_feed_offset(str(feed), "a", 3)
    assert prune_feed(str(feed), keep_last=1) == 2
    assert [p.name for p in feed.glob("batch_*")] == ["batch_3"]
    # fully caught up -> None
    assert read_feed_since(spark, str(feed), "a") is None


def test_pruned_feed_batch_is_never_rewritten_by_fresh_replay(
        spark, tmp_path):
    """A fresh-checkpoint full replay redelivers PRUNED batch ids; the
    producer must not recreate their feed dirs (it would recompute
    change_feed against the FINAL generation and fabricate history) —
    the retention watermark blocks the write while the merge still
    applies (code-review r9)."""
    from localsql_spark.streaming.foreach_upsert import (
        apply_batch_with_feed, commit_feed_offset, prune_feed, read_feed,
        read_table)

    out, feed = str(tmp_path / "table"), str(tmp_path / "feed")
    b0 = spark.createDataFrame([(1, "a", 1)],
                               "k long, txt string, version int")
    b1 = spark.createDataFrame([(1, "b", 2), (2, "c", 1)],
                               "k long, txt string, version int")
    apply_batch_with_feed(b0, 0, key="k", version="version",
                          out_dir=out, feed_dir=feed)
    apply_batch_with_feed(b1, 1, key="k", version="version",
                          out_dir=out, feed_dir=feed)
    commit_feed_offset(feed, "a", 1)
    assert prune_feed(feed, keep_last=1) == 1  # batch_0 pruned

    # fresh checkpoint: batch 0 redelivered against the FINAL table
    import shutil
    shutil.rmtree(tmp_path / "table")  # also reset the table like a
    (tmp_path / "table").mkdir()       # full from-scratch replay would
    apply_batch_with_feed(b0, 0, key="k", version="version",
                          out_dir=out, feed_dir=feed)
    assert not (tmp_path / "feed" / "batch_0").exists(), \
        "pruned feed batch must not be fabricated by a replay"
    assert read_table(spark, out).count() == 1  # the merge still applied
    assert {r.batch_id for r in read_feed(spark, feed).collect()} == {1}


def test_stream_erase_ingest_exactly_once_and_replay(spark, tmp_path):
    """The streaming erase queue: request batches fold once under the
    marker loop, a fresh-checkpoint re-run is a no-op, and re-erasing an
    already-folded batch (the loop's crash window) changes nothing —
    erasure is idempotent, the strictly-safest twin."""
    import os
    from pathlib import Path

    from localsql_spark.sinks.erase import (read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.streaming.stream_erase_ingest import \
        stream_erase_ingest

    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(40)], "doc_id long, text string")
    store = str(tmp_path / "store")
    write_bucketed_store(docs, store, "doc_id", n_buckets=4)

    src = tmp_path / "src"
    src.mkdir()
    batches = [[1, 2], [3], [2, 5]]  # overlapping requests are fine
    for i, ids in enumerate(batches):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame([(x,) for x in ids], "doc_id long") \
            .coalesce(1).write.mode("overwrite").parquet(d)
        part = next(Path(d).glob("part-*.parquet"))
        part.rename(src / f"{chr(97 + i)}_batch{i}.parquet")
        os.utime(src / f"{chr(97 + i)}_batch{i}.parquet",
                 (1000000 + i * 100, 1000000 + i * 100))

    n = stream_erase_ingest(
        spark, source_dir=str(src), schema="doc_id long",
        land_dir=str(tmp_path / "land"), store_dir=store,
        checkpoint_dir=str(tmp_path / "ck"), key_col="doc_id",
        n_buckets=4)
    assert n == 3
    left = {r.doc_id for r in read_bucketed_store(spark, store)
            .select("doc_id").collect()}
    assert left == set(range(40)) - {1, 2, 3, 5}

    # fresh checkpoint: markers make every batch a no-op
    n2 = stream_erase_ingest(
        spark, source_dir=str(src), schema="doc_id long",
        land_dir=str(tmp_path / "land"), store_dir=store,
        checkpoint_dir=str(tmp_path / "ck2"), key_col="doc_id",
        n_buckets=4)
    assert n2 == 0
    assert {r.doc_id for r in read_bucketed_store(spark, store)
            .select("doc_id").collect()} == left

    # crash-window re-fold of one batch directly: idempotent
    from localsql_spark.sinks.erase import erase_keys
    erase_keys(spark, store,
               spark.createDataFrame([(2,), (5,)], "doc_id long"),
               "doc_id", n_buckets=4)
    assert {r.doc_id for r in read_bucketed_store(spark, store)
            .select("doc_id").collect()} == left


def test_fold_blocker_warned_on_second_consecutive_call(spark, tmp_path):
    """A torn landing dir correctly STOPS the ordered fold — but a dir
    that never gets rewritten (dead stream) must be surfaced, not left
    silently stalling every later batch forever (advisor r9).  The first
    blocked call is quiet (the stream normally rewrites the dir before
    the next maintenance tick); the SAME id blocking a second
    consecutive call warns; progress clears the sidecar."""
    import warnings as _w

    from localsql_spark.streaming.stream_rollup import fold_landed_with

    land = tmp_path / "land"
    store = str(tmp_path / "store")
    for i in range(3):
        (spark.range(5).withColumn("b", F.lit(i))
         .coalesce(1).write.parquet(str(land / f"batch_{i}")))
    (land / "batch_1" / "_SUCCESS").unlink()  # torn landing

    folded: list[int] = []

    def apply_fn(df):
        folded.append(df.select(F.max("b")).first()[0])

    with _w.catch_warnings():
        _w.simplefilter("error")  # first blocked call: NO warning
        assert fold_landed_with(spark, str(land), store, apply_fn) == 1
    assert folded == [0]

    with pytest.warns(RuntimeWarning, match="batch id 1 has blocked"):
        assert fold_landed_with(spark, str(land), store, apply_fn) == 0

    # the stream rewrites the torn dir: fold resumes, sidecar clears
    (land / "batch_1" / "_SUCCESS").touch()
    with _w.catch_warnings():
        _w.simplefilter("error")
        assert fold_landed_with(spark, str(land), store, apply_fn) == 2
    assert folded == [0, 1, 2]
    from pathlib import Path
    assert not (Path(store).parent / ".store.blocked_fold").exists()


def test_compact_blocker_warned_on_persistent_id_gap(spark, tmp_path):
    """compact_batches stops at a missing intermediate batch id (correct:
    folding past it would mark the id superseded before its rows ever
    landed) — but a gap that never fills must warn on the second
    consecutive blocked call instead of silently capping the fold."""
    import warnings as _w

    from localsql_spark.streaming.batch_dirs import compact_batches

    d = tmp_path / "landq"
    for i in (0, 2):  # id 1 never lands
        (spark.range(4).withColumn("b", F.lit(i))
         .coalesce(1).write.parquet(str(d / f"batch_{i}")))

    with _w.catch_warnings():
        _w.simplefilter("error")  # folds batch_0, quiet on first block
        assert compact_batches(spark, str(d), keep_last=0) == 1

    with pytest.warns(RuntimeWarning, match="batch id 1 has blocked"):
        assert compact_batches(spark, str(d), keep_last=0) == 0

    # the gap fills: compaction resumes and the sidecar clears
    (spark.range(4).withColumn("b", F.lit(1))
     .coalesce(1).write.parquet(str(d / "batch_1")))
    with _w.catch_warnings():
        _w.simplefilter("error")
        assert compact_batches(spark, str(d), keep_last=0) == 2
    assert not (d / ".blocked_compact").exists()


# ---------------------------------------------------------------------------
# Erase ledger: the erase-vs-late-landing-batch window (round 11)
# ---------------------------------------------------------------------------

def test_erase_ledger_blocks_late_landing_batch(spark, tmp_path):
    """THE WINDOW, driven end-to-end at batch granularity: a deletion
    request folds while a data batch containing the subject is
    landed-but-unapplied.  With the ledger, the late data fold drops the
    subject at ingest — post-interleave corpus == one that never saw the
    subject.  Without the ledger the subject IS re-ingested (the hole
    the ledger exists to close), pinned so the contract stays visible."""
    from pathlib import Path

    from localsql_spark.sinks.erase import erase_ledger_append
    from localsql_spark.streaming.stream_dedup_ingest import (
        dedup_ingest_batch, read_accepted)

    b0 = _mk_docs(spark, [
        (1, "first unique document with entirely fresh vocabulary"),
        (2, "second unique document carrying different words wholly")])
    b1 = _mk_docs(spark, [  # subject 5 arrives LATE, in batch 1
        (5, "subject document whose author requested deletion earlier"),
        (6, "bystander document with its own unrelated content here")])

    for with_ledger in (True, False):
        root = tmp_path / ("led" if with_ledger else "noled")
        store, out = root / "store", root / "out"
        ledger = str(root / "ledger") if with_ledger else None
        store.mkdir(parents=True), out.mkdir(parents=True)

        # t0: data batch 0 folds
        dedup_ingest_batch(b0, 0, store_dir=str(store), out_dir=str(out),
                           erase_ledger=ledger)
        # t1: erase request for subject 5 folds — subject not yet in any
        # store (batch 1 is landed-but-unapplied); the ledger append is
        # the ONLY trace the request can leave
        if with_ledger:
            erase_ledger_append(
                spark.createDataFrame([(5,)], "doc_id long"), ledger, 0)
        # t2: the late data batch folds
        dedup_ingest_batch(b1, 1, store_dir=str(store), out_dir=str(out),
                           erase_ledger=ledger)

        kept = sorted(r.doc_id for r in
                      read_accepted(spark, str(out)).collect())
        if with_ledger:
            assert kept == [1, 2, 6], "subject re-ingested despite ledger"
        else:
            assert 5 in kept  # the documented hole without a ledger


def test_stream_erase_ingest_populates_ledger_before_store(
        spark, tmp_path, monkeypatch):
    """Commit order: the ledger append lands BEFORE the store erase, so a
    crash between the two leaves the subject blocked (ledger committed)
    while the idempotent erase re-runs on resume."""
    import shutil

    from localsql_spark.sinks import erase as E
    from localsql_spark.sinks.erase import (read_erase_ledger,
                                            write_bucketed_store)
    from localsql_spark.streaming.stream_erase_ingest import \
        stream_erase_ingest

    docs = _mk_docs(spark, [(i, f"doc number {i} body") for i in range(8)])
    store = str(tmp_path / "store")
    write_bucketed_store(docs, store, "doc_id", n_buckets=4)

    src = tmp_path / "src"
    src.mkdir()
    tmp = tmp_path / "one"
    (spark.createDataFrame([(3,)], "doc_id long").coalesce(1)
     .write.parquet(str(tmp)))
    next(tmp.glob("part-*.parquet")).rename(src / "req0.parquet")
    shutil.rmtree(tmp)

    real_erase = E.erase_keys
    seen = {}

    def crashing(spark_, base_dir, keys, key_col, n_buckets=32):
        led = read_erase_ledger(spark_, str(tmp_path / "ledger"))
        seen["ledger_at_erase"] = sorted(
            r[0] for r in led.collect()) if led is not None else None
        raise OSError("simulated crash before the store erase")

    import localsql_spark.streaming.stream_erase_ingest as SEI
    monkeypatch.setattr(SEI, "erase_keys", crashing)
    with pytest.raises(Exception, match="simulated crash"):
        stream_erase_ingest(
            spark, source_dir=str(src), schema="doc_id long",
            land_dir=str(tmp_path / "land"), store_dir=store,
            checkpoint_dir=str(tmp_path / "ck"), key_col="doc_id",
            n_buckets=4, ledger_dir=str(tmp_path / "ledger"))
    assert seen["ledger_at_erase"] == [3], \
        "ledger must commit before the store erase runs"

    # resume: the fold marker never landed, so the batch re-folds and the
    # erase completes; the ledger append is an idempotent overwrite
    monkeypatch.setattr(SEI, "erase_keys", real_erase)
    n = stream_erase_ingest(
        spark, source_dir=str(src), schema="doc_id long",
        land_dir=str(tmp_path / "land"), store_dir=store,
        checkpoint_dir=str(tmp_path / "ck"), key_col="doc_id",
        n_buckets=4, ledger_dir=str(tmp_path / "ledger"))
    assert n == 1
    from localsql_spark.sinks.erase import read_bucketed_store
    left = sorted(r.doc_id for r in
                  read_bucketed_store(spark, store).collect())
    assert left == [0, 1, 2, 4, 5, 6, 7]
    led = read_erase_ledger(spark, str(tmp_path / "ledger"))
    assert sorted(r[0] for r in led.collect()) == [3]


def test_erase_ledger_compaction_and_replay(spark, tmp_path):
    """Ledger retention: compaction folds request dirs into a generation
    without losing keys, and a checkpoint redelivery of a compacted
    request id is a no-op (superseded gate) instead of a resurrection."""
    from localsql_spark.sinks.erase import (compact_erase_ledger,
                                            erase_ledger_append,
                                            read_erase_ledger)

    led = str(tmp_path / "ledger")
    for i, key in enumerate([11, 22, 33]):
        erase_ledger_append(
            spark.createDataFrame([(key,)], "doc_id long"), led, i)
    assert compact_erase_ledger(spark, led, keep_last=1) == 2
    got = sorted(r[0] for r in read_erase_ledger(spark, led).collect())
    assert got == [11, 22, 33]
    # redelivery of folded batch 0 with DIFFERENT content must not land
    erase_ledger_append(
        spark.createDataFrame([(999,)], "doc_id long"), led, 0)
    got2 = sorted(r[0] for r in read_erase_ledger(spark, led).collect())
    assert got2 == [11, 22, 33]


def test_erase_ledger_wired_across_ingest_twins(spark, tmp_path):
    """Every subject-keyed ingest fold consults the ledger: a ledgered
    subject's late batch never reaches the inverted index, the NB count
    store, the IVF delta, or either validation route."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.selection import nb_model_read
    from localsql_spark.operators.similarity import (_ivf_slices,
                                                     write_ivf_index)
    from localsql_spark.sinks.erase import erase_ledger_append
    from localsql_spark.sinks.inverted_index import index_add_documents
    from localsql_spark.streaming.stream_ivf_ingest import ivf_ingest_batch
    from localsql_spark.streaming.stream_validate_ingest import (
        read_routed, validate_ingest_batch)

    led = str(tmp_path / "ledger")
    erase_ledger_append(spark.createDataFrame([(5,)], "id long"), led, 0)

    docs = _mk_docs(spark, [(5, "subject words here"),
                            (6, "bystander text body")])

    # inverted index (via the fold lambda's filter — call the sink the
    # way stream_index_ingest now does)
    from localsql_spark.sinks.erase import filter_erased
    idx = str(tmp_path / "idx")
    index_add_documents(spark, idx, filter_erased(docs, led, "doc_id"))
    post = (spark.read.option("basePath", idx).parquet(idx)
            .filter(F.col("tb") != 16))
    assert post.filter(F.col("doc_id") == 5).count() == 0
    assert post.filter(F.col("doc_id") == 6).count() > 0

    # NB model fold
    from localsql_spark.operators.selection import nb_model_update
    model = str(tmp_path / "nb")
    nb_model_update(spark, model, filter_erased(docs, led, "doc_id"),
                    positive=F.col("doc_id") % 2 == 0)
    m, _meta = nb_model_read(spark, model)
    assert m.filter(F.col("word") == "subject").count() == 0

    # IVF delta
    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(4)]) for i in range(4)],
        "vec_id long, embedding array<double>")
    late = spark.createDataFrame(
        [(5, [9.0, 9.0, 9.0, 9.0]), (6, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>")
    ivf = str(tmp_path / "ivf")
    write_ivf_index(emb, ivf, n_cells=2)
    n = ivf_ingest_batch(late, 1, index_path=ivf, erase_ledger=led)
    ids = {r["neighbor_id"] for r in _ivf_slices(spark, ivf).collect()}
    assert 5 not in ids and 6 in ids and n == 1

    # validation gate: neither route lands the subject
    ev = spark.createDataFrame([(5, 10.0), (6, -1.0), (7, 3.0)],
                               "id long, v double")
    out, quar = str(tmp_path / "ok"), str(tmp_path / "bad")
    from localsql_spark.operators.quality import between
    validate_ingest_batch(
        ev, 0, rules=[between("v", 0.0, 5.0)],
        out_dir=out, quarantine_dir=quar, erase_ledger=led,
        subject_col="id")
    assert {r["id"] for r in read_routed(spark, out).collect()} == {7}
    assert {r["id"] for r in read_routed(spark, quar).collect()} == {6}


def test_stream_cov_ingest_replay_is_idempotent(spark, tmp_path):
    """Fresh-checkpoint full replay of the covariance stream rewrites
    each batch dir byte-for-byte: the derived matrix is a pure function
    of the delivered row set, whatever the delivery schedule."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import covariance_matrix
    from localsql_spark.sinks.cov_store import cov_from_store
    from localsql_spark.streaming.stream_cov_ingest import stream_cov_ingest

    rows = [(i, [float(((i * 13 + j * 7) % 11) - 5) for j in range(4)])
            for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = tmp_path / "src"
    src.mkdir()
    import shutil
    for i in range(3):
        tmp = str(tmp_path / f"b{i}")
        df.filter(F.col("vec_id") % 3 == i).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = next((tmp_path / f"b{i}").glob("part-*.parquet"))
        shutil.move(str(part), src / f"{chr(97 + i)}_batch{i}.parquet")

    schema = df.schema
    store = str(tmp_path / "store")
    stream_cov_ingest(spark, source_dir=str(src), schema=schema,
                      store_dir=store,
                      checkpoint_dir=str(tmp_path / "ck1"))

    def mat(d):
        return {(r.j, r.k): r.cov for r in d.collect()}

    want = mat(covariance_matrix(df))
    assert mat(cov_from_store(spark, store)) == want
    # fresh checkpoint = full redelivery of every batch id
    stream_cov_ingest(spark, source_dir=str(src), schema=schema,
                      store_dir=store,
                      checkpoint_dir=str(tmp_path / "ck2"))
    assert mat(cov_from_store(spark, store)) == want
