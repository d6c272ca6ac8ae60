"""Incrementally-maintained rollups (sinks.rollup): incremental == full
recompute, touched-partition-only rewrites, crash recovery via the shared
manifest machinery."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double")


def _rows(df):
    return {(r["bucket_ts"], r["key"]):
            (r["n_events"], str(r["sum_value"]), r["min_value"],
             r["max_value"])
            for r in df.collect()}


def test_incremental_equals_full_recompute(spark, tmp_path):
    from localsql_spark.sinks.rollup import (maintain_rollup, read_rollup,
                                             rollup_events)

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [(i, base + dt.timedelta(minutes=7 * i), "ab"[i % 2],
             round(0.1 * i, 2)) for i in range(300)]
    ev = _events(spark, rows)
    out = tmp_path / "roll"
    # three uneven batches, one empty
    m = F.pmod(F.col("event_id"), F.lit(5))
    for batch in (ev.filter(m >= 2), ev.filter(m == 1),
                  ev.filter(m < 0), ev.filter(m == 0)):
        maintain_rollup(spark, str(out), batch, grain="hour")
    assert _rows(read_rollup(spark, str(out))) == _rows(rollup_events(ev))


def test_only_touched_date_partitions_rewritten(spark, tmp_path):
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup

    d1 = dt.datetime(2024, 3, 1, 5)
    d2 = dt.datetime(2024, 3, 2, 5)
    out = tmp_path / "roll"
    maintain_rollup(spark, str(out),
                    _events(spark, [(1, d1, "a", 1.0), (2, d2, "a", 2.0)]))
    before = {p.name: sorted(f.name for f in p.glob("*.parquet"))
              for p in out.glob("event_date=*")}
    touched = maintain_rollup(spark, str(out),
                              _events(spark, [(3, d2, "a", 3.0)]))
    assert touched == ["2024-03-02"]
    after = {p.name: sorted(f.name for f in p.glob("*.parquet"))
             for p in out.glob("event_date=*")}
    # day 1's files are byte-identical (never staged); day 2 was rewritten
    assert after["event_date=2024-03-01"] == before["event_date=2024-03-01"]
    assert after["event_date=2024-03-02"] != before["event_date=2024-03-02"]
    got = {r["bucket_ts"]: r["n_events"]
           for r in read_rollup(spark, str(out)).collect()}
    assert got == {"2024-03-01 05:00:00": 1, "2024-03-02 05:00:00": 2}


def test_crashed_maintenance_heals_on_read(spark, tmp_path):
    """A maintenance that died after the manifest commit but before the
    swaps must complete on the next read (shared recover_pending_merge)."""
    import json
    import os

    from localsql_spark.sinks.rollup import (maintain_rollup, read_rollup,
                                             rollup_events)

    d = dt.datetime(2024, 3, 1, 5)
    out = tmp_path / "roll"
    maintain_rollup(spark, str(out), _events(spark, [(1, d, "a", 1.0)]))
    # hand-stage an update and commit its manifest WITHOUT applying swaps —
    # exactly the post-crash disk state
    staging = out.parent / f".{out.name}.staging"
    merged = rollup_events(_events(spark, [(1, d, "a", 1.0),
                                           (2, d, "a", 9.0)]))
    merged.write.mode("overwrite").partitionBy("event_date") \
        .parquet(str(staging))
    manifest = out.parent / f".{out.name}.commit.json"
    tmp = manifest.with_suffix(".json.tmp")
    tmp.write_text(json.dumps({
        "staging": staging.name,
        "partitions": sorted(p.name for p in staging.glob("event_date=*"))}))
    os.rename(tmp, manifest)
    got = {r["bucket_ts"]: (r["n_events"], r["max_value"])
           for r in read_rollup(spark, str(out)).collect()}
    assert got == {"2024-03-01 05:00:00": (2, 9.0)}
    assert not manifest.exists() and not staging.exists()


# ---------------------------------------------------------------------------
# persisted SCD2 history store (sinks/scd2_store.py)
# ---------------------------------------------------------------------------

def _hist_rows(df):
    return sorted((r["k"], r["seg"], r["valid_from_us"], r["valid_to_us"])
                  for r in df.collect())


def test_scd2_store_matches_in_memory_chain(spark, tmp_path):
    """Two batches through the store == the pure-DataFrame scd2_apply
    chain, row for row; the open slice holds exactly the current keys."""
    from localsql_spark.operators.scd2 import scd2_apply, scd2_init
    from localsql_spark.sinks.scd2_store import (apply_batch, init_store,
                                                 read_history)

    store = str(tmp_path / "scd2")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, seg string")
    u1 = spark.createDataFrame([(1, "a2"), (3, "c")], "k int, seg string")
    u2 = spark.createDataFrame([(1, "a3"), (2, "b")], "k int, seg string")

    init_store(dim, store, ["k"], ["seg"], 100)
    apply_batch(spark, store, u1, ["k"], ["seg"], 200, batch_id=1)
    apply_batch(spark, store, u2, ["k"], ["seg"], 300, batch_id=2)

    expected = scd2_apply(
        scd2_apply(scd2_init(dim, ["k"], ["seg"], 100),
                   u1, ["k"], ["seg"], 200),
        u2, ["k"], ["seg"], 300)
    assert _hist_rows(read_history(spark, store)) == _hist_rows(expected)
    open_now = spark.read.parquet(f"{store}/open/batch_2")
    assert sorted(r["k"] for r in open_now.collect()) == [1, 2, 3]


def test_scd2_store_replay_is_idempotent(spark, tmp_path):
    """Re-applying the latest batch (checkpoint redelivery) leaves the
    history unchanged; an out-of-order older batch id is rejected."""
    import pytest

    from localsql_spark.sinks.scd2_store import (apply_batch, init_store,
                                                 read_history)

    store = str(tmp_path / "scd2")
    dim = spark.createDataFrame([(1, "a")], "k int, seg string")
    u1 = spark.createDataFrame([(1, "a2")], "k int, seg string")
    init_store(dim, store, ["k"], ["seg"], 100)
    apply_batch(spark, store, u1, ["k"], ["seg"], 200, batch_id=1)
    before = _hist_rows(read_history(spark, store))
    apply_batch(spark, store, u1, ["k"], ["seg"], 200, batch_id=1)  # replay
    assert _hist_rows(read_history(spark, store)) == before
    with pytest.raises(ValueError, match="older"):
        apply_batch(spark, store, u1, ["k"], ["seg"], 50, batch_id=0)


def test_scd2_store_compaction_preserves_history(spark, tmp_path):
    """compact_scd2_store folds all-but-the-latest closed batch dirs into
    one compact dir; read_history is bit-identical before/after, replay of
    the latest batch still works, and a second compaction after more
    batches supersedes the first compact dir."""
    from localsql_spark.sinks.scd2_store import (apply_batch,
                                                 compact_scd2_store,
                                                 init_store, read_history)

    store = str(tmp_path / "scd2")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, seg string")
    init_store(dim, store, ["k"], ["seg"], 100)
    for i, seg in enumerate(["a2", "a3", "a4"], start=1):
        u = spark.createDataFrame([(1, seg)], "k int, seg string")
        apply_batch(spark, store, u, ["k"], ["seg"], 100 * (i + 1),
                    batch_id=i)
    before = _hist_rows(read_history(spark, store))

    folded = compact_scd2_store(spark, store)
    assert folded == 2  # batch_1 + batch_2 (batch_3 is latest, unfolded)
    p = tmp_path / "scd2"
    assert (p / "closed" / "compact_upto_2").exists()
    assert not (p / "closed" / "batch_1").exists()
    assert (p / "closed" / "batch_3").exists()
    assert _hist_rows(read_history(spark, store)) == before

    # replay of the latest batch after compaction: unchanged history
    u3 = spark.createDataFrame([(1, "a4")], "k int, seg string")
    apply_batch(spark, store, u3, ["k"], ["seg"], 400, batch_id=3)
    assert _hist_rows(read_history(spark, store)) == before

    # more batches, second compaction folds old compact + batch dirs
    u4 = spark.createDataFrame([(2, "b2")], "k int, seg string")
    apply_batch(spark, store, u4, ["k"], ["seg"], 500, batch_id=4)
    before2 = _hist_rows(read_history(spark, store))
    assert compact_scd2_store(spark, store) == 2  # compact_upto_2 + batch_3
    assert (p / "closed" / "compact_upto_3").exists()
    assert not (p / "closed" / "compact_upto_2").exists()
    assert _hist_rows(read_history(spark, store)) == before2


def test_scd2_store_ignores_uncommitted_closed_dir(spark, tmp_path):
    """A closed/batch_<id> whose open sibling never landed (crash between
    the closed rename and the open rename) is invisible to read_history,
    and an open snapshot missing _SUCCESS is skipped by _latest_open."""
    from localsql_spark.sinks.scd2_store import (apply_batch, init_store,
                                                 read_history)

    store = str(tmp_path / "scd2")
    p = tmp_path / "scd2"
    dim = spark.createDataFrame([(1, "a")], "k int, seg string")
    u1 = spark.createDataFrame([(1, "a2")], "k int, seg string")
    init_store(dim, store, ["k"], ["seg"], 100)
    apply_batch(spark, store, u1, ["k"], ["seg"], 200, batch_id=1)
    before = _hist_rows(read_history(spark, store))

    # simulate a crash mid-commit of batch 2: closed landed, open did not
    crashed = spark.createDataFrame([(1, "a2", 200, 300)],
                                    "k int, seg string, valid_from_us long,"
                                    " valid_to_us long")
    crashed.write.parquet(str(p / "closed" / "batch_2"))
    assert _hist_rows(read_history(spark, store)) == before

    # simulate a partial open snapshot (no _SUCCESS): skipped by readers
    (p / "open" / "batch_3").mkdir(parents=True)
    (p / "open" / "batch_3" / "part-00000.parquet").write_bytes(b"junk")
    assert _hist_rows(read_history(spark, store)) == before


def test_scd2_store_reapply_after_closed_only_crash(spark, tmp_path):
    """Crash between the closed rename and the open rename (closed/batch_N
    landed, open/batch_N missing): re-applying batch N must succeed — the
    orphaned closed dir is cleared before the commit renames — and yield
    the same history as a crash-free application."""
    import shutil

    from localsql_spark.sinks.scd2_store import (apply_batch, init_store,
                                                 read_history)

    store = str(tmp_path / "scd2")
    p = tmp_path / "scd2"
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, seg string")
    u1 = spark.createDataFrame([(1, "a2")], "k int, seg string")
    init_store(dim, store, ["k"], ["seg"], 100)

    # crash-free twin for the expected final state
    twin = str(tmp_path / "twin")
    init_store(dim, twin, ["k"], ["seg"], 100)
    apply_batch(spark, twin, u1, ["k"], ["seg"], 200, batch_id=1)
    expected = _hist_rows(read_history(spark, twin))

    # produce the exact post-crash disk state: apply fully, then delete
    # the open dir (the closed rename happened first, so this IS the state
    # a crash between the two renames leaves behind)
    apply_batch(spark, store, u1, ["k"], ["seg"], 200, batch_id=1)
    shutil.rmtree(p / "open" / "batch_1")
    before = _hist_rows(read_history(spark, store))
    assert before != expected  # store reads as the predecessor snapshot

    # re-apply: _latest_open sees batch_0, replay path not taken, yet the
    # orphaned closed/batch_1 must not break the commit
    apply_batch(spark, store, u1, ["k"], ["seg"], 200, batch_id=1)
    assert _hist_rows(read_history(spark, store)) == expected


# ---------------------------------------------------------------------------
# streaming rollup (streaming/stream_rollup.py)
# ---------------------------------------------------------------------------

def test_stream_rollup_fold_is_marker_idempotent(spark, tmp_path):
    """fold_landed applies each landed batch exactly once (markers), a
    re-invocation is a no-op, a partial landing (no _SUCCESS) is skipped
    until the stream rewrites it, and the folded store equals the
    all-at-once rollup."""
    from localsql_spark.sinks.rollup import read_rollup, rollup_events
    from localsql_spark.streaming.stream_rollup import fold_landed

    rows = [(i, f"2024-03-0{1 + i % 2} 0{i % 3}:10:00", i % 5, "view",
             float(i)) for i in range(60)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string,"
              " value double").withColumn(
        "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    land = tmp_path / "land"
    for bid, pred in ((0, "event_id % 3 = 0"), (1, "event_id % 3 = 1"),
                      (2, "event_id % 3 = 2")):
        ev.filter(pred).write.parquet(str(land / f"batch_{bid}"))
    rollup = str(tmp_path / "rollup")

    assert fold_landed(spark, str(land), rollup) == 3
    assert fold_landed(spark, str(land), rollup) == 0  # markers: no-op

    got = {(r["bucket_ts"], r["key"]): (r["n_events"], float(r["sum_value"]))
           for r in read_rollup(spark, rollup).collect()}
    want = {(r["bucket_ts"], r["key"]): (r["n_events"], float(r["sum_value"]))
            for r in rollup_events(ev, grain="hour").collect()}
    assert got == want

    # partial landing: batch_3 without _SUCCESS is skipped, then folds
    # after the marker file appears
    b3 = land / "batch_3"
    ev.filter("event_id % 7 = 0").write.parquet(str(b3))
    (b3 / "_SUCCESS").unlink()
    assert fold_landed(spark, str(land), rollup) == 0
    (b3 / "_SUCCESS").touch()
    assert fold_landed(spark, str(land), rollup) == 1


def test_prune_landed_retention_and_replay_safety(spark, tmp_path):
    """prune_landed deletes applied batch dirs below the newest applied
    batch after advancing the applied-through watermark; a checkpoint
    redelivery that re-lands a pruned batch is skipped by the watermark
    (never double-folded); an unapplied gap batch blocks pruning above
    it."""
    from localsql_spark.sinks.rollup import read_rollup
    from localsql_spark.streaming.stream_rollup import (_applied_marker,
                                                        _applied_through,
                                                        fold_landed,
                                                        prune_landed)

    rows = [(i, f"2024-03-0{1 + i % 2} 0{i % 3}:10:00", i % 5, "view",
             float(i)) for i in range(60)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string,"
              " value double").withColumn(
        "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    land = tmp_path / "land"
    for bid in range(4):
        ev.filter(f"event_id % 4 = {bid}").write.parquet(
            str(land / f"batch_{bid}"))
    rollup = str(tmp_path / "rollup")
    assert fold_landed(spark, str(land), rollup) == 4
    before = {(r["bucket_ts"], r["key"]): (r["n_events"],
                                           float(r["sum_value"]))
              for r in read_rollup(spark, rollup).collect()}

    assert prune_landed(str(land), rollup) == 3  # keep_last=1 keeps batch_3
    assert sorted(p.name for p in land.glob("batch_*")) == ["batch_3"]
    assert _applied_through(rollup) == 2
    assert not _applied_marker(rollup, 0).exists()
    assert _applied_marker(rollup, 3).exists()  # retained tail keeps marker

    # redelivery of a pruned batch re-lands the dir; the fold skips it
    ev.filter("event_id % 4 = 1").write.parquet(str(land / "batch_1"))
    assert fold_landed(spark, str(land), rollup) == 0
    after = {(r["bucket_ts"], r["key"]): (r["n_events"],
                                          float(r["sum_value"]))
             for r in read_rollup(spark, rollup).collect()}
    assert after == before  # never double-applied
    assert prune_landed(str(land), rollup) == 1  # re-landed dir re-pruned
    assert fold_landed(spark, str(land), rollup) == 0

    # new batches keep flowing after a prune
    ev.filter("event_id % 7 = 0").write.parquet(str(land / "batch_4"))
    assert fold_landed(spark, str(land), rollup) == 1

    # a PARTIAL landing stops the fold (order preserved — folding batch_6
    # past torn batch_5 would apply batches out of id order, which
    # corrupts order-sensitive appliers like the IVM dim fold), and the
    # unapplied gap blocks pruning above it
    ev.filter("event_id % 11 = 0").write.parquet(str(land / "batch_5"))
    (land / "batch_5" / "_SUCCESS").unlink()  # landed but never applied
    ev.filter("event_id % 13 = 0").write.parquet(str(land / "batch_6"))
    assert fold_landed(spark, str(land), rollup) == 0  # stops at the tear
    n = prune_landed(str(land), rollup, keep_last=0)
    assert (land / "batch_6").exists()
    assert _applied_through(rollup) <= 4
    # the stream rewrites the torn dir; the fold resumes IN ORDER
    ev.filter("event_id % 11 = 0").write.mode("overwrite").parquet(
        str(land / "batch_5"))
    assert fold_landed(spark, str(land), rollup) == 2  # 5 then 6


def test_prune_landed_blocks_on_wholly_missing_gap_id(spark, tmp_path):
    """A batch id with NO landing dir at all (dir lost externally, or a
    sink that skipped the id) below an applied dir must block the
    watermark advance: otherwise a later redelivery of the missing id
    would be skipped as already-applied without ever being folded."""
    from localsql_spark.sinks.rollup import read_rollup
    from localsql_spark.streaming.stream_rollup import (_applied_through,
                                                        fold_landed,
                                                        prune_landed)

    rows = [(i, f"2024-03-01 0{i % 3}:10:00", i % 5, "view", float(i))
            for i in range(30)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string,"
              " value double").withColumn(
        "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    land = tmp_path / "land"
    # batches 0 and 2 land; batch_1's dir is wholly missing
    ev.filter("event_id % 3 = 0").write.parquet(str(land / "batch_0"))
    ev.filter("event_id % 3 = 2").write.parquet(str(land / "batch_2"))
    rollup = str(tmp_path / "rollup")
    assert fold_landed(spark, str(land), rollup) == 2

    # prune must stop below the missing id: watermark may cover 0, not 1
    prune_landed(str(land), rollup, keep_last=0)
    assert _applied_through(rollup) <= 0
    assert (land / "batch_2").exists()  # above the gap: retained

    # late redelivery of the missing id is still folded, not skipped
    ev.filter("event_id % 3 = 1").write.parquet(str(land / "batch_1"))
    assert fold_landed(spark, str(land), rollup) == 1
    got = {(r["bucket_ts"], r["key"]): r["n_events"]
           for r in read_rollup(spark, rollup).collect()}
    # after batch_1 folds, every event is in the rollup exactly once
    assert sum(got.values()) == 30
    # and with the gap filled, pruning may now advance past it
    prune_landed(str(land), rollup, keep_last=0)
    assert _applied_through(rollup) == 2


def test_ivm_join_view_incremental_equals_full_and_prunes(spark, tmp_path):
    """maintain_join_view folds fact batches through the dim join; the
    final view equals the full-recompute join-aggregate, each fold
    reports (and rewrites) only the grp_bucket partitions its batch
    touched, and a torn staging dir heals on the next call."""
    from localsql_spark.sinks.ivm import (join_rollup, maintain_join_view,
                                          read_join_view)

    fact = spark.createDataFrame(
        [(i, i % 7, float(10 * i)) for i in range(200)],
        "fk long, cust long, amount double")
    dim = spark.createDataFrame(
        [(c, f"g{c % 3}") for c in range(7)], "cust_id long, grp_name string")
    view = str(tmp_path / "view")

    touched = []
    for b in range(4):
        touched.append(maintain_join_view(
            spark, view, fact.filter(f"fk % 4 = {b}"), dim,
            fact_key="cust", dim_key="cust_id", group_col="grp_name",
            value_col="amount", n_buckets=4))
    got = {(r["grp"]): (r["n_rows"], float(r["sum_value"]))
           for r in read_join_view(spark, view).collect()}
    full = {(r["grp"]): (r["n_rows"], float(r["sum_value"]))
            for r in join_rollup(fact, dim, "cust", "cust_id", "grp_name",
                                 "amount", 4).collect()}
    assert got == full
    # every fold touched only buckets (bounded by n_buckets), and the
    # union covers exactly the buckets present on disk
    on_disk = {int(p.name.split("=")[1])
               for p in (tmp_path / "view").glob("grp_bucket=*")}
    assert set().union(*map(set, touched)) == on_disk

    # a batch touching ONE group rewrites only that group's bucket
    one = spark.createDataFrame([(999, 2, 5.0)],
                                "fk long, cust long, amount double")
    t = maintain_join_view(spark, view, one, dim, "cust", "cust_id",
                           "grp_name", "amount", n_buckets=4)
    assert len(t) == 1
    got2 = {r["grp"]: (r["n_rows"], float(r["sum_value"]))
            for r in read_join_view(spark, view).collect()}
    assert got2["g2"] == (full["g2"][0] + 1, full["g2"][1] + 5.0)
    assert all(got2[g] == full[g] for g in got2 if g != "g2")


def test_ivm_dim_change_retracts_and_readds(spark, tmp_path):
    """apply_dim_change moves exactly the changed keys' contribution:
    groups gaining members grow, groups losing ALL members leave the
    view, untouched groups' partitions are not rewritten."""
    from localsql_spark.sinks.ivm import (apply_dim_change, join_rollup,
                                          maintain_join_view,
                                          read_join_view)

    fact = spark.createDataFrame(
        [(i, i % 6, float(i)) for i in range(120)],
        "fk long, cust long, amount double")
    dim = spark.createDataFrame(
        [(c, f"g{c % 3}") for c in range(6)], "cust_id long, grp_name string")
    view = str(tmp_path / "view")
    maintain_join_view(spark, view, fact, dim, "cust", "cust_id",
                       "grp_name", "amount", n_buckets=4)

    # move BOTH members of g2 (custs 2 and 5) into g0: g2 must vanish
    old_rows = dim.filter("cust_id IN (2, 5)")
    new_rows = old_rows.select("cust_id", F.lit("g0").alias("grp_name"))
    touched = apply_dim_change(spark, view, fact, old_rows, new_rows,
                               "cust", "cust_id", "grp_name", "amount",
                               n_buckets=4)
    assert touched  # g0's and g2's buckets
    got = {r["grp"]: (r["n_rows"], float(r["sum_value"]))
           for r in read_join_view(spark, view).collect()}
    new_dim = spark.createDataFrame(
        [(0, "g0"), (1, "g1"), (2, "g0"), (3, "g0"), (4, "g1"), (5, "g0")],
        "cust_id long, grp_name string")
    want = {r["grp"]: (r["n_rows"], float(r["sum_value"]))
            for r in join_rollup(fact, new_dim, "cust", "cust_id",
                                 "grp_name", "amount", 4).collect()}
    assert got == want
    assert "g2" not in got


def test_stream_ivm_ingest_exactly_once_and_replay(spark, tmp_path):
    """The streamed IVM view equals the batch join-aggregate, re-running
    the whole land+fold is a no-op (markers), and a deleted checkpoint's
    full redelivery still folds nothing twice (idempotent landing +
    markers)."""
    import os

    from localsql_spark.sinks.ivm import join_rollup, read_join_view
    from localsql_spark.streaming.stream_ivm_ingest import stream_ivm_ingest

    fact = spark.createDataFrame(
        [(i, i % 5, float(10 * i)) for i in range(90)],
        "fk long, cust long, amount double")
    dim = spark.createDataFrame([(c, f"g{c % 2}") for c in range(5)],
                                "cust_id long, grp_name string")
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        d = tmp_path / f"b{i}"
        fact.filter(f"fk % 3 = {i}").coalesce(1).write.parquet(str(d))
        part = next(d.glob("part-*.parquet"))
        part.rename(src / f"f{i}.parquet")
        os.utime(src / f"f{i}.parquet", (1000 + i, 1000 + i))

    kw = dict(source_dir=str(src), schema=fact.schema,
              land_dir=str(tmp_path / "land"),
              view_dir=str(tmp_path / "view"),
              checkpoint_dir=str(tmp_path / "ck"), dim=dim,
              fact_key="cust", dim_key="cust_id", group_col="grp_name",
              value_col="amount", n_buckets=4)
    assert stream_ivm_ingest(spark, **kw) == 3

    def view():
        return {r["grp"]: (r["n_rows"], float(r["sum_value"]))
                for r in read_join_view(spark,
                                        str(tmp_path / "view")).collect()}
    want = {r["grp"]: (r["n_rows"], float(r["sum_value"]))
            for r in join_rollup(fact, dim, "cust", "cust_id", "grp_name",
                                 "amount", 4).collect()}
    assert view() == want
    # replay: nothing new to fold
    assert stream_ivm_ingest(spark, **kw) == 0
    assert view() == want
    # full redelivery (fresh checkpoint): landing dirs overwrite
    # byte-identically, markers skip every fold
    import shutil
    shutil.rmtree(tmp_path / "ck")
    assert stream_ivm_ingest(spark, **{**kw}) == 0
    assert view() == want


def test_ivm_view_rejects_mismatched_bucket_count(spark, tmp_path):
    """A fold with a different n_buckets than the view was built with
    must be refused — grp_bucket assignments would diverge and the merge
    would keep duplicate group rows."""
    import pytest

    from localsql_spark.sinks.ivm import maintain_join_view

    fact = spark.createDataFrame([(1, 1, 1.0)],
                                 "fk long, cust long, amount double")
    dim = spark.createDataFrame([(1, "g")], "cust_id long, grp_name string")
    view = str(tmp_path / "view")
    maintain_join_view(spark, view, fact, dim, "cust", "cust_id",
                       "grp_name", "amount", n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets=4"):
        maintain_join_view(spark, view, fact, dim, "cust", "cust_id",
                           "grp_name", "amount", n_buckets=8)


def test_sketch_view_fold_equals_full_and_register_merge_is_max(spark,
                                                                tmp_path):
    """Two sequential folds produce registers bit-identical to one
    full-corpus fold (per-bucket max is order-free), totals add, and the
    estimate sits within the HLL error band of the exact distinct
    count."""
    import math

    from pyspark.sql import functions as F

    from localsql_spark.operators.corpus import ngram_stream
    from localsql_spark.operators.sketches import HLL_M, hll_error_bound
    from localsql_spark.sinks.sketch_view import (sketch_view_read,
                                                  sketch_view_update)

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 17 + j) % 97}" for j in range(30)), "s0")
         for i in range(40)]
        + [(100 + i, "same words every time here", "s1") for i in range(50)],
        "doc_id long, text string, source string")

    inc = tmp_path / "inc"
    sketch_view_update(spark, str(inc), docs.filter("doc_id % 2 = 0"))
    sketch_view_update(spark, str(inc), docs.filter("doc_id % 2 = 1"))
    full = tmp_path / "full"
    sketch_view_update(spark, str(full), docs)

    def regs(d):
        df = spark.read.option("basePath", str(d)).parquet(str(d))
        return {tuple(r) for r in
                df.filter(F.col("bucket") >= 0)
                .select("grp", "bucket", "m_rank").collect()}
    assert regs(inc) == regs(full)

    out = {r.source: r for r in
           sketch_view_read(spark, str(inc)).collect()}
    exact = {r["source"]: r["d"] for r in
             (ngram_stream(docs).groupBy("source")
              .agg(F.countDistinct("g").alias("d")).collect())}
    for s, row in out.items():
        err = hll_error_bound() * exact[s] + 3   # 3-sigma + tiny-count slack
        assert abs(row.approx_distinct - exact[s]) <= err, (s, row, exact[s])
    # templated source: tiny distinct count despite many occurrences
    assert out["s1"].total_ngrams == 200 and out["s1"].approx_distinct < 10
    assert out["s0"].ttr_approx > 3 * out["s1"].ttr_approx


def test_backfill_replaces_only_named_dates_and_handles_empty(spark,
                                                              tmp_path):
    """Backfill swaps exactly the named dates (others keep their files),
    is idempotent, and a backfilled date with NO source rows loses its
    stale stored rows entirely."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.rollup import (backfill_rollup,
                                             maintain_rollup, read_rollup)

    base_ts = 1_700_000_000
    ev = spark.createDataFrame(
        [(i, base_ts + (i % 3) * 86_400 + i, f"t{i % 2}", float(i))
         for i in range(60)],
        "event_id long, ts long, event_type string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    store = str(tmp_path / "r")
    # initial fold misses half the rows of day 0
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    days = sorted(r[0] for r in ev.select(day.alias("d")).distinct()
                  .collect())
    broken = ev.filter(~((day == days[0]) & (F.col("event_id") % 2 == 0)))
    maintain_rollup(spark, store, broken, grain="hour")

    files_before = {p.name: sorted(f.name for f in p.glob("*.parquet"))
                    for p in (tmp_path / "r").glob("event_date=*")}
    backfill_rollup(spark, store, ev, [days[0]], grain="hour")
    files_after = {p.name: sorted(f.name for f in p.glob("*.parquet"))
                   for p in (tmp_path / "r").glob("event_date=*")}
    for name, fs in files_before.items():
        if name != f"event_date={days[0]}":
            assert files_after[name] == fs

    want = {tuple(r) for r in
            (ev.groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                      "yyyy-MM-dd HH:00:00")
                        .alias("b"), "event_type")
             .agg(F.count(F.lit(1)).alias("n")).collect())}
    got = {tuple(r) for r in
           read_rollup(spark, store)
           .select("bucket_ts", "key", "n_events").collect()}
    assert got == want
    # idempotent
    backfill_rollup(spark, store, ev, [days[0]], grain="hour")
    got2 = {tuple(r) for r in read_rollup(spark, store)
            .select("bucket_ts", "key", "n_events").collect()}
    assert got2 == want
    # repair-to-empty: backfilling a date against a source with no rows
    # for it removes the stale partition's rows
    backfill_rollup(spark, store, ev.filter(day != days[1]), [days[1]],
                    grain="hour")
    assert read_rollup(spark, store) \
        .filter(F.col("event_date") == days[1]).count() == 0


def test_ivm_null_group_folds_into_reserved_bucket(spark, tmp_path):
    """A NULL dim group must MERGE across folds (reserved bucket), not
    silently reset — NULL grp_bucket was invisible to isin() pruning and
    the staged partition replaced the stored one (code-review r9)."""
    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view

    dim = spark.createDataFrame([(1, "a"), (2, None)],
                                "k long, grp string")
    view = str(tmp_path / "view")
    f1 = spark.createDataFrame([(1, 10.0), (2, 5.0), (2, 5.0)],
                               "k long, v double")
    f2 = spark.createDataFrame([(2, 3.0)], "k long, v double")
    maintain_join_view(spark, view, f1, dim, fact_key="k", dim_key="k",
                       group_col="grp", value_col="v", n_buckets=4)
    maintain_join_view(spark, view, f2, dim, fact_key="k", dim_key="k",
                       group_col="grp", value_col="v", n_buckets=4)
    got = {r.grp: (r.n_rows, float(r.sum_value))
           for r in read_join_view(spark, view).collect()}
    assert got == {"a": (1, 10.0), None: (3, 13.0)}, \
        "NULL group's second fold must merge, not replace"


def test_ivm_full_retraction_reads_as_empty_frame(spark, tmp_path):
    """Retracting every group leaves the view dir with no parquet files;
    read_join_view must return an empty frame from the recorded schema,
    not crash schema inference (code-review r9)."""
    from localsql_spark.sinks.ivm import (apply_dim_change,
                                          maintain_join_view,
                                          read_join_view)

    dim = spark.createDataFrame([(1, "a")], "k long, grp string")
    fact = spark.createDataFrame([(1, 10.0)], "k long, v double")
    view = str(tmp_path / "view")
    maintain_join_view(spark, view, fact, dim, fact_key="k", dim_key="k",
                       group_col="grp", value_col="v", n_buckets=4)
    # dim delete: retract the only group's contribution entirely
    apply_dim_change(spark, view, fact,
                     old_dim_rows=dim,
                     new_dim_rows=dim.filter("k < 0"),
                     fact_key="k", dim_key="k", group_col="grp",
                     value_col="v", n_buckets=4)
    out = read_join_view(spark, view)
    assert out.count() == 0
    assert set(out.columns) >= {"grp", "n_rows", "sum_value"}


def test_rollup_rejects_null_timestamps(spark, tmp_path):
    """A NULL ts rolls up to a NULL event_date, which partition pruning
    can never merge with — rejected up front like the merge sink's NULL
    partition guard (code-review r9)."""
    import pytest as _pytest

    from localsql_spark.sinks.rollup import maintain_rollup

    ev = spark.createDataFrame(
        [(1, None, 1, "view", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")
    with _pytest.raises(ValueError, match="NULL"):
        maintain_rollup(spark, str(tmp_path / "r"), ev)


def test_sketch_view_null_and_numeric_groups_merge_across_folds(
        spark, tmp_path):
    """The sketch view partitions on the group's HASH bucket, so a NULL
    group and numeric-looking group names ('1.50' vs '1.5') both merge
    correctly across folds — raw-value hive partitioning reset NULL
    groups every batch and forked numeric-looking names through
    partition-type inference (code-review r9)."""
    from localsql_spark.sinks.sketch_view import (sketch_view_read,
                                                  sketch_view_update)

    view = str(tmp_path / "view")
    b1 = spark.createDataFrame(
        [(1, None, "alpha beta gamma"), (2, "1.50", "delta epsilon zeta"),
         (3, "1.5", "eta theta iota")],
        "doc_id long, source string, text string")
    b2 = spark.createDataFrame(
        [(4, None, "kappa lambda mu"), (5, "1.50", "nu xi omicron")],
        "doc_id long, source string, text string")
    sketch_view_update(spark, view, b1)
    sketch_view_update(spark, view, b2)
    rows = sketch_view_read(spark, view).collect()
    got = {r.source: (r.n_docs, r.total_ngrams) for r in rows}
    # bigrams per 3-word doc = 2
    assert got == {None: (2, 4), "1.50": (2, 4), "1.5": (1, 2)}, \
        "groups must accumulate across folds and never fork/reset"
    # the NULL group's registers join its counter row (null-safe join):
    # its estimate reflects its 4 distinct bigrams, not a zeroed sketch
    null_row = next(r for r in rows if r.source is None)
    assert null_row.n_buckets_seen > 0 and null_row.approx_distinct > 0


def test_compact_batches_blocks_on_missing_intermediate_id(spark, tmp_path):
    """A wholly MISSING intermediate batch id must block compaction above
    it: folding past the gap would advance the generation watermark over
    the id, and its later redelivery would be discarded as superseded
    before its rows ever became durable (code-review r9)."""
    from localsql_spark.streaming.batch_dirs import (compact_batches,
                                                     compacted_through,
                                                     fold_cutoff,
                                                     read_batches,
                                                     superseded)

    land = tmp_path / "land"
    for bid in (0, 1, 3, 4):  # batch_2 is missing
        spark.createDataFrame([(bid,)], "v long").write.parquet(
            str(land / f"batch_{bid}"))
    assert fold_cutoff(str(land), keep_last=0) == 1
    assert compact_batches(spark, str(land), keep_last=0) == 2  # 0 and 1
    assert compacted_through(str(land)) == 1
    assert not superseded(str(land), 2)  # redelivery of 2 still folds
    # batch 2 re-lands; the fold can now pass the gap
    spark.createDataFrame([(2,)], "v long").write.parquet(
        str(land / "batch_2"))
    assert compact_batches(spark, str(land), keep_last=0) == 3
    assert compacted_through(str(land)) == 4
    assert sorted(r.v for r in read_batches(spark, str(land)).collect()) \
        == [0, 1, 2, 3, 4]


def test_read_batches_skips_torn_dirs(spark, tmp_path):
    """read_batches must exclude a batch dir without _SUCCESS (a partial
    landing the stream will rewrite) exactly as the fold and compaction
    loops do (code-review r9)."""
    from localsql_spark.streaming.batch_dirs import read_batches

    land = tmp_path / "land"
    spark.createDataFrame([(0,)], "v long").write.parquet(
        str(land / "batch_0"))
    spark.createDataFrame([(1,)], "v long").write.parquet(
        str(land / "batch_1"))
    (land / "batch_1" / "_SUCCESS").unlink()
    assert [r.v for r in read_batches(spark, str(land)).collect()] == [0]


def test_folds_write_one_file_per_partition(spark, tmp_path):
    """Layout contract behind the request-bounded erase/fold reads: the
    staged writes cluster on the partition key, so a partition dir holds
    ONE part file per fold, not one sliver per writer task (the defect
    the 64x erase scale probe exposed — files-per-partition equal to
    writer parallelism made pruned reads scale with the cluster)."""
    import datetime as dt
    from pathlib import Path

    from localsql_spark.sinks.erase import erase_keys, write_bucketed_store
    from localsql_spark.sinks.rollup import maintain_rollup

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    roll = str(tmp_path / "roll")
    for b in range(3):  # three folds over the same three dates
        batch = _events(spark, [
            (b * 1000 + i, base + dt.timedelta(hours=i % 72), "ab"[i % 2],
             float(i)) for i in range(200)]).repartition(8)
        maintain_rollup(spark, roll, batch, grain="hour")
    for d in Path(roll).glob("event_date=*"):
        files = list(d.glob("*.parquet"))
        assert len(files) == 1, (d.name, len(files))

    store = str(tmp_path / "store")
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text")).repartition(16)
    write_bucketed_store(docs, store, "doc_id", n_buckets=8)
    for d in Path(store).glob("kb=*"):
        assert len(list(d.glob("*.parquet"))) == 1, d.name
    erase_keys(spark, store,
               spark.createDataFrame([(i,) for i in range(0, 2000, 7)],
                                     "doc_id long"),
               "doc_id", n_buckets=8)
    for d in Path(store).glob("kb=*"):
        assert len(list(d.glob("*.parquet"))) == 1, d.name


def test_maintain_rollup_retention_drops_and_blocks_stragglers(spark,
                                                               tmp_path):
    """retain_from drops expired partitions metadata-only, keeps
    survivors byte-identical, and a straggler batch below the cutoff
    cannot resurrect an expired date."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup

    rows = [(i, f"2024-01-{(i % 9) + 1:02d} 0{i % 10}:15:00",
             "t", float(i)) for i in range(90)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "event_type", "value")
    store = str(tmp_path / "roll")
    maintain_rollup(spark, store, ev)
    kept_files = {str(f): f.read_bytes()
                  for d in Path(store).glob("event_date=*")
                  if d.name >= "event_date=2024-01-04"
                  for f in d.rglob("*.parquet")}
    # a retention-gated fold of an empty batch enforces the cutoff
    maintain_rollup(spark, store, ev.limit(0), retain_from="2024-01-04")
    dates = sorted(d.name for d in Path(store).glob("event_date=*"))
    assert dates[0] == "event_date=2024-01-04" and len(dates) == 6
    for path, bytes_ in kept_files.items():
        assert Path(path).read_bytes() == bytes_
    # straggler below the cutoff: dropped before the fold
    straggler = ev.filter(F.to_date("ts") < F.lit("2024-01-04"))
    assert straggler.count() > 0
    maintain_rollup(spark, store, straggler, retain_from="2024-01-04")
    assert sorted(d.name for d in Path(store).glob("event_date=*")) == dates
    # retained content == recompute over exactly the window
    from localsql_spark.sinks.rollup import rollup_events
    got = {(r.bucket_ts, r.key, r.n_events)
           for r in read_rollup(spark, store)
           .select("bucket_ts", "key", "n_events").collect()}
    want = {(r.bucket_ts, r.key, r.n_events)
            for r in rollup_events(
                ev.filter(F.to_date("ts") >= F.lit("2024-01-04")))
            .select("bucket_ts", "key", "n_events").collect()}
    assert got == want and got
