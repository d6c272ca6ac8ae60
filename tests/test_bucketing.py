"""Bucketed tables must join without shuffles: the whole point of paying the
write-time shuffle is that the per-query Exchange disappears. Asserted
against the physical plan, not just results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from localsql_spark.sinks.bucketing import cobucket_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 1000).alias("custkey"),
        (F.col("id") * 3 % 97).cast("double").alias("price"))
    cust = spark.range(0, 1000).select(
        F.col("id").alias("custkey"),
        F.concat(F.lit("c"), F.col("id")).alias("name"))
    write_bucketed(orders, "b_orders", ["custkey"], n_buckets=8)
    write_bucketed(cust, "b_cust", ["custkey"], n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucket_join(spark, "b_orders", "b_cust", ["custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    agg = (spark.table("b_orders").groupBy("custkey")
           .agg(F.sum(F.col("price").cast("decimal(18,2)")).alias("s")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
    assert agg.count() == 1000


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    joined = cobucket_join(spark, "b_orders", "b_cust", ["custkey"])
    assert joined.filter(F.col("name") == "c7").count() == 10


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """write.partitionBy + a partition-key filter must scan only the matching
    partition directories (PartitionFilters in the scan, not a post-filter)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 10_000).select(
        "id", (F.col("id") % 4).cast("string").alias("lang"))
    out = str(tmp_path / "part_docs")
    df.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "2")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert back.count() == 2500


def test_layout_write_partitioned_prunes(spark, tmp_path):
    """sinks.layout.write_partitioned: a filter on the partition column must
    prune at planning time (PartitionFilters in the scan), not row-filter."""
    import io
    import contextlib
    from pyspark.sql import functions as F
    from localsql_spark.sinks.layout import write_partitioned, read_partitioned

    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("src"),
        (F.col("id") * 2).alias("v"))
    write_partitioned(df, tmp_path / "t", ["src"], sort_cols=["v"])
    back = read_partitioned(spark, tmp_path / "t").filter(F.col("src") == "2")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    # the equality predicate must land in PartitionFilters (planning-time
    # directory pruning), NOT in the row-level DataFilters
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any("= 2" in ln for ln in pf_lines), plan
    data_lines = [ln for ln in plan.splitlines() if "DataFilters" in ln]
    assert all("src" not in ln for ln in data_lines), plan
    assert back.count() == 250


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from localsql_spark.sinks.layout import compact_parquet

    # 64 tiny files
    spark.range(0, 10_000).repartition(64).write.parquet(str(tmp_path / "t"))
    import glob
    before = len(glob.glob(str(tmp_path / "t" / "*.parquet")))
    assert before >= 32
    n_after = compact_parquet(spark, tmp_path / "t", target_mb=128)
    assert n_after < before and n_after >= 1
    assert spark.read.parquet(str(tmp_path / "t")).count() == 10_000


def test_compact_parquet_recovers_from_crash_states(spark, tmp_path):
    """Every intermediate crash state must heal on the next run: table moved
    aside but swap unfinished; stale staging; finished swap without cleanup."""
    from localsql_spark.sinks.layout import compact_parquet

    t = tmp_path / "t"
    spark.range(0, 1000).repartition(8).write.parquet(str(t))
    old, staging = tmp_path / "t__old", tmp_path / "t__compacting"

    # crash between the two renames: table dir gone, data in __old
    t.rename(old)
    compact_parquet(spark, t, target_mb=128)
    assert spark.read.parquet(str(t)).count() == 1000
    assert not old.exists() and not staging.exists()

    # stale staging from an interrupted rewrite + leftover __old
    staging.mkdir()
    (staging / "junk").write_text("partial")
    old.mkdir()
    (old / "junk").write_text("stale generation")
    compact_parquet(spark, t, target_mb=128)
    assert spark.read.parquet(str(t)).count() == 1000
    assert not old.exists() and not staging.exists()


def test_zorder_write_skips_files_on_both_dimensions(spark, tmp_path):
    """Z-order clustering makes parquet footer min/max selective for range
    predicates on EITHER dimension; a single-column sort leaves the second
    dimension scattered across every file."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.layout import file_skip_ratio, write_zordered

    n = 20_000
    df = (spark.range(n)
          .select((F.col("id") % 997).alias("x"),
                  (F.col("id") * 131 % 1009).cast("double").alias("y")))
    zpath, spath = tmp_path / "zorder", tmp_path / "xsort"
    write_zordered(df, zpath, "x", "y", n_files=8)
    # comparison layout: sorted by x only, same file count
    (df.repartitionByRange(8, "x").sortWithinPartitions("x")
     .write.mode("overwrite").parquet(str(spath)))

    # narrow range on x: both layouts should skip
    zx = file_skip_ratio(zpath, "x", 0, 99)
    sx = file_skip_ratio(spath, "x", 0, 99)
    assert zx[0] < zx[1] and sx[0] < sx[1]
    # narrow range on y: only the z-ordered layout skips
    zy = file_skip_ratio(zpath, "y", 0.0, 100.0)
    sy = file_skip_ratio(spath, "y", 0.0, 100.0)
    assert zy[0] < zy[1], f"z-order did not skip on y: {zy}"
    assert sy[0] == sy[1], f"x-sort unexpectedly skipped on y: {sy}"
    # layouts hold the same rows
    a = spark.read.parquet(str(zpath)).orderBy("x", "y").collect()
    b = df.orderBy("x", "y").collect()
    assert a == b


def test_table_diff_over_bucketed_versions_has_no_exchange(spark):
    """Version-diff at scale: when both table versions are bucketed on the
    diff key, table_diff's full-outer join plans with NO Exchange — the
    diff reads pre-hash-partitioned buckets directly, so daily version
    audits never re-shuffle the big table."""
    import shutil

    from localsql_spark.operators.diff import table_diff
    from localsql_spark.sinks.bucketing import write_bucketed

    for t in ("diff_old_b", "diff_new_b"):
        # heal a stale warehouse dir from a crashed prior session (the
        # catalog forgets the table but the location survives)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 13).cast("double").alias("v"))
    new = df.withColumn(
        "v", F.when(F.col("k") % 11 == 0, F.col("v") + 1.0)
        .otherwise(F.col("v"))).filter(F.col("k") % 17 != 0)
    write_bucketed(df, "diff_old_b", ["k"], n_buckets=8)
    write_bucketed(new, "diff_new_b", ["k"], n_buckets=8)
    d = table_diff(spark.table("diff_old_b"), spark.table("diff_new_b"),
                   ["k"], ["v"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed diff still shuffles:\n{plan}"
    rows = d.collect()
    out = {"added": 0, "removed": 0, "changed": 0}
    for r in rows:
        out[r["change"]] += 1
    # removed: k%17==0 -> 295 keys; changed: k%11==0 minus the %187==0
    # overlap that was removed -> 455 - 27 = 428; nothing added
    assert out == {"added": 0, "removed": 295, "changed": 428}
    spark.sql("DROP TABLE IF EXISTS diff_old_b")
    spark.sql("DROP TABLE IF EXISTS diff_new_b")


def test_erase_keys_touches_only_key_buckets_and_is_idempotent(spark,
                                                               tmp_path):
    """Erasure rewrites exactly the buckets the keys hash to (untouched
    bucket files keep their inodes), removes every row of the erased
    keys, preserves everyone else byte-for-byte, and re-running the same
    request is a no-op on contents."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import (bucket_of, erase_keys,
                                            read_bucketed_store,
                                            write_bucketed_store)

    df = spark.createDataFrame(
        [(u, i, float(u * 100 + i)) for u in range(20) for i in range(5)],
        "user_id long, seq long, v double")
    store = str(tmp_path / "s")
    write_bucketed_store(df, store, "user_id", n_buckets=8)

    victims = [3, 7]
    kb = {r[0] for r in
          spark.createDataFrame([(u,) for u in victims], "user_id long")
          .select(bucket_of(F.col("user_id"), 8)).distinct().collect()}
    before = {p: sorted(f.name for f in
                        (tmp_path / "s" / p).glob("*.parquet"))
              for p in (d.name for d in (tmp_path / "s").glob("kb=*"))}

    keys = spark.createDataFrame([(u,) for u in victims], "user_id long")
    touched = erase_keys(spark, store, keys, "user_id", n_buckets=8)
    assert set(touched) == kb

    after = {p: sorted(f.name for f in
                       (tmp_path / "s" / p).glob("*.parquet"))
             for p in (d.name for d in (tmp_path / "s").glob("kb=*"))}
    for p, files in before.items():
        if int(p.split("=")[1]) not in kb:
            assert after[p] == files, f"untouched bucket {p} was rewritten"

    back = read_bucketed_store(spark, store)
    assert back.filter(F.col("user_id").isin(victims)).count() == 0
    survivors = {tuple(r) for r in
                 back.select("user_id", "seq", "v").collect()}
    want = {tuple(r) for r in
            df.filter(~F.col("user_id").isin(victims)).collect()}
    assert survivors == want
    # idempotent: re-running the request changes nothing
    erase_keys(spark, store, keys, "user_id", n_buckets=8)
    again = {tuple(r) for r in read_bucketed_store(spark, store)
             .select("user_id", "seq", "v").collect()}
    assert again == want


def test_erase_keys_empties_a_whole_bucket(spark, tmp_path):
    """When a deletion request wipes out every row of a bucket, the old
    bucket contents are actually REMOVED at swap (the staged empty dir
    replaces them), and reads see zero rows — not stale bytes."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import (bucket_of, erase_keys,
                                            read_bucketed_store,
                                            write_bucketed_store)

    df = spark.createDataFrame([(u, float(u)) for u in range(30)],
                               "user_id long, v double")
    store = str(tmp_path / "s")
    write_bucketed_store(df, store, "user_id", n_buckets=4)
    # erase EVERY user in bucket 2
    b2 = [r[0] for r in df.select("user_id")
          .filter(bucket_of(F.col("user_id"), 4) == 2).collect()]
    keys = spark.createDataFrame([(u,) for u in b2], "user_id long")
    erase_keys(spark, store, keys, "user_id", n_buckets=4)
    assert not list((tmp_path / "s" / "kb=2").glob("*.parquet"))
    back = read_bucketed_store(spark, store)
    assert back.count() == 30 - len(b2)
    assert back.filter(F.col("user_id").isin(b2)).count() == 0


def test_pseudonymize_roundtrip_and_erasure_unlinks(spark, tmp_path):
    """The vault re-identifies exactly; the analytics copy carries no
    raw key; deleting a subject's vault row + erasing their token from
    the token-keyed store leaves no path back to the identifier."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import (erase_keys, pseudonymize,
                                            read_bucketed_store,
                                            write_bucketed_store)

    df = spark.createDataFrame(
        [(u, f"e{i}", float(i)) for u in (10, 20, 30) for i in range(4)],
        "user_id long, event_type string, value double")
    anon, vault = pseudonymize(df, "user_id", salt="k")
    assert "user_id" not in anon.columns
    assert vault.count() == 3
    # deterministic: the same key re-tokenizes identically
    anon2, _ = pseudonymize(df, "user_id", salt="k")
    assert {r.token for r in anon.collect()} == \
        {r.token for r in anon2.collect()}
    # round trip through the vault restores every row
    back = anon.join(vault, "token").select("user_id", "event_type", "value")
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in df.collect()}

    # subject erasure: vault row out, token rows erased from the store
    store = str(tmp_path / "anon")
    write_bucketed_store(anon, store, "token", n_buckets=4)
    victim_tok = vault.filter(F.col("user_id") == 20) \
        .collect()[0]["token"]
    keys = spark.createDataFrame([(victim_tok,)], "token string")
    erase_keys(spark, store, keys, "token", n_buckets=4)
    left = read_bucketed_store(spark, store)
    assert left.filter(F.col("token") == victim_tok).count() == 0
    assert left.count() == 8
