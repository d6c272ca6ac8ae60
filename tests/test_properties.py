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
    rx = glob_to_regex(pat)  # unanchored body; callers fullmatch/\A..\z it
    compiled = re.compile(rx)  # must always be a valid regex
    if "*" not in pat and "?" not in pat and "[" not in pat:
        assert compiled.fullmatch(pat), "literal pattern must match itself"


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
        strftime("%Y-%m-%d %H:%M:%S", "ts", "+1.5 days").alias("frac"),
        strftime("%Y-%m-%d", "ts", "start of month").alias("b"),
        strftime("%Y-%m-%d", "ts", "+1 year").alias("c"),
        strftime("%s", "ts").alias("epoch"),
        strftime("day %j of %Y", "ts").alias("lit"),
        # 2024-02-29 is a Thursday; weekday 4 (Thursday) must be a no-op,
        # weekday 0 advances to Sunday 03-03
        strftime("%Y-%m-%d", "ts", "weekday 4").alias("thu"),
        strftime("%Y-%m-%d", "ts", "weekday 0").alias("sun")).collect()[0]
    assert row["a"] == "2024-03-01 10:00:00"
    assert row["frac"] == "2024-03-01 22:30:00"  # +36h, SQLite fractional day
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


def test_strftime_trailing_percent_terminates(spark):
    """A format string ending in a bare '%' is a literal percent, not an
    infinite loop (code-review r2)."""
    from pyspark.sql import functions as F
    from localsql_spark.functions.sqlite_compat import strftime

    df = spark.createDataFrame([("2024-01-15 08:00:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts"))
    row = df.select(strftime("growth %d%", "ts").alias("x")).collect()[0]
    assert row["x"] == "growth 15%"


def test_parse_bytes_two_letter_suffixes():
    """Spark byte-strings come in '128m' AND '128mb' spellings
    (code-review r2)."""
    from localsql_spark.operators import _parse_bytes

    assert _parse_bytes("134217728") == 128 << 20
    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128mb") == 128 << 20
    assert _parse_bytes("1gb") == 1 << 30
    assert _parse_bytes("1tb") == 1 << 40
    assert _parse_bytes("64k") == 64 << 10


def test_register_testdata_restores_replaced_view(spark):
    """A cache hit must re-register the views: other code replacing a view
    name must not poison subsequent load() calls (code-review r2)."""
    from tests.conftest import SF_SMALL
    from localsql_spark.catalog import register_testdata

    register_testdata(spark, SF_SMALL)
    true_count = spark.table("region").count()
    spark.range(0, 1).toDF("bogus").createOrReplaceTempView("region")
    register_testdata(spark, SF_SMALL)  # cache hit — must restore the view
    assert spark.table("region").count() == true_count
    assert "bogus" not in spark.table("region").columns


def test_window_exclude_emulation_null_fidelity(spark, tmp_path):
    """The EXCLUDE emulation must match DuckDB's NATIVE EXCLUDE even when
    the summed value contains NULLs: sums skip NULLs, and the result is
    NULL exactly when the remaining frame has no non-null value
    (code-review r2)."""
    import duckdb
    from pyspark.sql import functions as F
    from localsql_spark.workload import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = [  # (event_id, ts, user_id, value): NULLs + all-null days
        (1, "2024-01-01 10:00:00", 7, None),
        (2, "2024-01-01 11:00:00", 7, None),     # day 1: all-null peers
        (3, "2024-01-02 10:00:00", 7, 5.0),
        (4, "2024-01-02 11:00:00", 7, None),
        (5, "2024-01-03 10:00:00", 7, 2.0),
        (6, "2024-01-03 11:00:00", 7, 3.0),
        (7, "2024-01-04 10:00:00", 7, None),     # trailing null day
        (8, "2024-01-01 10:00:00", 8, None),     # lone-user, single null
    ]
    df = spark.createDataFrame(rows, "event_id long, s string, user_id long, value double").select(
        "event_id", F.col("s").cast("timestamp").alias("ts"), "user_id", "value",
        F.lit("x").alias("event_type"), F.lit("{}").alias("props"))
    sf = tmp_path / "sf_null"
    sf.mkdir()
    # single FILE (not a directory): the catalog's nanos-normalizer and the
    # driver's layout both expect <sf>/events.parquet to be a plain file
    df.coalesce(1).write.parquet(str(tmp_path / "_ev"))
    part = next(p for p in (tmp_path / "_ev").iterdir()
                if p.name.startswith("part-"))
    part.rename(sf / "events.parquet")

    got = {r["event_id"]: (r["s_excl_current"], r["s_excl_group"], r["s_excl_ties"])
           for r in REGISTRY["window_exclude_emulated"].fn(spark, str(sf)).collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = {r[0]: (r[2], r[3], r[4]) for r in con.execute(
        REGISTRY["window_exclude_emulated"].oracle).fetchall()}
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_knn_brute_force_matches_numpy_ground_truth(spark):
    """Independent oracle: exact top-k against a numpy cosine computation on
    deterministic vectors (not the structurally-similar SQL oracle)."""
    import numpy as np
    from localsql_spark.operators.similarity import knn_brute_force

    dim, n = 16, 60
    vecs = {i: np.array([((i * 31 + j * 17) % 23) - 11.0 for j in range(dim)])
            for i in range(n)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 3")
    got = {(r["query_id"], r["rn"]): r["neighbor_id"]
           for r in knn_brute_force(df, queries, k=4).collect()}

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for q in range(3):
        scored = sorted(((round(cos(vecs[q], vecs[i]), 9), -i, i)
                         for i in range(n) if i != q), reverse=True)
        for rank, (_, _, i) in enumerate(scored[:4], start=1):
            assert got[(q, rank)] == i, (q, rank, got[(q, rank)], i)


def test_cc_local_matches_distributed(spark):
    """The round-14 small-regime local union-find must reproduce BOTH
    distributed CC formulations' labels exactly, including each one's
    self-loop contract: min-label propagation keeps a pure-self-loop
    node, big-star drops it (u != v filter).  Chains, stars, dup edges,
    reversed edges, and string ids (code-point == UTF8String binary
    order) all covered."""
    from localsql_spark.operators.dedup import (_cc_local,
                                                connected_components,
                                                connected_components_bigstar)

    edges = [(2, 1), (2, 3), (9, 8), (8, 7), (7, 9), (5, 5), (4, 4),
             (4, 6), (10, 11), (11, 10), (12, 13), (13, 14), (14, 15),
             (15, 16), (16, 17)]  # chain, triangle, self-loops, dup both ways
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    prop = {(r["node"], r["cluster_id"])
            for r in connected_components(df).collect()}
    star = {(r["node"], r["cluster_id"])
            for r in connected_components_bigstar(df).collect()}
    assert set(_cc_local(edges, drop_self_only=False)) == prop
    assert set(_cc_local(edges, drop_self_only=True)) == star
    # string ids: tie-breaks via binary/code-point order must agree
    sedges = [("b", "a"), ("b", "c"), ("é", "z"), ("Z", "é")]
    sdf = spark.createDataFrame(sedges, "doc_a string, doc_b string")
    sprop = {(r["node"], r["cluster_id"])
             for r in connected_components(sdf).collect()}
    assert set(_cc_local(sedges, drop_self_only=False)) == sprop


@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=60))
@settings(max_examples=12, deadline=None)
def test_bigstar_cc_random_graphs_match_propagation(spark, edges):
    """On arbitrary random graphs (self-loops, dups, disconnected nodes),
    star contraction and min-label propagation must produce the identical
    clustering — and both must equal a pure-Python union-find."""
    from localsql_spark.operators.dedup import (connected_components,
                                                connected_components_bigstar)

    real = [e for e in edges if e[0] != e[1]]
    if not real:
        return
    df = spark.createDataFrame(real, "doc_a long, doc_b long")
    star = {(r["node"], r["cluster_id"])
            for r in connected_components_bigstar(df).collect()}
    prop = {(r["node"], r["cluster_id"])
            for r in connected_components(df, max_iter=90).collect()}
    assert star == prop
    # union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in real:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert star == want


def test_countmin_never_underestimates(spark):
    """Count-min property: estimates only ever OVERcount (collisions add)."""
    from localsql_spark.workload import REGISTRY, _ensure_loaded
    from tests.conftest import SF_ORACLE

    _ensure_loaded()
    rows = REGISTRY["sketch_countmin_terms"].fn(spark, SF_ORACLE).collect()
    assert rows, "probe terms must produce estimates"
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r


def test_pii_redact_and_counts(spark):
    from pyspark.sql import functions as F
    from localsql_spark.operators import text as T

    rows = [
        ("a@b.com and c.d@sub.example.org", 2, 0, 0),
        ("call +1-555-0042 or +44-123-4567", 0, 2, 0),
        ("host 10.0.0.1 peer 192.168.1.254", 0, 0, 2),
        ("no pii here at all", 0, 0, 0),
        ("", 0, 0, 0),
        ("mixed a@b.io +1-555-1 10.1.2.3", 1, 0, 1),  # short phone no match
    ]
    df = spark.createDataFrame([(t,) for t, *_ in rows], ["t"])
    got = df.select(
        "t",
        T.pii_count(F.col("t"), "email").alias("e"),
        T.pii_count(F.col("t"), "phone").alias("p"),
        T.pii_count(F.col("t"), "ipv4").alias("i"),
        T.pii_redact(F.col("t")).alias("red")).collect()
    by_text = {r["t"]: r for r in got}
    for t, e, p, i in rows:
        r = by_text[t]
        assert (r["e"], r["p"], r["i"]) == (e, p, i), t
        if e:
            assert "<EMAIL>" in r["red"] and "@" not in r["red"]
        if i:
            assert "<IPV4>" in r["red"]


def test_repetition_signals_edges(spark):
    from pyspark.sql import functions as F
    from localsql_spark.operators import text as T

    df = spark.createDataFrame(
        [("w",), ("a a a a",), ("a b c d",), ("a b a b a",)], ["t"])
    got = {r["t"]: r for r in df.select(
        "t",
        T.distinct_word_ratio(F.col("t")).alias("dr"),
        T.top_word_fraction(F.col("t")).alias("tw"),
        T.dup_ngram_fraction(F.col("t"), 2).alias("dup")).collect()}
    # single word: no bigrams -> dup 0, ratios 1
    assert got["w"]["dr"] == 1.0 and got["w"]["tw"] == 1.0 and got["w"]["dup"] == 0.0
    # all same word: distinct ratio 1/4, top fraction 1, all 3 bigrams dup of first
    assert got["a a a a"]["dr"] == 0.25 and got["a a a a"]["tw"] == 1.0
    assert abs(got["a a a a"]["dup"] - 2 / 3) < 1e-12
    # all distinct
    assert got["a b c d"]["dr"] == 1.0 and got["a b c d"]["tw"] == 0.25
    assert got["a b c d"]["dup"] == 0.0
    # alternating: bigrams [ab, ba, ab, ba] -> 2 dup of 4
    assert abs(got["a b a b a"]["dup"] - 0.5) < 1e-12


def test_train_val_test_split_is_exhaustive_partition(spark):
    """Every doc lands in exactly one split and proportions are ~80/10/10."""
    from localsql_spark.workload import REGISTRY, _ensure_loaded
    _ensure_loaded()
    import tests.conftest as C

    from pyspark.sql import functions as F

    df = REGISTRY["split_train_val_test"].fn(spark, C.SF_ORACLE)
    agg = {r["split"]: r["n"] for r in
           df.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()}
    import duckdb
    total = duckdb.sql(
        f"SELECT count(*) FROM '{C.SF_ORACLE}/documents.parquet'").fetchone()[0]
    assert sum(agg.values()) == total
    assert 0.7 < agg["train"] / total < 0.9
    assert 0.05 < agg["val"] / total < 0.15


def test_bloom_filter_no_false_negatives(spark):
    """Every inserted key must probe positive; FP rate stays near theory."""
    import math
    from localsql_spark.operators import sketches as SK

    members = spark.range(0, 2000).withColumnRenamed("id", "k")
    outsiders = spark.range(1_000_000, 1_004_000).withColumnRenamed("id", "k")
    bits = SK.bloom_build(members, "k")
    assert SK.bloom_probe(bits, members, "k").count() == 2000
    n_bits = bits.count()
    fp = SK.bloom_probe(bits, outsiders, "k").count()
    # expected FP rate = (set_fraction)^K; allow generous slack
    rate_theory = (n_bits / SK.BLOOM_M) ** SK.BLOOM_K
    assert fp / 4000 < max(5 * rate_theory, 0.01)


def test_kmeans_lloyd_matches_numpy_ground_truth(spark):
    """One Lloyd round (seed-assign, mean-update, re-assign) against an
    independent numpy implementation on deterministic vectors."""
    import numpy as np
    from localsql_spark.operators.similarity import kmeans_lloyd

    dim, n, k = 8, 50, 4
    vecs = {i: np.array([((i * 13 + j * 7) % 19) - 9.0 for j in range(dim)])
            for i in range(n)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cluster_id"]
           for r in kmeans_lloyd(df, n_clusters=k, n_iter=1).collect()}

    def assign(cents):
        out = {}
        for i, v in vecs.items():
            d = [(float(np.sum((v - c) ** 2)), cell) for cell, c in cents]
            out[i] = min(d)[1]
        return out

    a0 = assign([(c, vecs[c]) for c in range(k)])
    cents1 = []
    for c in range(k):
        members = [vecs[i] for i, cl in a0.items() if cl == c]
        if members:
            cents1.append((c, np.mean(members, axis=0)))
    a1 = assign(cents1)
    assert got == a1


# -- quantile sketch (bottom-k hash-rank sample) ------------------------------


def test_quantile_sketch_exact_when_input_fits(spark):
    """n <= k: the sketch IS the full dataset, so estimates equal the exact
    discrete quantiles."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.sketches import (quantile_estimates,
                                                   quantile_sketch)

    df = spark.range(0, 1000).select(F.col("id").alias("k"),
                                     F.col("id").cast("double").alias("v"))
    sk = quantile_sketch(df, "v", "k", k=2048)
    est = {r.q: r.estimate for r in quantile_estimates(sk).collect()}
    # with v = 0..999 the value at 1-based index floor(q*999)+1 is floor(q*999)
    for q, e in est.items():
        assert e == float(int(q * 999)), (q, e)


def test_quantile_sketch_rank_accuracy(spark):
    """k=1024 over 50k rows: every estimate's true CDF position lands within
    6% of the requested quantile (stderr ~1.6%; bound leaves ~3.5 sigma,
    correlated-across-q drift included)."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.sketches import (quantile_estimates,
                                                   quantile_sketch)

    n = 50_000
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        # deterministic value uncorrelated with id: md5-derived uniform
        (F.conv(F.substring(F.md5(F.concat(F.lit("v"),
                                           F.col("id").cast("string"))),
                            1, 8), 16, 10).cast("double")
         / F.lit(float(1 << 32))).alias("v"))
    sk = quantile_sketch(df, "v", "k", k=1024)
    for r in quantile_estimates(sk, qs=(0.25, 0.5, 0.75, 0.9)).collect():
        # v is uniform on [0,1): CDF(x) == x
        assert abs(r.estimate - r.q) < 0.06, (r.q, r.estimate)


def test_quantile_sketch_merge_equals_sketch_of_union(spark):
    """Mergeability: bottom-k over the union of two sketches == the sketch
    of the unioned inputs (the property that lets 1000 executors sketch
    independently and a coordinator combine)."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.sketches import quantile_sketch

    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v"))
    k = 256
    whole = quantile_sketch(mk(0, 4000), "v", "k", k=k)
    merged = (quantile_sketch(mk(0, 2000), "v", "k", k=k)
              .unionByName(quantile_sketch(mk(2000, 4000), "v", "k", k=k))
              .orderBy("rk").limit(k))
    assert (sorted((r.v, r.rk) for r in whole.collect())
            == sorted((r.v, r.rk) for r in merged.collect()))


# -- table fingerprint / drift diff -------------------------------------------


def test_fingerprint_diff_empty_for_identical_tables(spark):
    from pyspark.sql import functions as F

    from localsql_spark.operators.fingerprint import (fingerprint_diff,
                                                      table_fingerprint)

    df = spark.range(0, 500).select(F.col("id").alias("k"),
                                    F.md5(F.col("id").cast("string"))
                                    .alias("payload"))
    fa = table_fingerprint(df, "k", F.col("payload"))
    # partition layout must not matter (commutative hash-sum)
    fb = table_fingerprint(df.repartition(7), "k", F.col("payload"))
    assert fingerprint_diff(fa, fb).isEmpty()


def test_fingerprint_diff_localizes_single_row_change(spark):
    from pyspark.sql import functions as F

    from localsql_spark.operators import hash32
    from localsql_spark.operators.fingerprint import (fingerprint_diff,
                                                      table_fingerprint)

    df = spark.range(0, 500).select(F.col("id").alias("k"),
                                    F.md5(F.col("id").cast("string"))
                                    .alias("payload"))
    changed = df.withColumn(
        "payload", F.when(F.col("k") == 123, F.lit("mutated"))
        .otherwise(F.col("payload")))
    diff = fingerprint_diff(table_fingerprint(df, "k", F.col("payload")),
                            table_fingerprint(changed, "k", F.col("payload")))
    rows = diff.collect()
    assert len(rows) == 1, rows
    expected_bucket = spark.range(1).select(
        (hash32(F.lit(123)) % 64).alias("b")).collect()[0].b
    assert rows[0].bucket == expected_bucket
    # a payload change keeps counts equal; only the hash-sum moves
    assert rows[0].n_rows_a == rows[0].n_rows_b
    assert rows[0].hash_a != rows[0].hash_b


def test_fingerprint_diff_reports_missing_bucket_as_zero(spark):
    from pyspark.sql import functions as F

    from localsql_spark.operators.fingerprint import (fingerprint_diff,
                                                      table_fingerprint)

    df = spark.range(0, 100).select(F.col("id").alias("k"),
                                    F.lit("x").alias("payload"))
    fa = table_fingerprint(df, "k", F.col("payload"), buckets=4)
    fb = table_fingerprint(df.filter(F.lit(False)), "k", F.col("payload"),
                           buckets=4)
    rows = fingerprint_diff(fa, fb).collect()
    assert {r.bucket for r in rows} == {0, 1, 2, 3}
    assert all(r.n_rows_b == 0 and r.hash_b == "0" for r in rows)


def test_semdedup_drops_planted_duplicate_keeps_lowest_id(spark):
    """Two identical vectors must land in one cluster and the higher id must
    be pruned; a distant singleton must survive."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import semdedup_prune

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 0.0]),    # exact dup of 0 -> dropped
        (7, [0.9, 0.1, 0.0, 0.0]),    # near 0 (cos ~0.99) -> dropped
        (9, [0.0, 0.0, 1.0, 0.0]),    # far from everything -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semdedup_prune(df, n_clusters=2, threshold=0.95, n_iter=1)
    ids = sorted(r.vec_id for r in kept.collect())
    assert 5 not in ids and 0 in ids
    assert 9 in ids and 1 in ids


def test_semdedup_two_level_drops_planted_duplicates(spark):
    """Hierarchical SemDeDup: planted near-identical vectors are pruned to
    one survivor (lowest id); well-separated vectors all survive."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import semdedup_prune_two_level

    rows = []
    # 4 well-separated axis directions, 5 vectors each: one original plus
    # 4 near-copies (tiny jitter in an off-axis dim -> cosine ~1).  Ids are
    # interleaved (id = 10*j + axis) so the deterministic lowest-id seeds
    # are DIVERSE vectors — seeding k-means from near-duplicate ids would
    # degenerate the clustering (same care a production deployment takes
    # via kmeans||/sampled seeding).
    for axis in range(4):
        for j in range(5):
            v = [0.0] * 8
            v[axis] = 1.0
            v[4 + axis] = 0.001 * j
            rows.append((10 * j + axis, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # k = 4 matches the number of natural groups — more clusters than
    # groups would SPLIT a duplicate group, and SemDeDup (by design) never
    # compares across clusters; sizing k to the expected duplicate-group
    # count is part of the algorithm's contract.
    kept = semdedup_prune_two_level(df, n_clusters=4, n_coarse=2,
                                    threshold=0.99)
    ids = sorted(r.vec_id for r in kept.collect())
    # exactly one survivor per planted group, and it is the group's min id
    assert ids == [0, 1, 2, 3], ids


def test_semdedup_two_level_matches_flat_on_separated_data(spark):
    """When every planted group fits one fine cluster, hierarchical and flat
    SemDeDup keep the same ids (the hierarchy changes cost, not the
    answer, on separable data)."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import (semdedup_prune,
                                                     semdedup_prune_two_level)

    rows = []
    for axis in range(4):
        for j in range(3):
            v = [0.0] * 8
            v[axis] = 1.0
            v[4 + axis] = 0.002 * j
            rows.append((10 * j + axis, v))  # interleaved ids: diverse seeds
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    flat = sorted(r.vec_id for r in
                  semdedup_prune(df, n_clusters=4, threshold=0.99,
                                 n_iter=1).collect())
    two = sorted(r.vec_id for r in
                 semdedup_prune_two_level(df, n_clusters=4, n_coarse=2,
                                          threshold=0.99).collect())
    assert flat == two == [0, 1, 2, 3]


def test_signature_store_roundtrip_matches_recompute(spark, tmp_path):
    """The production store-backed incremental path must equal the
    recompute-from-text path given the store was written over the same
    corpus; appending a batch then probing again must equal one probe
    against corpus+batch (the daily-loop invariant)."""
    from localsql_spark.operators import dedup as D

    rows = [(i, f"alpha beta gamma delta epsilon zeta doc {i % 5} tail "
                f"common words repeated here") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus, new = docs.filter("doc_id % 4 != 0"), docs.filter("doc_id % 4 = 0")

    store = str(tmp_path / "sig_store")
    D.write_signature_store(corpus, store)
    got = sorted(
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
        D.minhash_lsh_pairs_from_store(spark, store, new,
                                       threshold=0.3).collect())
    want = sorted(
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
        D.minhash_lsh_pairs_incremental(corpus, new,
                                        threshold=0.3).collect())
    assert got and got == want

    # day 2: commit the batch, probe with a fresh one
    D.append_signature_store(new, store)
    day2 = docs.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    got2 = sorted(
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
        D.minhash_lsh_pairs_from_store(spark, store, day2,
                                       threshold=0.3).collect())
    want2 = sorted(
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
        D.minhash_lsh_pairs_incremental(docs, day2,
                                        threshold=0.3).collect())
    assert got2 and got2 == want2

    # the store read is narrow: no text column anywhere in the corpus side
    assert D.read_signature_store(spark, store).columns == ["doc_id", "sig"]


def test_semdedup_cluster_cap_skips_mega_cluster_keeps_members(spark):
    """Over-cap clusters skip the quadratic pair block and keep ALL their
    members (conservative: no false drops); normal clusters still prune."""
    from localsql_spark.operators.similarity import semdedup_prune

    rows = [
        # mega-cluster: 8 exact copies near the x axis (ids 0..7)
        *[(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(8)],
        # small cluster on the y axis: 20 and its dup 25
        (20, [0.0, 1.0, 0.0, 0.0]),
        (25, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = semdedup_prune(df, n_clusters=2, threshold=0.95, n_iter=1,
                            cluster_cap=5)
    ids = sorted(r.vec_id for r in capped.collect())
    # mega-cluster (8 > cap 5) kept whole; y-cluster pruned to lowest id
    assert [i for i in ids if i < 8] == list(range(8))
    assert 20 in ids and 25 not in ids

    # cap high enough to bind nothing -> identical to uncapped
    uncapped = sorted(r.vec_id for r in
                      semdedup_prune(df, n_clusters=2, threshold=0.95,
                                     n_iter=1).collect())
    wide = sorted(r.vec_id for r in
                  semdedup_prune(df, n_clusters=2, threshold=0.95,
                                 n_iter=1, cluster_cap=100).collect())
    assert wide == uncapped


def test_semdedup_two_level_cluster_cap(spark):
    """Same cap contract on the IVF-accelerated variant."""
    from localsql_spark.operators.similarity import semdedup_prune_two_level

    rows = [
        *[(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(8)],
        (20, [0.0, 1.0, 0.0, 0.0]),
        (25, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = semdedup_prune_two_level(df, n_clusters=4, n_coarse=2,
                                      threshold=0.95, cluster_cap=5)
    ids = sorted(r.vec_id for r in capped.collect())
    assert [i for i in ids if i < 8] == list(range(8))
    assert 20 in ids and 25 not in ids


def test_semdedup_two_level_full_probe_equals_flat(spark):
    """n_probe = n_coarse makes every vector compare against ALL fine
    centroids, so multi-probe at full width must reproduce the flat
    clustering exactly — even on data that is NOT cleanly separable (random
    vectors), where single-probe boundary effects would differ."""
    import random

    from localsql_spark.operators.similarity import (semdedup_prune,
                                                     semdedup_prune_two_level)

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    flat = sorted((r.vec_id, r.cluster_id) for r in
                  semdedup_prune(df, n_clusters=6, threshold=0.98,
                                 n_iter=1).collect())
    full_probe = sorted((r.vec_id, r.cluster_id) for r in
                        semdedup_prune_two_level(df, n_clusters=6, n_coarse=3,
                                                 threshold=0.98,
                                                 n_probe=3).collect())
    assert flat == full_probe

    # single-probe keeps the output shape and every id appears exactly once
    single = semdedup_prune_two_level(df, n_clusters=6, n_coarse=3,
                                      threshold=0.98, n_probe=1).collect()
    assert sorted(r.vec_id for r in single) == sorted(set(
        r.vec_id for r in single))


def test_semdedup_pair_backends_agree(spark):
    """The GEMM filter-and-verify pair stage must reproduce the join-fold
    backend exactly — same kept (id, cluster) sets on random data for both
    the flat and the two-level operator.  The exact-decimal rescore of GEMM
    candidates is what makes this bit-safe at the threshold boundary."""
    import random

    from localsql_spark.operators.similarity import (semdedup_prune,
                                                     semdedup_prune_two_level)

    rng = random.Random(13)
    # random base vectors plus planted near-duplicate groups so both
    # above- and below-threshold pairs exist in most clusters
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    rows += [(100 + i, [x + 1e-6 * i for x in rows[i][1]]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for kwargs in ({"n_clusters": 5, "threshold": 0.9, "n_iter": 1},
                   {"n_clusters": 5, "threshold": 0.9, "n_iter": 1,
                    "cluster_cap": 20}):
        gemm = sorted((r.vec_id, r.cluster_id) for r in
                      semdedup_prune(df, pair_backend="gemm",
                                     **kwargs).collect())
        join = sorted((r.vec_id, r.cluster_id) for r in
                      semdedup_prune(df, pair_backend="join",
                                     **kwargs).collect())
        assert gemm == join, kwargs

    gemm2 = sorted((r.vec_id, r.cluster_id) for r in
                   semdedup_prune_two_level(df, n_clusters=6, n_coarse=3,
                                            threshold=0.9, n_probe=2,
                                            pair_backend="gemm").collect())
    join2 = sorted((r.vec_id, r.cluster_id) for r in
                   semdedup_prune_two_level(df, n_clusters=6, n_coarse=3,
                                            threshold=0.9, n_probe=2,
                                            pair_backend="join").collect())
    assert gemm2 == join2


def test_signature_store_compaction_preserves_content(spark, tmp_path):
    """Compaction flattens per-batch subdirectories into part-files with
    identical (doc_id, sig) content; probing after compaction gives the
    same pairs."""
    from localsql_spark.operators import dedup as D

    rows = [(i, f"document number {i % 6} with shared phrasing and filler "
                f"words to shingle") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    store = tmp_path / "store"
    store.mkdir()
    # simulate the streaming layout: three per-batch subdirs
    for b in range(3):
        D.compute_signatures(docs.filter(f"doc_id % 3 = {b}")) \
         .write.parquet(str(store / f"batch_{b}"))
    before = sorted((r.doc_id, tuple(r.sig)) for r in
                    D.read_signature_store(spark, str(store)).collect())
    probe = _mk = spark.createDataFrame(
        [(100, rows[0][1])], "doc_id long, text string")
    pairs_before = sorted(
        (r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs_from_store(
            spark, str(store), probe, threshold=0.5).collect())

    n = D.compact_signature_store(spark, str(store))
    assert n == 30
    assert not list(store.glob("batch_*"))          # subdirs gone
    assert list(store.glob("*.parquet"))            # flat files present
    after = sorted((r.doc_id, tuple(r.sig)) for r in
                   D.read_signature_store(spark, str(store)).collect())
    assert after == before
    pairs_after = sorted(
        (r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs_from_store(
            spark, str(store), probe, threshold=0.5).collect())
    assert pairs_after == pairs_before and pairs_before


def test_banded_index_probe_matches_flat_store_and_prunes(spark, tmp_path):
    """The band-partitioned index probe returns exactly the flat-store
    probe's pairs, and its candidate scan carries a PartitionFilters prune
    on the touched bk_prefix values."""
    from pyspark.sql import functions as F

    from localsql_spark.operators import dedup as D

    rows = [(i, f"sentence variant {i % 7} of a corpus with overlapping "
                f"phrases for banding") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.filter("doc_id % 5 != 0")
    new = docs.filter("doc_id % 5 = 0")

    store = str(tmp_path / "sig_store")
    index = str(tmp_path / "band_index")
    D.write_signature_store(corpus, store)
    D.write_banded_index(D.read_signature_store(spark, store), index)

    flat = sorted((r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
                  D.minhash_lsh_pairs_from_store(
                      spark, store, new, threshold=0.3,
                      auto_index=False).collect())
    via_index = D.minhash_lsh_pairs_from_banded_index(
        spark, index, store, new, threshold=0.3)
    got = sorted((r.doc_a, r.doc_b, round(r.est_jaccard, 9))
                 for r in via_index.collect())
    assert got and got == flat

    # the index read must be partition-pruned on bk_prefix
    sig_new = D.compute_signatures(new)
    prefixes = [r[0] for r in
                (D.band_keys(sig_new)
                 .select(F.substring("band_key", 1, 2).alias("p"))
                 .distinct().collect())]
    idx = (spark.read.option("basePath", index).parquet(index)
           .filter(F.col("bk_prefix").isin(prefixes)))
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bk_prefix" in plan


def test_incremental_probe_bucket_cap_drops_hot_bucket_only(spark, tmp_path):
    """A mass-duplicate corpus bucket is excluded from the probe under
    bucket_cap (no candidates generated against it), while normal pairs
    survive — the skew guard on the daily-ingest path."""
    from localsql_spark.operators import dedup as D

    boiler = "identical boilerplate text repeated across the whole corpus"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(20)]
        + [(100, "one unique corpus document with its own words here")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(200, boiler),
         (201, "one unique corpus document with its own words here")],
        "doc_id long, text string")
    store = str(tmp_path / "store")
    D.write_signature_store(corpus, store)
    capped = D.minhash_lsh_pairs_from_store(spark, store, new,
                                            threshold=0.5, bucket_cap=5)
    got = sorted((r.doc_a, r.doc_b) for r in capped.collect())
    assert got == [(100, 201)]  # boilerplate bucket capped away
    uncapped = D.minhash_lsh_pairs_from_store(spark, store, new,
                                              threshold=0.5)
    assert len(uncapped.collect()) >= 21  # 200 pairs with all 20 clones

    # index write-time cap: same exclusion, probe untouched
    index = str(tmp_path / "idx")
    D.write_banded_index(D.read_signature_store(spark, store), index,
                         bucket_cap=5)
    via_idx = sorted((r.doc_a, r.doc_b) for r in
                     D.minhash_lsh_pairs_from_banded_index(
                         spark, index, store, new, threshold=0.5).collect())
    assert (100, 201) in via_idx
    assert not any(b == 200 or a == 200 for a, b in via_idx
                   if a != 200 or b != 200) or all(
        200 not in (a, b) for a, b in via_idx)


def test_ivf_index_probe_matches_inline_and_prunes(spark, tmp_path):
    """knn_ivf_from_index over a persisted index returns exactly what
    knn_ivf computes inline on the same corpus/seeds, and the cell scan is
    partition-pruned."""
    import random

    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import (knn_ivf,
                                                     knn_ivf_from_index,
                                                     write_ivf_index)

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 8")

    inline = sorted(
        (r.query_id, r.neighbor_id, round(r.cos_sim, 9), r.rn)
        for r in knn_ivf(emb, queries, k=5, n_cells=8, n_probe=3).collect())
    index = str(tmp_path / "ivf")
    write_ivf_index(emb, index, n_cells=8)
    got = sorted(
        (r.query_id, r.neighbor_id, round(r.cos_sim, 9), r.rn)
        for r in knn_ivf_from_index(spark, index, queries, k=5,
                                    n_probe=3).collect())
    assert got and got == inline

    # pruned scan: PartitionFilters on cell
    idx = (spark.read.option("basePath", f"{index}/cells")
           .parquet(f"{index}/cells").filter(F.col("cell").isin([0, 1])))
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_grouped_quantile_sketch_merge_equals_sketch_of_union(spark):
    """Per-group mergeability: bottom-k of (sketch(A) union sketch(B))
    within each group equals sketch(A union B) — the property that lets
    per-day grouped sketches roll up without touching raw data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from localsql_spark.operators.sketches import quantile_sketch_by

    def mk(lo, hi):
        return (spark.range(lo, hi)
                .select(F.col("id").alias("k"),
                        (F.col("id") % 3).cast("string").alias("g"),
                        (F.col("id") * 7 % 1000).cast("double").alias("x")))

    a, b = mk(0, 1500), mk(1500, 3000)
    k = 64
    union_sketch = sorted(
        (r.grp, r.rk, r.v) for r in
        quantile_sketch_by(mk(0, 3000), "x", "k", "g", k=k).collect())
    sa = quantile_sketch_by(a, "x", "k", "g", k=k)
    sb = quantile_sketch_by(b, "x", "k", "g", k=k)
    w = Window.partitionBy("grp").orderBy("rk", "v")
    merged = sorted(
        (r.grp, r.rk, r.v) for r in
        (sa.unionByName(sb).withColumn("__rn", F.row_number().over(w))
         .filter(F.col("__rn") <= k).drop("__rn")).collect())
    assert merged == union_sketch and len(union_sketch) == 3 * k


# ---------------------------------------------------------------------------
# Corpus-preparation operators (operators/corpus.py)
# ---------------------------------------------------------------------------

def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_covers_all_tokens_with_overlap(spark):
    """Chunks tile the token stream with the requested stride: chunk i
    starts at i*(chunk-overlap); concatenating each chunk's NON-overlap
    prefix plus the last chunk reconstructs the document."""
    from localsql_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))
    out = (chunk_documents(_docs_df(spark, [(1, text)]),
                           chunk=32, overlap=8)
           .orderBy("chunk_id").collect())
    # n=100, step=24 -> ceil((100-8)/24)=4 chunks
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    # every chunk except the last is full-size; the last covers the tail
    assert [r.n_tok for r in out] == [32, 32, 32, 100 - 3 * 24]
    # short doc: exactly one chunk, nothing dropped
    short = chunk_documents(_docs_df(spark, [(2, "a b c")]),
                            chunk=32, overlap=8).collect()
    assert len(short) == 1 and short[0].n_tok == 3


def test_repeated_spans_flags_cross_doc_span_only(spark):
    """A verbatim 8-token run shared by two docs is reported; a span
    repeated only WITHIN one doc is not (min_docs=2)."""
    from localsql_spark.operators.corpus import repeated_spans

    shared = " ".join(f"s{i}" for i in range(8))
    inner = " ".join(f"r{i}" for i in range(8))
    rows = [(1, f"alpha beta {shared} gamma"),
            (2, f"delta {shared} epsilon zeta"),
            (3, f"{inner} filler one two three four five six {inner}")]
    out = repeated_spans(_docs_df(spark, rows), span=8, min_docs=2).collect()
    assert len(out) >= 1
    docs = {(r.first_doc, r.last_doc) for r in out}
    assert (1, 2) in docs            # the cross-doc span
    assert all(not (r.first_doc == 3 and r.last_doc == 3) for r in out)


def test_unigram_logprob_ranks_common_words_higher(spark):
    """A document of corpus-frequent words outscores one of hapaxes, and
    every logprob is <= 0."""
    from localsql_spark.operators.corpus import unigram_logprob

    rows = [(i, "the cat sat on the mat") for i in range(1, 10)]
    rows.append((100, "zyx qwv jkl pqr"))
    out = {r.doc_id: r.avg_logprob
           for r in unigram_logprob(_docs_df(spark, rows)).collect()}
    assert out[1] > out[100]
    assert all(v <= 0 for v in out.values())


def test_profile_columns_counts_nulls_and_distinct(spark):
    from localsql_spark.operators.corpus import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, s string")
    prof = {r.col_name: r for r in
            profile_columns(df, [("k", "num"), ("s", "str")]).collect()}
    assert prof["k"].n_nulls == 1 and prof["k"].n_distinct == 2
    assert prof["k"].min_num == 1.0 and prof["k"].max_num == 2.0
    assert prof["k"].min_str is None
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_str == "a" and prof["s"].max_str == "b"
    assert prof["s"].min_num is None


def test_hll_set_estimates_disjoint_and_identical(spark):
    """Disjoint groups: union ~ |A|+|B| and intersection ~ 0.  Identical
    groups: union == |A| estimate and intersection == |A| estimate (the
    register tables are equal, so the merge is exact)."""
    from localsql_spark.operators.sketches import hll_set_estimates

    disjoint = spark.createDataFrame(
        [(i, "a") for i in range(500)] + [(i + 10_000, "b")
                                          for i in range(500)],
        "user_id long, grp string")
    r = hll_set_estimates(disjoint, "user_id", "grp", "a", "b").collect()[0]
    assert r.est_union > max(r.est_a, r.est_b) * 1.5
    assert r.est_intersect < 0.15 * r.est_union
    same = spark.createDataFrame(
        [(i, g) for i in range(500) for g in ("a", "b")],
        "user_id long, grp string")
    r2 = hll_set_estimates(same, "user_id", "grp", "a", "b").collect()[0]
    assert r2.est_a == r2.est_b == r2.est_union == r2.est_intersect


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """A 10-word doc verbatim inside a 200-word doc: containment = 1.0 while
    Jaccard is tiny — the asymmetric case the operator exists for."""
    from localsql_spark.operators.dedup import (containment_pairs,
                                                ngram_jaccard_pairs)

    small = " ".join(f"core{i}" for i in range(10))
    big = " ".join(f"pad{i}" for i in range(100)) + " " + small + " " + \
        " ".join(f"tail{i}" for i in range(90))
    df = spark.createDataFrame([(1, small, "en"), (2, big, "en")],
                               "doc_id long, text string, lang string")
    cont = containment_pairs(df, threshold=0.6).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.doc_a, r.doc_b) == (1, 2) and r.containment == 1.0
    jac = ngram_jaccard_pairs(df, threshold=0.2).collect()
    assert jac == []        # symmetric jaccard ~ 8/200 — far below 0.2


def test_temperature_mix_thresholds_and_determinism(spark):
    """alpha=0.5 with sources of 100 vs 400 docs: the small source keeps
    everything (thr=1e6), the large keeps ~sqrt(1/4)=50% (thr=500000), and
    the kept set is identical across invocations (hash-mod, no RNG)."""
    from localsql_spark.operators.corpus import temperature_mix

    rows = [(i, "s") for i in range(100)] + [(1000 + i, "b")
                                             for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, alpha=0.5).collect()
    thr = {r.source: r.thr for r in out}
    assert thr["s"] == 1_000_000 and thr["b"] == 500_000
    kept_s = [r.doc_id for r in out if r.source == "s"]
    assert len(kept_s) == 100        # smallest source fully kept
    kept_b = sorted(r.doc_id for r in out if r.source == "b")
    assert 100 < len(kept_b) < 300   # ~50% of 400, hash-mod variance
    again = sorted(r.doc_id for r in temperature_mix(df, alpha=0.5).collect()
                   if r.source == "b")
    assert kept_b == again


def test_pq_adc_recovers_planted_clusters(spark):
    """PQ pipeline end-to-end: 4 well-separated prototype clusters, noisy
    copies; ADC top-3 for a query must come from the query's own cluster,
    codes must be one-per-(vector, subspace), and encoding must be
    deterministic across invocations."""
    from localsql_spark.operators.similarity import (knn_pq_adc, pq_encode,
                                                     pq_train)

    dim, per = 8, 10
    protos = [[10.0 if d // 2 == c else 0.0 for d in range(dim)]
              for c in range(4)]
    rows = []
    for c, p in enumerate(protos):
        for i in range(per):
            noise = [((c * per + i) * 7 + d) % 5 * 0.01 for d in range(dim)]
            rows.append((c * per + i, [p[d] + noise[d] for d in range(dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    queries = df.filter((df.vec_id % per) == 0)  # one per cluster
    top = knn_pq_adc(df, queries, k=3, m=2, k_codes=4, n_iter=1,
                     exclude_self=True)
    for r in top.collect():
        assert r.neighbor_id // per == r.query_id // per, r

    books = pq_train(df, m=2, k_codes=4, n_iter=1)
    codes1 = sorted((r.vec_id, r.s, r.code)
                    for r in pq_encode(df, books, m=2).collect())
    codes2 = sorted((r.vec_id, r.s, r.code)
                    for r in pq_encode(df, books, m=2).collect())
    assert codes1 == codes2
    assert len(codes1) == 40 * 2                  # one code per (vec, s)
    assert books.count() <= 2 * 4                 # m x k_codes model rows


def test_bpe_train_reference_example(spark):
    """The classic Sennrich worked example: merges must come out
    (e,s) -> (es,t) -> then the tie between (l,o) and (o,w) at 7 breaks
    lexicographically; counts exact; determinism across invocations."""
    from localsql_spark.operators.corpus import bpe_train

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    merges = bpe_train(df, n_merges=3)
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("l", "o", 7)
    assert bpe_train(df, n_merges=3) == merges


def test_bpe_local_matches_distributed(spark):
    """The round-14 small-regime local trainer must reproduce the
    distributed loop's merges EXACTLY — pick order, tie-breaks, merge
    application, counts — on adversarial vocabulary: '|' inside
    symbols (the separator-collision trap), exact count ties broken by
    the 'a|b' string then a, repeated-char runs (leftmost
    non-overlapping rewrite), multi-byte code points (UTF-8 binary
    order == code-point order), and a stop-rule tail of singletons."""
    from localsql_spark.operators.corpus import (_bpe_train_distributed,
                                                 _bpe_train_local,
                                                 word_frequencies)

    words = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
             + ["aaaa"] * 4 + ["a|b"] * 4 + ["ab"] * 2
             + ["héllo"] * 3 + ["héro"] * 3 + ["你好"] * 5
             + ["zz"] * 1 + ["qx"] * 1)
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    wf = word_frequencies(df)
    collected = [(r["word"], r["cnt"]) for r in wf.collect()]
    for n_merges in (3, 8, 40):
        dist = _bpe_train_distributed(wf, n_merges)
        loc = _bpe_train_local(collected, n_merges)
        assert loc == dist, (n_merges, loc, dist)


def test_bpe_pair_counts_separator_in_token_no_collision(spark):
    """Symbols containing the display separator '|' must not collide:
    ('x|','y') and ('x','|y') are distinct pairs and each keeps its own
    count (struct-keyed aggregation), and the argmax decode returns the
    exact symbols, never a re-split of the display string."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.corpus import bpe_pair_counts

    syms = spark.createDataFrame(
        [("w1", 3, ["x|", "y"]), ("w2", 2, ["x", "|y"])],
        "word string, cnt long, syms array<string>")
    rows = {(r["a"], r["b"]): r["n"]
            for r in bpe_pair_counts(syms).collect()}
    assert rows == {("x|", "y"): 3, ("x", "|y"): 2}
    top = (bpe_pair_counts(syms)
           .orderBy(F.col("n").desc(), F.col("pair"), F.col("a"))
           .limit(1).collect())[0]
    assert (top["a"], top["b"]) == ("x|", "y")


def test_bpe_apply_merge_leftmost_nonoverlapping(spark):
    """'aaaa' under (a,a) must become [aa, aa]; 'aaa' -> [aa, a] — the
    leftmost-non-overlapping order the reference algorithm specifies."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.corpus import _apply_merge, _chars

    df = spark.createDataFrame([("aaaa",), ("aaa",), ("bab",)],
                               "w string")
    out = {r["w"]: r["m"] for r in df.select(
        "w", _apply_merge(_chars(F.col("w")), "a", "a").alias("m")
    ).collect()}
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]
    assert out["bab"] == ["b", "a", "b"]


def test_bpe_encode_compresses_with_merges(spark):
    from localsql_spark.operators.corpus import bpe_encode

    df = spark.createDataFrame([(1, "the then there and an")],
                               "doc_id long, text string")
    [r0] = bpe_encode(df, []).collect()
    [r1] = bpe_encode(df, [("t", "h", 0), ("th", "e", 0),
                           ("a", "n", 0)]).collect()
    assert r0["n_tokens_ws"] == r1["n_tokens_ws"] == 5
    # chars: the(3)+then(4)+there(5)+and(3)+an(2) = 17
    assert r0["n_bpe_symbols"] == 17
    # the->[the] 1, then->[the,n] 2, there->[the,r,e] 3, and->[an,d] 2,
    # an->[an] 1  => 9
    assert r1["n_bpe_symbols"] == 9


def test_table_diff_classifies_and_nullsafe(spark):
    """added/removed/changed classification; null-safe compare: null->null
    is NOT a change, null->value and value->null ARE; identical rows and
    key-order perturbation produce no diff rows."""
    from localsql_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, None), (4, 40.0, "d")],
        "k int, v double, s string")
    new = spark.createDataFrame(
        [(4, 40.0, "d"), (1, 10.0, "a2"), (2, None, "b"), (5, 50.0, None)],
        "k int, v double, s string")
    out = {r["k"]: (r["change"], tuple(r["changed_cols"]))
           for r in table_diff(old, new, ["k"]).collect()}
    assert out == {
        1: ("changed", ("s",)),        # a -> a2
        3: ("removed", ()),
        5: ("added", ()),
    }                                   # 2: null v == null v -> no row
    # value -> null IS a change
    new2 = spark.createDataFrame([(1, None, "a")], "k int, v double, s string")
    [r] = table_diff(old.filter("k = 1"), new2, ["k"]).collect()
    assert (r["change"], list(r["changed_cols"])) == ("changed", ["v"])


def test_table_diff_compare_cols_subset(spark):
    from localsql_spark.operators.diff import table_diff

    old = spark.createDataFrame([(1, 1.0, "x")], "k int, v double, s string")
    new = spark.createDataFrame([(1, 1.0, "y")], "k int, v double, s string")
    assert table_diff(old, new, ["k"], ["v"]).count() == 0  # s not compared


def test_scd2_lifecycle_two_batches(spark):
    """init -> change -> change-back across two batches: three versions
    for the churning key, correct interval chaining, as-of reads see the
    right version at every timestamp, no-op updates do not version."""
    from localsql_spark.operators.scd2 import scd2_apply, scd2_as_of, scd2_init

    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, seg string")
    h0 = scd2_init(dim, ["k"], ["seg"], 100)
    # batch 1: k=1 changes, k=2 no-op, k=3 new
    u1 = spark.createDataFrame([(1, "a2"), (2, "b"), (3, "c")],
                               "k int, seg string")
    h1 = scd2_apply(h0, u1, ["k"], ["seg"], 200)
    # batch 2: k=1 changes BACK to original value
    u2 = spark.createDataFrame([(1, "a")], "k int, seg string")
    h2 = scd2_apply(h1, u2, ["k"], ["seg"], 300)

    rows = {(r["k"], r["seg"], r["valid_from_us"], r["valid_to_us"])
            for r in h2.collect()}
    assert rows == {
        (1, "a", 100, 200), (1, "a2", 200, 300), (1, "a", 300, None),
        (2, "b", 100, None),
        (3, "c", 200, None),
    }
    assert {(r["k"], r["seg"]) for r in scd2_as_of(h2, 150).collect()} == {
        (1, "a"), (2, "b")}
    assert {(r["k"], r["seg"]) for r in scd2_as_of(h2, 250).collect()} == {
        (1, "a2"), (2, "b"), (3, "c")}
    assert {(r["k"], r["seg"]) for r in scd2_as_of(h2, 300).collect()} == {
        (1, "a"), (2, "b"), (3, "c")}   # boundary: valid_from inclusive


def test_scd2_nullsafe_attr_compare(spark):
    """null -> null is a no-op; null -> value versions; value -> null
    versions."""
    from localsql_spark.operators.scd2 import scd2_apply, scd2_init

    dim = spark.createDataFrame([(1, None), (2, "x")], "k int, seg string")
    h0 = scd2_init(dim, ["k"], ["seg"], 10)
    u = spark.createDataFrame([(1, None), (2, None)], "k int, seg string")
    h1 = scd2_apply(h0, u, ["k"], ["seg"], 20)
    rows = {(r["k"], r["seg"], r["valid_from_us"], r["valid_to_us"])
            for r in h1.collect()}
    assert rows == {
        (1, None, 10, None),             # no-op
        (2, "x", 10, 20), (2, None, 20, None),
    }


def test_pagerank_hand_computed_with_dangling(spark):
    """A -> B (B dangling), d=0.85, 1 iteration:
    r0 = (.5, .5); dangling = .5
    rA = .075 + .85*(0 + .25)  = .2875
    rB = .075 + .85*(.5 + .25) = .7125
    and total rank mass stays 1.0 every iteration."""
    from localsql_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("A", "B", 1.0)], "src string, dst string, w double")
    out = {r["node"]: r["rank"]
           for r in pagerank(edges, n_iter=1).collect()}
    assert abs(out["A"] - 0.2875) < 1e-12
    assert abs(out["B"] - 0.7125) < 1e-12
    for it in (2, 5):
        total = sum(r["rank"] for r in pagerank(edges, n_iter=it).collect())
        assert abs(total - 1.0) < 1e-9


def test_pagerank_symmetric_cycle_is_uniform(spark):
    from localsql_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("A", "B", 2.0), ("B", "C", 2.0), ("C", "A", 2.0)],
        "src string, dst string, w double")
    out = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=8).collect()}
    for v in out.values():
        assert abs(v - 1 / 3) < 1e-9


def test_equidepth_histogram_balances_and_covers(spark):
    """k >= n makes the sketch the full sample, so buckets are exactly
    equi-depth (±1 on boundaries); counts cover every non-null row and
    bucket ranges tile the domain in order."""
    from localsql_spark.operators.sketches import equidepth_histogram

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000)
        .cast("double").alias("v"))
    out = sorted((r["bucket"], r["n"], r["min_v"], r["max_v"])
                 for r in equidepth_histogram(df, "v", "k", n_buckets=8,
                                              k=2048).collect())
    assert [b for b, *_ in out] == list(range(8))
    assert sum(n for _, n, *_ in out) == 1000
    assert max(n for _, n, *_ in out) - min(n for _, n, *_ in out) <= 2
    for (_, _, _, hi), (_, _, lo2, _) in zip(out, out[1:]):
        assert hi < lo2                        # buckets tile, no overlap


def test_pq_rerank_with_full_shortlist_is_exact(spark):
    """shortlist >= corpus makes the ADC cut a no-op, so the re-rank must
    reproduce exact cosine brute force bit-for-bit (same neighbors, same
    cos_sim, same ranks)."""
    import math
    import random

    from localsql_spark.operators.similarity import (knn_brute_force,
                                                     knn_pq_rerank)

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 4")
    exact = {(r.query_id, r.neighbor_id, r.cos_sim)
             for r in knn_brute_force(df, q, k=5).collect()}
    rr = {(r.query_id, r.neighbor_id, r.cos_sim)
          for r in knn_pq_rerank(df, q, k=5, shortlist=40, m=4,
                                 k_codes=8, exclude_self=True).collect()}
    assert rr == exact


def test_scd2_enrich_asof_picks_right_version(spark):
    from localsql_spark.operators.scd2 import (scd2_apply, scd2_enrich_asof,
                                               scd2_init)

    dim = spark.createDataFrame([(1, "old")], "k int, seg string")
    h = scd2_apply(scd2_init(dim, ["k"], ["seg"], 100),
                   spark.createDataFrame([(1, "new")], "k int, seg string"),
                   ["k"], ["seg"], 200)
    facts = spark.createDataFrame(
        [(10, 1, 150), (11, 1, 200), (12, 1, 250), (13, 2, 150), (14, 1, 50)],
        "fid int, k int, ts long")
    out = {r["fid"]: r["seg"]
           for r in scd2_enrich_asof(facts, h, ["k"], "ts").collect()}
    assert out == {10: "old", 11: "new", 12: "new",
                   13: None,   # unknown key -> left join null
                   14: None}   # before any version existed


def test_pagerank_local_matches_distributed(spark):
    """The round-14 small-regime driver-side PageRank must agree with
    the distributed loop at (beyond) the consumers' 6-decimal output
    rounding, on a graph with dangling mass, a hub, multi-edges folded
    to weights, and an isolated-destination node; and the rank total
    must stay 1 each iteration."""
    from localsql_spark.operators.graph import _pagerank_local, pagerank

    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
             ("c", "a", 1.0), ("c", "d", 5.0), ("e", "a", 2.0),
             ("b", "d", 1.0)]  # d dangles; e is a pure source
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    for it in (1, 4, 6):
        dist = {r["node"]: r["rank"]
                for r in pagerank(df, n_iter=it).collect()}
        loc = dict(_pagerank_local(edges, 0.85, it))
        assert set(dist) == set(loc)
        assert max(abs(dist[v] - loc[v]) for v in dist) < 1e-12
        assert abs(sum(loc.values()) - 1.0) < 1e-9


def test_pagerank_salted_matches_plain_to_float_noise(spark):
    """Salting only changes float sum ORDER: ranks must agree to ~1 ulp
    with the unsalted path on a graph with a genuine hot hub."""
    from localsql_spark.operators.graph import pagerank

    edges = []
    for i in range(1, 60):
        edges.append((f"n{i}", "hub", 1.0))
        edges.append(("hub", f"n{i}", 1.0))
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    plain = {r["node"]: r["rank"] for r in pagerank(df, n_iter=4).collect()}
    salted = {r["node"]: r["rank"]
              for r in pagerank(df, n_iter=4, n_salts=8).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-12


def test_kmeans_parallel_init_deterministic_and_bounded(spark):
    """kmeans|| init returns exactly k dense-numbered centroids, is
    deterministic across invocations, and raises on a corpus smaller
    than k."""
    import pytest

    from localsql_spark.operators.similarity import kmeans_parallel_init

    rows = [(i + 1000, [float((i * 7 + d) % 13) for d in range(8)])
            for i in range(40)]  # ids NOT starting at 0 — rank seeding
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = sorted((r["cell"], tuple(r["cent"])) for r in
                kmeans_parallel_init(df, n_clusters=4).collect())
    c2 = sorted((r["cell"], tuple(r["cent"])) for r in
                kmeans_parallel_init(df, n_clusters=4).collect())
    assert c1 == c2
    assert [c for c, _ in c1] == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="needs >="):
        kmeans_parallel_init(df.limit(2), n_clusters=4)


def test_knn_ivf_trained_centroids_same_contract(spark):
    """knn_ivf with trained centroids keeps the output contract (k rows
    per query, ranked by cosine desc) and full-probe equals brute force."""
    import random

    from localsql_spark.operators.similarity import (kmeans_assign,
                                                     kmeans_parallel_init,
                                                     kmeans_update,
                                                     knn_brute_force, knn_ivf)

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 3")
    cents = kmeans_parallel_init(df, n_clusters=4)
    assign = kmeans_assign(df, cents)
    cents = kmeans_update(df, assign)
    cents = spark.createDataFrame(cents.collect(), schema=cents.schema)
    got = knn_ivf(df, q, k=5, n_cells=4, n_probe=4, centroids=cents)
    exact = {(r.query_id, r.neighbor_id, r.cos_sim)
             for r in knn_brute_force(df, q, k=5).collect()}
    assert {(r.query_id, r.neighbor_id, r.cos_sim)
            for r in got.collect()} == exact


def test_ivf_index_append_visible_and_replay_idempotent(spark, tmp_path):
    """Appended deltas are visible to probes BEFORE compaction, a
    replayed append changes nothing, and compaction folds the deltas
    into the base layout with identical probe results."""
    import random

    from localsql_spark.operators.similarity import (append_ivf_index,
                                                     compact_ivf_index,
                                                     knn_ivf_from_index,
                                                     write_ivf_index)

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = df.filter("vec_id < 60")
    delta = df.filter("vec_id >= 60")
    q = df.filter("vec_id < 3")
    idx = str(tmp_path / "ivf")
    write_ivf_index(base, idx, n_cells=4)

    def probe():
        return sorted((r.query_id, r.neighbor_id, r.cos_sim, r.rn)
                      for r in knn_ivf_from_index(
                          spark, idx, q, k=5, n_probe=4).collect())

    before = probe()
    assert append_ivf_index(spark, idx, delta, batch_id=1) == 20
    with_delta = probe()
    assert with_delta != before  # new vectors reachable pre-compaction
    assert {n for _, n, _, _ in with_delta} & set(range(60, 80))
    append_ivf_index(spark, idx, delta, batch_id=1)  # replay: same dir
    assert probe() == with_delta
    assert compact_ivf_index(spark, idx) == 1
    assert not list((tmp_path / "ivf" / "delta").glob("batch_*"))
    assert probe() == with_delta
    assert compact_ivf_index(spark, idx) == 0  # nothing left to fold


def test_ivf_compaction_crash_before_cleanup_never_double_counts(
        spark, tmp_path):
    """compact_ivf_index commits via one rename to cells_upto_<B>; a crash
    after the commit but before cleanup leaves the old base AND already-
    folded delta dirs on disk.  Readers must resolve the new base by name
    and ignore deltas with id <= B — identical probe results, no duplicate
    neighbors — and the next compaction run sweeps the leftovers."""
    import random
    import shutil

    from localsql_spark.operators.similarity import (append_ivf_index,
                                                     compact_ivf_index,
                                                     knn_ivf_from_index,
                                                     write_ivf_index)

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivf")
    p = tmp_path / "ivf"
    write_ivf_index(df.filter("vec_id < 60"), idx, n_cells=4)
    append_ivf_index(spark, idx, df.filter("vec_id >= 60"), batch_id=1)
    q = df.filter("vec_id < 3")

    def probe():
        return sorted((r.query_id, r.neighbor_id, r.cos_sim, r.rn)
                      for r in knn_ivf_from_index(
                          spark, idx, q, k=5, n_probe=4).collect())

    expected = probe()
    # snapshot the pre-compaction dirs that a crash would leave behind
    shutil.copytree(p / "cells", tmp_path / "cells_bak")
    shutil.copytree(p / "delta" / "batch_1", tmp_path / "delta_bak")
    assert compact_ivf_index(spark, idx) == 1
    assert (p / "cells_upto_1").exists()

    # simulate crash-before-cleanup: old base and folded delta reappear
    shutil.copytree(tmp_path / "cells_bak", p / "cells")
    shutil.copytree(tmp_path / "delta_bak", p / "delta" / "batch_1")
    got = probe()
    assert got == expected  # no double-counted vectors, same neighbors
    assert len(got) == len({(qid, n) for qid, n, _, _ in got})

    # next maintenance run: nothing to fold, leftovers swept
    assert compact_ivf_index(spark, idx) == 0
    assert not (p / "cells").exists()
    assert not (p / "delta" / "batch_1").exists()
    assert probe() == expected

    # a fresh append after compaction folds into the NEXT generation,
    # which supersedes cells_upto_1 by name
    extra = spark.createDataFrame(
        [(100, [1.0] * 16)], "vec_id long, embedding array<float>")
    append_ivf_index(spark, idx, extra, batch_id=2)
    assert compact_ivf_index(spark, idx) == 1
    assert (p / "cells_upto_2").exists()
    assert not (p / "cells_upto_1").exists()


def test_remove_repeated_spans_excises_only_shared_windows(spark):
    """Tokens covered by a cross-document 8-token window are removed;
    unique content survives untouched; a doc with no shared spans is
    byte-identical."""
    from localsql_spark.operators.corpus import remove_repeated_spans

    boiler = ("copyright notice all rights reserved do not distribute "
              "this text")  # 10 tokens
    rows = [(1, boiler + " unique alpha beta gamma words here"),
            (2, "other document content " + boiler),
            (3, "totally unique document with no duplication at all here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_repeated_spans(df, span=8).collect()}
    assert (got[1]["n_tokens_before"], got[1]["n_tokens_after"]) == (16, 6)
    assert (got[2]["n_tokens_before"], got[2]["n_tokens_after"]) == (13, 3)
    assert got[3]["n_tokens_before"] == got[3]["n_tokens_after"] == 9
    import hashlib
    assert got[3]["cleaned_hash"] == hashlib.md5(
        rows[2][1].encode()).hexdigest()
    assert got[1]["cleaned_hash"] == hashlib.md5(
        b"unique alpha beta gamma words here").hexdigest()


def test_remove_repeated_spans_boilerplate_heavy_doc(spark):
    """The pathological |covered| ~ T case the interval-merge rebuild
    exists for: a document that is ~all duplicated substring (a repeated
    shared phrase) plus a unique tail.  The merged-interval gap
    complement must excise exactly the covered prefix and keep the tail —
    and a Python reference implementation of the window-coverage rule
    agrees token for token."""
    import hashlib

    from localsql_spark.operators.corpus import remove_repeated_spans

    phrase = "the shared boilerplate phrase repeats here again now"  # 8 toks
    body = " ".join([phrase] * 200)  # 1600 tokens, fully covered
    tail = "entirely unique closing sentence zeta eta theta iota"
    rows = [(1, body + " " + tail), (2, phrase + " different suffix words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           remove_repeated_spans(df, span=8).collect()}

    # python reference: covered = union of [p, p+7] over shared 8-gram
    # window starts; doc 1 shares every window inside the repeated body
    def ref_clean(text, shared_windows):
        toks = text.split()
        covered = set()
        for p in range(max(0, len(toks) - 7)):
            if " ".join(toks[p:p + 8]) in shared_windows:
                covered.update(range(p, p + 8))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        return len(toks), len(kept), hashlib.md5(
            " ".join(kept).encode()).hexdigest()

    all_windows = []
    for _, text in rows:
        toks = text.split()
        all_windows.append({" ".join(toks[p:p + 8])
                            for p in range(max(0, len(toks) - 7))})
    shared = all_windows[0] & all_windows[1]
    for doc_id, text in rows:
        nb, na, h = ref_clean(text, shared)
        assert got[doc_id]["n_tokens_before"] == nb
        assert got[doc_id]["n_tokens_after"] == na
        assert got[doc_id]["cleaned_hash"] == h
    assert got[1]["n_tokens_after"] == 8  # only the unique tail survives


def test_from_store_auto_index_builds_appends_and_prunes(spark, tmp_path):
    """minhash_lsh_pairs_from_store's default path maintains the band-
    partitioned sidecar index automatically: first probe builds it, a
    store append syncs incrementally ('appended' — only the new files are
    banded), a store compaction forces one rebuild, and every probe's
    results equal the flat scan (auto_index=False)."""
    from localsql_spark.operators import dedup as D

    rows = [(i, f"sentence variant {i % 7} of a corpus with overlapping "
                f"phrases for banding") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.filter("doc_id % 5 != 0 and doc_id < 40")
    day2 = docs.filter("doc_id % 5 != 0 and doc_id >= 40")
    new = docs.filter("doc_id % 5 = 0")
    store = str(tmp_path / "sig_store")
    D.write_signature_store(corpus, store)

    def flat():
        return sorted((r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
                      D.minhash_lsh_pairs_from_store(
                          spark, store, new, threshold=0.3,
                          auto_index=False).collect())

    def auto():
        return sorted((r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
                      D.minhash_lsh_pairs_from_store(
                          spark, store, new, threshold=0.3).collect())

    got = auto()
    assert got and got == flat()
    sidecar = tmp_path / "sig_store_banded"
    assert sidecar.exists() and (sidecar / "_meta.json").exists()
    assert any(sidecar.glob("bk_prefix=*"))
    # second probe finds the index fresh — no rewrite
    assert D.ensure_banded_index(spark, store, str(sidecar)) == "fresh"

    # daily append: only the added files are banded
    D.append_signature_store(day2, store)
    assert D.ensure_banded_index(spark, store, str(sidecar)) == "appended"
    assert auto() == flat()

    # store compaction rewrites files -> one full index rebuild
    D.compact_signature_store(spark, store)
    assert D.ensure_banded_index(spark, store, str(sidecar)) == "rebuilt"
    assert auto() == flat()


def test_index_maintenance_lock_contention_and_staleness(spark, tmp_path):
    """Index maintenance is single-writer behind an advisory lock: a held
    lock makes the auto-index probe fall back to the flat scan for that
    call (correct rows, no index write), an abandoned (stale) lock is
    broken, and the lock never survives a completed maintenance run."""
    import os
    import time

    from localsql_spark.operators import dedup as D

    rows = [(i, f"sentence variant {i % 7} of a corpus with overlapping "
                f"phrases for banding") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.filter("doc_id % 5 != 0")
    new = docs.filter("doc_id % 5 = 0")
    store = str(tmp_path / "sig_store")
    D.write_signature_store(corpus, store)
    sidecar = tmp_path / "sig_store_banded"
    lock = tmp_path / "sig_store_banded.lock"

    def flat():
        return sorted((r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
                      D.minhash_lsh_pairs_from_store(
                          spark, store, new, threshold=0.3,
                          auto_index=False).collect())

    # a concurrent maintainer holds the lock: probe still answers (flat
    # path), does NOT build the index, and leaves the lock alone
    lock.write_text("pid=held\n")
    got = sorted((r.doc_a, r.doc_b, round(r.est_jaccard, 9)) for r in
                 D.minhash_lsh_pairs_from_store(
                     spark, store, new, threshold=0.3).collect())
    assert got and got == flat()
    assert not (sidecar / "_meta.json").exists()
    assert lock.exists()
    import pytest

    with pytest.raises(D.IndexMaintenanceBusy):
        D.ensure_banded_index(spark, store, str(sidecar))

    # an abandoned lock (older than the staleness horizon) is broken
    old = time.time() - D._INDEX_LOCK_STALE_S - 60
    os.utime(lock, (old, old))
    assert D.ensure_banded_index(spark, store, str(sidecar)) == "rebuilt"
    assert not lock.exists()  # released after the completed run
    assert (sidecar / "_meta.json").exists()
    assert D.ensure_banded_index(spark, store, str(sidecar)) == "fresh"


def test_stale_lock_break_is_single_winner(tmp_path):
    """The stale-lock break is serialized and re-verified: a second
    breaker that already observed staleness can never unlink the first
    breaker's FRESH lock (r9-verdict TOCTOU — both used to unlink, both
    used to acquire).  Exactly one of two concurrent stale-breakers
    acquires."""
    import os
    import threading
    import time
    from pathlib import Path

    import pytest

    from localsql_spark.operators import dedup as D

    idx = str(tmp_path / "idx")
    lock = Path(idx + ".lock")
    brk = Path(idx + ".lock.break")
    stale_t = time.time() - D._INDEX_LOCK_STALE_S - 60

    # deterministic interleaving: breaker 1 broke the stale lock and now
    # HOLDS a fresh one; breaker 2 (who also observed the stale lock)
    # then runs its break step — the fresh lock must survive, and
    # breaker 2's acquisition must fail Busy
    lock.write_text("pid=crashed\n")
    os.utime(lock, (stale_t, stale_t))
    with D._index_lock(idx):  # breaker 1: breaks + acquires
        assert lock.exists() and not brk.exists()
        D._break_stale_lock(lock, brk)  # breaker 2's break step
        assert lock.exists(), "second breaker unlinked the fresh lock"
        with pytest.raises(D.IndexMaintenanceBusy):
            with D._index_lock(idx):
                pass
    assert not lock.exists()

    # a breaker mid-break (its .break mutex held, fresh) blocks other
    # breakers: they fall through to the ordinary create path -> Busy
    lock.write_text("pid=crashed\n")
    os.utime(lock, (stale_t, stale_t))
    brk.write_text("pid=breaking\n")
    with pytest.raises(D.IndexMaintenanceBusy):
        with D._index_lock(idx):
            pass
    assert lock.exists()
    # an ABANDONED .break file (crashed breaker) is cleared and the
    # break proceeds
    os.utime(brk, (stale_t, stale_t))
    with D._index_lock(idx):
        pass
    assert not lock.exists() and not brk.exists()

    # thread race: N breakers hit the same stale lock; at most one holds
    # at any instant, and at least one acquires
    lock.write_text("pid=crashed\n")
    os.utime(lock, (stale_t, stale_t))
    holders, peak, acquired = [0], [0], [0]
    gate = threading.Barrier(8)
    mu = threading.Lock()

    def contend():
        gate.wait()
        try:
            with D._index_lock(idx):
                with mu:
                    holders[0] += 1
                    peak[0] = max(peak[0], holders[0])
                    acquired[0] += 1
                time.sleep(0.02)
                with mu:
                    holders[0] -= 1
        except D.IndexMaintenanceBusy:
            pass

    ts = [threading.Thread(target=contend) for _ in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert peak[0] == 1 and acquired[0] >= 1


def test_erase_locks_meta_less_index_dir(spark, tmp_path):
    """erase_from_signature_store takes the maintenance lock whenever the
    index DIRECTORY exists — not only when _meta.json does — so an erase
    cannot run unlocked under a builder mid-rebuild (advisor r9)."""
    import pytest

    from localsql_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"body text {i % 5} shared phrasing") for i in range(20)],
        "doc_id long, text string")
    store = str(tmp_path / "sigs")
    D.write_signature_store(docs, store)
    idx = tmp_path / "sigs_banded"
    idx.mkdir()  # builder created the dir; no _meta.json yet
    (tmp_path / "sigs_banded.lock").write_text("pid=builder\n")
    with pytest.raises(D.IndexMaintenanceBusy):
        D.erase_from_signature_store(
            spark, store, spark.createDataFrame([(1,)], "doc_id long"))
    # store untouched: the erasure was refused, not half-applied
    assert spark.read.parquet(store).filter("doc_id = 1").count() == 1


def test_index_meta_records_bucket_cap_and_append_honors_it(spark,
                                                            tmp_path):
    """The sidecar meta records the bucket_cap the index was built with:
    the append path passes the SAME cap through (no silent cap loss), and
    a cap change forces a rebuild instead of serving a mismatched index."""
    import json

    from localsql_spark.operators import dedup as D

    rows = [(i, "identical hot bucket text shared by every document")
            for i in range(30)] + [
        (100 + i, f"cold unique text number {i} with its own phrasing")
        for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    store = str(tmp_path / "sig_store")
    D.write_signature_store(docs, store)
    idx = tmp_path / "idx"

    assert D.ensure_banded_index(spark, store, str(idx),
                                 bucket_cap=5) == "rebuilt"
    meta = json.loads((idx / "_meta.json").read_text())
    assert meta["bucket_cap"] == 5
    # every hot bucket (30 identical docs) is dropped at cap 5
    banded = spark.read.parquet(str(idx))
    hot = (banded.groupBy("band_id", "band_key").count()
           .filter("count > 5").count())
    assert hot == 0

    # append under the SAME cap: incremental, and the appended batch is
    # capped too (29 more identical docs would otherwise land a >5 bucket)
    more = spark.createDataFrame(
        [(200 + i, "another identical appended hot bucket text")
         for i in range(29)], "doc_id long, text string")
    D.append_signature_store(more, store)
    assert D.ensure_banded_index(spark, store, str(idx),
                                 bucket_cap=5) == "appended"
    banded = spark.read.parquet(str(idx))
    assert (banded.groupBy("band_id", "band_key").count()
            .filter("count > 5").count()) == 0
    # a different cap cannot serve from this index: full rebuild
    assert D.ensure_banded_index(spark, store, str(idx),
                                 bucket_cap=None) == "rebuilt"
    meta = json.loads((idx / "_meta.json").read_text())
    assert meta["bucket_cap"] is None


def test_index_detects_same_size_in_place_rewrite(spark, tmp_path):
    """A store part-file rewritten in place with the same name AND size
    (non-Spark writer, copy-restore) still invalidates the index: the
    listing fingerprint includes mtime_ns, so the freshness probe sees a
    change and rebuilds instead of serving stale pruned candidates."""
    import os

    from localsql_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"document body {i % 4} shared phrasing") for i in range(20)],
        "doc_id long, text string")
    store = str(tmp_path / "sig_store")
    D.write_signature_store(docs, store)
    idx = tmp_path / "idx"
    assert D.ensure_banded_index(spark, store, str(idx)) == "rebuilt"
    assert D.ensure_banded_index(spark, store, str(idx)) == "fresh"

    part = next(p for p in __import__("pathlib").Path(store).rglob(
        "*.parquet"))
    payload = part.read_bytes()
    part.write_bytes(payload)  # same name, same size, new mtime
    os.utime(part)  # ensure mtime moves even on coarse-clock filesystems
    assert D.ensure_banded_index(spark, store, str(idx)) == "rebuilt"


def test_pack_sequences_next_fit_invariants(spark):
    """Packing respects the capacity for non-oversize bins, isolates
    oversize documents in their own bin, keeps every document exactly
    once, and is invariant to input partitioning (the order comes from
    the salted hash, not the incoming row order)."""
    from localsql_spark.operators.corpus import pack_sequences

    rows = [(i, " ".join(["tok"] * n))
            for i, n in enumerate([5, 9, 3, 14, 2, 8, 30, 1, 7, 6])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pack_sequences(df, capacity=10, n_shards=2)
    out = {r.doc_id: r for r in got.collect()}
    assert sorted(out) == list(range(10))  # every doc exactly once

    # bin-level: non-oversize bins fit the capacity; oversize docs alone
    bins = {}
    for r in out.values():
        bins.setdefault((r.shard, r.seq), []).append(r)
    for members in bins.values():
        total = sum(r.n_tok for r in members)
        if any(r.oversize for r in members):
            assert len(members) == 1
        else:
            assert total <= 10
    # positions are 0..len-1 in each bin
    for members in bins.values():
        assert sorted(r.pos for r in members) == list(range(len(members)))

    # partitioning invariance: same assignment from a repartitioned input
    got2 = {r.doc_id: (r.shard, r.seq, r.pos)
            for r in pack_sequences(df.repartition(7), capacity=10,
                                    n_shards=2).collect()}
    assert got2 == {d: (r.shard, r.seq, r.pos) for d, r in out.items()}


def test_triangle_counts_degree_ordered_exact(spark):
    """triangle_counts enumerates each triangle exactly once whatever the
    degree structure: K4 gives every vertex C(3,2)=3 triangles, a chain
    gives zero, a hub star gives zero (the hub's wedges never close), and
    duplicate/reversed input edges don't inflate counts."""
    from localsql_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(10, 11), (11, 12), (12, 13)]
    star = [(20, 21), (20, 22), (20, 23), (20, 24)]
    edges = k4 + chain + star + [(b, a) for a, b in k4]  # reversed dups
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: (r.deg, r.n_tri) for r in triangle_counts(df).collect()}
    assert {n: got[n] for n in range(4)} == {n: (3, 3) for n in range(4)}
    assert all(got[n][1] == 0 for n in (10, 11, 12, 13))
    assert all(got[n][1] == 0 for n in (20, 21, 22, 23, 24))
    assert got[20] == (4, 0) and got[21] == (1, 0)  # degree rides along

    # clustering coefficient: K4 nodes are fully transitive, the star hub
    # has 4 neighbors and no closures, leaves (deg 1) define 0
    from localsql_spark.operators.graph import clustering_coefficients
    cc = {r.node: r.coeff for r in clustering_coefficients(df).collect()}
    assert all(cc[n] == 1.0 for n in range(4))
    assert cc[20] == 0.0 and cc[21] == 0.0
    assert cc[11] == 0.0  # chain middle: deg 2, no triangle


def test_ngram_diversity_detects_cross_document_collapse(spark):
    """Per-doc-diverse but globally-templated sources show a low corpus
    TTR; genuinely diverse sources show TTR ~1.  Short/empty docs
    contribute no n-grams but still count as docs."""
    from localsql_spark.operators.corpus import ngram_diversity

    rows = (
        # templated: every doc is the SAME diverse sentence
        [(i, "alpha beta gamma delta epsilon", "tpl") for i in range(10)]
        # diverse: disjoint vocabulary per doc
        + [(100 + i, f"w{i}a w{i}b w{i}c", "div") for i in range(10)]
        # edge docs: single-token and empty
        + [(200, "solo", "edge"), (201, "   ", "edge")])
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in
           ngram_diversity(docs, n=2, group_col="source").collect()}
    assert out["tpl"].n_docs == 10
    assert out["tpl"].total_ngrams == 40          # 4 bigrams x 10 docs
    assert out["tpl"].distinct_ngrams == 4
    assert abs(out["tpl"].ttr - 0.1) < 1e-9
    assert out["div"].total_ngrams == 20 and out["div"].distinct_ngrams == 20
    assert out["div"].ttr == 1.0
    assert out["edge"].n_docs == 2
    assert out["edge"].total_ngrams == 0 and out["edge"].ttr == 0.0


def test_ngram_diversity_trigrams(spark):
    """n=3 grams are true trigrams (the zip/slice composition does not
    leak shorter tail grams)."""
    from localsql_spark.operators.corpus import ngram_diversity

    docs = spark.createDataFrame(
        [(1, "a b c d", "s")], "doc_id long, text string, source string")
    r = ngram_diversity(docs, n=3, group_col="source").collect()[0]
    assert r.total_ngrams == 2 and r.distinct_ngrams == 2  # 'a b c','b c d'


def test_hybrid_retrieval_reranks_only_the_lexical_shortlist(spark):
    """Stage structure: a document with perfect semantic similarity but
    none of the query terms can never surface (it is not in the BM25
    shortlist); within the shortlist, ranking follows cosine, and rk is
    contiguous from 1."""
    from localsql_spark.operators.similarity import hybrid_bm25_cosine_topk

    docs = spark.createDataFrame(
        [(0, "query anchor text"),              # query doc (vec_id 0)
         (1, "query terms here match well"),
         (2, "query match"),
         (3, "completely unrelated words")],    # semantically identical
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.6, 0.8]), (2, [0.9, 0.1]),
         (3, [1.0, 0.0])],                       # doc 3 == query vector
        "vec_id long, embedding array<float>")
    out = hybrid_bm25_cosine_topk(docs, emb, ["query", "match"],
                                  query_vec_id=0, shortlist=3, k=3).collect()
    got = [r.doc_id for r in out]
    assert 3 not in got          # no lexical hit -> never reranked
    assert [r.rk for r in out] == list(range(1, len(out) + 1))
    # cosine to [1,0]: doc2 (0.9935..) > doc0 (1.0)? doc0 IS the query doc
    # and keeps its term hit; cos(doc0)=1.0 ranks first, then doc2, doc1
    assert got == [0, 2, 1]
    cs = [r.cos_sim for r in out]
    assert cs == sorted(cs, reverse=True)


def test_hard_negatives_are_lexical_hits_below_the_cosine_bar(spark):
    """Every mined negative is in the BM25 shortlist AND at or below the
    cosine threshold; semantically-close lexical hits are excluded, and
    ranking is lexical (not semantic)."""
    from localsql_spark.operators.similarity import bm25_hard_negatives

    docs = spark.createDataFrame(
        [(0, "query anchor"),
         (1, "query match query match"),      # strong lexical, close vec
         (2, "query match"),                  # lexical, far vec
         (3, "query words match here"),       # lexical, far vec
         (4, "nothing relevant at all")],     # no lexical hit, far vec
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.99, 0.14]), (2, [0.0, 1.0]),
         (3, [0.1, 0.99]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    out = bm25_hard_negatives(docs, emb, ["query", "match"],
                              query_vec_id=0, shortlist=4, k=4,
                              max_cos=0.5).collect()
    got = [r.doc_id for r in out]
    assert 4 not in got            # never a lexical hit
    assert 1 not in got            # lexical hit but semantically close
    assert set(got) <= {0, 2, 3}
    bm = [r.bm25_score for r in out]
    assert bm == sorted(bm, reverse=True)   # lexical ranking
    assert all(r.cos_sim <= 0.5 for r in out)


def test_groups_frame_emulation_counts_peer_groups_not_rows(spark):
    """Hand-checked GROUPS semantics on tie groups: dates [d1, d1, d2,
    d3, d3, d3] form peer groups {2,1,3}; GROUPS 1 PRECEDING-1 FOLLOWING
    at a d2 row spans ALL SIX rows (whole adjacent groups enter), where
    ROWS 1-1 would span three — the distinction the emulation exists
    for."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-03", 40.0), (5, "2024-01-03", 50.0),
            (6, "2024-01-03", 60.0)]
    df = spark.createDataFrame(rows, "id long, d string, v double") \
        .select("id", F.col("d").cast("date").alias("d"), "v")
    ranked = df.withColumn(
        "_dr", F.dense_rank().over(Window.orderBy("d")))
    w = Window.orderBy("_dr").rangeBetween(-1, 1)
    out = {r.id: (r.n, r.s) for r in
           ranked.select("id", F.count(F.lit(1)).over(w).alias("n"),
                         F.sum("v").over(w).alias("s")).collect()}
    assert out[3] == (6, 210.0)          # d2 sees every row
    assert out[1] == (3, 60.0)           # d1 group sees d1+d2 rows
    assert out[4] == (4, 180.0)          # d3 group sees d2+d3 rows


def test_inverted_index_incremental_equals_single_build(spark, tmp_path):
    """Two incremental folds produce an index whose served scores are
    bit-identical to a one-shot build AND to the from-scratch scorer;
    the stats counter survives multi-fold merging (the max-vs-sum dl
    regression)."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.text import bm25_scores
    from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                     index_add_documents)

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma" if i % 2 else f"beta w{i % 3}")
         for i in range(30)], "doc_id long, text string")
    inc, one = str(tmp_path / "inc"), str(tmp_path / "one")
    index_add_documents(spark, inc, docs.filter("doc_id % 3 != 0"),
                        n_buckets=4)
    index_add_documents(spark, inc, docs.filter("doc_id % 3 = 0"),
                        n_buckets=4)
    index_add_documents(spark, one, docs, n_buckets=4)

    terms = ["alpha", "beta"]
    srv_inc = {tuple(r) for r in
               bm25_from_index(spark, inc, terms, n_buckets=4).collect()}
    srv_one = {tuple(r) for r in
               bm25_from_index(spark, one, terms, n_buckets=4).collect()}
    scratch = {tuple(r) for r in bm25_scores(docs, terms).collect()}
    assert srv_inc == srv_one == scratch


def test_pack_sequences_accepts_string_chunk_ids(spark):
    """pack_sequences over chunk_documents output (string chunk ids, the
    documented chunk -> pack pipeline) must carry the id dtype through the
    applyInPandas schema instead of failing on a hardcoded 'doc_id long'
    (code-review r9)."""
    from localsql_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [(f"doc{i}#c{j}", 3 + (i * 7 + j) % 5)
         for i in range(6) for j in range(3)],
        "chunk_id string, n_tok long")
    got = pack_sequences(df, capacity=10, n_shards=2,
                         doc_id_col="chunk_id", n_tok_col="n_tok")
    rows = got.collect()
    assert len(rows) == 18
    assert {type(r.doc_id) for r in rows} == {str}
    assert got.schema["doc_id"].dataType.simpleString() == "string"


def test_phash_pairs_group_cap_bounds_output(spark):
    """group_cap excludes over-cap hash groups from BOTH expansion paths
    (same-hash and cross-group), bounding pair output on mass-duplicate
    corpora the way minhash's bucket_cap bounds candidates; capless
    semantics are unchanged."""
    from localsql_spark.operators.multimodal import phash_pairs

    # 6 copies of one text (one hash group of 6) + 2 copies of another
    rows = [(i, "the same repeated body of text here") for i in range(6)]
    rows += [(10 + i, "a different body entirely of words") for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = phash_pairs(docs, max_hamming=3).collect()
    # group-local pairs: C(6,2) + C(2,2) at hamming 0, plus any
    # cross-group pairs the band join surfaces
    assert sum(1 for r in full if r.hamming == 0) == 15 + 1

    capped = phash_pairs(docs, max_hamming=3, group_cap=5).collect()
    ids = {r.doc_a for r in capped} | {r.doc_b for r in capped}
    assert not (ids & set(range(6)))  # the big group is fully excluded
    assert sum(1 for r in capped if r.hamming == 0) == 1  # small group kept


def test_audio_fingerprint_time_localization_and_pairs(spark):
    """The windowed audio fingerprint localizes in time: swapping the
    two halves of a 'track' changes frame-local bits (the global pHash
    pool would average the swap away), exact replicas pair at hamming 0,
    and group_cap excludes the mass-duplicate group through the shared
    hamming_banded_pairs machinery."""
    from localsql_spark.operators.multimodal import (audio_fingerprint,
                                                     audio_pairs)

    half_a = "low low low low " * 40
    half_b = "HIGH!HIGH!HIGH! " * 40
    rows = [(0, half_a + half_b), (1, half_b + half_a)]
    rows += [(10 + i, half_a + half_b) for i in range(5)]  # replicas of 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    afp = {r.doc_id: r.afp for r in audio_fingerprint(docs).collect()}
    assert afp[0] != afp[1]  # halves swapped -> different fingerprint
    assert all(afp[10 + i] == afp[0] for i in range(5))
    # each half in isolation is the same repeated motif, so the swap
    # flips the FRAME halves of the fingerprint exactly: frame 0's bits
    # of doc 0 describe half_a, of doc 1 describe half_b
    f0 = (afp[0] & 0xFFFF, afp[0] >> 16)
    f1 = (afp[1] & 0xFFFF, afp[1] >> 16)
    assert f0 == (f1[1], f1[0])

    pairs = audio_pairs(docs, max_hamming=3).collect()
    zero = {(r.doc_a, r.doc_b) for r in pairs if r.hamming == 0}
    group = [0] + [10 + i for i in range(5)]
    want = {(a, b) for i, a in enumerate(group) for b in group[i + 1:]}
    assert want <= zero
    capped = audio_pairs(docs, max_hamming=3, group_cap=5).collect()
    ids = {r.doc_a for r in capped} | {r.doc_b for r in capped}
    assert not (ids & set(group))  # 6-member group excluded at cap 5


def test_salted_agg_allows_columns_named_distinct(spark):
    """A column NAME containing 'distinct' is not a DISTINCT aggregate —
    the substring check spuriously rejected sum(distinct_users)
    (code-review r9); real DISTINCT still raises."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from localsql_spark.operators.skew import salted_agg

    df = spark.createDataFrame([(1, 10), (1, 20), (2, 5)],
                               "g long, distinct_users long")
    got = {r.g: r.s for r in salted_agg(
        df, ["g"], {"s": F.sum("distinct_users")}).collect()}
    assert got == {1: 30, 2: 5}
    with _pytest.raises(ValueError, match="DISTINCT"):
        salted_agg(df, ["g"], {"s": F.count_distinct("distinct_users")})


def test_two_level_assign_full_probe_equals_flat(spark):
    """coarse_assign_two_level's exactness identity: probing every
    super-cell makes the candidate set all k cells, so the result equals
    the flat O(N*k) assignment row-for-row (same argmin struct fold and
    tie-break); with n_probe=1 the assignment is still VALID (resid
    consistent with the assigned cell's centroid) — the linear-bound
    path for k-proportional-to-N index builds."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import (_coarse_assign,
                                                     _coarse_cells,
                                                     coarse_assign_two_level,
                                                     spread)

    emb = spark.createDataFrame(
        [(i, [float((i * 17 + j * 5) % 13) for j in range(16)])
         for i in range(120)], "vec_id long, embedding array<double>")
    cents = _coarse_cells(emb, 12, "vec_id", "embedding")
    vecs = spread(emb).select("vec_id", "embedding")

    def rows(df):
        return sorted(
            (r["vec_id"], r["cell"], tuple(round(x, 9) for x in r["resid"]))
            for r in df.collect())

    flat = rows(_coarse_assign(vecs, cents, "vec_id", "embedding"))
    full = rows(coarse_assign_two_level(vecs, cents, "vec_id", "embedding",
                                        n_coarse=3, n_probe=3))
    assert full == flat

    # n_probe=1: every vector lands in a real cell with a consistent
    # residual (v - cent[cell]), even where routing picks a non-nearest
    one = coarse_assign_two_level(vecs, cents, "vec_id", "embedding",
                                  n_coarse=3, n_probe=1)
    cent_map = {r["cell"]: r["cent"] for r in cents.collect()}
    vec_map = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    got = one.collect()
    assert len(got) == 120
    for r in got:
        assert r["cell"] in cent_map
        expect = [a - b for a, b in
                  zip(vec_map[r["vec_id"]], cent_map[r["cell"]])]
        assert all(abs(x - y) < 1e-9 for x, y in zip(r["resid"], expect))


def test_two_level_auto_default(spark, monkeypatch):
    """two_level_assign=None is AUTO: flat assignment below
    TWO_LEVEL_AUTO_CELLS, super-quantizer routing at or above it —
    pinning the threshold the ANN.md round-11 planted-cluster posture
    measurement backs.  Explicit True/False still forces either path."""
    from pyspark.sql import functions as F

    from localsql_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float((i * 17 + j * 5) % 13) for j in range(16)])
         for i in range(80)], "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 3)

    calls = {"two_level": 0, "flat": 0}
    real_two = S.coarse_assign_two_level
    real_flat = S._coarse_assign

    def spy_two(*a, **kw):
        calls["two_level"] += 1
        return real_two(*a, **kw)

    def spy_flat(*a, **kw):
        calls["flat"] += 1
        return real_flat(*a, **kw)

    monkeypatch.setattr(S, "coarse_assign_two_level", spy_two)
    monkeypatch.setattr(S, "_coarse_assign", spy_flat)

    assert S.TWO_LEVEL_AUTO_CELLS == 64
    # below the threshold: auto -> flat
    S.knn_ivfpq_adc(emb, queries, k=2, n_cells=8, n_probe=2, m=2,
                    k_codes=4).count()
    assert calls == {"two_level": 0, "flat": 1}
    # at the threshold: auto -> two-level
    S.knn_ivfpq_adc(emb, queries, k=2, n_cells=64, n_probe=2, m=2,
                    k_codes=4).count()
    assert calls["two_level"] == 1
    # explicit False forces flat even at a large cell count
    flat_before = calls["flat"]
    S.knn_ivfpq_adc(emb, queries, k=2, n_cells=64, n_probe=2, m=2,
                    k_codes=4, two_level_assign=False).count()
    assert calls["flat"] == flat_before + 1 and calls["two_level"] == 1
    # write_ivfpq_index shares the auto default
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        S.write_ivfpq_index(emb, f"{d}/small", n_cells=8, m=2, k_codes=4)
        assert calls["two_level"] == 1
        S.write_ivfpq_index(emb, f"{d}/big", n_cells=64, m=2, k_codes=4)
        assert calls["two_level"] == 2


def test_rollup_erase_equals_fresh_on_random_corpora(spark, tmp_path):
    """Randomized (seeded) stress of the rollup retraction: for several
    generated event corpora and subject sets — including subjects owning
    group minima/maxima, whole groups, and whole dates — the erased
    store equals a rollup maintained from scratch on the kept rows,
    row-for-row."""
    import random

    from pyspark.sql import functions as F

    from localsql_spark.sinks.rollup import (erase_from_rollup,
                                             maintain_rollup, read_rollup)

    rng = random.Random(1711)
    for case in range(4):
        users = list(range(1, 8))
        rows = []
        for eid in range(60):
            u = rng.choice(users)
            day = rng.choice(["2024-03-01", "2024-03-02"])
            hour = rng.choice(["00", "01"])
            typ = rng.choice(["A", "B"])
            val = round(rng.uniform(-50, 50), 3)
            rows.append((eid, u, typ, val, f"{day} {hour}:15:00"))
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "value double, ts_s string").withColumn(
            "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        subjects = rng.sample(users, rng.randint(1, 4))
        keys = spark.createDataFrame([(u,) for u in subjects],
                                     "user_id long")

        store = str(tmp_path / f"roll_{case}")
        fresh = str(tmp_path / f"fresh_{case}")
        maintain_rollup(spark, store, ev, grain="hour")
        erase_from_rollup(spark, store, ev, keys, "user_id", grain="hour")
        maintain_rollup(spark, fresh,
                        ev.filter(~F.col("user_id").isin(subjects)),
                        grain="hour")

        def rows_of(d):
            return sorted(map(tuple, read_rollup(spark, d)
                              .select("bucket_ts", "key", "n_events",
                                      "sum_value", "min_value",
                                      "max_value", "event_date")
                              .collect()))

        assert rows_of(store) == rows_of(fresh), f"case {case} diverged"


def test_dp_noisy_counts_mechanism(spark):
    """The seeded Laplace release: deterministic across calls, class
    suppression below min_class, noise bounded by the inverse-CDF's
    range at the draw resolution, and a different seed moves the
    noise."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import dp_noisy_counts

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de", f"s{i % 2}") for i in range(40)],
        "id long, lang string, source string")
    rel1 = {(r["lang"], r["source"]): r["noisy_n"]
            for r in dp_noisy_counts(df, ["lang", "source"],
                                     epsilon=1.0).collect()}
    rel2 = {(r["lang"], r["source"]): r["noisy_n"]
            for r in dp_noisy_counts(df, ["lang", "source"],
                                     epsilon=1.0).collect()}
    assert rel1 == rel2 and len(rel1) == 4  # deterministic release
    true = {(r["lang"], r["source"]): r["n"]
            for r in df.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    # Laplace(1) noise at draw resolution 1e6: |noise| <= ln(1e6) ~ 13.8
    import math
    for k, v in rel1.items():
        assert abs(v - true[k]) <= math.log(1_000_000) + 1e-9
    # suppression: every class here is under 100
    assert dp_noisy_counts(df, ["lang", "source"],
                           min_class=100).count() == 0
    # seed moves the draw on at least one class
    rel3 = {(r["lang"], r["source"]): r["noisy_n"]
            for r in dp_noisy_counts(df, ["lang", "source"], epsilon=1.0,
                                     seed="other").collect()}
    assert rel3 != rel1


def test_dp_noisy_sums_mechanism(spark):
    """Clipped-sum release: released-minus-clipped-true is exactly the
    Laplace draw (bounded by clip*ln(1e6)/eps), clipping bounds any one
    row's influence at clip, determinism across calls, suppression."""
    import math

    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import dp_noisy_sums

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b", float(i * 7 % 50) - 5.0)
         for i in range(40)], "id long, g string, v double")
    rel1 = {r["g"]: r["noisy_sum"]
            for r in dp_noisy_sums(df, ["g"], "v", epsilon=1.0,
                                   clip=10.0).collect()}
    rel2 = {r["g"]: r["noisy_sum"]
            for r in dp_noisy_sums(df, ["g"], "v", epsilon=1.0,
                                   clip=10.0).collect()}
    assert rel1 == rel2 and len(rel1) == 2
    true = {r["g"]: r["s"] for r in df.groupBy("g").agg(
        F.sum(F.least(F.greatest(F.col("v"), F.lit(0.0)), F.lit(10.0)))
        .alias("s")).collect()}
    for g, v in rel1.items():
        assert abs(v - true[g]) <= 10.0 * math.log(1_000_000) + 1e-6
    # one row can shift the release by at most clip + the noise delta:
    # adding a huge-value row changes the clipped true sum by exactly clip
    df2 = df.unionByName(spark.createDataFrame(
        [(999, "a", 1e9)], "id long, g string, v double"))
    rel_plus = {r["g"]: r["noisy_sum"]
                for r in dp_noisy_sums(df2, ["g"], "v", epsilon=1.0,
                                       clip=10.0).collect()}
    assert abs(rel_plus["a"] - rel1["a"] - 10.0) < 1e-6  # same seed/noise
    assert dp_noisy_sums(df, ["g"], "v", min_class=100).count() == 0


def test_dp_counts_sums_noise_not_correlated(spark):
    """Domain-separation regression: releasing counts AND sums over the
    same groups under the SAME seed must not draw the same uniform per
    group — otherwise noisy_sum - clip*noisy_n cancels the noise and
    reveals true_sum - clip*true_n exactly (not DP at any epsilon).
    With per-mechanism domains in the hash key the combination keeps a
    nonzero residual on every group here."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import dp_noisy_counts, dp_noisy_sums

    clip = 10.0
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b", float(i * 7 % 50) - 5.0)
         for i in range(40)], "id long, g string, v double")
    counts = {r["g"]: r["noisy_n"]
              for r in dp_noisy_counts(df, ["g"], epsilon=1.0,
                                       seed="shared").collect()}
    sums = {r["g"]: r["noisy_sum"]
            for r in dp_noisy_sums(df, ["g"], "v", epsilon=1.0, clip=clip,
                                   seed="shared").collect()}
    true = {r["g"]: (r["n"], r["s"]) for r in df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.least(F.greatest(F.col("v"), F.lit(0.0)), F.lit(clip)))
        .alias("s")).collect()}
    for g in true:
        released = sums[g] - clip * counts[g]
        truth = true[g][1] - clip * true[g][0]
        # under the old shared draw these were equal to 6 decimals
        assert abs(released - truth) > 1e-3, (
            f"noise cancelled on group {g!r}: combined release leaks "
            f"the exact clipped residual")


def test_empty_corpus_guards_jl_pca(spark):
    """Empty-input contracts: dim inference and covariance raise a clear
    ValueError on zero rows (not NoneType subscripts / NaN means);
    passing dim= explicitly lets an empty frame project to an empty
    result."""
    import pytest

    from localsql_spark.operators.similarity import (covariance_and_means,
                                                     jl_project, knn_jl)

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim="):
        jl_project(empty)
    with pytest.raises(ValueError, match="dim="):
        knn_jl(empty, empty)
    with pytest.raises(ValueError, match="zero rows"):
        covariance_and_means(empty)
    out = jl_project(empty, dim=4, out_dim=2)
    assert out.count() == 0 and "jl_vec" in out.columns


def test_opq_rotation_orthogonal_and_index_twin(spark, tmp_path):
    """OPQ-lite: the eigenbasis rotation is orthogonal to rounding
    (R R^T ~ I), rotating preserves pairwise L2 to the same tolerance,
    and the persisted rotated index serves the SAME answer as the
    in-memory rotated pipeline (the stored _rotation table round-trips
    through the probe)."""
    from pyspark.sql import functions as F

    from localsql_spark.operators import similarity as S

    # spread per-dim variances so eigengaps are wide: fixed-round power
    # iteration converges geometrically in the gap ratio, so a clustered
    # spectrum leaves components orthogonal only to ~1e-2 at 6 rounds —
    # harmless for OPQ (corpus and queries rotate through the SAME R;
    # consistency, not exact orthogonality, is the requirement) but the
    # orthogonality ASSERTION needs a converged basis to be meaningful
    emb = spark.createDataFrame(
        [(i, [(float((i * 37 + j * 101 + i * j * 13) % 97) / 97.0 - 0.5)
              * (1.0 + 0.9 * j) for j in range(8)]) for i in range(64)],
        "vec_id long, embedding array<double>")
    R = S.opq_rotation(emb, "embedding", rounds=40)
    dim = len(R)
    assert dim == 8 and all(len(row) == dim for row in R)
    for a in range(dim):
        for b in range(dim):
            dot = sum(R[a][j] * R[b][j] for j in range(dim))
            want = 1.0 if a == b else 0.0
            assert abs(dot - want) < 2e-3, (a, b, dot)
    # near-orthogonal, not exact: fixed-round power iteration converges
    # in the eigengap ratio; OPQ only needs corpus/query consistency
    # rotated pairwise L2 == original (orthogonal transform)
    rot = emb.select("vec_id",
                     S._rotate_expr(F.col("embedding"), R).alias("r"))
    import math
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    rv = {r.vec_id: r.r for r in rot.collect()}
    for a, b in [(0, 1), (5, 17), (30, 63)]:
        d0 = math.sqrt(sum((x - y) ** 2
                           for x, y in zip(orig[a], orig[b])))
        d1 = math.sqrt(sum((x - y) ** 2 for x, y in zip(rv[a], rv[b])))
        assert abs(d0 - d1) < 1e-3 * max(d0, 1.0)

    # persisted rotated index == in-memory rotated pipeline
    q = emb.filter("vec_id < 5")
    mem = {(r.query_id, r.neighbor_id, r.adc_dist) for r in
           S.knn_ivfpq_adc(emb, q, k=3, n_cells=4, n_probe=2, m=2,
                           k_codes=8, exclude_self=True,
                           rotate=True).collect()}
    idx = str(tmp_path / "ivfpq_rot")
    S.write_ivfpq_index(emb, idx, n_cells=4, m=2, k_codes=8, rotate=True)
    import pathlib
    assert any(pathlib.Path(idx, "_rotation").glob("*.parquet"))
    served = {(r.query_id, r.neighbor_id, r.adc_dist) for r in
              S.knn_ivfpq_from_index(spark, idx, q, k=3, n_probe=2,
                                     exclude_self=True).collect()}
    assert served == mem and served


def test_jl_projection_matches_numpy_and_preserves_distance(spark):
    """The JL projection equals an independent numpy replay of the same
    hash-derived ±1 matrix, and pairwise distances in the projected
    space stay within the JL distortion band on deterministic vectors
    (Achlioptas 2001: eps ~ sqrt(ln n / out_dim) — loose bound checked
    at 3x to keep the test sharp against sign-matrix bugs but immune to
    noise)."""
    import hashlib

    import numpy as np
    from localsql_spark.operators.similarity import jl_project, jl_signs

    dim, out_dim, n = 32, 16, 40
    vecs = {i: np.array([((i * 13 + j * 7) % 19) - 9.0 for j in range(dim)])
            for i in range(n)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = {r.vec_id: np.array(r.jl_vec) for r in
           jl_project(df, out_dim=out_dim, dim=dim).collect()}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    S = np.array([[1.0 if h32(f"jl:{j}:{k}") % 2 == 0 else -1.0
                   for j in range(dim)] for k in range(out_dim)])
    for i, v in vecs.items():
        want = np.round(S @ v / np.sqrt(out_dim), 9)
        assert np.allclose(got[i], want, atol=1e-9), i

    # distance preservation (unit-normalized): projected pairwise sq-dists
    # track the originals within a generous JL band
    ids = list(range(0, n, 5))
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            va, vb = vecs[a], vecs[b]
            orig = float(np.sum((va - vb) ** 2))
            proj = float(np.sum((got[a] - got[b]) ** 2))
            assert 0.25 * orig <= proj <= 2.5 * orig, (a, b, orig, proj)


def test_knn_jl_same_shape_and_determinism(spark):
    from localsql_spark.operators.similarity import knn_jl

    rows = [(i, [float(((i * 31 + j * 17) % 23) - 11.0) for j in range(32)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 3")
    a = sorted(tuple(r) for r in knn_jl(df, q, k=4, out_dim=8,
                                        dim=32).collect())
    b = sorted(tuple(r) for r in knn_jl(df, q, k=4, out_dim=8,
                                        dim=32).collect())
    assert a == b
    assert len(a) == 12  # 3 queries x top-4
    assert all(r[3] <= 4 for r in a)


def test_pca_matches_numpy_on_anisotropic_data(spark):
    """Covariance table equals numpy's population covariance; the
    power-iterated top component aligns with numpy eigh's dominant
    eigenvector (|cos| > 0.999 on data with a clear eigengap); scores
    equal the centered numpy projection."""
    import numpy as np

    from localsql_spark.operators.similarity import (covariance_matrix,
                                                     pca_scores,
                                                     power_iteration_top)

    rng = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(600)]
    dim, n = 6, 100
    # dominant direction: big spread along a fixed unit vector u
    u = np.array([3.0, 1.0, -2.0, 0.5, -1.0, 2.0])
    u = u / np.linalg.norm(u)
    X = np.array([[rng[i * dim + j] * 0.1 for j in range(dim)]
                  for i in range(n)])
    X += np.outer([rng[i] * 10 for i in range(n)], u)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")

    cov = covariance_matrix(df)
    got = np.zeros((dim, dim))
    for r in cov.collect():
        got[r.j][r.k] = r.cov
    want = np.cov(X, rowvar=False, bias=True)
    assert np.allclose(got, want, atol=1e-9)

    v = power_iteration_top(cov, rounds=12)
    vv = np.zeros(dim)
    for r in v.collect():
        vv[r.j] = r.vj
    _, eigvecs = np.linalg.eigh(want)
    top = eigvecs[:, -1]
    assert abs(float(np.dot(vv, top))) > 0.999

    scores = {r.vec_id: r.pc1 for r in pca_scores(df, rounds=12).collect()}
    centered = X - X.mean(axis=0)
    for i in range(0, n, 17):
        assert abs(scores[i] - float(centered[i] @ vv)) < 1e-6, i


def test_pca_explained_matches_numpy_eigenvalues(spark):
    import numpy as np

    from localsql_spark.operators.similarity import (covariance_matrix,
                                                     pca_explained)

    rng = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(600)]
    dim, n = 6, 100
    u1 = np.array([3.0, 1.0, -2.0, 0.5, -1.0, 2.0]); u1 /= np.linalg.norm(u1)
    u2 = np.array([1.0, -3.0, 0.0, 2.0, 1.0, 0.5])
    u2 -= u2 @ u1 * u1; u2 /= np.linalg.norm(u2)
    X = np.array([[rng[i * dim + j] * 0.05 for j in range(dim)]
                  for i in range(n)])
    X += np.outer([rng[i] * 10 for i in range(n)], u1)
    X += np.outer([rng[(i * 7) % 600] * 4 for i in range(n)], u2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    got = {r.component: (r.eigenvalue, r.trace, r.ratio)
           for r in pca_explained(covariance_matrix(df),
                                  rounds=14).collect()}
    C = np.cov(X, rowvar=False, bias=True)
    eig = np.sort(np.linalg.eigvalsh(C))[::-1]
    assert abs(got[1][0] - eig[0]) < 1e-6 * max(1.0, eig[0])
    assert abs(got[2][0] - eig[1]) < 1e-4 * max(1.0, eig[1])
    assert abs(got[1][1] - float(np.trace(C))) < 1e-9
    assert 0 < got[2][2] < got[1][2] < 1


def test_pca_project_matches_numpy_and_whitening(spark):
    """Top-2 projection equals the numpy eigvec projections (up to the
    deterministic power-iteration sign); whitened components have
    ~unit variance on data with a clear eigengap."""
    import numpy as np

    from localsql_spark.operators.similarity import pca_project

    rng = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(600)]
    dim, n = 6, 100
    u1 = np.array([3.0, 1.0, -2.0, 0.5, -1.0, 2.0]); u1 /= np.linalg.norm(u1)
    u2 = np.array([1.0, -3.0, 0.0, 2.0, 1.0, 0.5])
    u2 -= u2 @ u1 * u1; u2 /= np.linalg.norm(u2)
    X = np.array([[rng[i * dim + j] * 0.05 for j in range(dim)]
                  for i in range(n)])
    X += np.outer([rng[i] * 10 for i in range(n)], u1)
    X += np.outer([rng[(i * 7) % 600] * 4 for i in range(n)], u2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")

    got = {r.vec_id: (r.pc1, r.pc2)
           for r in pca_project(df, n_components=2, rounds=14).collect()}
    C = np.cov(X, rowvar=False, bias=True)
    _, vecs = np.linalg.eigh(C)
    t1, t2 = vecs[:, -1], vecs[:, -2]
    centered = X - X.mean(axis=0)
    w1 = np.array([got[i][0] for i in range(n)])
    w2 = np.array([got[i][1] for i in range(n)])
    r1 = centered @ t1
    r2 = centered @ t2
    # sign is deterministic but arbitrary vs eigh's — compare |corr|
    assert abs(np.corrcoef(w1, r1)[0, 1]) > 0.9999
    assert abs(np.corrcoef(w2, r2)[0, 1]) > 0.999
    # whitened: per-component population variance ~ 1
    white = {r.vec_id: (r.pc1, r.pc2)
             for r in pca_project(df, n_components=2, rounds=14,
                                  whiten=True).collect()}
    z1 = np.array([white[i][0] for i in range(n)])
    z2 = np.array([white[i][1] for i in range(n)])
    assert abs(z1.var() - 1.0) < 1e-3 and abs(z2.var() - 1.0) < 2e-2


def test_power_iteration_local_matches_inplan(spark):
    """The driver-side chain is bit-identical to the in-plan operators
    (same HALF_UP 12-decimal rounding, exact-decimal sums, IEEE
    division) — the license for pca_project's local eigen-math."""
    from localsql_spark.operators.similarity import (_rayleigh,
                                                     covariance_matrix,
                                                     power_iteration_local,
                                                     power_iteration_top,
                                                     rayleigh_local)

    rows = [(i, [float(((i * 13 + j * 7) % 11) - 5) for j in range(6)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cov = covariance_matrix(df).localCheckpoint(eager=True)
    mat = [(r.j, r.k, r.cov) for r in cov.collect()]
    vp = power_iteration_top(cov, 6)
    v_plan = {r["j"]: r["vj"] for r in vp.collect()}
    v_loc = power_iteration_local(mat, 6, 6)
    assert all(v_plan[j] == v_loc[j] for j in range(6))
    assert _rayleigh(cov, vp).first()["lam"] == \
        rayleigh_local(mat, 6, v_loc)


def test_covariance_arrow_matches_exact(spark):
    """Float-twin equivalence bound (ANN.md): the Arrow/numpy
    per-partition accumulator agrees with the exact-decimal fold to
    within the documented bound — cov entries and means within
    ~N*0.5e-12 + float accumulation (<< 1e-9 at test scale; a mean can
    land one 1e-12 quantum off when a partial float sum sits on a
    rounding boundary), and the projection ranking is unchanged.  Also
    pins the empty-corpus contract shared with the exact fold."""
    import pytest
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import (
        covariance_and_means, covariance_and_means_arrow, pca_project)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet") \
        .select("vec_id", "embedding")
    cov_e, m_e = covariance_and_means(emb)
    cov_a, m_a = covariance_and_means_arrow(emb)
    e = {(r.j, r.k): r.cov for r in cov_e.collect()}
    a = {(r.j, r.k): r.cov for r in cov_a.collect()}
    assert set(e) == set(a) and len(e) == 64 * 64
    assert max(abs(e[k] - a[k]) for k in e) <= 1e-9
    me = {r.j: r.mean for r in m_e.collect()}
    ma = {r.j: r.mean for r in m_a.collect()}
    assert max(abs(me[j] - ma[j]) for j in me) <= 2e-12

    # ranking-level agreement end-to-end (the pca_project_arrow_top10
    # gate's local twin): same top-10 ids and order by pc1
    pe = {r.vec_id: r.pc1
          for r in pca_project(emb, n_components=1, rounds=6,
                               method="exact").collect()}
    pa = {r.vec_id: r.pc1
          for r in pca_project(emb, n_components=1, rounds=6,
                               method="arrow").collect()}
    assert max(abs(pe[i] - pa[i]) for i in pe) <= 1e-6
    top_e = sorted(pe, key=lambda i: (-pe[i], i))[:10]
    top_a = sorted(pa, key=lambda i: (-pa[i], i))[:10]
    assert top_e == top_a

    # NULL-vector rows are excluded from sums AND the 1/n normalization
    # in BOTH paths (review round 13: the exact fold's explode dropped
    # NULLs from the sums while n counted them — a corpus with missing
    # embeddings silently biased every entry by n_nonnull/n_total and
    # the two paths diverged far beyond the float-twin bound)
    with_nulls = emb.unionByName(
        emb.limit(3).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.lit(None).cast("array<double>").alias("embedding")))
    cov_en, m_en = covariance_and_means(with_nulls)
    cov_an, m_an = covariance_and_means_arrow(with_nulls)
    en = {(r.j, r.k): r.cov for r in cov_en.collect()}
    an = {(r.j, r.k): r.cov for r in cov_an.collect()}
    assert en == e  # NULL rows change nothing vs the clean corpus
    assert max(abs(en[k] - an[k]) for k in en) <= 1e-9

    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="zero rows"):
        covariance_and_means_arrow(empty)
    # all-NULL corpus: the shared contract is the same clear raise in
    # both paths (previously exact returned empty frames here)
    all_null = with_nulls.filter(F.col("embedding").isNull())
    with pytest.raises(ValueError, match="zero rows"):
        covariance_and_means(all_null)
    with pytest.raises(ValueError, match="zero rows"):
        covariance_and_means_arrow(all_null)
    with pytest.raises(ValueError, match="arrow|exact"):
        pca_project(emb, method="bogus")


def test_cov_exact_arrow_matches_relational(spark):
    """BIT-exactness of the round-14 integer fixed-point covariance fold
    (cov_sums_exact_arrow) against the relational dim^2-per-row decimal
    expand it replaced — on adversarial inputs: NULL vectors, NULL
    elements, ragged rows, exact rounding ties, and magnitudes that
    cross both the _halfup_fixed fast path's exact range (scaled 2^52)
    and the 2^53 integer threshold where the JVM prints every digit.
    Equality is on the Decimal values themselves, not a tolerance."""
    import random

    from localsql_spark.operators.similarity import (
        covariance_and_means, covariance_and_means_relational)
    from localsql_spark.sinks.cov_store import (cov_partials,
                                                cov_partials_relational)

    random.seed(7)
    rows = []
    for i in range(400):
        v = [random.uniform(-3, 3) for _ in range(5)]
        if i % 57 == 0:
            v = None                      # NULL vector: counted, no sums
        elif i % 91 == 0:
            v = v[:3]                     # ragged: pairs up to own length
        elif i % 83 == 0:
            v[2] = None                   # NULL element: skipped per cell
        elif i % 79 == 0:
            v = [x * 1e5 for x in v]      # fast-path/escape boundary
        elif i % 73 == 0:
            v = [x * 1e8 for x in v]      # products beyond 2^53
        elif i % 71 == 0:
            v = [0.0000000000005] * 5     # exact HALF_UP ties at 1e-12
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def key(d_):
        return sorted(tuple(r) for r in d_.collect())

    # cov_store sufficient statistics: decimal(38,12), n counts all rows
    assert key(cov_partials_relational(df)) == key(cov_partials(df))

    # one-pass (cov, means): decimal(28,12) sums, n excludes NULL vectors
    moderate = df.filter("vec_id % 73 != 0")  # 28-digit precision range
    ce, me = covariance_and_means_relational(moderate)
    ca, ma = covariance_and_means(moderate)
    assert key(ce) == key(ca)
    assert key(me) == key(ma)

    # float32 input (the embeddings table dtype): cast points identical
    f32 = moderate.selectExpr(
        "vec_id", "cast(embedding as array<float>) as embedding")
    assert key(covariance_and_means_relational(f32)[0]) \
        == key(covariance_and_means(f32)[0])


def test_rotate_composes_with_two_level_auto(spark, monkeypatch):
    """rotate=True composes with the two-level coarse assignment at
    production cell counts (verdict r12 task 5): at n_cells=64 the AUTO
    default routes through the super-quantizer with rotation ON, the
    rotation trains on the routed residuals, and with assign_probe =
    n_coarse (the exactness identity) the rotated two-level pipeline
    equals the rotated flat pipeline row-for-row — assignment equality
    propagates through rotation training, PQ train/encode and the ADC
    scan, all deterministic downstream of the assignment."""
    from pyspark.sql import functions as F

    from localsql_spark.operators import similarity as S

    # planted clusters + deterministic noise: distance gaps are far
    # above rounding, so row-for-row equality is tie-free
    c = (F.col("vec_id") % 16).cast("int")
    base = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: F.when(d == c, F.lit(10.0)).otherwise(F.lit(0.0))
            + (F.pmod(F.hash(F.concat(F.col("id").cast("string"),
                                      F.lit(":"), d.cast("string"))),
                      F.lit(1000)) / 1000.0) * 0.05).alias("embedding"))
    emb = spark.createDataFrame(base.collect(),
                                "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 5)

    calls = {"two_level": 0}
    real_two = S.coarse_assign_two_level

    def spy(*a, **kw):
        calls["two_level"] += 1
        return real_two(*a, **kw)
    monkeypatch.setattr(S, "coarse_assign_two_level", spy)

    def rows(df):
        return sorted((r.query_id, r.rn, r.neighbor_id, r.adc_dist)
                      for r in df.collect())

    # AUTO at 64 cells engages two-level with rotate on; assign_probe=8
    # = n_coarse (sqrt(64)) probes every super-cell — exactness identity
    two = rows(S.knn_ivfpq_adc(emb, q, k=3, n_cells=64, n_probe=4, m=2,
                               k_codes=8, rotate=True, assign_probe=8,
                               exclude_self=True))
    assert calls["two_level"] == 1
    flat = rows(S.knn_ivfpq_adc(emb, q, k=3, n_cells=64, n_probe=4, m=2,
                                k_codes=8, rotate=True,
                                two_level_assign=False,
                                exclude_self=True))
    assert two == flat
    assert calls["two_level"] == 1  # explicit False stayed flat

    # the persisted-index build composes the same way: rotate=True at 64
    # cells routes two-level (auto), serves identically to the in-query
    # pipeline over the same corpus/queries
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        S.write_ivfpq_index(emb, f"{d}/idx", n_cells=64, m=2, k_codes=8,
                            rotate=True, assign_probe=8)
        assert calls["two_level"] == 2
        served = rows(S.knn_ivfpq_from_index(
            spark, f"{d}/idx", q, k=3, n_probe=4, exclude_self=True))
        assert served == two


def test_balance_allocation_properties(spark):
    """Eigenvalue allocation (_balance_allocation — Ge et al. OPQ's
    balancing half, round 13): a permutation of 0..dim-1, dsub
    components per subspace, spiky spectra spread across subspaces
    (never concentrated in one), and the composed rotation stays an
    orthogonal row-permutation of the unbalanced basis."""
    import pytest

    from localsql_spark.operators.similarity import _balance_allocation

    # spiky spectrum: 4 large + 12 tiny, m=4 -> one large per subspace
    lams = [100.0, 90.0, 80.0, 70.0] + [0.1] * 12
    perm = _balance_allocation(lams, 4)
    assert sorted(perm) == list(range(16))
    subs = [perm[i * 4:(i + 1) * 4] for i in range(4)]
    big_per_sub = [sum(1 for i in s if i < 4) for s in subs]
    assert big_per_sub == [1, 1, 1, 1], \
        "spiky spectrum concentrated instead of balanced"

    # flat spectrum: allocation is near-identity grouping (any split is
    # balanced; determinism is what matters)
    assert _balance_allocation([1.0] * 8, 2) == _balance_allocation(
        [1.0] * 8, 2)

    # zero/negative eigenvalues (rank-deficient tails) don't blow up
    perm2 = _balance_allocation([5.0, 4.0, 0.0, -1e-9], 2)
    assert sorted(perm2) == [0, 1, 2, 3]

    with pytest.raises(ValueError, match="not divisible"):
        _balance_allocation([1.0] * 6, 4)

    # the balanced rotation is a row-permutation of the unbalanced one
    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import opq_rotation
    emb = spark.createDataFrame(
        [(i, [float((i * 17 + j * 5) % 13) for j in range(8)])
         for i in range(40)], "vec_id long, embedding array<double>")
    raw = opq_rotation(emb, "embedding")
    bal = opq_rotation(emb, "embedding", balance_m=2)
    assert sorted(map(tuple, raw)) == sorted(map(tuple, bal))

    # advice r13: dim not divisible by m must NOT fail rotate=True
    # callers (the PQ slicer truncates the ragged tail) — opq_rotation
    # warns and keeps the PCA order instead of raising
    odd = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(5)])
         for i in range(30)], "vec_id long, embedding array<double>")
    with pytest.warns(UserWarning, match="not divisible"):
        skipped = opq_rotation(odd, "embedding", balance_m=2)
    assert skipped == opq_rotation(odd, "embedding")


def test_fp_sum_matches_decimal_fold(spark):
    """Documentation of the round-14 fixed-point equivalence finding: a
    long-accumulator image of _dec_sum (round12 -> floor(x*1e12+0.5) ->
    sum longs -> one division) is VALUE-IDENTICAL to the decimal fold on
    adversarial inputs — tie-adjacent values, negatives, magnitudes across
    the envelope, NULLs, empty arrays, and sums past the 2^53 fast-path
    boundary.  The fixed-point form benched ~20% slower in the interpreted
    ArrayAggregate (per-element cost is Round + lambda dispatch, not
    decimal adds), so _dec_sum keeps the decimal body; this test pins the
    equivalence argument the Arrow scoring paths rely on."""
    import random

    from pyspark.sql import functions as F

    from localsql_spark.operators.similarity import _dec_sum

    def fixed_point(arr):
        ks = F.transform(arr, lambda x: F.floor(F.round(x, 12)
                                                * F.lit(1e12) + F.lit(0.5)))
        s = F.aggregate(ks, F.lit(0).cast("long"), lambda acc, k: acc + k)
        return (F.when(F.abs(s) <= F.lit(1 << 53),
                       s.cast("double") / F.lit(1e12))
                .otherwise((s.cast("decimal(20,0)")
                            / F.lit(10**12).cast("decimal(13,0)"))
                           .cast("double")))

    rng = random.Random(20260817)
    rows = []
    for _ in range(300):
        n = rng.randint(0, 80)
        arr = []
        for _ in range(n):
            kind = rng.random()
            if kind < 0.25:  # tie-adjacent at the 12th decimal
                arr.append(rng.randint(-10**9, 10**9) * 1e-12
                           + 5e-13 * rng.choice([1, -1, 0.999999, 1.000001]))
            elif kind < 0.5:  # embedding-product-like
                arr.append(rng.uniform(-1, 1) * rng.uniform(0, 1))
            elif kind < 0.7:  # larger magnitudes inside the envelope
                arr.append(rng.uniform(-2047, 2047))
            elif kind < 0.8:  # exact representables
                arr.append(rng.randint(-2000, 2000) / 2**rng.randint(0, 20))
            else:
                arr.append(rng.gauss(0, 1e-6))
        rows.append((arr,))
    rows.append(([None, 1.0, 2.0],))    # NULL poisons
    rows.append(([],))                  # empty -> 0.0
    rows.append(([2000.0] * 4000,))     # |sum| > 2^53*1e-12: slow arm
    df = spark.createDataFrame(rows, "arr array<double>")
    got = df.select(fixed_point(F.col("arr")).alias("new"),
                    _dec_sum(F.col("arr")).alias("old")).collect()
    for i, r in enumerate(got):
        assert (r["new"] is None and r["old"] is None) or r["new"] == r["old"], \
            f"row {i}: new={r['new']!r} old={r['old']!r}"
