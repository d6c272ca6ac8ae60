"""Data-quality constraint suite (operators.quality): every rule kind
catches its planted violation, clean data passes, and the whole row-local
battery runs in one aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from localsql_spark.operators import quality as Q


def _report(df, rules):
    return {r["constraint"]: (r["n_rows"], r["violations"], r["passed"])
            for r in Q.check_constraints(df, rules).collect()}


def test_each_rule_kind_catches_its_violation(spark):
    rows = [
        (1, 10.0, "O", "1-URGENT", 100),
        (2, -5.0, "O", "2-HIGH", 100),      # between violation
        (None, 20.0, "F", "3-MEDIUM", 101),  # not_null violation
        (4, 30.0, "X", "4-LOW", 102),        # accepted violation
        (4, 40.0, "P", "nope", None),        # unique dup + matches violation
    ]
    df = spark.createDataFrame(
        rows, "k int, price double, status string, prio string, fk int")
    dim = spark.createDataFrame([(100,), (101,)], "pk int")
    rep = _report(df, [
        Q.not_null("k"), Q.unique("k"), Q.between("price", 0.0, 1e6),
        Q.accepted("status", ["O", "F", "P"]), Q.matches("prio", "^[1-5]-"),
        Q.refers_to("fk", dim, "pk"),
    ])
    assert rep["not_null(k)"] == (5, 1, False)
    assert rep["unique(k)"] == (5, 1, False)          # one EXTRA 4
    assert rep["between(price,0.0,1000000.0)"] == (5, 1, False)
    assert rep["accepted(status)"] == (5, 1, False)
    assert rep["matches(prio)"] == (5, 1, False)
    # fk=102 dangles; the NULL fk is not a referential violation
    assert rep["refers_to(fk)"] == (5, 1, False)


def test_clean_data_passes_everything(spark):
    df = spark.createDataFrame([(i, float(i), "O") for i in range(50)],
                               "k int, price double, status string")
    rep = _report(df, [Q.not_null("k"), Q.unique("k"),
                       Q.between("price", 0.0, 100.0),
                       Q.accepted("status", ["O"])])
    assert all(v == (50, 0, True) for v in rep.values())


def test_row_local_rules_share_one_scan(spark):
    """All row-local + uniqueness rules must evaluate in one aggregation
    job — the validation gate cannot cost one scan per rule at 100 TB."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("v"))
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId()
    Q.check_constraints(df, [
        Q.not_null("k"), Q.unique("k"), Q.between("v", 0.0, 10.0),
        Q.not_null("v"),
    ])
    after = sc._jsc.sc().dagScheduler().nextJobId()
    assert after - before <= 2, "row-local battery must be ~one job"


def test_validate_and_split_routes_rows(spark):
    rows = [
        (1, 10.0, "O", 100),
        (2, -5.0, "O", 100),     # between
        (None, 20.0, "F", 101),  # not_null
        (4, 30.0, "X", 102),     # accepted + dangling fk
        (4, 40.0, "P", None),    # unique dup (both 4s)
    ]
    df = spark.createDataFrame(rows, "k int, price double, s string, fk int")
    dim = spark.createDataFrame([(100,), (101,)], "pk int")
    rules = [Q.not_null("k"), Q.unique("k"), Q.between("price", 0.0, 1e6),
             Q.accepted("s", ["O", "F", "P"]), Q.refers_to("fk", dim, "pk")]
    passed, quarantined = Q.validate_and_split(df, rules)
    assert sorted(r["k"] for r in passed.collect()) == [1]
    bad = {(r["k"], tuple(r["failed_rules"]))
           for r in quarantined.collect()}
    assert (2, ("between(price,0.0,1000000.0)",)) in bad
    assert (None, ("not_null(k)",)) in bad
    # both k=4 rows are unique-violations; one also fails accepted + fk
    assert (4, ("unique(k)", "accepted(s)", "refers_to(fk)")) in bad
    assert (4, ("unique(k)",)) in bad
    assert passed.columns == df.columns  # original schema preserved


def test_split_partitions_exactly(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("double").alias("v"))
    passed, quarantined = Q.validate_and_split(
        df, [Q.between("v", 0.0, 6.0)])
    assert passed.count() + quarantined.count() == 200
    assert quarantined.count() == 60        # v in {7,8,9}


def test_schema_drift_statuses(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "k int, s string, v double")
    rep = {r["column"]: (r["expected_type"], r["actual_type"], r["status"])
           for r in Q.schema_drift(
               df, {"k": "int", "s": "bigint", "missing_col": "double"}
           ).collect()}
    assert rep["k"] == ("int", "int", "ok")
    assert rep["s"] == ("bigint", "string", "type_changed")
    assert rep["missing_col"] == ("double", None, "missing")
    assert rep["v"] == (None, "double", "added")


def test_er_blocked_matches_and_transitive_entities(spark):
    """Entity resolution: matching happens only WITHIN blocks, edit
    distance gates pairs, and canonicalization is TRANSITIVE — a chain
    a~b, b~c resolves all three to one entity even when a and c are not
    themselves within max_dist."""
    from localsql_spark.operators import er as ER

    rows = [
        (1, "smith ltd", "uk"), (2, "smith ltd.", "uk"),   # dist 1
        (3, "smith ltdx.", "uk"),                           # dist 1 to 2, 2 to 1
        (4, "smith ltd", "fr"),   # identical attr, different block: no match
        (5, "jones plc", "uk"),   # no match at dist 1
    ]
    df = spark.createDataFrame(rows, "rid long, name string, country string")
    m = ER.blocked_edit_matches(df, "rid", "name", ["country"], max_dist=1)
    pairs = sorted((r.id_a, r.id_b, r.dist) for r in m.collect())
    assert pairs == [(1, 2, 1), (2, 3, 1)]  # chain, never (1,3), never 4
    ents = {r.id: r.entity_id
            for r in ER.resolve_entities(df, m, "rid").collect()}
    assert ents == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}

    # block_cap drops a degenerate hot block before the self-join
    hot = spark.createDataFrame(
        [(i, "same", "x") for i in range(10)] + [(90, "pair a", "y"),
                                                 (91, "pair b", "y")],
        "rid long, name string, country string")
    capped = ER.blocked_edit_matches(hot, "rid", "name", ["country"],
                                     max_dist=1, block_cap=5)
    assert sorted((r.id_a, r.id_b) for r in capped.collect()) == [(90, 91)]


def test_sorted_neighborhood_window_and_composability(spark):
    """Sorted-neighborhood only compares pairs within the window in sort
    order (a hot block is NOT exhaustively compared), ids normalize
    id_a < id_b, and the output composes with resolve_entities."""
    from localsql_spark.operators import er as ER

    rows = [
        (1, "aaa", "x"), (2, "aab", "x"), (3, "aac", "x"),
        (4, "zzz", "x"),           # far in sort order from the aa* run
        (5, "zzy", "x"),
        (6, "aaa", "y"),           # other block: never pairs with 1
    ]
    df = spark.createDataFrame(rows, "rid long, name string, country string")
    m = ER.sorted_neighborhood_matches(df, "rid", "name", ["country"],
                                       window=2, max_dist=1)
    pairs = sorted((r.id_a, r.id_b) for r in m.collect())
    # window=2: only adjacent-in-sort pairs compare; sort order in block x
    # is aaa,aab,aac,zzy,zzz -> adjacent pairs (1,2),(2,3),(3,5*),(5,4);
    # (3,5) fails the distance gate, (4,5) normalizes from (5,4)
    assert pairs == [(1, 2), (2, 3), (4, 5)]
    ents = {r.id: r.entity_id
            for r in ER.resolve_entities(df, m, "rid").collect()}
    assert ents == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_fs_match_scores_weighting(spark):
    """FS weights: agreement on a rare field scores higher than on a
    common one; full disagreement scores negative; n_agree counts."""
    from localsql_spark.operators import er as ER

    # field "common": 2 values evenly split (u = 0.5); field "rare": all
    # distinct (u = 1/n)
    rows = [(i, "x" if i % 2 == 0 else "y", f"r{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "rid long, common string, rare string")
    # make 0 and 1 agree on rare for the test pair
    df = df.union(spark.createDataFrame([(10, "x", "r0")],
                                        "rid long, common string, rare string"))
    cand = spark.createDataFrame(
        [(0, 10), (0, 2), (1, 2)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): (r.n_agree, r.score)
           for r in ER.fs_match_scores(df, cand, "rid",
                                       ["common", "rare"]).collect()}
    # (0,10): agree both; (0,2): agree common only; (1,2): disagree both
    assert got[(0, 10)][0] == 2 and got[(0, 2)][0] == 1
    assert got[(1, 2)][0] == 0
    assert got[(0, 10)][1] > got[(0, 2)][1] > got[(1, 2)][1]
    assert got[(1, 2)][1] < 0
    # the rare-field agreement contributes more than the common one:
    # score(0,10) - score(0,2) (rare flip) > score(0,2) - score(1,2)
    # (common flip) is NOT generally ordered; instead check weight ratio
    # directly: agreeing on rare alone beats agreeing on common alone
    cand2 = spark.createDataFrame([(2, 4)], "id_a long, id_b long")
    # 2 and 4 share common=x, different rare
    common_only = ER.fs_match_scores(df, cand2, "rid",
                                     ["common", "rare"]).collect()[0].score
    assert got[(0, 10)][1] > common_only


def test_psi_drift_detects_shift_and_reads_zero_on_identical(spark):
    """PSI ~ 0 on an identical distribution; large on a location shift.
    Per-bucket terms are non-negative by construction — (a-b) and
    ln(a/b) always share sign."""
    from pyspark.sql import functions as F

    from localsql_spark.operators.sketches import psi_drift

    rows = [(i, float((i * 37 % 100))) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    same = psi_drift(df, df, "value", "event_id").collect()
    assert abs(same[0].psi_total) < 1e-9
    assert all(r.psi_term >= 0 for r in same)

    shifted = df.select("event_id",
                        (F.col("value") + 50.0).alias("value"))
    moved = psi_drift(df, shifted, "value", "event_id").collect()
    assert moved[0].psi_total > 0.25  # the "shifted" rule-of-thumb band
    assert all(r.psi_term >= -1e-15 for r in moved)
    assert len(moved) == 10
