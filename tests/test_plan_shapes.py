"""Physical-plan regression tests: the scale properties we rely on (filter
pushdown, column pruning, broadcast of small dimensions, bounded shuffle
counts) asserted against the optimized plans at sf0.001 — they must not
silently regress as queries evolve.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as m

    return m.queries()


def test_q1_pushdown_and_pruning(spark, queries):
    df = queries["q1_pricing_summary"](spark, SF_SMALL)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: key columns only, never the full 11-column lineitem
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert plan.count("Exchange") == 1, "Q1 must shuffle exactly once"


def test_q5_broadcasts_dimensions(spark, queries):
    plan = _plan(queries["q5_nation_revenue"](spark, SF_SMALL))
    assert plan.count("BroadcastExchange") >= 3, \
        "customer/supplier/nation/region must broadcast"
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_q3_top_k_never_global_sorts(spark, queries):
    plan = _plan(queries["q3_top_orders"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, \
        "ORDER BY+LIMIT must compile to top-k, not a global sort"


def test_knn_scores_in_narrow_scan_map(spark, queries):
    """Optimization r14: brute-force scoring is ONE narrow Arrow map with
    the bounded query set in the task closure — the query crossJoin (and
    its BroadcastExchange) no longer exists, and the corpus is never the
    build side of anything."""
    plan = _plan(queries["knn_brute_force_top5"](spark, SF_SMALL))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_minhash_join_is_equi_not_cross(spark, queries):
    plan = _plan(queries["dedup_minhash_pairs"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_is_narrow(spark, queries):
    plan = _plan(queries["multimodal_features"](spark, SF_SMALL))
    assert "Exchange" not in plan.replace("RoundRobinPartitioning", "XX") \
        or plan.count("Exchange") <= 1, \
        "feature extraction must stay a narrow map (one spread repartition max)"


def test_audio_fingerprint_arrow_map_equi_joins(spark, queries):
    """Since optimization round 14 the fingerprint is ONE Arrow-batched
    narrow map (guide §4.2: batch the doc-local numeric work into numpy
    instead of exploding every character into JVM rows) — the plan must
    show exactly one MapInPandas over a column-pruned scan, no row-at-a-
    time Python (BatchEvalPython), and no exchange between the scan and
    the map beyond the spread() repartition.  The banded pair join stays
    an equi-join over distinct fingerprints, never a cross product."""
    plan = _plan(queries["multimodal_audio_fingerprint"](spark, SF_SMALL))
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
    plan2 = _plan(queries["multimodal_audio_pairs"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan2
    assert "BatchEvalPython" not in plan2


def test_lateral_decorrelates_to_group_limit(spark, queries):
    """LATERAL (ORDER BY ... LIMIT k) must decorrelate into a join +
    per-key rank limit — NOT a per-outer-row subquery loop."""
    plan = _plan(queries["lateral_topk_per_nation"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan or "Window" in plan
    assert "CartesianProduct" not in plan


def test_unpivot_is_narrow(spark, queries):
    """UNPIVOT compiles to Expand — row-local, zero shuffles."""
    plan = _plan(queries["unpivot_metrics"](spark, SF_SMALL))
    assert "Expand" in plan
    assert "Exchange" not in plan


def test_tfidf_single_token_subtree(spark, queries):
    """Document frequency via window (not groupBy+rejoin) must not duplicate
    the tokenize+tf pipeline: exactly one documents scan feeds it."""
    plan = _plan(queries["text_tfidf_top_terms"](spark, SF_SMALL))
    import re
    tokenize_scans = len(re.findall(r"(?<!pos)explode|posexplode", plan))
    assert tokenize_scans <= 1, "token explode must appear once in the plan"


def test_countmin_counter_table_is_fixed_size(spark, queries):
    """The count-min counter table must broadcast (it is 256 cells no matter
    the corpus size) — the probe join must never shuffle the corpus."""
    plan = _plan(queries["sketch_countmin_terms"](spark, SF_SMALL))
    assert "BroadcastExchange" in plan


def test_exclude_emulation_single_shuffle_per_key(spark, queries):
    """All five window aggregates share the user_id partitioning: at most
    the initial scan repartition plus one shuffle per distinct sort order."""
    plan = _plan(queries["window_exclude_emulated"](spark, SF_SMALL))
    # two sort orders (ts,event_id) and (d) over the same partition key
    assert plan.count("Exchange hashpartitioning") <= 2


def test_qualify_uses_window_group_limit(spark, queries):
    """The rn<=3 filter must push into WindowGroupLimit so each shuffle
    partition keeps 3 rows per key BEFORE the window sort."""
    plan = _plan(queries["qualify_top_suppliers"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") <= 2


def test_repetition_signals_zero_shuffle_pruned(spark, queries):
    """Row-local lambda folds: no hash-partitioning shuffle, two-column
    pruned scan.  A RoundRobin repartition is allowed — ``spread()`` inserts
    one on single-split local input so per-row work parallelizes; at real
    scale (>= parallelism input splits) it is a no-op (see
    test_spread_* below)."""
    plan = _plan(queries["text_repetition_signals"](spark, SF_SMALL))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" in read and "source" not in read and "lang" not in read


def test_kmeans_assignment_is_narrow_arrow_map(spark, queries):
    """Optimization r14: the assignment is ONE Arrow map with the k
    collected centroids in the closure — no centroid crossJoin, no
    per-vector argmin exchange, and never a corpus-side broadcast."""
    plan = _plan(queries["embedding_kmeans_clusters"](spark, SF_SMALL))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_fingerprint_single_shuffle(spark, queries):
    plan = _plan(queries["table_fingerprint_documents"](spark, SF_SMALL))
    assert plan.count("Exchange") <= 2  # partial->final agg only


def test_aqe_splits_skewed_join_partitions(spark):
    """The skew story's runtime half: AQE must detect a hot key in a
    sort-merge join and split that partition (skew=true in the final plan),
    complementing the explicit salting operators for pre-AQE paths."""
    from pyspark.sql import functions as F

    old = {k: spark.conf.get(k, None) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"))
        dim = spark.range(0, 300_000).select(F.col("id").alias("k"),
                                             (F.col("id") * 2).alias("v"))
        j = big.join(dim, "k")
        # Execute the DataFrame's OWN QueryExecution JVM-side (a noop write
        # builds a separate execution, so re-explaining `j` afterwards would
        # print a fresh isFinalPlan=false adaptive plan with no skew info).
        # AdaptiveSparkPlanExec.execute() finalizes the plan; RDD.count()
        # materializes it without shipping rows to Python.
        qe = j._jdf.queryExecution()
        qe.executedPlan().execute().count()
        plan = qe.executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# -- spread() no-op contract --------------------------------------------------
# spread() exists ONLY to rescue single-split local inputs (CPU-bound per-row
# work serialized on one core).  At scale — many input splits, or any
# non-local filesystem — it must be an exact no-op so real clusters never pay
# an extra shuffle.  Pin both sides of that contract.


def test_spread_repartitions_single_split_local_input(spark, tmp_path):
    from pyspark.sql import functions as F

    from localsql_spark.operators import spread

    p = str(tmp_path / "one_split")
    spark.range(0, 1000).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p).select(F.col("id") * 2)
    out = spread(df)
    assert out is not df
    assert "RoundRobinPartitioning" in _plan(out)


def test_spread_noop_at_or_above_parallelism_splits(spark, tmp_path):
    from localsql_spark.operators import spread

    p = str(tmp_path / "many_splits")
    n = spark.sparkContext.defaultParallelism * 2
    spark.range(0, 10_000).repartition(n).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= spark.sparkContext.defaultParallelism
    out = spread(df)
    assert out is df, "spread must be an identity at >= parallelism splits"


def test_spread_noop_for_non_local_storage(spark):
    from localsql_spark.operators import spread

    df = spark.range(0, 10).toDF("id")
    # simulate a remote-store scan: spread must trust the source's splits
    df.inputFiles = lambda: ["s3a://bucket/part-00000.parquet"]
    assert spread(df) is df


def test_spread_noop_for_non_file_plans(spark):
    from localsql_spark.operators import spread

    df = spark.range(0, 10)  # no files behind the plan at all
    assert spread(df) is df


def test_per_group_sample_uses_window_group_limit(spark, queries):
    """Per-group hash sampling must push the rn<=20 filter into
    WindowGroupLimit: bounded per-group state before the window sort."""
    plan = _plan(queries["sample_per_lang_topk"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_grouped_hll_register_table_is_fixed_fan_in(spark, queries):
    """Grouped HLL: two aggregations only (groups x 256 registers, then
    groups) — no join, no extra shuffle."""
    plan = _plan(queries["hll_distinct_users_by_type"](spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan


def test_q21_double_correlation_decorrelates(spark, queries):
    """EXISTS + NOT EXISTS on aliases of the same fact table must become
    left-semi and left-anti joins — never a per-row subquery loop or a
    cartesian product."""
    plan = _plan(queries["q21_sole_return_supplier"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_incremental_dedup_band_join_is_equi(spark, queries):
    """The new-batch band join must stay an equi join on the band key —
    never a cartesian product or nested-loop over the corpus."""
    plan = _plan(queries["dedup_incremental_new_batch"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A date-partitioned fact joined to a FILTERED dim must plan a
    DynamicPruningExpression on the fact scan: at 100 TB this is the
    difference between scanning every date directory and only the dates
    the dim filter selects — partition pruning decided at RUNTIME from the
    dim side's build, no hand-written date predicate needed.

    Gotcha this test pins: Spark's isLikelySelective() heuristic gates the
    rule, and it does NOT count a bare boolean-attribute filter — the dim
    filter must be a comparison/IN/LIKE predicate or DPP silently never
    fires (cost a debugging session to find)."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        F.date_format(F.date_add(F.lit("2024-01-01"),
                                 (F.col("id") % 30).cast("int")),
                      "yyyy-MM-dd").alias("d"))
    fact.write.partitionBy("d").parquet(str(tmp_path / "fact"))
    dim = spark.range(0, 30).select(
        F.col("id").alias("weight"),
        F.date_format(F.date_add(F.lit("2024-01-01"),
                                 F.col("id").cast("int")),
                      "yyyy-MM-dd").alias("dim_d"))
    dim.write.parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    dm = spark.read.parquet(str(tmp_path / "dim")).filter("weight < 5")
    joined = f.join(dm, f.d == dm.dim_d).groupBy("weight").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_prunes_selective_join(spark, tmp_path):
    """With a selective dim filter over a shuffle join, Spark's runtime
    filter optimization injects a bloom/semi filter on the fact side so
    most fact rows drop BEFORE the shuffle — at 100 TB this cuts the
    dominant exchange, not just the join.  Pin that the optimization is
    available and fires under the thresholds we set, so a config
    regression can't silently disable it."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    fact.write.parquet(str(tmp_path / "fact"))
    # the dim filter must be a comparison predicate: isLikelySelective()
    # ignores bare boolean attributes (same gotcha as the DPP test above)
    dim = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("w"))
    dim.write.parquet(str(tmp_path / "dim"))

    old = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter."
                           "creationSideThreshold", "10MB"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"),
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                       "applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                       "creationSideThreshold", "100MB")
        # force a shuffle join: broadcast joins don't need runtime filters
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        f = spark.read.parquet(str(tmp_path / "fact"))
        dm = spark.read.parquet(str(tmp_path / "dim")).filter("w < 1")
        joined = f.join(dm, "k").groupBy("v").count()
        plan = (joined._jdf.queryExecution().optimizedPlan().toString()
                + joined._jdf.queryExecution().executedPlan().toString())
        assert ("bloomfilter" in plan.lower()
                or "BloomFilterMightContain" in plan), plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_store_probe_is_partition_pruned(spark, queries):
    """The headline incremental-dedup query's candidate read must prune on
    the band-partitioned sidecar index (PartitionFilters on bk_prefix),
    not linearly scan the flat signature store — the auto_index default
    of minhash_lsh_pairs_from_store."""
    plan = _plan(queries["dedup_incremental_store"](spark, SF_SMALL))
    pf = [ln for ln in plan.splitlines()
          if "PartitionFilters" in ln and "bk_prefix" in ln]
    assert pf, "index scan lost its bk_prefix partition prune"
    assert "CartesianProduct" not in plan


def test_ivfpq_codes_join_never_shuffles_vectors(spark, queries):
    """IVFADC scale contract: the candidate-scoring join is an equi-join
    of the narrow codes table against a BROADCAST lookup table — no
    cartesian/NLJ anywhere, and no exchange carries an embedding array
    above the residual-encoding subtree."""
    plan = _plan(queries["knn_ivfpq_top5"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    # the candidate scan must be a broadcast HASH join keyed on the
    # inverted-list triple — the relational form of the IVF list prune
    # (the only NLJs allowed are the n_cells-row centroid crossJoins)
    assert any("BroadcastHashJoin [cell" in ln for ln in plan.splitlines())
    nljs = [ln for ln in plan.splitlines()
            if "BroadcastNestedLoopJoin" in ln]
    assert all("Cross" in ln for ln in nljs)
    # the final aggregation's exchange carries (query, neighbor, partial
    # decimal sum) — never the embedding column
    final_exchanges = [ln for ln in plan.splitlines()
                       if "Exchange hashpartitioning(query_id" in ln]
    assert final_exchanges and all("embedding" not in ln
                                   for ln in final_exchanges)


def test_ivm_join_view_read_prunes_buckets(spark, tmp_path):
    """A grp_bucket filter on the maintained join view must prune whole
    partitions at scan time (PartitionFilters), not post-filter rows."""
    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view

    fact = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(50)],
        "fk long, cust long, amount double")
    dim = spark.createDataFrame([(c, f"g{c}") for c in range(5)],
                                "cust_id long, grp_name string")
    view = str(tmp_path / "view")
    maintain_join_view(spark, view, fact, dim, "cust", "cust_id",
                       "grp_name", "amount", n_buckets=4)
    df = read_join_view(spark, view).filter("grp_bucket = 1")
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "grp_bucket" in scan[0]


def test_sorted_neighborhood_join_is_rank_keyed(spark, queries):
    """The neighbor join must key on (block, partner-rank) — the hash
    join emits |records| x (window-1) candidates, never a block-wide
    fan-out followed by a rank filter (and never a cartesian)."""
    plan = _plan(queries["er_sorted_neighborhood"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    joins = [ln for ln in plan.splitlines()
             if "Join" in ln and "_rb" in ln]
    assert joins, "rank key _rb not part of any join condition"


def test_bm25_filters_terms_before_aggregation_and_takes_ordered(spark,
                                                                 queries):
    """BM25's corpus-sized work must stop at the term filter: the
    (doc, term) aggregate sits above a Filter on the query terms (no
    all-term tf materialization), and the top-k is TakeOrderedAndProject,
    not a global Sort."""
    plan = _plan(queries["bm25_search_top10"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "term IN" in plan or "term#" in plan  # the isin filter survives
    assert "CartesianProduct" not in plan


def test_ivfpq_index_probe_prunes_cells_and_reads_no_vectors(spark,
                                                             queries):
    """The persisted-IVFPQ probe must partition-prune the codes scan to
    the probed cells and never read an embedding column from disk."""
    plan = _plan(queries["knn_ivfpq_index_top5"](spark, SF_SMALL))
    scans = [ln for ln in plan.splitlines()
             if "PartitionFilters" in ln and "cell" in ln]
    assert scans, "codes scan lost its cell partition prune"
    codes_reads = [ln for ln in plan.splitlines()
                   if "ReadSchema" in ln and "neighbor_id" in ln]
    assert codes_reads and all("embedding" not in ln
                               for ln in codes_reads)
    assert "CartesianProduct" not in plan


def test_bloom_filtered_join_never_shuffles_full_fact_rows(spark, queries):
    """The runtime-filter pattern's whole point: every Exchange in the
    plan carries either bloom bits, distinct probe KEYS, or the
    post-filter aggregate — never the full orders rows.  The fact scan
    reads only the three columns the query needs."""
    plan = _plan(queries["bloom_filtered_orders_join"](spark, SF_SMALL))
    fact_reads = [ln for ln in plan.splitlines()
                  if "ReadSchema" in ln and "o_orderpriority" in ln]
    assert fact_reads and all("o_comment" not in ln and "o_clerk" not in ln
                              for ln in fact_reads)
    # full fact rows reach the agg through broadcast semi/inner joins
    # only: no Exchange may carry o_totalprice (aggregate exchanges carry
    # the decimal sum, which Spark names sum#N, not the raw column)
    for ln in plan.splitlines():
        if ln.lstrip().startswith("+- Exchange") or \
                ln.lstrip().startswith("Exchange"):
            assert "o_totalprice" not in ln, ln
    assert "CartesianProduct" not in plan


def test_cobucket_query_join_itself_is_exchange_free(spark, queries):
    """The registered cobucketed query: the only Exchange in the plan is
    the per-segment aggregate ABOVE the join — neither join input is
    re-shuffled (bucketed reads carry the hash partitioning).  Broadcast
    is disabled so the tiny sf0.001 side can't sidestep the claim: at
    scale BOTH sides outgrow broadcast and bucketing is what saves the
    shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(
            queries["cobucket_join_segment_revenue"](spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_at = plan.find("SortMergeJoin")
    assert join_at != -1, plan[:400]
    below = plan[join_at:]
    assert "Exchange hashpartitioning" not in below, below[:800]


def test_bm25_index_probe_prunes_term_buckets(spark, tmp_path):
    """The index-served BM25 scan must carry a PartitionFilter on the
    term buckets — posting lists of unprobed terms are never read."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                     index_add_documents)
    from localsql_spark.workload import load

    docs = load(spark, SF_SMALL)["documents"]
    idx = str(tmp_path / "idx")
    index_add_documents(spark, idx, docs)
    scores = bm25_from_index(spark, idx, ["join", "hash"])
    plan = _plan(scores)
    pruned = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln and "tb" in ln]
    assert pruned, "postings scan lost its term-bucket partition prune"
    assert scores.count() > 0


def test_read_base_partitions_lists_only_touched_dirs(spark, tmp_path):
    """The request-bounded listing contract (round 10): a touched-
    partition read must hand Spark ONLY the named partition dirs — the
    file index over the whole store made every fold's planning cost
    O(store files) (caught by the 64x erase scale probe).  inputFiles()
    is the ground truth for what the scan would touch."""
    from pyspark.sql import functions as F

    from localsql_spark.sinks.erase import write_bucketed_store
    from localsql_spark.sinks.merge import read_base_partitions

    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"))
    store = str(tmp_path / "store")
    write_bucketed_store(docs, store, "doc_id", n_buckets=64)
    pruned = read_base_partitions(spark, store, "kb", [3, 7])
    files = pruned.inputFiles()
    assert files, "pruned read found no files"
    assert all("/kb=3/" in f or "/kb=7/" in f for f in files), files[:5]
    # one file per bucket (the clustered-write layout contract)
    assert len(files) == 2, files
    # absent partitions degrade to None (callers fold against nothing)
    assert read_base_partitions(spark, store, "kb", [9999]) is None


def test_arrow_covariance_plan_is_pruned_and_model_bounded(spark):
    """The arrow covariance fold's scale contract in the physical plan:
    the corpus scan reads ONLY the vector column (pruning reaches the
    parquet scan through the mapInPandas projection), exactly one
    Python stage (the per-partition accumulator), and the only
    aggregate shuffle carries the (j, k, val) partial rows — dim^2 x
    partitions, never corpus-sized (no exchange of the embedding
    column after the Python node)."""
    from localsql_spark.operators.similarity import (
        _covariance_partials_arrow)

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    tot = _covariance_partials_arrow(emb.select("vec_id", "embedding"))
    plan = _plan(tot)
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and all("vec_id" not in ln and "label" not in ln
                         for ln in reads), \
        "scan must prune to the embedding column"
    assert plan.count("MapInPandas") == 1
    # the reduce shuffles the partials on (j, k): hashpartitioning of
    # the partial columns, and no exchange carries the vector column
    post = plan.split("MapInPandas")[0]  # executed bottom-up: the
    # aggregate above the Python node prints BEFORE it in the tree
    assert "hashpartitioning(j" in post
    for ln in post.splitlines():
        if "Exchange" in ln:
            assert "embedding" not in ln, \
                "no post-accumulator exchange may carry vectors"
