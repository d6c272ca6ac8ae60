#!/usr/bin/env python
"""Dump the load-bearing physical-plan lines (scans with pushdown/pruning,
exchanges, joins, codegen spans) for every benchmark headline query into
PLANS.md — the plan-quality audit artifact. Run after changing any query:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KEY = ("Scan parquet", "PushedFilters", "ReadSchema", "Exchange",
       "HashAggregate", "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
       "BroadcastNestedLoopJoin", "CartesianProduct", "TakeOrderedAndProject",
       "Window", "WholeStageCodegen", "ArrowEvalPython", "FlatMapGroupsInPandas",
       "MapInPandas", "ObjectHashAggregate", "InMemoryTableScan")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import bench
    from localsql_spark.session import get_spark
    from localsql_spark.workload import all_queries, load

    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    load(spark, sf_dir)

    # non-bench queries whose plans are still worth pinning in the audit
    # (kept out of bench.py so the round-over-round totals stay comparable)
    extra = ["qualify_top_suppliers", "grouping_sets_orders",
             "fn_stats_suite", "text_repetition_signals",
             "split_train_val_test", "sketch_bloom_membership",
             "embedding_kmeans_clusters", "events_retention_cohorts",
             "basket_part_pairs",
             # round-5 corpus-prep family
             "chunk_documents_64_16", "dedup_repeated_spans",
             "text_unigram_logprob", "profile_orders_columns",
             "hll_user_overlap", "dedup_containment_pairs",
             "mix_sources_temperature", "corpus_health_by_source",
             "zorder_zvalue_orders",
             # round-5 data-selection family (dsir_resample_top200 and
             # export_training_shards are bench headliners already)
             "gopher_quality_rules",
             # round-5 maintenance/governance family
             "validate_orders_constraints", "quarantine_orders_rows",
             "bpe_encode_fixed", "orders_segment_asof",
             "knn_pq_rerank_top5", "histogram_equidepth_values",
             "scd2_customer_asof",
             # round 6 additions (streaming_rollup_hourly excluded: its
             # query fn executes the stream and returns a checkpointed
             # result whose static plan is trivially empty)
             "scd2_store_history", "ccnet_perplexity_buckets",
             "embedding_outliers_z2", "near_dup_threshold_sweep",
             "winnowing_fingerprints", "winnowing_shared_pairs",
             "mix_token_budget_plan", "user_event_sequences",
             "knn_ivf_index_append_top5",
             # round 8 additions not in bench
             "er_customer_matches", "er_sorted_neighborhood",
             "pack_fill_stats", "er_fs_match_scores",
             "er_entities_multipass", "split_leakage_safe",
             "neardup_clustering_coeff", "knn_ivfpq_rerank_top5",
             "pack_chunks_cap128",
             # round 8 (late): corpus diversity audit
             # (quality_nb_seed_scores is a bench headliner;
             # quality_nb_incremental and streaming_nb_ingest run store
             # folds / a stream inside the query fn and return a
             # checkpointed frame — trivially-empty static plans, skipped
             # like streaming_rollup_hourly)
             "corpus_bigram_diversity", "bloom_filtered_orders_join",
             "cobucket_join_segment_revenue", "hard_negatives_top10"]
    # streaming twins execute the stream inside the query fn and return a
    # drained sink frame whose static plan is trivially empty — skip them
    # here exactly like streaming_rollup_hourly above
    # erase_users_everywhere likewise: the query fn copies the store
    # fixture, runs the erases eagerly and returns a checkpointed audit
    # frame — its static plan is trivially empty; the erase paths' plan
    # evidence is the prune-proof tests in tests/test_erase_propagate.py
    skip_streaming = {"streaming_interval_join_5m",
                      "erase_users_everywhere",
                      # round 10: same shape as erase_users_everywhere —
                      # the query fn trains/erases/rebuilds stores eagerly
                      # and returns a checkpointed comparison frame; the
                      # rebuild paths' plan evidence is the training
                      # queries' own sections (knn_ivfpq_top5 etc.)
                      "erase_rebuild_models",
                      # bpe_train runs its six merge rounds as an eager
                      # driver loop (one bounded pair-aggregation job per
                      # round) and returns the checkpointed merge table —
                      # static plan trivially empty; per-round plan
                      # evidence is bpe_pair_stats' section (same
                      # aggregation shape)
                      "bpe_train_merges",
                      # round 11: same shape — the RTBF probes erase
                      # eagerly through erase_everywhere and return a
                      # checkpointed read-back; the retraction paths'
                      # plan evidence is the prune tests in
                      # tests/test_erase_propagate.py (touched dates/
                      # buckets/batches only, byte-stable elsewhere)
                      "erase_rollup_probe", "erase_ivm_probe",
                      "erase_feed_probe"}
    names = list(dict.fromkeys(          # a name in bench AND extra audits once
        bench.HEADLINE
        + [n for n in bench.EXTENSION_HEADLINE
           if n in queries and n not in skip_streaming]
        + [n for n in extra if n in queries]))
    out = ["# PLANS — physical-plan audit of the benchmark headliners",
           "",
           f"Generated by `tools/plan_audit.py` at `{sf_dir}`. Only the",
           "load-bearing lines are kept: scans (pushdown + pruned schema),",
           "exchanges (each is a shuffle), join strategies, codegen spans.",
           "Counts are from the STATIC plan: AQE re-plans at runtime",
           "(shuffle joins of small sides become broadcasts, partitions",
           "coalesce), so executed exchange counts are <= these.",
           "BroadcastNestedLoopJoin(Cross) entries are the intended",
           "broadcast of the tiny kNN query set, not an accidental product.",
           "",
           "Counting caveat: a plan that persists a narrow intermediate",
           "(track_persist — e.g. ccnet_perplexity_buckets' (doc_id, ppl)",
           "table, winnowing_shared_pairs' fingerprint set) prints the",
           "cached InMemoryRelation's BUILD subtree at every reference, so",
           "its static exchange count here overcounts: the runtime builds",
           "the cache once and every other reference is an",
           "InMemoryTableScan.  Read those blocks' counts as 'build once +",
           "cheap scans', not N independent pipelines.",
           "",
           "Round-12 note on the committed BENCH_DETAIL: four same-code",
           "full-population runs on the round-12 build read 217.2 /",
           "135.9 / 119.8 / 124.8s raw at calibration drift 1.62 / 1.06",
           "/ 0.94 / 1.13 — the co-tenant load visible in the first run",
           "(machine load avg ~3.9) decayed across the session, and",
           "queries with ZERO changed code this round (range_join,",
           "events_session, scd2_customer_history) moved 1.37x between",
           "the r11 detail and today's best run, so the residual ~12%",
           "shared-subset delta vs r11's 93.7s is machine-day variance,",
           "not code (same conclusion as every prior drift episode, now",
           "with the calibration numbers to show it within one day).",
           "",
           "Round-12 adjudication of the r11 drift pair",
           "(`bm25_search_top10` 1.13->1.79s, `ccnet_perplexity_buckets`",
           "1.05->1.56s on unchanged code while r11 calibration said the",
           "machine was FASTER, drift 0.8952 — the r11 verdict's watch",
           "item, control protocol ordered): SPARK_GRAFT_BENCH_ONLY run",
           "of the pair ALONE (min-of-2, drift 1.3483 that session) gave",
           "bm25 1.734s / ccnet 1.753s; the full 67-query population run",
           "the same day (drift 1.1998) gave 1.690s / 1.544s — alone ==",
           "in-population, so NO population effect, same verdict as the",
           "r9/r10 clusters.  The sharper signal: raw wall matched r11's",
           "numbers on a machine the calibration probe measured ~34%",
           "SLOWER than r11's, i.e. these two queries do not scale with",
           "the calibration probe (both are fixed-overhead-heavy: bm25's",
           "probe reads STATS + a handful of term buckets, ccnet's wall",
           "is dominated by its persist build's job count, not scan",
           "bytes).  Their ~1.5-1.8s raw band is the steady state; r10's",
           "1.05-1.13 was the favorable end of the noise band, and r11's",
           "'2.0x normalized' was the calibration DIVIDING a",
           "non-calibration-sensitive query by a fast-machine drift",
           "factor.  Conclusion: not a regression — but a documented",
           "limit of drift-normalization for overhead-bound queries (raw",
           "wall is the number to watch for these two).",
           "",
           "Round-10 note on the r9 1.3x drift cluster",
           "(`hybrid_search_top10` 1.24->1.77s worst; also knn_ivf_top5,",
           "q3_top_orders, ccnet_perplexity_buckets): the controlled",
           "SPARK_GRAFT_BENCH_ONLY experiment (cluster alone vs the full",
           "61-query population, same session config, min-of-2, sf0.1)",
           "shows NO population effect — hybrid 1.446s alone vs 1.520s in",
           "population, knn_ivf_top5 1.583 vs 1.307, q3 0.923 vs 0.939,",
           "ccnet 1.609 vs 1.360 (two of four are FASTER in population,",
           "i.e. the deltas are run-to-run noise).  The r9 1.43x",
           "hybrid_search number did not reproduce (today ~1.5s both",
           "ways, vs r8's 1.24): transient machine contention during the",
           "r9 bench, as in rounds 5/6 — the r9 inverted-index erase",
           "hooks added no read-path work (plan shape unchanged below).",
           "",
           "Round-10 note on the `erase_users_everywhere` headline: its",
           "timed region used to byte-copy the store fixture per call;",
           "the per-call farm is now HARDLINKS (safe because every store",
           "mutation is staged-write + rename — new inodes, never a write",
           "through a link).  Measured split at sf0.1: link farm 0.03s,",
           "erase+audit 8.5s steady-state (builder-run numbers; the",
           "DRIVER record is BENCH_r10 = 8.67s — the builder's same-code",
           "full-population run totalled 78.67s vs the driver's 88.29s,",
           "a uniform ~1.12x environment drift, which is exactly what",
           "the round-11 bench calibration probe now measures per",
           "round).  The headline is the compliance loop: request-pruned",
           "erases across five stores plus five full-store audits (the",
           "audit SCANS each store to recount erased refs from the bytes;",
           "that full scan is the verification artifact, the erase itself",
           "is touched-partition-pruned, proven by the prune tests in",
           "tests/test_erase_propagate.py).  Static plans for it,",
           "erase_rebuild_models and bpe_train_merges are trivially empty",
           "(eager store ops / driver training loop + checkpointed",
           "result), hence no sections below; bpe_train's per-round",
           "aggregation shape is bpe_pair_stats' section.",
           "",
           "Round-11 note on bench drift (and why BENCH_CALIBRATION.json",
           "exists): the r11 builder's full run totalled ~102s vs r10's",
           "88.29s driver record, and the control worktree experiment",
           "(same 3-query subset on the UNCHANGED r10 commit, same day)",
           "reproduced the slowdown code-free: knn_ivfpq_top5 9.08s on",
           "r10 code vs 9.34s on r11 code (r10 record: 7.59s);",
           "knn_ivf_trained_planted 7.79s r10 code vs 6.83s r11 code.",
           "So the delta is ENVIRONMENT, with a twist the calibration",
           "probe now captures: the drift is NON-uniform — sub-second",
           "scan/agg queries ran at r10 speed while multi-second",
           "shuffle-heavy queries ran ~25% slower — which is why the",
           "probe includes a shuffle-heavy member (dedup_minhash_pairs)",
           "and why BENCH_DETAIL.json records pre/post calibration plus",
           "drift_vs_reference against the committed",
           "BENCH_CALIBRATION.json anchor: future rounds can separate",
           "machine from code without re-running this experiment.",
           "",
           "Round-6 note on the r5 `dedup_clusters_bigstar` (6.33s) and",
           "`pipeline_clean_corpus` (3.76s) `weak` marks: the controlled",
           "experiment the verdict asked for (SPARK_GRAFT_BENCH_ONLY, r4's",
           "30-query population alone vs the full population, same session",
           "config) shows NO population effect under the fixed pre-touched",
           "heap — bigstar 3.34s alone vs 3.43s in the full 43-query run,",
           "pipeline 2.51s vs 2.70s, common-30 total 24.7s (r4: 29.9s).",
           "Root cause of the r5 numbers was therefore transient machine",
           "contention during that round's driver bench, not the plan (the",
           "4-exchange alternating-star shape is unchanged) and not the",
           "enlarged population.  Both queries are back inside their",
           "targets (<=4s / <=3.5s) in BENCH_r06.",
           "",
           "Round-5 note on the r4 `dedup_minhash_pairs` regression (6.43s):",
           "root cause was NOT the query plan (shape unchanged below) but",
           "JVM heap growth — under the default growable driver heap, cache/",
           "shuffle pressure from the preceding bench population triggered",
           "kernel page-fault storms mid-query (profiled at ~60% system CPU",
           "on slow runs). Fixed in bench.py by a fixed pre-touched heap",
           "(-Xms=-Xmx -XX:+AlwaysPreTouch): the zeroing cost moves to",
           "session startup and `dedup_minhash_pairs` lands at ~1.7s.",
           ""]
    def _iteration_tree(df) -> list[str]:
        """Tree section of ``explain('formatted')`` with every
        InMemoryRelation subtree collapsed: the cached inputs are
        loop-invariant, so only the operators ABOVE them are per-round
        cost — counting the cached build plans' exchanges would wildly
        overstate the iteration."""
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        tree = []
        skip_indent = None
        for ln in buf.getvalue().splitlines():
            if ln.startswith("(1)"):
                break
            body = ln.rstrip()
            indent = len(body) - len(body.lstrip(" :+-*"))
            if skip_indent is not None:
                if body.strip() and indent > skip_indent:
                    continue
                skip_indent = None
            if "InMemoryRelation" in body:
                skip_indent = indent
                tree.append(" " * indent
                            + "+- ... (cached loop-invariant input)")
                continue
            if body:
                tree.append(body[:160])
        return tree

    # per-query semantics notes, emitted under the heading so future rounds
    # read the measurement's meaning alongside its plan
    NOTES = {
        "rollup_incremental_hourly": (
            "NOTE: this query tears down and rebuilds the persisted rollup "
            "from scratch each call (required for oracle checkability), so "
            "its bench time measures TWO full maintenance cycles plus "
            "teardown — NOT steady-state batch cost.  See "
            "rollup_steady_state_hourly for the per-batch number."),
        "rollup_steady_state_hourly": (
            "NOTE: clones a prebuilt base store (filesystem copy) and folds "
            "in only the ~1/13 ingest batch — the steady-state per-batch "
            "maintenance cost a capacity planner needs."),
    }

    for name in names:
        if name == "pagerank_event_transitions":
            # the localCheckpoint lineage cut erases the loop's plan from
            # the final DataFrame, so audit ONE un-checkpointed iteration
            # (the exact per-round shape) over the same transition edges
            from pyspark.sql import functions as F
            from pyspark.sql.window import Window

            from localsql_spark.operators.graph import pagerank_iteration_plan

            ev = spark.table("events")
            w = Window.partitionBy("user_id").orderBy("ts", "event_id")
            seq = ev.select("user_id", "event_type",
                            F.lead("event_type").over(w).alias("nxt"))
            edges = (seq.filter(F.col("nxt").isNotNull())
                     .groupBy(F.col("event_type").alias("src"),
                              F.col("nxt").alias("dst"))
                     .agg(F.count(F.lit(1)).cast("double").alias("w")))
            df = pagerank_iteration_plan(edges)
            tree = _iteration_tree(df)
            n_exchange = sum("Exchange" in ln and "Reused" not in ln
                             and "Broadcast" not in ln for ln in tree)
            n_bcast = sum("BroadcastExchange" in ln for ln in tree)
            out.append(f"## {name}  (per-ITERATION: {n_exchange} shuffle "
                       f"exchange(s), {n_bcast} broadcast(s))")
            out.append("One un-checkpointed iteration over the persisted "
                       "edge/node inputs (the final query's plan is "
                       "lineage-cut per round by design; cached subtrees "
                       "collapsed).  The single shuffle is the "
                       "contribution aggregate; both joins broadcast at "
                       "node-sized state — rank state never exceeds the "
                       "node count, so the broadcast holds at any corpus "
                       "scale where nodes are domains/types, and falls "
                       "back to a co-partitioned SMJ beyond that.")
            out.append("```")
            out.extend(tree)
            out.append("```")
            out.append("")
            continue
        else:
            df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        lines = [ln.rstrip() for ln in buf.getvalue().splitlines()
                 if any(k in ln for k in KEY)]
        n_exchange = sum("Exchange" in ln and "Reused" not in ln
                         for ln in lines)
        out.append(f"## {name}  ({n_exchange} exchange(s))")
        if name in NOTES:
            out.append(NOTES[name])
        out.append("```")
        out.extend(ln[:160] for ln in lines)
        out.append("```")
        out.append("")
    Path("PLANS.md").write_text("\n".join(out))
    print(f"PLANS.md written: {len(names)} queries")


if __name__ == "__main__":
    main()
