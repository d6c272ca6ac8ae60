#!/usr/bin/env python
"""Empirical skew-robustness check.

Builds two deliberately skewed datasets from sf0.1 and measures the
mitigations against their naive counterparts:

1. mass-duplicate corpus (2,000 verbatim copies of one document among the
   5,000 real ones) -> MinHash-LSH with and without ``bucket_cap``: the hot
   bucket pairs quadratically (~2M pairs) without the cap;
2. hot-key events (one user owns ~50% of all rows) -> plain groupBy vs
   ``salted_agg``, and a hot-key join vs ``salted_join``.

Results go to SKEW.md.

    python tools/skew_check.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from localsql_spark.catalog import _normalize_nanos
    from localsql_spark.operators import cleanup
    from localsql_spark.operators.dedup import minhash_lsh_pairs
    from localsql_spark.operators.skew import salted_agg, salted_join
    from localsql_spark.session import get_spark

    spark = get_spark(app_name="skew_check")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).agg(F.sum("id")).collect()

    lines = ["# SKEW — empirical skew-robustness of the mitigations", "",
             f"`tools/skew_check.py` on `{sf_dir}`.", ""]

    # -- 1: mass-duplicate corpus vs LSH bucket_cap -------------------------
    docs = spark.read.parquet(str(Path(sf_dir) / "documents.parquet"))
    one = docs.filter(F.col("doc_id") == 0).select("text").limit(1)
    clones = (spark.range(1_000_000, 1_002_000)
              .select(F.col("id").alias("doc_id"))
              .crossJoin(F.broadcast(one)))
    skewed_docs = (docs.select("doc_id", "text").unionByName(clones)
                   .repartition(32).localCheckpoint())

    t0 = time.perf_counter()
    n_uncapped = minhash_lsh_pairs(skewed_docs).count()
    t_uncapped = time.perf_counter() - t0
    cleanup()
    t0 = time.perf_counter()
    n_capped = minhash_lsh_pairs(skewed_docs, bucket_cap=64).count()
    t_capped = time.perf_counter() - t0
    cleanup()
    lines += [
        "## MinHash-LSH hot bucket (2,000 verbatim clones in the corpus)",
        "",
        "| variant | pairs emitted | wall |",
        "|---|---|---|",
        f"| no cap (hot bucket joins quadratically) | {n_uncapped:,} | {t_uncapped:.2f}s |",
        f"| bucket_cap=64 (over-cap buckets dropped; exact dedup owns them) | {n_capped:,} | {t_capped:.2f}s |",
        "",
    ]

    # -- 1b: same mass-duplicate corpus behind the SIGNATURE STORE, probed
    #        by a batch that hits the hot bucket ---------------------------
    import tempfile

    from localsql_spark.operators.dedup import (minhash_lsh_pairs_from_store,
                                                write_signature_store)

    store = tempfile.mkdtemp(prefix="skew_sig_store_")
    write_signature_store(skewed_docs, store)
    probe = (docs.filter(F.col("doc_id") < 50)
             .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text"))
    t0 = time.perf_counter()
    n_p_uncap = minhash_lsh_pairs_from_store(spark, store, probe).count()
    t_p_uncap = time.perf_counter() - t0
    cleanup()
    t0 = time.perf_counter()
    n_p_cap = minhash_lsh_pairs_from_store(spark, store, probe,
                                           bucket_cap=64).count()
    t_p_cap = time.perf_counter() - t0
    cleanup()
    lines += [
        "## Incremental probe against a store holding the same hot bucket",
        "",
        "(50-doc batch incl. one clone of the mass-duplicated text — the",
        "daily-ingest shape hitting corpus skew)",
        "",
        "| variant | pairs emitted | wall |",
        "|---|---|---|",
        f"| probe, no cap (one colliding doc drags the whole bucket) | {n_p_uncap:,} | {t_p_uncap:.2f}s |",
        f"| probe, bucket_cap=64 | {n_p_cap:,} | {t_p_cap:.2f}s |",
        "",
    ]

    # -- 1b2: same mass-duplicate corpus through phash_pairs group_cap ------
    # the 2,000 verbatim clones share ONE perceptual hash, so the pair
    # output alone is C(2000,2) ~ 2.0M rows; group_cap excludes the
    # over-cap hash group from expansion (an exact-duplicate cluster the
    # groupBy already names), same discipline as minhash's bucket_cap
    from localsql_spark.operators.multimodal import phash_pairs

    t0 = time.perf_counter()
    n_ph_uncap = phash_pairs(skewed_docs, max_hamming=3).count()
    t_ph_uncap = time.perf_counter() - t0
    cleanup()
    t0 = time.perf_counter()
    n_ph_cap = phash_pairs(skewed_docs, max_hamming=3,
                           group_cap=64).count()
    t_ph_cap = time.perf_counter() - t0
    cleanup()
    lines += [
        "## pHash near-dup pairs over the same mass-duplicate corpus",
        "",
        "| variant | pairs emitted | wall |",
        "|---|---|---|",
        f"| no cap (one hash group of 2,000 -> ~2.0M group-local pairs) | {n_ph_uncap:,} | {t_ph_uncap:.2f}s |",
        f"| group_cap=64 (over-cap hash groups excluded from expansion) | {n_ph_cap:,} | {t_ph_cap:.2f}s |",
        "",
    ]

    # -- 1b3: same corpus through the audio fingerprint's group_cap ---------
    # clones share one windowed spectral fingerprint too; the shared
    # hamming_banded_pairs machinery applies the identical guard
    from localsql_spark.operators.multimodal import audio_pairs

    t0 = time.perf_counter()
    n_af_uncap = audio_pairs(skewed_docs, max_hamming=3).count()
    t_af_uncap = time.perf_counter() - t0
    cleanup()
    t0 = time.perf_counter()
    n_af_cap = audio_pairs(skewed_docs, max_hamming=3,
                           group_cap=64).count()
    t_af_cap = time.perf_counter() - t0
    cleanup()
    lines += [
        "## Audio-fingerprint near-dup pairs over the same corpus",
        "",
        "| variant | pairs emitted | wall |",
        "|---|---|---|",
        f"| no cap (one fingerprint group of 2,000) | {n_af_uncap:,} | {t_af_uncap:.2f}s |",
        f"| group_cap=64 (shared hamming_banded_pairs guard) | {n_af_cap:,} | {t_af_cap:.2f}s |",
        "",
    ]

    # -- 1c: planted mega-cluster vs SemDeDup cluster_cap -------------------
    # 2,000 near-identical vectors (one real embedding + per-id jitter in one
    # dimension) collapse into a single k-means cell — the learned-blocking
    # analog of the LSH hot bucket; its pair block is quadratic in 2,000.
    from localsql_spark.operators.similarity import semdedup_prune

    emb = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet"))
    seed = emb.filter(F.col("vec_id") == 0).select("embedding").limit(1)
    mega = (spark.range(1_000_000, 1_002_000)
            .select(F.col("id").alias("vec_id"))
            .crossJoin(F.broadcast(seed))
            .select("vec_id",
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(
                            i == 0, x + (F.col("vec_id") % 1000)
                            * F.lit(1e-9)).otherwise(x))
                    .alias("embedding")))
    skewed_emb = (emb.select("vec_id", "embedding").unionByName(mega)
                  .repartition(32).localCheckpoint())
    t0 = time.perf_counter()
    n_sd_uncap = semdedup_prune(skewed_emb, n_clusters=32,
                                threshold=0.95).count()
    t_sd_uncap = time.perf_counter() - t0
    cleanup()
    t0 = time.perf_counter()
    n_sd_cap = semdedup_prune(skewed_emb, n_clusters=32, threshold=0.95,
                              cluster_cap=256).count()
    t_sd_cap = time.perf_counter() - t0
    cleanup()
    lines += [
        "## SemDeDup planted mega-cluster (2,000 near-identical vectors)",
        "",
        "| variant | rows kept | wall |",
        "|---|---|---|",
        f"| no cap (mega-cluster pair block is quadratic) | {n_sd_uncap:,} | {t_sd_uncap:.2f}s |",
        f"| cluster_cap=256 (over-cap clusters skip pruning, members kept) | {n_sd_cap:,} | {t_sd_cap:.2f}s |",
        "",
        "(4,000 = 2,000 real + 2,000 planted; real clusters prune nothing",
        "at threshold 0.95 — near-uniform random embeddings — so the kept",
        "delta is exactly the flagged mega-cluster's conservative keep-all,",
        "and the wall delta is its removed quadratic pair block.  The",
        "uncapped row is the GEMM backend's worst case: a mega-cluster",
        "defeats the filter-and-verify prefilter — every pair IS a",
        "candidate — so the exact rescore pays the full quadratic fold",
        "set anyway; cluster_cap is the guard that matters.)",
        "",
    ]

    # -- 2: hot-key aggregation / join --------------------------------------
    ev = spark.read.parquet(str(_normalize_nanos(Path(sf_dir) / "events.parquet")))
    hot = (ev.crossJoin(F.broadcast(spark.range(0, 1).select(F.lit(1).alias("__x"))))
           .select(F.lit(1).alias("user_id"), "event_type", "value"))
    skewed_ev = (ev.select("user_id", "event_type", "value")
                 .unionByName(hot.select("user_id", "event_type", "value"))
                 .repartition(32).localCheckpoint())
    n_rows = skewed_ev.count()

    t0 = time.perf_counter()
    plain = (skewed_ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("value").cast("decimal(18,2)")).alias("s"))
             .count())
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    salted = salted_agg(
        skewed_ev, ["user_id"],
        {"n": F.count(F.lit(1)),
         "s": F.sum(F.col("value").cast("decimal(18,2)"))},
        n_salts=32).count()
    t_salted = time.perf_counter() - t0

    dim = (skewed_ev.select("user_id").distinct()
           .withColumn("tag", F.concat(F.lit("u"), F.col("user_id"))))
    t0 = time.perf_counter()
    nj_plain = skewed_ev.join(dim, "user_id").count()
    t_jplain = time.perf_counter() - t0
    t0 = time.perf_counter()
    nj_salt = salted_join(skewed_ev, dim, on=["user_id"], n_salts=32).count()
    t_jsalt = time.perf_counter() - t0

    lines += [
        f"## Hot-key events (user 1 owns ~50% of {n_rows:,} rows)",
        "",
        "| operation | rows | wall |",
        "|---|---|---|",
        f"| plain groupBy (one reducer owns the hot key) | {plain:,} groups | {t_plain:.2f}s |",
        f"| salted_agg n_salts=32 (two-phase) | {salted:,} groups | {t_salted:.2f}s |",
        f"| plain equi-join on the hot key | {nj_plain:,} | {t_jplain:.2f}s |",
        f"| salted_join n_salts=32 | {nj_salt:,} | {t_jsalt:.2f}s |",
        "",
        "Notes: at local[32]/sf0.1 the hot key fits one core, so wall times",
        "stay close — the structural difference is the shuffle layout: the",
        "salted variants spread the hot key over n_salts reducers, which is",
        "what prevents a single straggler task at cluster scale.  AQE skew",
        "handling also splits sort-merge-join partitions automatically; the",
        "salted forms cover aggregations and broadcast-resistant joins,",
        "which AQE does not.",
        "The LSH bucket_cap and SemDeDup cluster_cap rows are the ones that",
        "change COMPLEXITY, not layout: the hot block's quadratic pair",
        "blowup disappears.  Over-cap LSH buckets stay covered by the",
        "exact-dedup hash pass; over-cap SemDeDup clusters keep all members",
        "(conservative — re-run the flagged cluster with more clusters).",
    ]

    # -- 3: hot DUPLICATE key through the quarantine unique-rule ------------
    # validate_and_split's unique() path aggregates the duplicate-key set
    # first (bounded: one row per distinct over-represented key), so the
    # annotate join broadcasts a tiny table even when one key owns half the
    # rows — the gate is skew-robust by construction, measured here.
    from localsql_spark.operators import quality as Q

    skewed_kv = (skewed_ev.select(
        F.col("user_id").alias("k"), "value")
        .localCheckpoint())
    uniform_kv = (ev.select(F.col("event_id").alias("k"), "value")
                  .repartition(32).localCheckpoint())
    t0 = time.perf_counter()
    _, q_hot = Q.validate_and_split(
        skewed_kv, [Q.unique("k"), Q.between("value", 0.0, 400.0)])
    n_q_hot = q_hot.count()
    t_q_hot = time.perf_counter() - t0
    cleanup()
    t0 = time.perf_counter()
    _, q_uni = Q.validate_and_split(
        uniform_kv, [Q.unique("k"), Q.between("value", 0.0, 400.0)])
    n_q_uni = q_uni.count()
    t_q_uni = time.perf_counter() - t0
    cleanup()
    lines += [
        "",
        "## Quarantine unique-rule under a hot duplicate key",
        "",
        "(same skewed events: user 1 owns ~50% of rows, so ~half the table",
        "is a unique(k) violation routed to quarantine)",
        "",
        "| input | quarantined | wall |",
        "|---|---|---|",
        f"| hot duplicate key (50% of rows share k=1) | {n_q_hot:,} | {t_q_hot:.2f}s |",
        f"| uniform unique keys (clean path) | {n_q_uni:,} | {t_q_uni:.2f}s |",
        "",
        "The duplicate-key side is aggregated before the annotate join (one",
        "row per over-represented key), so the join side stays tiny and",
        "broadcastable no matter how hot the key — no quadratic or",
        "straggler behavior to mitigate.",
    ]

    # -- 4: hot-hub PageRank (every node links to one hub) ------------------
    # The contribution groupBy(dst) piles the hub's whole incoming sum onto
    # one reducer; n_salts routes it through two-phase salted partials.
    from localsql_spark.operators.graph import pagerank

    n_nodes = 200_000
    star = (spark.range(1, n_nodes)
            .select(F.concat(F.lit("n"), F.col("id")).alias("src"),
                    F.lit("hub").alias("dst"), F.lit(1.0).alias("w"))
            .unionByName(spark.range(1, n_nodes).select(
                F.lit("hub").alias("src"),
                F.concat(F.lit("n"), F.col("id")).alias("dst"),
                F.lit(1.0).alias("w")))
            .repartition(32).localCheckpoint())
    t0 = time.perf_counter()
    n_pr_plain = pagerank(star, n_iter=3).count()
    t_pr_plain = time.perf_counter() - t0
    cleanup()
    t0 = time.perf_counter()
    n_pr_salt = pagerank(star, n_iter=3, n_salts=32).count()
    t_pr_salt = time.perf_counter() - t0
    cleanup()
    lines += [
        "",
        f"## Hot-hub PageRank (star graph: {n_nodes - 1:,} nodes all "
        "linking one hub, 3 iterations)",
        "",
        "| variant | nodes ranked | wall |",
        "|---|---|---|",
        f"| plain contribution groupBy (hub sum on one reducer) | {n_pr_plain:,} | {t_pr_plain:.2f}s |",
        f"| n_salts=32 (two-phase salted partials) | {n_pr_salt:,} | {t_pr_salt:.2f}s |",
        "",
        "Same layout story as salted_agg: at local[32] the hub fits one",
        "core so wall times stay close; the salted form is the one whose",
        "shuffle spreads the hub's incoming-mass sum over 32 reducers,",
        "which is what prevents a straggler at cluster scale.  The salt",
        "keys on the SOURCE node (deterministic), and only float sum",
        "ORDER changes — ranks agree to ~1 ulp (unit-pinned).",
    ]
    Path("SKEW.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
