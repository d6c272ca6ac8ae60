#!/usr/bin/env python
"""Empirical scaling check for the heavy operators.

Replicates the sf0.1 ``documents`` / ``embeddings`` / ``events`` tables Nx
(ids shifted, text/vectors perturbed so the near-duplicate RATE stays
constant instead of every row gaining N exact copies), then times each
heavy operator at 1x / 4x / 16x and reports the growth factor per 4x of
data.  A scale-safe (linear) operator should grow ~4x per step; quadratic
blowups show up as ~16x steps.  Results go to SCALE.md.

    python tools/scale_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# SPARK_GRAFT_SCALE_FACTORS overrides for targeted deep-scale probes
# (e.g. "1,4,16,64" to add a 64x point for a suspect curve); SCALE.md's
# table only auto-updates at the default factors — non-default runs print
# their rows for manual integration into the narrative.
_DEFAULT_FACTORS = (1, 4, 16)
FACTORS = tuple(int(x) for x in os.environ.get(
    "SPARK_GRAFT_SCALE_FACTORS", "1,4,16").split(","))


def replicate(spark, sf_dir: str, out_root: Path) -> dict[int, dict[str, str]]:
    """Write Nx variants of the tables; returns factor -> table -> path."""
    from pyspark.sql import functions as F

    from localsql_spark.catalog import _normalize_nanos

    out: dict[int, dict[str, str]] = {}
    docs = spark.read.parquet(str(_normalize_nanos(Path(sf_dir) / "documents.parquet")))
    emb = spark.read.parquet(str(_normalize_nanos(Path(sf_dir) / "embeddings.parquet")))
    ev = spark.read.parquet(str(_normalize_nanos(Path(sf_dir) / "events.parquet")))
    n_docs = docs.count()
    n_emb = emb.count()
    n_ev = ev.count()
    for f in FACTORS:
        paths = {}
        rep = F.explode(F.array(*[F.lit(i) for i in range(f)])).alias("r")
        d = (docs.select("*", rep)
             .select((F.col("doc_id") + F.col("r") * n_docs).alias("doc_id"),
                     # replica text gets a suffix so the near-dup rate stays
                     # ~constant; replica 0 keeps the original corpus intact
                     F.when(F.col("r") == 0, F.col("text"))
                     .otherwise(F.concat_ws(" ", "text",
                                            F.col("r").cast("string"),
                                            F.col("doc_id").cast("string")))
                     .alias("text"),
                     "lang", "source", "n_chars"))
        p = out_root / f"docs_{f}x"
        d.repartition(max(4, 2 * f)).write.mode("overwrite").parquet(str(p))
        paths["documents"] = str(p)
        e = (emb.select("*", rep)
             .select((F.col("vec_id") + F.col("r") * n_emb).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: x + F.col("r").cast("float") / 1000)
                     .alias("embedding"),
                     "label"))
        p = out_root / f"emb_{f}x"
        e.repartition(max(4, 2 * f)).write.mode("overwrite").parquet(str(p))
        paths["embeddings"] = str(p)
        v = (ev.select("*", rep)
             .select((F.col("event_id") + F.col("r") * n_ev).alias("event_id"),
                     (F.col("ts") + F.make_interval(mins=F.col("r"))).alias("ts"),
                     (F.col("user_id") + F.col("r") * 1000).alias("user_id"),
                     "event_type", "value", "props"))
        p = out_root / f"ev_{f}x"
        v.repartition(max(4, 2 * f)).write.mode("overwrite").parquet(str(p))
        paths["events"] = str(p)
        out[f] = paths
    return out


def _fmt_row(name: str, r: dict[int, float]) -> str:
    g1 = r[4] / r[1] if r[1] else float("nan")
    g2 = r[16] / r[4] if r[4] else float("nan")
    return (f"| {name} | {r[1]:.2f}s | {r[4]:.2f}s | {r[16]:.2f}s "
            f"| {g1:.1f}x | {g2:.1f}x |")


def update_scale_md(results: dict[str, dict[int, float]],
                    scale_md: Path = Path("SCALE.md")) -> bool:
    """Surgical SCALE.md update: replace/append only the measured rows so
    a filtered run (SPARK_GRAFT_SCALE_ONLY) or re-measure preserves every
    other row and all hand-written analysis below the table.  Returns
    True if the surgical path applied; False means the caller should
    write the full document (file absent, or hand-truncated to no table
    rows at all — that case must fall through instead of crashing on a
    row-less max())."""
    if not (scale_md.exists() and any(
            ln.startswith("|") for ln in scale_md.read_text().splitlines())):
        return False
    out_lines = scale_md.read_text().splitlines()
    done = set()
    for i, ln in enumerate(out_lines):
        parts = [p.strip() for p in ln.split("|")]
        if len(parts) > 2 and parts[1] in results:
            out_lines[i] = _fmt_row(parts[1], results[parts[1]])
            done.add(parts[1])
    missing = [n for n in results if n not in done]
    if missing:
        # append after the FIRST table block (the main operator table),
        # not the last "|" line in the file — the hand-written 64x
        # narrative tables below would otherwise swallow new rows
        # (happened twice in round 10)
        first_row = next(i for i, ln in enumerate(out_lines)
                         if ln.startswith("|"))
        last_row = first_row
        while last_row + 1 < len(out_lines) \
                and out_lines[last_row + 1].startswith("|"):
            last_row += 1
        out_lines[last_row + 1:last_row + 1] = [
            _fmt_row(n, results[n]) for n in missing]
    scale_md.write_text("\n".join(out_lines) + "\n")
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from localsql_spark.operators import cleanup
    from localsql_spark.operators import dedup as D
    from localsql_spark.operators import events as E
    from localsql_spark.operators import similarity as S
    from localsql_spark.session import get_spark

    import os
    # fixed pre-touched heap: growable-heap page-fault storms skew growth
    # ratios exactly like they skewed bench timings (see bench.py)
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "16g")
    spark = get_spark(app_name="scale_check", extra_conf={
        "spark.driver.memory": heap,
        "spark.driver.extraJavaOptions": f"-Xms{heap} -XX:+AlwaysPreTouch"})
    spark.sparkContext.setLogLevel("ERROR")
    root = Path(tempfile.mkdtemp(prefix="scale_check_"))
    print(f"# replicating {sf_dir} into {root}", file=sys.stderr)
    paths = replicate(spark, sf_dir, root)
    # JIT warmup
    spark.range(0, 1_000_000).agg(F.sum("id")).collect()

    def op_minhash(f):
        docs = spark.read.parquet(paths[f]["documents"])
        return D.minhash_lsh_pairs(docs, threshold=0.5).count()

    def op_clusters_bigstar(f):
        docs = spark.read.parquet(paths[f]["documents"])
        pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
        return D.connected_components_bigstar(pairs).count()

    def op_exact_dedup(f):
        docs = spark.read.parquet(paths[f]["documents"])
        return D.exact_dedup(docs).count()

    def op_knn_ivf(f):
        emb = spark.read.parquet(paths[f]["embeddings"])
        queries = emb.filter(F.col("vec_id") < 50)
        return S.knn_ivf(emb, queries).count()

    def op_asof(f):
        ev = spark.read.parquet(paths[f]["events"])
        pur = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"), "user_id",
            F.col("ts").cast("timestamp").alias("pts"))
        clk = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("cid"), "user_id",
            F.col("ts").cast("timestamp").alias("cts"))
        return E.asof_join(pur, clk, on=["user_id"], left_ts="pts",
                           right_ts="cts", right_cols=["cid"],
                           tiebreak="cid").count()

    def op_kmeans(f):
        emb = spark.read.parquet(paths[f]["embeddings"])
        return S.kmeans_lloyd(emb, n_clusters=8, n_iter=1).count()

    def op_repetition(f):
        from localsql_spark.operators import text as T
        docs = spark.read.parquet(paths[f]["documents"])
        return docs.select(
            T.distinct_word_ratio(F.col("text")).alias("a"),
            T.top_word_fraction(F.col("text")).alias("b"),
            T.dup_ngram_fraction(F.col("text"), 2).alias("c")).count()

    def op_semdedup(f):
        emb = spark.read.parquet(paths[f]["embeddings"])
        # production posture: cluster count scales WITH the corpus so the
        # expected cluster size (and the per-cluster quadratic pair block)
        # stays constant — SemDeDup at web scale runs ~100k clusters.  The
        # IVF-accelerated variant keeps assignment O(N*(kc + k/kc)); the
        # flat operator at k=8f measured 7.8x wall per 4x data here.
        return S.semdedup_prune_two_level(
            emb, n_clusters=8 * f, n_coarse=max(4, 2 * f),
            threshold=0.4).count()

    def op_merge_upsert(f):
        from localsql_spark.operators import hash32
        from localsql_spark.sinks.merge import merge_into_partitioned
        docs = spark.read.parquet(paths[f]["documents"])
        base_dir = str(root / f"merge_base_{f}x")
        docs.withColumn("version", F.lit(1)).write.mode("overwrite") \
            .partitionBy("lang").parquet(base_dir)
        updates = (docs.filter(hash32(F.col("doc_id")) % 7 == 0)
                   .withColumn("version", F.lit(2)))
        # the base-table write above is fixture setup, not merge cost: time
        # the merge itself and return (rows, elapsed) so the harness reports
        # merge_into_partitioned scaling rather than setup scaling
        t0 = time.perf_counter()
        merge_into_partitioned(spark, base_dir, updates, key="doc_id",
                               version="version", partition_col="lang")
        dt = time.perf_counter() - t0
        return spark.read.parquet(base_dir).count(), dt

    def op_incremental_store(f):
        from localsql_spark.operators import dedup as D
        from localsql_spark.operators import hash32
        docs = spark.read.parquet(paths[f]["documents"])
        is_new = hash32(F.col("doc_id")) % 9 == 0
        store = str(root / f"sig_store_{f}x")
        # the store write is yesterday's run (fixture); time the probe only —
        # the daily cost a pipeline actually pays
        D.write_signature_store(docs.filter(~is_new), store)
        t0 = time.perf_counter()
        n = D.minhash_lsh_pairs_from_store(
            spark, store, docs.filter(is_new), threshold=0.5).count()
        return n, time.perf_counter() - t0

    def op_banded_index(f):
        from localsql_spark.operators import dedup as D
        from localsql_spark.operators import hash32
        docs = spark.read.parquet(paths[f]["documents"])
        is_new = hash32(F.col("doc_id")) % 9 == 0
        store = str(root / f"bsig_{f}x")
        index = str(root / f"bidx_{f}x")
        D.write_signature_store(docs.filter(~is_new), store)
        D.write_banded_index(D.read_signature_store(spark, store), index)
        t0 = time.perf_counter()
        n = D.minhash_lsh_pairs_from_banded_index(
            spark, index, store, docs.filter(is_new), threshold=0.5).count()
        return n, time.perf_counter() - t0

    def op_knn_ivf_index(f):
        from localsql_spark.operators import similarity as S2
        emb = spark.read.parquet(paths[f]["embeddings"])
        index = str(root / f"ivfidx_{f}x")
        S2.write_ivf_index(emb, index, n_cells=16)
        t0 = time.perf_counter()
        n = S2.knn_ivf_from_index(
            spark, index, emb.filter(F.col("vec_id") < 10), k=5,
            n_probe=4).count()
        return n, time.perf_counter() - t0

    def op_quantile_sketch(f):
        from localsql_spark.operators.sketches import (quantile_estimates,
                                                       quantile_sketch)
        ev = spark.read.parquet(paths[f]["events"])
        return quantile_estimates(
            quantile_sketch(ev, "value", "event_id")).count()

    def op_chunk(f):
        from localsql_spark.operators.corpus import chunk_documents
        docs = spark.read.parquet(paths[f]["documents"])
        return chunk_documents(docs, chunk=64, overlap=16).count()

    def op_repeated_spans(f):
        from localsql_spark.operators.corpus import repeated_spans
        docs = spark.read.parquet(paths[f]["documents"])
        return repeated_spans(docs, span=8, min_docs=2).count()

    def op_unigram_logprob(f):
        from localsql_spark.operators.corpus import unigram_logprob
        docs = spark.read.parquet(paths[f]["documents"])
        return unigram_logprob(docs).count()

    def op_nb_seed(f):
        from localsql_spark.operators.selection import nb_seed_scores
        docs = spark.read.parquet(paths[f]["documents"])
        return nb_seed_scores(
            docs, F.substring("source", 4, 10).cast("int") < 5).count()

    def op_ngram_diversity(f):
        from localsql_spark.operators.corpus import ngram_diversity
        docs = spark.read.parquet(paths[f]["documents"])
        return ngram_diversity(docs, n=2, group_col="source").count()

    def op_hybrid_retrieval(f):
        from localsql_spark.operators.similarity import \
            hybrid_bm25_cosine_topk
        docs = spark.read.parquet(paths[f]["documents"])
        emb = spark.read.parquet(paths[f]["embeddings"])
        return hybrid_bm25_cosine_topk(
            docs, emb, ["join", "hash", "vector"], query_vec_id=0,
            shortlist=50, k=10).count()

    def op_sketch_view_fold(f):
        # steady-state fold: view prebuilt from 12/13 of the corpus, the
        # timed section folds ONE batch-sized delta — the daily-loop cost
        import shutil
        import tempfile

        from localsql_spark.sinks.sketch_view import sketch_view_update
        docs = spark.read.parquet(paths[f]["documents"])
        scratch = Path(tempfile.mkdtemp(prefix="scale_sketch_"))
        view = str(scratch / "view")
        bucket = F.pmod(F.col("doc_id"), F.lit(13))
        sketch_view_update(spark, view, docs.filter(bucket != 0))
        t0 = time.perf_counter()
        sketch_view_update(spark, view, docs.filter(bucket == 0))
        dt = time.perf_counter() - t0
        n = spark.read.option("basePath", view).parquet(view).count()
        shutil.rmtree(scratch, ignore_errors=True)
        return n, dt

    def op_index_fold(f):
        # steady-state fold: index prebuilt from 12/13 of the corpus, the
        # timed section folds ONE batch-sized delta
        import shutil
        import tempfile

        from localsql_spark.sinks.inverted_index import index_add_documents
        docs = spark.read.parquet(paths[f]["documents"])
        scratch = Path(tempfile.mkdtemp(prefix="scale_invidx_"))
        idx = str(scratch / "index")
        bucket = F.pmod(F.col("doc_id"), F.lit(13))
        index_add_documents(spark, idx, docs.filter(bucket != 0))
        t0 = time.perf_counter()
        index_add_documents(spark, idx, docs.filter(bucket == 0))
        dt = time.perf_counter() - t0
        n = spark.read.option("basePath", idx).parquet(idx).count()
        shutil.rmtree(scratch, ignore_errors=True)
        return n, dt

    def op_index_probe(f):
        # serving steady state: build once outside the timer, probe inside
        import shutil
        import tempfile

        from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                         index_add_documents)
        docs = spark.read.parquet(paths[f]["documents"])
        scratch = Path(tempfile.mkdtemp(prefix="scale_invprobe_"))
        idx = str(scratch / "index")
        index_add_documents(spark, idx, docs)
        t0 = time.perf_counter()
        n = bm25_from_index(spark, idx,
                            ["table", "join", "window", "hash"]).count()
        dt = time.perf_counter() - t0
        shutil.rmtree(scratch, ignore_errors=True)
        return n, dt

    def op_erase_fixed_request(f):
        # right-to-be-forgotten scaling claim: erase cost tracks the
        # REQUEST, not the store.  Fixed ~n/53-key request drawn from the
        # 1x id range (present at every factor) against a store growing
        # with f; n_buckets grows WITH the store (production posture —
        # constant expected bucket size, same discipline as semdedup's k)
        # so the touched-bucket rewrite stays request-bounded.  Store
        # build is fixture; the timer covers erase_keys only.
        from localsql_spark.operators import hash32
        from localsql_spark.sinks.erase import (erase_keys,
                                                write_bucketed_store)
        docs = spark.read.parquet(paths[f]["documents"])
        n_base = docs.count() // f
        n_buckets = 32 * f
        store = str(root / f"erase_store_{f}x")
        write_bucketed_store(docs.select("doc_id", "lang", "text"), store,
                             "doc_id", n_buckets=n_buckets)
        keys = (docs.filter((F.col("doc_id") < n_base)
                            & (hash32(F.col("doc_id")) % 53 == 0))
                .select("doc_id").localCheckpoint(eager=True))
        t0 = time.perf_counter()
        erase_keys(spark, store, keys, "doc_id", n_buckets=n_buckets)
        dt = time.perf_counter() - t0
        return (spark.read.option("basePath", store).parquet(store)
                .count(), dt)

    def op_erase_sig_store_fixed_request(f):
        # same claim for the near-dup state: the signature-store erase
        # rewrites only the erased docs' own kb buckets and band-key
        # prefixes (plus the sidecar meta re-stamp) — fixed request vs a
        # signature store growing with f.  Store + banded sidecar build
        # is fixture; the timer covers erase_from_signature_store only.
        from localsql_spark.operators import dedup as D2
        from localsql_spark.operators import hash32
        docs = spark.read.parquet(paths[f]["documents"])
        n_base = docs.count() // f
        store = str(root / f"erase_sig_{f}x")
        index = str(root / f"erase_sig_{f}x_banded")
        D2.write_signature_store(docs, store)
        D2.ensure_banded_index(spark, store, index)
        keys = (docs.filter((F.col("doc_id") < n_base)
                            & (hash32(F.col("doc_id")) % 53 == 0))
                .select("doc_id").localCheckpoint(eager=True))
        t0 = time.perf_counter()
        D2.erase_from_signature_store(spark, store, keys,
                                      index_path=index)
        dt = time.perf_counter() - t0
        return D2.read_signature_store(spark, store).count(), dt

    def op_erase_rollup_fixed_request(f):
        # aggregate-retraction scaling: a FIXED base-range user request
        # against a rollup maintained over events growing with f.  The
        # rollup store itself stays hours x types rows at every factor
        # (the aggregate's cardinality is corpus-independent), so the
        # claim under test is the RETRACTION pipeline: subjects' batch
        # aggregate (one pass over the subjects' slice), touched-date
        # pruned store read + swap (flat), and the min/max heal scan
        # (kept events in touched dates, broadcast-semi-pruned to heal
        # groups before aggregating).  Build is fixture; timer covers
        # erase_from_rollup only.
        from localsql_spark.operators import hash32
        from localsql_spark.sinks.rollup import (erase_from_rollup,
                                                 maintain_rollup)
        import shutil
        ev = spark.read.parquet(paths[f]["events"])
        roll = str(root / f"erase_roll_{f}x")
        shutil.rmtree(roll, ignore_errors=True)  # fresh per attempt
        maintain_rollup(spark, roll, ev, grain="hour")
        keys = (ev.filter((F.col("user_id") < 1000)
                          & (hash32(F.col("user_id")) % 53 == 0))
                .select("user_id").distinct()
                .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        dates = erase_from_rollup(spark, roll, ev, keys, "user_id",
                                  grain="hour")
        dt = time.perf_counter() - t0
        return len(dates), dt

    def op_erase_ivm_fixed_request(f):
        # join-view retraction scaling: fixed base-range subject set vs a
        # fact table growing with f; the view (64 groups) is corpus-
        # independent, so the timed pipeline is the subjects' Δ ⋈ dim
        # aggregate + the touched-bucket-pruned fold.  Build is fixture;
        # timer covers erase_from_view only.
        from localsql_spark.operators import hash32
        from localsql_spark.sinks.ivm import (erase_from_view,
                                              maintain_join_view)
        ev = spark.read.parquet(paths[f]["events"])
        dim = (ev.select("user_id").distinct()
               .select("user_id", F.pmod(F.col("user_id"), F.lit(64))
                       .alias("grp")))
        import shutil
        view = str(root / f"erase_view_{f}x")
        shutil.rmtree(view, ignore_errors=True)  # fresh per attempt
        for sidecar in (f".erase_view_{f}x.meta.json",
                        f".erase_view_{f}x.schema.json"):
            (root / sidecar).unlink(missing_ok=True)
        maintain_join_view(spark, view, ev, dim, fact_key="user_id",
                           dim_key="user_id", group_col="grp",
                           value_col="value")
        keys = (ev.filter((F.col("user_id") < 1000)
                          & (hash32(F.col("user_id")) % 53 == 0))
                .select("user_id").distinct()
                .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        buckets = erase_from_view(spark, view, ev, keys, "user_id", dim,
                                  fact_key="user_id", dim_key="user_id",
                                  group_col="grp", value_col="value")
        dt = time.perf_counter() - t0
        return len(buckets), dt

    def op_erase_feed_fixed_request(f):
        # durable-CDC-feed erasure scaling: 8 feed batches whose SIZE
        # grows with f; the subject set is pinned to 2 of the 8 batches
        # (base ids with doc_id % 8 in {0,1}), so the claim under test is
        # that only those 2 dirs rewrite — the key scan reads the feed
        # once (column-pruned), the rewrite cost tracks the touched
        # batches.  Feed production is fixture; timer covers
        # erase_from_feed only.
        from localsql_spark.operators import hash32
        from localsql_spark.streaming.foreach_upsert import (
            apply_batch_with_feed, erase_from_feed)
        docs = spark.read.parquet(paths[f]["documents"])
        n_base = docs.count() // f
        import shutil
        froot = root / f"erase_feed_{f}x"
        shutil.rmtree(froot, ignore_errors=True)  # fresh per attempt
        out_dir, feed_dir = froot / "table", froot / "feed"
        out_dir.mkdir(parents=True, exist_ok=True)
        feed_dir.mkdir(parents=True, exist_ok=True)
        base = docs.select("doc_id", F.lit(1).alias("version"),
                           F.col("text"))
        for i in range(8):
            apply_batch_with_feed(
                base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == i), i,
                key="doc_id", version="version", out_dir=str(out_dir),
                feed_dir=str(feed_dir))
        keys = (docs.filter((F.col("doc_id") < n_base)
                            & (F.pmod(F.col("doc_id"), F.lit(8)) < 2)
                            & (hash32(F.col("doc_id")) % 53 == 0))
                .select("doc_id").localCheckpoint(eager=True))
        t0 = time.perf_counter()
        touched = erase_from_feed(spark, str(feed_dir), keys, "doc_id")
        dt = time.perf_counter() - t0
        assert sorted(touched) == [0, 1], touched
        return len(touched), dt

    def op_access_fixed_request(f):
        # subject-ACCESS export scaling (the read half of the erase pair):
        # primary store grows with f, the subject set is pinned to base
        # ids — the claim under test is that the export's cost tracks the
        # REQUEST (bucket-pruned read + broadcast semi join), not the
        # store.  Store build is fixture; timer covers export_subject +
        # materialization.
        from localsql_spark.operators import hash32
        from localsql_spark.sinks.erase import (export_subject,
                                                write_bucketed_store)
        docs = spark.read.parquet(paths[f]["documents"])
        n_base = docs.count() // f
        import shutil
        base = root / f"access_store_{f}x"
        shutil.rmtree(base, ignore_errors=True)
        write_bucketed_store(docs.select("doc_id", "lang", "text"),
                             str(base), "doc_id", n_buckets=64)
        keys = (docs.filter((F.col("doc_id") < n_base)
                            & (hash32(F.col("doc_id")) % 53 == 0))
                .select("doc_id").localCheckpoint(eager=True))
        t0 = time.perf_counter()
        exp = export_subject(
            spark, keys,
            primary={"base_dir": str(base), "key_col": "doc_id",
                     "n_buckets": 64})
        n = exp["primary"].count()
        dt = time.perf_counter() - t0
        return n, dt

    def op_retention_expire(f):
        # partition-grained retention expiry: the store grows with f but
        # the delete is METADATA-ONLY (driver listing + manifest commit),
        # so wall should be FLAT — no Spark job at all.
        from localsql_spark.sinks.merge import expire_partitions
        ev = spark.read.parquet(paths[f]["events"])
        base = str(root / f"retention_{f}x")
        (ev.select("event_id", F.date_format("ts", "yyyy-MM-dd")
                   .alias("d"), "value")
         .repartition(F.col("d"))
         .write.mode("overwrite").partitionBy("d").parquet(base))
        dates = sorted(p.name[2:] for p in Path(base).glob("d=*"))
        cutoff = dates[min(3, len(dates) - 1)]
        t0 = time.perf_counter()
        removed = expire_partitions(base, "d", cutoff)
        dt = time.perf_counter() - t0
        assert removed, "expiry must drop the oldest partitions"
        return len(removed), dt

    def op_table_as_of(f):
        # feed time travel: reconstruct the table as of batch 3 of 8 —
        # the replay cost tracks the READ PREFIX (4 of 8 batch dirs,
        # growing with corpus), never the feed's full length; linear
        # growth in f is the documented contract (travel from the
        # nearest downstream snapshot when the prefix dominates).
        from localsql_spark.streaming.foreach_upsert import (
            apply_batch_with_feed, table_as_of)
        docs = spark.read.parquet(paths[f]["documents"])
        import shutil
        froot = root / f"asof_feed_{f}x"
        shutil.rmtree(froot, ignore_errors=True)
        out_dir, feed_dir = froot / "table", froot / "feed"
        out_dir.mkdir(parents=True, exist_ok=True)
        feed_dir.mkdir(parents=True, exist_ok=True)
        base = docs.select("doc_id", F.lit(1).alias("version"),
                           F.col("text"))
        for i in range(8):
            apply_batch_with_feed(
                base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == i), i,
                key="doc_id", version="version", out_dir=str(out_dir),
                feed_dir=str(feed_dir))
        t0 = time.perf_counter()
        n = table_as_of(spark, str(feed_dir), key="doc_id",
                        batch_id=3).count()
        dt = time.perf_counter() - t0
        return n, dt

    def op_pca_covariance(f):
        # exact-covariance fold: dim^2 products per row, map-side combine,
        # shuffle bounded at dim^2 x partitions — wall should track the
        # corpus linearly (the explode is row-local CPU)
        from localsql_spark.operators.similarity import covariance_matrix
        emb = spark.read.parquet(paths[f]["embeddings"])
        return covariance_matrix(emb).count()

    def op_profile(f):
        from localsql_spark.operators.corpus import profile_columns
        ev = spark.read.parquet(paths[f]["events"])
        return profile_columns(ev, [
            ("event_id", "num"), ("user_id", "num"), ("event_type", "str"),
            ("value", "num")]).count()

    def op_zorder_write(f):
        from localsql_spark.sinks.layout import write_zordered
        ev = spark.read.parquet(paths[f]["events"])
        out = str(root / f"zorder_{f}x")
        write_zordered(ev.select("event_id", "user_id", "value"), out,
                       "user_id", "value", n_files=4 * f)
        return spark.read.parquet(out).count()

    def op_rollup_maintain(f):
        from localsql_spark.sinks.rollup import maintain_rollup
        ev = spark.read.parquet(paths[f]["events"])
        out = str(root / f"rollup_{f}x")
        # bulk load is fixture (yesterday's rollup); time ONE batch fold —
        # the recurring cost a pipeline actually pays
        is_new = F.pmod(F.col("event_id"), F.lit(11)) == 0
        maintain_rollup(spark, out, ev.filter(~is_new))
        t0 = time.perf_counter()
        maintain_rollup(spark, out, ev.filter(is_new))
        dt = time.perf_counter() - t0
        return spark.read.parquet(out).count(), dt

    def op_dsir_weights(f):
        from localsql_spark.operators.selection import dsir_weights
        docs = spark.read.parquet(paths[f]["documents"])
        return dsir_weights(docs, is_target=F.col("lang") == "en",
                            n_buckets=1024).count()

    def op_shard_export(f):
        from localsql_spark.sinks.shards import (shard_manifest,
                                                 write_training_shards)
        docs = spark.read.parquet(paths[f]["documents"])
        out = str(root / f"shards_{f}x")
        # shard count scales with data (a real pipeline holds shard SIZE
        # constant); manifest is n_shards rows either way
        write_training_shards(docs, out, n_shards=16 * f)
        return shard_manifest(spark.read.parquet(out)).count()

    def op_table_diff(f):
        from localsql_spark.operators.diff import table_diff
        docs = spark.read.parquet(paths[f]["documents"])
        key = F.col("doc_id")
        new = (docs.filter(key % 101 != 0)
               .withColumn("source", F.when(key % 97 == 0, F.lit("moved"))
                           .otherwise(F.col("source")))
               .unionByName(docs.filter(key % 103 == 0)
                            .withColumn("doc_id", key + 100_000_000)))
        return table_diff(docs, new, ["doc_id"],
                          ["source", "n_chars"]).count()

    def op_scd2_apply(f):
        from localsql_spark.operators.scd2 import scd2_apply, scd2_init
        docs = spark.read.parquet(paths[f]["documents"])
        dim = docs.select("doc_id", "source", "lang")
        hist = scd2_init(dim, ["doc_id"], ["source", "lang"], 1_000_000)
        upd = (dim.filter(F.col("doc_id") % 7 == 0)
               .withColumn("source", F.lit("migrated")))
        return scd2_apply(hist, upd, ["doc_id"], ["source", "lang"],
                          2_000_000).count()

    def op_quarantine(f):
        from localsql_spark.operators import quality as Q
        ev = spark.read.parquet(paths[f]["events"])
        _, quarantined = Q.validate_and_split(ev, [
            Q.not_null("user_id"), Q.unique("event_id"),
            Q.between("value", 0.0, 400.0),
            Q.matches("event_type", "^(view|click|cart)$"),
        ])
        return quarantined.count()

    def op_pagerank(f):
        from pyspark.sql.window import Window

        from localsql_spark.operators.graph import pagerank
        ev = spark.read.parquet(paths[f]["events"])
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = ev.select("user_id", "event_type",
                        F.lead("event_type").over(w).alias("nxt"))
        edges = (seq.filter(F.col("nxt").isNotNull())
                 .groupBy(F.col("event_type").alias("src"),
                          F.col("nxt").alias("dst"))
                 .agg(F.count(F.lit(1)).cast("double").alias("w")))
        return pagerank(edges, n_iter=6).count()

    def op_bpe_pairs(f):
        from localsql_spark.operators.corpus import (_chars, bpe_pair_counts,
                                                     word_frequencies)
        docs = spark.read.parquet(paths[f]["documents"])
        syms = (word_frequencies(docs)
                .select("word", "cnt", _chars(F.col("word")).alias("syms")))
        return bpe_pair_counts(syms).count()

    def op_winnowing(f):
        from localsql_spark.operators.text import winnowing_fingerprints
        docs = spark.read.parquet(paths[f]["documents"])
        return winnowing_fingerprints(docs, k=8, w=4).count()

    def op_perplexity_buckets(f):
        from localsql_spark.operators.selection import perplexity_buckets
        docs = spark.read.parquet(paths[f]["documents"])
        return perplexity_buckets(docs).count()

    def op_embedding_outliers(f):
        from localsql_spark.operators.similarity import embedding_outliers
        emb = spark.read.parquet(paths[f]["embeddings"])
        return embedding_outliers(emb, n_clusters=8, n_iter=1).count()

    def op_threshold_sweep(f):
        # calibration runs on a FIXED-SIZE hash sample (sample_mod scales
        # with the data) — exhaustive sweeps grow quadratically in bucket
        # occupancy and are not the intended 100 TB shape (see docstring)
        from localsql_spark.operators.similarity import near_dup_threshold_sweep
        emb = spark.read.parquet(paths[f]["embeddings"])
        return near_dup_threshold_sweep(emb, sample_mod=f).count()

    def op_novelty(f):
        # .count() would let Catalyst PRUNE the novelty join entirely
        # (unique-keyed left join adding no counted columns) and report a
        # flat fake — aggregate a real output column to force the work
        from localsql_spark.operators.corpus import doc_novelty_scores
        docs = spark.read.parquet(paths[f]["documents"])
        return int(doc_novelty_scores(docs, span=8)
                   .agg(F.sum("n_shared_spans")).collect()[0][0])

    def op_remove_spans(f):
        from localsql_spark.operators.corpus import remove_repeated_spans
        docs = spark.read.parquet(paths[f]["documents"])
        return int(remove_repeated_spans(docs, span=8)
                   .agg(F.sum("n_tokens_after"),
                        F.max("cleaned_hash")).collect()[0][0])

    def op_decon_exact(f):
        from localsql_spark.operators.selection import decontaminate_exact
        docs = spark.read.parquet(paths[f]["documents"])
        row = (decontaminate_exact(docs)
               .agg(F.count(F.lit(1)), F.sum("n_shared")).collect()[0])
        return int(row[0])

    def op_decon_bloom(f):
        from localsql_spark.operators.selection import decontaminate_bloom
        docs = spark.read.parquet(paths[f]["documents"])
        row = (decontaminate_bloom(docs)
               .agg(F.count(F.lit(1)), F.sum("n_shared")).collect()[0])
        return int(row[0])

    def op_phash_pairs(f):
        # aggregate real outputs (hamming sum) so Catalyst can't prune
        from localsql_spark.operators.multimodal import phash_pairs
        docs = spark.read.parquet(paths[f]["documents"])
        row = (phash_pairs(docs, max_hamming=3)
               .agg(F.count(F.lit(1)), F.sum("hamming")).collect()[0])
        return int(row[0])

    def op_audio_pairs(f):
        # audio twin of op_phash_pairs: windowed spectral fingerprint +
        # the shared banded-hamming pair machinery
        from localsql_spark.operators.multimodal import audio_pairs
        docs = spark.read.parquet(paths[f]["documents"])
        row = (audio_pairs(docs, max_hamming=3)
               .agg(F.count(F.lit(1)), F.sum("hamming")).collect()[0])
        return int(row[0])

    def op_pack_sequences(f):
        from localsql_spark.operators.corpus import pack_sequences
        docs = spark.read.parquet(paths[f]["documents"])
        # shard count scales with the corpus so per-shard pandas state
        # stays bounded — the documented 100 TB posture
        return int(pack_sequences(docs, capacity=128, n_shards=8 * f)
                   .agg(F.count(F.lit(1)), F.sum("n_tok")).collect()[0][0])

    def op_er_sorted_neighborhood(f):
        from localsql_spark.operators import er as ER
        docs = spark.read.parquet(paths[f]["documents"])
        recs = docs.select("doc_id", "lang", "source",
                           F.substring("text", 1, 24).alias("head"))
        m = ER.sorted_neighborhood_matches(
            recs, id_col="doc_id", attr_col="head",
            block_cols=["lang", "source"], window=4, max_dist=4)
        row = m.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0]
        return int(row[0])

    def op_triangles(f):
        from localsql_spark.operators.graph import triangle_counts
        docs = spark.read.parquet(paths[f]["documents"])
        pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
        return int(triangle_counts(pairs)
                   .agg(F.count(F.lit(1)), F.sum("n_tri")).collect()[0][0])

    def op_bm25_topk(f):
        from localsql_spark.operators.text import bm25_topk
        docs = spark.read.parquet(paths[f]["documents"])
        return bm25_topk(docs, ["table", "join", "window", "hash"],
                         k=10).count()

    def op_knn_ivfpq(f):
        emb = spark.read.parquet(paths[f]["embeddings"])
        queries = emb.filter(F.col("vec_id") < 50)
        # cells scale with the corpus (fixed expected list size), the
        # standard IVF posture; probe count fixed.  two_level_assign is
        # pinned False: this curve MEASURES the flat-assignment cliff
        # the auto default (None -> two-level at n_cells >= 64) avoids
        return S.knn_ivfpq_adc(emb, queries, k=5, n_cells=8 * f,
                               n_probe=4, two_level_assign=False).count()

    def op_knn_ivfpq_2l(f):
        # same k-proportional-to-N posture as op_knn_ivfpq, with the
        # hierarchical O(N*sqrt(k)) coarse assignment — the linear-bound
        # build path for corpus-scaled cell counts (assign_probe=2
        # multi-probe; assignment-approximate, distance-exact)
        emb = spark.read.parquet(paths[f]["embeddings"])
        queries = emb.filter(F.col("vec_id") < 50)
        return S.knn_ivfpq_adc(emb, queries, k=5, n_cells=8 * f,
                               n_probe=4, two_level_assign=True,
                               assign_probe=2).count()

    def op_ivm_maintain(f):
        from localsql_spark.sinks.ivm import maintain_join_view
        ev = spark.read.parquet(paths[f]["events"])
        dim = (ev.select("user_id").distinct()
               .select("user_id", F.pmod(F.col("user_id"), F.lit(64))
                       .alias("grp")))
        view = str(root / f"ivm_view_{f}x")
        # base view from 12/13 of the fact history is the fixture; the
        # timed work is ONE batch fold — the steady-state daily cost
        bucket = F.pmod(F.col("event_id"), F.lit(13))
        maintain_join_view(spark, view, ev.filter(bucket != 0), dim,
                           fact_key="user_id", dim_key="user_id",
                           group_col="grp", value_col="value")
        t0 = time.perf_counter()
        maintain_join_view(spark, view, ev.filter(bucket == 0), dim,
                           fact_key="user_id", dim_key="user_id",
                           group_col="grp", value_col="value")
        dt = time.perf_counter() - t0
        return spark.read.parquet(view).count(), dt

    def op_drift_psi(f):
        # PSI drift monitor: sketch-bounded by design (reference edges
        # from a bottom-k quantile sketch, one n_buckets-row groupBy
        # per side, never a reference-vs-current join) — the wall
        # should track the two scans, i.e. stay in the linear band
        from localsql_spark.operators.sketches import psi_drift
        ev = spark.read.parquet(paths[f]["events"])
        out = psi_drift(ev.filter(F.col("event_type") == "click"),
                        ev.filter(F.col("event_type") == "purchase"),
                        "value", "event_id")
        return out.count()

    def op_ccnet_perlang(f):
        # per-language CCNet partition: the lang key rides the same
        # word-key shuffle the global variant uses — the per-language
        # models/edges must not add a lang x corpus term
        from localsql_spark.operators.selection import \
            perplexity_buckets_by_lang
        docs = spark.read.parquet(paths[f]["documents"])
        return perplexity_buckets_by_lang(docs).count()

    def op_rollup_ttl(f):
        # continuous-aggregate TTL: the rollup store grows with f; the
        # timed call folds a FIXED-size late batch WITH retain_from —
        # fold cost tracks the batch's date fan-out, and the expiry is
        # the metadata-only commit retention_expire certifies at 0.00s
        from localsql_spark.sinks.rollup import maintain_rollup
        ev = spark.read.parquet(paths[f]["events"])
        roll = str(root / f"rollup_ttl_{f}x")
        maintain_rollup(spark, roll, ev, grain="hour")
        late = (ev.filter(F.to_date("ts") >= "2024-01-28").limit(2000)
                .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        dates = maintain_rollup(spark, roll, late, grain="hour",
                                retain_from="2024-01-10")
        dt = time.perf_counter() - t0
        return len(dates), dt

    def op_pca_project(f):
        # top-k PCA projection, EXACT fold (the oracle twin): covariance
        # shuffle is dim^2-bounded at any corpus size, but total WORK is
        # O(N*dim^2) exact-decimal products — the documented non-flat
        # curve (20.6x per 64x, SCALE.md r12) the arrow row below kills
        from localsql_spark.operators.similarity import pca_project
        emb = spark.read.parquet(paths[f]["embeddings"])
        return pca_project(emb, n_components=2, rounds=6,
                           method="exact").count()

    def op_pca_project_arrow(f):
        # the PRODUCTION path (round-13): per-partition numpy
        # outer-product partials via mapInPandas, order-exact decimal
        # reduce over dim^2 x partitions rows — wall should track the
        # SCAN, not the N*dim^2 product count
        from localsql_spark.operators.similarity import pca_project
        emb = spark.read.parquet(paths[f]["embeddings"])
        return pca_project(emb, n_components=2, rounds=6,
                           method="arrow").count()

    def op_maintain_fixed_debris(f):
        # composed-maintenance scaling claim: the nightly
        # maintain_everywhere pass costs DEBRIS + retention work, not
        # store size.  Stores grow with f; the debris is FIXED — two
        # sliver-split primary partitions, two un-folded cov batch dirs
        # of 1x-range rows, three fixed-size feed batches (two
        # prunable), three ledger requests, and a retention cutoff
        # dropping a fixed share of rollup dates (metadata-only).
        # Store/fixture build is untimed; the timer covers the one
        # composed pass.
        import shutil

        from localsql_spark.sinks.cov_store import cov_store_fold
        from localsql_spark.sinks.erase import (bucket_of,
                                                erase_ledger_append,
                                                write_bucketed_store)
        from localsql_spark.sinks.maintenance import maintain_everywhere
        from localsql_spark.sinks.rollup import maintain_rollup
        from localsql_spark.streaming.foreach_upsert import \
            commit_feed_offset

        docs = spark.read.parquet(paths[f]["documents"])
        ev = spark.read.parquet(paths[f]["events"])
        emb = spark.read.parquet(paths[f]["embeddings"])
        n_base = docs.count() // f
        base = root / f"maint_{f}x"
        shutil.rmtree(base, ignore_errors=True)  # attempt-2 rebuild
        store = base / "primary"
        write_bucketed_store(docs.select("doc_id", "lang", "n_chars"),
                             str(store), "doc_id", n_buckets=32 * f)
        # fixed debris: split two partitions' single file into two
        for d in sorted(store.glob("kb=*"))[:2]:
            rows_df = spark.read.parquet(str(d))
            split = base / f"split_{d.name}"
            rows_df.repartition(2).write.parquet(str(split))
            for pf in d.glob("*.parquet"):
                pf.unlink()
            for i, pf in enumerate(sorted(split.glob("*.parquet"))):
                shutil.copy(pf, d / f"part-split-{i}.parquet")
        maintain_rollup(spark, str(base / "roll"), ev, grain="hour")
        emb_base = emb.filter(F.col("vec_id") < 500)
        cov_store_fold(spark, str(base / "cov"), emb, 0)
        from localsql_spark.streaming.batch_dirs import compact_batches
        compact_batches(spark, str(base / "cov"), keep_last=0)
        for b in (1, 2):  # fixed-size un-folded tail
            cov_store_fold(spark, str(base / "cov"),
                           emb_base.filter(F.col("vec_id") % 2 == b % 2),
                           b)
        for b in range(3):
            (docs.filter(F.col("doc_id") < n_base // 8)
             .select("doc_id").coalesce(1)
             .write.parquet(str(base / "feed" / f"batch_{b}")))
        commit_feed_offset(str(base / "feed"), "etl", 2)
        for b in range(3):
            erase_ledger_append(
                spark.createDataFrame([(b,)], "doc_id long"),
                str(base / "ledger"), b)
        t0 = time.perf_counter()
        audit = maintain_everywhere(
            spark,
            primary={"base_dir": str(store)},
            rollup={"rollup_dir": str(base / "roll"),
                    "retain_from": "2024-01-10"},
            cov_store={"store_dir": str(base / "cov")},
            feed={"feed_dir": str(base / "feed")},
            ledger={"ledger_dir": str(base / "ledger")})
        n = sum(r.units for r in audit.collect())
        dt = time.perf_counter() - t0
        return n, dt

    ops = {"exact_dedup": op_exact_dedup, "minhash_lsh_pairs": op_minhash,
           "pack_sequences": op_pack_sequences,
           "er_sorted_neighborhood": op_er_sorted_neighborhood,
           "neardup_triangles": op_triangles,
           "bm25_topk": op_bm25_topk,
           "knn_ivfpq": op_knn_ivfpq,
           "ivm_maintain": op_ivm_maintain,
           "phash_pairs": op_phash_pairs,
           "decon_exact": op_decon_exact, "decon_bloom": op_decon_bloom,
           "winnowing_fps": op_winnowing,
           "doc_novelty": op_novelty,
           "remove_repeated_spans": op_remove_spans,
           "perplexity_buckets": op_perplexity_buckets,
           "embedding_outliers": op_embedding_outliers,
           "near_dup_threshold_sweep": op_threshold_sweep,
           "clusters_bigstar": op_clusters_bigstar, "knn_ivf": op_knn_ivf,
           "asof_join": op_asof, "kmeans_lloyd": op_kmeans,
           "repetition_signals": op_repetition, "semdedup": op_semdedup,
           "merge_upsert": op_merge_upsert,
           "incremental_store": op_incremental_store,
           "banded_index_probe": op_banded_index,
           "knn_ivf_index_probe": op_knn_ivf_index,
           "quantile_sketch": op_quantile_sketch,
           "chunk_documents": op_chunk,
           "repeated_spans": op_repeated_spans,
           "unigram_logprob": op_unigram_logprob,
           "profile_columns": op_profile,
           "zorder_write": op_zorder_write,
           "dsir_weights": op_dsir_weights,
           "shard_export": op_shard_export,
           "rollup_maintain": op_rollup_maintain,
           "table_diff": op_table_diff, "scd2_apply": op_scd2_apply,
           "quarantine_split": op_quarantine, "pagerank": op_pagerank,
           "bpe_pair_counts": op_bpe_pairs,
           "nb_seed_scores": op_nb_seed,
           "ngram_diversity": op_ngram_diversity,
           "hybrid_retrieval": op_hybrid_retrieval,
           "sketch_view_fold": op_sketch_view_fold,
           "invidx_fold": op_index_fold,
           "invidx_probe": op_index_probe,
           "knn_ivfpq_2l": op_knn_ivfpq_2l,
           "erase_fixed_request": op_erase_fixed_request,
           "erase_sig_fixed_request": op_erase_sig_store_fixed_request,
           "erase_rollup_fixed_request": op_erase_rollup_fixed_request,
           "erase_ivm_fixed_request": op_erase_ivm_fixed_request,
           "erase_feed_fixed_request": op_erase_feed_fixed_request,
           "access_fixed_request": op_access_fixed_request,
           "retention_expire": op_retention_expire,
           "table_as_of_b3": op_table_as_of,
           "pca_covariance": op_pca_covariance,
           "maintain_fixed_debris": op_maintain_fixed_debris,
           "audio_pairs": op_audio_pairs,
           "drift_psi": op_drift_psi,
           "ccnet_perlang": op_ccnet_perlang,
           "rollup_ttl_fold": op_rollup_ttl,
           "pca_project_top2": op_pca_project,
           "pca_project_arrow": op_pca_project_arrow}

    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        ops = {k: v for k, v in ops.items() if k in keep}

    results: dict[str, dict[int, float]] = {}
    for name, fn in ops.items():
        results[name] = {}
        for f in FACTORS:
            # min of 2 runs per point (same methodology as bench.py): single
            # measurements on the shared machine carry 2-4x GC/page-cache
            # spikes that fake a super-linear step; the repeated-run minimum
            # is the steady-state cost the growth columns should compare.
            # A failed attempt is also retried once — a transient executor
            # failure at 16x costs one data point, not the run.
            times = []
            for attempt in (1, 2):
                t0 = time.perf_counter()
                try:
                    rows = fn(f)
                except Exception as e:  # noqa: BLE001
                    cleanup()
                    print(f"# {name} {f}x attempt {attempt} FAILED: "
                          f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
                    continue
                dt = time.perf_counter() - t0
                # an op may return (rows, self_timed_sec) to exclude its
                # fixture setup from the measurement (see op_merge_upsert)
                if isinstance(rows, tuple):
                    rows, dt = rows
                times.append(dt)
                cleanup()
            results[name][f] = min(times) if times else float("nan")
            if times:
                print(f"# {name} {f}x: {min(times):.2f}s min of "
                      f"{[round(t, 2) for t in times]} ({rows} rows)",
                      file=sys.stderr)

    if FACTORS != _DEFAULT_FACTORS:
        # deep-scale probe: the table's columns are the default factors,
        # so print the measured points for manual narrative integration
        for name, r in results.items():
            print(f"# {name}: " + "  ".join(
                f"{f}x={r.get(f, float('nan')):.2f}s" for f in FACTORS))
        return
    if update_scale_md(results):
        print("\n".join(_fmt_row(n, r) for n, r in results.items()))
        return

    lines = [
        "# SCALE — empirical scaling of the heavy operators",
        "",
        f"`tools/scale_check.py` on `{sf_dir}` replicated 1x/4x/16x "
        "(constant near-dup rate, shifted ids); min-of-2 wall seconds per "
        "point.  A scale-safe operator "
        "grows ~4x wall per 4x data; quadratic blowups grow ~16x per step.",
        "",
        "| operator | 1x | 4x | 16x | growth 1x->4x | growth 4x->16x |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(_fmt_row(name, r))
    lines += [
        "",
        "Growth below 4.0x per step reflects fixed per-query overhead still",
        "being amortized; well above 4x indicates super-linear work.",
        "",
        "`semdedup` is the IVF-accelerated two-level variant with the",
        "cluster count scaling WITH the corpus (k = 8x factor, the",
        "production posture — constant expected cluster size bounds the",
        "intra-cluster pair block).  The flat `semdedup_prune` under the",
        "same k-growth measured 2.6x/7.8x per step (O(N*k) assignment",
        "turns quadratic when k tracks N); the coarse-quantizer routing",
        "(`semdedup_prune_two_level`) brings it back to the linear band",
        "at a higher constant — flat stays the right choice for small",
        "fixed k.  The pair stage is the GEMM filter-and-verify backend",
        "(similarity._pair_drops): before it, the interpreted per-pair",
        "fold dominated and the 16x step read 3.6x (55.5s wall); the",
        "per-cluster BLAS pass with exact decimal rescore of candidates",
        "cut that to the assignment-bound numbers below (bit-identical",
        "kept sets, property-tested).",
        "",
        "`incremental_store` times ONLY the daily probe (the store write",
        "is yesterday's run).  Its growth tracks the CORPUS, not the",
        "batch, because the probe must scan + band the whole signature",
        "store (a narrow table, ~1% of corpus bytes); the join itself is",
        "O(new x bands).  That linear store scan is the textbook trade —",
        "avoiding it needs a band-partitioned store layout with partition",
        "pruning on the batch's band keys, worthwhile once the store scan",
        "dominates the probe join (far beyond these factors).",
        "",
        "`merge_upsert` times ONLY the merge (base-table build is",
        "fixture); its cost tracks the UPDATE footprint — near-flat here",
        "because the touched-partition set saturates at all langs while",
        "per-partition work stays small.",
        "",
        "`banded_index_probe` / `knn_ivf_index_probe` time the probe",
        "against the PREBUILT partition-pruned layouts (index writes are",
        "fixture): the banded probe still pays a linear pruned read of",
        "the touched bk_prefix partitions, the IVF probe reads only its",
        "probed cells — both should sit at or below incremental_store's",
        "growth.",
    ]
    Path("SCALE.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
