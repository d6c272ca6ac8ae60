#!/usr/bin/env python
"""Absolute sf1.0 certification of the most expensive headliners
(r13 verdict task 3): SCALE.md's 1/4/16/64x curves are RELATIVE to
small bases; this tool adds one ABSOLUTE 10x-bench-scale point — build
a referentially-consistent sf1.0 dataset (10x sf0.1), run the top
headliners at both scales, and report walls, growth ratios, and which
AQE runtime re-plans fired (coalesced shuffle reads, skew splits,
runtime broadcast-join conversions).

Replication discipline (same as tools/scale_check.py, extended to the
relational tables so join cardinalities scale like real data):

- region/nation stay fixed (TPC-H dimension tables don't scale with sf);
- customer/supplier/part/orders/lineitem/events replicate 10x with id
  shifts that PRESERVE referential integrity (o_custkey follows the
  customer shift, l_orderkey/l_partkey/l_suppkey follow their parents),
  so the join fan-outs grow linearly instead of 100x;
- documents: replica text gets a per-replica suffix so the near-dup
  RATE stays constant (replica 0 keeps the original corpus);
- embeddings: replica vectors get a deterministic per-replica jitter on
  one coordinate so ANN structure is preserved without creating 10
  exact copies of every vector.

Usage:  python tools/sf1_certify.py [--queries a,b,c] [--runs 2]
Writes the markdown rows to stdout (for SCALE.md) and the raw JSON to
SCALE_SF1.json.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
SF1_DIR = REPO / ".scale" / "sf1.0"
FACTOR = 10

# the most expensive committed headliners (BENCH_DETAIL order), spanning
# ANN training/serving, compliance loops, ER, multimodal, IVM, and PCA
DEFAULT_QUERIES = [
    "knn_ivfpq_top5",
    "erase_users_everywhere",
    "maintain_everywhere_probe",
    "er_customer_entities",
    "knn_ivfpq_rot_index_top5",
    "multimodal_audio_pairs",
    "knn_ivf_trained_planted_top5",
    "knn_jl_top5",
    "pca_pc1_scores",
    "knn_pq_top5",
    "ivm_nation_revenue",
    "multimodal_phash_pairs",
]


def build_sf1(spark) -> None:
    """Materialize the sf1.0 replica (idempotent: skips when complete)."""
    from pyspark.sql import functions as F

    from localsql_spark.catalog import _normalize_nanos

    done = SF1_DIR / "_BUILT"
    if done.exists():
        return
    SF1_DIR.mkdir(parents=True, exist_ok=True)

    def read(t: str):
        return spark.read.parquet(str(_normalize_nanos(Path(SF01) / f"{t}.parquet")))

    def write(df, t: str) -> None:
        # one flat parquet FILE per table: the catalog's nanos probe
        # (pq.read_schema) expects the testdata layout, a file per table.
        # Spark stages the distributed write; pyarrow concats the parts.
        import shutil

        import pyarrow.parquet as _pq

        staging = SF1_DIR / f"_stage_{t}"
        df.write.mode("overwrite").parquet(str(staging))
        _pq.write_table(_pq.read_table(str(staging)),
                        SF1_DIR / f"{t}.parquet")
        shutil.rmtree(staging)

    rep = F.explode(F.array(*[F.lit(i) for i in range(FACTOR)])).alias("r")
    counts = {t: read(t).count()
              for t in ("customer", "supplier", "part", "orders",
                        "lineitem", "events", "documents", "embeddings")}

    for t in ("region", "nation"):  # fixed dimensions
        write(read(t), t)

    c = read("customer").select("*", rep)
    write(c.select((F.col("c_custkey") + F.col("r") * counts["customer"])
                   .alias("c_custkey"),
                   "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
          "customer")
    s = read("supplier").select("*", rep)
    write(s.select((F.col("s_suppkey") + F.col("r") * counts["supplier"])
                   .alias("s_suppkey"),
                   "s_name", "s_nationkey", "s_acctbal"), "supplier")
    p = read("part").select("*", rep)
    write(p.select((F.col("p_partkey") + F.col("r") * counts["part"])
                   .alias("p_partkey"),
                   "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
          "part")
    o = read("orders").select("*", rep)
    write(o.select((F.col("o_orderkey") + F.col("r") * counts["orders"])
                   .alias("o_orderkey"),
                   (F.col("o_custkey") + F.col("r") * counts["customer"])
                   .alias("o_custkey"),
                   "o_orderstatus", "o_totalprice", "o_orderdate",
                   "o_orderpriority").repartition(16), "orders")
    li = read("lineitem").select("*", rep)
    write(li.select((F.col("l_orderkey") + F.col("r") * counts["orders"])
                    .alias("l_orderkey"),
                    (F.col("l_partkey") + F.col("r") * counts["part"])
                    .alias("l_partkey"),
                    (F.col("l_suppkey") + F.col("r") * counts["supplier"])
                    .alias("l_suppkey"),
                    "l_linenumber", "l_quantity", "l_extendedprice",
                    "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                    "l_shipdate").repartition(32), "lineitem")
    ev = read("events").select("*", rep)
    write(ev.select((F.col("event_id") + F.col("r") * counts["events"])
                    .alias("event_id"), "ts",
                    (F.col("user_id") + F.col("r") * 10_000).alias("user_id"),
                    "event_type", "value", "props").repartition(16), "events")
    d = read("documents").select("*", rep)
    write(d.select((F.col("doc_id") + F.col("r") * counts["documents"])
                   .alias("doc_id"),
                   F.when(F.col("r") == 0, F.col("text"))
                   .otherwise(F.concat_ws(" ", "text",
                                          F.col("r").cast("string"),
                                          F.col("doc_id").cast("string")))
                   .alias("text"),
                   "lang", "source", "n_chars").repartition(16), "documents")
    e = read("embeddings").select("*", rep)
    jitter = F.transform(
        "embedding",
        lambda x, i: F.when(
            i == F.col("r") % 16,
            x + (F.col("r").cast("float") * F.lit(0.001))).otherwise(x))
    write(e.select((F.col("vec_id") + F.col("r") * counts["embeddings"])
                   .alias("vec_id"),
                   jitter.cast("array<float>").alias("embedding"), "label")
          .repartition(16), "embeddings")
    done.write_text("ok\n")


_AQE_MARKERS = (
    ("AQEShuffleRead coalesced", "coalesce"),
    ("CoalescedPartitionSpec", "coalesce"),
    ("isSkew=true", "skew-split"),
    ("skewed", "skew-split"),
    ("BroadcastQueryStage", "bcast-stage"),
)


def aqe_markers(df) -> str:
    """Which AQE runtime re-plans appear in the FINAL adaptive plan of
    the just-executed DataFrame (isFinalPlan=true after the action)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    hits = sorted({label for needle, label in _AQE_MARKERS
                   if needle in plan})
    if "AQEShuffleRead" in plan and not hits:
        hits = ["aqe-read"]
    return "+".join(hits) if hits else "-"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-base", action="store_true",
                    help="reuse sf0.1 walls from SCALE_SF1.json")
    args = ap.parse_args()

    from localsql_spark.operators import cleanup
    from localsql_spark.session import get_spark
    from localsql_spark.workload import all_queries, load

    heap = "16g"
    spark = get_spark(app_name="sf1_certify", extra_conf={
        "spark.driver.memory": heap,
        "spark.driver.extraJavaOptions": f"-Xms{heap} -XX:+AlwaysPreTouch",
        # single-file tables at ~100MB would be ONE scan split under the
        # default 128MB maxPartitionBytes — size splits to the corpus so
        # scan parallelism matches what a real multi-file layout gives;
        # BOTH scales run under the same value, so ratios are clean
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    })
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    queries = all_queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    out_path = REPO / "SCALE_SF1.json"
    prior = {}
    if args.skip_base and out_path.exists():
        prior = json.loads(out_path.read_text()).get("sf01", {})

    results: dict[str, dict] = {"sf01": dict(prior), "sf1": {}, "aqe": {}}
    for sf_key, sf_dir in (("sf01", SF01), ("sf1", str(SF1_DIR))):
        if sf_key == "sf01" and args.skip_base:
            continue
        load(spark, sf_dir)
        for name in names:
            fn = queries.get(name)
            if fn is None:
                continue
            walls, rows = [], 0
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                rows = df.count()
                walls.append(round(time.perf_counter() - t0, 3))
                cleanup()
            results[sf_key][name] = {"wall": min(walls), "rows": rows,
                                     "runs": walls}
            if sf_key == "sf1":
                results["aqe"][name] = aqe_markers(df)
            print(f"# {sf_key} {name}: {min(walls):.3f}s rows={rows} "
                  f"runs={walls}", file=sys.stderr)

    out_path.write_text(json.dumps(results, indent=1) + "\n")
    print("\n| query | sf0.1 wall | sf1.0 wall | x per 10x data | "
          "AQE re-plans (sf1.0 final plan) |")
    print("|---|---|---|---|---|")
    for name in names:
        b = results["sf01"].get(name)
        s = results["sf1"].get(name)
        if not b or not s:
            continue
        ratio = s["wall"] / b["wall"] if b["wall"] else float("nan")
        print(f"| {name} | {b['wall']:.2f}s | {s['wall']:.2f}s "
              f"| {ratio:.1f}x | {results['aqe'].get(name, '-')} |")


if __name__ == "__main__":
    main()
