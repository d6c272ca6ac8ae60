#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for named queries into plans/r15/.

    python tools/capture_plans.py before q1 q2 ...
    python tools/capture_plans.py after  q1 q2 ...

Writes plans/r15/<query>_<tag>.txt (the optimization round's evidence files).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from localsql_spark.session import get_spark
    from localsql_spark.workload import all_queries, load

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    load(spark, sf_dir)
    outdir = REPO / "plans" / "r15"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"# wrote plans/r15/{name}_{tag}.txt", file=sys.stderr)
        from localsql_spark.operators import cleanup
        cleanup()


if __name__ == "__main__":
    main()
