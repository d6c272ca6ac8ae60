"""Skew-mitigation helpers: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (one event_type, one language, the empty
document) can pin a whole stage on one task. AQE's skew-join splitting covers
sort-merge joins; these helpers cover the aggregation side and
broadcast-resistant hot-key joins explicitly:

- ``salted_agg``: groupBy (key, salt) partial -> groupBy key final. The first
  shuffle spreads each hot key over ``n_salts`` reducers; the second is tiny
  (|keys| x n_salts rows). Works for any algebraic aggregate (sum/count/min/
  max; avg as sum+count).
- ``salted_join``: replicate the small side ``n_salts`` times, salt the big
  side uniformly — every hot key's rows land on ``n_salts`` different
  reducers instead of one.

Both are pure DataFrame combinators: no UDFs, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt",
              deterministic_by: str | None = None) -> DataFrame:
    """Add a salt column in [0, n_salts). ``deterministic_by`` salts by a
    hash of that column (reproducible, oracle-friendly); default is uniform
    random (what production uses — pure load balancing, result-invariant)."""
    if deterministic_by is not None:
        salt = F.pmod(F.hash(F.col(deterministic_by)), F.lit(n_salts))
    else:
        salt = (F.rand() * n_salts).cast("int")
    return df.withColumn(col_name, salt)


def _analyzed_plan_string(df: DataFrame) -> str:
    """Analyzed-plan text via DataFrame internals (no public API exists for
    this in PySpark as of 4.x). Verified against pyspark 4.1; if the
    attribute chain moves in a future release, fail with a pointer here
    rather than an opaque AttributeError deep in a query."""
    try:
        return df._jdf.queryExecution().analyzed().toString()
    except AttributeError as e:
        import pyspark
        raise RuntimeError(
            "salted_agg's DISTINCT validation uses DataFrame._jdf internals "
            f"that moved in pyspark {pyspark.__version__}; update "
            "localsql_spark/operators/skew.py:_analyzed_plan_string") from e


def _column_string(col: Column) -> str:
    """Column expression text via Column internals (same caveat as above)."""
    try:
        return col._jc.toString()
    except AttributeError as e:
        import pyspark
        raise RuntimeError(
            "salted_agg's combiner matching uses Column._jc internals "
            f"that moved in pyspark {pyspark.__version__}; update "
            "localsql_spark/operators/skew.py:_column_string") from e


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column],
               n_salts: int = 16,
               deterministic_by: str | None = None) -> DataFrame:
    """Two-phase aggregation immune to hot grouping keys.

    ``aggs`` maps output name -> partial aggregate expression; the final
    re-aggregation applies the matching combiner (sum for sum/count, min for
    min, max for max). Result is identical to a direct groupBy — the salt
    only changes the shuffle layout.
    """
    partial = (with_salt(df, n_salts, deterministic_by=deterministic_by)
               .groupBy(*keys, "__salt")
               .agg(*[expr.alias(name) for name, expr in aggs.items()]))
    # DISTINCT is invisible in every Column string form (Spark 4 toString
    # drops the flag) — only the analyzed plan shows it. A per-salt DISTINCT
    # double-counts values whose rows span salts, so refuse it.  Only the
    # TOP Aggregate node (the partial we just built) is inspected: a
    # distinct aggregate ALREADY COMPUTED upstream in df's own plan is fine
    # and must not trigger a spurious rejection.
    plan_lines = _analyzed_plan_string(partial).splitlines()
    top_agg = next((ln for ln in plan_lines
                    if ln.lstrip().startswith("Aggregate")), "")
    if "(distinct " in top_agg.lower():
        raise ValueError(
            "salted_agg cannot re-combine DISTINCT aggregates (a value's "
            "rows may span salts and would be counted once per salt)")
    import re as _re

    combiners = []
    for name, expr in aggs.items():
        fn = _column_string(expr).lower()
        # EXACT function-name match, DISTINCT rejected: count(DISTINCT x)
        # split across salts double-counts values, min_by/max_by under a
        # plain min/max combiner return the wrong column's extremum
        # DISTINCT only as the flag position "fn(distinct ..." — a bare
        # substring test rejected valid aggregates over any COLUMN whose
        # name contains 'distinct' (e.g. sum(distinct_users)); the real
        # DISTINCT flag is independently caught by the analyzed-plan
        # check above, this string form is belt-and-braces only
        m = _re.match(r"^(sum|count|min|max)\(", fn)
        has_distinct_flag = bool(
            _re.match(r"^(sum|count|min|max)\(distinct\s", fn))
        if not m or has_distinct_flag:
            # avg/stddev/collect_*/…_by/DISTINCT would silently mis-combine
            # (a sum of per-salt averages is not the average) — refuse
            # loudly; decompose avg as sum+count at the call site instead
            raise ValueError(
                f"salted_agg only re-combines plain sum/count/min/max "
                f"partials; got {fn.split('(')[0]!r} for {name!r}"
                + (" (DISTINCT is not salt-decomposable)"
                   if has_distinct_flag else ""))
        kind = m.group(1)
        if kind == "min":
            combiners.append(F.min(name).alias(name))
        elif kind == "max":
            combiners.append(F.max(name).alias(name))
        else:  # sum / count partials both re-combine by sum
            combiners.append(F.sum(name).alias(name))
    return partial.groupBy(*keys).agg(*combiners)


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                n_salts: int = 16) -> DataFrame:
    """Inner equi-join resilient to hot keys on the big side: the small side
    is replicated ``n_salts`` times (explode of a literal range — cheap when
    |small| x n_salts still fits a shuffle), the big side salts uniformly,
    and the join key becomes (keys..., salt)."""
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    salted_big = with_salt(big, n_salts)
    return (salted_big.join(salted_small, [*on, "__salt"])
            .drop("__salt"))
