"""Row-level table diff between two versions of a table.

Complements the aggregate-level drift audit (operators.fingerprint): the
fingerprint answers "did anything change, and in which hash buckets?" on
two ≤64-row summaries; this module answers "WHICH rows changed, and in
which columns?" — the audit a pipeline runs after a merge/backfill, and
the input to an incremental downstream refresh (recompute only `changed`
plus `added` keys).

The reference has no versioning surface (one in-memory table per file,
reference: localsql/localsql.py:31); this is a scale extension.

Design for 100 TB: one full-outer equi-join on the key — a single co-
partitioned shuffle on both sides (write both versions bucketed by the
key, sinks.bucketing, and the Exchange disappears entirely).  Per-column
comparison is row-local null-safe equality (`eqNullSafe`); unchanged rows
are filtered out BEFORE any downstream consumer, so the diff result is
update-footprint-sized, not table-sized.  Nothing reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               compare_cols: list[str] | None = None) -> DataFrame:
    """Diff two table versions on ``key_cols``.

    Returns one row per added / removed / changed key:
    ``(*key_cols, change, changed_cols)`` where ``change`` is one of
    'added' (key only in ``new``), 'removed' (key only in ``old``),
    'changed' (both sides, ≥1 compared column differs under null-safe
    equality), and ``changed_cols`` is the array of differing column
    names in ``compare_cols`` order (empty for added/removed).
    Identical rows are dropped.

    ``compare_cols`` defaults to every shared non-key column.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in set(new.columns) and c not in set(key_cols)]
    o = old.select(*key_cols,
                   *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
                   F.lit(True).alias("__in_old"))
    n = new.select(*key_cols,
                   *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
                   F.lit(True).alias("__in_new"))
    j = o.join(n, key_cols, "full_outer")
    changed_cols = F.array_compact(F.array(*[
        F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c))
        for c in compare_cols]))
    change = (F.when(F.col("__in_old").isNull(), F.lit("added"))
              .when(F.col("__in_new").isNull(), F.lit("removed"))
              .when(F.size(changed_cols) > 0, F.lit("changed")))
    return (j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .withColumn("changed_cols",
                        F.when(F.col("change") == "changed", changed_cols)
                        .otherwise(F.array().cast("array<string>")))
            .select(*key_cols, "change", "changed_cols"))
