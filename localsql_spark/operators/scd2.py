"""Slowly-changing-dimension Type 2 maintenance (Kimball SCD2 — public
pattern): keep every historical version of a dimension row with a
validity interval, so facts can join "the dimension as of event time".

The reference has no mutation or history surface at all (tables are
immutable per-process pandas frames, reference: localsql/localsql.py:31);
this is a scale extension in the same family as sinks.merge (latest-wins
upsert) — SCD2 is the keep-history twin of that operator.

Data model: ``(*keys, *attrs, valid_from_us, valid_to_us)`` with
BIGINT epoch-micros bounds; ``valid_to_us IS NULL`` marks the current
version (``is_current`` is derived, never stored independently — one
source of truth).

Design for 100 TB: one co-partitioned full-outer join per batch between
the CURRENT slice and the update batch (bucket/partition the history by
``valid_to_us IS NULL`` so the closed majority is never read or
shuffled); version emission is a row-local explode of at-most-2 structs;
closed history is appended, never rewritten.  Nothing reaches the
driver.  Updates must carry at most one row per key (enforce upstream
with sinks.merge-style latest-wins if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(dim: DataFrame, key_cols: list[str], attr_cols: list[str],
              ts_us: int) -> DataFrame:
    """Open an initial version for every dimension row at ``ts_us``."""
    return dim.select(
        *key_cols, *attr_cols,
        F.lit(ts_us).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"))


def scd2_apply(history: DataFrame, updates: DataFrame,
               key_cols: list[str], attr_cols: list[str],
               batch_ts_us: int) -> DataFrame:
    """Apply one update batch at ``batch_ts_us``; returns the new history.

    Per key: attrs unchanged -> current row kept open; attrs differ ->
    current row closed at ``batch_ts_us`` and a new open version
    inserted; new key -> new open version; key absent from the batch ->
    untouched.  Attribute comparison is null-safe (``eqNullSafe``).
    Already-closed rows pass through without being joined or rewritten.
    """
    closed = history.filter(F.col("valid_to_us").isNotNull())
    current = history.filter(F.col("valid_to_us").isNull())

    cur = current.select(
        *key_cols, "valid_from_us",
        *[F.col(c).alias(f"__o_{c}") for c in attr_cols],
        F.lit(True).alias("__has_cur"))
    upd = updates.select(
        *key_cols,
        *[F.col(c).alias(f"__n_{c}") for c in attr_cols],
        F.lit(True).alias("__has_upd"))
    j = cur.join(upd, key_cols, "full_outer")

    differs = F.lit(False)
    for c in attr_cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    closes = F.col("__has_upd").isNotNull() & differs
    fields = [*(F.col(f"__o_{c}").alias(c) for c in attr_cols),
              F.col("valid_from_us").alias("valid_from_us"),
              F.when(closes, F.lit(batch_ts_us)).cast("long")
              .alias("valid_to_us")]
    old_version = F.struct(*fields)
    new_version = F.struct(
        *(F.col(f"__n_{c}").alias(c) for c in attr_cols),
        F.lit(batch_ts_us).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"))
    emit = F.array_compact(F.array(
        F.when(F.col("__has_cur").isNotNull(), old_version),
        F.when(F.col("__has_upd").isNotNull()
               & (F.col("__has_cur").isNull() | differs), new_version)))
    touched = (j.select(*key_cols, F.explode(emit).alias("__v"))
               .select(*key_cols, "__v.*"))
    return closed.select(touched.columns).unionByName(touched)


def scd2_as_of(history: DataFrame, ts_us: int) -> DataFrame:
    """The dimension as it stood at ``ts_us`` (partition-prunable when the
    history is stored partitioned on ``valid_to_us IS NULL``)."""
    return (history.filter(
        (F.col("valid_from_us") <= ts_us)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > ts_us)))
        .drop("valid_from_us", "valid_to_us"))


def scd2_enrich_asof(facts: DataFrame, history: DataFrame,
                     key_cols: list[str], ts_us_col: str) -> DataFrame:
    """Enrich each fact row with the dimension version valid at its event
    time: left join on the key with the interval residual
    ``valid_from_us <= ts < coalesce(valid_to_us, +inf)`` — the query SCD2
    histories exist to answer, and the correct replacement for joining
    facts to the CURRENT dimension (which silently backdates attributes).

    Returns the fact columns plus the history's attribute columns.

    Scale shape: an equi-join on the key carrying the range check as a
    residual — one co-partitioned shuffle (bucket both sides on the key
    to remove it); each fact matches at most one version, so output size
    equals fact size.  Partition the stored history on the current/closed
    split and recent facts prune to the current slice.
    """
    from functools import reduce

    h = history.select(*[F.col(c).alias(f"__h_{c}") for c in history.columns])
    cond = reduce(lambda a, b: a & b,
                  [F.col(c) == F.col(f"__h_{c}") for c in key_cols])
    cond = (cond
            & (F.col("__h_valid_from_us") <= F.col(ts_us_col))
            & (F.col("__h_valid_to_us").isNull()
               | (F.col(ts_us_col) < F.col("__h_valid_to_us"))))
    attrs = [c for c in history.columns
             if c not in (*key_cols, "valid_from_us", "valid_to_us")]
    # a fact column sharing a dimension attribute's name would yield a
    # frame with two identically-named columns — every downstream
    # F.col/write/join then dies on AMBIGUOUS_REFERENCE; fail loudly at
    # the enrich instead (rename the fact column or project it away)
    clash = sorted(set(attrs) & set(facts.columns))
    if clash:
        raise ValueError(
            f"fact columns {clash} collide with dimension attribute "
            f"names — rename or drop them before scd2_enrich_asof")
    return (facts.join(h, cond, "left")
            .select(*facts.columns,
                    *[F.col(f"__h_{c}").alias(c) for c in attrs]))
