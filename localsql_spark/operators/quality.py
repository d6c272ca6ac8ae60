"""Declarative data-quality constraints over a DataFrame — the
"expectations" gate a pipeline runs on every ingest batch before letting it
touch the corpus (the public pattern of AWS Deequ / Great Expectations /
dbt tests, re-expressed as one Spark aggregation).

The reference has no validation surface (its ingest is pandas read + schema
inference, reference: localsql/localsql.py:80-145); this is a pure scale
extension alongside operators.corpus.

Design for 100 TB: every ROW-LOCAL rule (not-null, bounds, accepted values,
regex match) compiles to a conditional-sum column inside ONE aggregation
pass — adding rules adds columns, not jobs or scans.  Uniqueness rides the
same pass via count - count_distinct.  Referential rules need the other
table, so each adds one left-anti join (broadcast when the dimension is
small) — the only per-rule jobs.  Output is one bounded row per rule:
``(constraint, metric, violations, passed)``, cheap to store per batch and
diff across runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint.  ``kind`` in {'not_null', 'unique', 'between',
    'accepted', 'matches', 'refers_to'}; see the check_* constructors."""
    kind: str
    name: str
    col: str
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str = ""
    other: DataFrame | None = None
    other_col: str = ""


def not_null(col: str) -> Rule:
    return Rule("not_null", f"not_null({col})", col)


def unique(col: str) -> Rule:
    return Rule("unique", f"unique({col})", col)


def between(col: str, lo: float, hi: float) -> Rule:
    return Rule("between", f"between({col},{lo},{hi})", col, lo=lo, hi=hi)


def accepted(col: str, values: list) -> Rule:
    return Rule("accepted", f"accepted({col})", col, values=tuple(values))


def matches(col: str, pattern: str) -> Rule:
    return Rule("matches", f"matches({col})", col, pattern=pattern)


def refers_to(col: str, other: DataFrame, other_col: str) -> Rule:
    """Referential integrity: every non-null ``col`` value exists in
    ``other[other_col]`` (FK -> PK)."""
    return Rule("refers_to", f"refers_to({col})", col,
                other=other, other_col=other_col)


def _violation(rule: Rule) -> Column:
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull().cast("long")
    if rule.kind == "between":
        return (c.isNull() | (c < rule.lo) | (c > rule.hi)).cast("long")
    if rule.kind == "accepted":
        return (c.isNull()
                | ~c.isin(list(rule.values))).cast("long")
    if rule.kind == "matches":
        return (c.isNull() | ~c.rlike(rule.pattern)).cast("long")
    raise ValueError(f"not a row-local rule: {rule.kind}")


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; one result row per rule:
    ``constraint, n_rows, violations, passed``.

    Scale shape: all row-local rules + all uniqueness rules share ONE
    aggregation over a single scan (conditional sums / count_distinct with
    map-side partial aggregation); each referential rule adds one
    left-anti join job (broadcast the dimension when small).  The result
    is |rules| rows — store it per batch, alert on ``passed = false``,
    diff `metric` across days for drift.
    """
    spark = df.sparkSession
    row_local = [r for r in rules if r.kind in
                 ("not_null", "between", "accepted", "matches")]
    uniques = [r for r in rules if r.kind == "unique"]
    refs = [r for r in rules if r.kind == "refers_to"]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(row_local):
        aggs.append(F.sum(_violation(r)).alias(f"__v{i}"))
    for i, r in enumerate(uniques):
        # duplicates = rows - distinct non-null values - (0 or 1 null slot):
        # count over non-null minus distinct counts every EXTRA occurrence
        aggs.append((F.count(F.col(r.col))
                     - F.countDistinct(F.col(r.col))).alias(f"__u{i}"))
    stats = df.agg(*aggs).collect()[0]

    rows = [(r.name, int(stats["__n"]), int(stats[f"__v{i}"]))
            for i, r in enumerate(row_local)]
    rows += [(r.name, int(stats["__n"]), int(stats[f"__u{i}"]))
             for i, r in enumerate(uniques)]
    for r in refs:
        dangling = (df.select(F.col(r.col)).filter(F.col(r.col).isNotNull())
                    .join(r.other.select(
                        F.col(r.other_col).alias(r.col)).distinct(),
                        r.col, "left_anti")
                    .count())
        rows.append((r.name, int(stats["__n"]), int(dangling)))

    out = spark.createDataFrame(
        rows, "constraint string, n_rows long, violations long")
    return out.withColumn("passed", F.col("violations") == 0)


def annotate_violations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Tag every row with ``failed_rules``: the (rule-order) array of rule
    names the row violates — empty array means the row is clean.

    Scale shape: row-local rules are pure conditional columns on the scan
    (no extra job); each ``unique`` rule adds one self-aggregation join on
    its key (the duplicate-key set, shuffle-partitioned — never collected);
    each ``refers_to`` adds one left join against the DISTINCT dimension
    keys (broadcast when small).  No driver materialization anywhere.
    """
    out = df
    flag_cols: list[str] = []
    for i, r in enumerate(rules):
        flag = f"__viol_{i}"
        flag_cols.append(flag)
        if r.kind in ("not_null", "between", "accepted", "matches"):
            out = out.withColumn(flag, _violation(r) == 1)
        elif r.kind == "unique":
            dups = (df.groupBy(r.col).agg(F.count(F.lit(1)).alias("__c"))
                    .filter(F.col("__c") > 1)
                    .select(r.col, F.lit(True).alias(flag)))
            # null keys never join-match -> not unique-violations (the
            # not_null rule owns nulls), matching check_constraints
            out = (out.join(dups, r.col, "left")
                   .withColumn(flag, F.coalesce(F.col(flag), F.lit(False))))
        elif r.kind == "refers_to":
            pk = (r.other.select(F.col(r.other_col).alias(r.col)).distinct()
                  .withColumn("__pk_hit", F.lit(True)))
            out = (out.join(pk, r.col, "left")
                   .withColumn(flag, F.col(r.col).isNotNull()
                               & F.col("__pk_hit").isNull())
                   .drop("__pk_hit"))
        else:
            raise ValueError(f"unknown rule kind: {r.kind}")
    failed = F.array_compact(F.array(
        *[F.when(F.col(f), F.lit(r.name))
          for f, r in zip(flag_cols, rules)]))
    # join-on-key moved key columns to the front; restore input order
    return (out.withColumn("failed_rules", failed)
            .select(*df.columns, "failed_rules"))


def validate_and_split(df: DataFrame, rules: list[Rule]
                       ) -> tuple[DataFrame, DataFrame]:
    """Quarantine routing (the dead-letter pattern downstream of the
    constraint report): returns ``(passed, quarantined)`` where passed
    rows carry the original schema and quarantined rows add
    ``failed_rules``.  Route quarantined to a side sink for triage; only
    passed rows continue into the corpus."""
    ann = annotate_violations(df, rules)
    passed = ann.filter(F.size("failed_rules") == 0).drop("failed_rules")
    quarantined = ann.filter(F.size("failed_rules") > 0)
    return passed, quarantined


def schema_drift(df: DataFrame, expected: dict[str, str]) -> DataFrame:
    """Schema-drift report for an incoming batch vs the expected contract
    ``{column: spark_sql_type}``: one row per column with status 'ok' /
    'type_changed' / 'added' (present but not expected) / 'missing'
    (expected but absent).  Pure metadata — no data scan, no jobs; run it
    BEFORE the row gate so a drifted batch fails fast instead of
    producing a million 'matches' violations."""
    actual = dict(df.dtypes)
    rows = []
    for col, want in expected.items():
        have = actual.get(col)
        status = ("missing" if have is None
                  else "ok" if have == want else "type_changed")
        rows.append((col, want, have, status))
    for col, have in actual.items():
        if col not in expected:
            rows.append((col, None, have, "added"))
    return df.sparkSession.createDataFrame(
        rows, "column string, expected_type string, actual_type string, "
              "status string")
