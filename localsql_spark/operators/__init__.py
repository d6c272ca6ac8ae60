"""Scale operators beyond the reference's surface: dedup, similarity,
text analysis, event-time, multimodal."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _parse_bytes(v: str) -> int:
    """Spark size confs come back as '134217728', '134217728b', '128m', or
    the two-letter forms '128mb'/'1gb'/'1tb' — strip the optional 'b' FIRST
    so both spellings parse."""
    v = v.strip().lower()
    if v.endswith("b"):
        v = v[:-1]  # '134217728b' -> digits, '128mb' -> '128m'
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("t", 1 << 40)):
        if v.endswith(suffix):
            v, mult = v[:-1], m
            break
    return int(v) * mult


def spread(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Ensure enough partitions for CPU-bound per-row work.

    Small local files arrive as a single input split, which serializes every
    downstream expression/UDF on one core (observed 3-8x wall-time loss on
    the doc/embedding operators).  Repartition to the default parallelism
    when the scan would produce fewer than ``min_fraction`` x that many
    splits; at real scale inputs already have >= cores splits and this is a
    no-op — the shuffle is only paid exactly when the cluster would otherwise
    idle.

    The split estimate is plan-side (``df.inputFiles()`` + file sizes vs
    ``spark.sql.files.maxPartitionBytes``), NOT ``df.rdd.getNumPartitions()``
    — the RDD probe forces a DataFrame->RDD conversion per operator call.
    Non-file plans and non-local storage are left untouched: their
    partitioning already comes from shuffle sizing or the source's own splits.
    """
    est_splits = _est_input_splits(df)
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    threshold = max(2, int(target * min_fraction))
    if est_splits is not None and est_splits < threshold:
        return df.repartition(target)
    return df


def _est_input_splits(df: DataFrame) -> int | None:
    """Plan-side estimate of how many scan splits ``df``'s file sources
    yield (None = not a local-file plan / unknown: leave partitioning
    alone).  Shared by :func:`spread` and :func:`spread_derived`."""
    sess = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — estimate only, never fail the query
        return None
    if not files:
        return None
    from urllib.parse import unquote

    total = 0
    for f in files:
        if not f.startswith("file:"):
            return None  # remote storage: trust the source's split planning
        try:
            # inputFiles() returns percent-encoded URIs — 'my docs' arrives
            # as 'my%20docs' and must be unquoted before stat'ing
            total += os.path.getsize(unquote(f.removeprefix("file:")))
        except OSError:
            return None
    max_bytes = _parse_bytes(
        sess.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    return max(len(files), -(-total // max_bytes))


def small_input_regime(base: DataFrame) -> bool:
    """True when ``base``'s file-backed scan is estimated below half the
    cores' worth of splits — the shared regime gate (optimization r14)
    behind the local/broadcast fast paths (blocked-ER probe broadcast,
    driver-side BPE/PageRank/CC rounds).  False for non-file-backed or
    remote plans: the gate must NEVER fire at real scale, where the
    estimate is either large or unknowable."""
    est = _est_input_splits(base)
    if est is None:
        return False
    target = base.sparkSession.sparkContext.defaultParallelism
    return est < max(2, target // 2)


def spread_derived(df: DataFrame, base: DataFrame,
                   min_fraction: float = 0.5) -> DataFrame:
    """Widen a SHUFFLE-DERIVED frame whose file-backed ancestor ``base``
    is in the small-input regime :func:`spread` targets.

    AQE coalesces a tiny-byte exchange to 1-2 partitions, and a
    localCheckpoint downstream FREEZES that width — every later
    compute-dense stage (residual folds, PQ training distances) then runs
    serialized however many cores exist (optimization r14 measurement:
    knn_ivfpq_top5 carried a 3.8s and a 2.8s single-task stage this way).
    The decision is made from ``base``'s file sizes, exactly like
    :func:`spread`: at real scale the ancestor has >= cores' worth of
    splits and this is a no-op, so AQE's own byte-based sizing is never
    overridden where it matters."""
    est_splits = _est_input_splits(base)
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    threshold = max(2, int(target * min_fraction))
    if est_splits is not None and est_splits < threshold:
        return df.repartition(target)
    return df


# -- persist lifecycle --------------------------------------------------------
# Operators that persist intermediates (LSH signatures, CC labels) register
# them here so long-lived sessions (REPL, repeated pipeline runs) can release
# storage instead of accumulating cached tables.

_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later ``cleanup()``."""
    df.persist()
    _PERSISTED.append(df)
    return df


def cleanup() -> int:
    """Unpersist every operator-cached DataFrame; returns how many."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
        n += 1
    return n


def hash32(col):
    """The portable 32-bit hash idiom shared with every DuckDB oracle:
    first 8 md5 hex digits as a bigint — Spark ``conv(substr(md5(x),1,8),
    16,10)`` == DuckDB ``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``.
    ONE definition so the Spark side and the oracle SQL form can't drift.

    When the hash drives STATISTICAL sampling (not just bucketing or
    portable ids), salt the input so the sampling hash is an independent
    family from any hash the data itself may have been generated with —
    see sketches.QUANTILE_SALT for a measured case where the unsalted
    rank correlated with the sampled value.  Pure selection-determinism
    uses (splits, shard assignment, mix thresholds) were measured
    unbiased on this data and keep the bare form for oracle simplicity."""
    from pyspark.sql import functions as F

    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long"))
