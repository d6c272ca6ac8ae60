"""Key erasure from a hash-bucketed parquet store — the
right-to-be-forgotten operation a data platform must run against every
persisted table, shaped so its cost tracks the DELETION REQUEST, not the
store.

The store partitions on ``kb = pmod(hash32(key), n_buckets)`` (the same
portable hash the rest of the engine uses), which is what makes erasure
scale: the touched-partition set is computed FROM THE KEYS ALONE — one
tiny aggregate over the deletion request, never a scan of the store —
and only those buckets are read (partition-pruned), anti-joined against
the broadcast key set, and rewritten through the shared staged-write +
manifest-rename commit (sinks.merge): one rename is the commit point, a
crashed erase heals on the next call, and at every crash point a reader
sees either the full old state or the full new state of each bucket.

Contrast with the transactional-format alternative (Delta/Iceberg
deletion vectors): those defer the rewrite by masking row ids at read
time; this module is the eager rewrite — simpler invariants (the bytes
are GONE at commit, which is what an erasure obligation usually means),
same touched-partition cost bound.

At 100 TB: a deletion request of K keys touches at most min(K, n_buckets)
partitions; each rewrite is one bucket's rows anti-joined against a
broadcast key set (the request is always broadcastable).  A store
partitioned by something else (date, source) cannot bound erasure below
a full scan — which is exactly why user-keyed stores bucket on the user.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators import hash32


def bucket_of(key_col, n_buckets: int):
    """The store's bucket expression — shared by writer and eraser so the
    two can never disagree about where a key lives."""
    return F.pmod(hash32(key_col), F.lit(n_buckets)).cast("int")


def write_bucketed_store(df: DataFrame, base_dir: str, key_col: str,
                         n_buckets: int = 32) -> None:
    """Materialize a key-bucketed store: hive-partitioned on
    ``kb = hash(key) % n_buckets``.  One shuffle on the bucket key."""
    (df.withColumn("kb", bucket_of(F.col(key_col), n_buckets))
     .write.mode("overwrite").partitionBy("kb").parquet(base_dir))


def erase_keys(spark: SparkSession, base_dir: str, keys: DataFrame,
               key_col: str, n_buckets: int = 32) -> list:
    """Erase every row whose ``key_col`` appears in ``keys`` (a one-column
    DataFrame).  Returns the rewritten bucket values.

    Touched buckets come from hashing the KEYS (bounded by the request),
    the store read is partition-pruned to them, the anti join broadcasts
    the key set, and the rewrite commits via the manifest protocol.
    Erasing absent keys is a no-op rewrite of their buckets (idempotent
    — re-running a deletion request is safe)."""
    from localsql_spark.sinks.merge import (_apply_manifest, _manifest_path,
                                            read_base_partitions,
                                            recover_pending_merge)

    recover_pending_merge(base_dir)
    k = (keys.select(F.col(keys.columns[0]).alias("_erase_key"))
         .filter(F.col("_erase_key").isNotNull()).distinct())
    touched = [r[0] for r in
               k.select(bucket_of(F.col("_erase_key"), n_buckets)
                        .alias("kb")).distinct().collect()]
    if not touched:
        return []
    stored = read_base_partitions(spark, base_dir, "kb", touched)
    if stored is None:
        return []
    kept = stored.join(F.broadcast(k),
                       F.col(key_col) == F.col("_erase_key"),
                       "left_anti")

    base = Path(base_dir)
    staging = base.parent / f".{base.name}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    (kept.write.mode("overwrite").partitionBy("kb").parquet(str(staging)))
    # a bucket whose every row was erased writes no partition dir; stage
    # an explicit empty dir so the swap REMOVES the old bucket contents
    # instead of silently leaving them in place
    for kb in touched:
        d = staging / f"kb={kb}"
        d.mkdir(parents=True, exist_ok=True)
    pnames = sorted(p.name for p in staging.glob("kb=*"))
    manifest = _manifest_path(base)
    tmp = manifest.with_suffix(".json.tmp")
    tmp.write_text(json.dumps({"staging": staging.name,
                               "partitions": pnames}))
    os.rename(tmp, manifest)  # COMMIT POINT — one rename
    _apply_manifest(base, manifest)
    return sorted(touched)


def read_bucketed_store(spark: SparkSession, base_dir: str) -> DataFrame:
    """Read the store back (healing any crashed erase first); filters on
    the bucket column prune whole partitions."""
    from localsql_spark.sinks.merge import recover_pending_merge

    recover_pending_merge(base_dir)
    return spark.read.option("basePath", base_dir).parquet(base_dir)


# ---------------------------------------------------------------------------
# Pseudonymization vault
# ---------------------------------------------------------------------------

def pseudonymize(df: DataFrame, key_col: str, salt: str,
                 token_col: str = "token") -> tuple[DataFrame, DataFrame]:
    """Split a table into an analytics copy carrying only a salted token
    in place of the identifier, plus a VAULT mapping ``(token, key)`` for
    authorized re-identification — pseudonymization, the standard
    pattern for sharing event data with analysts while keeping the raw
    identifier in a separately-governed (and separately-erasable) table.

    Token = md5(salt || key): deterministic (the same key tokenizes
    identically across tables and runs, so joins on the token still
    work), portable (the oracle replays it), and one-way WITHOUT the
    vault only to the extent the key space is large — the salt's real
    job is to break cross-dataset linkage by anyone holding a different
    salt, and rotation = re-pseudonymize with a new salt.  Erasing a
    subject afterwards = delete their vault row AND
    :func:`erase_keys` on the token-keyed analytics store — at which
    point the token is an unlinkable random string.

    Both outputs are row-local projections (zero shuffles beyond the
    vault's distinct); the vault is |distinct keys| rows.
    """
    token = F.md5(F.concat(F.lit(salt),
                           F.col(key_col).cast("string"))).alias(token_col)
    anon = df.select(token, *[c for c in df.columns if c != key_col])
    vault = (df.select(token, F.col(key_col))
             .filter(F.col(key_col).isNotNull()).distinct())
    return anon, vault


def k_anonymity_audit(df: DataFrame, qi_cols: list[str],
                      k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney,
    IJUFKS 2002 — public notion): every row whose QI equivalence class
    has fewer than ``k`` members is re-identifiable by linkage on those
    columns; a release is k-anonymous iff no such class exists.  Run
    BEFORE sharing an "anonymized" extract — pseudonymization alone does
    not help when the quasi-identifiers themselves single a subject out.

    Output: one row per equivalence class —
    ``*qi_cols, class_size, at_risk`` (at_risk = size < k) — small
    classes first.  One groupBy over the QI key with map-side combine;
    output is bounded by the class count, so the audit of a 100 TB
    release is one shuffle and a class-sized result.
    """
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .withColumn("at_risk", F.col("class_size") < k))
