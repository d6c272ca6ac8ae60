"""Persisted SCD2 history store: the production shape of operators.scd2.

Layout under ``store_dir``::

    open/batch_<id>/     the CURRENT version of every key as of the last
                         applied batch (each batch rewrites this slice —
                         it is dimension-sized, not history-sized)
    closed/batch_<id>/   versions closed BY batch <id> (append-only: a
                         batch never touches another batch's closed dir)

Why the split matters at 100 TB: the open slice a batch must join is
bounded by the dimension's key count, while the closed history grows
forever — so per-batch cost tracks the dimension, not the accumulated
history, and the closed majority is never read or rewritten.  As-of
reads union both slices (operators.scd2.scd2_as_of works unchanged on
``read_history``).

Idempotency/crash-safety (same contract as streaming.stream_dedup_ingest):
both sinks write ``batch_<id>`` subdirectories with overwrite semantics,
so a replayed batch rewrites the same directories byte-for-byte instead
of double-appending; ``open/`` keeps only the HIGHEST batch id (earlier
open snapshots are superseded, lower ids pruned on read and removed
opportunistically on the next apply).  A crash mid-apply leaves either
slice individually rewritable by the replay.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators.scd2 import scd2_apply, scd2_init


def init_store(dim: DataFrame, store_dir: str, key_cols: list[str],
               attr_cols: list[str], ts_us: int) -> None:
    """Open version for every dimension row, committed as batch 0."""
    h = scd2_init(dim, key_cols, attr_cols, ts_us)
    (h.write.mode("overwrite")
     .parquet(str(Path(store_dir) / "open" / "batch_0")))


def _latest_open(store: Path) -> Path:
    batches = sorted(store.glob("open/batch_*"),
                     key=lambda p: int(p.name.split("_")[1]))
    if not batches:
        raise FileNotFoundError(f"no open slice in {store} — init_store first")
    return batches[-1]


def apply_batch(spark: SparkSession, store_dir: str, updates: DataFrame,
                key_cols: list[str], attr_cols: list[str],
                batch_ts_us: int, batch_id: int) -> None:
    """Apply one update batch: reads ONLY the open slice, writes the new
    open snapshot and the versions this batch closed.  Replaying the same
    ``batch_id`` (same updates) rewrites identical directories."""
    store = Path(store_dir)
    prev = _latest_open(store)
    if int(prev.name.split("_")[1]) > batch_id:
        raise ValueError(
            f"batch {batch_id} is older than applied {prev.name} — "
            "replays must use the original batch id")
    if int(prev.name.split("_")[1]) == batch_id:
        # replay of the latest batch: rebuild from the snapshot BEFORE it
        opens = sorted(store.glob("open/batch_*"),
                       key=lambda p: int(p.name.split("_")[1]))
        if len(opens) < 2:
            raise ValueError(f"cannot replay {batch_id}: prior snapshot "
                             "already pruned")
        prev = opens[-2]
    current = spark.read.parquet(str(prev))
    new_hist = scd2_apply(current, updates, key_cols, attr_cols, batch_ts_us)
    newly_closed = new_hist.filter(F.col("valid_to_us") == batch_ts_us)
    new_open = new_hist.filter(F.col("valid_to_us").isNull())
    (new_open.write.mode("overwrite")
     .parquet(str(store / "open" / f"batch_{batch_id}")))
    (newly_closed.write.mode("overwrite")
     .parquet(str(store / "closed" / f"batch_{batch_id}")))
    # prune superseded open snapshots, keeping one predecessor so the
    # latest batch stays replayable
    opens = sorted(store.glob("open/batch_*"),
                   key=lambda p: int(p.name.split("_")[1]))
    for p in opens[:-2]:
        shutil.rmtree(p, ignore_errors=True)


def read_history(spark: SparkSession, store_dir: str) -> DataFrame:
    """The full version history: latest open snapshot + every closed dir.
    Compatible with operators.scd2.scd2_as_of / scd2_enrich_asof."""
    store = Path(store_dir)
    h = spark.read.parquet(str(_latest_open(store)))
    closed_dirs = sorted(store.glob("closed/batch_*"))
    if closed_dirs:
        closed = (spark.read
                  .option("recursiveFileLookup", "true")
                  .parquet(str(store / "closed")))
        h = h.unionByName(closed.select(h.columns))
    return h
