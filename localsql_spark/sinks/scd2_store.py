"""Persisted SCD2 history store: the production shape of operators.scd2.

Layout under ``store_dir``::

    open/batch_<id>/       the CURRENT version of every key as of the last
                           applied batch (each batch rewrites this slice —
                           it is dimension-sized, not history-sized)
    closed/batch_<id>/     versions closed BY batch <id> (append-only: a
                           batch never touches another batch's closed dir)
    closed/compact_upto_<id>/  optional: all closed versions from batches
                           ``<= id`` folded into one size-bounded dir by
                           :func:`compact_scd2_store`
    _staging/              in-flight writes; never read

Why the split matters at 100 TB: the open slice a batch must join is
bounded by the dimension's key count, while the closed history grows
forever — so per-batch cost tracks the dimension, not the accumulated
history, and the closed majority is never read or rewritten.  As-of
reads union both slices (operators.scd2.scd2_as_of works unchanged on
``read_history``).

Atomic commit protocol (fixes the round-5 advisory: the two slices used
to be two independent Spark writes with no commit point):

1. Both slices are written to ``_staging/batch_<id>/{closed,open}`` —
   Spark jobs never touch the live tree.
2. Commit = two directory renames, CLOSED FIRST, OPEN SECOND.  The open
   rename is the visibility point: ``_latest_open`` keys on ``open/``,
   and ``read_history`` ignores any ``closed/batch_<id>`` whose id is
   GREATER than the latest open snapshot's id — so a closed dir whose
   open sibling never landed is invisible, and once ``open/batch_<id>``
   exists its closed sibling is guaranteed complete (it was renamed
   first).
3. Before committing, any live dirs for THIS batch id are removed
   unconditionally, OPEN FIRST (the store atomically falls back to the
   predecessor snapshot; an orphaned closed dir — e.g. from a crash
   between the two renames of a prior attempt — is ignored by the id
   rule and cleared here so the rename targets are free), then the batch
   is committed as in (2).  Every crash point therefore exposes either
   the predecessor state or the fully-committed new state, never a mix,
   and re-applying after ANY crash point succeeds.

``_latest_open`` additionally skips snapshots lacking Spark's
``_SUCCESS`` marker — belt-and-braces against a tree produced by an
older writer that crashed mid-job.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.sinks.locks import locked_by

from localsql_spark.operators.scd2 import scd2_apply, scd2_init


def _batch_id(p: Path) -> int:
    return int(p.name.rsplit("_", 1)[1])


_INTERVAL_COLS = ("valid_from_us", "valid_to_us")


def _registry_attrs(store_dir: str, key_cols: list[str]) -> list[str] | None:
    """The ATTRIBUTE columns the store's schema registry declares (all
    registered columns minus keys and interval bounds), or None when the
    store is unregistered.  SCD2 is the store family where additive
    evolution flows END-TO-END: attr_cols are parameters of the apply,
    so an evolved dimension needs no fold-code change — the registry is
    the single source of truth for which attributes a version row
    carries, and every reader sees ONE stable shape across ``as_of``
    boundaries."""
    from localsql_spark.sinks.schema_evolution import current_columns
    cur = current_columns(store_dir)
    if cur is None:
        return None
    cols, _ = cur
    return [c for c in cols if c not in key_cols
            and c not in _INTERVAL_COLS]


def _read_slice(spark: SparkSession, store_dir: str, paths: list[str],
                mode: str = "read") -> DataFrame:
    """Read history dirs under the registry's evolved schema when one
    exists (dirs written before an evolution yield nulls/read-defaults
    in the added columns), plain inference otherwise.  ``mode='write'``
    for reads feeding a rewrite (apply's carried rows, compaction) —
    read-defaults must never bake into stored bytes."""
    from localsql_spark.sinks.schema_evolution import (evolved_read_schema,
                                                       reconcile_frame)
    ddl = evolved_read_schema(store_dir)
    if ddl is None:
        return spark.read.parquet(*paths)
    return reconcile_frame(spark.read.schema(ddl).parquet(*paths),
                           store_dir, mode=mode)


def _commit_dir(staged: Path, live: Path) -> None:
    live.parent.mkdir(parents=True, exist_ok=True)
    staged.rename(live)


@locked_by("store_dir")
def init_store(dim: DataFrame, store_dir: str, key_cols: list[str],
               attr_cols: list[str], ts_us: int) -> None:
    """Open version for every dimension row, committed as batch 0."""
    store = Path(store_dir)
    staged = store / "_staging" / "batch_0" / "open"
    h = scd2_init(dim, key_cols, attr_cols, ts_us)
    h.write.mode("overwrite").parquet(str(staged))
    live = store / "open" / "batch_0"
    if live.exists():  # replayed init: supersede atomically via tmp swap
        shutil.rmtree(live)
    _commit_dir(staged, live)
    shutil.rmtree(store / "_staging", ignore_errors=True)


def _open_snapshots(store: Path) -> list[Path]:
    """Committed open snapshots, oldest->newest.  A snapshot missing its
    ``_SUCCESS`` marker is an aborted write from a non-staging writer —
    skipped so readers fall back to the last complete snapshot."""
    return sorted((p for p in store.glob("open/batch_*")
                   if (p / "_SUCCESS").exists()),
                  key=_batch_id)


def _latest_open(store: Path) -> Path:
    batches = _open_snapshots(store)
    if not batches:
        raise FileNotFoundError(f"no open slice in {store} — init_store first")
    return batches[-1]


@locked_by("store_dir")
def apply_batch(spark: SparkSession, store_dir: str, updates: DataFrame,
                key_cols: list[str], attr_cols: list[str],
                batch_ts_us: int, batch_id: int) -> None:
    """Apply one update batch: reads ONLY the open slice, stages the new
    open snapshot and the versions this batch closed, then commits both
    via directory renames (closed first — see module docstring).
    Replaying the same ``batch_id`` (same updates) recreates identical
    directories.

    Schema-registered store (sinks/schema_evolution.py): the registry's
    attribute set is AUTHORITATIVE — ``attr_cols`` must be a subset
    (an unregistered attribute raises: evolve_schema first, then
    apply), the open slice reads under the evolved schema (a
    pre-evolution snapshot yields nulls in the added columns), and a
    registered attribute the batch does not carry CARRIES FORWARD from
    each key's current open version (new keys get NULL) — padding NULL
    instead would close every current version against an old producer's
    batch and erase the evolved attribute from the open slice.  Old
    producers therefore keep working after an evolution, updating only
    the attributes they know."""
    store = Path(store_dir)
    prev = _latest_open(store)
    if _batch_id(prev) > batch_id:
        raise ValueError(
            f"batch {batch_id} is older than applied {prev.name} — "
            "replays must use the original batch id")
    if _batch_id(prev) == batch_id:
        # replay of the latest batch: rebuild from the snapshot BEFORE it
        opens = _open_snapshots(store)
        if len(opens) < 2:
            raise ValueError(f"cannot replay {batch_id}: prior snapshot "
                             "already pruned")
        prev = opens[-2]

    # 1. stage both slices — no live-tree writes
    staging = store / "_staging" / f"batch_{batch_id}"
    shutil.rmtree(staging, ignore_errors=True)
    # mode='write': the open slice's carried rows are REWRITTEN into the
    # new snapshot — read-defaults must not bake into their bytes
    current = _read_slice(spark, store_dir, [str(prev)], mode="write")
    reg_attrs = _registry_attrs(store_dir, key_cols)
    if reg_attrs is not None:
        rogue = sorted(set(attr_cols) - set(reg_attrs))
        if rogue:
            raise ValueError(
                f"updates carry unregistered attributes {rogue} for store "
                f"{store_dir!r} — evolve_schema first, then apply")
        unknown = sorted(set(updates.columns) - set(key_cols)
                         - set(reg_attrs))
        if unknown:
            raise ValueError(
                f"update batch carries unregistered columns {unknown} for "
                f"store {store_dir!r} — evolve_schema first, then apply")
        # carry-forward: registered attributes the batch does not carry
        # take each key's CURRENT value (one dimension-bounded join,
        # only when an old producer writes post-evolution)
        absent = [c for c in reg_attrs if c not in updates.columns]
        if absent:
            cur_vals = current.select(*key_cols, *absent)
            updates = updates.join(cur_vals, key_cols, "left")
        attr_cols = reg_attrs
    # out-of-order timestamps corrupt the interval algebra silently: a
    # batch_ts at or before an open version's valid_from closes it as an
    # INVERTED interval [from, ts) with ts < from (matches no as-of time)
    # and the new open version overlaps the earlier closed one — as-of
    # reads then fan out.  One tiny agg over the dimension-sized open
    # slice catches it up front (batch_id monotonicity alone does not
    # constrain the timestamps).
    max_from = current.agg(F.max("valid_from_us")).first()[0]
    if max_from is not None and batch_ts_us <= max_from:
        raise ValueError(
            f"batch_ts_us={batch_ts_us} is not after the open slice's "
            f"latest valid_from_us={max_from} — out-of-order SCD2 "
            f"timestamps would create inverted/overlapping version "
            f"intervals; replay with the original batch timestamp")
    new_hist = scd2_apply(current, updates, key_cols, attr_cols, batch_ts_us)
    new_hist = new_hist.localCheckpoint(eager=True)  # one compute, two writes
    (new_hist.filter(F.col("valid_to_us") == batch_ts_us)
     .write.mode("overwrite").parquet(str(staging / "closed")))
    (new_hist.filter(F.col("valid_to_us").isNull())
     .write.mode("overwrite").parquet(str(staging / "open")))

    # 2. retract any previous attempt at this batch UNCONDITIONALLY, OPEN
    # FIRST so every intermediate state reads as the predecessor snapshot.
    # Not gated on ``replay``: a crash between the closed and open renames
    # of a prior attempt leaves an orphaned ``closed/batch_<id>`` with no
    # open sibling (invisible to readers by the id rule, but a non-empty
    # rename target that would make the step-3 commit raise ENOTEMPTY).
    shutil.rmtree(store / "open" / f"batch_{batch_id}", ignore_errors=True)
    shutil.rmtree(store / "closed" / f"batch_{batch_id}", ignore_errors=True)

    # 3. commit: closed first, open second (open rename = visibility point)
    _commit_dir(staging / "closed", store / "closed" / f"batch_{batch_id}")
    _commit_dir(staging / "open", store / "open" / f"batch_{batch_id}")
    shutil.rmtree(store / "_staging", ignore_errors=True)

    # 4. prune superseded open snapshots, keeping one predecessor so the
    # latest batch stays replayable
    opens = _open_snapshots(store)
    for p in opens[:-2]:
        shutil.rmtree(p, ignore_errors=True)


def _committed_closed_dirs(store: Path) -> list[Path]:
    """Closed dirs that are part of the committed history: the newest
    ``compact_upto_<M>`` (if any) plus every ``batch_<id>`` with
    ``M < id <= latest_open`` — ids above the latest open snapshot are
    in-flight or orphaned commits, ids at or below M are folded into the
    compact dir (their directories are removed opportunistically)."""
    latest = _batch_id(_latest_open(store))
    compacts = sorted(store.glob("closed/compact_upto_*"), key=_batch_id)
    lo = -1
    out: list[Path] = []
    if compacts:
        out.append(compacts[-1])
        lo = _batch_id(compacts[-1])
    out.extend(p for p in sorted(store.glob("closed/batch_*"), key=_batch_id)
               if lo < _batch_id(p) <= latest)
    return out


def read_history(spark: SparkSession, store_dir: str) -> DataFrame:
    """The full version history: latest open snapshot + every committed
    closed dir.  Compatible with operators.scd2.scd2_as_of/enrich_asof.
    A schema-registered store reads EVERY dir vintage under the
    registry's evolved schema, so versions closed before an evolution
    carry nulls/read-defaults in the added columns and an ``as_of``
    read across the boundary sees one stable shape."""
    store = Path(store_dir)
    h = _read_slice(spark, store_dir, [str(_latest_open(store))])
    closed_dirs = _committed_closed_dirs(store)
    if closed_dirs:
        closed = _read_slice(spark, store_dir,
                             [str(p) for p in closed_dirs])
        h = h.unionByName(closed.select(h.columns))
    return h


@locked_by("store_dir")
def compact_scd2_store(spark: SparkSession, store_dir: str,
                       target_files: int = 4) -> int:
    """Fold the committed ``closed/batch_*`` dirs (and any previous
    compact dir) with id STRICTLY BELOW the latest open batch id N into
    one ``closed/compact_upto_<N-1>`` with ``target_files`` parquet
    files.  The latest batch's closed dir is deliberately left unfolded:
    replaying batch N temporarily retracts ``open/batch_N`` (readers fall
    back to N-1), and a compact dir carrying id N would then outrank the
    visible snapshot — capping the compact id at N-1 keeps the
    ``compact_id <= latest_open_id`` invariant through every replay
    window.

    At daily batch cadence the closed tree otherwise grows one directory
    (with one-or-more small files) per batch forever — the classic
    many-small-files problem.  Compaction is itself crash-safe: the new
    dir is staged then renamed into place, and the rename alone changes
    what :func:`_committed_closed_dirs` reads (everything with id <= N-1
    is superseded by the name rule), so removing the folded dirs
    afterwards is opportunistic cleanup, not part of the commit.

    Returns the number of directories folded (0 = nothing to do).
    """
    store = Path(store_dir)
    latest = _batch_id(_latest_open(store))
    dirs = [p for p in _committed_closed_dirs(store)
            if _batch_id(p) < latest]
    if len(dirs) <= 1:
        return 0
    upto = latest - 1
    staged = store / "_staging" / f"compact_{upto}"
    shutil.rmtree(staged, ignore_errors=True)
    # registered store: the folded dirs may span evolution vintages — a
    # raw multi-path read infers the scan schema from one arbitrary file
    # and would silently drop evolved columns' data from newer dirs
    # (the compact_partitions lesson, advisor r12); mode='write' so no
    # read-default bakes into the compacted bytes
    (_read_slice(spark, store_dir, [str(p) for p in dirs], mode="write")
     .coalesce(target_files)
     .write.mode("overwrite").parquet(str(staged)))
    live = store / "closed" / f"compact_upto_{upto}"
    if live.exists():
        shutil.rmtree(live)
    _commit_dir(staged, live)  # COMMIT POINT — one rename
    # opportunistic cleanup of superseded dirs (crash here = duplicates on
    # disk but NOT in read_history, which follows the name rule)
    for p in dirs:
        shutil.rmtree(p, ignore_errors=True)
    shutil.rmtree(store / "_staging", ignore_errors=True)
    return len(dirs)


def _recover_orphaned_swaps(store: Path) -> None:
    """Heal a crash between an erase swap's two renames: a ``.NAME.old``
    backup whose target dir is missing is renamed back (pre-erase state —
    re-running the erase redoes it); one whose target exists is a
    completed swap's leftover and is cleared.  Same replay rule as the
    merge sink's ``_apply_manifest``."""
    for old in list(store.glob("*/.*.old")):
        target = old.parent / old.name[1:-len(".old")]
        if target.exists():
            shutil.rmtree(old, ignore_errors=True)
        else:
            old.rename(target)


@locked_by("store_dir")
def scd2_erase_keys(spark: SparkSession, store_dir: str, keys: DataFrame,
                    key_col: str) -> int:
    """Right-to-be-forgotten PROPAGATION into the SCD2 history store:
    remove the erased subjects' ENTIRE version chain — open version and
    every closed version — from every committed slice.  History is the
    canonical place erased content survives "deletion" (the whole point
    of SCD2 is to keep what changed), so an erasure obligation must reach
    it explicitly.

    Each committed dir (open snapshots kept for replay, closed batch and
    compact dirs) rewrites independently: filter out the keys, stage,
    dir swap with a ``.old`` backup.  The swap is two renames, so a crash
    between them leaves the dir only at its hidden backup path —
    :func:`_recover_orphaned_swaps` runs FIRST on every call and restores
    any backup whose target is missing (or clears it when the target
    landed), so re-running the same request genuinely completes the rest
    (idempotent: erasing absent keys is a no-op) and every recovered
    state is a valid store (the commit protocol's id rules are untouched
    because no dir ids change).  Returns the number of history rows
    removed."""
    store = Path(store_dir)
    _recover_orphaned_swaps(store)
    from localsql_spark.sinks.erase import normalize_erase_keys
    k = normalize_erase_keys(keys)
    targets = list(_open_snapshots(store)) + _committed_closed_dirs(store)
    removed = 0
    for d in targets:
        df = spark.read.parquet(str(d))
        hit = df.join(F.broadcast(k),
                      F.col(key_col) == F.col("_erase_key"), "semi").count()
        if hit == 0:
            continue
        removed += hit
        kept = df.join(F.broadcast(k),
                       F.col(key_col) == F.col("_erase_key"), "left_anti")
        staged = store / "_staging" / f"erase_{d.name}"
        shutil.rmtree(staged, ignore_errors=True)
        kept.write.mode("overwrite").parquet(str(staged))
        old = d.parent / f".{d.name}.old"
        shutil.rmtree(old, ignore_errors=True)
        d.rename(old)
        staged.rename(d)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(store / "_staging", ignore_errors=True)
    return removed
