"""Additive schema evolution for the persisted stores.

Every store in this package was fixed-schema: the drift REPORT existed
(`operators.quality.schema_drift` names added/missing/type-changed
columns) but nothing APPLIED an evolution — a producer that legitimately
gained a column had to rebuild the store.  This module adds the standard
additive evolution contract (Delta/Iceberg's "schema evolution", public
semantics, re-expressed over plain hive-partitioned parquet):

- A store's schema lives in a ``_schema.json`` REGISTRY next to its
  bytes: an ordered list of versions, each the FULL column list plus
  the columns that version added and their optional read DEFAULTS.
  The registry is the single source of truth for what a read returns.
- Evolution is ADDITIVE ONLY: :func:`evolve_schema` appends a version
  that adds columns.  Type changes, drops, and renames are rejected —
  they cannot be reconciled against immutable old parquet footers
  without a rewrite, which is a migration, not an evolution (the same
  line the table formats draw for their metadata-only path).
- Old bytes are NEVER rewritten.  A read under the registry supplies
  the CURRENT version's schema explicitly to the parquet scan: files
  written before an evolution simply yield nulls for the columns they
  predate (parquet's missing-column semantics), and declared defaults
  fill them at read time (`coalesce`).  This is the property that
  makes evolution O(1) at 100 TB — a metadata commit, zero data jobs,
  exactly like `expire_partitions` on the retention side.
- Reads RECONCILE ACROSS the evolution boundary by construction: a
  time-travel replay (`table_as_of`) whose prefix spans old and new
  feed batches, an erase that rewrites a touched partition (new
  schema) next to untouched ones (old schema), a subject-access export
  over both — all read through the same explicit-schema scan and see
  one stable frame shape.
- Writers are VALIDATED against the registry: a batch carrying a
  column the registry does not know raises (evolve first, then
  ingest — the drift report's 'added' status now has an action), and
  a batch missing registered columns is padded with NULL so old
  producers keep working after an evolution.  Write reconciliation
  never materializes a default into the bytes (an explicit NULL is
  stored as NULL); declared defaults are READ-TIME null-fill — see
  :func:`reconcile_frame` for the exact contract and its honest
  plain-parquet limitation.
- The registry's types are ENFORCED against the bytes: readers supply
  the explicit evolved schema to the scan (when the partition column
  was recorded at init), so a registry that declares a narrower type
  than the files hold fails fast at read instead of silently casting —
  the registry is a contract over the store, not a view over it.

Registry JSON shape::

    {"versions": [
        {"v": 1, "columns": {"doc_id": "bigint", "text": "string"},
         "added": ["doc_id", "text"], "defaults": {}},
        {"v": 2, "columns": {..., "quality": "double"},
         "added": ["quality"], "defaults": {"quality": 0.5}}]}

Commit is tmp+rename (the package-wide metadata commit); the registry
is store-adjacent so the hardlink-farm probes and erase/maintenance
passes carry it automatically.  Single-writer contract for
:func:`evolve_schema`, same as every maintenance step.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.sinks.locks import store_lock

SCHEMA_FILE = "_schema.json"

__all__ = ["SCHEMA_FILE", "read_registry", "current_columns",
           "init_schema", "evolve_schema", "reconcile_frame",
           "evolved_read_schema", "schema_version",
           "registered_partition", "gate_fold_write", "carry_registry"]


def _registry_path(store_dir: str) -> Path:
    return Path(store_dir) / SCHEMA_FILE


def read_registry(store_dir: str) -> list[dict] | None:
    """The version list, oldest first, or None when the store is
    unregistered (every reader then behaves exactly as before this
    module existed — registry presence is the feature gate)."""
    p = _registry_path(store_dir)
    if not p.exists():
        return None
    data = json.loads(p.read_text())
    versions = data.get("versions", [])
    return versions or None


def schema_version(store_dir: str) -> int:
    """Current schema version (0 = unregistered)."""
    reg = read_registry(store_dir)
    return reg[-1]["v"] if reg else 0


def current_columns(store_dir: str) -> tuple[dict[str, str], dict] | None:
    """(ordered {column: spark_sql_type}, {column: default}) for the
    newest version, or None when unregistered."""
    reg = read_registry(store_dir)
    if reg is None:
        return None
    cols = dict(reg[-1]["columns"])
    defaults: dict = {}
    for v in reg:  # defaults accumulate; later versions may not repeat them
        defaults.update(v.get("defaults", {}))
    return cols, {k: v for k, v in defaults.items() if k in cols}


def init_schema(store_dir: str, columns: dict[str, str],
                partition: tuple[str, str] | None = None) -> int:
    """Register version 1 = the store's current contract.  Idempotent
    when ``columns`` matches the registered v1 base OR the current
    (evolved) contract — a setup script may naturally re-init with
    either; any other shape raises (a registry is a contract, not a
    cache).  ``partition`` optionally records the store's hive
    partition column as (name, spark_sql_type) so readers can supply
    an EXPLICIT scan schema (O(1) metadata) instead of falling back to
    a whole-read footer merge.  The WRITE is a locked read-modify-write
    (same contract as :func:`evolve_schema`); the idempotent re-init of
    an already-registered store is a pure read and stays available
    during a maintenance window (no lock) — re-checked under the lock
    before any write."""
    def _check(reg):
        if columns in (reg[0]["columns"], reg[-1]["columns"]):
            return reg[-1]["v"]
        raise ValueError(
            f"store {store_dir!r} already registered with a "
            f"different schema: base {reg[0]['columns']} / current "
            f"{reg[-1]['columns']} != {columns}")

    reg = read_registry(store_dir)
    if reg is not None:  # idempotent fast path, lock-free
        return _check(reg)
    with store_lock(store_dir):
        reg = read_registry(store_dir)  # re-check under the lock
        if reg is not None:
            return _check(reg)
        spec = {"v": 1, "columns": dict(columns),
                "added": list(columns), "defaults": {}}
        if partition is not None:
            spec["partition"] = {"name": partition[0],
                                 "type": partition[1]}
        _write_registry(store_dir, [spec])
        return 1


def registered_partition(store_dir: str) -> tuple[str, str] | None:
    """The (name, type) the registry recorded for the store's hive
    partition column at init, or None."""
    reg = read_registry(store_dir)
    if not reg:
        return None
    p = reg[0].get("partition")
    return (p["name"], p["type"]) if p else None


def evolve_schema(store_dir: str, add: dict[str, str],
                  defaults: dict | None = None) -> int:
    """Append an additive version: ``add`` maps new column -> spark sql
    type; ``defaults`` optionally maps a subset of them to the value
    old rows read back as (otherwise null).  Rejects collisions with
    existing columns (a type change in disguise) and requires the store
    to be registered (:func:`init_schema`).  Metadata-only: commits the
    registry via tmp+rename, touches no data file.  Returns the new
    version number.

    Runs under the store's maintenance lock — the read-modify-write of
    the version list is otherwise a lost-update race between two
    evolutions, and an evolution mid-fold could slip between a fold's
    write gate and its commit (the docstring's single-writer contract,
    now enforced like every other maintenance step; a held fold lock
    makes a concurrent evolve raise MaintenanceBusy)."""
    with store_lock(store_dir):
        reg = read_registry(store_dir)
        if reg is None:
            raise ValueError(
                f"store {store_dir!r} has no schema registry — call "
                f"init_schema with the current contract first")
        cur = reg[-1]["columns"]
        clash = sorted(set(add) & set(cur))
        if clash:
            raise ValueError(
                f"additive evolution only: {clash} already exist in "
                f"version {reg[-1]['v']} (a type change or re-add "
                f"requires a store migration, not an evolution)")
        if not add:
            raise ValueError("evolve_schema: nothing to add")
        bad_defaults = sorted(set(defaults or {}) - set(add))
        if bad_defaults:
            raise ValueError(
                f"defaults name columns not being added: {bad_defaults}")
        new = {"v": reg[-1]["v"] + 1, "columns": {**cur, **add},
               "added": list(add), "defaults": dict(defaults or {})}
        _write_registry(store_dir, reg + [new])
        return new["v"]


def _write_registry(store_dir: str, versions: list[dict]) -> None:
    Path(store_dir).mkdir(parents=True, exist_ok=True)
    p = _registry_path(store_dir)
    tmp = Path(str(p) + f".tmp.{os.getpid()}")
    tmp.write_text(json.dumps({"versions": versions}, indent=1))
    os.replace(tmp, p)


def evolved_read_schema(store_dir: str,
                        extra: dict[str, str] | None = None) -> str | None:
    """The DDL string a reader must supply to the parquet scan so files
    from EVERY schema version reconcile (missing columns -> null), or
    None when unregistered.  ``extra`` appends reader-side columns the
    registry doesn't govern (a hive partition column like ``kb``)."""
    cur = current_columns(store_dir)
    if cur is None:
        return None
    cols, _ = cur
    allc = {**cols, **(extra or {})}
    return ", ".join(f"{k} {t}" for k, t in allc.items())


def _default_lit(v) -> Column:
    return F.lit(v)


def _validated_cast(df: DataFrame, name: str, typ: str) -> Column:
    """Write-mode cast of a batch column to its registry type that
    FAILS FAST when a value would be silently NULLed: a mistyped
    producer value (string ``'abc'`` into a ``double``) is schema
    corruption, not data — the bare ``cast`` stores NULL for it in
    non-ANSI sessions, and the registry's 'types are enforced' claim
    held only for the read-scan path (advisor r12).  Row-local in-plan
    guard (``try_cast`` + ``raise_error``), no extra job; skipped
    entirely when the batch already carries the registered type (the
    cast is the identity, nothing to validate)."""
    c = F.col(name)
    have = df.schema[name].dataType.simpleString().lower()
    if have == typ.strip().lower():
        return c
    tc = c.try_cast(typ)
    return F.when(
        c.isNotNull() & tc.isNull(),
        F.raise_error(F.concat(
            F.lit(f"reconcile_frame: column {name!r} value "),
            c.cast("string"),
            F.lit(f" (batch type {have}) does not cast to the "
                  f"registry type {typ} — fix the producer or "
                  f"migrate the store"))).cast(typ)
    ).otherwise(tc)


def reconcile_frame(df: DataFrame, store_dir: str,
                    keep_extra: list[str] | None = None,
                    mode: str = "read", strict: bool = False) -> DataFrame:
    """Conform ``df`` to the registry's current contract: registered
    columns in registry order, ``keep_extra`` columns
    (partition/bookkeeping) carried through.  Raises on a column the
    registry does not know — the evolve-first-then-ingest gate that
    turns the drift report's 'added' finding into an action instead of
    silent schema corruption.  Row-local projection: no shuffle, no
    job.

    Default semantics are MODE-split so stored bytes never fabricate a
    value:

    - ``mode="write"`` (ingest reconciliation): a column the batch
      does not carry pads with NULL — never the declared default — so
      the stored bytes stay canonical and a later default change
      applies retroactively; a column the batch DOES carry is cast
      only, so a producer's explicit NULL is stored as NULL.  The cast
      is VALIDATED in-plan (advisor r12): when the batch's column type
      differs from the registry's, a value the cast would silently
      NULL (e.g. the string ``'abc'`` into a ``double`` column) raises
      at write instead of storing a fabricated NULL — the same
      fail-fast contract the read-scan path already has.  Same-type
      columns skip the guard (the cast is the identity).
    - ``mode="read"``: declared defaults fill nulls in their columns.
      Plain parquet cannot distinguish a pre-evolution absent value
      from a post-evolution explicit NULL at frame level (both read
      back as NULL; Delta/Iceberg make the distinction per data file
      via table metadata), so a declared default is a READ-TIME
      null-fill for the WHOLE column: declare one only where NULL
      never carries meaning, otherwise omit it and handle nulls
      downstream — this is the honest contract, stated here instead
      of silently overwriting stored NULLs at write time (review
      round 12).

    ``strict=True`` (write mode, FOLD stores): a registered column the
    frame does not carry RAISES instead of padding NULL.  Ingest stores
    pad (an old producer's batch legitimately lacks an evolved column —
    the merge carries whole stored rows through untouched), but a
    GROUP-PROJECTING fold (rollup/IVM/inverted-index merges) rebuilds
    the touched partitions from its own output columns: padding an
    evolved column there would overwrite stored values with NULL.  The
    strict gate makes 'evolve the registry' and 'extend the fold code'
    one atomic rollout."""
    if mode not in ("read", "write"):
        raise ValueError(f"reconcile_frame mode must be read|write, "
                         f"got {mode!r}")
    cur = current_columns(store_dir)
    if cur is None:
        return df
    cols, defaults = cur
    extra = list(keep_extra or [])
    unknown = sorted(set(df.columns) - set(cols) - set(extra))
    if unknown:
        raise ValueError(
            f"batch carries unregistered columns {unknown} for store "
            f"{store_dir!r} (schema v{schema_version(store_dir)}) — "
            f"evolve_schema first, then ingest")
    if strict and mode == "write":
        absent = sorted(set(cols) - set(df.columns))
        if absent:
            raise ValueError(
                f"fold output is missing registered columns {absent} for "
                f"store {store_dir!r} (schema "
                f"v{schema_version(store_dir)}) — a group-projecting fold "
                f"rewrite would overwrite their stored values with NULL; "
                f"extend the fold to compute them (deploy fold code with "
                f"the evolution)")
    out = []
    for name, typ in cols.items():
        if name in df.columns:
            c = _validated_cast(df, name, typ) if mode == "write" \
                else F.col(name).cast(typ)
            if mode == "read" and name in defaults:
                c = F.coalesce(c, _default_lit(defaults[name]).cast(typ))
        elif mode == "read" and name in defaults:
            c = _default_lit(defaults[name]).cast(typ)
        else:
            c = F.lit(None).cast(typ)
        out.append(c.alias(name))
    # a keep_extra column the registry ALSO knows was already emitted by
    # the loop above — appending it again would produce a duplicate-name
    # frame (ambiguous references downstream of every fold gate)
    out += [F.col(c) for c in extra if c in df.columns and c not in cols]
    return df.select(*out)


def gate_fold_write(df: DataFrame, store_dir: str,
                    partition_col: str) -> DataFrame:
    """THE strict fold write gate, shared by every partitioned fold
    store (rollup, IVM, inverted index, NB model, sketch view): conform
    a frame about to be WRITTEN to the registry contract — rejects
    columns the registry does not know (evolve_schema first: catches a
    fold-code change racing ahead of the store's declared contract) AND
    registered columns the fold does not compute (strict: the
    group-projecting merge would overwrite their stored values with
    NULL — deploy extended fold code with the evolution); never bakes
    read-defaults into bytes (mode='write').  Unregistered store:
    unchanged frame (registry presence is the feature gate, here as
    everywhere).  One implementation so the fold stores can never
    diverge on what 'gated' means."""
    if read_registry(store_dir) is None:
        return df
    return reconcile_frame(df, store_dir, keep_extra=[partition_col],
                           mode="write", strict=True)


def carry_registry(src_dir, dst_dir) -> None:
    """Copy ``src_dir``'s schema registry into ``dst_dir`` (no-op when
    unregistered).  Every WHOLE-DIR swap must call this on its
    replacement dir before the rename — the registry lives INSIDE the
    store directory, so a compaction / erase / rebuild that swaps the
    dir wholesale would otherwise silently de-register the store (found
    round 13 on the signature-store compactor; the rebuild swapper had
    the same gap)."""
    import shutil

    src = Path(src_dir) / SCHEMA_FILE
    if src.exists():
        dst = Path(dst_dir)
        dst.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst / SCHEMA_FILE)
