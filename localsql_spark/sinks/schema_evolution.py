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
  a batch missing registered columns is padded with nulls/defaults so
  old producers keep working after an evolution.

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

SCHEMA_FILE = "_schema.json"

__all__ = ["SCHEMA_FILE", "read_registry", "current_columns",
           "init_schema", "evolve_schema", "reconcile_frame",
           "evolved_read_schema", "schema_version"]


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


def init_schema(store_dir: str, columns: dict[str, str]) -> int:
    """Register version 1 = the store's current contract.  Idempotent
    when the existing v1 matches; raises on mismatch (a registry is a
    contract, not a cache)."""
    reg = read_registry(store_dir)
    if reg is not None:
        if reg[0]["columns"] == columns and len(reg) >= 1:
            return reg[-1]["v"]
        raise ValueError(
            f"store {store_dir!r} already registered with a different "
            f"base schema: {reg[0]['columns']} != {columns}")
    _write_registry(store_dir, [{
        "v": 1, "columns": dict(columns),
        "added": list(columns), "defaults": {}}])
    return 1


def evolve_schema(store_dir: str, add: dict[str, str],
                  defaults: dict | None = None) -> int:
    """Append an additive version: ``add`` maps new column -> spark sql
    type; ``defaults`` optionally maps a subset of them to the value
    old rows read back as (otherwise null).  Rejects collisions with
    existing columns (a type change in disguise) and requires the store
    to be registered (:func:`init_schema`).  Metadata-only: commits the
    registry via tmp+rename, touches no data file.  Returns the new
    version number."""
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
            f"version {reg[-1]['v']} (a type change or re-add requires "
            f"a store migration, not an evolution)")
    if not add:
        raise ValueError("evolve_schema: nothing to add")
    bad_defaults = sorted(set(defaults or {}) - set(add))
    if bad_defaults:
        raise ValueError(
            f"defaults name columns not being added: {bad_defaults}")
    new = {"v": reg[-1]["v"] + 1,
           "columns": {**cur, **{k: add[k] for k in add}},
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


def reconcile_frame(df: DataFrame, store_dir: str,
                    keep_extra: list[str] | None = None) -> DataFrame:
    """Conform ``df`` to the registry's current contract: registered
    columns in registry order (absent ones added as default/null,
    declared defaults coalesced over nulls in evolved columns for rows
    that predate them), ``keep_extra`` columns (partition/bookkeeping)
    carried through.  Raises on a column the registry does not know —
    the evolve-first-then-ingest gate that turns the drift report's
    'added' finding into an action instead of silent schema corruption.
    Row-local projection: no shuffle, no job."""
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
    out = []
    for name, typ in cols.items():
        if name in df.columns:
            c = F.col(name).cast(typ)
            if name in defaults:
                c = F.coalesce(c, _default_lit(defaults[name]).cast(typ))
        elif name in defaults:
            c = _default_lit(defaults[name]).cast(typ)
        else:
            c = F.lit(None).cast(typ)
        out.append(c.alias(name))
    out += [F.col(c) for c in extra if c in df.columns]
    return df.select(*out)
