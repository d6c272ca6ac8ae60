"""File discovery, table naming, and catalog registration.

Reproduces the reference's native ingestion/catalog surface
(reference: localsql/localsql.py:78-153, 288-313 — format sniffing, table
auto-naming, directory discovery with per-file error isolation) on top of the
Spark session catalog: each file becomes a temp view named after the file, and
``spark.sql`` then runs directly over the views (no per-query copy — the
reference's copy-into-SQLite step, localsql/localsql.py:230, intentionally has
no equivalent here).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.sources.readers import COMPRESSORS, SUPPORTED_EXTS, df_from_file

# reference: localsql/localsql.py:41 maps a fixed char list to "_"; widened
# here to every non-identifier char so names like report#1.csv can't produce
# an invalid view identifier (which would fail registration silently)
_RE_SPECIAL = re.compile(r"[^A-Za-z0-9_]")
_RE_UNDERSCORES = re.compile(r"__+")


def tablename_from_file(file: str | Path) -> str:
    """Filename -> SQL identifier (reference: localsql/localsql.py:147-153).

    Special characters become ``_``, runs of ``_`` collapse, and a leading
    digit gets a ``t`` prefix: ``csv.csv`` -> ``csv_csv``,
    ``2020-sales.csv`` -> ``t2020_sales_csv``.
    """
    name = Path(file).name
    name = _RE_SPECIAL.sub("_", name)
    name = _RE_UNDERSCORES.sub("_", name)
    if name and name[0].isdigit():
        name = "t" + name
    return name


def register_file(spark: SparkSession, file: str | Path, *,
                  format: str | None = None, json_normalize: bool = False,
                  name: str | None = None) -> tuple[str, DataFrame]:
    """Load one file and register it as a temp view. Returns (name, df)."""
    df = df_from_file(spark, file, format=format, json_normalize=json_normalize)
    table = name or tablename_from_file(file)
    df.createOrReplaceTempView(table)
    return table, df


def discover_files(directory: str | Path, recursive: bool = False) -> list[Path]:
    """Glob candidate data files (reference: localsql/localsql.py:288-300)."""
    pattern = "**/*.*" if recursive else "*.*"
    out = []
    for p in sorted(Path(directory).glob(pattern)):
        if not p.is_file():
            continue
        suffixes = [s.lstrip(".").lower() for s in p.suffixes]
        if suffixes and (suffixes[-1] in SUPPORTED_EXTS
                         or (len(suffixes) >= 2 and suffixes[-1] in COMPRESSORS
                             and suffixes[-2] in SUPPORTED_EXTS)):
            out.append(p)
    return out


def register_directory(spark: SparkSession, directory: str | Path, *,
                       recursive: bool = False, json_normalize: bool = False,
                       verbose: bool = True,
                       existing: set[str] | None = None
                       ) -> dict[str, DataFrame]:
    """Register every readable file in a directory; per-file errors are
    isolated and non-fatal (reference: localsql/localsql.py:302-313).
    ``existing`` carries table names already registered by EARLIER loads
    (the engine passes its catalog) so a colliding name uniquifies
    against those too instead of silently replacing their views."""
    tables: dict[str, DataFrame] = {}
    taken = set(existing or ())
    for f in discover_files(directory, recursive=recursive):
        try:
            # distinct files can normalize to the same identifier
            # ('report#1.csv' and 'report$1.csv' -> report_1_csv); uniquify
            # with a numeric suffix instead of silently overwriting the view
            name = tablename_from_file(f)
            if name in tables or name in taken:
                i = 2
                while f"{name}_{i}" in tables or f"{name}_{i}" in taken:
                    i += 1
                uniq = f"{name}_{i}"
                if verbose:
                    print(f"{f}: table name {name!r} taken -> {uniq!r}")
                name = uniq
            name, df = register_file(spark, f, json_normalize=json_normalize,
                                     name=name)
            tables[name] = df
            if verbose:
                print(f"{f} -> table {name!r} columns={len(df.columns)}")
        except Exception as e:  # noqa: BLE001 — per-file isolation by design
            # errors go to stderr unconditionally: silent mode protects
            # stdout, not failure visibility
            import sys
            print(f"{f}: {e}", file=sys.stderr)
    return tables


_CACHE_DIR = Path(__file__).resolve().parent.parent / ".cache" / "parquet_us"


def _normalize_nanos(path: Path) -> Path:
    """Spark's parquet reader rejects TIMESTAMP(NANOS) columns
    (PARQUET_TYPE_ILLEGAL); the driver's testdata uses them.  Rewrite once
    with microsecond timestamps via pyarrow and read the normalized copy —
    downstream scans stay native/distributed with full predicate pushdown.
    At real scale this is the standard one-time ETL normalization step (Spark
    cannot scan NANOS parquet at all); it is cached and mtime-invalidated.
    """
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    if not any(str(f.type).startswith("timestamp[ns") for f in schema):
        return path
    # the cache key carries a hash of the FULL absolute path: keying on
    # the last two components alone let /runA/sf0.01/orders.parquet and
    # /runB/sf0.01/orders.parquet collide — the mtime check could then
    # serve runA's bytes for runB's table
    import hashlib
    tag = hashlib.md5(str(path.resolve()).encode()).hexdigest()[:8]
    out = _CACHE_DIR / f"{path.parts[-2]}_{tag}" / path.name
    if out.exists() and out.stat().st_mtime >= path.stat().st_mtime:
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    table = pq.read_table(path)
    pq.write_table(table, out, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    return out


# Memoized per (session, sf_dir): every workload query calls load() ->
# register_testdata, and re-reading 10 parquet footers per query is pure
# fixed overhead (~the dominant cost of a small-sf benchmark run).  The key
# is a WeakKeyDictionary on the session object — id() would collide when a
# stopped session's id is reused — and a cache hit still re-runs
# createOrReplaceTempView (cheap catalog upsert) so a view some other code
# replaced or dropped is restored rather than silently left stale.
import weakref

_TESTDATA_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary())


def register_testdata(spark: SparkSession, sf_dir: str,
                      tables: Iterable[str] = ("region", "nation", "customer",
                                               "supplier", "part", "orders",
                                               "lineitem", "events",
                                               "documents", "embeddings"),
                      ) -> dict[str, DataFrame]:
    """Register the driver's parquet tables from an sf directory as views
    (parquet reads memoized per session + directory; view registration
    always re-applied)."""
    per_session = _TESTDATA_CACHE.setdefault(spark, {})
    key = (str(sf_dir), tuple(tables))
    out = per_session.get(key)
    if out is None:
        out = {}
        for t in tables:
            path = Path(f"{sf_dir}/{t}.parquet")
            if path.exists():
                out[t] = spark.read.parquet(str(_normalize_nanos(path)))
        per_session[key] = out
    for t, df in out.items():
        df.createOrReplaceTempView(t)
    return out


def tables_descr(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """Catalog-stats table ['Table','Rows','Columns','Bytes'] (reference:
    localsql/localsql.py:50-54). The reference reports pandas in-memory
    bytes; distributed data has no single resident size, so Bytes here is
    row_count x average UnsafeRow-ish size from a 1000-row sample — an
    estimate, which is what a catalog stat is for."""
    rows = []
    for n, df in sorted(tables.items()):
        count = df.count()
        sample = df.limit(1000).collect()
        avg = (sum(len(str(r)) for r in sample) / len(sample)) if sample else 0
        rows.append((n, count, len(df.columns), int(count * avg)))
    return spark.createDataFrame(
        rows, "Table string, Rows long, Columns long, Bytes long")
