"""Result export — csv / jsonl / xlsx / parquet sinks.

Capability parity with the reference's ``\\s`` export
(reference: localsql/localsql.py:171-193, writers at :179-184: csv, jsonl
with ``orient='records', lines=True``, xlsx).

Scale note: csv/json/parquet go through ``df.write`` (distributed, one file
per partition; pass ``single_file=True`` to coalesce for the reference's
one-file ergonomics on small results).  xlsx is driver-side pandas by nature —
guarded by a row-count cap so a 100 TB result can't be collected by accident.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

XLSX_MAX_ROWS = 1_000_000  # hard Excel sheet limit is 1,048,576


def export_result(df: DataFrame, path: str | Path, *,
                  single_file: bool = True) -> str:
    """Write ``df`` to ``path``; format from the extension (csv / json /
    jsonl / xlsx / parquet), mirroring the reference's format dispatch
    (localsql/localsql.py:174-184)."""
    path = str(path)
    ext = Path(path).suffix.lstrip(".").lower()
    if ext == "csv":
        out = df.coalesce(1) if single_file else df
        out.write.mode("overwrite").option("header", True).csv(path)
    elif ext in ("json", "jsonl", "ndjson"):
        out = df.coalesce(1) if single_file else df
        out.write.mode("overwrite").json(path)
    elif ext == "xlsx":
        n = df.limit(XLSX_MAX_ROWS + 1).count()
        if n > XLSX_MAX_ROWS:
            raise ValueError(f"result exceeds xlsx row limit ({XLSX_MAX_ROWS})")
        df.toPandas().to_excel(path, index=False)
    elif ext == "parquet":
        df.write.mode("overwrite").parquet(path)
    else:
        raise ValueError(f"unsupported export format {ext!r}")
    return path
