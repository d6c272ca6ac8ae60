"""A Spark 4 Python DataSource for xlsx: ``spark.read.format("xlsx")``.

The reference reads Excel driver-side through pandas
(reference: localsql/localsql.py:104-105). This makes xlsx a first-class
DISTRIBUTED source instead: one input partition per file (a directory/glob of
workbooks scans in parallel), each parsed on an executor by the stdlib
SpreadsheetML parser (sources/readers.py), schema inferred once on the driver
from the first file. Single-workbook reads behave like the reference;
thousand-workbook directories scale like any other Spark source.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import (BooleanType, DoubleType, LongType, StringType,
                               StructField, StructType)


def _expand(path: str) -> list[str]:
    p = Path(path)
    if p.is_dir():
        return sorted(str(f) for f in p.glob("*.xlsx"))
    if p.exists():
        # an existing file wins over glob interpretation: a file literally
        # named data[1].xlsx would otherwise be read as a character class
        # and reported missing
        return [path]
    if any(ch in path for ch in "*?["):
        # stdlib glob handles wildcards in ANY segment ('/data/*/book.xlsx'),
        # not just the filename component
        import glob as _glob
        return sorted(_glob.glob(path))
    return [path]


def _infer_schema(file: str) -> StructType:
    from localsql_spark.sources.readers import _read_xlsx_stdlib

    pdf = _read_xlsx_stdlib(file)
    fields = []
    for col, dtype in zip(pdf.columns, pdf.dtypes):
        k = str(dtype)
        if k.startswith("int"):
            t = LongType()
        elif k.startswith("float"):
            t = DoubleType()
        elif k.startswith("bool"):
            t = BooleanType()
        else:
            t = StringType()
        fields.append(StructField(str(col), t, nullable=True))
    return StructType(fields)


class XlsxDataSource(DataSource):
    """``spark.read.format("xlsx").load(path)`` — path may be a file, a
    directory of workbooks, or a glob."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> StructType:
        files = _expand(self.options["path"])
        if not files:
            raise FileNotFoundError(
                f"{self.options['path']}: no .xlsx files to infer a schema "
                f"from — for a stream over a not-yet-populated landing "
                f"directory, pass an explicit .schema(...)")
        return _infer_schema(files[0])

    def reader(self, schema: StructType) -> "XlsxReader":
        return XlsxReader(self.options["path"], schema)

    def streamReader(self, schema: StructType) -> "XlsxStreamReader":
        return XlsxStreamReader(self.options["path"], schema)


class XlsxReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.files = _expand(path)
        self.schema = schema

    def partitions(self):
        # one partition per workbook: a directory of N files scans N-wide
        return [InputPartition(f) for f in self.files]

    def read(self, partition):
        from localsql_spark.sources.readers import _read_xlsx_stdlib

        pdf = _read_xlsx_stdlib(partition.value)
        names = [f.name for f in self.schema.fields]
        pdf = pdf[[c for c in pdf.columns if str(c) in names]]
        for field in self.schema.fields:
            if field.name not in map(str, pdf.columns):
                pdf[field.name] = None
        pdf = pdf[names]
        kinds = ["str" if isinstance(f.dataType, StringType)
                 else "int" if isinstance(f.dataType, LongType)
                 else "float" if isinstance(f.dataType, DoubleType)
                 else "" for f in self.schema.fields]

        def conv(v, kind):
            if v is None or (isinstance(v, float) and v != v):  # None / NaN
                return None
            v = v.item() if hasattr(v, "item") else v  # numpy -> python
            # the schema was inferred from the FIRST workbook; later files
            # can carry skewed types (float where int was inferred, raw
            # int/bool in a string column) that would crash the worker's
            # Arrow conversion — coerce per target type, None when lossless
            # coercion is impossible (1.5 into a Long)
            if kind == "str" and not isinstance(v, str):
                return str(v)
            if kind == "int" and isinstance(v, float):
                return int(v) if v.is_integer() else None
            if kind == "float" and isinstance(v, (int, bool)):
                return float(v)
            return v

        for tup in pdf.itertuples(index=False, name=None):
            yield tuple(conv(v, k) for v, k in zip(tup, kinds))


class XlsxStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("xlsx")`` over a landing DIRECTORY of
    workbooks: each micro-batch picks up workbooks that appeared since the
    last offset, one input partition per new file (parsed executor-side,
    same as the batch reader).  The offset is the sorted list of files seen
    — the same discovery contract as Spark's own file stream source, so
    checkpoint recovery replays deterministically via partitions(start,end).
    """

    def __init__(self, path: str, schema: StructType):
        self.path, self.schema_ = path, schema

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": _expand(self.path)}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", []))  # hoisted: O(n+m), not O(n*m)
        return [InputPartition(f) for f in end.get("files", [])
                if f not in seen]

    def read(self, partition):
        yield from XlsxReader(partition.value, self.schema_).read(partition)

    def commit(self, end: dict) -> None:
        pass  # discovery is stateless; the checkpoint holds the offset


def register(spark) -> None:
    spark.dataSource.register(XlsxDataSource)
