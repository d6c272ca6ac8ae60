"""SQLite-dialect compatibility helpers (SURVEY.md §4c).

The reference's query dialect is SQLite (reference: README.md:40, error hint
at localsql/localsql.py:241).  Spark SQL covers almost all of it natively;
the genuine gaps are GLOB, group_concat, total, and typeof.  Each is a plain
column expression or a registered SQL function — no Catalyst rules needed,
and everything except ``typeof`` stays JVM-side (codegen-able).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def glob_to_regex(pattern: str) -> str:
    """SQLite GLOB pattern -> anchored regex (* ? [...] wildcards).

    GLOB is case-sensitive shell-style matching (SQLite core function,
    delegated by the reference via localsql/localsql.py:230).
    """
    out = ["^"]
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                out.append("\\[")
            else:
                body = pattern[i + 1:j]
                if body.startswith("^"):
                    body = "^" + body[1:].replace("\\", "\\\\")
                out.append(f"[{body}]")
                i = j
        elif ch in ".^$+{}()|\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    out.append("$")
    return "".join(out)


def glob(col: Column | str, pattern: str) -> Column:
    """``col GLOB pattern`` as a Column (rlike on the translated regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(glob_to_regex(pattern))


def total(col: Column | str) -> Column:
    """SQLite ``total(x)``: like sum but 0.0 instead of NULL on empty input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.sum(c).cast("double"), F.lit(0.0))


def group_concat(col: Column | str, sep: str = ",", sort: bool = True) -> Column:
    """SQLite ``group_concat(x)``.  ``sort=True`` pins the otherwise
    nondeterministic collect_list order — at scale an unordered concat is
    also non-reproducible across retries, so sorted is the sane default."""
    c = F.col(col) if isinstance(col, str) else col
    lst = F.collect_list(c)
    if sort:
        lst = F.sort_array(lst)
    return F.concat_ws(sep, lst)


def register_sqlite_compat(spark: SparkSession) -> None:
    """Register SQLite-dialect names usable from ``spark.sql``:
    ``glob(s, pat)``, ``typeof(x)`` (via SQL macros / a tiny UDF)."""
    from pyspark.sql.types import StringType

    # typeof: introspection nicety (SQLite core); a real UDF because the
    # answer depends on the *runtime* type only for untyped dialects — here
    # we report the Spark SQL type name of the value's column.
    @F.udf(returnType=StringType())
    def _typeof(x):
        if x is None:
            return "null"
        if isinstance(x, bool):
            return "integer"
        if isinstance(x, int):
            return "integer"
        if isinstance(x, float):
            return "real"
        if isinstance(x, (bytes, bytearray)):
            return "blob"
        return "text"

    spark.udf.register("typeof", _typeof)
    spark.udf.register(
        "glob_match",
        lambda s, p: s is not None and bool(__import__("re").match(glob_to_regex(p), s)),
        "boolean")
