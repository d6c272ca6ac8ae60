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
    """SQLite GLOB pattern -> UNanchored regex body (* ? [...] wildcards).

    GLOB is case-sensitive shell-style matching (SQLite core function,
    delegated by the reference via localsql/localsql.py:230).  Anchoring is
    the caller's job because the two consumers need different spellings:
    ``^...$`` lets ``$`` match before a trailing newline (so 'abc\\n' would
    GLOB 'abc', which SQLite rejects) — Java rlike wants ``\\A...\\z``,
    Python uses ``re.fullmatch``.
    """
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            # SQLite class scan: a ']' immediately after '[' (or '[^') is a
            # LITERAL member, so the closing bracket search starts past it
            k = i + 1
            if k < len(pattern) and pattern[k] == "^":
                k += 1
            if k < len(pattern) and pattern[k] == "]":
                k += 1
            j = pattern.find("]", k)
            if j == -1:
                # SQLite: an unterminated class can never match any
                # character, so the whole pattern matches nothing
                # (sqlite3 patternCompare returns NOMATCH); '(?!)' is the
                # always-failing regex in both Python and Java
                return "(?!)"
            # backslashes and ']' inside ANY class body are literal in
            # GLOB — escape both (a leading literal ']' member or an
            # unescaped trailing backslash is a regex syntax error)
            body = pattern[i + 1:j]
            neg = body.startswith("^")
            if neg:
                body = body[1:]
            esc = body.replace("\\", "\\\\").replace("]", "\\]")
            out.append("[" + ("^" if neg else "") + esc + "]")
            i = j
        elif ch in ".^$+{}()|\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def glob(col: Column | str, pattern: str) -> Column:
    """``col GLOB pattern`` as a Column (rlike on the translated regex,
    absolute anchors — no trailing-newline leniency)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("\\A" + glob_to_regex(pattern) + "\\z")


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


import re as _re

# SQLite strftime %-codes -> Spark datetime-pattern fragments
# (https://sqlite.org/lang_datefunc.html / Spark datetime patterns — both
# public documentation).  %s/%w need expressions, handled separately.
_STRFTIME_MAP = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
    "%S": "ss", "%j": "DDD", "%e": "d", "%f": "ss.SSS", "%%": "'%'",
}

_MOD_DELTA = _re.compile(
    r"^([+-]?\d+(?:\.\d+)?)\s+(day|hour|minute|second|month|year)s?$")


def strftime_modifiers(col: Column | str, *modifiers: str) -> Column:
    """Apply SQLite date-modifier strings ('+3 days', 'start of month',
    'weekday 1', ...) to a timestamp column — the reference dialect's
    date-arithmetic grammar (SQLite core, delegated via
    localsql/localsql.py:230), compiled to Spark interval/trunc expressions
    at PLAN time: zero runtime Python, plain codegen'd column math.

    Known semantic divergence (capability parity, not bug-for-bug parity):
    month/year arithmetic that lands on a nonexistent date CLAMPS to the
    month end (Spark interval semantics: Feb 29 + 1 year -> Feb 28), where
    SQLite NORMALIZES the overflow (-> Mar 1).  Pinned in
    tests/test_properties.py::test_strftime_compiler_units.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("timestamp")
    for mod in modifiers:
        m = mod.strip().lower()
        delta = _MOD_DELTA.match(m)
        if delta:
            n, unit = delta.group(1), delta.group(2)
            if "." in n:
                # Spark intervals only allow fractions on SECOND; SQLite
                # accepts '+1.5 days' (= 36 hours) — compile fractional
                # day/hour/minute amounts down to seconds
                secs = {"day": 86400, "hour": 3600, "minute": 60,
                        "second": 1}.get(unit)
                if secs is None:
                    raise ValueError(
                        f"fractional {unit} modifier not supported: {mod!r}")
                c = c + F.expr(f"INTERVAL {float(n) * secs} SECOND")
            else:
                c = c + F.expr(f"INTERVAL {n} {unit.upper()}")
        elif m in ("start of day", "start of month", "start of year"):
            c = F.date_trunc(m.rsplit(" ", 1)[-1], c)
        elif m.startswith("weekday "):
            # advance to the NEXT date with the given weekday (0=Sunday),
            # leaving the time intact; no-op if already that weekday
            n = int(m.split()[1])
            dow = F.dayofweek(c) - 1  # Spark: 1=Sunday -> SQLite: 0=Sunday
            c = c + F.make_interval(days=F.pmod(F.lit(n) - dow, F.lit(7)))
        else:
            # 'localtime'/'utc'/'unixepoch'/'julianday' need session-TZ or
            # epoch reinterpretation — out of scope, refuse loudly
            raise ValueError(f"unsupported strftime modifier {mod!r}")
    return c


def strftime(fmt: str, col: Column | str, *modifiers: str) -> Column:
    """SQLite ``strftime(fmt, value, modifier...)`` as a Column.

    The format string compiles to a Spark ``date_format`` pattern (literal
    text quoted so pattern letters can't leak); ``%s`` (epoch seconds) and
    ``%w`` (weekday 0-6) become expressions since no pattern letter matches
    their SQLite semantics.
    """
    c = strftime_modifiers(col, *modifiers)
    if fmt == "%s":
        return F.unix_timestamp(c).cast("string")
    parts: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i:i + 2]
            if code == "%s":
                raise ValueError("%s cannot be mixed with other codes")
            if code == "%w":
                raise ValueError("%w needs expression form; use "
                                 "dayofweek()-1 directly")
            if code not in _STRFTIME_MAP:
                raise ValueError(f"unsupported strftime code {code!r}")
            parts.append(_STRFTIME_MAP[code])
            i += 2
        elif fmt[i] == "%":
            # bare trailing '%': a literal percent (otherwise the literal
            # scan below would stop at it immediately and never advance)
            parts.append("'%'")
            i += 1
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            lit = fmt[i:j].replace("'", "''")
            parts.append(f"'{lit}'" if _re.search("[A-Za-z]", lit) else lit)
            i = j
    return F.date_format(c, "".join(parts))


import functools as _functools


@_functools.lru_cache(maxsize=256)
def _glob_compiled(p: str):
    return _re.compile(glob_to_regex(p))


def _glob_match_pandas(s, p):
    """Vectorized GLOB for the registered UDF (Arrow-batched pandas_udf —
    no row-at-a-time Python path left in the compat surface): the regex is
    translated/compiled ONCE per distinct pattern per batch (patterns are
    nearly always a single literal), then applied over the whole slice.
    NULL in either operand -> NULL out (SQLite semantics).  A pure-SQL
    translation was considered and rejected: GLOB character classes
    ([^abc], backslash-literal bodies) cannot round-trip through a
    regexp_replace chain without corrupting negation.  Literal-pattern
    DataFrame callers should use :func:`glob` (pure JVM rlike).
    Module-level so the UDF pickles."""
    import pandas as pd

    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    for pat in p.dropna().unique():
        rex = _glob_compiled(pat)
        mask = (p == pat) & s.notna()
        out[mask] = [rex.fullmatch(v) is not None for v in s[mask]]
    return out


def register_sqlite_compat(spark: SparkSession) -> None:
    """Register SQLite-dialect names usable from ``spark.sql``:
    ``glob(s, pat)``, ``typeof(x)`` (Arrow-batched UDFs)."""
    from pyspark.sql.types import StringType

    # typeof: introspection nicety (SQLite core); a real UDF because the
    # answer depends on the *runtime* type only for untyped dialects — here
    # we report the Spark SQL type name of the value's column.  Arrow-
    # batched (useArrow): the values arrive as a columnar batch instead of
    # pickled rows.
    @F.udf(returnType=StringType(), useArrow=True)
    def _typeof(x):
        if x is None:
            return "null"
        if isinstance(x, bool):
            return "integer"
        if isinstance(x, int):
            return "integer"
        if isinstance(x, float):
            return "real"
        import decimal
        if isinstance(x, decimal.Decimal):
            return "real"  # SQLite has no decimal storage class: 1.5 -> REAL
        if isinstance(x, (bytes, bytearray)):
            return "blob"
        return "text"

    spark.udf.register("typeof", _typeof)
    spark.udf.register("glob_match",
                       F.pandas_udf(_glob_match_pandas, "boolean"))
