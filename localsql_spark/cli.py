"""CLI / REPL front end — capability parity with the reference's ``lsql``
entry point (reference: localsql/localsql.py:268-364).

- one-shot: ``python -m localsql_spark.cli -d DIR -q "SELECT ..." -s``
  (reference: localsql/localsql.py:273,318-321; demo README.md:74-78)
- interactive: prompt loop with word completion from table + quoted column
  names, persistent history, ``/t`` transpose suffix, special ``\\``-commands
  and the ``\\lpy`` python mode (reference: localsql/localsql.py:323-364).
  prompt_toolkit is used when importable, stdlib ``input()`` otherwise.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from pathlib import Path

from localsql_spark.engine import LocalSparkSQL

# columns with special characters get quoted for completion
# (reference: localsql/localsql.py:40, 327-331)
_RE_PLAIN_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

HISTORY_FILE = Path(os.environ.get(
    "LOCALSQL_SPARK_HISTORY",
    str(Path.home() / ".local" / "share" / "localsql_spark" / "history")))


def completion_words(eng: LocalSparkSQL) -> list[str]:
    """Table names + (quoted where needed) column names for the completer
    (reference: localsql/localsql.py:323-333)."""
    words = set(eng.tables)
    for df in eng.tables.values():
        for c in df.columns:
            words.add(c if _RE_PLAIN_IDENT.match(c) else f"`{c}`")
    return sorted(words)


def build_parser() -> argparse.ArgumentParser:
    from localsql_spark import __version__

    p = argparse.ArgumentParser(
        prog="localsql-spark",
        description="SQL over local data files, executed by Spark")
    p.add_argument("files", nargs="*", help="data files to load as tables")
    p.add_argument("-d", "--directory", help="load every readable file in DIR")
    p.add_argument("-r", "--recursive", action="store_true",
                   help="recurse into subdirectories (of -d DIR, or of .)")
    p.add_argument("-q", "--query", help="run one query and exit")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="verbose mode (Spark warnings + Python warnings shown)")
    p.add_argument("-s", "--silent", action="store_true",
                   help="suppress load chatter (pure result on stdout)")
    p.add_argument("-jn", "--json-normalize", action="store_true",
                   help="flatten nested JSON into dotted columns")
    p.add_argument("--version", "-V", action="version",
                   version=f"localsql-spark/{__version__}")
    p.add_argument("--master", default=None,
                   help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    try:  # optional shell completion (reference: localsql/localsql.py:6,278)
        import argcomplete
        argcomplete.autocomplete(p)
    except ImportError:
        pass
    return p


def run_line(eng: LocalSparkSQL, line: str, *, silent: bool = False) -> None:
    """Execute one REPL line: mode dispatch, /t transpose detection, result
    printing; errors are printed, never fatal (reference:
    localsql/localsql.py:340-364)."""
    line = line.strip()
    if not line:
        return
    try:
        if eng.py_mode and not line.startswith("\\"):
            value = eng.run_py(line)
            if value is not None:
                print(value)
            return
        transpose = False
        if line.endswith("/t"):  # reference: localsql/localsql.py:350-352
            transpose, line = True, line[:-2].rstrip()
        result = eng.run_sql(line)
        if result is not None:
            eng.print_result(result, transpose=transpose)
    except Exception as e:  # noqa: BLE001 — REPL isolates errors by design
        print(e, file=sys.stderr)
    finally:
        # release operator-persisted intermediates (LSH signatures, CC
        # labels) once the line's result is printed — a long-lived REPL
        # session must not accumulate cached tables across queries
        from localsql_spark.operators import cleanup
        cleanup()


def repl(eng: LocalSparkSQL) -> None:
    """Interactive loop; prompt_toolkit when available, plain input otherwise."""
    prompt_fn = None
    try:
        from prompt_toolkit import PromptSession
        from prompt_toolkit.completion import WordCompleter
        from prompt_toolkit.history import FileHistory

        history = None
        try:
            HISTORY_FILE.parent.mkdir(parents=True, exist_ok=True)
            history = FileHistory(str(HISTORY_FILE))
        except OSError:  # unwritable home — run without history
            pass
        lexer = None
        try:  # SQL syntax highlighting when pygments is importable
            from prompt_toolkit.lexers import PygmentsLexer
            from pygments.lexers.sql import SqlLexer
            lexer = PygmentsLexer(SqlLexer)
        except ImportError:
            pass
        session = PromptSession(history=history, lexer=lexer)
        completer = WordCompleter(completion_words(eng), ignore_case=True)
        prompt_fn = lambda: session.prompt("> ", completer=completer)  # noqa: E731
    except ImportError:
        prompt_fn = lambda: input("> ")  # noqa: E731

    while True:
        try:
            line = prompt_fn()
        except KeyboardInterrupt:  # reference: localsql/localsql.py:345-346
            continue
        except EOFError:
            return
        try:
            run_line(eng, line)
        except KeyboardInterrupt:
            # Ctrl-C DURING execution cancels the query, not the session
            # (run_line's own handler catches Exception, not
            # BaseException, so the interrupt reaches here)
            print("interrupted", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from localsql_spark.session import get_spark

    eng = LocalSparkSQL(get_spark(app_name="localsql_spark_cli",
                                  master=args.master))
    eng.spark.sparkContext.setLogLevel("WARN" if args.verbose else "ERROR")
    if not args.verbose:
        import warnings
        warnings.simplefilter("ignore")

    verbose = not args.silent
    directory = args.directory
    if directory is None and args.recursive and not args.files:
        directory = "."  # bare -r searches the cwd (reference: localsql.py:293-296)
    if directory:
        eng.load_directory(directory, recursive=args.recursive,
                           json_normalize=args.json_normalize,
                           verbose=verbose)
    for f in args.files:
        try:
            name = eng.load_file(f, json_normalize=args.json_normalize)
            if verbose:
                print(f"{f} -> table {name!r}")
        except Exception as e:  # noqa: BLE001 — per-file isolation
            # errors always reach stderr — hiding them under --silent turns
            # the later query failure into an inexplicable missing-table
            # error, and stderr never pollutes the pure-stdout contract
            print(f"{f}: {e}", file=sys.stderr)
    if not eng.tables and verbose:
        print("Supported files not found. Try -r, -d or --help",
              file=sys.stderr)

    try:
        if args.query is not None:  # one-shot mode
            # print_result sits INSIDE the handler: Spark is lazy, so most
            # failures (bad casts, malformed rows) surface at show()/
            # collect() time — outside the handler they escaped as raw
            # Py4J tracebacks instead of the shaped one-liner + exit 1
            try:
                result = eng.run_sql(args.query)
                if result is not None:
                    eng.print_result(result)
            except Exception as e:  # noqa: BLE001 — shaped message, no traceback
                print(e, file=sys.stderr)
                return 1
            return 0

        repl(eng)
        return 0
    finally:
        eng.close()  # run_line cleans per REPL line; this covers -q/-s exits


if __name__ == "__main__":
    raise SystemExit(main())
