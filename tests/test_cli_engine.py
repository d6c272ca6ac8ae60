"""Engine facade + CLI behavior: special commands, export, transpose, python
mode, one-shot query mode (reference UX surface, SURVEY.md §2A A10-A18).
"""

from __future__ import annotations

import json

import pytest

from localsql_spark.engine import LocalSparkSQL


@pytest.fixture()
def eng(spark, tmp_path):
    (tmp_path / "t.csv").write_text("id,v\n1,a\n2,b\n3,c\n")
    e = LocalSparkSQL(spark)
    e.load_directory(tmp_path, verbose=False)
    return e


def test_bare_table_name_prints_schema(eng, capsys):
    assert eng.run_sql("t_csv") is None
    out = capsys.readouterr().out
    assert "id" in out
    # df.info()-parity: entries + per-column non-null counts
    # (reference: localsql/localsql.py:226-228)
    assert "3 entries" in out
    assert "id: 3 non-null" in out


def test_pp_and_save_feedback(eng, tmp_path, capsys):
    """\\pp and \\s announce what they did (reference:
    localsql/localsql.py:171-206)."""
    eng.run_sql("\\pp")
    assert "Pretty print OFF" in capsys.readouterr().out
    eng.run_sql("\\pp")
    assert "Pretty print ON" in capsys.readouterr().out
    eng.run_sql("SELECT * FROM t_csv")
    out = tmp_path / "fb.csv"
    eng.run_sql(f"\\s {out}")
    assert f"Result saved to {out}" in capsys.readouterr().err


def test_special_t_lists_tables(eng, capsys):
    eng.run_sql("\\t")
    assert "t_csv" in capsys.readouterr().out


def test_special_td_stats(eng):
    descr = eng.run_sql("\\td")
    row = {r["Table"]: r for r in descr.collect()}["t_csv"]
    assert row["Rows"] == 3 and row["Columns"] == 2


def test_latest_result_and_export_csv(eng, tmp_path):
    eng.run_sql("SELECT * FROM t_csv WHERE id <= 2")
    out = tmp_path / "out.csv"
    eng.run_sql(f"\\s {out}")
    assert out.is_file(), "export must produce a plain single file"
    body = out.read_text()
    assert "1,a" in body and "2,b" in body and "3,c" not in body


def test_export_jsonl(eng, tmp_path):
    eng.run_sql("SELECT id, v FROM t_csv ORDER BY id")
    out = tmp_path / "out.jsonl"
    eng.run_sql(f"\\s {out}")
    assert out.is_file(), "export must produce a plain single file"
    lines = [json.loads(x) for x in out.read_text().splitlines() if x]
    assert {(r["id"], r["v"]) for r in lines} == {(1, "a"), (2, "b"), (3, "c")}


def test_export_without_result_raises(spark):
    e = LocalSparkSQL(spark)
    with pytest.raises(RuntimeError, match="no result"):
        e.run_sql("\\s /tmp/x.csv")


def test_pp_toggle(eng):
    assert eng.pretty
    eng.run_sql("\\pp")
    assert not eng.pretty


def test_py_mode_roundtrip(eng):
    eng.run_sql("\\lpy")
    assert eng.py_mode
    assert eng.run_py("1 + 1") == 2
    assert eng.run_py("tables['t_csv'].count()") == 3
    eng.run_py("x = 5")  # statement path (exec fallback)
    eng.run_sql("\\lsql")
    assert not eng.py_mode


def test_error_shaping(eng):
    with pytest.raises(RuntimeError) as ei:
        eng.run_sql("SELECT nope FROM t_csv")
    assert "JVM stack" not in str(ei.value)


def test_unknown_special_prints_help(eng, capsys):
    """Typos get the cheat sheet, not an exception (reference:
    localsql/localsql.py:161-167)."""
    assert eng.run_sql("\\zz") is None
    out = capsys.readouterr().out
    assert "Unrecognized special command" in out
    assert "\\td" in out and "\\lpy" in out


def test_transpose_print(eng, capsys):
    df = eng.run_sql("SELECT * FROM t_csv ORDER BY id")
    eng.print_result(df, transpose=True)
    out = capsys.readouterr().out
    assert "RECORD" in out  # vertical mode marker


# -- CLI ---------------------------------------------------------------------

def test_cli_one_shot(spark, tmp_path, capsys, monkeypatch):
    """python -m localsql_spark.cli -d DIR -q SQL -s -> pure result stdout."""
    (tmp_path / "n.csv").write_text("id,v\n1,x\n2,y\n")
    from localsql_spark import cli

    rc = cli.main(["-d", str(tmp_path), "-q",
                   "SELECT count(*) AS n FROM n_csv", "-s"])
    out = capsys.readouterr().out
    assert rc == 0 and "2" in out
    assert str(tmp_path) not in out  # -s silences load chatter


def test_cli_run_line_transpose_and_errors(spark, tmp_path, capsys):
    from localsql_spark import cli
    from localsql_spark.engine import LocalSparkSQL

    eng = LocalSparkSQL(spark)
    (tmp_path / "z.csv").write_text("a,b\n1,2\n")
    eng.load_directory(tmp_path, verbose=False)
    cli.run_line(eng, "SELECT * FROM z_csv /t")
    assert "RECORD" in capsys.readouterr().out
    cli.run_line(eng, "SELECT broken FROM z_csv")  # printed, not raised
    assert "broken" in capsys.readouterr().err


def test_cli_completion_words(spark, tmp_path):
    from localsql_spark import cli
    from localsql_spark.engine import LocalSparkSQL

    eng = LocalSparkSQL(spark)
    (tmp_path / "c with space.csv").write_text("plain,weird col\n1,2\n")
    eng.load_directory(tmp_path, verbose=False)
    words = cli.completion_words(eng)
    assert "plain" in words and "`weird col`" in words


def test_export_xlsx_roundtrip(eng, tmp_path, spark):
    """xlsx export (stdlib SpreadsheetML writer when openpyxl is absent)
    must round-trip through our own xlsx reader."""
    eng.run_sql("SELECT id, v FROM t_csv ORDER BY id")
    out = tmp_path / "result.xlsx"
    eng.run_sql(f"\\s {out}")
    assert out.exists()
    from localsql_spark.sources.readers import read_excel
    back = read_excel(spark, out)
    assert [tuple(r) for r in back.orderBy("id").collect()] == [
        (1, "a"), (2, "b"), (3, "c")]


def test_sqlite_compat_registered(eng):
    """glob_match / typeof are reachable from user SQL via the facade."""
    rows = eng.run_sql(
        "SELECT typeof(id) AS t, glob_match(v, 'a*') AS g "
        "FROM t_csv ORDER BY id").collect()
    assert rows[0]["t"] == "integer" and rows[0]["g"] is True
    assert rows[1]["g"] is False


def test_py_mode_state_persists_across_lines(eng):
    eng.run_py("x = 41")
    assert eng.run_py("x + 1") == 42


def test_td_prints_once_via_run_line(eng, capsys):
    from localsql_spark import cli

    cli.run_line(eng, "\\td")
    out = capsys.readouterr().out
    assert out.count("t_csv") == 1  # shown exactly once


def test_cli_version_flag(capsys):
    from localsql_spark import cli

    with pytest.raises(SystemExit) as ei:
        cli.build_parser().parse_args(["--version"])
    assert ei.value.code == 0
    assert "localsql-spark/" in capsys.readouterr().out


def test_cli_verbose_flag_parses():
    from localsql_spark import cli

    args = cli.build_parser().parse_args(["-v"])
    assert args.verbose is True
    assert cli.build_parser().parse_args([]).verbose is False


def test_cli_no_tables_hint(spark, tmp_path, capsys, monkeypatch):
    """Empty catalog prints the reference's 'try -r, -d or --help' hint."""
    from localsql_spark import cli

    monkeypatch.chdir(tmp_path)  # nothing loadable here
    rc = cli.main(["-q", "SELECT 1 AS one"])
    captured = capsys.readouterr()
    assert rc == 0
    assert "Supported files not found" in captured.err


def test_table_info_handles_dotted_columns(spark, tmp_path, capsys):
    """Bare-table info must survive flattened-JSON column names containing
    literal dots (code-review r2)."""
    (tmp_path / "nested.json").write_text(
        '{"id": 1, "nest": {"a": 5}}\n{"id": 2, "nest": {"a": null}}\n')
    e = LocalSparkSQL(spark)
    e.load_directory(tmp_path, json_normalize=True, verbose=False)
    assert e.run_sql("nested_json") is None
    out = capsys.readouterr().out
    assert "2 entries" in out
    assert "nest.a: 1 non-null" in out


def test_glob_newline_and_backslash_class_semantics(eng, spark):
    """GLOB must not match a trailing newline (absolute anchors), must treat
    backslashes in character classes literally, and glob_match must return
    NULL (not crash) on NULL operands (code-review r2)."""
    from localsql_spark.functions.sqlite_compat import glob_to_regex

    import re as _re
    assert _re.compile(glob_to_regex("[a\\]"))      # no unterminated class
    assert not _re.compile(glob_to_regex("[\\d]")).fullmatch("7")
    df = spark.createDataFrame(
        [("abc", "abc"), ("abc\n", "abc"), (None, "abc"), ("abc", None)],
        "s string, p string")
    df.createOrReplaceTempView("glob_t")
    rows = eng.run_sql(
        "SELECT glob_match(s, p) AS g FROM glob_t").collect()
    assert [r["g"] for r in rows] == [True, False, None, None]


def test_cli_one_shot_error_is_shaped(spark, tmp_path, capsys):
    """-q with a broken query prints the shaped message and exits 1 — no
    raw traceback (code-review r2)."""
    (tmp_path / "ok.csv").write_text("a\n1\n")
    from localsql_spark import cli

    rc = cli.main(["-d", str(tmp_path), "-q", "SELECT nope FROM ok_csv", "-s"])
    captured = capsys.readouterr()
    assert rc == 1
    assert "Traceback" not in captured.err
    assert "nope" in captured.err


def test_positional_file_collision_uniquified(spark, tmp_path):
    """Two positional files normalizing to the same table name must both
    load (code-review r2)."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    (tmp_path / "a" / "data.csv").write_text("x\n1\n")
    (tmp_path / "b" / "data.csv").write_text("y\n2\n")
    e = LocalSparkSQL(spark)
    n1 = e.load_file(tmp_path / "a" / "data.csv")
    n2 = e.load_file(tmp_path / "b" / "data.csv")
    assert n1 == "data_csv" and n2 == "data_csv_2"
    assert e.tables[n1].columns == ["x"] and e.tables[n2].columns == ["y"]


def test_save_without_filename_prints_usage(eng, capsys):
    eng.run_sql("SELECT * FROM t_csv")
    assert eng.run_sql("\\s") is None
    assert "Usage: \\s" in capsys.readouterr().err


def test_engine_close_releases_operator_caches(spark):
    """Repeated pipeline runs through the engine API (no REPL line, so no
    run_line finally) must not accumulate operator-persisted tables:
    close() — or context-manager exit — releases them."""
    from localsql_spark.engine import LocalSparkSQL
    from localsql_spark.operators import _PERSISTED, cleanup
    from localsql_spark.operators.dedup import minhash_lsh_pairs

    cleanup()  # clean slate
    df = spark.createDataFrame(
        [(i, "engine close lifecycle text " + str(i % 3))
         for i in range(12)], "doc_id long, text string")
    eng = LocalSparkSQL(spark)
    for _ in range(3):
        minhash_lsh_pairs(df).count()  # a pipeline run that persists
        eng.close()
        assert not _PERSISTED, "close() must leave the cache registry empty"


def test_engine_context_manager_closes(spark):
    from localsql_spark.engine import LocalSparkSQL
    from localsql_spark.operators import _PERSISTED, cleanup
    from localsql_spark.operators.dedup import minhash_lsh_pairs

    cleanup()
    df = spark.createDataFrame(
        [(i, "context manager text " + str(i % 2)) for i in range(10)],
        "doc_id long, text string")
    with LocalSparkSQL(spark):
        minhash_lsh_pairs(df).count()
        assert len(_PERSISTED) > 0
    assert not _PERSISTED


# ---------------------------------------------------------------------------
# pipeline special commands (r13 verdict task 6: flagship operators
# reachable from the REPL's \lsql mode as temp-view-producing commands)
# ---------------------------------------------------------------------------

@pytest.fixture()
def peng(spark, tmp_path):
    """Engine over a tiny docs+vectors catalog for the pipeline commands."""
    e = LocalSparkSQL(spark)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "an entirely different document about spark pipelines"),
         (4, "an entirely different document about spark pipelines!")],
        "doc_id long, text string")
    docs.createOrReplaceTempView("docs")
    e.tables["docs"] = docs
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5) for j in range(4)])
         for i in range(6)], "vec_id long, embedding array<double>")
    emb.createOrReplaceTempView("vecs")
    e.tables["vecs"] = emb
    return e


def test_dedup_exact_command_registers_view(peng, capsys):
    df = peng.run_sql("\\dedup exact docs AS d_exact")
    assert df is not None
    assert "Registered view: d_exact" in capsys.readouterr().err
    # the view is SQL-visible and the exact pair (1,2) collapsed
    rows = peng.run_sql(
        "SELECT keep_id, copies FROM d_exact ORDER BY keep_id").collect()
    assert (1, 2) in [(r.keep_id, r.copies) for r in rows]
    assert "d_exact" in peng.tables  # \t lists it; \s can export it


def test_dedup_minhash_and_simhash_commands(peng):
    pairs = peng.run_sql("\\dedup minhash docs threshold=0.9").collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} >= {(1, 2)}
    sh = peng.run_sql("\\dedup simhash docs AS sh").collect()
    # identical texts hash identically -> hamming 0 (the '!'-differing
    # 3/4 pair may legitimately exceed the 3-bit byte-band radius)
    assert {(r.doc_a, r.doc_b, r.hamming) for r in sh} >= {(1, 2, 0)}
    with pytest.raises(RuntimeError, match="usage"):
        peng.run_sql("\\dedup bogus docs")


def test_knn_command_top1(peng):
    peng.run_sql("\\knn vecs k=1 AS nn")
    rows = peng.run_sql("SELECT * FROM nn ORDER BY query_id").collect()
    assert len(rows) == 6  # one neighbor per query vector
    assert all(r.neighbor_id != r.query_id for r in rows)
    # brute-force parity with the operator itself
    from localsql_spark.operators.similarity import knn_brute_force
    direct = knn_brute_force(peng.tables["vecs"], peng.tables["vecs"], k=1)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, direct.collect()))


def test_quality_command_scores(peng):
    out = peng.run_sql("\\quality docs AS q")
    cols = set(out.columns)
    assert {"doc_id", "quality_score", "lang", "tokens_ws"} <= cols
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].tokens_ws == 9
    # and it composes with plain SQL afterwards
    n = peng.run_sql(
        "SELECT count(*) AS n FROM q WHERE tokens_ws > 5").collect()[0].n
    assert n == 4
