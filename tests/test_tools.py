"""Repo-tool invariants (tools/scale_check.py): the SCALE.md update must
survive filtered runs and hand-truncated files — a long measurement run
must never die at the write step (advisory, round 8)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_check import update_scale_md  # noqa: E402

_RESULTS = {"some_op": {1: 1.0, 4: 2.0, 16: 8.0}}


def test_update_replaces_existing_row_and_keeps_narrative(tmp_path):
    md = tmp_path / "SCALE.md"
    md.write_text("# SCALE\n\n| operator | 1x | 4x | 16x | g1 | g2 |\n"
                  "|---|---|---|---|---|---|\n"
                  "| some_op | 9.00s | 9.00s | 9.00s | 1.0x | 1.0x |\n"
                  "| other_op | 1.00s | 2.00s | 4.00s | 2.0x | 2.0x |\n"
                  "\nhand-written analysis stays.\n")
    assert update_scale_md(_RESULTS, md) is True
    text = md.read_text()
    assert "| some_op | 1.00s | 2.00s | 8.00s | 2.0x | 4.0x |" in text
    assert "| other_op | 1.00s | 2.00s | 4.00s" in text  # untouched
    assert "hand-written analysis stays." in text


def test_update_appends_missing_row_after_last_table_row(tmp_path):
    md = tmp_path / "SCALE.md"
    md.write_text("| operator | 1x | 4x | 16x | g1 | g2 |\n"
                  "|---|---|---|---|---|---|\n"
                  "| other_op | 1.00s | 2.00s | 4.00s | 2.0x | 2.0x |\n"
                  "\ntail text\n")
    assert update_scale_md(_RESULTS, md) is True
    lines = md.read_text().splitlines()
    i = lines.index("| other_op | 1.00s | 2.00s | 4.00s | 2.0x | 2.0x |")
    assert lines[i + 1].startswith("| some_op |")
    assert lines[-1] == "tail text"


def test_update_falls_through_on_truncated_or_missing_file(tmp_path):
    """A SCALE.md hand-truncated to no table rows, or absent entirely,
    must return False (full-rewrite path) instead of raising at the
    row-less max() — the measurements are hours of work by then."""
    md = tmp_path / "SCALE.md"
    assert update_scale_md(_RESULTS, md) is False  # absent
    md.write_text("# SCALE\n\nno table rows here\n")
    assert update_scale_md(_RESULTS, md) is False  # truncated
    assert "no table rows here" in md.read_text()  # untouched
