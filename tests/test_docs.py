"""Docs drift guards."""

from __future__ import annotations

import io
import os
import re
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_operators_md_in_sync_with_registry():
    """OPERATORS.md is generated; adding an operator without
    regenerating it (scripts/gen_operators_md.py) fails here."""
    import scripts.gen_operators_md as gen

    buf = io.StringIO()
    with redirect_stdout(buf):
        gen.main()
    generated = buf.getvalue()
    committed = open(os.path.join(REPO, "OPERATORS.md")).read()
    assert generated == committed


def test_survey_registry_counts_match():
    from ask_duckdb_spark.operators import ORACLES, QUERIES

    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(r"\*\*(\d+) `queries\(\)` entries, (\d+) with DuckDB", survey)
    assert m, "SURVEY §8 registry line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), len(ORACLES))
