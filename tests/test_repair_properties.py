"""Property-based tests for the repair pipeline (SURVEY.md §5.2.2).

Hypothesis generates adversarial SQL-ish text; the pipeline must never
throw, must converge, and must never rewrite valid column references
or allowlisted keywords.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ask_duckdb_spark.nl.repair import (
    SQL_KEYWORDS,
    fix_common_mistakes,
    repair_sql,
)

COLS = {"queue", "status", "cloud", "country", "corecount", "copytools"}
SYN = {"name": "queue", "state": "status"}
META = {
    "columns": [
        {
            "name": "status",
            "canonicalization": {"case": "lower", "map_values": {"BAD": "good"}},
        }
    ]
}

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
sql_text = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "Z"), exclude_characters="\x00"
    ),
    max_size=120,
)


@given(sql_text)
@settings(max_examples=200, deadline=None)
def test_repair_never_throws_and_converges(raw):
    once = repair_sql(raw, COLS, meta=META, synonym_map=SYN)
    twice = repair_sql(once, COLS, meta=META, synonym_map=SYN)
    thrice = repair_sql(twice, COLS, meta=META, synonym_map=SYN)
    assert isinstance(once, str)
    assert twice == thrice  # fixpoint after at most two passes


@given(st.lists(st.sampled_from(sorted(COLS | SQL_KEYWORDS)), min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_valid_tokens_never_rewritten(tokens):
    """A statement made only of real columns + keywords is untouched
    (modulo nothing: no aliases present, no literals present)."""
    sql = " ".join(tokens)
    assert fix_common_mistakes(sql, COLS, SYN) == sql


@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\x00"),
               max_size=100))
@settings(max_examples=200, deadline=None)
def test_canonicalize_preserves_quoteless_text(raw):
    """R5/R6 only rewrite quoted literals: SQL containing no single
    quotes passes through canonicalize_literals byte-identical."""
    from ask_duckdb_spark.nl.repair import canonicalize_literals

    assert canonicalize_literals(raw, META) == raw


question = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=60
)
columns = st.lists(
    st.fixed_dictionaries(
        {
            "name": ident,
            "importance": st.integers(min_value=0, max_value=10),
            "aliases": st.lists(ident, max_size=3),
        }
    ),
    max_size=15,
)


@given(question, columns, st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_context_selection_properties(q, cols, top_k):
    """C1 invariants: ≤ top_k columns, all from the dictionary, any
    name/alias-mentioned column outranks every unmentioned one unless
    importance closes the 100-point boost."""
    from ask_duckdb_spark.nl.context import select_relevant_context

    ctx = select_relevant_context(q, {"columns": cols}, top_k=top_k)
    chosen = ctx["columns"]
    assert len(chosen) <= top_k
    assert all(c in cols for c in chosen)

    def score(col):
        names = [col["name"]] + col["aliases"]
        boost = 100 if any(n and n.lower() in q.lower() for n in names) else 0
        return col["importance"] + boost

    if chosen:
        floor = min(score(c) for c in chosen)
        left_out = [c for c in cols if all(c is not k for k in chosen)]
        assert all(score(c) <= floor for c in left_out)


@given(ident)
@settings(max_examples=200, deadline=None)
def test_fuzzy_repair_output_tokens_are_known(tok):
    """After repair, any identifier the fuzzy pass changed must have
    become a real column (it never invents identifiers)."""
    out = fix_common_mistakes(f"SELECT {tok} FROM t", COLS, {})
    produced = out.split()[1]
    if produced != tok:
        assert produced in COLS
