"""Golden tests for the context/prompt layer (C1–C3) — deterministic,
no Spark, no network (SURVEY.md §5.2.3)."""

from __future__ import annotations

from ask_duckdb_spark.nl.context import (
    build_prompts,
    render_context,
    select_relevant_context,
)
from ask_duckdb_spark.sources.queuedata_fixture import queuedata_dictionary

META = queuedata_dictionary()


def test_c1_importance_prior_orders_columns():
    ctx = select_relevant_context("anything at all", META, top_k=3)
    names = [c["name"] for c in ctx["columns"]]
    # status(10) > queue(9) > cloud(7) — pure importance, no match boost
    assert names == ["status", "queue", "cloud"]


def test_c1_substring_match_boosts():
    ctx = select_relevant_context("which queues have many cores?", META, top_k=2)
    names = [c["name"] for c in ctx["columns"]]
    # 'cores' is a corecount alias (+100 > any importance)
    assert "corecount" in names


def test_c1_alias_match_is_case_insensitive():
    ctx = select_relevant_context("Show me the STATE of things", META, top_k=1)
    assert ctx["columns"][0]["name"] == "status"


def test_c1_top_k_bounds():
    assert len(select_relevant_context("q", META, top_k=4)["columns"]) == 4


def test_c2_line_shape_and_allowed_preview():
    ctx = {
        "columns": [
            {
                "name": "status",
                "type": "VARCHAR",
                "description": "Queue state.",
                "aliases": ["state"],
                "allowed_values": ["online", "offline", "test", "brokeroff", "x", "y"],
            }
        ],
        "rules": ["always lowercase status"],
    }
    out = render_context(ctx)
    assert out.splitlines()[0] == "# Column reference (authoritative)"
    # ≤5 allowed values previewed; aliases joined
    assert (
        "- status (VARCHAR): Queue state. Allowed: online, offline, test,"
        " brokeroff, x. Aliases: state." in out
    )
    assert "# Rules" in out and "- always lowercase status" in out


def test_c2_polymorphic_allowed_values():
    enum = render_context(
        {"columns": [{"name": "c", "type": "T", "description": "",
                      "allowed_values": {"enumeration": ["A", "B"]}}]}
    )
    assert "Allowed: A, B." in enum
    rng = render_context(
        {"columns": [{"name": "c", "type": "T", "description": "",
                      "allowed_values": {"range": [1, 256]}}]}
    )
    assert "Allowed: range 1–256." in rng
    empty = render_context(
        {"columns": [{"name": "c", "type": "T", "description": "d",
                      "allowed_values": []}]}
    )
    assert "Allowed" not in empty
    assert "Aliases: —." in empty


def test_c2_access_tip_spark_or_duckdb():
    spark_hint = render_context(
        {"columns": [{"name": "c", "type": "JSON", "description": "",
                      "spark_access": {"example": "get_json_object(c, '$.k')"}}]}
    )
    assert "  Access tip: get_json_object(c, '$.k')" in spark_hint
    duck_hint = render_context(
        {"columns": [{"name": "c", "type": "JSON", "description": "",
                      "duckdb_access": {"example": "json_extract(c, '$.k')"}}]}
    )
    assert "  Access tip: json_extract(c, '$.k')" in duck_hint


def test_c3_prompt_assembly_golden():
    system, user = build_prompts(
        "list all queues that are online", "queuedata", "queue STRING", "CTX"
    )
    assert user == "Write an SQL query that returns - list all queues that are online"
    assert "CREATE TABLE queuedata (queue STRING);" in system
    assert "CTX" in system
    assert "SELECT name FROM queuedata WHERE LOWER(status) = 'online';" in system
    assert "Return SQL only" in system
