"""Relevance-ranked prompt context + prompt assembly (C1–C3).

Reference parity: scoring query_llm.py:85-96, rendering :99-158, prompt
templates :20-35. The one deliberate divergence: the system prompt
names the Spark SQL dialect and access tips come from ``spark_access``
(falling back to reference-style ``duckdb_access``) — the prompt layer
is engine-parametric, everything else is byte-for-byte the same shape.
"""

from __future__ import annotations

from typing import Any

from .dictionary import access_hints

__all__ = [
    "select_relevant_context",
    "render_context",
    "build_prompts",
    "USER_TEMPLATE",
    "SYSTEM_TEMPLATE",
]

USER_TEMPLATE = "Write an SQL query that returns - {}"

SYSTEM_TEMPLATE = """
You are generating SQL for Apache Spark SQL. Use ONLY the columns in the
provided DDL and follow the authoritative column reference and rules below.
Return SQL only (no markdown, no fences, no explanation).

CREATE TABLE {tbl} ({schema});

{context}

Output a single valid SQL statement, and nothing else.

Example:
-- User: list all queues that are online
SELECT name FROM {tbl} WHERE LOWER(status) = 'online';
"""


def select_relevant_context(
    question: str, meta: dict[str, Any], top_k: int = 12
) -> dict[str, Any]:
    """C1: importance prior + substring-match boost, top-k by score.

    Score = column ``importance`` (default 0), +100 when the column name
    or any alias appears lowercased inside the lowercased question.
    Ties keep dictionary order (stable sort), matching the reference
    (query_llm.py:85-96). Default top_k=12 (:480).
    """
    q = question.lower()
    scored: list[tuple[int, dict[str, Any]]] = []
    for col in meta.get("columns", []):
        score = col.get("importance", 0)
        names = [col.get("name", "")] + (col.get("aliases", []) or [])
        if any(n and n.lower() in q for n in names):
            score += 100
        scored.append((score, col))
    scored.sort(key=lambda pair: pair[0], reverse=True)
    return {
        "columns": [col for _, col in scored[:top_k]],
        "rules": meta.get("rules", []),
    }


def _allowed_preview(allowed: Any) -> str:
    """≤5-value preview of the polymorphic ``allowed_values`` shapes.

    Handles: plain list; dict with enumeration > examples > values (in
    that priority); dict with a 2-element ``range`` (query_llm.py:119-139).
    """
    if isinstance(allowed, list):
        return ", ".join(str(a) for a in allowed[:5]) if allowed else ""
    if isinstance(allowed, dict):
        for key in ("enumeration", "examples", "values"):
            v = allowed.get(key)
            if isinstance(v, list) and v:
                return ", ".join(str(a) for a in v[:5])
        rng = allowed.get("range")
        if isinstance(rng, list) and len(rng) == 2:
            return f"range {rng[0]}–{rng[1]}"
    return ""


def render_context(ctx: dict[str, Any]) -> str:
    """C2: one compact authoritative line per column + optional rules.

    Line shape (query_llm.py:107-158):
    ``- name (type): desc. Allowed: v1, v2. Aliases: a, b.`` followed by
    an indented ``Access tip:`` line when the column carries an access
    hint with an ``example``.
    """
    lines: list[str] = ["# Column reference (authoritative)"]
    for col in ctx.get("columns", []):
        name = col.get("name", "?")
        typ = col.get("type", "?")
        desc = col.get("description", "")
        aliases_list = col.get("aliases", []) or []
        aliases = ", ".join(aliases_list) if aliases_list else "—"
        preview = _allowed_preview(col.get("allowed_values"))
        allowed_str = f" Allowed: {preview}." if preview else ""
        lines.append(f"- {name} ({typ}): {desc}{allowed_str} Aliases: {aliases}.")
        example = access_hints(col).get("example")
        if example:
            lines.append(f"  Access tip: {example}")
    rules = ctx.get("rules") or []
    if rules:
        lines.append("\n# Rules")
        lines.extend(f"- {r}" for r in rules)
    return "\n".join(lines)


def build_prompts(
    question: str, table: str, schema_ddl: str, context_str: str
) -> tuple[str, str]:
    """C3: (system, user) prompt pair (query_llm.py:477-482)."""
    system = SYSTEM_TEMPLATE.format(tbl=table, schema=schema_ddl, context=context_str)
    user = USER_TEMPLATE.format(question)
    return system, user
