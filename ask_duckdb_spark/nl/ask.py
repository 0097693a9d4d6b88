"""End-to-end NL→SQL→execute pipeline (the reference's §3.1 lifecycle).

question → dictionary + schema context → prompts → LLM (or stub) →
repair pipeline → read-only gate → ``spark.sql`` → DataFrame. The
engine boundary (reference: db.sql at query_llm.py:400-406) is Catalyst
— parse/analyze/optimize/AQE all happen inside ``spark.sql``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..introspect import build_tbl_schema, list_columns
from .context import build_prompts, render_context, select_relevant_context
from .dictionary import build_synonym_map
from .llm import LLMCallError, Provider
from .repair import ensure_readonly, repair_sql

__all__ = ["AskResult", "generate_sql", "answer_question"]


@dataclass
class AskResult:
    """Everything the CLI prints: raw completion, cleaned SQL, result."""

    question: str
    raw: str
    sql: str
    df: DataFrame


def generate_sql(
    spark: SparkSession,
    table: str,
    question: str,
    provider: Provider,
    meta: dict[str, Any] | None = None,
    model: str | None = None,
    top_k: int = 12,
) -> tuple[str, str]:
    """(raw completion, repaired SQL) without executing anything.

    Mirrors query_llm.py:477-501: schema DDL → top-k context → prompts
    → provider call → fence strip → literal canonicalization → schema-
    aware repairs. The repair pass runs unconditionally, as in the
    reference — valid SQL passes through the regexes unchanged.
    """
    df = spark.table(table)
    schema_ddl = build_tbl_schema(df)
    context_str = render_context(
        select_relevant_context(question, meta or {}, top_k=top_k)
    )
    system, user = build_prompts(question, table, schema_ddl, context_str)
    try:
        raw = provider(system, user, model=model)
    except Exception as e:  # ONLY the provider call is the LLM boundary
        raise LLMCallError(str(e)) from e
    sql = repair_sql(
        raw,
        actual_cols=set(list_columns(df)),
        meta=meta,
        synonym_map=build_synonym_map(meta),
    )
    return raw, sql


def answer_question(
    spark: SparkSession,
    table: str,
    question: str,
    provider: Provider,
    meta: dict[str, Any] | None = None,
    model: str | None = None,
    top_k: int = 12,
) -> AskResult:
    """Full lifecycle; the returned DataFrame is lazy (display decides
    how much to materialize, reference: query_llm.py:397-412)."""
    raw, sql = generate_sql(
        spark, table, question, provider, meta=meta, model=model, top_k=top_k
    )
    ensure_readonly(sql)
    return AskResult(question=question, raw=raw, sql=sql, df=spark.sql(sql))
