"""Semantic data dictionary: load, synonym map, skeleton generation.

The dictionary format is byte-compatible with the reference's
``queuedata.schema.json`` (reference: queuedata.schema.json:5-17 for the
per-column shape) except that skeletons generated here emit
``spark_access`` hints instead of ``duckdb_access`` (SURVEY.md §1.3).
Readers accept either key, so reference dictionaries load unchanged.

Reference parity: load/write S11 (query_llm.py:79-82, 214-218), synonym
map for repair R2 (query_llm.py:269-286), skeleton generation C7
(query_llm.py:164-218) rebuilt against ``pyspark.sql.types.StructType``
instead of a live DESCRIBE.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

from ..introspect import spark_type_name  # noqa: F401  (re-exported)

__all__ = [
    "load_dictionary",
    "write_dictionary",
    "build_synonym_map",
    "access_hints",
    "make_skeleton",
    "spark_type_name",
]


def load_dictionary(path: str) -> dict[str, Any]:
    """Load the JSON data dictionary (reference: query_llm.py:79-82)."""
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def write_dictionary(path: str, data: dict[str, Any]) -> None:
    """Write a dictionary/skeleton JSON (reference: query_llm.py:214-218)."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2, ensure_ascii=False)


def build_synonym_map(meta: dict[str, Any] | None) -> dict[str, str]:
    """alias (lowercased) -> canonical column name.

    Mirrors reference query_llm.py:269-286: every column's ``aliases``
    list contributes lowercase keys; empty aliases and unnamed columns
    are skipped. Later columns win on alias collision (dict semantics,
    same as the reference).
    """
    out: dict[str, str] = {}
    if not meta:
        return out
    for col in meta.get("columns", []):
        canonical = col.get("name")
        if not canonical:
            continue
        for alias in col.get("aliases", []) or []:
            if alias:
                out[alias.lower()] = canonical
    return out


def access_hints(col: dict[str, Any]) -> dict[str, Any]:
    """Engine-access hints for a column, preferring ``spark_access``.

    Reference dictionaries carry ``duckdb_access`` (e.g.
    queuedata.schema.json:30-33); skeletons we generate carry
    ``spark_access``. Accept both so either dictionary drives prompts.
    """
    hints = col.get("spark_access") or col.get("duckdb_access") or {}
    return hints if isinstance(hints, dict) else {}


def _default_canonicalization(type_name: str) -> dict[str, Any]:
    """Type-driven canonicalization skeleton (query_llm.py:164-171).

    The reference leaves ``case: none`` even for text (a human tightens
    it to ``lower`` later); we preserve that conservative default.
    """
    return {"case": "none", "map_values": {}}


def _default_spark_access(name: str, type_name: str) -> dict[str, Any]:
    """Type-driven Spark access hints (analogue of query_llm.py:173-186).

    JSON-typed text columns get ``get_json_object`` recipes (Spark's
    ``->>``-style unquoted extraction, SURVEY.md §7.3.1); STRUCT columns
    get dotted access; MAP columns get ``['key']`` item access.
    """
    u = type_name.upper()
    if "JSON" in u:  # a dictionary may declare type JSON for a string col
        return {
            "exists_key": f"get_json_object({name}, '$.rucio') IS NOT NULL",
            "get_setup": f"get_json_object({name}, '$.rucio.setup')",
        }
    if u.startswith("STRUCT"):
        return {"example": f"{name}.field"}
    if u.startswith("MAP"):
        return {"example": f"{name}['key']"}
    return {}


def make_skeleton(table: str, schema: T.StructType) -> dict[str, Any]:
    """Skeleton dictionary from a Spark schema (C7, query_llm.py:188-212).

    Same top-level shape as the reference skeleton (version/table/notes/
    columns/rules) so a skeleton generated here can be hand-enriched and
    then loaded by either engine's tooling.
    """
    columns: list[dict[str, Any]] = []
    for field in schema.fields:
        type_name = spark_type_name(field.dataType)
        entry: dict[str, Any] = {
            "name": field.name,
            "type": type_name,
            "description": "",
            "aliases": [],
            "importance": 5,
            "allowed_values": [],
            "canonicalization": _default_canonicalization(type_name),
        }
        hints = _default_spark_access(field.name, type_name)
        if hints:
            entry["spark_access"] = hints
        columns.append(entry)
    return {
        "version": "1.0",
        "table": table,
        "notes": (
            "Auto-generated skeleton. Fill in descriptions, rules, aliases,"
            " and any canonicalization/allowed_values."
        ),
        "columns": columns,
        "rules": [],
    }
