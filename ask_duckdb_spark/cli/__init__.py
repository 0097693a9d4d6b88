"""CLI entry points — parity with the reference's three executables.

- ``python -m ask_duckdb_spark.cli.ask``      ≈ query_llm.py (NL → SQL)
- ``python -m ask_duckdb_spark.cli.sql``      ≈ query_db.py (direct SQL)
- ``python -m ask_duckdb_spark.cli.describe`` ≈ describe_table.py

Shared exit-code protocol (S10; reference: query_llm.py:446,455,475,489,
query_db.py:68,73,51): 1 = data source open failure, 2 = missing table
or required argument, 3 = LLM call failure, 4 = SQL execution failure.

The data source is a directory of Parquet tables (``--sf-dir``) — the
Spark analogue of the reference's single DuckDB file — registered
read-only as temp views; a statement allowlist enforces the
reference's ``read_only=True`` connection semantics (SURVEY.md §4.2).
"""
