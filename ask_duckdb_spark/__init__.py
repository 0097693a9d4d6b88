"""ask_duckdb_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of PalNilsson/ask-duckdb
(NL -> SQL -> execute over a relational table) on Apache Spark:

- ``session``   — SparkSession factory + runtime conf pinning
- ``sources``   — table catalog over Parquet, readers, display sinks
- ``operators`` — the named operator/query library (SURVEY.md §2),
                  including scale extensions (dedup, similarity,
                  text analysis, multimodal)
- ``functions`` — reusable column-expression helpers (JSON, text,
                  vectors)
- ``plans``     — plan inspection/assertion helpers (pushdown,
                  broadcast, codegen checks)
- ``streaming`` — Structured Streaming analytics over the events table
- ``nl``        — the intelligence layer: data dictionary, context
                  ranking, SQL repair pipeline, LLM clients
- ``cli``       — ask / sql / describe entry points (parity with the
                  reference's query_llm.py / query_db.py /
                  describe_table.py)
"""

__version__ = "0.1.0"
