"""Schema introspection + catalog probes (S3, S4, S5).

Reference parity: DESCRIBE-driven column listing and DDL-string
building (query_llm.py:61-71, describe_table.py:36-47), the
case-insensitive ``information_schema`` existence probe
(query_db.py:9-18, query_llm.py:449-454), and parameterized queries
(``?`` placeholders, query_db.py:17). In Spark all three collapse onto
the session catalog and ``spark.sql(..., args=...)`` — no
information_schema round-trip, no pandas munging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "spark_type_name",
    "describe_columns",
    "build_tbl_schema",
    "list_columns",
    "table_exists",
    "run_param_sql",
]


def spark_type_name(dt: T.DataType) -> str:
    """Uppercase SQL type name for prompt DDL (e.g. STRING, BIGINT)."""
    return dt.simpleString().upper()


def describe_columns(df: DataFrame) -> list[dict[str, str]]:
    """[{name, type}] per column — the DESCRIBE analogue over df.schema
    (reference: query_llm.py:61-65)."""
    return [
        {"name": f.name, "type": spark_type_name(f.dataType)}
        for f in df.schema.fields
    ]


def build_tbl_schema(df: DataFrame) -> str:
    """Compact ``name TYPE, name TYPE`` DDL string for prompts
    (reference: query_llm.py:68-71, describe_table.py:40-47)."""
    return ", ".join(f"{c['name']} {c['type']}" for c in describe_columns(df))


def list_columns(df: DataFrame) -> list[str]:
    """Column names (reference: query_llm.py:74-76)."""
    return [f.name for f in df.schema.fields]


def table_exists(spark: SparkSession, table: str) -> bool:
    """Case-insensitive table/view existence probe (S3).

    The reference lowercases both sides of an information_schema lookup
    (query_db.py:9-18); Spark's catalog resolution is case-insensitive
    under ``spark.sql.caseSensitive=false`` (pinned in session.py), so
    the catalog call alone gives identical semantics.
    """
    return spark.catalog.tableExists(table)


def run_param_sql(spark: SparkSession, sql: str, args=None) -> DataFrame:
    """Parameterized SQL (S4) — ``?`` positional or ``:name`` named.

    The reference threads ``?`` placeholders through duckdb
    (query_db.py:17); Spark ≥3.5 supports the same positional binding
    natively, with server-side literal substitution (no string
    splicing, injection-safe).
    """
    if args is None:
        return spark.sql(sql)
    return spark.sql(sql, args=args)


def summarize_table(df: DataFrame) -> DataFrame:
    """Per-column statistics — the DuckDB ``SUMMARIZE`` analogue (S5+).

    One wide aggregation pass computes min / max / approx distinct /
    null%% (and mean/std for numerics) for EVERY column simultaneously,
    then the single result row unpivots to one row per column. At
    100 TB this is one scan + a one-row shuffle — never a per-column
    scan loop. Complex-typed columns (array/map/struct/binary) report
    nulls only: ordering statistics are undefined for them.
    """
    from pyspark.sql import functions as F

    n = F.count(F.lit(1))
    aggs = [n.cast("double").alias("__n")]
    numeric = set()
    orderable = set()
    for f in df.schema.fields:
        c = f.name
        if isinstance(f.dataType, (T.NumericType,)):
            numeric.add(c)
        if not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        ):
            orderable.add(c)
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("double")
            .alias(f"{c}__nulls")
        )
        if c in orderable:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
            aggs.append(
                F.approx_count_distinct(c).cast("double").alias(f"{c}__uniq")
            )
        if c in numeric:
            aggs.append(F.avg(c).cast("double").alias(f"{c}__avg"))
            aggs.append(F.stddev(c).cast("double").alias(f"{c}__std"))
    wide = df.agg(*aggs)

    rows = []
    for f in df.schema.fields:
        c = f.name
        entry = F.struct(
            F.lit(c).alias("column_name"),
            F.lit(spark_type_name(f.dataType)).alias("column_type"),
            (F.col(f"{c}__min") if c in orderable else F.lit(None).cast("string")).alias("min"),
            (F.col(f"{c}__max") if c in orderable else F.lit(None).cast("string")).alias("max"),
            (F.col(f"{c}__uniq") if c in orderable else F.lit(None).cast("double")).alias("approx_unique"),
            (F.col(f"{c}__avg") if c in numeric else F.lit(None).cast("double")).alias("avg"),
            (F.col(f"{c}__std") if c in numeric else F.lit(None).cast("double")).alias("std"),
            F.col("__n").cast("bigint").alias("count"),
            F.round(F.col(f"{c}__nulls") * 100.0 / F.col("__n"), 2).alias(
                "null_percentage"
            ),
        )
        rows.append(entry)
    return wide.select(
        F.explode(F.array(*rows)).alias("s")
    ).select("s.*")
