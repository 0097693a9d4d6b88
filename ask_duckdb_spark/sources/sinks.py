"""File sinks + secondary sources (Parquet / CSV / JSON lines).

The reference's only sinks are stdout displays (SURVEY.md §2.1 S6-S8);
a data-pipeline engine also needs durable outputs. Thin, opinionated
wrappers over the DataFrameWriter/Reader with the 100 TB defaults
baked in:

- parquet + snappy is the canonical interchange format (columnar,
  splittable, statistics for pushdown on re-read);
- ``partition_by`` produces the directory layout partition pruning
  needs on re-read;
- CSV/JSON are edge formats: schema-on-read is explicit (never
  inferSchema over 100 TB — that is a full extra scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "write_parquet",
    "write_csv",
    "write_jsonl",
    "read_csv",
    "read_jsonl",
]


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Columnar sink; ``partition_by`` enables pruning on re-read."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "error") -> None:
    """CSV edge sink (header on; for interchange, not for re-analysis)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """JSON-lines edge sink."""
    df.write.mode(mode).json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """CSV source with an explicit schema (inferSchema would be a full
    extra pass over the data — never at scale)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """JSON-lines source with an explicit schema."""
    return spark.read.schema(schema).json(path)
