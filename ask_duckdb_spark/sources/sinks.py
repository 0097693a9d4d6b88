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
    "read_csv_permissive",
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


def read_csv_permissive(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """CSV source that QUARANTINES malformed rows instead of failing.

    Real crawl/export CSVs carry broken rows; at 100 TB a single bad
    line must not kill a 10-hour job (FAILFAST) or silently vanish
    (DROPMALFORMED). PERMISSIVE mode parses what it can and lands the
    raw text of unparseable rows in ``_corrupt_record`` so the caller
    can split good rows from a quarantine set in ONE pass:

        df = read_csv_permissive(spark, path, schema)
        good = df.filter(df._corrupt_record.isNull()).drop("_corrupt_record")
        bad = df.filter(df._corrupt_record.isNotNull())
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    schema = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
