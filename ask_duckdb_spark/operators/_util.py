"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Repartition to the core count when the scan under-partitions.

    CPU-heavy per-row stages (hashing, media decode) serialize when a
    small input arrives as 1-2 parquet footers (the fixtures have one
    row group per file); at 100 TB the scan already has >> cores
    partitions and this no-ops.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
