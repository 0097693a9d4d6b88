"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-to-fact join (orders ⋈ lineitem)
is shuffling both sides on the key. Writing both tables bucketed by
that key moves the shuffle to WRITE time, once; every subsequent join
on the key is exchange-free (SortMergeJoin over co-located buckets).
This module wraps the write/read pair; tests/test_bucketing.py asserts
the join plan really has zero Exchange operators.

Bucketing requires the table catalog (``saveAsTable``) — plain
``.parquet(path)`` writes lose the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) catalog table.

    Sorting within buckets by the same columns lets SortMergeJoin skip
    its sort as well — the join degenerates to a streamed merge.

    Sizing rule (measured, Spark 4.1 — tests/test_corpus_ops.py
    bucketed-probe test): a ONE-sided bucketed join (bucketed table ⋈
    derived frame) only skips the bucketed side's exchange when
    ``n_buckets`` equals the join parallelism
    (``spark.sql.shuffle.partitions``); with a mismatch the planner
    disables the bucketed scan ("Bucketed: false (disabled by query
    planner)") and re-shuffles the stored side anyway. Two-sided
    bucketed joins (both tables same spec, as in
    tests/test_bucketing.py) are exchange-free regardless. At cluster
    scale: size n_buckets to the shuffle parallelism the probing jobs
    will run with.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join_ready(spark: SparkSession, table: str) -> bool:
    """True when the catalog table carries a bucket spec."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return any("Num Buckets" in (r.col_name or "") for r in rows)
