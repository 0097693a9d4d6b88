"""Streaming CDC apply (streaming/upsert.py) vs batch x116 MERGE.

The stream sees the 1998 source orders in three micro-batches; the
final versioned snapshot must equal the one-shot batch MERGE exactly
(values compared as exact cents — the state is integer, so there is no
tolerance anywhere). This holds because the update rule is associative
(bal += delta composes across batches) and inserts are stable under
later updates — the same argument that makes MERGE parallelizable in
the first place, applied across TIME instead of across partitions.

A second test replays a batch (at-least-once delivery) and asserts the
snapshot it produces is unchanged — the version-from-batch-id rule
gives exactly-once effect.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.sources.catalog import load_table
from ask_duckdb_spark.streaming.upsert import (
    bootstrap,
    current_state,
    final_view,
    start_upsert_apply,
    upsert_apply,
)
from tests.conftest import SF_DIR_001


def _rows(df):
    return sorted(
        (r["c_custkey"], r["c_name"], r["c_nationkey"], r["c_acctbal"], r["c_mktsegment"])
        for r in df.collect()
    )


def _src_orders(spark):
    return load_table(spark, SF_DIR_001, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )


def test_streaming_upsert_matches_batch_x116(spark, tmp_path):
    src = _src_orders(spark)
    lo, hi = src.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

    srcdir = tmp_path / "src"
    srcdir.mkdir()
    batches = [
        src.filter(F.col("o_orderkey") <= cut1),
        src.filter((F.col("o_orderkey") > cut1) & (F.col("o_orderkey") <= cut2)),
        src.filter(F.col("o_orderkey") > cut2),
    ]
    for i, part in enumerate(batches):
        d = str(srcdir / f"b{i}")
        part.coalesce(1).write.parquet(d)
        os.utime(d, (1_000_000 + i, 1_000_000 + i))
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{srcdir}/b*")
    )
    cust = load_table(spark, SF_DIR_001, "customer")
    q = start_upsert_apply(spark, stream, str(tmp_path / "work"), cust)
    q.awaitTermination(180)

    got = final_view(current_state(spark, str(tmp_path / "work" / "target")))
    want = QUERIES["x116_merge_upsert"](spark, SF_DIR_001)
    assert _rows(got) == _rows(want)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    src = _src_orders(spark)
    target = str(tmp_path / "target")
    bootstrap(load_table(spark, SF_DIR_001, "customer"), target)

    upsert_apply(spark, src, target, 0)
    first = _rows(final_view(spark.read.parquet(os.path.join(target, "v00001"))))
    # at-least-once delivery: the SAME batch id arrives again
    upsert_apply(spark, src, target, 0)
    again = _rows(final_view(spark.read.parquet(os.path.join(target, "v00001"))))
    assert first == again
    # and the one-shot apply already equals batch x116
    assert again == _rows(QUERIES["x116_merge_upsert"](spark, SF_DIR_001))
