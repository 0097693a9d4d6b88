"""Streaming worklist maintenance (streaming/worklist.py) vs batch x124.

The change feed (x115's row-level diff) arrives in three micro-batches;
the final versioned ledger, projected to x124's schema, must equal the
one-shot batch x124 exactly — integer counters compose associatively
across batches, so the chunking cannot matter. A second test replays a
batch (at-least-once delivery) and asserts the snapshot is unchanged
(version-from-batch-id idempotence), and a third checks the bootstrap
ledger reports nothing affected.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.sources.catalog import load_table
from ask_duckdb_spark.streaming.worklist import (
    bootstrap,
    change_feed,
    current_state,
    final_view,
    start_worklist_apply,
    worklist_apply,
)
from tests.conftest import SF_DIR_001


def _rows(df):
    return sorted(
        (r["file_id"], r["n_rows"], r["n_changed"], r["affected"])
        for r in df.collect()
    )


def test_streaming_worklist_matches_batch_x124(spark, tmp_path):
    orders = load_table(spark, SF_DIR_001, "orders")
    feed = change_feed(spark, orders)
    lo, hi = feed.agg(F.min("k"), F.max("k")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

    srcdir = tmp_path / "src"
    srcdir.mkdir()
    batches = [
        feed.filter(F.col("k") <= cut1),
        feed.filter((F.col("k") > cut1) & (F.col("k") <= cut2)),
        feed.filter(F.col("k") > cut2),
    ]
    for i, part in enumerate(batches):
        d = str(srcdir / f"b{i}")
        part.coalesce(1).write.parquet(d)
        os.utime(d, (1_000_000 + i, 1_000_000 + i))
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{srcdir}/b*")
    )
    q = start_worklist_apply(spark, stream, str(tmp_path / "work"), orders)
    q.awaitTermination(180)

    got = final_view(current_state(spark, str(tmp_path / "work" / "target")))
    want = QUERIES["x124_affected_partitions"](spark, SF_DIR_001)
    assert _rows(got) == _rows(want)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    orders = load_table(spark, SF_DIR_001, "orders")
    feed = change_feed(spark, orders)
    target = str(tmp_path / "target")
    bootstrap(orders, target)

    worklist_apply(spark, feed, target, 0)
    first = _rows(final_view(spark.read.parquet(os.path.join(target, "v00001"))))
    # at-least-once delivery: the SAME batch id arrives again
    worklist_apply(spark, feed, target, 0)
    again = _rows(final_view(spark.read.parquet(os.path.join(target, "v00001"))))
    assert first == again
    # and the one-shot apply already equals batch x124
    assert again == _rows(QUERIES["x124_affected_partitions"](spark, SF_DIR_001))


def test_bootstrap_reports_nothing_affected(spark, tmp_path):
    orders = load_table(spark, SF_DIR_001, "orders")
    target = str(tmp_path / "target")
    bootstrap(orders, target)
    v0 = final_view(spark.read.parquet(os.path.join(target, "v00000")))
    assert v0.filter(F.col("affected")).count() == 0
    assert v0.count() > 0
