"""x100's streaming twin: stateful transition counting across batches.

The per-user `last event type` state must survive micro-batch
boundaries — a transition that SPANS two batches is counted exactly
once — so the rolled-up streaming counts equal the batch matrix. The
stream is split into three time-ordered files (the event-time-ordered
ingest contract the machine documents); within/cross-batch ordering is
exercised because every user appears in all three slices.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from tests.conftest import SF_DIR_001


@pytest.fixture(scope="module")
def sliced_events(spark, tmp_path_factory):
    src = spark.read.parquet(f"{SF_DIR_001}/events.parquet").orderBy(
        "ts", "event_id"
    )
    rows = src.collect()
    n = len(rows)
    cuts = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
    d = tmp_path_factory.mktemp("sliced")
    for i, chunk in enumerate(cuts):
        spark.createDataFrame(chunk, src.schema).coalesce(1).write.parquet(
            os.path.join(str(d), f"slice{i}")
        )
        # one data file per slice dir -> flatten into the stream dir
        time.sleep(1.1)  # distinct mtimes: deterministic batch order
    stream_dir = tmp_path_factory.mktemp("stream")
    import glob
    import shutil

    for i in range(3):
        (part,) = glob.glob(os.path.join(str(d), f"slice{i}", "part-*.parquet"))
        shutil.copy(part, os.path.join(str(stream_dir), f"{i:03d}.parquet"))
        os.utime(
            os.path.join(str(stream_dir), f"{i:03d}.parquet"),
            (time.time() + i, time.time() + i),
        )
    return str(stream_dir), src.schema


def test_stateful_transitions_match_batch_matrix(spark, sliced_events):
    from ask_duckdb_spark.streaming.stateful import (
        transition_counts_stateful,
    )

    stream_dir, schema = sliced_events
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(stream_dir)
    )
    q = (
        transition_counts_stateful(stream)
        .writeStream.format("memory")
        .queryName("trans_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress["batchId"] >= 2  # really ran multiple batches

    got = {
        (r.from_type, r.to_type): r.total
        for r in spark.table("trans_sink")
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").cast("bigint").alias("total"))
        .collect()
    }
    want = {
        (r.from_type, r.to_type): r.n
        for r in QUERIES["x100_event_transitions"](
            spark, SF_DIR_001
        ).collect()
    }
    assert got == want
