"""Beyond-watermark drop semantics, tied to x97's batch audit.

test_streaming.py pins the tolerant side (late-but-within-watermark
events are incorporated); this file pins the DROP side: an event
arriving behind the watermark by more than the delay is excluded from
an append-mode windowed aggregation — and x97_late_event_audit, run on
the same arrival sequence, predicts exactly that drop count. The audit
is the planning tool; this test is the engine behavior it predicts.

Mechanics: two availableNow runs over one checkpoint (the
test_streaming.py restart pattern) — a single availableNow pass
computes its batches up front and coalesces both files into one batch,
so the watermark never advances BETWEEN the arrivals; a stop/restart
persists the first run's watermark and applies it to the second run's
input, which is exactly the arrival-order semantics x97 models.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.streaming import events as stream_ops

T0 = 1_700_000_000_000_000 - (1_700_000_000 % 3600) * 1_000_000  # hour-aligned
HOUR = 3_600_000_000
MIN = 60_000_000

BATCH1 = [
    (0, T0, 1, "click", 1.0, "{}"),
    (1, T0 + 2 * HOUR, 1, "click", 1.0, "{}"),
]
#: t0+5min arrives AFTER the watermark reached t0+2h-10min: 115 minutes
#: behind, far beyond the 10-minute delay. t0+3h is on time.
BATCH2 = [
    (2, T0 + 5 * MIN, 2, "click", 1.0, "{}"),
    (3, T0 + 3 * HOUR, 2, "click", 1.0, "{}"),
]


def _write(rows, path):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def test_beyond_watermark_event_is_dropped(spark, tmp_path):
    data_dir = str(tmp_path / "events.parquet")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(data_dir)
    _write(BATCH1, os.path.join(data_dir, "part-000.parquet"))

    def run():
        src = spark.read.parquet(data_dir)
        stream = (
            spark.readStream.schema(src.schema)
            .format("parquet")
            .load(data_dir)
        )
        # parquet sink: append mode (only FINALIZED windows emit) AND
        # checkpoint recovery (the memory sink supports no recovery)
        q = (
            stream_ops.tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()  # watermark after run 1: t0+2h - 10min (checkpointed)
    _write(BATCH2, os.path.join(data_dir, "part-001.parquet"))
    run()  # restored watermark filters the t0+5min arrival

    rows = spark.read.parquet(out_dir).collect()
    first = [r for r in rows if r.window_start.timestamp() * 1e6 == T0]
    # the [t0, t0+1h) window finalized with ONLY batch 1's t0 event;
    # had the t0+5min arrival been admitted, n would be 2 (state was
    # still live when run 2's batch executed) — the drop is the only
    # way this window emits n=1
    assert len(first) == 1
    assert first[0].n == 1


def test_x97_audit_predicts_the_drop(spark, tmp_path):
    data_dir = str(tmp_path / "events.parquet")
    os.makedirs(data_dir)
    _write(BATCH1, os.path.join(data_dir, "part-000.parquet"))
    _write(BATCH2, os.path.join(data_dir, "part-001.parquet"))
    out = {
        r.event_type: r
        for r in QUERIES["x97_late_event_audit"](spark, str(tmp_path)).collect()
    }
    # same arrival sequence: exactly the one beyond-watermark event
    assert out["click"].n_events == 4
    assert out["click"].n_late == 1
