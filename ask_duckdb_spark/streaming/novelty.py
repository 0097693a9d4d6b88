"""Streaming novelty scoring: x86's per-document novelty at INGEST time.

The batch operator (operators/dedup.py x86) scores a static corpus by
each window hash's global first-seen document. At ingest the same
question is "how much of this arriving document have we EVER seen?" —
answered per micro-batch against an append-only store of every window
hash accepted so far, the same store discipline as streaming/neardup.py.

Given id-ordered arrival (lower doc_id lands in the same or an earlier
micro-batch), the stream's output is IDENTICAL to batch x86 — pinned by
tests/test_streaming_novelty.py. Out-of-order arrival degrades
gracefully: novelty is then "first seen in arrival order", the
operationally honest reading at ingest.

Scale (100 TB/day ingest): the store grows by O(new windows) per batch
and is probed with one hash-keyed join per batch (the store side is
pre-partitioned by the parquet layout; at production scale you'd bucket
the store by ``h`` so the probe is exchange-free on the store side and
compact it periodically). State never lives in executor memory — it is
a parquet frame, so a restart resumes from the checkpoint + store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import distinct_window_hashes

__all__ = ["novelty_ingest", "start_novelty_ingest"]


def novelty_ingest(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    out_dir: str,
    batch_id: int | None = None,
) -> None:
    """Score ONE micro-batch of (doc_id, text) documents.

    Separated from the stream wiring (same reason as neardup_ingest):
    testable batch-by-batch, reusable from any incremental driver.
    """
    wins = distinct_window_hashes(batch_df).persist()

    try:
        store = spark.read.parquet(store_dir).select("h").distinct()
        have_store = True
    except Exception:
        have_store = False

    # within-batch first-seen: the min doc_id wins the novelty credit,
    # exactly like batch x86's global min over id order
    first_in_batch = wins.groupBy("h").agg(F.min("doc_id").alias("fs"))
    flagged = wins.join(first_in_batch, "h")
    if have_store:
        seen = store.withColumn("seen", F.lit(True))
        flagged = flagged.join(seen, "h", "left")
    else:
        flagged = flagged.withColumn("seen", F.lit(None).cast("boolean"))
    novel = (
        F.when(
            F.col("seen").isNull() & (F.col("fs") == F.col("doc_id")), 1
        )
        .otherwise(0)
    )
    scores = (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_windows"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            # portable floor-round over exact counts (batch-x86 parity)
            (
                F.floor(
                    F.sum(novel).cast("double")
                    / F.count("*").cast("double")
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("novelty_ratio"),
        )
    )

    # idempotent per-batch output (overwrite-own-subdir recipe), then
    # append ONLY the store-unseen hashes. A replayed batch re-appends
    # its hashes; the store is always consumed through DISTINCT, so
    # duplicates cost bytes, never correctness.
    dst = (
        os.path.join(out_dir, f"batch_id={batch_id}")
        if batch_id is not None
        else out_dir
    )
    scores.write.mode(
        "overwrite" if batch_id is not None else "append"
    ).parquet(dst)
    new_h = wins.select("h").distinct()
    if have_store:
        new_h = new_h.join(store, "h", "left_anti")
    new_h.write.mode("append").parquet(store_dir)
    wins.unpersist()


def start_novelty_ingest(
    spark: SparkSession,
    docs_stream: DataFrame,
    workdir: str,
    trigger_available_now: bool = True,
):
    """Wire :func:`novelty_ingest` as a foreachBatch streaming query.

    ``workdir`` gets ``store`` (window-hash store), ``scores`` (per-doc
    novelty rows) and ``ckpt`` (checkpoint) subdirectories.
    """
    store = os.path.join(workdir, "store")
    scores = os.path.join(workdir, "scores")
    ckpt = os.path.join(workdir, "ckpt")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        novelty_ingest(spark, batch_df, store, scores, batch_id=batch_id)

    w = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
