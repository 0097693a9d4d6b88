"""Streaming CDC apply: x116's MERGE upsert as a foreachBatch loop.

The batch operator (operators/layout.py x116) merges one source
aggregate into the target via the r12 decomposition (broadcast left
join + semi-reduce-then-anti inserts — the target is streamed, never
shuffled). In production the source arrives CONTINUOUSLY — this
module is the apply loop that keeps a target table current under a
stream of updates, the pattern behind every lakehouse streaming-MERGE
sink:

- **State = versioned parquet snapshots** (``target/v00000`` …), a
  poor-man's commit log: version ``b+1`` is derived from version ``b``
  plus micro-batch ``b``'s deltas. Nothing is read and overwritten in
  place, so a crash mid-write never corrupts the current version.
- **Idempotent by construction**: the version to write is a pure
  function of the batch id, and the version to read is the one below
  it — a replayed batch (at-least-once delivery) recomputes the same
  snapshot from the same parent, giving exactly-once EFFECT.
- **Balances ride integer cents in state** (the x116/_util exactness
  discipline); the dollars view is derived at read time, so repeated
  merging never accumulates float error and the final state is
  bit-equal to the one-shot batch MERGE — pinned by
  tests/test_streaming_upsert.py, which holds because the update rule
  is associative (bal += delta composes across batches) and insert
  rows are stable under later updates.

Scale (100 TB): each micro-batch costs one map-side-combinable source
aggregate plus two STREAMING scans of the current snapshot (broadcast
left join + the insert semi/anti pair — zero snapshot exchanges, the
x116 r12 posture; a bucketed/clustered snapshot additionally turns
the rewrite into touched-file surgery), and version GC keeps the
last K snapshots (time travel for free). A real deployment swaps the
directory-versioning for a table format's atomic commit; the PLAN per
batch is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators._util import icents, money

__all__ = ["upsert_apply", "start_upsert_apply", "current_state", "final_view"]

_STATE_COLS = ("c_custkey", "c_name", "c_nationkey", "bal_units", "c_mktsegment")


def _vdir(target_dir: str, version: int) -> str:
    return os.path.join(target_dir, f"v{version:05d}")


def bootstrap(customer_df: DataFrame, target_dir: str) -> None:
    """Write version 0 of the state from the initial target table."""
    customer_df.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        icents("c_acctbal").alias("bal_units"),
        "c_mktsegment",
    ).write.mode("overwrite").parquet(_vdir(target_dir, 0))


def upsert_apply(
    spark: SparkSession, batch_df: DataFrame, target_dir: str, batch_id: int
) -> None:
    """Merge ONE micro-batch of orders into the versioned target.

    Reads snapshot ``batch_id``, writes snapshot ``batch_id + 1``.
    Separated from the stream wiring (novelty_ingest discipline):
    testable batch-by-batch, reusable from any incremental driver.
    """
    src = (
        batch_df.select(
            (
                F.col("o_custkey")
                + F.when(F.col("o_custkey") % 50 == 0, F.lit(1000000)).otherwise(0)
            ).alias("k"),
            icents("o_totalprice").alias("u"),
        )
        .groupBy("k")
        .agg(F.sum("u").cast("bigint").alias("delta_units"))
    )
    # r12: same decomposition as batch x116 — the snapshot (the
    # corpus-sized side, re-joined EVERY micro-batch) is only ever
    # STREAMED, never shuffled: broadcast left join for update/keep,
    # semi-reduce-then-anti for inserts. A streaming MERGE pays this
    # join per batch forever, so the removed per-batch target shuffle
    # is the difference between a sink that keeps up and one that
    # falls behind as the target grows. src is micro-batch-sized by
    # construction; persisted for its three consumers and released
    # right after the eager snapshot write.
    src = src.persist()
    try:
        prev = spark.read.parquet(_vdir(target_dir, batch_id))
        upd = prev.alias("t").join(
            src.alias("s"), F.col("t.c_custkey") == F.col("s.k"), "left"
        ).select(
            F.col("t.c_custkey").alias("c_custkey"),
            F.col("t.c_name").alias("c_name"),
            F.col("t.c_nationkey").cast("int").alias("c_nationkey"),
            (
                F.col("t.bal_units")
                + F.coalesce(F.col("s.delta_units"), F.lit(0))
            ).cast("bigint").alias("bal_units"),
            F.col("t.c_mktsegment").alias("c_mktsegment"),
        )
        touched = prev.select(F.col("c_custkey").alias("k")).join(
            src.select("k"), "k", "left_semi"
        )
        ins = src.join(touched, "k", "left_anti").select(
            F.col("k").alias("c_custkey"),
            F.concat(F.lit("Customer#new#"), F.col("k").cast("string")).alias(
                "c_name"
            ),
            F.lit(-1).cast("int").alias("c_nationkey"),
            F.col("delta_units").cast("bigint").alias("bal_units"),
            F.lit("UNKNOWN").alias("c_mktsegment"),
        )
        merged = upd.unionByName(ins)
        merged.write.mode("overwrite").parquet(_vdir(target_dir, batch_id + 1))
    finally:
        src.unpersist()


def current_state(spark: SparkSession, target_dir: str) -> DataFrame:
    """The highest-version snapshot (integer-cents state schema)."""
    versions = sorted(
        int(d[1:]) for d in os.listdir(target_dir) if d.startswith("v")
    )
    return spark.read.parquet(_vdir(target_dir, versions[-1]))


def final_view(state: DataFrame) -> DataFrame:
    """Project the cents state to x116's output schema (dollars)."""
    return state.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        money(F.col("bal_units"), 100).alias("c_acctbal"),
        "c_mktsegment",
    )


def start_upsert_apply(
    spark: SparkSession,
    orders_stream: DataFrame,
    workdir: str,
    customer_df: DataFrame,
    trigger_available_now: bool = True,
):
    """Wire :func:`upsert_apply` as a foreachBatch streaming query.

    ``workdir`` gets ``target`` (versioned snapshots, v00000 boot-
    strapped from ``customer_df``) and ``ckpt`` subdirectories.
    """
    target = os.path.join(workdir, "target")
    ckpt = os.path.join(workdir, "ckpt")
    if not os.path.isdir(_vdir(target, 0)):
        bootstrap(customer_df, target)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        upsert_apply(spark, batch_df, target, batch_id)

    w = (
        orders_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
