"""Streaming partition-worklist maintenance: x124 as a foreachBatch loop.

The batch operator (operators/layout.py x124) scopes an incremental
recompute by diffing two whole snapshots and rolling changed keys up to
their month partitions. In production the change set arrives
CONTINUOUSLY (a table format's commit log, a CDC feed); this module is
the maintenance loop that keeps the affected-partition worklist current
as change events stream in — completing the incremental-maintenance
story x115 (detect) / x116 (apply, streaming/upsert.py) started:
detect -> apply -> **scope what to recompute**.

- **State = versioned parquet snapshots** of the per-partition ledger
  ``(file_id, n_rows, n_changed)`` (the streaming/upsert.py versioning
  discipline: version ``b+1`` derives from version ``b`` plus batch
  ``b``'s deltas, so a replayed batch recomputes the same snapshot —
  exactly-once EFFECT under at-least-once delivery).
- **Bootstrap = snapshot A's manifest** with ``n_changed = 0``: before
  any change arrives, every partition is current and unaffected.
- **Each micro-batch** of row-level change events ``(change_kind, k,
  file_id)`` folds into the ledger as two integer deltas per month:
  ``n_changed += count(*)`` and ``n_rows += inserts - deletes``
  (updates never move a row across months — o_orderdate is immutable
  in the x115 mutation model, and real CDC emits delete+insert when a
  partition key mutates). Integer counters compose associatively
  across batches, so the final ledger is independent of how the feed
  was chunked — the same argument that makes x116's MERGE streamable.
- **The final view equals batch x124 exactly** (pinned by
  tests/test_streaming_worklist.py): months that end with ``n_rows >
  0`` carry B's manifest counts by construction (A + inserts - deletes
  = B per month), and ``affected = n_changed > 0``.

Scale (100 TB): each micro-batch costs one map-side-combinable
aggregate over the batch's change events (output = |touched months|
rows) plus a month-keyed join against a manifest-sized ledger —
metadata scale, independent of table size. The ledger IS the worklist
a downstream rollup (x120's partials) consumes; emitting it per batch
turns "the snapshot changed" into "re-run these 3 partitions now"
without ever re-diffing the snapshots.

Reference parity note: the reference engine (ask-duckdb) has no
streaming surface; this family is part of the §2.9 scale extensions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators._util import icents
from ..operators.layout import _CDC_D1, _CDC_D2

__all__ = [
    "bootstrap",
    "change_feed",
    "worklist_apply",
    "current_state",
    "final_view",
    "start_worklist_apply",
]


def _vdir(target_dir: str, version: int) -> str:
    return os.path.join(target_dir, f"v{version:05d}")


def _snapshot_a(orders: DataFrame) -> DataFrame:
    return orders.filter(
        F.col("o_orderdate") < F.lit(_CDC_D1).cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("k"),
        icents("o_totalprice").alias("units"),
        F.col("o_orderdate").alias("dt"),
    )


def _snapshot_b(orders: DataFrame) -> DataFrame:
    return orders.filter(
        (F.col("o_orderdate") < F.lit(_CDC_D2).cast("timestamp"))
        & (F.col("o_orderkey") % 97 != 0)
    ).select(
        F.col("o_orderkey").alias("k"),
        (
            icents("o_totalprice")
            + F.when(F.col("o_orderkey") % 11 == 0, F.lit(100)).otherwise(0)
        ).alias("units"),
        F.col("o_orderdate").alias("dt"),
    )


def change_feed(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """Row-level change events between snapshots A and B.

    x115's diff at row granularity with the month partition attached:
    ``(change_kind, k, file_id)`` for every insert/delete/update — the
    frame a commit log or CDC source would deliver incrementally. The
    month comes from B for inserts/updates and from A for deletes
    (x124's ``coalesce(b.dt, a.dt)`` rule).
    """
    a, b = _snapshot_a(orders), _snapshot_b(orders)
    j = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    kind = (
        F.when(F.col("a.k").isNull(), "insert")
        .when(F.col("b.k").isNull(), "delete")
        .when(F.col("a.units") != F.col("b.units"), "update")
    )
    return (
        j.select(
            kind.alias("change_kind"),
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
            F.date_format(
                F.coalesce(F.col("b.dt"), F.col("a.dt")), "yyyy-MM"
            ).alias("file_id"),
        )
        .filter(F.col("change_kind").isNotNull())
    )


def bootstrap(orders: DataFrame, target_dir: str) -> None:
    """Write version 0: snapshot A's manifest, nothing affected yet."""
    _snapshot_a(orders).select(
        F.date_format("dt", "yyyy-MM").alias("file_id")
    ).groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.lit(0).cast("bigint").alias("n_changed"),
    ).write.mode("overwrite").parquet(_vdir(target_dir, 0))


def worklist_apply(
    spark: SparkSession, batch_df: DataFrame, target_dir: str, batch_id: int
) -> None:
    """Fold ONE micro-batch of change events into the ledger.

    Reads snapshot ``batch_id``, writes snapshot ``batch_id + 1`` — the
    version-from-batch-id rule that makes replays idempotent. Separated
    from the stream wiring (the novelty_ingest discipline): testable
    batch-by-batch, reusable from any incremental driver.
    """
    deltas = batch_df.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_changed"),
        F.sum(
            F.when(F.col("change_kind") == "insert", 1)
            .when(F.col("change_kind") == "delete", -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("d_rows"),
    )
    prev = spark.read.parquet(_vdir(target_dir, batch_id))
    m = prev.alias("t").join(
        deltas.alias("d"), F.col("t.file_id") == F.col("d.file_id"), "full_outer"
    )
    merged = m.select(
        F.coalesce(F.col("t.file_id"), F.col("d.file_id")).alias("file_id"),
        (
            F.coalesce(F.col("t.n_rows"), F.lit(0))
            + F.coalesce(F.col("d.d_rows"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_rows"),
        (
            F.coalesce(F.col("t.n_changed"), F.lit(0))
            + F.coalesce(F.col("d.d_changed"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_changed"),
    )
    merged.write.mode("overwrite").parquet(_vdir(target_dir, batch_id + 1))


def current_state(spark: SparkSession, target_dir: str) -> DataFrame:
    """The highest-version ledger snapshot."""
    versions = sorted(
        int(d[1:]) for d in os.listdir(target_dir) if d.startswith("v")
    )
    return spark.read.parquet(_vdir(target_dir, versions[-1]))


def final_view(state: DataFrame) -> DataFrame:
    """Project the ledger to x124's output schema.

    Months whose rows were all deleted drop out (x124's manifest only
    lists partitions present in B), matching its LEFT JOIN from the B
    manifest.
    """
    return (
        state.filter(F.col("n_rows") > 0)
        .select(
            "file_id",
            "n_rows",
            "n_changed",
            (F.col("n_changed") > 0).alias("affected"),
        )
        .orderBy("file_id")
    )


def start_worklist_apply(
    spark: SparkSession,
    changes_stream: DataFrame,
    workdir: str,
    orders_df: DataFrame,
    trigger_available_now: bool = True,
):
    """Wire :func:`worklist_apply` as a foreachBatch streaming query.

    ``workdir`` gets ``target`` (versioned ledgers, v00000 bootstrapped
    from ``orders_df``'s snapshot A) and ``ckpt`` subdirectories.
    """
    target = os.path.join(workdir, "target")
    ckpt = os.path.join(workdir, "ckpt")
    if not os.path.isdir(_vdir(target, 0)):
        bootstrap(orders_df, target)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        worklist_apply(spark, batch_df, target, batch_id)

    w = (
        changes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
