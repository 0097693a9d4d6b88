"""Streaming twins of the batch event analytics (X5, SURVEY.md §2.9).

Each builder takes a *streaming* DataFrame of events (``readStream``)
and returns the transformed streaming frame; callers attach their own
``writeStream`` sink. The transformations are exactly the batch
operators' expressions — ``F.window`` / ``F.session_window`` are the
same function in both modes, which is why the batch operators
(operators/sessionize.py) deliberately used them instead of
``date_trunc``.

Scale/state posture (100 TB/day of events):
- every aggregation is preceded by ``withWatermark`` so the state store
  evicts closed windows — bounded state, no OOM-by-history;
- session windows merge per (user_id, gap) in the state store — the
  same single-shuffle shape as the batch window formulation;
- ``foreachBatch``-free: sinks stay append/update-mode compatible.

The micro-batch tests (tests/test_streaming.py) run these against a
bounded memory source and assert parity with the batch operators on
the same fixture slice — differential testing across execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Late-data tolerance. Fixture events are in-order; production would
#: size this from observed event-time skew.
DEFAULT_WATERMARK = "10 minutes"
SESSION_GAP = "30 minutes"  # matches operators.sessionize.SESSION_GAP_MIN


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarkable event-time column (TIMESTAMP, not NTZ).

    Watermarks require TimestampType; the batch catalog normalizes
    ``ts`` to TIMESTAMP_NTZ, and under the pinned UTC session timezone
    the cast is wall-clock identity (see sources/catalog.py).
    """
    return events.withColumn("event_time", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of x15: hourly tumbling counts per event type."""
    return (
        _with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            # exact integer cents, mirroring batch x15 (order-independent
            # across micro-batches, unlike a float sum)
            (
                F.sum(
                    F.floor(F.col("value") * F.lit(100) + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("double")
                / F.lit(100.0)
            ).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of x16: 1-hour windows sliding every 30 minutes."""
    return (
        _with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour", "30 minutes"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


def dedup_events(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    The streaming twin of X1: ``dropDuplicatesWithinWatermark`` keeps
    one row per key and — unlike plain ``dropDuplicates`` on a stream —
    EVICTS each key's state once the watermark passes it, so state is
    bounded by the duplicate-arrival horizon instead of growing with
    the whole stream. This is the ingest-side dedup of a training-data
    pipeline (re-delivered events, at-least-once sources).
    """
    return (
        _with_event_time(events)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def session_rollup(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of x14: gap-based sessions per user.

    ``session_window`` merges overlapping [event, event+gap) intervals
    in the state store; the watermark closes (and evicts) sessions once
    event time passes start+gap+watermark.
    """
    return (
        _with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy("user_id", F.session_window("event_time", SESSION_GAP))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


def purchases_after_clicks(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-stream interval join: purchases within 30 min of a click.

    The attribution join — two watermarked streams (clicks, purchases)
    of the SAME source joined per user with an event-time range
    constraint. Structured Streaming derives the state-retention bound
    from watermark + interval: a click is held in the join state only
    until the purchase-side watermark passes click_time + 30 min, so
    state is bounded by the (watermark + interval) window however long
    the streams run — the requirement for a stream-stream join to be
    deployable at all (Spark refuses inner interval joins without
    watermarks on both sides for exactly this reason).
    """
    e = _with_event_time(events)
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", watermark)
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_time").alias("purchase_time"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_time", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user AND
            purchase_time > click_time AND
            purchase_time <= click_time + INTERVAL 30 MINUTES
            """
        ),
    ).select(
        "click_id", "purchase_id", F.col("c_user").alias("user_id"),
        "click_time", "purchase_time", "purchase_value",
    )


def write_tumbling_counts_idempotent(
    events: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Exactly-once FILE sink: foreachBatch + dynamic partition overwrite.

    The production pattern for streaming into a columnar lake without a
    transactional table format: each micro-batch rewrites ONLY the
    partitions it touches (``partitionOverwriteMode=dynamic``), so a
    batch replayed after a crash overwrites its own previous output
    instead of duplicating it — idempotent writes + checkpointed
    offsets = effectively exactly-once end to end.

    The load-bearing detail: the overwrite unit must EQUAL the
    aggregation key. Update-mode batches carry only the groups that
    changed, so overwriting any coarser partition (a whole date, say)
    would delete that partition's unchanged groups; partitioning by
    (window_start, event_type) makes every dynamic overwrite replace
    exactly the one row it supersedes — upsert-by-key on plain parquet.
    State stays bounded by the watermark. Returns the StreamingQuery.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start", "event_type")
            .parquet(out_dir)
        )

    return (
        tumbling_counts(events)
        .writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enrich_with_customer_dim(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a dimension.

    The static side re-resolves per micro-batch (a slowly-changing dim
    picks up updates between batches for free) and needs no watermark —
    only stream-stream joins hold join state. At 100 TB/day the static
    side is a broadcast dim exactly as in batch; the stream side never
    shuffles for the join.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return _with_event_time(events).join(F.broadcast(dim), "user_id")
