"""Sessionized / windowed event analytics (X5) over the ``events`` table.

The reference has no time-series surface (SURVEY.md §2.9: streaming and
window vocabulary absent); these are the north-star event operators:
gap-based sessionization, tumbling/sliding time windows, and per-session
rollups. The streaming twins (same logic via ``readStream`` +
``session_window``/``window`` + watermark) live in
``ask_duckdb_spark.streaming``.

Scale posture (100 TB of events):
- sessionization shuffles once on ``user_id`` (the natural partition
  key); everything after the shuffle is window functions over sorted
  runs — no second shuffle for the cumulative session id;
- tumbling/sliding windows are map-side-combinable groupBys keyed on
  (bucket) or (bucket, type) — bounded state per key;
- nothing here collects or sorts globally except the final display
  ORDER BY, which TakeOrderedAndProject bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ._util import floor_round, floor_round_sql, unpersist_with
from .registry import query

SESSION_GAP_MIN = 30  # minutes of inactivity that closes a session


def with_session_no(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Tag each event with a per-user session number (1-based).

    Gap rule: an event starts a new session when it is ``>= gap_min``
    minutes after the previous event of the same user (matching Spark's
    ``session_window`` half-open ``[start, last+gap)`` semantics).
    One shuffle on user_id; the lag + cumulative-sum windows reuse the
    same partitioning, so Catalyst plans a single exchange.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros needs TIMESTAMP; ts is TIMESTAMP_NTZ — the cast is
    # wall-clock-identity under the pinned UTC session timezone.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | (us - prev_us >= gap_min * 60_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.withColumn("sess_no", F.sum(is_new).over(run))


_SESSION_CTE = f"""
    WITH tagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, value,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sess_no
      FROM tagged
    )
"""


@query(
    "x13_sessionize",
    oracle=_SESSION_CTE
    + """
    SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_value
    FROM sessions
    GROUP BY user_id, sess_no
    ORDER BY user_id, sess_no
    """,
)
def x13_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization → per-session rollup.

    total_value sums exact integer cents (the hashed float-aggregate
    class is order-dependent; cents are lossless on the 2-decimal
    fixture values)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(100) + F.lit(0.5)).cast("long")
    return (
        with_session_no(e)
        .groupBy("user_id", F.col("sess_no").cast("bigint").alias("sess_no"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("total_value"),
        )
        .orderBy("user_id", "sess_no")
    )


@query(
    "x14_session_window",
    oracle=_SESSION_CTE
    + """
    SELECT user_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, sess_no
    ORDER BY user_id, session_start
    """,
)
def x14_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same sessions via Spark's native ``session_window`` operator.

    ``F.session_window(ts, gap)`` is the batch form of the streaming
    session operator — at scale it is the idiomatic choice because the
    state-store implementation is shared with Structured Streaming.
    ``window.start`` equals the session's min(ts), which the oracle CTE
    reproduces with the lag/cumsum formulation — a differential check
    that the two formulations agree.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "x15_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def x15_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts per event type.

    ``F.window`` (not date_trunc) so the same expression ports verbatim
    to the streaming twin; hour windows are epoch-aligned so the oracle
    can use date_trunc.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(100) + F.lit(0.5)).cast("long")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "x16_sliding_window",
    oracle="""
    SELECT window_start, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
                            * 1000000) AS window_start
      FROM events
      UNION ALL
      SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
                             - 1800) * 1000000) AS window_start
      FROM events
    )
    GROUP BY 1
    ORDER BY 1
    """,
)
def x16_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows).

    The oracle expands the two covering windows per event explicitly
    (bucket grid at 30 min; width 60 min ⇒ exactly two starts cover any
    ts), which is precisely what Spark's ``window(ts, '1 hour',
    '30 minutes')`` generates internally.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
        .orderBy("window_start")
    )


@query(
    "x17_session_stats",
    oracle=_SESSION_CTE
    + """
    , per_session AS (
      SELECT user_id, sess_no,
             count(*) AS n_events,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM sessions GROUP BY user_id, sess_no
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_events,
           floor(CAST(sum(dur_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS avg_session_sec
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def x17_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session behavior profile (count / size / duration).

    Both aggregation levels share the user_id shuffle key, so the second
    groupBy is exchange-free after the first.
    """
    e = load_table(spark, sf_dir, "events")
    per_session = (
        with_session_no(e)
        .groupBy("user_id", "sess_no")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            ).alias("dur_us"),
        )
    )
    # Durations stay exact integer MICROSECONDS through the second
    # aggregation (a float avg is partition-order-dependent); the only
    # float ops are the identical closing sequence on both engines.
    avg_sec = (
        F.sum("dur_us").cast("double")
        / F.count("*").cast("double")
        / F.lit(1000000.0)
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.max("n_events").cast("bigint").alias("max_events"),
            (
                F.floor(avg_sec * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)
            ).alias("avg_session_sec"),
        )
        .orderBy("user_id")
    )


@query(
    "x52_funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.ts1
      WHERE e.event_type = 'click' GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.ts2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click_after,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_after
    """,
)
def x52_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: signup -> later click -> later purchase.

    Each stage is a conditional min-timestamp aggregation joined to the
    previous stage's users (strictly-after predicate as the join
    residual) — the product-analytics funnel as three keyed shuffles on
    user_id, which AQE/exchange reuse co-locates with each other at
    scale. Stage frames shrink monotonically, so each later join probes
    a smaller build side.
    """
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .alias("e")
        .join(s1.alias("s1"), "user_id")
        .filter(F.col("e.ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(s2.alias("s2"), "user_id")
        .filter(F.col("e.ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    c1 = s1.agg(F.count("*").cast("bigint").alias("n_signup"))
    c2 = s2.agg(F.count("*").cast("bigint").alias("n_click_after"))
    c3 = s3.agg(F.count("*").cast("bigint").alias("n_purchase_after"))
    return c1.join(F.broadcast(c2)).join(F.broadcast(c3))


# ---------------------------------------------------------------------------
# x94: retention cohort matrix — the staple product-analytics rollup the
# registry lacked: users grouped by first-activity week (their cohort),
# crossed with weeks-since-cohort, cell = distinct active users and the
# retention ratio against cohort size. Weeks are Monday-truncated in
# both engines (Spark date_trunc('week') and DuckDB date_trunc('week')
# agree); the offset is integer day-diff // 7 on already-aligned week
# starts, so every cell is exact integers with one rounded division.
# ---------------------------------------------------------------------------


@query(
    "x94_retention_cohorts",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1
    ), act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events
    ), sz AS (
      SELECT cohort_week, count(*) AS cohort_size FROM firsts GROUP BY 1
    ), m AS (
      SELECT f.cohort_week,
             CAST((a.act_week - f.cohort_week) // 7 AS INTEGER)
               AS week_offset,
             CAST(count(*) AS BIGINT) AS n_active
      FROM act a JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT m.cohort_week, m.week_offset, m.n_active,
           CAST(sz.cohort_size AS BIGINT) AS cohort_size,
           {floor_round_sql("CAST(m.n_active AS DOUBLE) / sz.cohort_size", 6)}
             AS retention
    FROM m JOIN sz USING (cohort_week)
    ORDER BY 1, 2
    """,
)
def x94_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort matrix over the events table.

    cohort(user) = Monday-truncated week of the user's FIRST event;
    cell (cohort_week, week_offset) counts the cohort's users active
    in that later week; retention divides by cohort size. week_offset 0
    is by construction retention 1.0 (every user is active in their
    first week) — a built-in sanity diagonal the tests pin.

    Scale (100 TB): first-touch and the distinct (user, week) activity
    frame are user-keyed, map-side-combinable aggregations; the
    cohort join is user-keyed (never broadcast — users scale with the
    data); the only broadcast is the cohort-size frame, whose
    cardinality is the number of WEEKS in the retention horizon —
    bounded by the calendar, not the data. The matrix itself is
    (weeks x weeks)/2 cells: tiny forever.
    """
    e = load_table(spark, sf_dir, "events")
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    firsts = e.groupBy("user_id").agg(
        wk(F.min("ts")).alias("cohort_week")
    )
    act = e.select(
        "user_id", wk(F.col("ts")).alias("act_week")
    ).distinct()
    sz = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    m = (
        act.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    return (
        m.join(F.broadcast(sz), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            floor_round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# x97: watermark late-data audit. Before setting a Structured Streaming
# watermark delay, measure what it would DROP: an event is late-beyond-
# watermark when its ts lags the running max event-time of its stream
# partition (arrival order = event_id, the ingest sequence) by more
# than the delay. Streams track watermarks per partition (the global
# watermark is the min of partition maxima), so the audit partitions
# by event_type — the same keying streaming/events.py uses.
# ---------------------------------------------------------------------------

#: Audit delay: 10 minutes, the x13/x14 sessionization gap constant.
LATE_DELAY_S = 600


@query(
    "x97_late_event_audit",
    oracle=f"""
    WITH w AS (
      SELECT event_type, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS wm_high
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ts < wm_high - INTERVAL {LATE_DELAY_S} SECOND
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           floor(CAST(sum(CASE WHEN ts < wm_high
                                    - INTERVAL {LATE_DELAY_S} SECOND
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS late_ratio
    FROM w GROUP BY 1 ORDER BY 1
    """,
)
def x97_late_event_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of events a 10-minute watermark would drop, per type.

    The running high-water mark is ``max(ts)`` over all PRIOR arrivals
    (event_id order) within the event_type partition; an event whose
    ts trails it by more than LATE_DELAY_S would arrive behind the
    watermark and be discarded by a streaming aggregation. The first
    arrival has no prior max (NULL window) and is never late — both
    engines NULL-propagate the comparison to false. Timestamp compares
    are exact; the single division is rounded once.

    Fixture note: the synthetic events are generated in ts order
    (verified: zero out-of-order rows), so the registered entry reads
    all-zero late counts — the TRUE answer for an ordered ingest, and
    the diagnostic a pipeline wants before trusting a tight watermark.
    The disorder branch is pinned by tests/fuzz on day-scale-shuffled
    event streams (tests/test_fuzz_differential.py spread_events).

    Scale (100 TB): one event_type-keyed window — the same shuffle any
    per-stream-partition stateful op pays; no joins, no broadcast.
    Arrival order at 100 TB is the ingest log's order within partition,
    exactly what the window models. Skewed event types split by the
    same salting x26 demonstrates if one type dominates.
    """
    e = load_table(spark, sf_dir, "events")
    wm = F.max("ts").over(
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    late = (
        F.col("ts").cast("timestamp")
        < F.col("wm_high").cast("timestamp") - F.expr(
            f"INTERVAL {LATE_DELAY_S} SECOND"
        )
    )
    return (
        e.select("event_type", "ts", wm.alias("wm_high"))
        .select(
            "event_type",
            F.when(late, 1).otherwise(0).alias("is_late"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("is_late").cast("bigint").alias("n_late"),
            (
                F.floor(
                    F.sum("is_late").cast("double")
                    / F.count("*").cast("double")
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("late_ratio"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# x100: event-type transition matrix — the first-order Markov model of
# user behavior. Per user, order events by time; count (prev_type ->
# type) transitions; normalize rows into probabilities. Funnels (x52)
# test ONE hypothesized path; the transition matrix surfaces every
# path and its mass, and is the input to next-event prediction,
# anomaly scoring, and journey clustering.
# ---------------------------------------------------------------------------


@query(
    "x100_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           floor(CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS p
    FROM t ORDER BY from_type, to_type
    """,
)
def x100_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts and row-normalized probabilities.

    ``lag(event_type)`` over (ts, event_id) within each user — the
    event_id tiebreak makes simultaneous-timestamp ordering total, so
    both engines see the same sequence; each user's first event has no
    predecessor and contributes no transition. Counts are exact
    integers; the row normalization is one division per cell over the
    |types|^2 matrix, rounded once.

    Scale (100 TB): one user-keyed window shuffle (the sessionization
    exchange — reusable when chained after x13), then a (from, to)-
    keyed count whose key space is |event types|^2 — the word-count
    shape collapsing to a tiny matrix; the row-sum window runs on that
    matrix, not the corpus. Nothing here grows with the data except
    the linear scan.
    """
    e = load_table(spark, sf_dir, "events")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        F.col("prev_type").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    return t.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        (
            F.floor(
                F.col("n").cast("double")
                / F.sum("n").over(W.partitionBy("from_type")).cast("double")
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("p"),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# x102: journey surprisal — score each user's behavior against the
# corpus transition model (x100). A user whose transitions are all
# high-probability cells scores near 0; one taking rare paths scores
# high — the behavioral-anomaly ranking (bot detection, abuse triage).
# Surprisal is integer-quantized exactly as x93: floor(log2(row_total
# / cell_count)) bits via binary-string length — no float log, so the
# oracle is hash-exact.
# ---------------------------------------------------------------------------


@query(
    "x102_journey_surprisal",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), tr AS (
      SELECT user_id, prev_type AS f, event_type AS t
      FROM seq WHERE prev_type IS NOT NULL
    ), cell AS (
      SELECT f, t, count(*) AS c FROM tr GROUP BY 1, 2
    ), rowt AS (
      SELECT f, sum(c) AS rt FROM cell GROUP BY 1
    )
    SELECT tr.user_id,
           CAST(count(*) AS BIGINT) AS n_trans,
           CAST(sum(length(bin(rowt.rt // cell.c)) - 1) AS BIGINT)
             AS sum_surprisal,
           floor(CAST(sum(length(bin(rowt.rt // cell.c)) - 1) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_surprisal
    FROM tr JOIN cell USING (f, t) JOIN rowt USING (f)
    GROUP BY 1 ORDER BY 1
    """,
)
def x102_journey_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user mean transition surprisal under the corpus Markov model.

    surprisal(f->t) = floor(log2(rowtotal(f) / count(f->t))) bits —
    the most common next step from f costs ~0, a once-seen transition
    ~log2(row mass). Pure BIGINT arithmetic (x93's binary-length
    trick), one rounded division at the edge. Composes x100's matrix
    without rebuilding semantics: the model is fit on the SAME corpus
    being scored (the usual anomaly-ranking setup; a two-corpus
    fit/score split changes only which frame feeds `cell`).

    Scale (100 TB): the sequence window is the one user-keyed shuffle;
    the model (cell + rowt) collapses to |types|^2 rows and BROADCASTS
    back onto the transition stream — scoring is then a narrow map
    plus the user-keyed rollup. Nothing in the join path grows beyond
    the linear scan.
    """
    e = load_table(spark, sf_dir, "events")
    tr = (
        e.select(
            "user_id",
            F.col("event_type").alias("t"),
            F.lag("event_type")
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("f"),
        )
        .filter(F.col("f").isNotNull())
    )
    cell = tr.groupBy("f", "t").agg(F.count("*").alias("c"))
    rowt = cell.groupBy("f").agg(F.sum("c").alias("rt"))
    model = cell.join(rowt, "f")
    surp = F.length(F.bin(F.expr("rt DIV c"))) - F.lit(1)
    return (
        tr.join(F.broadcast(model), ["f", "t"])
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trans"),
            F.sum(surp).cast("bigint").alias("sum_surprisal"),
        )
        .select(
            "user_id",
            "n_trans",
            "sum_surprisal",
            (
                F.floor(
                    F.col("sum_surprisal").cast("double")
                    / F.col("n_trans").cast("double")
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("mean_surprisal"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# x104: robust dispersion + outlier report per event type. Mean/stddev
# (g12) are wrecked by the very outliers a monitor hunts; the robust
# pair is median and MAD (median absolute deviation), with the
# standard 1.4826 consistency factor making 3-sigma-equivalent robust
# z-scores. Engine-exact because percentile() == quantile_cont()
# bit-for-bit (proven by g9/g15 since r2): the median is identical on
# both sides, so deviations — and the deviation median — are too.
# ---------------------------------------------------------------------------

MAD_K = 1.4826  # consistency factor: MAD*K estimates sigma under normality


@query(
    "x104_value_mad",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ), dev AS (
      SELECT e.event_type, e.value, med.med,
             abs(e.value - med.med) AS ad
      FROM events e JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n,
           {floor_round_sql("dev.med", 6)} AS med,
           {floor_round_sql("mad.mad", 6)} AS mad,
           CAST(sum(CASE WHEN dev.ad > 3 * {MAD_K} * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY 1, 3, 4 ORDER BY 1
    """,
)
def x104_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / MAD / robust-z outlier counts per event type.

    Two grouped percentile passes (median of values, then median of
    absolute deviations) joined back on the tiny per-type frames —
    both joins broadcast |event types| rows. An event is an outlier
    when its deviation exceeds 3 * 1.4826 * MAD (the robust
    three-sigma rule). A MAD of 0 (over half the group at one value)
    flags every other value — the correct degenerate reading.

    Scale (100 TB): exact percentile shuffles the value column per
    type (sort-based aggregate) twice; when that is too hot, g9's
    documented swap to approx_percentile turns both passes into
    mergeable sketches. The outlier count itself is a narrow map over
    the broadcast med/mad.
    """
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    # r13: persist — dev feeds BOTH the mad percentile pass and the
    # final rollup; unpersisted, each consumer re-ran the events scan
    # AND the med percentile aggregate buried in dev's lineage (the
    # r13 sweep clocked this operator ~10 s at sf0.1, ~half of it
    # recompute). ~24 B/row, spills to disk at scale; released via
    # unpersist_with.
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    ).persist()
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return unpersist_with(
        dev.join(F.broadcast(mad), "event_type")
        .groupBy(
            "event_type",
            floor_round(F.col("med"), 6).alias("med"),
            floor_round(F.col("mad"), 6).alias("mad"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.col("ad") > 3 * MAD_K * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select("event_type", "n", "med", "mad", "n_outliers")
        .orderBy("event_type"),
        dev,
    )


# ---------------------------------------------------------------------------
# x107: exponentially-weighted user engagement (EWMA). The standard
# recency-weighted feature a ranking/abuse model consumes: fold each
# user's value sequence in time order with s <- alpha*v + (1-alpha)*s.
# Float folds are order-dependent — which is fine ONLY because both
# engines fold the SAME explicitly-ordered array (collect + sort by
# (ts, event_id), then a left fold: the x5/x105 fixed-order
# discipline), so the oracle is hash-exact.
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3


@query(
    "x107_user_ewma",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY 1
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_events,
           {floor_round_sql("vs[len(vs)]", 6)} AS last_value,
           {floor_round_sql(
               f"list_reduce(vs, (s, v) -> {EWMA_ALPHA} * v"
               f" + {1 - EWMA_ALPHA} * s)", 6)} AS ewma
    FROM seq ORDER BY user_id
    """,
)
def x107_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted value per user: EWMA over the time-ordered
    event sequence (alpha = 0.3; seeded with the first value, the
    list_reduce/aggregate convention both engines share).

    Scale (100 TB): one user-keyed shuffle collecting each user's
    values — the same exchange sessionization pays — then a narrow
    per-row fold. Per-user state is the user's OWN events (bounded by
    per-user activity, not corpus size); a whale user with millions of
    events takes the streaming form instead (streaming/stateful.py's
    running-totals machine generalizes to EWMA with one state double,
    O(1) memory, no collected array).
    """
    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ),
            lambda s: s["value"],
        ).alias("vs")
    )
    fold = F.aggregate(
        F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at(F.col("vs"), 1),
        lambda s, v: F.lit(EWMA_ALPHA) * v + F.lit(1 - EWMA_ALPHA) * s,
    )
    return seq.select(
        "user_id",
        F.size("vs").cast("bigint").alias("n_events"),
        floor_round(F.element_at("vs", -1), 6).alias("last_value"),
        floor_round(fold, 6).alias("ewma"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# x109/x110/x111: the remaining staple event analytics — session-scoped
# transitions (x100 crosses session boundaries; a journey model often
# must not), inter-arrival-time percentiles (capacity planning and bot
# signatures), and signup->purchase conversion-time percentiles (the
# product KPI). All exact: integer microsecond gaps + the proven
# percentile()/quantile_cont equivalence (g9, r2).
# ---------------------------------------------------------------------------


@query(
    "x109_session_transitions",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, event_type,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sess_no
      FROM tagged
    ), seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id, sess_no
                                   ORDER BY ts, event_id) AS prev_type
      FROM sessions
    )
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def x109_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x100 with the session boundary respected: the first event of a
    session has no predecessor, so cross-session "transitions" (often
    hours apart, behaviorally meaningless) never count. Same exchanges
    as x13 + one matrix-keyed count; the session tagging reuses
    ``with_session_no`` verbatim, so x13/x109 share semantics by
    construction."""
    e = load_table(spark, sf_dir, "events")
    seq = with_session_no(e).select(
        "event_type",
        F.lag("event_type")
        .over(
            W.partitionBy("user_id", "sess_no").orderBy("ts", "event_id")
        )
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    return (
        seq.groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("from_type", "to_type")
    )


@query(
    "x110_interarrival_percentiles",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           floor(quantile_cont(gap_us, 0.5) / 1e6 * 1000000.0 + 0.5)
             / 1000000.0 AS p50_sec,
           floor(quantile_cont(gap_us, 0.9) / 1e6 * 1000000.0 + 0.5)
             / 1000000.0 AS p90_sec
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def x110_interarrival_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Median and p90 inter-arrival time per event type (same-user
    consecutive events of that type). Gaps are exact integer
    microseconds; the percentiles interpolate identically in both
    engines (g9's proven pairing). A p50 collapsing toward 0 is the
    bot signature; p90 growth is the engagement-decay signal.

    Scale: one (user, type)-keyed window then a type-keyed percentile
    aggregate — x13's exchange inventory."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "event_type",
        (
            us
            - F.lag(us).over(
                W.partitionBy("user_id", "event_type").orderBy(
                    "ts", "event_id"
                )
            )
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").cast("bigint").alias("n_gaps"),
            F.expr(
                "floor(percentile(gap_us, 0.5) / 1e6 * 1e6 + 0.5) / 1e6"
            ).alias("p50_sec"),
            F.expr(
                "floor(percentile(gap_us, 0.9) / 1e6 * 1e6 + 0.5) / 1e6"
            ).alias("p90_sec"),
        )
        .orderBy("event_type")
    )


@query(
    "x111_conversion_time",
    oracle="""
    WITH s AS (
      SELECT user_id, min(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.s_us
      GROUP BY 1
    ), d AS (
      SELECT s.user_id, p.p_us - s.s_us AS delta_us
      FROM s LEFT JOIN p USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_signup,
           CAST(count(delta_us) AS BIGINT) AS n_converted,
           floor(CAST(count(delta_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS conversion_rate,
           floor(quantile_cont(delta_us, 0.5) / 1e6 * 1000000.0 + 0.5)
             / 1000000.0 AS p50_sec,
           floor(quantile_cont(delta_us, 0.9) / 1e6 * 1000000.0 + 0.5)
             / 1000000.0 AS p90_sec
    FROM d
    """,
)
def x111_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> first-purchase-after conversion rate and time
    percentiles. First-touch frames are user-keyed min-aggregates; the
    strictly-after constraint uses the signup time INSIDE the join
    (x52's staged-funnel discipline), so a purchase predating signup
    never counts. Never-converting users stay in the denominator via
    the left join and are ignored by the percentile (NULL delta).

    Scale: two filtered user-keyed aggregates + one user join + a
    single global percentile over |converted| deltas — at 100 TB the
    percentile swaps to approx_percentile exactly as g9 documents."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    s = (
        e.filter(F.col("event_type") == "signup")
        .select("user_id", us.alias("us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("s_us"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("p_us0"))
        .join(s, "user_id")
        .filter(F.col("p_us0") > F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("p_us0").alias("p_us"))
    )
    d = s.join(p, "user_id", "left").select(
        (F.col("p_us") - F.col("s_us")).alias("delta_us")
    )
    fr6 = lambda c: (  # noqa: E731 — portable floor-round, both engines
        F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    )
    return d.agg(
        F.count("*").cast("bigint").alias("n_signup"),
        F.count("delta_us").cast("bigint").alias("n_converted"),
        fr6(
            F.count("delta_us").cast("double") / F.count("*").cast("double")
        ).alias("conversion_rate"),
        F.expr(
            "floor(percentile(delta_us, 0.5) / 1e6 * 1e6 + 0.5) / 1e6"
        ).alias("p50_sec"),
        F.expr(
            "floor(percentile(delta_us, 0.9) / 1e6 * 1e6 + 0.5) / 1e6"
        ).alias("p90_sec"),
    )
