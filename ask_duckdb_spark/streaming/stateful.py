"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window``/``window`` cover the declarative cases (events.py);
this is the escape hatch for state machines Spark has no operator for.
The demo operator keeps per-user running totals across micro-batches —
deliberately simple so the test can prove the STATE plumbing (values
carried batch → batch, per-key isolation) by exact comparison with the
batch groupBy.

Scale posture: state is one (count, sum) pair per user — O(distinct
users) in the state store, partitioned by the grouping key, Arrow-
batched per key group. The pattern extends to arbitrary per-key state
machines (fraud scoring, session stitching with custom rules) without
leaving bounded memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the running state."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp,"
    " n_events bigint"
)
SESSION_STATE_SCHEMA = "start long, last long, n bigint"
SESSION_GAP_SEC = 30 * 60


def _session_machine(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-based session state machine with an event-time timeout.

    Open session = (start_us, last_us, count) in the state store. Each
    batch merges its events; a session CLOSES (emits one row) either
    when the watermark passes last+gap (timeout fires with no new
    data) or when a new event arrives more than the gap after ``last``.
    """
    (user_id,) = key

    def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )

    if state.hasTimedOut:  # watermark passed last+gap: close the session
        start_us, last_us, n = state.get
        state.remove()
        yield emit(start_us, last_us, n)
        return

    gap_us = SESSION_GAP_SEC * 1_000_000
    ts_us = pd.concat([pdf["event_time"] for pdf in pdfs]).astype("int64") // 1000
    ts_us = ts_us.sort_values()

    # Merge the batch against state as INTERVALS, not an ordered scan:
    # an event later than the watermark but older than the stored
    # session end (out-of-order across batches) must extend the open
    # session's interval (min start / max last), never drag its end
    # backward — the bug an in-order fold has. ``sessions`` stays a
    # gap-disjoint, start-sorted list of [start_us, last_us, n].
    sessions: list[list[int]] = []
    if state.exists:
        sessions.append(list(state.get))
    for t in ts_us:
        t = int(t)
        for s in sessions:
            if s[0] - gap_us < t < s[1] + gap_us:
                s[0], s[1], s[2] = min(s[0], t), max(s[1], t), s[2] + 1
                break
        else:
            sessions.append([t, t, 1])
            sessions.sort(key=lambda s: s[0])
        # an extension can bridge two neighbors: coalesce until disjoint
        i = 0
        while i < len(sessions) - 1:
            a, b = sessions[i], sessions[i + 1]
            if b[0] - a[1] < gap_us:
                a[0], a[1], a[2] = min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2]
                del sessions[i + 1]
            else:
                i += 1
    if not sessions:  # defensive: no state and an empty batch
        return
    for s in sessions[:-1]:  # gap-closed inside/behind the batch
        yield emit(s[0], s[1], s[2])
    start_us, last_us, n = sessions[-1]
    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_SEC * 1000)


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Custom gap-sessionization via ``applyInPandasWithState`` +
    EventTimeTimeout — the hand-rolled equivalent of
    ``session_window`` (events.py), for session rules the built-in
    operator can't express (per-user gaps, value-dependent splits...).
    Requires an ``event_time`` TIMESTAMP column and a watermark.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_machine,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in the state store.

    Emits the updated totals for every user seen in each micro-batch
    (update output mode); after the final batch the latest row per user
    equals the batch ``groupBy(user_id)`` aggregate exactly.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT_SCHEMA = "from_type string, to_type string, n bigint"
TRANSITION_STATE_SCHEMA = "last string"


def _transition_machine(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user first-order transition counter (x100's streaming twin).

    State is ONE string — the user's last seen event type — carried
    across micro-batches, so a transition spanning a batch boundary is
    counted exactly once; each batch emits its partial (from, to)
    counts and the downstream rollup sums them. Rows are ordered by
    (ts, event_id) within the batch, matching the batch operator's
    window ordering whenever the stream delivers batches in
    event-time order (the x86 novelty-ingest contract).
    """
    last = state.get[0] if state.exists else None
    chunks = list(pdfs)
    counts: dict[tuple[str, str], int] = {}
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for t in pdf["event_type"]:
            if last is not None:
                counts[(last, t)] = counts.get((last, t), 0) + 1
            last = t
    if last is not None:
        state.update((last,))
    if counts:
        yield pd.DataFrame(
            [
                {"from_type": f, "to_type": t, "n": n}
                for (f, t), n in counts.items()
            ]
        )


def transition_counts_stateful(events: DataFrame) -> DataFrame:
    """Streaming partial transition counts, one state string per user.

    Scale posture: state is O(distinct users) single strings; emission
    is O(|types|^2) per (user, batch) worst case — the word-count-
    shaped rollup downstream absorbs it. The pattern a clickstream
    pipeline runs continuously where x100 is the batch backfill.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _transition_machine,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
