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
