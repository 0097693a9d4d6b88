"""Result display sinks — parity with the reference's output protocol.

The reference prints ``=== Query result (N rows) ===`` then a pandas
head capped at ``max_rows`` with a truncation notice (reference:
query_db.py:20-51, query_llm.py:397-412).

Scale posture: we never ``collect()`` an unbounded result. The row
count is computed engine-side (``df.count()``), and only ``limit(max_rows)``
rows cross the Arrow boundary to pandas — the exact analogue of the
reference's ``df.head(max_rows)`` display cap, but without materializing
the full result on the driver first.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame


def result_preview(df: DataFrame, max_rows: int = 1000, count: bool = True):
    """Return (total_rows or None, pandas preview of at most max_rows)."""
    total = df.count() if count else None
    pdf = df.limit(max_rows).toPandas()
    return total, pdf


def display_result(
    df: DataFrame, max_rows: int = 1000, count: bool = True, file=None
) -> int:
    """Print a result the way the reference does; return total rows."""
    file = file or sys.stdout
    total, pdf = result_preview(df, max_rows=max_rows, count=count)
    shown = len(pdf)
    total = shown if total is None else total
    print(f"=== Query result ({total} rows) ===", file=file)
    if total == 0:
        print("Empty DataFrame", file=file)
        return 0
    print(pdf.to_string(index=False), file=file)
    if total > shown:
        print(f"\n... truncated to first {shown} rows ...", file=file)
    return total
