"""Table profiling: the data-quality audit surface (x103).

The reference's DESCRIBE (describe_table.py:12-51) reports the
SCHEMA; a 100 TB ingest additionally needs the DATA profiled — null
rates, exact cardinalities, ranges — before any pipeline decision
(join-key choice, partition column, quality thresholds). x103 is that
profiler as a single-pass aggregation: ONE scan computes every
column's (n_null, n_distinct, min, max) simultaneously, then a
``stack`` unpivots the one-row result into a row per column — no
per-column rescan (the naive profiler is |columns| scans; at 100 TB
that is |columns| x the job).

Numeric min/max surface as DOUBLE, string/timestamp min/max as
VARCHAR (ISO timestamps render identically in both engines); the
off-type slots are NULL. Exact distinct counts (not HLL) because the
profile IS the oracle-checked contract; g10 demonstrates the sketch
variant for when estimates suffice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query

#: (column, kind) of the profiled table — lineitem, the biggest
#: fixture table. kind drives which min/max slot each column fills.
PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "txt"),
    ("l_linestatus", "txt"),
    ("l_shipdate", "txt"),
)


def _profile_oracle() -> str:
    aggs = ["count(*) AS n_rows"]
    picks = []
    for c, kind in PROFILE_COLS:
        aggs.append(f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}")
        aggs.append(f"count(DISTINCT {c}) AS nd_{c}")
        if kind == "num":
            aggs.append(f"CAST(min({c}) AS DOUBLE) AS mn_{c}")
            aggs.append(f"CAST(max({c}) AS DOUBLE) AS mx_{c}")
        else:
            aggs.append(f"CAST(min({c}) AS VARCHAR) AS mn_{c}")
            aggs.append(f"CAST(max({c}) AS VARCHAR) AS mx_{c}")
    for c, kind in PROFILE_COLS:
        mn_num = f"mn_{c}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mx_num = f"mx_{c}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mn_txt = f"mn_{c}" if kind == "txt" else "CAST(NULL AS VARCHAR)"
        mx_txt = f"mx_{c}" if kind == "txt" else "CAST(NULL AS VARCHAR)"
        picks.append(
            f"SELECT '{c}' AS col_name, CAST(n_rows AS BIGINT) AS n_rows, "
            f"CAST(nn_{c} AS BIGINT) AS n_null, "
            f"CAST(nd_{c} AS BIGINT) AS n_distinct, "
            f"{mn_num} AS min_num, {mx_num} AS max_num, "
            f"{mn_txt} AS min_txt, {mx_txt} AS max_txt FROM a"
        )
    union = "\nUNION ALL\n".join(picks)
    return f"""
    WITH a AS MATERIALIZED (
      SELECT {', '.join(aggs)} FROM lineitem
    )
    SELECT * FROM ({union}) ORDER BY col_name
    """


@query("x103_column_profile", oracle=_profile_oracle())
def x103_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of every lineitem column.

    All aggregates ride a single groupBy-less aggregation (Spark plans
    the multiple exact count(DISTINCT)s via expand — one scan, wider
    shuffle rows); ``stack`` then unpivots the 1-row result. The
    timestamp column casts through VARCHAR identically in both engines
    ('YYYY-MM-DD HH:MM:SS'); VARCHAR min/max is byte-order on ASCII
    fixture values.

    Scale (100 TB): the expand for k exact distinct aggregates
    multiplies shuffle volume by k — acceptable for a profiler run
    once per snapshot; swap count_distinct for approx_count_distinct
    (g10's sketch) when estimates suffice and the expand disappears.
    The unpivot is driver-free and touches |columns| rows.
    """
    df = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c, kind in PROFILE_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long"))
            .cast("bigint")
            .alias(f"nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"nd_{c}"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"mx_{c}"))
    one = df.agg(*aggs)
    parts = []
    for c, kind in PROFILE_COLS:
        mn_num = f"mn_{c}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mx_num = f"mx_{c}" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mn_txt = f"mn_{c}" if kind == "txt" else "CAST(NULL AS STRING)"
        mx_txt = f"mx_{c}" if kind == "txt" else "CAST(NULL AS STRING)"
        parts.append(
            f"'{c}', nn_{c}, nd_{c}, {mn_num}, {mx_num}, {mn_txt}, {mx_txt}"
        )
    stack = (
        f"stack({len(PROFILE_COLS)}, {', '.join(parts)}) AS "
        "(col_name, n_null, n_distinct, min_num, max_num, min_txt, max_txt)"
    )
    return (
        one.selectExpr("n_rows", stack)
        .select(
            "col_name",
            "n_rows",
            "n_null",
            "n_distinct",
            "min_num",
            "max_num",
            "min_txt",
            "max_txt",
        )
        .orderBy("col_name")
    )
