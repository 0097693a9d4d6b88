"""Introspection S3/S4/S5 against live fixture tables."""

from __future__ import annotations

import pytest

from ask_duckdb_spark.introspect import (
    build_tbl_schema,
    describe_columns,
    list_columns,
    run_param_sql,
    table_exists,
)
from ask_duckdb_spark.sources.catalog import load_table
from tests.conftest import SF_DIR


def test_describe_and_ddl_string(spark):
    df = load_table(spark, SF_DIR, "region")
    cols = describe_columns(df)
    assert cols == [
        {"name": "r_regionkey", "type": "INT"},
        {"name": "r_name", "type": "STRING"},
    ]
    assert build_tbl_schema(df) == "r_regionkey INT, r_name STRING"
    assert list_columns(df) == ["r_regionkey", "r_name"]


def test_table_exists_case_insensitive(spark):
    load_table(spark, SF_DIR, "region").createOrReplaceTempView("region")
    assert table_exists(spark, "region")
    assert table_exists(spark, "REGION")  # S3: case-insensitive resolution
    assert not table_exists(spark, "no_such_table")


def test_param_sql_positional(spark):
    load_table(spark, SF_DIR, "region").createOrReplaceTempView("region")
    df = run_param_sql(
        spark, "SELECT r_name FROM region WHERE r_regionkey = ?", args=[2]
    )
    assert df.count() == 1


def test_param_sql_named(spark):
    load_table(spark, SF_DIR, "region").createOrReplaceTempView("region")
    df = run_param_sql(
        spark, "SELECT r_name FROM region WHERE r_regionkey = :k", args={"k": 2}
    )
    assert df.count() == 1


def test_param_sql_no_args_passthrough(spark):
    assert run_param_sql(spark, "SELECT 1 AS x").collect()[0].x == 1


def test_summarize_table_shape_and_values(spark):
    from ask_duckdb_spark.introspect import summarize_table
    from ask_duckdb_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    out = summarize_table(ev).collect()
    assert [r["column_name"] for r in out] == ev.columns
    by_col = {r["column_name"]: r for r in out}
    n = ev.count()
    assert all(r["count"] == n for r in out)
    # numeric column gets avg/std; string column does not
    assert by_col["value"]["avg"] is not None
    assert by_col["event_type"]["avg"] is None
    # min/max are exact
    assert by_col["event_type"]["min"] == "click"
    assert float(by_col["value"]["null_percentage"]) == 0.0


def test_summarize_is_single_pass(spark):
    """One aggregation over the scan — never a per-column scan loop."""
    from ask_duckdb_spark.introspect import summarize_table
    from ask_duckdb_spark.plans import checks
    from ask_duckdb_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    out = summarize_table(load_table(spark, SF_DIR, "events"))
    plan = checks.formatted_plan(out)
    # one scan appears twice in a formatted plan (tree node + detail
    # section); a per-column scan loop would add two more per column
    assert plan.lower().count("scan parquet") <= 2
