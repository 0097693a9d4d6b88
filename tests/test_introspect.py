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
