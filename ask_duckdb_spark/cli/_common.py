"""Shared CLI plumbing: session/source opening and the exit protocol."""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

from ..introspect import table_exists
from ..session import get_spark
from ..sources.catalog import TABLES, register_views

EXIT_OPEN_FAIL = 1
EXIT_MISSING = 2
EXIT_LLM_FAIL = 3
EXIT_SQL_FAIL = 4

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def fail(code: int, message: str) -> None:
    print(message, file=sys.stderr)
    sys.exit(code)


def open_source(sf_dir: str, app: str) -> SparkSession:
    """Open the Parquet directory read-only (exit 1 on failure).

    Analogue of ``duckdb.connect(path, read_only=True)`` (reference:
    query_db.py:63-68): any table that exists on disk is registered as
    a temp view; a missing directory or zero readable tables is an
    open failure.
    """
    if not os.path.isdir(sf_dir):
        fail(EXIT_OPEN_FAIL, f"Error opening data source '{sf_dir}': not a directory")
    present = tuple(
        t for t in TABLES if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    )
    if not present:
        fail(EXIT_OPEN_FAIL, f"Error opening data source '{sf_dir}': no tables found")
    spark = get_spark(app)
    try:
        register_views(spark, sf_dir, tables=present)
    except Exception as e:  # unreadable/corrupt files
        fail(EXIT_OPEN_FAIL, f"Error opening data source '{sf_dir}': {e}")
    return spark


def require_table(spark: SparkSession, table: str, sf_dir: str) -> None:
    """Exit 2 when the table is absent (reference: query_db.py:70-73)."""
    if not table_exists(spark, table):
        fail(EXIT_MISSING, f"Table '{table}' not found in {sf_dir}.")
