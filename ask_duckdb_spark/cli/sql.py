"""Direct SQL executor CLI (≈ reference query_db.py:53-76).

Example:
    python -m ask_duckdb_spark.cli.sql --sf-dir /root/testdata/sf0.001 \
        --table lineitem --query "SELECT count(*) AS n FROM lineitem"
"""

from __future__ import annotations

import argparse
import sys

from ..sources.display import display_result
from ..nl.repair import ensure_readonly
from ._common import DEFAULT_SF_DIR, EXIT_SQL_FAIL, open_source, require_table


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description="Execute an arbitrary SQL query against a Parquet table directory."
    )
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR,
                    help=f"Parquet table directory (default: {DEFAULT_SF_DIR})")
    ap.add_argument("--table", required=True,
                    help="Table name to validate before running (catches typos early)")
    ap.add_argument("--query", required=True, help="SQL query to execute")
    ap.add_argument("--max-rows", type=int, default=1000,
                    help="Max rows to print (default: 1000)")
    ap.add_argument("--explain", action="store_true",
                    help="Print the formatted physical plan instead of rows")
    ap.add_argument("--params",
                    help="JSON list/dict of parameters for ?/:name placeholders"
                         " (S4; injection-safe server-side binding)")
    ap.add_argument("--dialect", choices=["spark", "duckdb"], default="spark",
                    help="'duckdb' translates DuckDB-flavored SQL (arrow JSON"
                         " ops, list_* functions, //, strftime...) to Spark"
                         " SQL before execution")
    args = ap.parse_args(argv)
    if args.dialect == "duckdb":
        from ..nl.dialect_shim import to_spark_sql

        args.query = to_spark_sql(args.query)

    spark = open_source(args.sf_dir, "ask_duckdb_spark.sql")
    require_table(spark, args.table, args.sf_dir)

    try:
        ensure_readonly(args.query)  # the reference's read_only=True analogue
        if args.params:
            import json

            from ..introspect import run_param_sql

            df = run_param_sql(spark, args.query, json.loads(args.params))
        else:
            df = spark.sql(args.query)
        if args.explain:
            from ..plans.checks import formatted_plan

            print(formatted_plan(df))
            return
        display_result(df, max_rows=args.max_rows)
    except SystemExit:
        raise
    except Exception as e:
        print(f"[SQL execution failed] {e}", file=sys.stderr)
        sys.exit(EXIT_SQL_FAIL)


if __name__ == "__main__":
    main()
