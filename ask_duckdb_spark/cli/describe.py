"""Schema introspection CLI (≈ reference describe_table.py:12-51).

Prints the compact ``name TYPE, name TYPE`` DDL string used by the
prompt template — straight from ``df.schema``, no pandas munging.
"""

from __future__ import annotations

import argparse

from ..introspect import build_tbl_schema
from ._common import DEFAULT_SF_DIR, open_source, require_table


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description="Describe a table in a Parquet table directory."
    )
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR,
                    help=f"Parquet table directory (default: {DEFAULT_SF_DIR})")
    # The reference hard-codes 'queuedata' (describe_table.py:17); we
    # default to it but allow any registered table.
    ap.add_argument("--table", default="queuedata", help="Table name")
    ap.add_argument("--list", action="store_true",
                    help="List every registered table instead of describing one")
    ap.add_argument("--summarize", action="store_true",
                    help="Per-column statistics (min/max/approx-distinct/"
                         "avg/std/null%%) — the DuckDB SUMMARIZE analogue")
    args = ap.parse_args(argv)

    spark = open_source(args.sf_dir, "ask_duckdb_spark.describe")

    if args.list:  # S3 breadth: the catalog enumeration the reference
        # does through information_schema.tables (query_db.py:9-18)
        for tbl in sorted(t.name for t in spark.catalog.listTables()):
            print(tbl)
        return

    require_table(spark, args.table, args.sf_dir)

    if args.summarize:
        from ..introspect import summarize_table
        from ..sources.display import display_result

        display_result(
            summarize_table(spark.table(args.table)), max_rows=1000
        )
        return

    print("\n=== tbl_schema (for template) ===")
    print(build_tbl_schema(spark.table(args.table)))


if __name__ == "__main__":
    main()
