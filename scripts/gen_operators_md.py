"""Generate OPERATORS.md — the one-line-per-operator inventory.

Usage: python scripts/gen_operators_md.py > OPERATORS.md
Pulls name, oracle status, module, and docstring headline straight
from the live registry so the doc can never drift from the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ask_duckdb_spark.operators import ORACLES, QUERIES  # noqa: E402


def headline(name: str, fn) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    if doc:
        return doc[0].rstrip(".")
    # undocumented one-liners: prettify the registry name
    return name.split("_", 1)[-1].replace("_", " ")


def main() -> None:
    print("# OPERATORS — registry inventory (auto-generated)\n")
    print(f"{len(QUERIES)} operators, {len(ORACLES)} with DuckDB oracle twins.")
    print("Regenerate: `python scripts/gen_operators_md.py > OPERATORS.md`\n")
    print("| Operator | Oracle | Module | What it does |")
    print("|---|---|---|---|")
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        module = fn.__module__.rsplit(".", 1)[-1]
        oracle = "sql" if name in ORACLES else "rows-only"
        print(f"| `{name}` | {oracle} | {module} | {headline(name, fn)} |")


if __name__ == "__main__":
    main()
