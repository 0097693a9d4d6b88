"""TPC-H join block on bucketed layout (VERDICT r9 item 6).

The r8/r9 scale-curve decomposition left q3/q5/q10 as the ENTIRE
residual of the 5.09x ratio at x8 (~2.3 s Spark vs 0.07-0.12 s DuckDB
each) with per-query plans audited optimal — so the remaining question
is whether that constant factor is EXCHANGE-BOUND (fixable by layout:
the repo's own bucketing machinery has proven exchange-free joins in
tests but never been benched on the block) or SCHEDULING-FLOOR-BOUND
(documented, done).

This script times the three queries at corpus factor N twice:

  flat      the registry entries as-is over the Nx parquet directory
  bucketed  the SAME registry entries over catalog tables written
            bucketed on the block's dominant join keys — orders and
            lineitem by orderkey (the fact-fact exchange), customer
            by c_custkey — via sources/bucketing.write_bucketed and
            resolved through load_table's "catalog:" scheme (zero
            query-code duplication; identical logical plans)

min-of-REPS per query per layout, Exchange-operator counts printed
from each physical plan, CONTENT parity asserted flat-vs-bucketed
(order-independent value fingerprint over every column, not just row
count — ADVICE r10: an equal-cardinality layout-induced divergence,
e.g. the events ts fixup differing across the catalog path, must fail
before anything is timed).

Bucket count = spark.sql.shuffle.partitions (the one-sided sizing rule
measured in sources/bucketing.py).

Usage::

    python scripts/joinblock_bucketed.py [--workdir .scale_trial]
        [--reps 5] [--queries q3_shipping_priority ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.plans.checks import num_shuffles  # noqa: E402
from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.bucketing import write_bucketed  # noqa: E402
from ask_duckdb_spark.sources.catalog import load_table  # noqa: E402

WARM_DIR = "/root/testdata/sf0.001"
PREFIX = "jb_"


def content_fingerprint(df):
    """Order-independent value fingerprint: sum of per-row xxhash64
    over every column (stringified NULL-safe struct), as decimal so a
    billion-row sum cannot overflow. Distributed — no collect — so it
    is safe at any trial factor, and the same diffcheck-grade content
    equality the tests' collect-and-compare gives at small SF.

    Map-typed columns are canonicalized to key-sorted entry arrays
    first (ADVICE r11): ``to_json`` serializes map entries in physical
    order, so two content-equal plans could otherwise fingerprint
    differently just because a shuffle reordered map builds — a
    spurious parity FAILURE, the opposite of the r10 assert's point."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    cols = [
        F.array_sort(F.map_entries(f.name)).alias(f.name)
        if isinstance(f.dataType, MapType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    h = F.xxhash64(F.to_json(F.struct(*cols)))
    row = df.select(
        F.sum(h.cast("decimal(38,0)")).alias("fp"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row.fp, row.n

#: table -> bucket column (the join key that carries the block's
#: largest exchanges). Tables not listed are registered unbucketed so
#: the catalog path sees the same relations.
BUCKET_KEYS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
}
PLAIN = ("nation", "region", "supplier")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--workdir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_trial",
        ),
    )
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--queries",
        nargs="*",
        default=[
            "q3_shipping_priority",
            "q5_local_supplier_volume",
            "q10_returned_items",
        ],
    )
    ap.add_argument("--keep-tables", action="store_true")
    args = ap.parse_args()

    spark = get_spark("joinblock-bucketed")
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    print(f"corpus: {args.workdir}; n_buckets={n_buckets}; "
          f"load1 {os.getloadavg()[0]:.2f}")

    # One-time layout cost — reported, not charged to the query walls
    # (at 100 TB the write-side shuffle is paid once per table load,
    # amortized over every downstream join).
    # Clear orphaned managed-table locations from prior --keep-tables
    # runs (fresh metastore + existing dir = LOCATION_ALREADY_EXISTS).
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "").replace("file:", "")
    for name in list(BUCKET_KEYS) + list(PLAIN):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{name}")
        if wh:
            shutil.rmtree(os.path.join(wh, f"{PREFIX}{name}"),
                          ignore_errors=True)

    t0 = time.time()
    for name, key in BUCKET_KEYS.items():
        write_bucketed(
            load_table(spark, args.workdir, name),
            f"{PREFIX}{name}",
            [key],
            n_buckets=n_buckets,
        )
    for name in PLAIN:
        load_table(spark, args.workdir, name).write.mode(
            "overwrite"
        ).saveAsTable(f"{PREFIX}{name}")
    print(f"bucketed layout write: {time.time() - t0:.1f}s "
          f"[once per corpus, not in query walls]")

    cat_dir = f"catalog:{PREFIX}"
    # codegen warm-up (class cache is SF-independent)
    for q in args.queries:
        QUERIES[q](spark, WARM_DIR).count()

    results = {}
    for q in args.queries:
        flat_df = QUERIES[q](spark, args.workdir)
        buck_df = QUERIES[q](spark, cat_dir)
        (fp_flat, n_flat), (fp_buck, n_buck) = (
            content_fingerprint(flat_df),
            content_fingerprint(buck_df),
        )
        assert n_flat == n_buck, (q, n_flat, n_buck)
        assert fp_flat == fp_buck, (q, fp_flat, fp_buck)
        ex_flat, ex_buck = num_shuffles(flat_df), num_shuffles(buck_df)
        walls_f, walls_b = [], []
        # interleave so host drift lands on both layouts equally
        for _ in range(args.reps):
            t0 = time.time()
            flat_df.count()
            walls_f.append(time.time() - t0)
            t0 = time.time()
            buck_df.count()
            walls_b.append(time.time() - t0)
        wf, wb = min(walls_f), min(walls_b)
        results[q] = (wf, wb, ex_flat, ex_buck, n_flat)
        print(f"{q}: flat {wf:.3f}s (exchanges {ex_flat}, all "
              f"{[f'{w:.2f}' for w in walls_f]}) | bucketed {wb:.3f}s "
              f"(exchanges {ex_buck}, all {[f'{w:.2f}' for w in walls_b]}) "
              f"| {n_flat} rows")

    tf = sum(r[0] for r in results.values())
    tb = sum(r[1] for r in results.values())
    print(f"join block total: flat {tf:.3f}s vs bucketed {tb:.3f}s "
          f"({tf / tb:.2f}x)")

    if not args.keep_tables:
        for name in list(BUCKET_KEYS) + list(PLAIN):
            spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
