"""x117 bloom-semi-join crossover measurement (VERDICT r7 item 3).

The bloom form's premise is paying a bounded filter build to cut the
BIG side's shuffle; at sf0.1 it loses ~9x after floor to DuckDB's plain
semi-join because there is nothing to cut — every reading so far is in
the floor regime. This script measures the claim where it can actually
show up, at sf0.1 x FACTOR (ratio_curve's shard-replicated corpus), by
timing min-of-N on the SAME Spark session:

1. ``plain_bcast``  — plain left-semi, default confs: AQE broadcasts
   the build side (the plan you'd run when the build side fits the
   broadcast threshold — the honest local winner).
2. ``plain_shuffle`` — plain left-semi with auto-broadcast DISABLED
   (both ``spark.sql.autoBroadcastJoinThreshold`` and the AQE variant
   set to -1): the probe side shuffles in full. This is the at-scale
   proxy — at 100 TB the build side exceeds any broadcast threshold
   and THIS is the plan the bloom must beat.
3. ``bloom_shuffle`` — x117 with stats-driven ``m_bits`` under the same
   disabled-broadcast confs (the word-table probes keep their EXPLICIT
   broadcast hints, which override the threshold — that is the bloom
   design: a constant-size filter broadcasts even when the build side
   cannot). Only bloom survivors reach the exact semi-join's shuffle.

DuckDB's plain semi-join total is timed last for context.

All three Spark plans return identical rows (asserted). Usage::

    python scripts/x117_crossover.py [--factor 8] [--reps 3]
        [--skip-build]   # reuse .scale/sfx{factor} from ratio_curve --keep
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ask_duckdb_spark.operators import ORACLES  # noqa: E402
from ask_duckdb_spark.operators._util import money, rev_units  # noqa: E402
from ask_duckdb_spark.operators.layout import (  # noqa: E402
    x117_bloom_semijoin,
)
from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.catalog import load_table  # noqa: E402
from scripts.ratio_curve import build_scaled  # noqa: E402

_BCAST_CONFS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
)


def plain_semi(spark, sf_dir: str):
    """x117's contract without the bloom stage: build -> left-semi ->
    identical aggregate (the oracle's literal plan)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # mirrors the registered x117b plan (r12: no distinct — o_orderkey
    # is the orders PK and left-semi is duplicate-insensitive)
    build = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("bk")
    )
    exact = li.join(build, li["l_orderkey"] == build["bk"], "left_semi")
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            money(F.sum(rev_units()), 10000).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


def timed(spark, mk_df, reps: int, no_bcast: bool) -> tuple[float, list[float]]:
    saved = {c: spark.conf.get(c, None) for c in _BCAST_CONFS}
    try:
        if no_bcast:
            for c in _BCAST_CONFS:
                spark.conf.set(c, "-1")
        walls = []
        df = mk_df()  # plan built once; re-execution timed (bench.py)
        for _ in range(reps):
            t0 = time.time()
            df.count()
            walls.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        return min(walls), walls
    finally:
        for c, v in saved.items():
            if v is not None:
                spark.conf.set(c, v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = os.path.join(repo, ".scale", f"sfx{args.factor}")

    spark = get_spark("x117_crossover")
    if not args.skip_build:
        build_scaled(spark, args.factor, workdir)

    # stats-driven filter sizing: ~13 bits per build key at k=3 keeps
    # fp under ~3%; round up to the next power of two.
    n_keys = (
        load_table(spark, workdir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .distinct()
        .count()
    )
    m_bits = 1 << max(17, (13 * n_keys - 1).bit_length())
    print(
        json.dumps({"n_build_keys": n_keys, "m_bits": m_bits}),
        file=sys.stderr,
    )

    plans = {
        "plain_bcast": (lambda d: (lambda: plain_semi(spark, d)), False),
        "plain_shuffle": (lambda d: (lambda: plain_semi(spark, d)), True),
        "bloom_shuffle": (
            lambda d: (
                lambda: x117_bloom_semijoin.__wrapped__(spark, d, m_bits=m_bits)
            ),
            True,
        ),
    }

    for label, d in (("0.1", "/root/testdata/sf0.1"), (f"0.1x{args.factor}", workdir)):
        # identical-answer gate across the three plans
        rows = None
        out = {}
        for pname, (mk, no_bcast) in plans.items():
            got = [tuple(r) for r in mk(d)().collect()]
            if rows is None:
                rows = got
            assert got == rows, (pname, label)
            best, walls = timed(spark, mk(d), args.reps, no_bcast)
            out[pname] = {"best": best, "walls": walls}
        print(json.dumps({"sf": label, **{k: v for k, v in out.items()}}))

    spark.stop()

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem", "nation", "region"):
        p = os.path.join(workdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    walls = []
    for _ in range(args.reps):
        t0 = time.time()
        con.sql(
            f"SELECT count(*) FROM ({ORACLES['x117_bloom_semijoin']})"
        ).fetchall()
        walls.append(round(time.time() - t0, 3))
    con.close()
    print(
        json.dumps(
            {
                "sf": f"0.1x{args.factor}",
                "duckdb_plain_semi": {"best": min(walls), "walls": walls},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
