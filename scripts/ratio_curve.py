"""Ratio-vs-scale curve: Spark/DuckDB headline ratio at 4 scale points.

Usage::

    python scripts/ratio_curve.py [--factor 8] [--keep]

Times the oracle-paired headline set (bench.HEADLINE) on BOTH engines at
sf0.001, sf0.01, sf0.1, and an sf0.1 x FACTOR corpus built shard-style
(below), emitting one JSON line per scale point. Purpose: substantiate
the per-query-floor claim quantitatively (VERDICT r4 item 8) — Spark
pays a fixed ~0.1 s job-submission/AQE floor per query that dominates
sub-second queries at small SF and vanishes as queries become
compute-bound, so the ratio must fall monotonically with SF.

The x FACTOR corpus is weak-scaling by SHARD REPLICATION, the shape a
bigger TPC-H SF actually has:

- keyed tables get per-replica key offsets (custkey/orderkey/suppkey/
  partkey/user_id/vec_id), so every join keeps its base fan-out —
  FACTOR independent shards, no artificial key collisions;
- ``documents`` get per-replica word suffixes (same trick as
  scripts/scale_trial.py) so replicas of one doc do NOT collide at the
  shingle level and the true-duplicate rate stays the base corpus's;
- ``nation``/``region`` are dimension constants and stay as-is.

Both engines read the same scaled parquet; both are timed min-of-2 with
the Spark JVM stopped before the DuckDB pass (bench.py methodology).
The workdir is repo-local (.scale/) and gitignored.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from bench import HEADLINE  # noqa: E402
from ask_duckdb_spark.operators import ORACLES, QUERIES  # noqa: E402
from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.catalog import TABLES, load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
#: Per-replica key offsets — larger than any base key.
KEY_OFF = 100_000_000

#: key columns to offset per replica, per table.
OFFSETS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_suppkey", "l_partkey"),
    "events": ("user_id",),
    "embeddings": ("vec_id",),
}


def build_scaled(spark, factor: int, workdir: str) -> None:
    rep = F.col("_r")
    for t in TABLES:
        src = load_table(spark, BASE, t)
        dst = os.path.join(workdir, f"{t}.parquet")
        if t in ("nation", "region"):
            src.write.mode("overwrite").parquet(dst)
            continue
        df = src.crossJoin(spark.range(factor).select(F.col("id").alias("_r")))
        if t == "documents":
            # SHARED recipe with scale_trial (VERDICT r8 item 5): the
            # previous inline version suffixed EVERY word, which made
            # x125's phrase unmatchable (empty-result scan) and
            # re-shaped x2's bucket landscape — two measurement
            # stories leaning on a builder quirk. perturb_text keeps
            # the retrieval keep-set and preserves within-replica
            # near-dup density.
            from scale_trial import perturb_text

            perturbed = perturb_text(rep)
            df = df.select(
                (F.col("doc_id") + rep * KEY_OFF).alias("doc_id"),
                perturbed.alias("text"),
                *[c for c in src.columns if c not in ("doc_id", "text")],
            )
        else:
            cols = []
            off = OFFSETS.get(t, ())
            for c in src.columns:
                cols.append(
                    (F.col(c) + rep * KEY_OFF).alias(c) if c in off else F.col(c)
                )
            df = df.select(*cols)
        df.repartition(32).write.mode("overwrite").parquet(dst)


def spark_pass(
    spark, sf_dir: str, reps: int = 2, names=None
) -> tuple[dict[str, float], list[float]]:
    # Prepared-plan discipline (same as bench.py): build once, time
    # re-execution — Py4J tree construction is client latency, not
    # engine work. Returns (min-of-reps per query, per-rep totals) so
    # the caller can report the SPREAD, not just the min (VERDICT r7
    # item 5: single-shot points read noisier than they are).
    plans = {
        name: QUERIES[name](spark, sf_dir)
        for name in (names or HEADLINE)
        if name in ORACLES
    }
    out: dict[str, float] = {}
    totals: list[float] = []
    for rep in range(reps):
        tot = 0.0
        for name, df in plans.items():
            t0 = time.time()
            df.count()
            w = round(time.time() - t0, 3)
            tot += w
            if rep == 0 or w < out[name]:
                out[name] = w
            spark.catalog.clearCache()
        totals.append(round(tot, 3))
    return out, totals


def duck_pass(
    sf_dir: str, reps: int = 2, names=None
) -> tuple[dict[str, float], list[float]]:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'"
                    if os.path.isdir(p)
                    else f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out: dict[str, float] = {}
    totals: list[float] = []
    for rep in range(reps):
        tot = 0.0
        for name in (names or HEADLINE):
            if name not in ORACLES:
                continue
            t0 = time.time()
            con.sql(f"SELECT count(*) FROM ({ORACLES[name]})").fetchall()
            w = round(time.time() - t0, 3)
            tot += w
            if rep == 0 or w < out[name]:
                out[name] = w
        totals.append(round(tot, 3))
    con.close()
    return out, totals


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--reps", type=int, default=2, help="min-of-N timing reps")
    ap.add_argument(
        "--points",
        default="",
        help="comma-separated scale labels to run (default: all four)",
    )
    ap.add_argument(
        "--extra",
        nargs="*",
        default=[],
        help="extra registry queries timed alongside HEADLINE on both "
        "engines (e.g. x125_phrase_match — VERDICT r8 item 5: the x8 "
        "corpus now preserves the phrase keep-set, so x125 is "
        "measurable here)",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = os.path.join(repo, ".scale", f"sfx{args.factor}")
    points = [
        ("0.001", "/root/testdata/sf0.001"),
        ("0.01", "/root/testdata/sf0.01"),
        ("0.1", BASE),
        (f"0.1x{args.factor}", workdir),
    ]
    if args.points:
        wanted = set(args.points.split(","))
        points = [p for p in points if p[0] in wanted]

    if not args.skip_build:
        spark = get_spark("ratio_curve_build")
        build_scaled(spark, args.factor, workdir)
        spark.stop()

    # All Spark passes first (one JVM, one JIT warm), then all DuckDB
    # passes on the then-quiet machine — bench.py's ordering discipline.
    spark = get_spark("ratio_curve")
    QUERIES["g1_count_star"](spark, BASE).count()
    for _ in range(2):
        for name in HEADLINE:
            if name in ORACLES:
                QUERIES[name](spark, "/root/testdata/sf0.01").count()
        spark.catalog.clearCache()
    names = list(HEADLINE) + [q for q in args.extra if q not in HEADLINE]
    spark_results: dict[str, tuple[dict[str, float], list[float]]] = {}
    for label, d in points:
        spark_results[label] = spark_pass(spark, d, args.reps, names)
    spark.stop()
    duck_results = {
        label: duck_pass(d, args.reps, names) for label, d in points
    }

    for label, _ in points:
        (s, s_tot), (k, k_tot) = spark_results[label], duck_results[label]
        st, kt = round(sum(s.values()), 3), round(sum(k.values()), 3)
        print(
            json.dumps(
                {
                    "sf": label,
                    "spark_total": st,
                    "duck_total": kt,
                    "ratio": round(st / kt, 2) if kt else None,
                    "spark_rep_totals": s_tot,
                    "duck_rep_totals": k_tot,
                    "spark_queries": s,
                    "duck_queries": k,
                }
            )
        )
    if not args.keep and os.path.isdir(workdir):
        shutil.rmtree(workdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
