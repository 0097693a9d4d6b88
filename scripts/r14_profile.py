"""r14 optimization-round profiler.

Per headline/v2 query at $SPARK_GRAFT_SF_DIR: min-of-N wall on the
prepared plan (bench methodology), Spark job count per execution, and
``explain("formatted")`` dumped to plans/r14/<name>_<tag>.txt.

Usage: python scripts/r14_profile.py <tag> [extra_conf_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.session import get_spark  # noqa: E402

from bench import HEADLINE, HEADLINE_V2  # noqa: E402

REPS = 3


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    extra = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("r14_profile", extra_conf=extra or None)
    sc = spark.sparkContext
    # warm exactly like bench.py
    QUERIES["g1_count_star"](spark, sf_dir).count()
    import pandas as _pd  # noqa: F401

    def _ident(batches):
        yield from batches

    n = sc.defaultParallelism
    spark.range(0, n, 1, n).mapInPandas(_ident, "id long").count()
    warm_dir = "/root/testdata/sf0.01"
    names = HEADLINE + HEADLINE_V2
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for _ in range(2):
            for name in names:
                QUERIES[name](spark, warm_dir).count()
            spark.catalog.clearCache()

    plans = {name: QUERIES[name](spark, sf_dir) for name in names}
    out = {}
    for name in names:
        df = plans[name]
        # capture explain text once (pre-execution initial plan)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        walls = []
        njobs = None
        for rep in range(REPS):
            sc.setJobGroup(f"{name}-{rep}", name)
            t0 = time.time()
            df.count()
            walls.append(time.time() - t0)
            jobs = sc.statusTracker().getJobIdsForGroup(f"{name}-{rep}")
            njobs = len(jobs)
            spark.catalog.clearCache()
        out[name] = {
            "wall": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "njobs": njobs,
        }
        print(f"{name:38s} {min(walls):7.3f}  jobs={njobs}", flush=True)
    # floor probe
    region = os.path.join(sf_dir, "region.parquet")
    walls = []
    for _ in range(5):
        t0 = time.time()
        spark.read.parquet(region).groupBy("r_name").count().count()
        walls.append(time.time() - t0)
    out["_floor"] = round(min(walls), 3)
    out["_load"] = round(os.getloadavg()[0], 2)
    out["_conf"] = extra
    print("floor", out["_floor"], "load", out["_load"])
    with open(f"/tmp/r14_profile_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
