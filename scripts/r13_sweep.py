"""r13 full-registry timing sweep: every registered query once-warmed,
min-of-2 timed at $SPARK_GRAFT_SF_DIR, written to /tmp/r13_sweep.json.

Purpose: the optimization round's "examine every operator" evidence —
find the expensive tails that the headline bench does not cover.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13_sweep")
    QUERIES["g1_count_star"](spark, sf_dir).count()
    import pandas as _pd  # noqa: F401

    def _ident(batches):
        yield from batches

    n = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, n).mapInPandas(_ident, "id long").count()
    names = sys.argv[1:] or sorted(QUERIES)
    out = {}
    for name in names:
        try:
            t_build0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            build = time.time() - t_build0
            walls = []
            for _ in range(3):
                t0 = time.time()
                df.count()
                walls.append(time.time() - t0)
                spark.catalog.clearCache()
            # first run = warm (codegen); report min of the rest
            out[name] = {
                "wall": round(min(walls[1:]), 3),
                "first": round(walls[0], 3),
                "build": round(build, 3),
            }
        except Exception:
            out[name] = {"error": traceback.format_exc(limit=1)}
            spark.catalog.clearCache()
        print(name, out[name], flush=True)
    out["_load"] = round(os.getloadavg()[0], 2)
    with open("/tmp/r13_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
