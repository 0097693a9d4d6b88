"""r14 full-registry timing sweep, DRIVER-PROTOCOL edition.

r13's sweep timed one prepared plan 3x with ``clearCache()`` between
reps. That protocol is wrong for operators that persist() an
intermediate: clearCache removes the CacheManager entry, so the
SAME plan object re-executes with (a) every persisted frame's
multi-consumer fan-out recomputed per branch and (b) join strategies
re-planned from raw-lineage size estimates instead of cached-relation
stats — x74/x91/x142 read 15-40x slower on reps 2-3 than on rep 1
(OPTIMIZATION_r13.md "sweep methodology note"; VERDICT r13 item 7).
The driver never re-executes a released plan: it builds fresh, runs
once, releases. This sweep does exactly that — each rep REBUILDS the
DataFrame (re-registering its persists), times one count(), then
releases and clearCache()s OUTSIDE the timed region. Build time is
reported separately (driver-side Py4J latency, not engine time).

Usage: python scripts/r14_sweep.py [names...]   # default: all
Writes /tmp/r14_sweep.json.
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

REPS = 3


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14_sweep")
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
            walls, builds = [], []
            for _ in range(REPS):
                t_b = time.time()
                df = QUERIES[name](spark, sf_dir)
                builds.append(time.time() - t_b)
                t0 = time.time()
                df.count()
                walls.append(time.time() - t0)
                del df
                spark.catalog.clearCache()
            out[name] = {
                # min over fresh-build executions; rep 1 includes any
                # one-time codegen for this plan family, so the min is
                # normally rep 2 or 3 — steady-state, driver-like.
                "wall": round(min(walls), 3),
                "walls": [round(w, 3) for w in walls],
                "build": round(min(builds), 3),
            }
            print(f"{name:38s} {min(walls):8.3f}  {out[name]['walls']}", flush=True)
        except Exception as e:  # pragma: no cover - sweep robustness
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        with open("/tmp/r14_sweep.json", "w") as f:
            json.dump(out, f, indent=1)
    out["_load_end"] = os.getloadavg()[0]
    with open("/tmp/r14_sweep.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
