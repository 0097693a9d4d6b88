"""r14 interleaved A/B: unrolled vs HOF-fold vector kernels.

Same session, alternating executions, min-of-N — the only trustworthy
protocol on this noisy host (see memory/BENCHLOG). "old" plans are
built with the pre-r14 fold kernels monkeypatched into the consuming
operator modules; "new" plans with the shipped unrolled kernels.

Usage: python scripts/r14_ab_dot.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import ask_duckdb_spark.functions.vectors as V  # noqa: E402
import ask_duckdb_spark.operators.similarity as S  # noqa: E402
from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "5"))

DEFAULT = [
    "x5_cosine_topk",
    "x25_batch_ann_topk",
    "x7_embedding_neardup",
    "x44_knn_graph",
    "x141_ivf_knn_graph",
    "x142_ivf_triangle_census",
    "x69_knn_pagerank",
]


def _old_dot(a, b):
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return V._dot_fold(a, b)


def _old_l2(a):
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(V._sumsq_fold(a))


def _old_cos(a, b):
    return _old_dot(a, b) / (_old_l2(a) * _old_l2(b))


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("r14_ab_dot")
    sf = SF
    QUERIES["g1_count_star"](spark, sf).count()
    # warm both codegen families at sf0.01
    warm = "/root/testdata/sf0.01"
    patch = {"dot": _old_dot, "l2_norm": _old_l2, "cosine_similarity": _old_cos}
    saved = {k: getattr(S, k) for k in patch}

    def build(old: bool):
        if old:
            for k, v in patch.items():
                setattr(S, k, v)
        try:
            return {n: QUERIES[n](spark, sf) for n in names}
        finally:
            if old:
                for k, v in saved.items():
                    setattr(S, k, v)

    for tag, old in (("new", False), ("old", True)):
        if old:
            for k, v in patch.items():
                setattr(S, k, v)
        for n in names:
            QUERIES[n](spark, warm).count()
        if old:
            for k, v in saved.items():
                setattr(S, k, v)
        spark.catalog.clearCache()

    walls = {n: {"old": [], "new": []} for n in names}
    for rep in range(REPS):
        for tag, old in (("old", True), ("new", False)):
            plans = build(old)
            for n in names:
                t0 = time.time()
                plans[n].count()
                walls[n][tag].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    print(f"\n=== {REPS} reps, load {os.getloadavg()[0]:.2f} ===")
    for n in names:
        o, w = min(walls[n]["old"]), min(walls[n]["new"])
        print(
            f"{n:32s} old {o:7.3f} new {w:7.3f}  "
            f"delta {100 * (w - o) / o:+6.1f}%  "
            f"old={walls[n]['old']} new={walls[n]['new']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
