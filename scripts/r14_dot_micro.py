"""Pure per-pair scoring microbench: dot-product formulations.

Fixed candidate volume (embeddings x 1000 broadcast self-pairs =
2M scored pairs), agg(sum(sim)) to force full evaluation, interleaved
min-of-N per variant in one session.

Variants:
  fold      — pre-r14: aggregate(zip_with(...)) two-HOF chain
  unroll    — r14 shipped: 64-term codegen chain + size guard
  unroll_ng — unrolled WITHOUT the size guard (isolates guard cost)
  agg_idx   — single HOF: aggregate(sequence(1,64), acc + a[i]*b[i])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.catalog import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "5"))
D = 64


def dot_fold(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_unroll_ng(a, b):
    acc = F.lit(0.0)
    for i in range(1, D + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return acc


def dot_unroll(a, b):
    return F.when(
        (F.size(a) == D) & (F.size(b) == D), dot_unroll_ng(a, b)
    ).otherwise(dot_fold(a, b))


def dot_agg_idx(a, b):
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(D)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )


def main() -> int:
    spark = get_spark("r14_dot_micro")
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    q = emb.limit(1000).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pairs = emb.crossJoin(F.broadcast(q))  # 2000 x 1000 = 2M pairs
    variants = {
        "fold": dot_fold,
        "unroll": dot_unroll,
        "unroll_ng": dot_unroll_ng,
        "agg_idx": dot_agg_idx,
    }
    plans = {
        k: pairs.select(fn(F.col("embedding"), F.col("qv")).alias("s")).agg(
            F.sum("s")
        )
        for k, fn in variants.items()
    }
    vals = {k: df.collect()[0][0] for k, df in plans.items()}  # warm + verify
    assert len({repr(v) for v in vals.values()}) == 1, vals
    walls = {k: [] for k in variants}
    for rep in range(REPS):
        for k, df in plans.items():
            t0 = time.time()
            df.collect()
            walls[k].append(round(time.time() - t0, 3))
    print(f"=== 2M pairs, {REPS} reps, load {os.getloadavg()[0]:.2f} ===")
    for k, w in walls.items():
        print(f"{k:10s} min {min(w):7.3f}  {w}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
