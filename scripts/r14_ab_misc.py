"""r14 interleaved A/B #2: x2 est-placement arms and x20 widen.

x2 arms (same session, alternating, min-of-N):
  r12  — sig-carrying pairs, SortAggregate dedup, HOF est post-dedup
  r13  — in-lambda HOF est, filter, HashAggregate dedup (r13 shipped)
  r14a — post-explode UNROLLED est, filter, HashAggregate dedup
  r14b — post-explode HOF est, filter, HashAggregate dedup

x20 arms: old = no widen (r13 shipped), new = widen restored.

Usage: python scripts/r14_ab_misc.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import ask_duckdb_spark.operators.dedup as D  # noqa: E402
from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.operators.dedup import (  # noqa: E402
    MAX_BUCKET,
    N_HASHES,
    _banded,
    _raw_sig_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from ask_duckdb_spark.operators._util import unpersist_with  # noqa: E402
from ask_duckdb_spark.operators.multimodal import (  # noqa: E402
    DECODE_SCHEMA,
    _decode_batches,
)
from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.catalog import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "5"))


def _hof_est(sig_a, sig_b):
    return (
        F.size(
            F.filter(
                F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m
            )
        )
        / F.lit(N_HASHES)
    )


def _sig(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return minhash_signatures(d, "doc_id", "text").persist()


def x2_r12(spark, sf_dir):
    sig = _sig(spark, sf_dir)
    pairs = lsh_candidate_pairs(sig, "doc_id")
    est = pairs.select(
        "id_a", "id_b", _hof_est("sig_a", "sig_b").alias("jaccard_est")
    )
    out = est.filter(F.col("jaccard_est") >= 0.5).orderBy("id_a", "id_b")
    return unpersist_with(out, sig)


def x2_r13(spark, sf_dir):
    sig = _sig(spark, sf_dir)
    bands = _banded(sig, "doc_id")
    members = (
        bands.groupBy("band", "bucket")
        .agg(
            F.collect_list(
                F.struct(F.col("doc_id").alias("i"), F.col("sig").alias("s"))
            ).alias("ms")
        )
        .filter((F.size("ms") >= 2) & (F.size("ms") <= MAX_BUCKET))
    )
    pairs = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ms",
                    lambda a: F.transform(
                        F.filter(F.col("ms"), lambda b: b["i"] > a["i"]),
                        lambda b: F.struct(
                            a["i"].alias("id_a"),
                            b["i"].alias("id_b"),
                            (
                                F.size(
                                    F.filter(
                                        F.zip_with(
                                            a["s"], b["s"], lambda x, y: x == y
                                        ),
                                        lambda m: m,
                                    )
                                )
                                / F.lit(N_HASHES)
                            ).alias("jaccard_est"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.jaccard_est")
    out = (
        pairs.filter(F.col("jaccard_est") >= 0.5)
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )
    return unpersist_with(out, sig)


def x2_r14a(spark, sf_dir):
    # shipped path
    return QUERIES["x2_minhash_neardup"](spark, sf_dir)


def x2_r14b(spark, sf_dir):
    sig = _sig(spark, sf_dir)
    raw = _raw_sig_pairs(_banded(sig, "doc_id"), "doc_id")
    est = raw.select(
        "id_a", "id_b", _hof_est(F.col("sig_a"), F.col("sig_b")).alias("jaccard_est")
    )
    out = (
        est.filter(F.col("jaccard_est") >= 0.5)
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )
    return unpersist_with(out, sig)


def x20_old(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payload.mapInPandas(_decode_batches, DECODE_SCHEMA).orderBy("doc_id")


ARMS = {
    "x2_r12": x2_r12,
    "x2_r13": x2_r13,
    "x2_r14a": x2_r14a,
    "x2_r14b": x2_r14b,
    "x20_old": x20_old,
    "x20_new": lambda s, d: QUERIES["x20_decode_features"](s, d),
}


def main() -> int:
    spark = get_spark("r14_ab_misc")
    QUERIES["g1_count_star"](spark, SF).count()
    import pandas as _pd  # noqa: F401

    def _ident(batches):
        yield from batches

    n = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, n).mapInPandas(_ident, "id long").count()
    warm = "/root/testdata/sf0.01"
    for _ in range(2):
        for name, fn in ARMS.items():
            fn(spark, warm).count()
        spark.catalog.clearCache()

    walls = {k: [] for k in ARMS}
    for rep in range(REPS):
        for name, fn in ARMS.items():
            df = fn(spark, SF)
            t0 = time.time()
            df.count()
            walls[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    print(f"\n=== {REPS} reps, load {os.getloadavg()[0]:.2f} ===")
    for name, w in walls.items():
        print(f"{name:10s} min {min(w):7.3f}  {w}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
