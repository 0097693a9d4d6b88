"""Scale trial: replicate fixture tables Nx and re-time core operators.

Usage::

    python scripts/scale_trial.py --factor 100

Builds an Nx corpus from sf0.1 (``documents`` replicated with per-
replica word perturbation so the DUPLICATION RATE stays realistic
instead of creating an N-way-duplicate pathology; ``events`` replicated
into fresh user-id ranges so the corpus grows in users, the realistic
100 TB shape) and times the four shuffle-bearing operator families the
100 TB argument rests on: MinHash-LSH (x2), the n-gram inverted-index
self-join (x3), sessionization (x13), and TF-IDF (x22).

Results are recorded in SCALE.md. The workdir is repo-local and
gitignored; pass --keep to skip the teardown for plan inspection.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.catalog import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
STAGES = (
    "x2_minhash_neardup",
    "x3_ngram_jaccard_pairs",
    "x13_sessionize",
    "x22_tfidf_top_term",
    "x53_prefix_filter_jaccard",
    "x57_bigram_rarity",
    "x59_source_overlap",
    "x62_semdedup",
)

#: x62's cell count must grow with the corpus (SemDeDup's design
#: point): cells stay ~constant-sized, so the within-cell scan stays
#: linear. The trial passes n_cells = N_CELLS * factor explicitly —
#: the knob a 100 TB deployment sets from its corpus-size estimate.
ADAPTIVE_CELLS = {"x62_semdedup"}


def perturb_text(rep) -> "F.Column":
    """Per-replica word suffix on ``text``, preserving the retrieval
    keep-set — THE shared corpus-growth recipe (scale_trial AND
    ratio_curve, VERDICT r8 item 5: two builders had drifted, and the
    drifted one made x125 non-measurable and x2's x8 reading a corpus
    artifact).

    Nearly every 8-gram crosses a word boundary, so replicas of one
    document stop colliding at the gram level — the corpus grows Nx
    while the true-duplicate rate stays the base corpus's, which is
    what a real crawl looks like (within a replica the suffix map is
    injective and consistent, so the base corpus's near-dup pairs
    survive intact — density per doc is preserved, pairs scale Nx).
    Exception (VERDICT r5 item 7): the fixed BM25 query terms AND the
    x125/x129 phrase words are left unperturbed so retrieval trials
    (x76/x89/x125/x129) measure real postings/matches — suffixing
    them zeroes the match set and times an empty-result scan (the r5
    x76 lesson; the first x125 10x trial repeated it). The preserved
    words are isolated commons plus ONE adjacent pair ("table scan",
    10 chars): a single shared char-8-gram family across replicas,
    far below the shingle-overlap threshold of any dedup trial, and
    hot-posting caps (MAX_POSTING) bound the x3 inverted index.
    """
    from ask_duckdb_spark.operators.stats_audit import PHRASE
    from ask_duckdb_spark.operators.textstats import BM25_TERMS

    keep = tuple(set(BM25_TERMS) | set(PHRASE))
    return F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.when(
                w.isin(*keep), w
            ).otherwise(F.concat(w, F.lit("~"), rep.cast("string"))),
        ),
        " ",
    )


def build_corpus(spark, factor: int, workdir: str) -> None:
    k = F.col("replica")
    docs = load_table(spark, BASE, "documents").crossJoin(
        spark.range(factor).select(F.col("id").alias("replica"))
    )
    perturbed = perturb_text(k)
    docs.select(
        (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
        perturbed.alias("text"),
        "lang",
        "source",
        "n_chars",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "documents.parquet")
    )

    # Embeddings: fresh vec_id ranges with per-(replica, dim) jitter so
    # replicas of one vector decorrelate instead of forming an N-way
    # exact-duplicate pathology (the x62 cell scan would otherwise
    # measure a degenerate all-dups corpus, not a realistic one).
    emb = load_table(spark, BASE, "embeddings").crossJoin(
        spark.range(factor).select(F.col("id").alias("replica"))
    )
    jittered = F.zip_with(
        F.col("embedding"),
        F.sequence(F.lit(1), F.size("embedding")),
        lambda v, i: (
            v.cast("double")
            + (F.pmod(F.xxhash64(k, i), F.lit(1001)) - 500) / 1000.0
        ).cast("float"),
    )
    emb.select(
        (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
        jittered.alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "embeddings.parquet")
    )

    ev = load_table(spark, BASE, "events").crossJoin(
        spark.range(factor).select(F.col("id").alias("replica"))
    )
    ev.select(
        (F.col("event_id") + k * 100_000_000).alias("event_id"),
        (F.col("user_id") + k * 1_000_000).alias("user_id"),
        "ts",
        "event_type",
        "value",
        "props",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "events.parquet")
    )

    # Relational tables, for the layout/incremental family (x115-x120):
    # fresh orderkey/custkey ranges per replica — the fact tables grow
    # Nx while part/supplier dimensions stay fixed, the realistic shape
    # (a lake gains orders, not part numbers). Key-congruence mutation
    # models (x115's %97/%11) keep their rates: the 10^7 replica stride
    # shifts residues per replica without changing the densities.
    cu = load_table(spark, BASE, "customer").crossJoin(
        spark.range(factor).select(F.col("id").alias("replica"))
    )
    cu.select(
        (F.col("c_custkey") + k * 10_000_000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "customer.parquet")
    )
    od = load_table(spark, BASE, "orders").crossJoin(
        spark.range(factor).select(F.col("id").alias("replica"))
    )
    od.select(
        (F.col("o_orderkey") + k * 10_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + k * 10_000_000).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "orders.parquet")
    )
    li = load_table(spark, BASE, "lineitem").crossJoin(
        spark.range(factor).select(F.col("id").alias("replica"))
    )
    li.select(
        (F.col("l_orderkey") + k * 10_000_000).alias("l_orderkey"),
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(workdir, "lineitem.parquet")
    )


def time_stage(spark, name: str, sf_dir: str, factor: int = 1) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.time()
    if name == "x62_semdedup" and factor > 1:
        from ask_duckdb_spark.operators.similarity import N_CELLS, x62_semdedup

        n = x62_semdedup(spark, sf_dir, n_cells=N_CELLS * factor).count()
    elif name == "x63_semdedup_hier" and factor > 1:
        # scale each level as sqrt(k): k_eff = N_CELLS * factor cells
        # from n_coarse x n_fine ~= sqrt(k) x sqrt(k)
        import math

        from ask_duckdb_spark.operators.similarity import (
            N_CELLS,
            x63_semdedup_hier,
        )

        side = max(2, math.isqrt(N_CELLS * factor))
        n = x63_semdedup_hier(
            spark, sf_dir, n_coarse=side, n_fine=side
        ).count()
    # (x137 needs no special case since r8: its stats-driven BAND_BITS
    # sizing lives in the operator — _auto_band_bits counts the corpus
    # and grows bits with it, so the DEFAULT invocation self-sizes.)
    elif name == "x117_bloom_semijoin" and factor > 1:
        # size the filter to the grown build side (see the docstring's
        # fp formula): m_bits scales with build-key cardinality
        from ask_duckdb_spark.operators.layout import (
            _BLOOM_BITS,
            x117_bloom_semijoin,
        )

        n = x117_bloom_semijoin(
            spark, sf_dir, m_bits=_BLOOM_BITS * factor
        ).count()
    else:
        n = QUERIES[name](spark, sf_dir).count()
    return time.time() - t0, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument(
        "--workdir",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scale_trial"),
    )
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--stages", nargs="*", default=list(STAGES))
    args = ap.parse_args()

    spark = get_spark("scale-trial")
    print(f"building {args.factor}x corpus under {args.workdir} ...")
    t0 = time.time()
    build_corpus(spark, args.factor, args.workdir)
    print(f"  built in {time.time() - t0:.1f}s")

    for name in args.stages:  # codegen warm-up (class cache is SF-independent)
        QUERIES[name](spark, WARM).count()
    spark.catalog.clearCache()

    print(f"{'stage':<28}{'1x wall':>9}{'1x rows':>12}"
          f"{args.factor:>6}x wall{'rows':>14}")
    for name in args.stages:
        w1, n1 = time_stage(spark, name, BASE)
        wn, nn = time_stage(spark, name, args.workdir, args.factor)
        print(f"{name:<28}{w1:>8.2f}s{n1:>12,}{wn:>10.2f}s{nn:>14,}")

    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
