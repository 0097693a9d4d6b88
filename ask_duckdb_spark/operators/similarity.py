"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one broadcast of the query vector,
one scan, a TakeOrderedAndProject. Scale path: LSH (random hyperplanes)
bucketing so only same-bucket candidates are scored; at 100 TB the scan
becomes a bucket-pruned fraction of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..sources.catalog import load_table
from .registry import query

N_PLANES = 16  # LSH hyperplane count (bucket cardinality 2^16)


@query(
    "x5_cosine_topk",
    # DuckDB >=1.0 ships list_cosine_similarity; ties broken by vec_id.
    # Only ids cross the comparison boundary (float near-ties at the
    # boundary of k are a hash hazard; ids are stable).
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id
    LIMIT 10
    """,
)
def x5_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim")
        )
    )
    return (
        scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(10).select("vec_id")
    )


@query("x6_ann_lsh_topk")  # hash-seeded hyperplanes: not oracle-expressible
def x6_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via sign-random-projection LSH.

    Hyperplane weights are derived deterministically from
    ``xxhash64(plane, dim)`` (no RNG, resumable, identical on every
    executor without broadcasting a model). Candidates = vectors in the
    query's bucket or any bucket at Hamming distance 1 (multi-probe).
    """
    emb = load_table(spark, sf_dir, "embeddings")

    def bucket_of(vec_col):
        # sign bit per plane: sum_d w(p,d) * v[d] >= 0
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.sequence(F.lit(0), F.size(vec_col) - 1),
                        # pseudo-random weight in [-1, 1) from (plane, dim)
                        lambda v, d: v.cast("double")
                        * (
                            (F.pmod(F.xxhash64(F.lit(p), d), F.lit(2000001)) - 1000000)
                            / 1000000.0
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.shiftleft(F.lit(1).cast("long"), p),
            ).otherwise(F.lit(0).cast("long"))
            for p in range(N_PLANES)
        ]
        return sum(bits[1:], bits[0])

    with_bucket = emb.select("vec_id", "embedding", bucket_of(F.col("embedding")).alias("bucket"))
    q = with_bucket.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    # Multi-probe: query bucket plus all Hamming-1 neighbors.
    probes = q.select(
        "qv",
        F.explode(
            F.array_union(
                F.array(F.col("qbucket")),
                F.array(
                    *[
                        F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(N_PLANES)
                    ]
                ),
            )
        ).alias("bucket"),
    )
    cands = with_bucket.filter(F.col("vec_id") != 0).join(
        F.broadcast(probes), "bucket"
    )
    return (
        cands.select(
            "vec_id", cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim")
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "sim")
    )


@query(
    "x7_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.label = b.label
      AND list_cosine_similarity(a.embedding, b.embedding) > 0.95
    ORDER BY id_a, id_b
    """,
)
def x7_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label.

    Blocking on `label` keeps the self-join from being O(n^2) over the
    whole corpus — the relational analogue of IVF cells. At 100 TB the
    blocking key would be an LSH bucket (x6) instead of a label.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("ea"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("eb"),
    )
    return (
        a.join(b, "lbl")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity(F.col("ea"), F.col("eb")) > 0.95)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )
