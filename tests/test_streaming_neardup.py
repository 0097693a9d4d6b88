"""Streaming near-dup ingest (streaming/neardup.py) vs the batch rule.

The stream sees the fixture corpus in three id-ordered micro-batches;
the surviving set must equal the batch fast-path rule exactly: drop b
for every signature-estimated pair a < b (est >= 0.5) over the WHOLE
corpus. This holds because every pair is found either in-batch (both
sides in one tercile) or cross-batch (later doc probes the band store
that already holds the earlier doc), and id-ordered batches make
"earlier batch" == "lower id".
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ask_duckdb_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures_fast,
)
from ask_duckdb_spark.sources.catalog import load_table
from ask_duckdb_spark.streaming.neardup import start_neardup_ingest
from tests.conftest import SF_DIR_001


def _batch_reference_kept(spark, docs) -> set[int]:
    sig = minhash_signatures_fast(docs, "doc_id", "text").persist()
    pairs = lsh_candidate_pairs(sig, "doc_id")
    est = pairs.select(
        "id_b",
        (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda m: m,
                )
            )
            / F.lit(32)
        ).alias("est"),
    )
    dropped = {
        r.id_b for r in est.filter(F.col("est") >= 0.5).distinct().collect()
    }
    sig.unpersist()
    return {r.doc_id for r in docs.select("doc_id").collect()} - dropped


def test_streaming_ingest_matches_batch_rule(spark, tmp_path):
    docs = load_table(spark, SF_DIR_001, "documents").select("doc_id", "text")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

    # three id-ordered arrival files, mtime-ordered so the file source
    # processes them oldest-first, one per micro-batch
    src = tmp_path / "src"
    src.mkdir()
    terciles = [
        docs.filter(F.col("doc_id") <= cut1),
        docs.filter((F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2)),
        docs.filter(F.col("doc_id") > cut2),
    ]
    for i, part in enumerate(terciles):
        d = str(src / f"b{i}")
        part.coalesce(1).write.parquet(d)
        os.utime(d, (1_000_000 + i, 1_000_000 + i))
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = start_neardup_ingest(spark, stream, str(tmp_path / "work"))
    q.awaitTermination(180)

    kept_stream = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "work" / "kept")).collect()
    }
    kept_ref = _batch_reference_kept(spark, docs)
    assert kept_stream == kept_ref
    assert len(kept_ref) < docs.count(), "vacuous: nothing was deduped"

    # the band store must cover every document ever seen (kept AND
    # dropped): a dropped copy still shadows future copies
    store_ids = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "work" / "store"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert store_ids == {r.doc_id for r in docs.select("doc_id").collect()}
