"""Streaming ingest decontamination (streaming/decontam.py) vs batch x133.

The training partition streams in three micro-batches past a static
eval-gram frame; the union of kept documents must equal the training
partition minus exactly the doc_ids batch x133 reports as contaminated.
A second test checks the batch-id-keyed output makes replays idempotent,
and a third pins the short-document rule (no full gram -> kept).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.operators.dedup import W_SPAN
from ask_duckdb_spark.operators.hygiene import EVAL_MOD
from ask_duckdb_spark.sources.catalog import load_table
from ask_duckdb_spark.streaming.decontam import (
    decontam_filter,
    eval_grams,
    kept_docs,
    start_decontam,
)
from tests.conftest import SF_DIR_001


def _train(spark):
    return load_table(spark, SF_DIR_001, "documents").filter(
        F.col("doc_id") % EVAL_MOD != 0
    )


def test_streaming_decontam_matches_batch_x133(spark, tmp_path):
    docs = load_table(spark, SF_DIR_001, "documents")
    train = _train(spark)
    ev = eval_grams(docs).persist()

    srcdir = tmp_path / "src"
    srcdir.mkdir()
    lo, hi = train.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    batches = [
        train.filter(F.col("doc_id") <= cut1),
        train.filter((F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2)),
        train.filter(F.col("doc_id") > cut2),
    ]
    for i, part in enumerate(batches):
        d = str(srcdir / f"in{i}")
        part.coalesce(1).write.parquet(d)
        os.utime(d, (1_000_000 + i, 1_000_000 + i))
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{srcdir}/in*")
    )
    q = start_decontam(spark, stream, str(tmp_path / "work"), ev)
    q.awaitTermination(180)

    kept = {
        r.doc_id
        for r in kept_docs(spark, str(tmp_path / "work" / "out")).collect()
    }
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    contaminated = {
        r.doc_id
        for r in QUERIES["x133_eval_decontam"](spark, SF_DIR_001).collect()
    }
    ev.unpersist()
    assert contaminated, "fixture must plant at least one contamination"
    assert kept == train_ids - contaminated


def test_replayed_batch_is_idempotent(spark, tmp_path):
    docs = load_table(spark, SF_DIR_001, "documents")
    train = _train(spark)
    ev = eval_grams(docs).persist()
    out = str(tmp_path / "out" / "b0")
    decontam_filter(train, ev).write.mode("overwrite").parquet(out)
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    decontam_filter(train, ev).write.mode("overwrite").parquet(out)
    again = {r.doc_id for r in spark.read.parquet(out).collect()}
    ev.unpersist()
    assert first == again


def test_short_documents_are_kept(spark):
    docs = load_table(spark, SF_DIR_001, "documents")
    ev = eval_grams(docs).persist()
    short = spark.createDataFrame(
        [(10**9, "too short to hold a gram", "en", "srcT", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = decontam_filter(short, ev).collect()
    ev.unpersist()
    assert len(kept) == 1, f"a < {W_SPAN}-token doc can never be contaminated"
