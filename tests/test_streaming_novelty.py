"""Streaming novelty ingest (streaming/novelty.py) vs batch x86.

The stream sees the fixture corpus in three id-ordered micro-batches;
the per-document novelty rows must equal batch x86's output exactly.
This holds because a window's first-seen doc is either in the same
micro-batch (the within-batch min-doc_id rule) or an earlier one (the
hash is already in the store), and id-ordered batches make "earlier
batch" == "lower doc_id" — the same argument as the neardup parity
test, applied to first-occurrence credit instead of pair drops.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.sources.catalog import load_table
from ask_duckdb_spark.streaming.novelty import start_novelty_ingest
from tests.conftest import SF_DIR_001


def test_streaming_novelty_matches_batch_x86(spark, tmp_path):
    docs = load_table(spark, SF_DIR_001, "documents").select("doc_id", "text")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

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
    q = start_novelty_ingest(spark, stream, str(tmp_path / "work"))
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.n_distinct_windows, r.n_novel, r.novelty_ratio)
        for r in spark.read.parquet(
            str(tmp_path / "work" / "scores")
        ).collect()
    }
    want = {
        r.doc_id: (r.n_distinct_windows, r.n_novel, r.novelty_ratio)
        for r in QUERIES["x86_novelty_ratio"](spark, SF_DIR_001).collect()
    }
    assert got == want
    # non-vacuous: the corpus has both novel and seen content
    ratios = [v[2] for v in want.values()]
    assert any(r == 1.0 for r in ratios) and any(r < 1.0 for r in ratios)
