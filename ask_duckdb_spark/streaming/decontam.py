"""Streaming ingest decontamination: x133 as a foreachBatch filter.

The batch operator (operators/hygiene.py x133) reports which training
documents share an n-gram with the eval slice. At ingest time you want
the complement applied as a FILTER: drop contaminated documents as
they arrive, before they ever land in the training store — the
decontamination analogue of streaming/neardup.py's ingest-time
near-dup drop.

- **The eval gram set is static state**: benchmark corpora are fixed
  artifacts, so the distinct eval-gram frame is computed once and
  persisted; every micro-batch joins against the same frame. (When the
  benchmark suite is versioned, rebuild the frame and restart the
  query — eval sets change on release cadence, not on data cadence.)
- **Per-batch output directories keyed by batch_id** (the
  streaming/upsert.py versioning rule): a replayed batch overwrites
  its own directory with identical content, so at-least-once delivery
  gives exactly-once EFFECT in the kept-set union.
- **Kept-set parity**: the union of all batches' kept documents equals
  the training partition minus batch x133's contaminated set, pinned
  by tests/test_streaming_decontam.py — the filter and the report are
  the same predicate by construction (both sides reuse x133's gram
  fragments; nothing is re-derived by hand).

Scale (100 TB/day ingest): gram hashing is a narrow map on the batch;
the contamination check is a semi-join against a benchmark-sized frame
— broadcast in practice, with x117's bloom filter composable in front
so the clean majority of documents never reaches the join. Per-batch
cost is O(batch grams), state is O(eval grams): nothing grows with
history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.hygiene import EVAL_MOD, _doc_grams
from ..operators.dedup import W_SPAN  # noqa: F401  (re-export for tests)

__all__ = [
    "eval_grams",
    "doc_grams",
    "decontam_filter",
    "kept_docs",
    "start_decontam",
]


def doc_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, h) gram-hash pairs of ``docs`` — x133's exact helper
    (single source of truth: the filter and the report cannot drift)."""
    return _doc_grams(docs)


def eval_grams(documents: DataFrame) -> DataFrame:
    """The static eval-slice gram set (distinct hashes), to persist()."""
    return (
        doc_grams(documents.filter(F.col("doc_id") % EVAL_MOD == 0))
        .select("h")
        .distinct()
    )


def decontam_filter(batch_df: DataFrame, ev: DataFrame) -> DataFrame:
    """The kept subset of ``batch_df``: docs sharing NO gram with ``ev``.

    Documents shorter than the gram window emit no grams and are kept —
    they cannot contain a full eval gram, matching x133's strict-window
    rule.
    """
    contaminated = (
        doc_grams(batch_df).join(ev, "h").select("doc_id").distinct()
    )
    return batch_df.join(contaminated, "doc_id", "left_anti")


def kept_docs(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of every batch's kept documents."""
    return spark.read.parquet(os.path.join(out_dir, "b*"))


def start_decontam(
    spark: SparkSession,
    docs_stream: DataFrame,
    workdir: str,
    ev: DataFrame,
    trigger_available_now: bool = True,
):
    """Wire :func:`decontam_filter` as a foreachBatch streaming query.

    ``workdir`` gets ``out/b<batch_id>`` kept-doc directories and a
    ``ckpt`` checkpoint dir.
    """
    out = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        decontam_filter(batch_df, ev).write.mode("overwrite").parquet(
            os.path.join(out, f"b{batch_id}")
        )

    w = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
