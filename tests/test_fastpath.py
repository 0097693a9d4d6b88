"""Twin gates for the xxhash64 fast production paths (x2f, x4f).

DuckDB cannot compute xxhash64, so neither fast path can carry a
signature-level SQL oracle. THIS file is their sketch-level correctness
gate, the same differential pattern as x3 (exact Jaccard) auditing x2
(sketch), one level down: the oracle-audited portable path audits the
fast path.

What is checkable differs per sketch:

- MinHash estimates Jaccard directly; with 32 permutations and the
  fixtures' well-separated duplicate structure (true dups at J~0.97,
  non-dups at J~0), the >=0.5-estimate pair set is stable across hash
  families — so x2f must produce EXACTLY x2's pair set. Since r12 the
  registry entry's contract IS that pair set (the per-pair estimate is
  hash-family-dependent: 15/25 estimates differ at sf0.01), so x2f
  additionally carries x2's pair-set oracle and the driver value-hash
  checks it; this test pins the stronger pair-for-pair claim.
- SimHash + Hamming<=3 is a much tighter sketch whose pair set is
  legitimately hash-family-dependent (measured: portable finds 13 of
  the 25 exact-J>=0.5 truth pairs at sf0.01, fast finds 17 + a few
  short-doc false positives). Equality would be a wrong gate; instead
  we pin hash-family-independent invariants (identical texts collide
  at Hamming 0; one signature per doc) plus a recall floor against the
  exact-Jaccard truth so a broken fast path cannot pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.operators.dedup import (
    simhash_pairs_from_signatures,
)

SF_DIR_001 = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_x2f_pair_set_equals_portable_x2(spark):
    p_portable = _pairs(QUERIES["x2_minhash_neardup"](spark, SF_DIR_001))
    p_fast = _pairs(QUERIES["x2f_minhash_neardup_fast"](spark, SF_DIR_001))
    spark.catalog.clearCache()  # both paths persist their signature frame
    assert p_fast == p_portable


def test_x4f_signature_per_doc(spark):
    sig = QUERIES["x4f_simhash_fast"](spark, SF_DIR_001)
    n_docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet").count()
    rows = sig.collect()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    # 60-bit signature: never negative, never uses bits 60+
    assert all(0 <= r.simhash < (1 << 60) for r in rows)


def test_x4f_identical_texts_collide_at_hamming_zero(spark):
    # Hash-family-independent invariant: equal token streams -> equal
    # signature. Exact-duplicate doc groups (same text) must share one
    # simhash value under ANY hash.
    docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
    sig = QUERIES["x4f_simhash_fast"](spark, SF_DIR_001)
    joined = docs.select("doc_id", F.md5("text").alias("k")).join(
        sig, "doc_id"
    )
    bad = (
        joined.groupBy("k")
        .agg(F.countDistinct("simhash").alias("n_sig"))
        .filter(F.col("n_sig") > 1)
        .count()
    )
    assert bad == 0


def test_x4f_recall_floor_vs_exact_jaccard(spark):
    truth = {
        (r.id_a, r.id_b)
        for r in QUERIES["x3_ngram_jaccard_pairs"](spark, SF_DIR_001)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    fast = _pairs(
        simhash_pairs_from_signatures(
            QUERIES["x4f_simhash_fast"](spark, SF_DIR_001)
        )
    )
    assert truth, "fixture lost its near-dup structure"
    recall = len(fast & truth) / len(truth)
    # portable x4b measures 0.52 on the same fixture; a working fast
    # path lands well above 0.4, a broken hash collapses to ~0
    assert recall >= 0.4, f"fast simhash recall {recall:.2f} vs exact truth"
